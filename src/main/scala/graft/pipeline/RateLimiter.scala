package graft.pipeline

import java.util.concurrent.ConcurrentHashMap

/** Token-bucket rate limiter, Scala port of the reference's semantics
  * (rate_limiter.py:6–58): per-key bucket with capacity = rate, refilled
  * continuously; `acquire` blocks for the deficit.
  *
  * Scale note: the reference's limiter is process-global (one Python
  * process). Under Spark the budget must hold per *host* across executor
  * threads, so ingest jobs partition requests BY HOST (each host's budget
  * lives inside one partition) and this limiter is executor-local state
  * created per partition — see HttpSource.
  */
class RateLimiter {
  private final class Bucket(rate: Double) {
    private val r = math.max(rate, 1.0) // reference clamps rate >= 1 (rate_limiter.py:40–41)
    private var tokens: Double = r
    private var last: Long = System.nanoTime()
    def acquire(): Unit = synchronized {
      val now = System.nanoTime()
      tokens = math.min(r, tokens + (now - last) / 1e9 * r)
      last = now
      if (tokens < 1.0) {
        val deficitSec = (1.0 - tokens) / r
        Thread.sleep((deficitSec * 1000).toLong.max(0L))
        tokens = 0.0
        last = System.nanoTime()
      } else tokens -= 1.0
    }
  }

  private val buckets = new ConcurrentHashMap[String, Bucket]()

  /** Reference rates: 10 rps sec.gov, 5 rps other hosts
    * (http_client.py:158,255); 3 rps per (subscription_key, host) for APS
    * (http_client.py:96–100). */
  def acquireHost(host: String): Unit =
    acquire(host, if (host.endsWith("sec.gov")) 10.0 else 5.0)

  def acquireAps(subscriptionKey: String, host: String): Unit =
    acquire(s"$subscriptionKey@$host", 3.0)

  def acquire(key: String, rate: Double): Unit =
    buckets.computeIfAbsent(key, _ => new Bucket(rate)).acquire()
}
