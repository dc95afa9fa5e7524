package graft

import org.scalatest.funsuite.AnyFunSuite

/** Barrier-block lifetime: `withBarrierScope` must release exactly the
  * blocks its body persisted — no leak after exit, no touching blocks that
  * predate the scope. */
class BarriersSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  test("scope releases barrier blocks a query pinned, result intact") {
    val before = Barriers.persistentRddCount(spark)
    var during = -1
    val rows = Barriers.withBarrierScope(spark) {
      // q94 pins its shingle frame with a lazy localCheckpoint — the
      // canonical multi-consumer barrier this scope exists to clean up
      val out = operators.Curation.defs("q94_ngram_novelty").fn(spark, sf001).collect()
      during = Barriers.persistentRddCount(spark)
      out
    }
    assert(during > before, "the q94 barrier must register a persistent RDD")
    assert(rows.nonEmpty)
    assert(Barriers.persistentRddCount(spark) == before,
      "scope exit must unpersist every block the scope created")
  }

  test("scope leaves pre-existing persisted frames alone") {
    val keep = Seq((1, "a"), (2, "b")).toDF("id", "v").persist()
    keep.count()
    val before = Barriers.persistentRddCount(spark)
    Barriers.withBarrierScope(spark) {
      val inner = Seq((3, "c")).toDF("id", "v").persist()
      inner.count()
    }
    assert(Barriers.persistentRddCount(spark) == before,
      "only the scope's own blocks release")
    assert(keep.count() == 2)
    keep.unpersist(blocking = true)
  }

  test("nested scopes release independently and pass values through") {
    val before = Barriers.persistentRddCount(spark)
    val got = Barriers.withBarrierScope(spark) {
      val outer = Seq(1, 2, 3).toDF("x").localCheckpoint(false)
      val inner = Barriers.withBarrierScope(spark) {
        Seq(4, 5).toDF("x").localCheckpoint(false).count()
      }
      outer.count() + inner
    }
    assert(got == 5)
    assert(Barriers.persistentRddCount(spark) == before)
  }

  test("scope releases on exception too") {
    val before = Barriers.persistentRddCount(spark)
    intercept[RuntimeException] {
      Barriers.withBarrierScope(spark) {
        Seq(1).toDF("x").localCheckpoint(false).count()
        throw new RuntimeException("boom")
      }
    }
    assert(Barriers.persistentRddCount(spark) == before)
  }

  test("release frees a superseded eager checkpoint immediately, incl. through derived frames") {
    val before = Barriers.persistentRddCount(spark)
    val pinned = Seq(1, 2, 3).toDF("x").localCheckpoint(true)
    assert(Barriers.persistentRddCount(spark) == before + 1)
    // release through a DERIVED frame — the loop records projections of
    // its per-round pins, never the pinned frame itself
    val derived = pinned.filter($"x" > 1).selectExpr("x * 2 AS y")
    Barriers.release(derived)
    assert(Barriers.persistentRddCount(spark) == before)
    // no-op on frames with no LogicalRDD leaf
    Barriers.release(Seq(1).toDF("x"))
    assert(Barriers.persistentRddCount(spark) == before)
  }
}
