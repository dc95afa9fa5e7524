package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_VERIFY_ONLY=q79_x,q55_y narrows the dump for local
    // iteration with tools/check.py; the driver sets nothing and gets all
    val selected = sys.env.get("SPARK_GRAFT_VERIFY_ONLY") match {
      case Some(names) =>
        val want = names.split(',').map(_.trim).filter(_.nonEmpty).toSet
        val missing = want -- SparkEntry.queries.keySet
        require(missing.isEmpty, s"unknown verify queries: ${missing.mkString(",")}")
        SparkEntry.queries.view.filterKeys(want).toMap
      case None => SparkEntry.queries
    }
    // each query's barrier blocks are released once its parquet is written
    // — the 95-query dump holds at most one query's blocks at a time.
    // Failures are FIRST-CLASS: every selected query lands in errors.json
    // (null on success), so a query that errors shows up as an explicit
    // failing row in the artifact rather than a silent absence that only a
    // cross-round diff would reveal.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, Option[String]]
    selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        Barriers.withBarrierScope(spark) {
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
        }
        errors(name) = None
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        errors(name) =
          Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => selected.contains(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = errors
      .map { case (k, e) => s"${q(k)}: ${e.map(q).getOrElse("null")}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    spark.stop()
    // exit 0 even on per-query failure: the driver's DuckDB comparison of
    // the partial dump must still run (errors.json + stderr carry the
    // failure signal as first-class rows; a non-zero rc here could cost
    // the whole round's correctness artifact)
  }
}
