package graft

import org.apache.spark.sql.SparkSession

/** Shared local session for all suites (getOrCreate reuses one JVM-wide
  * session; Test/fork=true gives the suite JVM the JDK17 add-opens). */
trait SparkSessionTestWrapper {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-wh").toString)
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf001 = "/root/testdata/sf0.001"
}
