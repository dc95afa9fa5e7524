package graft

/** Dev tool: print parquet-scan / exchange counts for named queries.
  * `sbt "Test/runMain graft.PlanCounts q124_snapshot_diff ..."` */
object PlanCounts extends SparkSessionTestWrapper {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.execution.ExplainMode
    args.foreach { name =>
      val p = SparkEntry.all(name).fn(spark, sf001).queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).size
      val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
      println(s"PLANCOUNT $name scans=$scans exchanges=$exchanges")
    }
  }
}
