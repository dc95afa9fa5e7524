package graft

import graft.pipeline.{Model, ProvenanceStore}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Columnar DSv2 read path for the provenance source (round-6 verdict #6):
  * full scans decode through Spark's vectorized parquet reader into column
  * batches; filtered/limited scans stay on the row reader where the parquet
  * predicate and early-stop live. Parity with the native parquet read is
  * the contract; plan shape pins which path ran. */
class ColumnarProvenanceSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private def freshStore(): (String, ProvenanceStore) = {
    val wh = java.nio.file.Files.createTempDirectory("wh").toString
    (wh, new ProvenanceStore(spark, wh))
  }

  private def seed(store: ProvenanceStore, n: Int = 100): Unit =
    store.appendResponses(spark.range(0, n, 1, 4).select(
      lit("prov_a").as("provider"), lit("GET").as("method"),
      concat(lit("https://x.test/"), col("id")).as("url"),
      when(col("id") % 2 === 0, lit("{}")).as("params_json"),
      (lit(200) + (col("id") % 2).cast("int")).as("status_code"),
      lit("{}").as("headers_json"), lit("body".getBytes("UTF-8")).as("body"),
      col("id").cast("int").as("item_index"), lit("metadata").as("stage")))

  private def dsv2(wh: String) = spark.read.format("graft-provenance")
    .option("warehouse", wh).option("table", "responses").load()

  test("full scan runs columnar (ColumnarToRow above the scan) and matches the native read") {
    val (wh, store) = freshStore()
    seed(store)
    val q = dsv2(wh).orderBy("id")
    val native = spark.read.schema(Model.responsesSchema)
      .parquet(s"$wh/responses").orderBy("id")
    // full-row parity: longs, strings, int, BINARY body, INT96 timestamp,
    // and the planted params_json nulls all decode identically
    assert(q.collect().toSeq == native.collect().toSeq)
    // AQE inserts the columnar transition at stage creation — inspect the
    // FINAL plan, after the action above materialized it
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"),
      s"unfiltered full scan must be vectorized: $plan")
  }

  test("filtered and limited scans stay on the row reader (parquet predicate/early-stop)") {
    val (wh, store) = freshStore()
    seed(store)
    val filtered = dsv2(wh).filter(col("status_code") === 200).select("id", "url")
    assert(filtered.collect().length == 50)
    val planF = filtered.queryExecution.executedPlan.toString
    assert(!planF.contains("ColumnarToRow"),
      s"filtered scan must use the row reader (parquet predicate pruning): $planF")
    val limited = dsv2(wh).select("id").limit(7)
    assert(limited.collect().length == 7)
    val planL = limited.queryExecution.executedPlan.toString
    assert(!planL.contains("ColumnarToRow"),
      s"limited scan must use the row reader (early stop): $planL")
  }

  test("projected columnar scan prunes columns and keeps requested order") {
    val (wh, store) = freshStore()
    seed(store)
    val q = dsv2(wh).select("url", "id", "status_code").orderBy("id")
    val native = spark.read.schema(Model.responsesSchema)
      .parquet(s"$wh/responses").select("url", "id", "status_code").orderBy("id")
    assert(q.collect().toSeq == native.collect().toSeq)
    assert(q.queryExecution.executedPlan.toString.contains("ColumnarToRow"))
  }

  test("schema drift: files missing requested columns surface constant nulls, both paths") {
    val (wh, store) = freshStore()
    seed(store, n = 10)
    // a legacy file lacking params_json/created_at lands in the same dir
    spark.range(1000, 1010).select(
      col("id"), lit("prov_old").as("provider"), lit("GET").as("method"),
      concat(lit("https://old.test/"), col("id")).as("url"),
      lit(404).as("status_code"), lit("{}").as("headers_json"),
      lit("old".getBytes("UTF-8")).as("body"))
      .coalesce(1).write.mode("append").parquet(s"$wh/responses")

    val full = dsv2(wh)
    assert(full.count() == 20)
    val old = full.filter(col("provider") === "prov_old")
    assert(old.count() == 10)
    // columnar composite: full scan projecting a column absent in the
    // legacy file → nulls for its rows, values for the new file's
    val pj = full.select("id", "params_json", "provider")
    val byProv = pj.groupBy("provider")
      .agg(count(lit(1)).as("n"), count(col("params_json")).as("nonnull"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byProv("prov_old") == (10L, 0L), "absent column reads as null")
    assert(byProv("prov_a") == (10L, 5L), "present column unaffected")
    // all-requested-columns-absent: null batches row-counted from footers
    val onlyAbsent = full.select("params_json", "created_at")
      .filter(lit(true)) // no pushable filter → still columnar
    assert(onlyAbsent.count() == 20)
    assert(full.select("created_at").na.drop().count() == 10)
  }
}
