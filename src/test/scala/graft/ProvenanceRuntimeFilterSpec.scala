package graft.sources

import graft.SparkSessionTestWrapper
import graft.pipeline.Model
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.expressions.filter.{And => V2And, Predicate => V2Predicate}
import org.apache.spark.sql.connector.read.InputPartition
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** SupportsRuntimeV2Filtering on the provenance scan: DPP-style runtime
  * predicates must re-plan input partitions down to the files whose
  * row-group stats can match, and fold into the per-reader parquet filter.
  * Driven at the Scan API level (the same calls BatchScanExec makes) so the
  * behavior is pinned without depending on the planner's DPP cost
  * heuristics, which need realistic table sizes to fire. */
class ProvenanceRuntimeFilterSpec extends AnyFunSuite with SparkSessionTestWrapper {

  /** 400 responses range-partitioned into 4 parquet files with disjoint,
    * stats-separable id ranges. Returns the warehouse dir. */
  private lazy val warehouse: String = {
    val wh = java.nio.file.Files.createTempDirectory("rtwh").toString
    spark.range(0, 400, 1, 1)
      .select(
        col("id"),
        concat(lit("prov_"), (col("id") / 100).cast("int")).as("provider"),
        lit("GET").as("method"),
        concat(lit("https://x.test/"), col("id")).as("url"),
        lit(null).cast("string").as("params_json"),
        lit(200).as("status_code"),
        lit("{}").as("headers_json"),
        lit("b".getBytes("UTF-8")).as("body"),
        current_timestamp().as("created_at"))
      .repartitionByRange(4, col("id"))
      .write.mode("overwrite").parquet(s"$wh/responses")
    assert(new java.io.File(s"$wh/responses").listFiles()
      .count(_.getName.endsWith(".parquet")) == 4)
    wh
  }

  private def buildScan(): ProvenanceScan = {
    val b = new ProvenanceScanBuilder(s"$warehouse/responses", Model.responsesSchema)
    b.build().asInstanceOf[ProvenanceScan]
  }

  private def readIds(scan: ProvenanceScan, parts: Array[InputPartition]): Seq[Long] = {
    val factory = scan.createReaderFactory()
    parts.toSeq.flatMap { p =>
      val r = factory.createReader(p)
      val out = scala.collection.mutable.ArrayBuffer[Long]()
      try {
        while (r.next()) out += r.get().asInstanceOf[InternalRow].getLong(0)
      } finally r.close()
      out.toSeq
    }
  }

  test("filterAttributes lists the stats-filterable columns") {
    val attrs = buildScan().filterAttributes().map(_.fieldNames()(0)).toSet
    assert(attrs.contains("id"))
    assert(attrs.contains("provider"))
    assert(attrs.contains("status_code"))
    assert(!attrs.contains("body"), "binary blob is not a filter attribute")
    assert(!attrs.contains("created_at"), "timestamps excluded (INT96 stats)")
  }

  test("runtime IN predicate prunes partitions to the matching file") {
    val scan = buildScan()
    assert(scan.planInputPartitions().length == 4)
    scan.filter(Array(new V2Predicate("IN", Array(
      Expressions.column("id"),
      Expressions.literal(5L), Expressions.literal(17L)))))
    val parts = scan.planInputPartitions()
    assert(parts.length == 1, "ids 5 and 17 live in one range file")
    // reader applies the same predicate → exactly the probed rows survive
    assert(readIds(scan, parts).sorted == Seq(5L, 17L))
  }

  test("runtime range predicate prunes and composes with AND") {
    val scan = buildScan()
    scan.filter(Array(new V2Predicate("AND", Array(
      new V2Predicate(">=", Array(Expressions.column("id"), Expressions.literal(150L))),
      new V2Predicate("<", Array(Expressions.column("id"), Expressions.literal(250L)))))))
    val parts = scan.planInputPartitions()
    assert(parts.length == 2, "[150,250) spans the two middle range files")
    val ids = readIds(scan, parts)
    assert(ids.size == 100 && ids.min == 150L && ids.max == 249L)
  }

  test("runtime predicate matching nothing plans zero partitions") {
    val scan = buildScan()
    scan.filter(Array(new V2Predicate("=", Array(
      Expressions.column("id"), Expressions.literal(100000L)))))
    assert(scan.planInputPartitions().isEmpty)
  }

  test("untranslatable runtime predicates are ignored, not misapplied") {
    val scan = buildScan()
    scan.filter(Array(new V2Predicate("STARTS_WITH", Array(
      Expressions.column("url"), Expressions.literal(UTF8String.fromString("https"))))))
    assert(scan.planInputPartitions().length == 4,
      "unsupported predicate shape must not prune anything")
  }

  test("limit pushdown short-circuits each partition's read") {
    val b = new ProvenanceScanBuilder(s"$warehouse/responses", Model.responsesSchema)
    assert(b.pushLimit(3))
    val scan = b.build().asInstanceOf[ProvenanceScan]
    val parts = scan.planInputPartitions()
    assert(parts.length == 4)
    val ids = readIds(scan, parts)
    assert(ids.size == 12, s"each of 4 partitions must stop at 3 rows, got ${ids.size}")
    // e2e: Spark's global limit on top of the partial pushdown is exact
    val df = spark.read.format("graft-provenance")
      .option("warehouse", warehouse).option("table", "responses").load()
    assert(df.limit(7).count() == 7)
    assert(df.limit(0).count() == 0)
  }

  test("predicateToV1 translates comparisons, flips, IN, null tests") {
    import ProvenanceDataSource.predicateToV1
    def id = Expressions.column("id")
    assert(predicateToV1(new V2Predicate(">", Array(id, Expressions.literal(3L))))
      .contains(sources.GreaterThan("id", 3L)))
    // literal-on-the-left flips the operator
    assert(predicateToV1(new V2Predicate(">", Array(Expressions.literal(3L), id)))
      .contains(sources.LessThan("id", 3L)))
    assert(predicateToV1(new V2Predicate("=", Array(
      Expressions.column("provider"),
      Expressions.literal(UTF8String.fromString("prov_1")))))
      .contains(sources.EqualTo("provider", "prov_1")),
      "UTF8String literals re-externalize to java String")
    assert(predicateToV1(new V2Predicate("IN", Array(
      Expressions.column("status_code"),
      Expressions.literal(200), Expressions.literal(404))))
      .contains(sources.In("status_code", Array(200, 404))))
    assert(predicateToV1(new V2Predicate("IS_NOT_NULL", Array(id)))
      .contains(sources.IsNotNull("id")))
    assert(predicateToV1(new V2And(
      new V2Predicate(">=", Array(id, Expressions.literal(1L))),
      new V2Predicate("<=", Array(id, Expressions.literal(9L)))))
      .contains(sources.And(
        sources.GreaterThanOrEqual("id", 1L), sources.LessThanOrEqual("id", 9L))))
    assert(predicateToV1(new V2Predicate("STARTS_WITH", Array(
      Expressions.column("url"),
      Expressions.literal(UTF8String.fromString("x"))))).isEmpty)
  }
}
