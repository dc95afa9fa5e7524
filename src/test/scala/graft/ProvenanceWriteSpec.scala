package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DSv2 write face of the provenance warehouse: df.write.format(
  * "graft-provenance") must carry the SAME id-stamp + dedup-append
  * contract as the ProvenanceStore methods (it delegates to them), and
  * the written rows must round-trip through the DSv2 READ face with its
  * pushdowns intact.
  */
class ProvenanceWriteSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private def freshWarehouse(): String =
    java.nio.file.Files.createTempDirectory("graft-dsv2w").toString

  private def readTable(warehouse: String, table: String) =
    spark.read.format("graft-provenance")
      .option("warehouse", warehouse).option("table", table).load()

  private def responsesBatch(n: Int, offset: Int = 0) =
    (0 until n).map { i =>
      (s"prov", "GET", s"https://api.example.com/items/${i + offset}",
        """{"page":1}""", 200, """{"content-type":"application/json"}""",
        s"body-${i + offset}".getBytes("UTF-8"))
    }.toDF("provider", "method", "url", "params_json", "status_code",
      "headers_json", "body")

  test("responses DSv2 write stamps ids + created_at and round-trips through the DSv2 read") {
    val wh = freshWarehouse()
    responsesBatch(10).write.format("graft-provenance")
      .option("warehouse", wh).option("table", "responses")
      .mode("append").save()
    val back = readTable(wh, "responses")
    assert(back.count() == 10)
    assert(back.select("id").distinct().count() == 10, "stamped ids must be unique")
    assert(back.filter(col("created_at").isNull).count() == 0)
    // second append must not collide with the first batch's ids
    responsesBatch(5, offset = 100).write.format("graft-provenance")
      .option("warehouse", wh).option("table", "responses")
      .mode("append").save()
    val all = readTable(wh, "responses")
    assert(all.count() == 15)
    assert(all.select("id").distinct().count() == 15,
      "ids across appends must stay unique (base probed from footer stats)")
    // the read face's pushdown still serves the written files
    val one = all.filter(col("url") === "https://api.example.com/items/3")
    assert(one.count() == 1)
    assert(new String(one.select("body").head().getAs[Array[Byte]](0), "UTF-8") == "body-3")
  }

  test("contiguous idMode writes SQLite-parity ids 1..n") {
    val wh = freshWarehouse()
    responsesBatch(7).write.format("graft-provenance")
      .option("warehouse", wh).option("table", "responses")
      .option("idMode", "contiguous")
      .mode("append").save()
    val ids = readTable(wh, "responses").select("id").as[Long].collect().sorted
    assert(ids.toSeq == (1L to 7L), s"expected 1..7, got ${ids.toSeq}")
  }

  test("artifacts DSv2 write dedups on (source_url, sha256): exact replay appends nothing") {
    val wh = freshWarehouse()
    val batch = Seq(
      ("prov", "https://example.com/a.pdf", "sha-a", 100L, "/blobs/a", 1L),
      ("prov", "https://example.com/b.pdf", "sha-b", 200L, "/blobs/b", 2L),
      // in-batch duplicate of a.pdf — only one row may land
      ("prov", "https://example.com/a.pdf", "sha-a", 100L, "/blobs/a", 1L)
    ).toDF("provider", "source_url", "sha256", "bytes", "blob_path", "response_id")
    batch.write.format("graft-provenance")
      .option("warehouse", wh).option("table", "artifacts")
      .mode("append").save()
    assert(readTable(wh, "artifacts").count() == 2, "in-batch dup must collapse")
    // K2 idempotence: replaying the whole batch lands zero new rows
    batch.write.format("graft-provenance")
      .option("warehouse", wh).option("table", "artifacts")
      .mode("append").save()
    assert(readTable(wh, "artifacts").count() == 2, "replay must be a no-op")
    // a genuinely new artifact still lands
    Seq(("prov", "https://example.com/c.pdf", "sha-c", 300L, "/blobs/c", 3L))
      .toDF("provider", "source_url", "sha256", "bytes", "blob_path", "response_id")
      .write.format("graft-provenance")
      .option("warehouse", wh).option("table", "artifacts")
      .mode("append").save()
    val after = readTable(wh, "artifacts")
    assert(after.count() == 3)
    assert(after.select("id").distinct().count() == 3)
  }

  test("DSv2 write validates input columns and rejects non-append modes") {
    val wh = freshWarehouse()
    val missing = intercept[Exception] {
      Seq(("prov", "GET")).toDF("provider", "method")
        .write.format("graft-provenance")
        .option("warehouse", wh).option("table", "responses")
        .mode("append").save()
    }
    assert(missing.getMessage.contains("missing columns"),
      s"unexpected error: ${missing.getMessage}")
    val badMode = intercept[Exception] {
      responsesBatch(1).write.format("graft-provenance")
        .option("warehouse", wh).option("table", "responses")
        .option("idMode", "bogus")
        .mode("append").save()
    }
    assert(badMode.getMessage.contains("id mode"),
      s"unexpected error: ${badMode.getMessage}")
  }

  test("DSv2 write and ProvenanceStore appends interleave on one table without id collisions") {
    val wh = freshWarehouse()
    val store = new graft.pipeline.ProvenanceStore(spark, wh)
    store.appendResponses(responsesBatch(4)
      .withColumn("item_index", lit(0L)).withColumn("stage", lit("t")))
    responsesBatch(4, offset = 50).write.format("graft-provenance")
      .option("warehouse", wh).option("table", "responses")
      .mode("append").save()
    val all = readTable(wh, "responses")
    assert(all.count() == 8)
    assert(all.select("id").distinct().count() == 8,
      "both write paths must probe the same max-id base")
  }
}
