package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

/** Pins the events-loader drift tolerance (r9 verdict #1/#2): the driver's
  * testdata has shipped `ts` as TIMESTAMP(NANOS)/int64 and, later, plain
  * timestamp[us] — [[Tables.events]] must yield the IDENTICAL typed result
  * from every physical encoding, so a testdata regeneration can never again
  * silently break events-backed queries. Engine-side analogue of the
  * reference's tolerate-unknown-fields mandate (SURVEY §1; sec_edgar.py:65-71
  * `_safe_json`).
  */
class TablesSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  // one micro-fixture, three physical encodings of the same instants
  private val micros = Seq(
    (1L, 7L, "click", 1.5, 1700000000000000L),   // 2023-11-14T22:13:20Z
    (2L, 7L, "view", 2.0, 1700000000123456L),
    (3L, 9L, "click", 0.25, 1700003600000000L))

  private def writeDir(): String =
    Files.createTempDirectory("tables-spec").toString

  /** Encoding A: what the nanos-annotated file looks like AFTER the legacy
    * `nanosAsLong` read — a raw int64 column carrying nanoseconds. Writing
    * TIMESTAMP(NANOS) parquet is not expressible from Spark, but the loader
    * only ever sees the post-read LongType shape, so pinning that shape
    * covers the nanos path end to end. */
  private def writeLongNanos(dir: String): Unit = {
    import spark.implicits._
    micros.map { case (id, u, t, v, us) => (id, u, t, v, us * 1000L) }
      .toDF("event_id", "user_id", "event_type", "value", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  /** Encoding B: timestamp[us] NOT adjusted to UTC (TIMESTAMP_NTZ) — the
    * current testdata shape. */
  private def writeNtz(dir: String): Unit = {
    import spark.implicits._
    micros.map { case (id, u, t, v, us) => (id, u, t, v, us) }
      .toDF("event_id", "user_id", "event_type", "value", "us")
      .withColumn("ts", timestamp_micros(col("us")).cast(TimestampNTZType))
      .drop("us")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  /** Encoding C: timestamp[us] adjusted to UTC (session-zoned TIMESTAMP). */
  private def writeLtz(dir: String): Unit = {
    import spark.implicits._
    micros.map { case (id, u, t, v, us) => (id, u, t, v, us) }
      .toDF("event_id", "user_id", "event_type", "value", "us")
      .withColumn("ts", timestamp_micros(col("us")))
      .drop("us")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def loadCanon(dir: String): (DataType, Seq[Row]) = {
    val df = Tables.events(spark, dir)
    val tsType = df.schema("ts").dataType
    val rows = df.select(col("event_id"), unix_micros(col("ts")).as("us"))
      .orderBy("event_id").collect().toSeq
    (tsType, rows)
  }

  describe("Tables.events physical-encoding tolerance") {
    it("yields identical session-zoned timestamps from int64-nanos, " +
        "timestamp_ntz, and timestamp encodings") {
      val (dirA, dirB, dirC) = (writeDir(), writeDir(), writeDir())
      writeLongNanos(dirA); writeNtz(dirB); writeLtz(dirC)

      // pin the on-disk physical types so the fixture actually exercises
      // three DISTINCT encodings (a silent writer change would otherwise
      // collapse the test to one path)
      spark.read.parquet(s"$dirA/events.parquet").schema("ts").dataType shouldBe LongType
      spark.read.parquet(s"$dirB/events.parquet").schema("ts").dataType shouldBe TimestampNTZType
      spark.read.parquet(s"$dirC/events.parquet").schema("ts").dataType shouldBe TimestampType

      val (tA, rowsA) = loadCanon(dirA)
      val (tB, rowsB) = loadCanon(dirB)
      val (tC, rowsC) = loadCanon(dirC)
      tA shouldBe TimestampType
      tB shouldBe TimestampType
      tC shouldBe TimestampType
      rowsA shouldBe rowsB
      rowsB shouldBe rowsC
      rowsA.map(_.getLong(1)) shouldBe micros.map(_._5)
    }

    it("rejects an unsupported ts type with a diagnosable error") {
      val dir = writeDir()
      import spark.implicits._
      micros.map { case (id, u, t, v, us) => (id, u, t, v, us.toString) }
        .toDF("event_id", "user_id", "event_type", "value", "ts")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val e = intercept[IllegalStateException](Tables.events(spark, dir))
      e.getMessage should include("unsupported physical type")
    }

    it("every testdata table loads with its expected column set") {
      // name-level schema pin for ALL tables (the general form of the
      // events lesson): physical TYPES may drift — adapting is the
      // loader's job — but a dropped/renamed column is catastrophic and
      // must fail HERE with a readable diff, not as a deep analysis
      // error in whichever query touches it first
      val expected = Map(
        "region" -> Set("r_regionkey", "r_name"),
        "nation" -> Set("n_nationkey", "n_name", "n_regionkey"),
        "customer" -> Set("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
        "supplier" -> Set("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
        "part" -> Set("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
        "orders" -> Set("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"),
        "lineitem" -> Set("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
          "l_quantity", "l_extendedprice", "l_discount", "l_tax",
          "l_returnflag", "l_linestatus", "l_shipdate"),
        "events" -> Set("event_id", "ts", "user_id", "event_type", "value", "props"),
        "documents" -> Set("doc_id", "text", "lang", "source", "n_chars"),
        "embeddings" -> Set("vec_id", "embedding", "label"))
      Tables.names.foreach { t =>
        val got = Tables.load(spark, sf001, t).schema.fieldNames.toSet
        val want = expected(t)
        assert(want.subsetOf(got),
          s"table $t lost columns ${want -- got} (has: $got) — testdata drift")
      }
    }

    it("matches the real testdata (now timestamp[us]) against the same " +
        "instants DuckDB sees: hour-truncation agrees with the q36 oracle") {
      // smoke: the loaded ts must groupBy(hour) without analysis errors and
      // produce non-empty buckets — the exact failure mode of r9
      val df = Tables.events(spark, sf001)
      df.schema("ts").dataType shouldBe TimestampType
      val n = df.groupBy(date_trunc("hour", col("ts"))).count().count()
      n should be > 0L
    }
  }
}
