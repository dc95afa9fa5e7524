package graft

import java.nio.file.Files
import graft.operators.Skew
import graft.pipeline.EmissionContract
import graft.streaming.WatermarkSync
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScaleUtilSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  // ---- emission contract ----

  test("APS rows normalize to the shared emission contract") {
    val aps = Seq(
      ("ML24001A001", "50-123", "2024-01-05", "2024-01-06T10:00:00Z",
        "https://api.nrc.gov/x.pdf"),
      ("ML24001A002", null, null, null, null)
    ).toDF("AccessionNumber", "DocketNumber", "DocumentDate",
      "DateAddedTimestamp", "pdfUrl")
    val out = EmissionContract.fromAps(aps).collect()
    assert(out.length == 2)
    val r = out.head
    assert(r.getAs[String]("_schema_version") == "1")
    assert(r.getAs[String]("provider") == "nrc_adams_aps")
    assert(r.getAs[String]("accession_number") == "ML24001A001")
    assert(r.getAs[java.sql.Date]("document_date").toString == "2024-01-05")
    assert(r.getAs[String]("retention_allowed") == "unknown")
    assert(out(1).getAs[String]("docket_number") == null)
    assert(EmissionContract.fromAps(aps).columns.toSeq == EmissionContract.columns)
  }

  test("EDGAR rows normalize with dual accession join keys") {
    val edgar = Seq(
      ("0000320193-24-000123", "2024-01-02", "2024-01-02T16:30:00.000Z",
        "https://www.sec.gov/a.htm")
    ).toDF("accessionNumber", "filingDate", "acceptanceDateTime", "url")
    val out = EmissionContract.withAccessionForms(EmissionContract.fromEdgar(edgar))
      .collect().head
    assert(out.getAs[String]("accession_nodash") == "000032019324000123")
    assert(out.getAs[String]("accession_dashed") == "0000320193-24-000123")
    // nodash round-trips to dashed (dossier :168 — both forms join-compatible)
    val nodash = Seq(("000032019324000123", "x")).toDF("accession_number", "url")
    val round = EmissionContract.withAccessionForms(nodash).collect().head
    assert(round.getAs[String]("accession_dashed") == "0000320193-24-000123")
  }

  // ---- watermark sync ----

  test("watermark sync: overlap re-reads dedupe, old rows drop, watermark advances") {
    val state = Files.createTempDirectory("wmsync").toString
    def rows(data: (Long, String, String)*) =
      data.toSeq.toDF("key", "tss", "payload")
        .select(col("key"), to_timestamp(col("tss")).as("ts"), col("payload"))

    // batch 1: 3 rows
    val r1 = WatermarkSync.syncBatch(spark,
      rows((1L, "2024-01-10 00:00:00", "a"), (2L, "2024-01-10 01:00:00", "b"),
        (3L, "2024-01-10 02:00:00", "c")),
      state, "ts", Seq("key"))
    assert(r1.appended == 3)

    // batch 2: key 3 re-sent (dup within overlap), key 4 new, key 0 too old
    val r2 = WatermarkSync.syncBatch(spark,
      rows((3L, "2024-01-10 02:00:00", "c"), (4L, "2024-01-10 03:00:00", "d"),
        (0L, "2024-01-01 00:00:00", "stale")),
      state, "ts", Seq("key"), overlap = "48 hours")
    assert(r2.appended == 1, "only the genuinely new key lands")

    val all = WatermarkSync.stored(spark, state).get
    assert(all.count() == 4)
    assert(all.select("key").as[Long].collect().toSet == Set(1L, 2L, 3L, 4L))
    val wm = WatermarkSync.readWatermark(state).get
    assert(wm == java.sql.Timestamp.valueOf("2024-01-10 03:00:00").getTime * 1000)
  }

  test("session-interval sync keyed on END keeps intervals longer than the overlap") {
    // the sessionSinkQuery/sessionIntervalsSinkQuery contract: a session
    // is emitted when the watermark passes its END + gap, so the horizon
    // column must be the end — a 60 h session's START is already below
    // stored-max − 48 h when it closes, and an st-keyed horizon would
    // silently drop it (losing every q206 overlap pair it belongs to)
    def intervals(data: (Long, String, String)*) =
      data.toSeq.toDF("user_id", "sts", "ens")
        .select(col("user_id"), to_timestamp(col("sts")).as("st"),
          to_timestamp(col("ens")).as("en"))
    // batch 1: short sessions advance the store's max(en) to Jan 12 12:00
    val stateEn = Files.createTempDirectory("wmsync-en").toString
    val b1 = intervals(
      (1L, "2024-01-12 10:00:00", "2024-01-12 11:00:00"),
      (2L, "2024-01-12 11:30:00", "2024-01-12 12:00:00"))
    assert(WatermarkSync.syncBatch(spark, b1, stateEn, "en",
      Seq("user_id", "st")).appended == 2)
    // batch 2: a 60 h session closes — st is 60 h old, en is current
    val longSession = intervals((3L, "2024-01-10 00:00:00", "2024-01-12 12:30:00"))
    assert(WatermarkSync.syncBatch(spark, longSession, stateEn, "en",
      Seq("user_id", "st")).appended == 1,
      "end-keyed horizon must keep the long interval")
    assert(WatermarkSync.stored(spark, stateEn).get.count() == 3)
    // the regression shape: the SAME sequence keyed on st drops it
    val stateSt = Files.createTempDirectory("wmsync-st").toString
    WatermarkSync.syncBatch(spark, b1, stateSt, "st", Seq("user_id", "st"))
    assert(WatermarkSync.syncBatch(spark, longSession, stateSt, "st",
      Seq("user_id", "st")).appended == 0,
      "st-keyed horizon demonstrably discards it — the bug the en key fixes")
  }

  test("watermark sync is idempotent: replaying a batch appends nothing") {
    val state = Files.createTempDirectory("wmsync2").toString
    val batch = Seq((1L, "2024-01-10 00:00:00", "a")).toDF("key", "tss", "payload")
      .select(col("key"), to_timestamp(col("tss")).as("ts"), col("payload"))
    assert(WatermarkSync.syncBatch(spark, batch, state, "ts", Seq("key")).appended == 1)
    assert(WatermarkSync.syncBatch(spark, batch, state, "ts", Seq("key")).appended == 0)
  }

  // ---- skew ----

  test("salted join equals plain join on skewed data") {
    val big = (1 to 2000).map(i => (if (i % 10 == 0) 99L else i.toLong, s"v$i"))
      .toDF("k", "payload") // key 99 is hot
    val small = Seq((99L, "hot"), (5L, "cold"), (7L, "cold7")).toDF("k", "dim")
    val plain = big.join(small, "k").select("k", "payload", "dim")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(big, small, "k", saltBuckets = 8)
      .select("k", "payload", "dim").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.count(_.head == 99L) == 201)
  }

  test("key histogram surfaces the hot key") {
    val big = (1 to 1000).map(i => (if (i % 5 == 0) 42L else i.toLong, i))
      .toDF("k", "v")
    val top = Skew.keyHistogram(big, "k", topN = 1)
      .as[(Long, Long)].collect().head
    assert(top == ((42L, 201L)))
  }

  test("q173 skew audit: planted hot key — share and x-mean are exact") {
    // one key with 10 rows + ten keys with 1 row: 11 keys, 20 rows
    val df = ((1 to 10).map(_ => (99L, "x")) ++
      (1L to 10L).map(k => (k, "x"))).toDF("user_id", "v")
    val got = Skew.keySkewAudit(df, "user_id", topN = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(got.head === ((1L, "99", 10L, 11L, 20L, 0.5, 5.5)))
    // ties among the 1-row keys break on the key value
    assert(got.toSeq.drop(1).map(_._2) === Seq("1", "2"))
    assert(got.forall(_._7 > 0))
  }

  // ---- partition pruning: the other half of "scan only what you need" ----

  test("partitioned layout prunes at the directory level") {
    val dir = Files.createTempDirectory("evpart").toString
    Tables.events(spark, sf001)
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val q = spark.read.parquet(dir).filter(col("event_type") === "click")
      .groupBy("user_id").count()
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"), plan)
    assert(plan.contains("(event_type"), plan)
    // the predicate must NOT appear as a post-scan row filter on data
    assert(!plan.contains("PushedFilters: [IsNotNull(event_type)"),
      s"partition column filtering must happen at planning, not scan: $plan")
  }

  test("dynamic partition pruning fires for a dim-filtered join on the partition key") {
    val dir = Files.createTempDirectory("ordpart").toString
    Tables.orders(spark, sf001)
      .withColumn("status_part", col("o_orderstatus"))
      .write.mode("overwrite").partitionBy("status_part").parquet(dir)
    val dim = Seq(("O", "open")).toDF("status_key", "label")
    val q = spark.read.parquet(dir)
      .join(dim, col("status_part") === col("status_key"))
      .groupBy("label").count()
    q.collect()
    val plan = q.queryExecution.toString
    assert(plan.toLowerCase.contains("dynamicpruning") ||
      q.queryExecution.executedPlan.toString.contains("PartitionFilters: [isnotnull(status_part"),
      s"expected DPP or static pruning on the partition key: $plan")
  }

  // ---- bucketed co-located join (the shuffle-free fact-fact join path) ----

  test("bucketed tables join without any exchange") {
    // warehouse dir is a temp dir set at session build (static conf)
    val o = Tables.orders(spark, sf001)
    val l = Tables.lineitem(spark, sf001)
    try {
      o.write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("orders_b")
      l.write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("lineitem_b")
      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val j = spark.table("orders_b")
          .join(spark.table("lineitem_b"),
            col("o_orderkey") === col("l_orderkey"))
          .select("o_orderkey", "o_orderstatus", "l_quantity")
        j.collect()
        val plan = j.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"), plan)
        assert(plan.contains("Bucketed: true"), plan)
        assert(!plan.contains("Exchange hashpartitioning"),
          s"bucketed join must not shuffle either side: $plan")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
