package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket affinity over the order/lineitem star: which items
  * co-occur in the same basket more often than chance (support,
  * lift) — the classic co-occurrence analysis a pipeline landing
  * transactional streams is asked for, and the same shape that mines
  * co-occurring n-grams or co-cited documents in a training corpus.
  *
  * Scale design: pair generation is a SELF-JOIN OF THE (basket, item)
  * FRAME ON THE BASKET KEY — co-partitioned on l_orderkey, so the join
  * is shuffle-once and never buffers a basket in memory (no
  * collect_list). The quadratic blowup a single hot basket would cause
  * is bounded up front: baskets with more than `maxBasket` distinct
  * items are excluded (the standard MBA guard — a 10k-item basket
  * contributes 50M pairs and no signal). The (basket, item) frame
  * feeds four consumers, so it sits behind one lazy barrier; the
  * basket total rides a one-row broadcast (the q80 pattern), item
  * frequencies join pair counts on the pair frame (≤ items² rows,
  * support-pruned first). Lift divides exact integers once, so both
  * engines see identical doubles.
  */
object Affinity {

  /** Pairwise basket lift: items = distinct parts per order; for every
    * unordered pair co-occurring in ≥ `minSupport` baskets, the
    * support and lift vs independence; top-`topK` by (lift DESC,
    * part_a, part_b) — a total order, so the cut is deterministic. */
  def basketLift(lineitem: DataFrame, minSupport: Long = 2, topK: Int = 100,
      maxBasket: Int = 100): DataFrame =
    basketLiftFrom(
      lineitem.select(col("l_orderkey").as("okey"), col("l_partkey").as("pk")),
      minSupport, topK, maxBasket)

  /** Session-type affinity (q185): [[basketLift]] with SESSIONS as the
    * baskets and event TYPES as the items — which behaviors co-occur in
    * one sitting beyond chance (q144's transitions are ordered and
    * adjacent; this is unordered within-session co-presence). Sessions
    * come from the q154 inactivity-gap derivation; the basket machinery
    * is reused verbatim (it is item-type-agnostic — `<` orders strings
    * as well as part keys). */
  def sessionTypeAffinity(events: DataFrame, gapSec: Long = 1800,
      minSupport: Long = 2, topK: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val sess = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("pts", lag(col("ts"), 1).over(w))
      .withColumn("new_sess",
        when(col("pts").isNull ||
          col("ts").cast("double") - col("pts").cast("double") > gapSec.toDouble,
          1L).otherwise(0L))
      .withColumn("sess", sum(col("new_sess")).over(w))
      .select(concat(col("user_id").cast("string"), lit(":"),
        col("sess").cast("string")).as("okey"), col("event_type").as("pk"))
    basketLiftFrom(sess, minSupport, topK, maxBasket = 100)
      .withColumnRenamed("part_a", "type_a")
      .withColumnRenamed("part_b", "type_b")
  }

  /** The generic core: `items` is any (okey, pk) relation. */
  private def basketLiftFrom(items0: DataFrame, minSupport: Long, topK: Int,
      maxBasket: Int): DataFrame = {
    val items = items0
      .distinct()
      .localCheckpoint(eager = false) // consumers: sizes + filtered frame
    val sizes = items.groupBy("okey").agg(count(lit(1)).as("bsz"))
    val ok = items.join(sizes.filter(col("bsz") <= maxBasket), Seq("okey"))
      .select("okey", "pk")
      .localCheckpoint(eager = false) // consumers: total, item counts, 2 join sides
    val nOrders = ok.select("okey").distinct().agg(count(lit(1)).as("n_orders"))
    val itemN = ok.groupBy("pk").agg(count(lit(1)).as("n_item"))
    val pairs = ok.as("a")
      .join(ok.as("b"),
        col("a.okey") === col("b.okey") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("part_a"), col("b.pk").as("part_b"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minSupport)
    pairs
      .join(itemN.select(col("pk").as("part_a"), col("n_item").as("n_a")),
        Seq("part_a"))
      .join(itemN.select(col("pk").as("part_b"), col("n_item").as("n_b")),
        Seq("part_b"))
      .crossJoin(broadcast(nOrders))
      .select(col("part_a"), col("part_b"), col("n_pair"), col("n_a"),
        col("n_b"),
        round(col("n_pair").cast("double") / col("n_orders"), 6).as("support"),
        round((col("n_pair") * col("n_orders")).cast("double")
          / (col("n_a") * col("n_b")), 6).as("lift"))
      .orderBy(col("lift").desc, col("part_a"), col("part_b"))
      .limit(topK)
  }

  def defs: Map[String, QueryDef] = Map(

    // ---- market-basket pair lift: support-pruned co-occurrence with
    //      lift vs independence, hot baskets excluded up front. ----
    "q152_basket_lift" -> QueryDef.sql(
      """WITH it AS (SELECT DISTINCT l_orderkey AS okey, l_partkey AS pk
        |            FROM lineitem),
        |sz AS (SELECT okey, count(*) AS bsz FROM it GROUP BY 1),
        |ok AS (SELECT it.okey, it.pk FROM it JOIN sz USING (okey)
        |       WHERE bsz <= 100),
        |n AS (SELECT count(DISTINCT okey) AS n_orders FROM ok),
        |itn AS (SELECT pk, count(*) AS n_item FROM ok GROUP BY 1),
        |p AS (SELECT a.pk AS part_a, b.pk AS part_b, count(*) AS n_pair
        |      FROM ok a JOIN ok b ON a.okey = b.okey AND a.pk < b.pk
        |      GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT part_a, part_b, n_pair, na.n_item AS n_a, nb.n_item AS n_b,
        |  round(CAST(n_pair AS DOUBLE) / n_orders, 6) AS support,
        |  round(CAST(n_pair * n_orders AS DOUBLE) / (na.n_item * nb.n_item), 6) AS lift
        |FROM p
        |JOIN itn na ON na.pk = part_a
        |JOIN itn nb ON nb.pk = part_b
        |CROSS JOIN n
        |ORDER BY lift DESC, part_a, part_b LIMIT 100""") { (s, dir) =>
      basketLift(Tables.lineitem(s, dir))
    },

    // ---- session-type affinity: basket lift over (session, event type)
    //      — unordered within-session co-presence vs chance. ----
    "q185_session_type_affinity" -> QueryDef.sql(
      """WITH o AS (SELECT user_id, ts, event_id, event_type,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
        |  FROM events),
        |s AS (SELECT *, sum(CASE WHEN pts IS NULL
        |      OR epoch(ts) - epoch(pts) > 1800.0 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM o),
        |it AS (SELECT DISTINCT CAST(user_id AS VARCHAR) || ':' ||
        |         CAST(sess AS VARCHAR) AS okey, event_type AS pk FROM s),
        |sz AS (SELECT okey, count(*) AS bsz FROM it GROUP BY 1),
        |ok AS (SELECT it.okey, it.pk FROM it JOIN sz USING (okey)
        |       WHERE bsz <= 100),
        |n AS (SELECT count(DISTINCT okey) AS n_orders FROM ok),
        |itn AS (SELECT pk, count(*) AS n_item FROM ok GROUP BY 1),
        |p AS (SELECT a.pk AS type_a, b.pk AS type_b, count(*) AS n_pair
        |      FROM ok a JOIN ok b ON a.okey = b.okey AND a.pk < b.pk
        |      GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT type_a, type_b, n_pair, na.n_item AS n_a, nb.n_item AS n_b,
        |  round(CAST(n_pair AS DOUBLE) / n_orders, 6) AS support,
        |  round(CAST(n_pair * n_orders AS DOUBLE) / (na.n_item * nb.n_item), 6) AS lift
        |FROM p
        |JOIN itn na ON na.pk = type_a
        |JOIN itn nb ON nb.pk = type_b
        |CROSS JOIN n
        |ORDER BY lift DESC, type_a, type_b LIMIT 100""") { (s, dir) =>
      sessionTypeAffinity(Tables.events(s, dir))
    })
}
