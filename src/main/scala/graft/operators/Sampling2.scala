package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._
import graft.sources.Sources

/** Weighted and skyline selection operators.
  *
  * `q_weighted_sample` — deterministic weighted top-k per stratum: each
  * row draws a pseudo-random priority `portableHash64(id) div weight`
  * (integer quotient — higher weight → proportionally smaller priority →
  * more likely selected), then keeps the k smallest per key. The
  * integer-exact stand-in for A-ES weighted reservoir sampling (priority
  * u^(1/w) ordering), reproducible across engines and runs — the
  * importance-sampling shard-builder shape.
  *
  * `q_skyline` — Pareto-front (skyline) query per order priority:
  * maximize (order date, price); a point is dominated iff some other
  * point is ≥ in both dimensions and strictly greater in one. ONE window
  * pass in date order with a suffix price max — never the naive O(n²)
  * NOT EXISTS self-join. Exact (date, price) ties are mutually
  * non-dominating, so all tied orders surface.
  *
  * Scale shapes: both are one hash-partitioned window per key; the
  * per-key window is a streaming scan (running max / row_number), no
  * whole-partition buffering, and the sample never materializes more
  * than the per-key top-k. Prices go through DECIMAL(18,2)→cents so
  * every comparison is integer-exact cross-engine.
  */
object Sampling2 {

  private def cents(price: org.apache.spark.sql.Column) =
    (price.cast("decimal(18,2)") * 100).cast("long")

  /** Weighted-without-replacement sample: 20 orders per order-priority
    * stratum, selection-weighted by o_totalprice (in cents).
    */
  def qWeightedSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val base = Sources.orders(s, dir)
      .withColumn("_wh", portableHash64(concat(lit("ws:"), $"o_orderkey")))
      .withColumn("_wt", cents($"o_totalprice") + 1)
      .select($"o_orderkey", $"o_orderpriority",
        expr("_wh DIV _wt").as("priority"))
    val win = Window.partitionBy($"o_orderpriority")
      .orderBy($"priority", $"o_orderkey")
    base.withColumn("rk", row_number().over(win).cast("long"))
      .filter($"rk" <= 20)
      .select($"o_orderpriority", $"rk", $"o_orderkey", $"priority")
      .orderBy($"o_orderpriority", $"rk")
  }

  /** Skyline per order-priority: orders not dominated in
    * (o_orderdate_s, price) — no strictly-later order with ≥ price, and
    * no same-date order with > price.
    */
  def qSkyline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val o = Sources.orders(s, dir)
      .select($"o_orderkey", $"o_orderpriority",
        epochS($"o_orderdate").as("o_orderdate_s"),
        cents($"o_totalprice").as("price_c"))
    // descending order + growing frame: Spark maintains UNBOUNDED
    // PRECEDING frames incrementally (O(n) per partition), while the
    // ASC-order twin `RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING`
    // is a shrinking frame Spark recomputes from scratch per row — O(n²),
    // measured 22 s on 150k orders. Same frame contents either way:
    // strictly-later order dates.
    val later = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_orderdate_s".desc)
      .rangeBetween(Window.unboundedPreceding, -1)
    val sameDate = Window.partitionBy($"o_orderpriority", $"o_orderdate_s")
    o.withColumn("max_later", max($"price_c").over(later))
      .withColumn("max_same_date", max($"price_c").over(sameDate))
      .filter(
        (coalesce($"max_later", lit(Long.MinValue)) < $"price_c") &&
        ($"max_same_date" <= $"price_c"))
      .select($"o_orderpriority", $"o_orderdate_s", $"price_c", $"o_orderkey")
      .orderBy($"o_orderpriority", $"o_orderdate_s", $"o_orderkey")
  }

  /** Top-k per group via the native bounded-heap aggregate
    * ([[graft.plans.TopKAgg]]): map-side partials carry at most k rows
    * per group per partition, vs the rank-window twin that shuffles
    * EVERY row before discarding all but k — the skewed-hot-key safe
    * formulation. Exact (merge of top-k heaps = top-k of union), so the
    * oracle is a plain `row_number()` window.
    */
  def qTopkPerGroup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.plans.TopKAgg.register(s, k = 5)
    Sources.orders(s, dir)
      .select($"o_orderpriority", cents($"o_totalprice").as("price_c"),
        $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(graft.plans.TopKAgg.topk(5, $"price_c", $"o_orderkey").as("top"))
      .select($"o_orderpriority", posexplode($"top"))
      .select($"o_orderpriority", ($"pos" + 1).cast("long").as("rank"),
        $"col.score".as("price_c"), $"col.id".as("o_orderkey"))
      .orderBy($"o_orderpriority", $"rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_weighted_sample" -> qWeightedSample,
    "q_skyline" -> qSkyline,
    "q_topk_pergroup" -> qTopkPerGroup)

  private def md(e: String) = s"CAST('0x'||substr(md5($e),1,15) AS BIGINT)"

  val oracles: Map[String, String] = Map(
    "q_topk_pergroup" ->
      """WITH o AS (
        |  SELECT o_orderpriority,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS price_c,
        |    o_orderkey
        |  FROM orders),
        |r AS (
        |  SELECT o_orderpriority, price_c, o_orderkey,
        |    CAST(row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY price_c DESC, o_orderkey) AS BIGINT) AS rank
        |  FROM o)
        |SELECT o_orderpriority, rank, price_c, o_orderkey FROM r
        |WHERE rank <= 5 ORDER BY o_orderpriority, rank""".stripMargin,
    "q_weighted_sample" ->
      s"""WITH w AS (
         |  SELECT o_orderkey, o_orderpriority,
         |    ${md("'ws:' || o_orderkey")} //
         |      (CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) + 1)
         |      AS priority
         |  FROM orders),
         |r AS (
         |  SELECT o_orderpriority,
         |    CAST(row_number() OVER (PARTITION BY o_orderpriority
         |      ORDER BY priority, o_orderkey) AS BIGINT) AS rk,
         |    o_orderkey, priority
         |  FROM w)
         |SELECT o_orderpriority, rk, o_orderkey, priority FROM r
         |WHERE rk <= 20 ORDER BY o_orderpriority, rk""".stripMargin,
    "q_skyline" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_orderpriority,
        |    CAST(epoch(o_orderdate) AS BIGINT) AS o_orderdate_s,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS price_c
        |  FROM orders)
        |SELECT o_orderpriority, o_orderdate_s, price_c, o_orderkey
        |FROM (
        |  SELECT o_orderpriority, o_orderdate_s, price_c, o_orderkey,
        |    max(price_c) OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_orderdate_s
        |      RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS max_later,
        |    max(price_c) OVER (PARTITION BY o_orderpriority, o_orderdate_s)
        |      AS max_same_date
        |  FROM o)
        |WHERE COALESCE(max_later, -9223372036854775808) < price_c
        |  AND max_same_date <= price_c
        |ORDER BY o_orderpriority, o_orderdate_s, o_orderkey""".stripMargin)
}
