package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._
import graft.sources.Sources

/** Second wave of relational/analytic coverage: correlated subqueries,
  * IN-subquery with HAVING, interval date arithmetic, conditional (pivot
  * -style) aggregation, disjunctive predicate pushdown, ROLLUP with
  * grouping(), exact-moment statistics (variance/stddev via decimal sums —
  * deterministic under any partitioning, unlike built-in streaming-moment
  * stddev), scalar-function surface, set operations, and union-all merge.
  */
object Analytics {
  type Q = (SparkSession, String) => DataFrame

  /** Correlated min subquery: parts priced at their brand's minimum. */
  def qMinSubquery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val part = Sources.part(s, dir)
    val mins = part.groupBy($"p_brand".as("b")).agg(min($"p_retailprice").as("min_price"))
    part.join(broadcast(mins), $"p_brand" === $"b" && $"p_retailprice" === $"min_price")
      .select($"p_brand", $"p_partkey", $"p_retailprice")
      .orderBy($"p_brand", $"p_partkey")
  }

  /** TPC-H Q4 shape: orders having a lineitem shipped >100 days after the
    * order date (EXISTS + interval arithmetic), counted per priority.
    */
  def qExistsLagged(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ord = Sources.orders(s, dir)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
    val late = Sources.lineitem(s, dir)
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .filter($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 100 DAYS"))
      .select($"l_orderkey").distinct()
    ord.join(late, $"o_orderkey" === late("l_orderkey"), "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy($"o_orderpriority")
  }

  /** TPC-H Q10 shape: top 20 customers by returned-item revenue. */
  def qTopCustomers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Sources.lineitem(s, dir).filter($"l_returnflag" === "R")
      .join(Sources.orders(s, dir), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Sources.customer(s, dir)), $"o_custkey" === $"c_custkey")
      .join(broadcast(Sources.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
      .groupBy($"c_custkey", $"c_name", $"n_name")
      .agg(xsum($"l_extendedprice" * (lit(1) - $"l_discount")).as("revenue"))
      .orderBy($"revenue".desc, $"c_custkey")
      .limit(20)
  }

  /** TPC-H Q12 shape: conditional (pivot-style) aggregation per linestatus. */
  def qConditionalAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Sources.lineitem(s, dir)
      .join(Sources.orders(s, dir), $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_linestatus")
      .agg(
        sum(when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("high_count"),
        sum(when(!$"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("low_count"))
      .orderBy($"l_linestatus")
  }

  /** TPC-H Q14 shape: promo revenue share (ratio of exact decimal sums). */
  def qPromoRatio(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Sources.lineitem(s, dir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1996-07-01").cast("timestamp"))
      .join(broadcast(Sources.part(s, dir)), $"l_partkey" === $"p_partkey")
      .agg(
        (xsum(when($"p_type" === "PROMO", $"l_extendedprice" * (lit(1) - $"l_discount"))
          .otherwise(0.0)) * 100.0 /
          xsum($"l_extendedprice" * (lit(1) - $"l_discount"))).as("promo_pct"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q19 shape: disjunctive multi-column predicates (optimizer must
    * still push the common join key).
    */
  def qDisjunctive(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Sources.lineitem(s, dir)
      .join(Sources.part(s, dir), $"l_partkey" === $"p_partkey")
      .filter(
        ($"p_brand" === "Brand#12" && $"p_size".between(1, 15) && $"l_quantity" < 15) ||
        ($"p_brand" === "Brand#23" && $"p_size".between(1, 25) && $"l_quantity".between(10, 30)) ||
        ($"p_brand" === "Brand#15" && $"p_size".between(1, 50) && $"l_quantity" > 25))
      .agg(xsum($"l_extendedprice" * (lit(1) - $"l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q18 shape: IN-subquery with HAVING — orders with total quantity
    * above a threshold, with customer context.
    */
  def qInSubqueryHaving(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val big = Sources.lineitem(s, dir)
      .groupBy($"l_orderkey")
      .agg(xsum($"l_quantity").as("total_qty"))
      .filter($"total_qty" > 150.0)
    Sources.orders(s, dir)
      .join(big, $"o_orderkey" === big("l_orderkey"))
      .join(broadcast(Sources.customer(s, dir)), $"o_custkey" === $"c_custkey")
      .select($"c_custkey", $"c_name", $"o_orderkey", $"total_qty")
      .orderBy($"total_qty".desc, $"o_orderkey")
      .limit(20)
  }

  /** ROLLUP with grouping() labels (no NULL grouping keys in the output, so
    * cross-engine row ordering stays total).
    */
  def qRollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Sources.lineitem(s, dir)
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n"), xsum($"l_quantity").as("sum_qty"),
        grouping($"l_returnflag").as("g1"), grouping($"l_linestatus").as("g2"))
      .select(
        when($"g1" === 1, "ALL").otherwise($"l_returnflag").as("returnflag"),
        when($"g2" === 1, "ALL").otherwise($"l_linestatus").as("linestatus"),
        $"n", $"sum_qty")
      .orderBy($"returnflag", $"linestatus")
  }

  /** Exact-moment statistics: population variance/stddev from decimal-exact
    * power sums — order-independent, engine-exact (built-in stddev merges
    * partial moments in partition order and is NOT reproducible).
    */
  def qStatsMoments(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val agg = Sources.events(s, dir)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        xsum($"value").as("s1"),
        xsum($"value" * $"value", 6).as("s2"))
    agg.select($"event_type", $"n",
        ($"s1" / $"n").as("mean"),
        (($"s2" * $"n" - $"s1" * $"s1") / ($"n" * $"n")).as("var_pop"))
      .withColumn("stddev_pop", sqrt($"var_pop"))
      .orderBy($"event_type")
  }

  /** Scalar-function surface: string ops + date part extraction + month
    * truncation (as epoch seconds — no raw timestamps in output).
    */
  def qScalarFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Sources.orders(s, dir)
      .filter($"o_orderkey" % 100 === 0)
      .select($"o_orderkey",
        upper(concat($"o_orderstatus", lit("-"), $"o_orderpriority")).as("tag"),
        length($"o_orderpriority").cast("long").as("prio_len"),
        substring($"o_orderpriority", 1, 3).as("prio3"),
        year($"o_orderdate").cast("long").as("y"),
        month($"o_orderdate").cast("long").as("m"),
        dayofmonth($"o_orderdate").cast("long").as("d"),
        unix_timestamp(date_trunc("month", $"o_orderdate")).as("month_start_s"))
      .orderBy($"o_orderkey")
  }

  /** INTERSECT: nation keys present in both customer and supplier. */
  def qIntersect(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Sources.customer(s, dir).select($"c_nationkey".as("nationkey"))
      .intersect(Sources.supplier(s, dir).select($"s_nationkey".as("nationkey")))
      .orderBy($"nationkey")
  }

  /** EXCEPT: nation keys with customers but no suppliers. */
  def qExcept(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Sources.customer(s, dir).select($"c_nationkey".as("nationkey"))
      .except(Sources.supplier(s, dir).select($"s_nationkey".as("nationkey")))
      .orderBy($"nationkey")
  }

  /** Reference `merge` (application.pony:118): union-all of two pipelines,
    * then aggregate downstream.
    */
  def qMergeUnion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Sources.events(s, dir)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"value")
    val signups = ev.filter($"event_type" === "signup")
      .select($"user_id", $"value")
    purchases.union(signups)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n"), xsum($"value").as("total"))
      .orderBy($"user_id")
  }

  /** Semi-structured processing: JSON path extraction from the events
    * props column, then relational ops over the extracted value.
    */
  def qJsonExtract(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Sources.events(s, dir)
      .withColumn("k", get_json_object($"props", "$.k").cast("long"))
      .groupBy(($"k" % 10).as("k_bucket"))
      .agg(count(lit(1)).as("n"), xsum($"value").as("total"),
        min($"k").as("min_k"), max($"k").as("max_k"))
      .orderBy($"k_bucket")
  }

  /** CUBE over two dimensions with grouping() labels. */
  def qCube(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Sources.orders(s, dir)
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"), xsum($"o_totalprice").as("total"),
        grouping($"o_orderstatus").as("g1"), grouping($"o_orderpriority").as("g2"))
      .select(
        when($"g1" === 1, "ALL").otherwise($"o_orderstatus").as("status"),
        when($"g2" === 1, "ALL").otherwise($"o_orderpriority").as("priority"),
        $"n", $"total")
      .orderBy($"status", $"priority")
  }

  /** lag/lead window functions: per-user deltas and next event type. */
  def qLagLead(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"event_id")
    Sources.events(s, dir)
      .withColumn("prev_delta", $"value" - lag($"value", 1).over(w))
      .withColumn("next_type", lead($"event_type", 1).over(w))
      .filter($"event_id" % 50 === 0)
      .select($"user_id", $"event_id", $"prev_delta", $"next_type")
      .orderBy($"event_id")
  }

  /** Interpolated percentiles (exact `percentile`, matching DuckDB
    * quantile_cont's linear interpolation).
    */
  def qPercentile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Sources.events(s, dir)
      .groupBy($"event_type")
      .agg(expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.9)").as("p90"),
        count(lit(1)).as("n"))
      .orderBy($"event_type")
  }

  /** Sketch aggregate: HLL++ approximate distinct, oracled as the exact
    * count plus a bounded-relative-error check (sketch internals are
    * engine-specific; the CONTRACT — estimate within rsd bounds of the
    * truth — is what's gated).
    */
  def qApproxDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val exact = countDistinct($"user_id")
    val approx = approx_count_distinct($"user_id", rsd = 0.01)
    Sources.events(s, dir).agg(
      exact.as("exact_users"),
      (abs(approx - exact).cast("double") / exact <= 0.05).as("approx_ok"))
  }

  /** Native mergeable HLL sketch ([[graft.plans.HllSketchAgg]]) gated like
    * [[qApproxDistinct]]: exact count + a bounded-relative-error contract
    * (the sketch itself is partitioning-invariant — see HllSketchSpec).
    */
  def qHllDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.plans.HllSketchAgg.register(s)
    val exact = countDistinct($"user_id")
    val est = graft.plans.HllSketchAgg.hllDistinct($"user_id")
    Sources.events(s, dir).agg(
      exact.as("exact_users"),
      (abs(est - exact).cast("double") / exact <= 0.05).as("hll_ok"))
  }

  /** GROUPING SETS beyond rollup/cube: an explicit, non-hierarchical set
    * list ((status, priority), (status), ()) with grouping() disambiguation.
    */
  def qGroupingSets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Sources.orders(s, dir)
      .groupingSets(
        Seq(Seq($"o_orderstatus", $"o_orderpriority"), Seq($"o_orderstatus"), Seq()),
        $"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"), xsum($"o_totalprice").as("total"),
        grouping($"o_orderstatus").as("g1"), grouping($"o_orderpriority").as("g2"))
      .select(
        when($"g1" === 1, "ALL").otherwise($"o_orderstatus").as("status"),
        when($"g2" === 1, "ALL").otherwise($"o_orderpriority").as("priority"),
        $"n", $"total")
      .orderBy($"status", $"priority")
  }

  /** Correlated-average predicate (TPC-H Q17 shape): lineitems whose
    * quantity is below half their part's average. The comparison is
    * decimal-exact on both engines: `q*2*cnt < exact_sum` instead of
    * `q < 0.5*AVG(q)` (built-in AVG on doubles is merge-order-dependent).
    */
  def qSmallQtyRevenue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Sources.lineitem(s, dir)
    val perPart = li.groupBy($"l_partkey".as("pk"))
      .agg(count(lit(1)).as("cnt"), xsum($"l_quantity").as("sq"))
    li.join(perPart, $"l_partkey" === $"pk")
      .filter($"l_quantity" * 2.0 * $"cnt" < $"sq")
      .agg((xsum($"l_extendedprice") / 7.0).as("avg_yearly"),
        count(lit(1)).as("n_small"))
  }

  /** Relational division: customers with orders in EVERY priority class
    * (the "for all" quantifier via distinct-count equality).
    */
  def qDivision(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = Sources.orders(s, dir)
    val nPrio = orders.select($"o_orderpriority").distinct().count()
    orders.groupBy($"o_custkey")
      .agg(countDistinct($"o_orderpriority").as("n_prio"),
        count(lit(1)).as("n_orders"))
      .filter($"n_prio" === nPrio)
      .select($"o_custkey", $"n_orders")
      .orderBy($"o_custkey")
  }

  /** Volume shipping between two nations by year (TPC-H Q7 shape): a
    * 6-table join with a disjunctive cross-nation predicate, year
    * extraction, and decimal-exact revenue.
    */
  def qVolumeShipping(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val n1 = Sources.nation(s, dir).select($"n_nationkey".as("snk"), $"n_name".as("supp_nation"))
    val n2 = Sources.nation(s, dir).select($"n_nationkey".as("cnk"), $"n_name".as("cust_nation"))
    Sources.lineitem(s, dir)
      .join(Sources.orders(s, dir), $"l_orderkey" === $"o_orderkey")
      .join(Sources.customer(s, dir), $"o_custkey" === $"c_custkey")
      .join(Sources.supplier(s, dir), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(n1), $"s_nationkey" === $"snk")
      .join(broadcast(n2), $"c_nationkey" === $"cnk")
      .filter(($"supp_nation" === "FRANCE" && $"cust_nation" === "GERMANY") ||
        ($"supp_nation" === "GERMANY" && $"cust_nation" === "FRANCE"))
      .withColumn("l_year", year($"l_shipdate").cast("long"))
      .groupBy($"supp_nation", $"cust_nation", $"l_year")
      .agg(xsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
        count(lit(1)).as("n"))
      .orderBy($"supp_nation", $"cust_nation", $"l_year")
  }

  /** Mergeable histogram quantile sketch ([[graft.plans.HistQuantileAgg]])
    * gated like the other sketches: exact median + a bounded-absolute-error
    * contract (one bin width over [0, 1000) with 2000 bins = 0.5).
    */
  def qHistQuantile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.plans.HistQuantileAgg.register(s, q = 0.5, lo = 0.0, hi = 1000.0,
      bins = 2000)
    val est = graft.plans.HistQuantileAgg.histQuantile($"value")
    Sources.events(s, dir).agg(
      expr("percentile(value, 0.5)").as("exact_p50"),
      (abs(est - expr("percentile(value, 0.5)")) <= 0.5).as("sketch_ok"))
  }

  /** Per-key mergeable quantile sketches with a SAMPLED exact contract —
    * the corpus-scale form of the per-group sketch check (same protocol as
    * `q_minhash_eval_sampled`). The sketch side runs over the FULL data
    * (that's the production path: fixed-width mergeable buffers, map-side
    * combine). The EXACT `percentile()` — which buffers every value of its
    * group and was this catalog's worst sf1 scale ratio — runs only on a
    * deterministic group sample (`ascii(event_type) % 2 = 0`), so the
    * one-bin-width contract is still measured on real groups while the
    * exact side's buffered mass scales with the sample fraction, not the
    * corpus (dial the modulus up as group count grows). Unsampled groups
    * report a NULL exact_p50 and a vacuous sketch_ok.
    */
  def qHistQuantileGroup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.plans.HistQuantileAgg.register(s, q = 0.5, lo = 0.0, hi = 1000.0,
      bins = 2000)
    val est = graft.plans.HistQuantileAgg.histQuantile($"value")
    val ev = Sources.events(s, dir)
    val sketches = ev.groupBy($"event_type").agg(est.as("_est"))
    val exact = ev.filter(ascii($"event_type") % 2 === 0)
      .groupBy($"event_type")
      .agg(expr("percentile(value, 0.5)").as("exact_p50"))
    sketches.join(exact, Seq("event_type"), "left")
      .select($"event_type", $"exact_p50",
        coalesce(abs($"_est" - $"exact_p50") <= 0.5, lit(true)).as("sketch_ok"))
      .orderBy($"event_type")
  }

  val queries: Map[String, Q] = Map(
    "q_hist_quantile" -> qHistQuantile,
    "q_hist_quantile_group" -> qHistQuantileGroup,
    "q_volume_shipping" -> qVolumeShipping,
    "q_grouping_sets" -> qGroupingSets,
    "q_small_qty_revenue" -> qSmallQtyRevenue,
    "q_division" -> qDivision,
    "q_hll_distinct" -> qHllDistinct,
    "q_json_extract" -> qJsonExtract,
    "q_cube" -> qCube,
    "q_lag_lead" -> qLagLead,
    "q_percentile" -> qPercentile,
    "q_approx_distinct" -> qApproxDistinct,
    "q_min_subquery" -> qMinSubquery,
    "q_exists_lagged" -> qExistsLagged,
    "q_top_customers" -> qTopCustomers,
    "q_conditional_agg" -> qConditionalAgg,
    "q_promo_ratio" -> qPromoRatio,
    "q_disjunctive" -> qDisjunctive,
    "q_in_subquery_having" -> qInSubqueryHaving,
    "q_rollup" -> qRollup,
    "q_stats_moments" -> qStatsMoments,
    "q_scalar_funcs" -> qScalarFuncs,
    "q_intersect" -> qIntersect,
    "q_except" -> qExcept,
    "q_merge_union" -> qMergeUnion)

  private def dsum(e: String) = s"CAST(SUM(CAST($e AS DECIMAL(27,6))) AS DOUBLE)"

  val oracles: Map[String, String] = Map(
    "q_approx_distinct" ->
      """SELECT COUNT(DISTINCT user_id) AS exact_users, TRUE AS approx_ok
        |FROM events""".stripMargin,
    "q_hll_distinct" ->
      """SELECT COUNT(DISTINCT user_id) AS exact_users, TRUE AS hll_ok
        |FROM events""".stripMargin,
    "q_hist_quantile" ->
      """SELECT quantile_cont(value, 0.5) AS exact_p50, TRUE AS sketch_ok
        |FROM events""".stripMargin,
    "q_hist_quantile_group" ->
      """SELECT event_type,
        |  CASE WHEN ascii(event_type) % 2 = 0
        |       THEN quantile_cont(value, 0.5) END AS exact_p50,
        |  TRUE AS sketch_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_volume_shipping" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
         |  ${dsum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
         |  COUNT(*) AS n
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE (n1.n_name = 'FRANCE' AND n2.n_name = 'GERMANY')
         |   OR (n1.n_name = 'GERMANY' AND n2.n_name = 'FRANCE')
         |GROUP BY n1.n_name, n2.n_name, EXTRACT(year FROM l_shipdate)
         |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "q_grouping_sets" ->
      s"""SELECT
         |  CASE WHEN GROUPING(o_orderstatus)=1 THEN 'ALL' ELSE o_orderstatus END AS status,
         |  CASE WHEN GROUPING(o_orderpriority)=1 THEN 'ALL' ELSE o_orderpriority END AS priority,
         |  COUNT(*) AS n, ${dsum("o_totalprice")} AS total
         |FROM orders
         |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
         |ORDER BY status, priority""".stripMargin,
    "q_small_qty_revenue" ->
      s"""WITH p AS (
         |  SELECT l_partkey AS pk, COUNT(*) AS cnt,
         |    ${dsum("l_quantity")} AS sq
         |  FROM lineitem GROUP BY l_partkey)
         |SELECT ${dsum("l_extendedprice")}/7.0 AS avg_yearly, COUNT(*) AS n_small
         |FROM lineitem l JOIN p ON l.l_partkey = p.pk
         |WHERE l.l_quantity * 2.0 * p.cnt < p.sq""".stripMargin,
    "q_division" ->
      """SELECT o_custkey, COUNT(*) AS n_orders
        |FROM orders
        |GROUP BY o_custkey
        |HAVING COUNT(DISTINCT o_orderpriority) =
        |  (SELECT COUNT(DISTINCT o_orderpriority) FROM orders)
        |ORDER BY o_custkey""".stripMargin,
    "q_json_extract" ->
      s"""SELECT k % 10 AS k_bucket, COUNT(*) AS n, ${dsum("value")} AS total,
         |  MIN(k) AS min_k, MAX(k) AS max_k
         |FROM (SELECT CAST(props->>'k' AS BIGINT) AS k, value FROM events)
         |GROUP BY k % 10 ORDER BY k_bucket""".stripMargin,
    "q_cube" ->
      s"""SELECT
         |  CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL' ELSE o_orderstatus END AS status,
         |  CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL' ELSE o_orderpriority END AS priority,
         |  COUNT(*) AS n, ${dsum("o_totalprice")} AS total
         |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
         |ORDER BY status, priority""".stripMargin,
    "q_lag_lead" ->
      """SELECT user_id, event_id, prev_delta, next_type FROM (
        |  SELECT user_id, event_id,
        |    value - LAG(value, 1) OVER w AS prev_delta,
        |    LEAD(event_type, 1) OVER w AS next_type
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
        |WHERE event_id % 50 = 0 ORDER BY event_id""".stripMargin,
    "q_percentile" ->
      """SELECT event_type, quantile_cont(value, 0.5) AS p50,
        |  quantile_cont(value, 0.9) AS p90, COUNT(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_min_subquery" ->
      """SELECT p_brand, p_partkey, p_retailprice FROM part p
        |WHERE p_retailprice = (SELECT min(p2.p_retailprice) FROM part p2
        |  WHERE p2.p_brand = p.p_brand)
        |ORDER BY p_brand, p_partkey""".stripMargin,
    "q_exists_lagged" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 100 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_top_customers" ->
      s"""SELECT c_custkey, c_name, n_name,
         |  ${dsum("l_extendedprice*(1-l_discount)")} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |GROUP BY c_custkey, c_name, n_name
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q_conditional_agg" ->
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS low_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q_promo_ratio" ->
      s"""SELECT ${dsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice*(1-l_discount) ELSE 0.0 END")}
         |    * 100.0 / ${dsum("l_extendedprice*(1-l_discount)")} AS promo_pct,
         |  COUNT(*) AS n_items
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1996-07-01 00:00:00'""".stripMargin,
    "q_disjunctive" ->
      s"""SELECT ${dsum("l_extendedprice*(1-l_discount)")} AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity < 15)
         |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
         |   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 50 AND l_quantity > 25)""".stripMargin,
    "q_in_subquery_having" ->
      s"""SELECT c_custkey, c_name, o_orderkey, total_qty FROM orders
         |JOIN (SELECT l_orderkey, ${dsum("l_quantity")} AS total_qty
         |      FROM lineitem GROUP BY l_orderkey
         |      HAVING ${dsum("l_quantity")} > 150.0) big
         |  ON o_orderkey = big.l_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |ORDER BY total_qty DESC, o_orderkey LIMIT 20""".stripMargin,
    "q_rollup" ->
      s"""SELECT
         |  CASE WHEN GROUPING(l_returnflag) = 1 THEN 'ALL' ELSE l_returnflag END AS returnflag,
         |  CASE WHEN GROUPING(l_linestatus) = 1 THEN 'ALL' ELSE l_linestatus END AS linestatus,
         |  COUNT(*) AS n, ${dsum("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         |ORDER BY returnflag, linestatus""".stripMargin,
    "q_stats_moments" ->
      s"""SELECT event_type, n, s1 / n AS mean,
         |  (s2 * n - s1 * s1) / (n * n) AS var_pop,
         |  sqrt((s2 * n - s1 * s1) / (n * n)) AS stddev_pop
         |FROM (
         |  SELECT event_type, COUNT(*) AS n, ${dsum("value")} AS s1,
         |    ${dsum("value*value")} AS s2
         |  FROM events GROUP BY event_type)
         |ORDER BY event_type""".stripMargin,
    "q_scalar_funcs" ->
      """SELECT o_orderkey,
        |  upper(o_orderstatus || '-' || o_orderpriority) AS tag,
        |  length(o_orderpriority) AS prio_len,
        |  substring(o_orderpriority, 1, 3) AS prio3,
        |  CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS y,
        |  CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS m,
        |  CAST(EXTRACT(DAY FROM o_orderdate) AS BIGINT) AS d,
        |  CAST(epoch(date_trunc('month', o_orderdate)) AS BIGINT) AS month_start_s
        |FROM orders WHERE o_orderkey % 100 = 0
        |ORDER BY o_orderkey""".stripMargin,
    "q_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "q_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "q_merge_union" ->
      s"""SELECT user_id, COUNT(*) AS n, ${dsum("value")} AS total
         |FROM (
         |  SELECT user_id, value FROM events WHERE event_type = 'purchase'
         |  UNION ALL
         |  SELECT user_id, value FROM events WHERE event_type = 'signup')
         |GROUP BY user_id ORDER BY user_id""".stripMargin)
}
