package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._
import graft.sources.Sources

/** Relational core: scans with pushdown, grouped aggregation, multi-way
  * joins (broadcast dims), semi/anti/outer joins, distinct, union, sort,
  * limit, SQL window functions.
  *
  * These are the batch-analytics backbone of the engine; each query has a
  * DuckDB oracle in [[oracles]]. Double aggregates go through
  * [[graft.functions.xsum]] (exact decimal intermediate) so results are
  * identical across engines and partitionings.
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  /** TPC-H Q1-style pricing summary: multi-key groupBy with algebraic
    * aggregates only (map-side partials at scale).
    */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Sources.lineitem(s, dir)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        xsum($"l_quantity").as("sum_qty"),
        xsum($"l_extendedprice").as("sum_base_price"),
        xsum($"l_extendedprice" * (lit(1) - $"l_discount")).as("sum_disc_price"),
        xsum($"l_extendedprice" * (lit(1) - $"l_discount") * (lit(1) + $"l_tax")).as("sum_charge"),
        xavg($"l_quantity").as("avg_qty"),
        xavg($"l_extendedprice").as("avg_price"),
        xavg($"l_discount").as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** TPC-H Q6-style: pure filter + scalar aggregate. The predicate and the
    * 2-column projection must reach the parquet scan (PushedFilters).
    */
  def q6Revenue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Sources.lineitem(s, dir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-01-01").cast("timestamp") &&
        $"l_discount".between(0.05, 0.07) && $"l_quantity" < 24)
      .agg(xsum($"l_extendedprice" * $"l_discount").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q3-style shipping priority: selective fact-fact join chain with
    * agg + top-k. Customer filter first so the join input shrinks early.
    */
  def q3ShippingPriority(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = Sources.customer(s, dir).filter($"c_mktsegment" === "BUILDING")
    val ord = Sources.orders(s, dir)
      .filter($"o_orderdate" < lit("1998-03-15").cast("timestamp"))
    val li = Sources.lineitem(s, dir)
      .filter($"l_shipdate" > lit("1998-03-15").cast("timestamp"))
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(xsum($"l_extendedprice" * (lit(1) - $"l_discount")).as("revenue"))
      .select($"l_orderkey", epochS($"o_orderdate").as("o_orderdate_s"),
        $"o_orderpriority", $"revenue")
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }

  /** TPC-H Q5-style: 6-way join across the star schema; all dims broadcast
    * (region/nation/supplier/customer are tiny at TPC-H ratios).
    */
  def q5LocalVolume(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val region = Sources.region(s, dir).filter($"r_name" === "ASIA")
    val nation = Sources.nation(s, dir)
    val cust = Sources.customer(s, dir)
    val supp = Sources.supplier(s, dir)
    val ord = Sources.orders(s, dir)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
    Sources.lineitem(s, dir)
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(supp), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey" &&
        $"c_nationkey" === $"s_nationkey")
      .join(broadcast(nation), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(xsum($"l_extendedprice" * (lit(1) - $"l_discount")).as("revenue"))
      .orderBy($"revenue".desc)
  }

  /** Left-semi join (EXISTS): customers having at least one open order. */
  def qSemiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val open = Sources.orders(s, dir).filter($"o_orderstatus" === "O")
    Sources.customer(s, dir)
      .join(open, $"c_custkey" === $"o_custkey", "left_semi")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"), xsum($"c_acctbal").as("sum_bal"))
      .orderBy($"c_mktsegment")
  }

  /** Left-anti join (NOT EXISTS): customers with no orders at all. */
  def qAntiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Sources.customer(s, dir)
      .join(Sources.orders(s, dir), $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  /** Left-outer join with null-side aggregation: order counts per customer
    * including zero-order customers.
    */
  def qOuterJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perCust = Sources.customer(s, dir)
      .join(Sources.orders(s, dir), $"c_custkey" === $"o_custkey", "left_outer")
      .groupBy($"c_custkey", $"c_mktsegment")
      .agg(count($"o_orderkey").as("n_orders"))
    perCust.groupBy($"c_mktsegment", $"n_orders")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy($"c_mktsegment", $"n_orders")
  }

  /** Distinct (dedup operator in its relational form). */
  def qDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Sources.orders(s, dir)
      .select($"o_orderstatus", $"o_orderpriority").distinct()
      .orderBy($"o_orderstatus", $"o_orderpriority")
  }

  /** SQL window functions: top-2 parts per brand by retail price
    * (row_number over partitioned sort) + running brand total.
    */
  def qWindowRank(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val w = Window.partitionBy($"p_brand").orderBy($"p_retailprice".desc, $"p_partkey")
    Sources.part(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 2)
      .select($"p_brand", $"rn".cast("long").as("rn"), $"p_partkey", $"p_retailprice")
      .orderBy($"p_brand", $"rn")
  }

  /** HAVING + scalar subquery: market segments whose average balance beats
    * the global average.
    */
  def qHavingAvg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = Sources.customer(s, dir)
    val globalAvg = cust.agg(xavg($"c_acctbal").as("g")).select($"g")
    cust.groupBy($"c_mktsegment")
      .agg(xavg($"c_acctbal").as("avg_bal"), count(lit(1)).as("n"))
      .crossJoin(broadcast(globalAvg))
      .filter($"avg_bal" > $"g")
      .select($"c_mktsegment", $"avg_bal", $"n")
      .orderBy($"c_mktsegment")
  }

  private val decSum = "CAST(SUM(CAST(%s AS DECIMAL(27,6))) AS DOUBLE)"
  private def dsum(e: String) = decSum.format(e)

  val queries: Map[String, Q] = Map(
    "q1_pricing_summary" -> q1PricingSummary,
    "q6_revenue" -> q6Revenue,
    "q3_shipping_priority" -> q3ShippingPriority,
    "q5_local_volume" -> q5LocalVolume,
    "q_semi_join" -> qSemiJoin,
    "q_anti_join" -> qAntiJoin,
    "q_outer_join" -> qOuterJoin,
    "q_distinct" -> qDistinct,
    "q_window_rank" -> qWindowRank,
    "q_having_avg" -> qHavingAvg)

  val oracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${dsum("l_quantity")} AS sum_qty,
         |  ${dsum("l_extendedprice")} AS sum_base_price,
         |  ${dsum("l_extendedprice*(1-l_discount)")} AS sum_disc_price,
         |  ${dsum("l_extendedprice*(1-l_discount)*(1+l_tax)")} AS sum_charge,
         |  ${dsum("l_quantity")}/COUNT(*) AS avg_qty,
         |  ${dsum("l_extendedprice")}/COUNT(*) AS avg_price,
         |  ${dsum("l_discount")}/COUNT(*) AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q6_revenue" ->
      s"""SELECT ${dsum("l_extendedprice*l_discount")} AS revenue, COUNT(*) AS n_items
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
         |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q3_shipping_priority" ->
      s"""SELECT l_orderkey, CAST(epoch(o_orderdate) AS BIGINT) AS o_orderdate_s,
         |  o_orderpriority, ${dsum("l_extendedprice*(1-l_discount)")} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_local_volume" ->
      s"""SELECT n_name, ${dsum("l_extendedprice*(1-l_discount)")} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         |GROUP BY n_name ORDER BY revenue DESC""".stripMargin,
    "q_semi_join" ->
      s"""SELECT c_mktsegment, COUNT(*) AS n_customers, ${dsum("c_acctbal")} AS sum_bal
         |FROM customer
         |WHERE EXISTS (SELECT 1 FROM orders
         |  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_outer_join" ->
      """SELECT c_mktsegment, n_orders, COUNT(*) AS n_customers FROM (
        |  SELECT c.c_custkey, c.c_mktsegment, COUNT(o.o_orderkey) AS n_orders
        |  FROM customer c LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
        |  GROUP BY c.c_custkey, c.c_mktsegment)
        |GROUP BY c_mktsegment, n_orders ORDER BY c_mktsegment, n_orders""".stripMargin,
    "q_distinct" ->
      """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    "q_window_rank" ->
      """SELECT p_brand, rn, p_partkey, p_retailprice FROM (
        |  SELECT p_brand, p_partkey, p_retailprice,
        |    ROW_NUMBER() OVER (PARTITION BY p_brand
        |      ORDER BY p_retailprice DESC, p_partkey) AS rn
        |  FROM part)
        |WHERE rn <= 2 ORDER BY p_brand, rn""".stripMargin,
    "q_having_avg" ->
      s"""SELECT c_mktsegment, ${dsum("c_acctbal")}/COUNT(*) AS avg_bal, COUNT(*) AS n
         |FROM customer
         |GROUP BY c_mktsegment
         |HAVING ${dsum("c_acctbal")}/COUNT(*) >
         |  (SELECT ${dsum("c_acctbal")}/COUNT(*) FROM customer)
         |ORDER BY c_mktsegment""".stripMargin)
}
