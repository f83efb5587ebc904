package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions._
import graft.sources.Sources

/** The remaining TPC-H query shapes, adapted to the testdata schema (no
  * partsupp / commitdate / shipmode / phone columns — each query keeps its
  * distinctive SQL pattern over the columns that exist).
  *
  * Together with Relational/Analytics this completes the published TPC-H
  * shape catalog: Q2 correlated-min supplier, Q4 EXISTS priority count,
  * Q8 market share, Q9 profit, Q10 returned items, Q11 important stock
  * (HAVING vs scalar-subquery fraction), Q15 max-revenue view, Q16
  * NOT-IN + COUNT DISTINCT, Q18 IN-aggregated-subquery large orders,
  * Q20 nested-IN potential promotion, Q21 EXISTS/NOT-EXISTS self-joins,
  * Q22 anti-join over an average-balance scalar.
  *
  * Scale notes (100 TB): region/nation/supplier are broadcast everywhere
  * (TPC-H ratios keep them tiny); part/customer joins go through the
  * default shuffle path so AQE can pick broadcast at small SF and
  * shuffle-hash at large SF. All double aggregates use [[xsum]] (exact
  * decimal intermediates) so results are partitioning-invariant and
  * bit-identical to the DuckDB oracle.
  */
object TpchExt {
  type Q = (SparkSession, String) => DataFrame

  /** Q2 shape: per part, the eligible supplier with the minimum average
    * unit price (correlated-min via row_number, tie-break on suppkey).
    */
  def qMinCostSupplier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val eligSupp = Sources.supplier(s, dir)
      .join(broadcast(Sources.nation(s, dir)), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(Sources.region(s, dir).filter($"r_name" === "EUROPE")),
        $"n_regionkey" === $"r_regionkey")
      .select($"s_suppkey", $"s_name")
    val parts = Sources.part(s, dir)
      .filter($"p_size" < 15 && $"p_type" === "ECONOMY")
      .select($"p_partkey", $"p_name")
    val costs = Sources.lineitem(s, dir)
      .join(broadcast(parts), $"l_partkey" === $"p_partkey")
      .join(broadcast(eligSupp), $"l_suppkey" === $"s_suppkey")
      .groupBy($"p_partkey", $"p_name", $"s_name", $"l_suppkey")
      // quantity-weighted unit price: both decimal sums are exact (inputs
      // have <=2 dp), so the single IEEE division is engine-identical —
      // a per-row price/qty division would hit decimal rounding boundaries.
      .agg((xsum($"l_extendedprice") / xsum($"l_quantity")).as("unit_cost"))
    // partkey cardinality is high and unskewed — a per-part window is safe.
    val w = Window.partitionBy($"p_partkey").orderBy($"unit_cost", $"l_suppkey")
    costs.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"p_partkey", $"p_name", $"s_name", $"unit_cost")
      .orderBy($"p_partkey")
  }

  /** Q4 shape: order-priority counts for orders with at least one line
    * shipped more than 60 days after the order date (EXISTS semi-join with
    * an interval predicate).
    */
  def qOrderPriority(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ord = Sources.orders(s, dir)
      .filter($"o_orderdate" >= lit("1996-07-01").cast("timestamp") &&
        $"o_orderdate" < lit("1996-10-01").cast("timestamp"))
    val li = Sources.lineitem(s, dir).select($"l_orderkey", $"l_shipdate")
    ord.join(li, $"o_orderkey" === $"l_orderkey" &&
        $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS"), "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority")
  }

  /** Q8 shape: market share of one supplier nation within a customer
    * region, per order year — a conditional-sum ratio over a 6-way join.
    */
  def qMarketShare(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val custAm = Sources.customer(s, dir)
      .join(broadcast(Sources.nation(s, dir).filter($"n_regionkey" === 1)),
        $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey")
    val suppNation = Sources.supplier(s, dir)
      .join(broadcast(Sources.nation(s, dir)
        .select($"n_nationkey", $"n_name".as("supp_nation"))),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"supp_nation")
    Sources.lineitem(s, dir)
      .join(Sources.orders(s, dir), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(custAm), $"o_custkey" === $"c_custkey")
      .join(broadcast(suppNation), $"l_suppkey" === $"s_suppkey")
      .withColumn("o_year", year($"o_orderdate").cast("long"))
      .withColumn("rev", $"l_extendedprice" * (lit(1) - $"l_discount"))
      .groupBy($"o_year")
      .agg(
        xsum(when($"supp_nation" === "NATION_5", $"rev").otherwise(lit(0.0)))
          .as("nation_rev"),
        xsum($"rev").as("total_rev"))
      .select($"o_year", ($"nation_rev" / $"total_rev").as("mkt_share"),
        $"total_rev")
      .orderBy($"o_year")
  }

  /** Q9 shape: profit by supplier nation and order year over parts matching
    * a LIKE pattern; cost synthesized as 10% of retail price per unit.
    */
  def qProfit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val redParts = Sources.part(s, dir).filter($"p_name".contains("red"))
      .select($"p_partkey", $"p_retailprice")
    val suppNation = Sources.supplier(s, dir)
      .join(broadcast(Sources.nation(s, dir)), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name")
    Sources.lineitem(s, dir)
      .join(broadcast(redParts), $"l_partkey" === $"p_partkey")
      .join(broadcast(suppNation), $"l_suppkey" === $"s_suppkey")
      .join(Sources.orders(s, dir).select($"o_orderkey", $"o_orderdate"),
        $"l_orderkey" === $"o_orderkey")
      .withColumn("o_year", year($"o_orderdate").cast("long"))
      .groupBy($"n_name", $"o_year")
      .agg(xsum($"l_extendedprice" * (lit(1) - $"l_discount") -
        $"l_quantity" * $"p_retailprice" * 0.1).as("profit"))
      .orderBy($"n_name", $"o_year".desc)
  }

  /** Q10 shape: top-20 customers by lost revenue from returned items in a
    * quarter (fact-fact join + dim joins + agg + top-k).
    */
  def qReturnedItems(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ord = Sources.orders(s, dir)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1996-04-01").cast("timestamp"))
      .select($"o_orderkey", $"o_custkey")
    val custN = Sources.customer(s, dir)
      .join(broadcast(Sources.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"c_name", $"c_acctbal", $"n_name")
    Sources.lineitem(s, dir)
      .filter($"l_returnflag" === "R")
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(custN), $"o_custkey" === $"c_custkey")
      .groupBy($"c_custkey", $"c_name", $"c_acctbal", $"n_name")
      .agg(xsum($"l_extendedprice" * (lit(1) - $"l_discount")).as("revenue"))
      .orderBy($"revenue".desc, $"c_custkey")
      .limit(20)
  }

  /** Q11 shape: parts whose sales value through one region's suppliers
    * exceeds a fixed fraction of that region's total (HAVING against a
    * scalar-subquery threshold, broadcast back).
    */
  def qImportantStock(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val asiaSupp = Sources.supplier(s, dir)
      .join(broadcast(Sources.nation(s, dir).filter($"n_regionkey" === 2)),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey")
    val asiaLines = Sources.lineitem(s, dir)
      .join(broadcast(asiaSupp), $"l_suppkey" === $"s_suppkey")
      .select($"l_partkey", $"l_extendedprice")
    val total = asiaLines.agg(xsum($"l_extendedprice").as("t"))
    asiaLines.groupBy($"l_partkey")
      .agg(xsum($"l_extendedprice").as("value"))
      .crossJoin(broadcast(total))
      .filter($"value" > $"t" * 0.001)
      .select($"l_partkey", $"value")
      .orderBy($"value".desc, $"l_partkey")
  }

  /** Q15 shape: suppliers achieving the maximum quarterly revenue (an
    * aggregated view compared against its own max — scalar subquery).
    */
  def qTopSupplier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val revenue = Sources.lineitem(s, dir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1996-04-01").cast("timestamp"))
      .groupBy($"l_suppkey")
      .agg(xsum($"l_extendedprice" * (lit(1) - $"l_discount")).as("total_revenue"))
    val maxRev = revenue.agg(max($"total_revenue").as("m"))
    revenue.crossJoin(broadcast(maxRev))
      .filter($"total_revenue" === $"m")
      .join(broadcast(Sources.supplier(s, dir)), $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name", $"total_revenue")
      .orderBy($"s_suppkey")
  }

  /** Q16 shape: distinct supplier counts per part attribute group, with a
    * NOT-IN exclusion subquery (suppliers in deficit).
    */
  def qPartsSupplierCount(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val parts = Sources.part(s, dir)
      .filter($"p_brand" =!= "Brand#1" && $"p_type" =!= "PROMO" &&
        $"p_size".isin(1, 4, 9, 16, 25, 36, 49))
      .select($"p_partkey", $"p_brand", $"p_type", $"p_size")
    val deficitSupp = Sources.supplier(s, dir)
      .filter($"s_acctbal" < 0).select($"s_suppkey")
    Sources.lineitem(s, dir)
      .join(broadcast(parts), $"l_partkey" === $"p_partkey")
      .join(broadcast(deficitSupp), $"l_suppkey" === $"s_suppkey", "left_anti")
      .groupBy($"p_brand", $"p_type", $"p_size")
      .agg(count_distinct($"l_suppkey").as("supplier_cnt"))
      .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")
  }

  /** Q18 shape: large orders — orderkeys whose total quantity exceeds a
    * threshold (IN over an aggregated subquery), joined back to
    * customer/orders detail.
    */
  def qLargeOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Sources.lineitem(s, dir)
    val bigOrders = li.groupBy($"l_orderkey".as("big_orderkey"))
      .agg(xsum($"l_quantity").as("sum_qty"))
      .filter($"sum_qty" > 300)
    Sources.orders(s, dir)
      .join(bigOrders, $"o_orderkey" === $"big_orderkey")
      .join(Sources.customer(s, dir), $"o_custkey" === $"c_custkey")
      .select($"c_name", $"c_custkey", $"o_orderkey",
        epochS($"o_orderdate").as("o_orderdate_s"), $"o_totalprice", $"sum_qty")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(100)
  }

  /** Q20 shape: suppliers in one region who shipped more than a threshold
    * quantity of pattern-matched parts in a year — nested IN subqueries
    * with a HAVING aggregate.
    */
  def qPotentialPromo(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val redPartKeys = Sources.part(s, dir)
      .filter($"p_name".startsWith("red")).select($"p_partkey")
    val bigShippers = Sources.lineitem(s, dir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-01-01").cast("timestamp"))
      .join(broadcast(redPartKeys), $"l_partkey" === $"p_partkey", "left_semi")
      .groupBy($"l_suppkey")
      .agg(xsum($"l_quantity").as("qty"))
      .filter($"qty" > 350)
      .select($"l_suppkey")
    Sources.supplier(s, dir)
      .join(broadcast(Sources.nation(s, dir)), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(Sources.region(s, dir).filter($"r_name" === "EUROPE")),
        $"n_regionkey" === $"r_regionkey")
      .join(broadcast(bigShippers), $"s_suppkey" === $"l_suppkey", "left_semi")
      .select($"s_suppkey", $"s_name")
      .orderBy($"s_suppkey")
  }

  /** Q21 shape: suppliers who were the last to ship in multi-supplier
    * finished orders — an EXISTS plus a NOT-EXISTS self-join on lineitem.
    * Both self-joins shuffle on orderkey only (co-partitioned).
    */
  def qWaitingSuppliers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Sources.lineitem(s, dir)
      .select($"l_orderkey", $"l_suppkey", $"l_shipdate")
    val suppEur = Sources.supplier(s, dir)
      .join(broadcast(Sources.nation(s, dir)), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(Sources.region(s, dir).filter($"r_name" === "EUROPE")),
        $"n_regionkey" === $"r_regionkey")
      .select($"s_suppkey", $"s_name")
    val fOrders = Sources.orders(s, dir).filter($"o_orderstatus" === "F")
      .select($"o_orderkey")
    val l1 = li
      .join(broadcast(suppEur), $"l_suppkey" === $"s_suppkey")
      .join(fOrders, $"l_orderkey" === $"o_orderkey", "left_semi")
    val l2 = li.select($"l_orderkey".as("o2"), $"l_suppkey".as("s2"))
    val l3 = li.select($"l_orderkey".as("o3"), $"l_suppkey".as("s3"),
      $"l_shipdate".as("d3"))
    l1.join(l2, $"l_orderkey" === $"o2" && $"l_suppkey" =!= $"s2", "left_semi")
      .join(l3, $"l_orderkey" === $"o3" && $"l_suppkey" =!= $"s3" &&
        $"d3" > $"l_shipdate", "left_anti")
      .groupBy($"s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy($"numwait".desc, $"s_name")
      .limit(20)
  }

  /** Q22 shape: high-balance customers in selected nations with no recent
    * orders (scalar average subquery + anti join), grouped by nation.
    */
  def qSalesOpportunity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nations = Seq(1, 7, 13, 19, 24)
    val cust = Sources.customer(s, dir).filter($"c_nationkey".isin(nations: _*))
    val avgBal = cust.filter($"c_acctbal" > 0)
      .agg(xavg($"c_acctbal").as("ab"))
    val recentOrders = Sources.orders(s, dir)
      .filter($"o_orderdate" >= lit("2000-06-01").cast("timestamp"))
      .select($"o_custkey")
    cust.crossJoin(broadcast(avgBal))
      .filter($"c_acctbal" > $"ab")
      .join(recentOrders, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_nationkey")
      .agg(count(lit(1)).as("numcust"), xsum($"c_acctbal").as("totacctbal"))
      .orderBy($"c_nationkey")
  }

  private val decSum = "CAST(SUM(CAST(%s AS DECIMAL(27,6))) AS DOUBLE)"
  private def dsum(e: String) = decSum.format(e)

  /** Q13 shape (custdist): distribution of customers by order count,
    * INCLUDING zero-order customers (the left-outer + count(order) trick —
    * count of a null-side column is 0, not 1), with a predicate on the
    * order side ('not special requests' → exclude LOW priority here).
    */
  def qCustDist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perCust = Sources.customer(s, dir)
      .join(Sources.orders(s, dir)
          .filter($"o_orderpriority" =!= "5-LOW"),
        $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
    perCust.groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }

  val queries: Map[String, Q] = Map(
    "q_custdist" -> qCustDist,
    "q_min_cost_supplier" -> qMinCostSupplier,
    "q_order_priority" -> qOrderPriority,
    "q_market_share" -> qMarketShare,
    "q_profit" -> qProfit,
    "q_returned_items" -> qReturnedItems,
    "q_important_stock" -> qImportantStock,
    "q_top_supplier" -> qTopSupplier,
    "q_parts_supplier_count" -> qPartsSupplierCount,
    "q_large_orders" -> qLargeOrders,
    "q_potential_promo" -> qPotentialPromo,
    "q_waiting_suppliers" -> qWaitingSuppliers,
    "q_sales_opportunity" -> qSalesOpportunity)

  val oracles: Map[String, String] = Map(
    "q_custdist" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        |  FROM customer c
        |  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |    AND o.o_orderpriority <> '5-LOW'
        |  GROUP BY c.c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q_min_cost_supplier" ->
      s"""WITH costs AS (
         |  SELECT p_partkey, p_name, s_name, l_suppkey,
         |    ${dsum("l_extendedprice")}/${dsum("l_quantity")} AS unit_cost
         |  FROM lineitem
         |  JOIN part ON l_partkey = p_partkey
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |  WHERE r_name = 'EUROPE' AND p_size < 15 AND p_type = 'ECONOMY'
         |  GROUP BY p_partkey, p_name, s_name, l_suppkey)
         |SELECT p_partkey, p_name, s_name, unit_cost FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY p_partkey
         |    ORDER BY unit_cost, l_suppkey) AS rn FROM costs)
         |WHERE rn = 1 ORDER BY p_partkey""".stripMargin,
    "q_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_market_share" ->
      s"""SELECT o_year, nation_rev/total_rev AS mkt_share, total_rev FROM (
         |  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
         |    ${dsum("CASE WHEN n2.n_name = 'NATION_5' THEN l_extendedprice*(1-l_discount) ELSE 0.0 END")} AS nation_rev,
         |    ${dsum("l_extendedprice*(1-l_discount)")} AS total_rev
         |  FROM lineitem
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
         |  WHERE n1.n_regionkey = 1
         |  GROUP BY 1)
         |ORDER BY o_year""".stripMargin,
    "q_profit" ->
      s"""SELECT n_name, CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
         |  ${dsum("l_extendedprice*(1-l_discount) - l_quantity*p_retailprice*0.1")} AS profit
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN orders ON l_orderkey = o_orderkey
         |WHERE p_name LIKE '%red%'
         |GROUP BY n_name, o_year
         |ORDER BY n_name, o_year DESC""".stripMargin,
    "q_returned_items" ->
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         |  ${dsum("l_extendedprice*(1-l_discount)")} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
         |GROUP BY c_custkey, c_name, c_acctbal, n_name
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q_important_stock" ->
      s"""SELECT l_partkey, ${dsum("l_extendedprice")} AS value
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE n_regionkey = 2
         |GROUP BY l_partkey
         |HAVING ${dsum("l_extendedprice")} > 0.001 * (
         |  SELECT ${dsum("l_extendedprice")}
         |  FROM lineitem
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  WHERE n_regionkey = 2)
         |ORDER BY value DESC, l_partkey""".stripMargin,
    "q_top_supplier" ->
      s"""WITH revenue AS (
         |  SELECT l_suppkey, ${dsum("l_extendedprice*(1-l_discount)")} AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM revenue JOIN supplier ON l_suppkey = s_suppkey
         |WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
         |ORDER BY s_suppkey""".stripMargin,
    "q_parts_supplier_count" ->
      """SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        |  AND p_size IN (1,4,9,16,25,36,49)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q_large_orders" ->
      s"""SELECT c_name, c_custkey, o_orderkey,
         |  CAST(epoch(o_orderdate) AS BIGINT) AS o_orderdate_s,
         |  o_totalprice, sum_qty
         |FROM orders
         |JOIN (SELECT l_orderkey, ${dsum("l_quantity")} AS sum_qty
         |      FROM lineitem GROUP BY l_orderkey
         |      HAVING ${dsum("l_quantity")} > 300) big
         |  ON o_orderkey = big.l_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q_potential_promo" ->
      s"""SELECT s_suppkey, s_name
         |FROM supplier
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'EUROPE'
         |  AND s_suppkey IN (
         |    SELECT l_suppkey FROM lineitem
         |    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
         |      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
         |    GROUP BY l_suppkey
         |    HAVING ${dsum("l_quantity")} > 350)
         |ORDER BY s_suppkey""".stripMargin,
    "q_waiting_suppliers" ->
      """SELECT s_name, COUNT(*) AS numwait
        |FROM lineitem l1
        |JOIN supplier ON s_suppkey = l1.l_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |WHERE r_name = 'EUROPE' AND o_orderstatus = 'F'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > l1.l_shipdate)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,
    "q_sales_opportunity" ->
      s"""SELECT c_nationkey, COUNT(*) AS numcust, ${dsum("c_acctbal")} AS totacctbal
         |FROM customer
         |WHERE c_nationkey IN (1,7,13,19,24)
         |  AND c_acctbal > (
         |    SELECT ${dsum("c_acctbal")}/COUNT(*) FROM customer
         |    WHERE c_acctbal > 0 AND c_nationkey IN (1,7,13,19,24))
         |  AND NOT EXISTS (SELECT 1 FROM orders
         |    WHERE o_custkey = c_custkey
         |      AND o_orderdate >= TIMESTAMP '2000-06-01 00:00:00')
         |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)
}
