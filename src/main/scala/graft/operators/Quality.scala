package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Sources

/** Relational data-quality expectations — the contract-check pass a
  * pipeline runs before trusting an input drop: null rates, domain/range
  * violations, duplicate keys, and referential integrity, emitted as one
  * (rule, n_violations, n_checked) report.
  *
  * Scale shape: every row-level rule folds into ONE conditional
  * aggregate over a single scan (map-side combining); the only joins are
  * the FK anti-joins, each a hash-partitioned equi-join on the key. No
  * rule materializes violating rows — counts only (the violating-row
  * drill-down is a filter the caller runs on demand).
  */
object Quality {

  def qExpectations(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Sources.lineitem(s, dir)
    val orders = Sources.orders(s, dir)
    val cust = Sources.customer(s, dir)

    // row-level rules over lineitem: one scan, one aggregate
    val rowRules = li.agg(
      count(lit(1)).as("n_rows"),
      sum(when($"l_quantity".isNull || $"l_quantity" <= 0, 1L).otherwise(0L))
        .as("bad_qty"),
      sum(when($"l_extendedprice" < 0, 1L).otherwise(0L)).as("neg_price"),
      sum(when($"l_discount" < 0 || $"l_discount" > 1, 1L).otherwise(0L))
        .as("bad_discount"),
      sum(when($"l_shipdate".isNull, 1L).otherwise(0L)).as("null_shipdate"))

    // duplicate-key rule: orders primary key
    val dupPk = orders.groupBy($"o_orderkey").agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("n_keys"),
        sum(when($"c" > 1, $"c" - 1).otherwise(0L)).as("dups"))

    // referential integrity: lineitem -> orders, orders -> customer
    val orphanLi = li.select($"l_orderkey")
      .join(orders.select($"o_orderkey"),
        $"l_orderkey" === $"o_orderkey", "left_anti")
      .agg(count(lit(1)).as("n"))
    val orphanOrd = orders.select($"o_custkey")
      .join(cust.select($"c_custkey"),
        $"o_custkey" === $"c_custkey", "left_anti")
      .agg(count(lit(1)).as("n"))

    val rows = rowRules.select(
      lit("lineitem.quantity_positive").as("rule"),
      $"bad_qty".as("n_violations"), $"n_rows".as("n_checked"))
      .union(rowRules.select(lit("lineitem.price_nonnegative"),
        $"neg_price", $"n_rows"))
      .union(rowRules.select(lit("lineitem.discount_in_unit_range"),
        $"bad_discount", $"n_rows"))
      .union(rowRules.select(lit("lineitem.shipdate_present"),
        $"null_shipdate", $"n_rows"))
      .union(dupPk.select(lit("orders.orderkey_unique"), $"dups", $"n_keys"))
      .union(orphanLi.crossJoin(rowRules.select($"n_rows"))
        .select(lit("lineitem.orderkey_references_orders"), $"n", $"n_rows"))
      .union(orphanOrd.crossJoin(dupPk.select($"n_keys"))
        .select(lit("orders.custkey_references_customer"), $"n", $"n_keys"))
    rows.orderBy($"rule")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_expectations" -> qExpectations)

  val oracles: Map[String, String] = Map(
    "q_expectations" ->
      """WITH rr AS (
        |  SELECT COUNT(*) AS n_rows,
        |    CAST(SUM(CASE WHEN l_quantity IS NULL OR l_quantity <= 0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS bad_qty,
        |    CAST(SUM(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS neg_price,
        |    CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1
        |      THEN 1 ELSE 0 END) AS BIGINT) AS bad_discount,
        |    CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS null_shipdate
        |  FROM lineitem),
        |pk AS (
        |  SELECT COUNT(*) AS n_keys,
        |    CAST(SUM(CASE WHEN c > 1 THEN c - 1 ELSE 0 END) AS BIGINT) AS dups
        |  FROM (SELECT o_orderkey, COUNT(*) AS c FROM orders
        |        GROUP BY o_orderkey)),
        |oli AS (
        |  SELECT COUNT(*) AS n FROM lineitem
        |  WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)),
        |oor AS (
        |  SELECT COUNT(*) AS n FROM orders
        |  WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
        |SELECT rule, n_violations, n_checked FROM (
        |  SELECT 'lineitem.quantity_positive' AS rule,
        |    bad_qty AS n_violations, n_rows AS n_checked FROM rr
        |  UNION ALL SELECT 'lineitem.price_nonnegative', neg_price, n_rows
        |    FROM rr
        |  UNION ALL SELECT 'lineitem.discount_in_unit_range', bad_discount,
        |    n_rows FROM rr
        |  UNION ALL SELECT 'lineitem.shipdate_present', null_shipdate, n_rows
        |    FROM rr
        |  UNION ALL SELECT 'orders.orderkey_unique', dups, n_keys FROM pk
        |  UNION ALL SELECT 'lineitem.orderkey_references_orders', oli.n,
        |    rr.n_rows FROM oli, rr
        |  UNION ALL SELECT 'orders.custkey_references_customer', oor.n,
        |    pk.n_keys FROM oor, pk)
        |ORDER BY rule""".stripMargin)
}
