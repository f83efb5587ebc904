package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._
import graft.sources.Sources

/** Reshaping + profiling surface: PIVOT (long→wide), UNPIVOT/melt
  * (wide→long), and a one-scan column-profiling report.
  *
  * Scale shapes: pivot with an explicit value list is ONE hash aggregate
  * (each pivot cell a conditional partial — no second pass to discover
  * values, which at 100 TB would be its own shuffle); unpivot is a
  * zero-shuffle projection (Spark's `Expand` node — rows×metrics without
  * touching the aggregate again); profiling computes every column's
  * stats in a single scan (count-distincts expand but remain one job)
  * instead of one pass per column.
  */
object Reshape {

  /** Quantity totals pivoted to one column per lineitem status.
    * Explicit pivot values keep this a single-pass aggregate.
    */
  def qPivot(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Sources.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(xsum($"l_quantity"))
      .orderBy($"l_returnflag")
  }

  /** Per-brand metric matrix melted back to (brand, metric, val) rows —
    * Spark's native `unpivot` (Expand), not a union of re-scans.
    */
  def qUnpivot(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wide = Sources.part(s, dir)
      .groupBy($"p_brand")
      .agg(xsum($"p_retailprice").as("total_retail"),
        sum($"p_size").cast("double").as("total_size"))
    wide.unpivot(Array(col("p_brand")),
        Array(col("total_retail"), col("total_size")), "metric", "val")
      .orderBy($"p_brand", $"metric")
  }

  /** One-scan data-profiling report over the orders table: per column
    * row/null/distinct counts plus numeric min/max (dates as epoch
    * seconds; strings profile counts only). The wide aggregate row is
    * stacked into one row per column.
    */
  def qProfile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Sources.orders(s, dir)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice",
        epochS($"o_orderdate").as("o_orderdate_s"), $"o_orderpriority")
    def stats(c: String, numeric: Boolean) = Seq(
      count(col(c)).as(s"${c}_n"),
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nn"),
      countDistinct(col(c)).as(s"${c}_nd"),
      (if (numeric) min(col(c)).cast("double") else lit(null).cast("double"))
        .as(s"${c}_mn"),
      (if (numeric) max(col(c)).cast("double") else lit(null).cast("double"))
        .as(s"${c}_mx"))
    val cols = Seq("o_orderkey" -> true, "o_custkey" -> true,
      "o_totalprice" -> true, "o_orderdate_s" -> true,
      "o_orderpriority" -> false)
    val aggs = cols.flatMap { case (c, num) => stats(c, num) }
    val wide = o.agg(aggs.head, aggs.tail: _*)
    val stack = cols.map { case (c, _) =>
      s"'$c', ${c}_n, ${c}_nn, ${c}_nd, ${c}_mn, ${c}_mx"
    }.mkString(", ")
    wide.selectExpr(
        s"stack(${cols.size}, $stack) AS (col_name, n, n_null, n_distinct, min_num, max_num)")
      .orderBy($"col_name")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pivot" -> qPivot,
    "q_unpivot" -> qUnpivot,
    "q_profile" -> qProfile)

  private def dsum(e: String) = s"CAST(SUM(CAST($e AS DECIMAL(27,6))) AS DOUBLE)"

  val oracles: Map[String, String] = Map(
    "q_pivot" ->
      s"""SELECT l_returnflag,
         |  ${dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS "F",
         |  ${dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS "O"
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_unpivot" ->
      s"""WITH wide AS (
         |  SELECT p_brand, ${dsum("p_retailprice")} AS total_retail,
         |    CAST(SUM(p_size) AS DOUBLE) AS total_size
         |  FROM part GROUP BY p_brand)
         |SELECT p_brand, 'total_retail' AS metric, total_retail AS val FROM wide
         |UNION ALL
         |SELECT p_brand, 'total_size' AS metric, total_size AS val FROM wide
         |ORDER BY p_brand, metric""".stripMargin,
    "q_profile" ->
      s"""WITH o AS (
         |  SELECT o_orderkey, o_custkey, o_totalprice,
         |    CAST(epoch(o_orderdate) AS BIGINT) AS o_orderdate_s,
         |    o_orderpriority
         |  FROM orders)
         |SELECT 'o_orderkey' AS col_name, COUNT(o_orderkey) AS n,
         |  CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_null,
         |  COUNT(DISTINCT o_orderkey) AS n_distinct,
         |  CAST(MIN(o_orderkey) AS DOUBLE) AS min_num,
         |  CAST(MAX(o_orderkey) AS DOUBLE) AS max_num FROM o
         |UNION ALL
         |SELECT 'o_custkey', COUNT(o_custkey),
         |  CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         |  COUNT(DISTINCT o_custkey),
         |  CAST(MIN(o_custkey) AS DOUBLE), CAST(MAX(o_custkey) AS DOUBLE) FROM o
         |UNION ALL
         |SELECT 'o_totalprice', COUNT(o_totalprice),
         |  CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
         |    AS BIGINT),
         |  COUNT(DISTINCT o_totalprice),
         |  MIN(o_totalprice), MAX(o_totalprice) FROM o
         |UNION ALL
         |SELECT 'o_orderdate_s', COUNT(o_orderdate_s),
         |  CAST(SUM(CASE WHEN o_orderdate_s IS NULL THEN 1 ELSE 0 END)
         |    AS BIGINT),
         |  COUNT(DISTINCT o_orderdate_s),
         |  CAST(MIN(o_orderdate_s) AS DOUBLE), CAST(MAX(o_orderdate_s) AS DOUBLE) FROM o
         |UNION ALL
         |SELECT 'o_orderpriority', COUNT(o_orderpriority),
         |  CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)
         |    AS BIGINT),
         |  COUNT(DISTINCT o_orderpriority),
         |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM o
         |ORDER BY col_name""".stripMargin)
}
