package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Sources

/** Snapshot reconciliation: keyed diff of two table versions into
  * added / removed / changed / same — the data-quality gate run between
  * pipeline loads (and the building block of incremental CDC extraction
  * when a source can't emit a change log).
  *
  * Scale shape: ONE full outer join hash-partitioned on the key; change
  * detection compares columns in the join projection (no row
  * serialization, no driver diffing). At 100 TB both sides shuffle once
  * on the same key — with both snapshots bucketed on the key
  * ([[Layout.writeBucketedTable]]) even that shuffle disappears.
  */
object TableDiff {

  /** Diff two keyed snapshots on `keyCol`; `cmpCols` define row equality.
    * Returns one row per status with its count.
    */
  def diff(a: DataFrame, b: DataFrame, keyCol: String,
      cmpCols: Seq[String]): DataFrame = {
    // presence markers, not value-null probes — a NULL in a compared
    // column must not masquerade as a missing row
    val an = a.toDF(a.columns.map(c => if (c == keyCol) c else s"a_$c"): _*)
      .withColumn("a_present", lit(1))
    val bn = b.toDF(b.columns.map(c => if (c == keyCol) c else s"b_$c"): _*)
      .withColumn("b_present", lit(1))
    val changed = cmpCols.map(c => !(col(s"a_$c") <=> col(s"b_$c")))
      .reduce(_ || _)
    an.join(bn, Seq(keyCol), "full_outer")
      .select(
        when(col("a_present").isNull, lit("added"))
          .when(col("b_present").isNull, lit("removed"))
          .when(changed, lit("changed"))
          .otherwise(lit("same")).as("status"))
      .groupBy(col("status")).agg(count(lit(1)).as("n"))
      .orderBy(col("status"))
  }

  /** Diff a synthetic "previous load" of orders (some rows missing, some
    * prices drifted) against the current snapshot — deterministic
    * perturbations by key modulus, so the oracle reproduces them exactly.
    */
  def qTableDiff(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cur = Sources.orders(s, dir)
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    val prev = cur
      .filter($"o_orderkey" % 7 =!= 0) // rows added since the last load
      .withColumn("o_totalprice",
        when($"o_orderkey" % 11 === 0, $"o_totalprice" + 1.0)
          .otherwise($"o_totalprice")) // drifted rows
      .union(cur.filter($"o_orderkey" % 13 === 0)
        .select($"o_orderkey" + 10000000, $"o_orderstatus", $"o_totalprice"))
      // rows deleted since the last load
    diff(prev, cur, "o_orderkey", Seq("o_orderstatus", "o_totalprice"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_table_diff" -> qTableDiff)

  val oracles: Map[String, String] = Map(
    "q_table_diff" ->
      """WITH cur AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |prev AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 11 = 0 THEN o_totalprice + 1.0
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM cur WHERE o_orderkey % 7 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, o_orderstatus, o_totalprice
        |  FROM cur WHERE o_orderkey % 13 = 0),
        |j AS (
        |  SELECT
        |    CASE WHEN p.o_orderkey IS NULL THEN 'added'
        |         WHEN c.o_orderkey IS NULL THEN 'removed'
        |         WHEN p.o_orderstatus <> c.o_orderstatus
        |           OR p.o_totalprice <> c.o_totalprice THEN 'changed'
        |         ELSE 'same' END AS status
        |  FROM prev p FULL OUTER JOIN cur c ON p.o_orderkey = c.o_orderkey)
        |SELECT status, COUNT(*) AS n FROM j
        |GROUP BY status ORDER BY status""".stripMargin)
}
