package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._
import graft.sources.Sources

/** Z-order (Morton) multi-dimensional layout clustering: interleave the
  * bits of two sort dimensions so that range-partitioning the single
  * z-value co-locates rows that are close in BOTH dimensions. This is the
  * standard data-layout trick for multi-column pruning: files written in
  * z order carry narrow min/max ranges on every clustered column, so a
  * predicate on either dimension prunes at the source — a linear sort
  * only ever prunes its leading column.
  *
  * Pure bit arithmetic over built-ins (codegen'd, oracle-expressible);
  * at 100 TB the layout write is one range shuffle on the z key.
  */
object ZOrder {

  /** Morton code of the low `bits` bits of two non-negative long columns:
    * x occupies even bit positions, y odd.
    */
  def zValue(x: Column, y: Column, bits: Int = 16): Column =
    (0 until bits).map { b =>
      shiftleft(shiftright(x, b).bitwiseAND(lit(1L)), 2 * b) +
        shiftleft(shiftright(y, b).bitwiseAND(lit(1L)), 2 * b + 1)
    }.reduce(_ + _)

  /** Cluster a DataFrame for a two-dimensional layout: range-partition +
    * locally sort by the z value (this is what a `write.sortBy` shard
    * writer would consume).
    */
  def clusterBy(df: DataFrame, x: Column, y: Column, parts: Int,
      bits: Int = 16): DataFrame = {
    val z = zValue(x, y, bits)
    df.withColumn("_z", z)
      .repartitionByRange(parts, col("_z"))
      .sortWithinPartitions(col("_z"))
  }

  // ---------------------------------------------------------------- queries

  /** Head of the z-ordered layout of orders clustered by
    * (customer, order day) — the deterministic layout a two-dimension
    * pruning store would write.
    */
  def qZOrder(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = Sources.orders(s, dir)
      .withColumn("x", $"o_custkey".bitwiseAND(lit(65535L)))
      .withColumn("y", (epochS($"o_orderdate") / 86400).cast("long")
        .bitwiseAND(lit(65535L)))
    orders
      .withColumn("z", zValue($"x", $"y"))
      .select($"o_orderkey", $"z")
      .orderBy($"z", $"o_orderkey")
      .limit(50)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q_zorder" -> qZOrder)

  val oracles: Map[String, String] = Map(
    "q_zorder" ->
      """SELECT o_orderkey, CAST(z AS BIGINT) AS z FROM (
        |  SELECT o_orderkey,
        |    list_sum(list_transform(range(0, 16), b ->
        |      (((x >> b) & 1) << (2*b)) + (((y >> b) & 1) << (2*b+1)))) AS z
        |  FROM (
        |    SELECT o_orderkey,
        |      o_custkey & 65535 AS x,
        |      (epoch_ms(o_orderdate) // 1000 // 86400) & 65535 AS y
        |    FROM orders))
        |ORDER BY z, o_orderkey LIMIT 50""".stripMargin)
}
