package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: attach to each row the most recent preceding value of an
  * (often sparse) column within its key partition — the batch form of the
  * reference's market_spread pattern, where orders consult the latest quote
  * state per symbol (/root/reference/examples/pony/market_spread).
  *
  * Executed as ONE shuffle + sort per key (window with `last ignoreNulls`),
  * never a per-row lookup — at 100 TB this is a single exchange on the key,
  * and skewed keys are handled by AQE.
  */
object AsOfJoin {

  /** Carry the last non-null value of `col` forward over `order` within each
    * `key` group (including the current row).
    */
  def lastNonNull(df: DataFrame, key: Column, order: Column, col: Column, as: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(order)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(as, last(col, ignoreNulls = true).over(w))
  }

  /** As-of with staleness tolerance: the carried value is only visible
    * while it is at most `toleranceS` behind the current row's `order`
    * (the reference market_spread pattern of rejecting stale quotes).
    * Emits both the carried value column `as` and nulls it when stale.
    */
  def lastNonNullWithin(df: DataFrame, key: Column, ts: Column, tie: Column,
      valueCol: Column, toleranceS: Long, as: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts, tie)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_lv", last(valueCol, ignoreNulls = true).over(w))
      .withColumn("_lo",
        last(when(valueCol.isNotNull, ts), ignoreNulls = true).over(w))
      .withColumn(as, when(ts - col("_lo") <= toleranceS, col("_lv")))
      .drop("_lv", "_lo")
  }

  /** Classic two-table as-of: for each left row, the latest right row with
    * rightOrd <= leftOrd on the same key. Implemented by unioning the two
    * sides (tagged) and carrying right values forward — one shuffle total,
    * versus the naive per-row range join.
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, ord: String,
      valueCol: String, as: String): DataFrame = {
    val vType = right.schema(valueCol).dataType
    val l = left.withColumn("_side", lit(1))
      .withColumn(as, lit(null).cast(vType))
    val r = right.select(col(key), col(ord), col(valueCol).cast(vType).as(as))
      .withColumn("_side", lit(0))
    // quotes (_side=0) sort before same-ord left rows so an exact-ts quote
    // is visible to the left row at the same ord
    val w = Window.partitionBy(col(key))
      .orderBy(col(ord), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn(as, last(col(as), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .drop("_side")
  }
}
