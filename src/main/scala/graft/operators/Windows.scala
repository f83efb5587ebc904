package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions._

/** Batch forms of the reference's window family
  * (/root/reference/lib/wallaroo/core/windows/windows.pony: range windows
  * with slide/delay/alignment, count windows, ephemeral windows;
  * late_data_policy.pony: drop / fire_per_message / place_in_oldest_window).
  *
  * All assignments are pure column arithmetic on epoch seconds — no UDFs,
  * so everything stays in whole-stage codegen and the same semantics run
  * identically in the DuckDB oracle. Streaming forms (watermarks,
  * `window()`, `session_window`) live in [[graft.streaming.StreamOps]].
  *
  * Scale: window assignment is per-row (no shuffle); the downstream
  * groupBy((key, window)) is the single shuffle. Sliding windows fan out
  * each row `range/slide` times — callers pick slide accordingly.
  */
object Windows {

  /** Epoch-aligned tumbling bucket start (reference aligned range windows). */
  def withTumbling(df: DataFrame, ts: Column, rangeS: Long,
      as: String = "window_start"): DataFrame =
    df.withColumn(as, (epochS(ts) / rangeS).cast("long") * rangeS)

  /** Sliding windows: one output row per (input row, covering window).
    * Window starts are the multiples of `slideS` in
    * (t - rangeS, t] — `rangeS/slideS` rows per input.
    */
  def withSliding(df: DataFrame, ts: Column, rangeS: Long, slideS: Long,
      as: String = "window_start"): DataFrame = {
    val t = epochS(ts)
    val wMax = (t / slideS).cast("long") * slideS
    val wMin = ((t - rangeS) / slideS).cast("long") * slideS + slideS
    df.withColumn(as, explode(sequence(wMin, wMax, lit(slideS))))
  }

  /** Unaligned range windows: buckets anchored at each key's first event
    * (reference `RangeWindowsBuilder.unaligned`,
    * windows.pony:47 `_align_windows = false`).
    *
    * The per-key anchor is a tiny groupBy (one row per key) broadcast back
    * — NOT `min().over(partitionBy(key))`, which forces every row of a key
    * onto one task and dies on low-cardinality/skewed keys at scale.
    */
  def withUnaligned(df: DataFrame, key: Column, ts: Column, rangeS: Long,
      as: String = "window_start"): DataFrame = {
    val t = epochS(ts)
    val firsts = df.groupBy(key.as("_ua_key")).agg(min(t).as("_ua_first"))
    // null-safe join (null keys form their own window group, as the old
    // window-partitionBy did); no broadcast hint — Catalyst broadcasts the
    // one-row-per-key aggregate while it fits and falls back to a shuffle
    // join for high-cardinality keys
    df.join(firsts, key <=> col("_ua_key"))
      .withColumn(as,
        col("_ua_first") + ((t - col("_ua_first")) / rangeS).cast("long") * rangeS)
      .drop("_ua_key", "_ua_first")
  }

  /** Tumbling count windows per key in `order`
    * (reference `CountWindowsBuilder`, windows.pony:105).
    */
  def withCountWindows(df: DataFrame, key: Column, order: Column, n: Int,
      as: String = "window_id"): DataFrame = {
    val w = Window.partitionBy(key).orderBy(order)
    df.withColumn(as, ((row_number().over(w) - 1) / n).cast("long"))
  }

  /** Gap-based session windows (the batch reading of the reference's
    * ephemeral windows: a quiet period closes the window,
    * ephemeral_window.pony). `gapS` on epoch seconds, deterministic
    * `order` within key.
    */
  def withSessions(df: DataFrame, key: Column, order: Column, ts: Column,
      gapS: Long, as: String = "session_id"): DataFrame = {
    val w = Window.partitionBy(key).orderBy(order)
    val t = epochS(ts)
    val newSession = when(t - lag(t, 1).over(w) > gapS || lag(t, 1).over(w).isNull, 1)
      .otherwise(0)
    df.withColumn(as,
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
  }

  /** Late-data policy `drop` in batch form: the watermark is each key's max
    * event time minus `delayS` (reference `with_delay` + LateDataPolicy.drop);
    * rows older than the watermark are discarded. Per-key max via
    * groupBy + broadcast join back (skew-safe), not an unbounded window.
    */
  def dropLate(df: DataFrame, key: Column, ts: Column, delayS: Long): DataFrame = {
    val maxes = df.groupBy(key.as("_dl_key")).agg(max(epochS(ts)).as("_dl_max"))
    df.join(maxes, key <=> col("_dl_key"))
      .filter(epochS(ts) >= col("_dl_max") - delayS)
      .drop("_dl_key", "_dl_max")
  }
}
