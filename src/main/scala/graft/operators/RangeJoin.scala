package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join WITHOUT an equality key: pair rows whose numeric
  * keys lie within a tolerance (`|l.t - r.t| <= tol`).
  *
  * Spark's native plan for a pure inequality join is a broadcast
  * nested-loop or cartesian product — O(n·m) comparisons and a
  * single-task bottleneck at scale. Bucketing both sides by
  * `floor(t / tol)` turns it into a hash equi-join: a matching pair's
  * buckets can differ by at most 1, so the left side is exploded to its
  * 3 adjacent buckets and joined on bucket equality, then the exact
  * predicate filters inside each bucket. Cost: one shuffle of 3×left +
  * 1×right on a high-cardinality key — the standard distributed
  * range-join decomposition (cf. the bucketed interval joins in public
  * Spark range-join literature).
  *
  * A pair appears exactly once (the right row has one bucket; the left
  * row's 3 exploded buckets are distinct), so no dedup pass is needed.
  */
object RangeJoin {

  /** Join `left` and `right` on `|left(lTimeCol) - right(rTimeCol)| <= tol`.
    * Column sets must be disjoint; both time columns are long-typed keys
    * (epoch seconds, positions, etc.). `tol` must be positive.
    */
  def byTolerance(left: DataFrame, lTimeCol: String, right: DataFrame,
      rTimeCol: String, tol: Long): DataFrame = {
    require(tol > 0, "range-join tolerance must be positive")
    val l2 = left
      .withColumn("_d", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("_b", (floor(col(lTimeCol) / tol).cast("long") + col("_d")))
      .drop("_d")
    val r2 = right
      .withColumn("_b", floor(col(rTimeCol) / tol).cast("long"))
    l2.join(r2, "_b")
      .filter(abs(col(lTimeCol) - col(rTimeCol)) <= tol)
      .drop("_b")
  }

  /** Streaming twin of [[byTolerance]] over event-time TIMESTAMP columns.
    * Structured Streaming rejects stream-stream joins without an equality
    * predicate — the bucket decomposition supplies one: both sides get a
    * `floor(epoch/tol)` bucket key (left exploded to its 3 adjacent
    * buckets), the range predicate stays for exactness AND for watermark
    * state cleanup. Callers must `withWatermark` both inputs.
    */
  def streamingByTolerance(left: DataFrame, lTsCol: String, right: DataFrame,
      rTsCol: String, tolS: Long): DataFrame = {
    require(tolS > 0, "range-join tolerance must be positive")
    val l2 = left
      .withColumn("_d", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("_lb",
        (floor(unix_timestamp(col(lTsCol)) / tolS).cast("long") + col("_d")))
      .drop("_d")
    val r2 = right
      .withColumn("_rb", floor(unix_timestamp(col(rTsCol)) / tolS).cast("long"))
    l2.join(r2,
        col("_lb") === col("_rb") &&
          col(rTsCol) >= col(lTsCol) - expr(s"INTERVAL $tolS SECONDS") &&
          col(rTsCol) <= col(lTsCol) + expr(s"INTERVAL $tolS SECONDS"))
      .drop("_lb", "_rb")
  }

  /** Banded variant for an asymmetric window `r.t in [l.t - before, l.t + after]`:
    * buckets sized to the full span, left exploded to the covering range.
    */
  def byWindow(left: DataFrame, lTimeCol: String, right: DataFrame,
      rTimeCol: String, before: Long, after: Long): DataFrame = {
    require(before >= 0 && after >= 0 && before + after > 0,
      "range-join window must be non-degenerate")
    val span = math.max(before, after)
    val l2 = left
      .withColumn("_d", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("_b", (floor(col(lTimeCol) / span).cast("long") + col("_d")))
      .drop("_d")
    val r2 = right
      .withColumn("_b", floor(col(rTimeCol) / span).cast("long"))
    l2.join(r2, "_b")
      .filter(col(rTimeCol) >= col(lTimeCol) - before &&
        col(rTimeCol) <= col(lTimeCol) + after)
      .drop("_b")
  }
}
