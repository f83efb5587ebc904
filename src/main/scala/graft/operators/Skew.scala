package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities. AQE's skew-join split handles most runtime
  * skew; explicit salting is the tool when one join key dominates so
  * heavily that even split partitions of it overwhelm a task (the classic
  * hot-key fact-to-fact join at 100 TB).
  */
object Skew {

  /** Salted equi-join: the big (skewed) side gets a deterministic salt in
    * [0, n) derived from `saltFrom` (any column with spread — an id, a
    * hash of the row's payload); the small side is replicated n× so every
    * (key, salt) bucket finds its match. One hot key fans out over n tasks
    * instead of one. Result equals `big.join(small, keys)` exactly.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      saltFrom: Column, n: Int): DataFrame = {
    require(n >= 1, "salt fan-out must be >= 1")
    val salted = big.withColumn("_salt", pmod(xxhash64(saltFrom), lit(n)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(n - 1L))))
    salted.join(replicated, keys :+ "_salt").drop("_salt")
  }

  /** Two-phase salted aggregation for algebraic aggregates over a hot key:
    * phase 1 groups by (key, salt) — map-side partials + n-way fan-out of
    * the hot key's reduce work; phase 2 merges the partials per key.
    * `partials` compute phase-1 aggregates; `merges` combine them (e.g.
    * sum→sum, count→sum, min→min).
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], saltFrom: Column,
      n: Int, partials: Seq[Column], merges: Seq[Column]): DataFrame = {
    require(n >= 1, "salt fan-out must be >= 1")
    df.withColumn("_salt", pmod(xxhash64(saltFrom), lit(n)))
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merges.head, merges.tail: _*)
  }
}
