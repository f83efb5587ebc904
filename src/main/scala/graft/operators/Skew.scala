package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Sources

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

  // ---------------------------------------------------------------- queries

  /** Hot-key join through the salted path: 90% of events collapse onto one
    * synthetic key (`event_id % 10 < 9 → 'hot'` — deterministic, so the
    * oracle reproduces it), joined to a per-key dim through
    * [[saltedJoin]] with fan-out 8. The small side carries a shuffle-hash
    * hint so the plan exercises the real salted-shuffle shape (a
    * broadcast would hide the hot key entirely — and at 100 TB the dim
    * side of a hot join isn't always broadcastable). Result is identical
    * to the plain join (parity + plan shape pinned in OperatorSpec).
    */
  def qSkewJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Sources.events(s, dir)
      .select($"event_id",
        when(pmod($"event_id", lit(10)) < 9, lit("hot"))
          .otherwise($"event_type").as("hot_key"))
    val dim = e.groupBy($"hot_key").agg(count(lit(1)).as("key_rows"))
    saltedJoin(e, dim.hint("shuffle_hash"), Seq("hot_key"), $"event_id", 8)
      .groupBy($"hot_key")
      .agg(count(lit(1)).as("n_rows"), max($"key_rows").as("key_rows"),
        sum(pmod($"event_id", lit(997L))).as("id_checksum"))
      .orderBy($"hot_key")
  }

  /** Two-phase salted aggregation over the same 90%-hot key: phase 1
    * groups by (key, salt) with DECIMAL partial sums (associates exactly,
    * so the two-phase result is bit-identical to the direct aggregate and
    * the SQL oracle), phase 2 merges per key — the hot key's reduce work
    * fans out over 8 tasks instead of one.
    */
  def qSkewAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Sources.events(s, dir)
      .select($"event_id", $"value",
        when(pmod($"event_id", lit(10)) < 9, lit("hot"))
          .otherwise($"event_type").as("hot_key"))
    saltedAggregate(e, Seq("hot_key"), $"event_id", 8,
      partials = Seq(count(lit(1)).as("pn"),
        sum($"value".cast("decimal(27,6)")).as("pt")),
      merges = Seq(sum($"pn").as("n_rows"),
        sum($"pt").cast("double").as("total_value")))
      .orderBy($"hot_key")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q_skew_join" -> qSkewJoin, "q_skew_agg" -> qSkewAgg)

  val oracles: Map[String, String] = Map(
    "q_skew_join" ->
      """WITH e AS (
        |  SELECT event_id,
        |    CASE WHEN event_id % 10 < 9 THEN 'hot' ELSE event_type END AS hot_key
        |  FROM events),
        |dim AS (SELECT hot_key, COUNT(*) AS key_rows FROM e GROUP BY hot_key)
        |SELECT e.hot_key, COUNT(*) AS n_rows, MAX(d.key_rows) AS key_rows,
        |  CAST(SUM(e.event_id % 997) AS BIGINT) AS id_checksum
        |FROM e JOIN dim d ON e.hot_key = d.hot_key
        |GROUP BY e.hot_key ORDER BY e.hot_key""".stripMargin,
    "q_skew_agg" ->
      """SELECT
        |  CASE WHEN event_id % 10 < 9 THEN 'hot' ELSE event_type END AS hot_key,
        |  COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)
}
