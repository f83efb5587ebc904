package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._
import graft.sources.Sources

/** Time-series + anomaly analytics over the event stream: z-score
  * outlier flagging on exact decimal moments, and per-key resampling
  * with forward fill (the dashboard/feature-store "regular grid" shape).
  *
  * Scale shapes: outliers = one moments aggregate (tiny) broadcast back
  * over one scan; resample = per-minute pre-aggregation (map-side
  * combine), a generated spine joined per key, and ONE partitioned
  * window pass per key for the fill — never a global unpartitioned sort.
  */
object Timeseries {

  /** Per-type outlier report: events whose squared deviation exceeds
    * k²·variance, with moments from exact decimal power sums (identical
    * doubles in both engines, so the comparison itself is deterministic).
    */
  def qOutliers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Sources.events(s, dir)
    val m = ev.groupBy($"event_type")
      .agg(count(lit(1)).as("n"), xsum($"value").as("s1"),
        xsum($"value" * $"value", 6).as("s2"))
      .select($"event_type", $"n", ($"s1" / $"n").as("mean"),
        (($"s2" * $"n" - $"s1" * $"s1") / ($"n" * $"n")).as("var_pop"))
    val dev2 = ($"value" - $"mean") * ($"value" - $"mean")
    ev.join(broadcast(m), "event_type")
      .groupBy($"event_type")
      .agg(max($"n").as("n"),
        sum(when(dev2 > lit(4.0) * $"var_pop", 1L).otherwise(0L))
          .as("n_outliers"),
        sum(when(dev2 > lit(4.0) * $"var_pop", $"event_id").otherwise(0L))
          .as("outlier_id_sum"))
      .orderBy($"event_type")
  }

  /** Per-type minute resample with forward fill: mean value per minute
    * on a complete minute spine (gaps get the last seen value, leading
    * gaps 0.0), n_events = 0 marking filled rows.
    */
  def qResampleFfill(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Sources.events(s, dir)
      .select($"event_type", epochS($"ts").as("ts_s"), $"value")
      .withColumn("m", expr("ts_s div 60"))
    val agg = ev.groupBy($"event_type", $"m")
      .agg(count(lit(1)).as("n_events"),
        (xsum($"value") / count(lit(1))).as("v"))
    val b = ev.agg(min($"m").as("mn"), max($"m").as("mx")).head()
    val (mn, mx) = (b.getLong(0), b.getLong(1))
    val spine = ev.select($"event_type").distinct()
      .crossJoin(s.range(mn, mx + 1).select($"id".as("m")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"m")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    spine.join(agg, Seq("event_type", "m"), "left")
      .select($"event_type", $"m".as("minute"),
        coalesce($"n_events", lit(0L)).as("n_events"),
        coalesce(last($"v", ignoreNulls = true).over(w), lit(0.0))
          .as("v_filled"))
      .orderBy($"event_type", $"minute")
  }

  /** Pairwise Pearson r² between event-type series on the aligned minute
    * grid (minutes where both types have events). One minute-bucketed
    * aggregate feeds every pair via a self-join on the minute; all six
    * power sums are exact decimals, so the closed-form r² =
    * (n·sxy − sx·sy)² / ((n·sxx − sx²)(n·syy − sy²)) is computed from
    * identical doubles in both engines. r² (not r) avoids the
    * libm-dependent sqrt.
    */
  def qCorr(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perMin = Sources.events(s, dir)
      .select($"event_type", epochS($"ts").as("ts_s"), $"value")
      .withColumn("m", expr("ts_s div 60"))
      .groupBy($"event_type", $"m")
      .agg(xsum($"value").as("v"))
    val a = perMin.toDF("type_a", "m", "va")
    val b = perMin.toDF("type_b", "m", "vb")
    a.join(b, Seq("m")).filter($"type_a" < $"type_b")
      .groupBy($"type_a", $"type_b")
      .agg(count(lit(1)).as("n"),
        xsum($"va").as("sx"), xsum($"vb").as("sy"),
        xsum($"va" * $"va", 6).as("sxx"), xsum($"vb" * $"vb", 6).as("syy"),
        xsum($"va" * $"vb", 6).as("sxy"))
      .select($"type_a", $"type_b", $"n",
        // zero variance on either side (e.g. a single shared minute at
        // tiny SF) ⇒ r² undefined: NULL via nullif, not an ANSI
        // divide-by-zero — mirrored in the oracle SQL
        (($"n" * $"sxy" - $"sx" * $"sy") * ($"n" * $"sxy" - $"sx" * $"sy") /
          nullif(($"n" * $"sxx" - $"sx" * $"sx") *
            ($"n" * $"syy" - $"sy" * $"sy"), lit(0)))
          .as("r2"))
      .orderBy($"type_a", $"type_b")
  }

  /** Cascaded rollup (the materialized-view hierarchy shape): hourly
    * aggregates are built FROM the minute-level partial aggregates, never
    * by rescanning raw events — the reaggregation is exact because counts
    * and DECIMAL sums are associative (the minute level keeps the decimal
    * intermediate; only the final hour value casts to double). At 100 TB
    * the minute table is the one corpus-sized aggregate; every coarser
    * granularity reuses it at 1/60 the input.
    */
  def qAggCascade(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val minute = Sources.events(s, dir)
      .groupBy($"event_type",
        floor(epochS($"ts") / 60).cast("long").as("m"))
      .agg(count(lit(1)).as("n"),
        sum($"value".cast("decimal(27,6)")).as("sv"))
    minute
      .groupBy($"event_type", expr("m DIV 60").as("h"))
      .agg(sum($"n").as("n_events"), sum($"sv").cast("double").as("sum_value"))
      .select($"event_type", ($"h" * 3600).as("hour_s"), $"n_events",
        $"sum_value")
      .orderBy($"event_type", $"hour_s")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_outliers" -> qOutliers,
    "q_resample_ffill" -> qResampleFfill,
    "q_corr" -> qCorr,
    "q_agg_cascade" -> qAggCascade)

  private def dsum(e: String) = s"CAST(SUM(CAST($e AS DECIMAL(27,6))) AS DOUBLE)"

  val oracles: Map[String, String] = Map(
    "q_agg_cascade" ->
      """SELECT event_type,
        |  ((epoch_ns(ts) // 1000000000) // 3600) * 3600 AS hour_s,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_outliers" ->
      s"""WITH m AS (
         |  SELECT event_type, COUNT(*) AS n, ${dsum("value")} AS s1,
         |    ${dsum("value*value")} AS s2
         |  FROM events GROUP BY event_type),
         |mm AS (
         |  SELECT event_type, n, s1/n AS mean,
         |    (s2*n - s1*s1)/(n*n) AS var_pop
         |  FROM m)
         |SELECT e.event_type, MAX(mm.n) AS n,
         |  CAST(SUM(CASE WHEN (e.value - mm.mean)*(e.value - mm.mean)
         |        > 4.0*mm.var_pop THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
         |  CAST(SUM(CASE WHEN (e.value - mm.mean)*(e.value - mm.mean)
         |        > 4.0*mm.var_pop THEN e.event_id ELSE 0 END) AS BIGINT)
         |    AS outlier_id_sum
         |FROM events e JOIN mm ON e.event_type = mm.event_type
         |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,
    "q_resample_ffill" ->
      s"""WITH ev AS (
         |  SELECT event_type,
         |    CAST(epoch_ns(ts) // 1000000000 AS BIGINT) // 60 AS m, value
         |  FROM events),
         |agg AS (
         |  SELECT event_type, m, COUNT(*) AS n_events,
         |    ${dsum("value")}/COUNT(*) AS v
         |  FROM ev GROUP BY event_type, m),
         |b AS (SELECT MIN(m) AS mn, MAX(m) AS mx FROM ev),
         |spine AS (
         |  SELECT t.event_type, s.m
         |  FROM (SELECT DISTINCT event_type FROM ev) t
         |  CROSS JOIN (SELECT unnest(generate_series(mn, mx)) AS m FROM b) s)
         |SELECT s.event_type, s.m AS minute,
         |  COALESCE(a.n_events, 0) AS n_events,
         |  COALESCE(last_value(a.v IGNORE NULLS) OVER (
         |    PARTITION BY s.event_type ORDER BY s.m
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS v_filled
         |FROM spine s LEFT JOIN agg a
         |  ON s.event_type = a.event_type AND s.m = a.m
         |ORDER BY s.event_type, minute""".stripMargin,
    "q_corr" ->
      s"""WITH ev AS (
         |  SELECT event_type,
         |    CAST(epoch_ns(ts) // 1000000000 AS BIGINT) // 60 AS m, value
         |  FROM events),
         |pm AS (
         |  SELECT event_type, m, ${dsum("value")} AS v
         |  FROM ev GROUP BY event_type, m),
         |j AS (
         |  SELECT a.event_type AS type_a, b.event_type AS type_b,
         |    a.v AS va, b.v AS vb
         |  FROM pm a JOIN pm b ON a.m = b.m AND a.event_type < b.event_type),
         |st AS (
         |  SELECT type_a, type_b, COUNT(*) AS n,
         |    ${dsum("va")} AS sx, ${dsum("vb")} AS sy,
         |    ${dsum("va*va")} AS sxx, ${dsum("vb*vb")} AS syy,
         |    ${dsum("va*vb")} AS sxy
         |  FROM j GROUP BY type_a, type_b)
         |SELECT type_a, type_b, n,
         |  (n*sxy - sx*sy) * (n*sxy - sx*sy)
         |    / nullif((n*sxx - sx*sx) * (n*syy - sy*sy), 0) AS r2
         |FROM st ORDER BY type_a, type_b""".stripMargin)
}
