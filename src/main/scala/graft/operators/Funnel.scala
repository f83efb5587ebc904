package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._
import graft.sources.Sources

/** Event-stream product analytics: ordered funnels and cohort retention —
  * the workloads a streaming-analytics engine's users (metrics pipelines,
  * market data) run daily.
  *
  * Scale shape: every stage is a user-keyed aggregation or a user-keyed
  * join — one hash partitioning reused across all stages (co-located
  * joins, no re-shuffle); stage outputs are per-user scalars, orders of
  * magnitude smaller than the event stream.
  */
object Funnel {

  /** Ordered three-stage funnel: earliest view, earliest click strictly
    * after that view, earliest purchase strictly after that click, per
    * user. Returns per-user stage timestamps (null = stage not reached).
    */
  def funnelStages(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty)
    val first = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t_0"))
    stages.zipWithIndex.drop(1).foldLeft(first) { case (acc, (st, i)) =>
      val next = events.filter(col(typeCol) === st)
        .join(acc.select(col(userCol), col(s"t_${i - 1}")), Seq(userCol))
        .filter(col(tsCol) > col(s"t_${i - 1}"))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as(s"t_$i"))
      acc.join(next, Seq(userCol), "left")
    }
  }

  // ---------------------------------------------------------------- queries

  /** view → click → purchase conversion report: users reaching each stage
    * and the mean view→purchase latency of full conversions.
    */
  def qFunnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Sources.events(s, dir).withColumn("ts_s", epochS($"ts"))
    funnelStages(ev, "user_id", "event_type", "ts_s",
      Seq("view", "click", "purchase"))
      .agg(count(lit(1)).as("n_view"),
        sum(when($"t_1".isNotNull, 1L).otherwise(0L)).as("n_click"),
        sum(when($"t_2".isNotNull, 1L).otherwise(0L)).as("n_purchase"),
        (sum(when($"t_2".isNotNull, $"t_2" - $"t_0")).cast("double") /
          sum(when($"t_2".isNotNull, 1L).otherwise(0L))).as("avg_latency_s"))
  }

  /** Weekly cohort retention: users grouped by first-activity day; a user
    * is retained if they have any event in [day+7, day+14).
    */
  def qRetention(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Sources.events(s, dir)
      .select($"user_id", (epochS($"ts") / 86400).cast("long").as("day"))
    val cohort = ev.groupBy($"user_id").agg(min($"day").as("day0"))
    val retained = ev.join(cohort, "user_id")
      .filter($"day" >= $"day0" + 7 && $"day" < $"day0" + 14)
      .select($"user_id").distinct()
      .withColumn("ret", lit(1L))
    cohort.join(retained, Seq("user_id"), "left")
      .groupBy($"day0".as("cohort_day"))
      .agg(count(lit(1)).as("n_users"),
        sum(coalesce($"ret", lit(0L))).as("n_retained"))
      .orderBy($"cohort_day")
  }

  /** First-touch / last-touch conversion attribution: each purchase is
    * credited to the user's earliest and latest preceding touchpoint
    * (view or click). One user-keyed window partitioning computes both
    * running attributions; conversions with no preceding touch count as
    * 'none'. The report is per touch-channel conversion totals under
    * both models.
    */
  def qAttribution(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts_s", $"event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val ev = Sources.events(s, dir)
      .select($"user_id", $"event_id", epochS($"ts").as("ts_s"), $"event_type")
      .withColumn("touch", when($"event_type".isin("view", "click"), $"event_type"))
    val attributed = ev
      .withColumn("first_touch", first($"touch", ignoreNulls = true).over(w))
      .withColumn("last_touch", last($"touch", ignoreNulls = true).over(w))
      .filter($"event_type" === "purchase")
    attributed
      .select(explode(array(
        struct(lit("first").as("model"),
          coalesce($"first_touch", lit("none")).as("channel")),
        struct(lit("last").as("model"),
          coalesce($"last_touch", lit("none")).as("channel")))).as("a"))
      .groupBy($"a.model".as("model"), $"a.channel".as("channel"))
      .agg(count(lit(1)).as("n_conversions"))
      .orderBy($"model", $"channel")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_funnel" -> qFunnel,
    "q_retention" -> qRetention,
    "q_attribution" -> qAttribution)

  private val E =
    "SELECT user_id, event_type, epoch_ns(ts) // 1000000000 AS ts_s FROM events"

  val oracles: Map[String, String] = Map(
    "q_funnel" ->
      s"""WITH e AS ($E),
         |v AS (SELECT user_id, MIN(ts_s) AS t0 FROM e
         |      WHERE event_type = 'view' GROUP BY user_id),
         |c AS (SELECT e.user_id, MIN(ts_s) AS t1 FROM e JOIN v USING (user_id)
         |      WHERE event_type = 'click' AND ts_s > t0 GROUP BY e.user_id),
         |p AS (SELECT e.user_id, MIN(ts_s) AS t2 FROM e JOIN c USING (user_id)
         |      WHERE event_type = 'purchase' AND ts_s > t1 GROUP BY e.user_id)
         |SELECT COUNT(*) AS n_view,
         |  CAST(SUM(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
         |  CAST(SUM(CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
         |  CAST(SUM(CASE WHEN t2 IS NOT NULL THEN t2 - t0 END) AS DOUBLE)
         |    / SUM(CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END) AS avg_latency_s
         |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)""".stripMargin,
    "q_retention" ->
      s"""WITH e AS (
         |  SELECT user_id, epoch_ns(ts) // 1000000000 // 86400 AS day
         |  FROM events),
         |cohort AS (SELECT user_id, MIN(day) AS day0 FROM e GROUP BY user_id),
         |ret AS (
         |  SELECT DISTINCT e.user_id FROM e JOIN cohort USING (user_id)
         |  WHERE day >= day0 + 7 AND day < day0 + 14)
         |SELECT day0 AS cohort_day, COUNT(*) AS n_users,
         |  CAST(SUM(CASE WHEN r.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_retained
         |FROM cohort c LEFT JOIN ret r ON c.user_id = r.user_id
         |GROUP BY day0 ORDER BY cohort_day""".stripMargin,
    "q_attribution" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, epoch_ns(ts) // 1000000000 AS ts_s,
         |    event_type,
         |    CASE WHEN event_type IN ('view','click') THEN event_type END
         |      AS touch
         |  FROM events),
         |att AS (
         |  SELECT event_type,
         |    first_value(touch IGNORE NULLS) OVER (
         |      PARTITION BY user_id ORDER BY ts_s, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS first_touch,
         |    last_value(touch IGNORE NULLS) OVER (
         |      PARTITION BY user_id ORDER BY ts_s, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_touch
         |  FROM e),
         |conv AS (SELECT * FROM att WHERE event_type = 'purchase'),
         |both_models AS (
         |  SELECT 'first' AS model, COALESCE(first_touch, 'none') AS channel
         |  FROM conv
         |  UNION ALL
         |  SELECT 'last' AS model, COALESCE(last_touch, 'none') AS channel
         |  FROM conv)
         |SELECT model, channel, COUNT(*) AS n_conversions
         |FROM both_models GROUP BY model, channel
         |ORDER BY model, channel""".stripMargin)
}
