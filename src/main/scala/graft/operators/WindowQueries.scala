package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._
import graft.sources.Sources

/** Oracle-gated batch queries exercising every [[Windows]] operator over the
  * events stream table, keyed like the reference's windowed examples
  * (alerts_windowed / alerts_local_aggregations).
  */
object WindowQueries {
  type Q = (SparkSession, String) => DataFrame

  private val Hour = 3600L

  def qTumbling(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Windows.withTumbling(Sources.events(s, dir), $"ts", Hour)
      .groupBy($"event_type", $"window_start")
      .agg(count(lit(1)).as("n_events"), xsum($"value").as("total"))
      .orderBy($"event_type", $"window_start")
  }

  def qSliding(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Windows.withSliding(Sources.events(s, dir), $"ts", Hour, 900L)
      .groupBy($"event_type", $"window_start")
      .agg(count(lit(1)).as("n_events"), xsum($"value").as("total"))
      .orderBy($"event_type", $"window_start")
  }

  def qCountWindows(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Windows.withCountWindows(Sources.events(s, dir), $"user_id", $"event_id", 50)
      .groupBy($"user_id", $"window_id")
      .agg(count(lit(1)).as("n_events"), min($"event_id").as("first_event"),
        max($"event_id").as("last_event"), xsum($"value").as("total"))
      .orderBy($"user_id", $"window_id")
  }

  def qSessions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Windows.withSessions(Sources.events(s, dir), $"user_id", $"event_id", $"ts", Hour)
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"),
        min(epochS($"ts")).as("start_s"), max(epochS($"ts")).as("end_s"),
        xsum($"value").as("total"))
      .orderBy($"user_id", $"session_id")
  }

  def qLateDrop(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val kept = Windows.dropLate(Sources.events(s, dir), $"event_type", $"ts", 86400L)
    Windows.withTumbling(kept, $"ts", Hour)
      .groupBy($"event_type", $"window_start")
      .agg(count(lit(1)).as("n_events"), xsum($"value").as("total"))
      .orderBy($"event_type", $"window_start")
  }

  def qUnaligned(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Windows.withUnaligned(Sources.events(s, dir), $"event_type", $"ts", Hour)
      .groupBy($"event_type", $"window_start")
      .agg(count(lit(1)).as("n_events"), xsum($"value").as("total"))
      .orderBy($"event_type", $"window_start")
  }

  val queries: Map[String, Q] = Map(
    "q_window_tumbling" -> qTumbling,
    "q_window_sliding" -> qSliding,
    "q_window_count" -> qCountWindows,
    "q_window_session" -> qSessions,
    "q_window_late_drop" -> qLateDrop,
    "q_window_unaligned" -> qUnaligned)

  private val T = "epoch_ns(ts) // 1000000000"
  private val Total = "CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE)"

  val oracles: Map[String, String] = Map(
    "q_window_tumbling" ->
      s"""SELECT event_type, ($T)//3600*3600 AS window_start,
         |  COUNT(*) AS n_events, $Total AS total
         |FROM events GROUP BY event_type, window_start
         |ORDER BY event_type, window_start""".stripMargin,
    "q_window_sliding" ->
      s"""SELECT event_type, window_start, COUNT(*) AS n_events, $Total AS total
         |FROM (
         |  SELECT event_type, value,
         |    unnest(generate_series((t-3600)//900*900+900, t//900*900, 900)) AS window_start
         |  FROM (SELECT event_type, value, $T AS t FROM events))
         |GROUP BY event_type, window_start
         |ORDER BY event_type, window_start""".stripMargin,
    "q_window_count" ->
      s"""SELECT user_id, window_id, COUNT(*) AS n_events,
         |  MIN(event_id) AS first_event, MAX(event_id) AS last_event,
         |  $Total AS total
         |FROM (
         |  SELECT user_id, event_id, value,
         |    (ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id)-1)//50
         |      AS window_id
         |  FROM events)
         |GROUP BY user_id, window_id ORDER BY user_id, window_id""".stripMargin,
    "q_window_session" ->
      s"""WITH t AS (SELECT user_id, event_id, value, $T AS ts_s FROM events),
         |flags AS (
         |  SELECT *, CASE WHEN ts_s - LAG(ts_s) OVER w > 3600
         |    OR LAG(ts_s) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
         |  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
         |sess AS (
         |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
         |  FROM flags)
         |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
         |  COUNT(*) AS n_events, MIN(ts_s) AS start_s, MAX(ts_s) AS end_s,
         |  $Total AS total
         |FROM sess GROUP BY user_id, session_id
         |ORDER BY user_id, session_id""".stripMargin,
    "q_window_late_drop" ->
      s"""SELECT event_type, t//3600*3600 AS window_start,
         |  COUNT(*) AS n_events, $Total AS total
         |FROM (
         |  SELECT event_type, value, $T AS t,
         |    MAX($T) OVER (PARTITION BY event_type) - 86400 AS wm
         |  FROM events)
         |WHERE t >= wm
         |GROUP BY event_type, window_start
         |ORDER BY event_type, window_start""".stripMargin,
    "q_window_unaligned" ->
      s"""SELECT event_type, first_t + (t - first_t)//3600*3600 AS window_start,
         |  COUNT(*) AS n_events, $Total AS total
         |FROM (
         |  SELECT event_type, value, $T AS t,
         |    MIN($T) OVER (PARTITION BY event_type) AS first_t
         |  FROM events)
         |GROUP BY event_type, window_start
         |ORDER BY event_type, window_start""".stripMargin)
}
