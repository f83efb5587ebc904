package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.api._
import graft.functions._
import graft.sources.Sources

/** Typed row models for the pipeline-API examples. */
case class Event(event_id: Long, user_id: Long, event_type: String,
    value: Double, props: String)
case class Doc(doc_id: Long, text: String, lang: String, source: String,
    n_chars: Long)
case class UserStats(n: Long, cents: Long, maxv: Double)

/** Behavioral parity with the reference's example applications
  * (/root/reference/examples/pony + /root/reference/examples/python):
  * word_count, celsius, alphabet (per-key totals), alerts
  * (stateless/stateful), passthrough, market_spread (as-of state join) —
  * each driven through the graft [[graft.api.Pipeline]] surface where the
  * reference used arbitrary user computations, and through column
  * expressions where the shape is relational.
  */
object Examples {
  type Q = (SparkSession, String) => DataFrame

  /** Half-away-from-zero rounding, matching SQL `round()` on every sign
    * (`math.round` is floor(x+0.5): -2.5 → -2 there but -3 in SQL).
    * DuckDB's `//` truncates toward zero like Scala long division, so the
    * boundary checks below stay plain `/`.
    */
  private def roundHalfAway(x: Double): Long =
    math.round(math.abs(x)) * (if (x < 0) -1L else 1L)

  private def eventsDs(s: SparkSession, dir: String): Dataset[Event] = {
    import s.implicits._
    Sources.events(s, dir)
      .select($"event_id", $"user_id", $"event_type", $"value", $"props")
      .as[Event]
  }

  /** passthrough: source → identity → sink
    * (reference examples/pony/passthrough). Ordered for the harness compare.
    */
  def qPassthrough(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Pipeline.source("passthrough", eventsDs(s, dir))
      .to(StatelessComputation.map[Event, Event]("identity")(identity))
      .toDF
      .orderBy($"event_id")
  }

  /** celsius: stateless 1→1 conversion (reference examples/python/celsius*). */
  def qCelsius(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Pipeline.source("celsius", eventsDs(s, dir))
      .to(StatelessComputation.map[Event, (Long, Double)]("c2f")(e =>
        (e.event_id, e.value * 1.8 + 32.0)))
      .toDF.toDF("event_id", "fahrenheit")
      .orderBy($"event_id")
  }

  /** word_count: flatMap split → key_by word → count aggregation
    * (reference examples/pony/word_count). Exercises the full
    * source/to/key_by/aggregate pipeline surface.
    */
  def qWordCount(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val counts = Pipeline.source("word_count", Sources.documents(s, dir).as[Doc])
      .to(StatelessComputation.flatMap[Doc, String]("split")(d =>
        d.text.toLowerCase.split("[^a-z]+").iterator.filter(_.nonEmpty)))
      .keyBy(identity[String])
      .aggregate(new GraftAggregation[String, Long, Long] {
        val name = "count"
        def initialAccumulator = 0L
        def update(in: String, acc: Long) = acc + 1
        def combine(a: Long, b: Long) = a + b
        def output(acc: Long) = acc
      })
    counts.toDF("word", "n").orderBy($"word")
  }

  /** alphabet: per-key running vote totals (reference
    * examples/pony/alphabet) — key_by + algebraic aggregate, column form.
    */
  def qKeybyRunningTotal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Sources.events(s, dir)
      .groupBy($"event_type")
      .agg(xsum($"value").as("total"), count(lit(1)).as("n_events"))
      .orderBy($"event_type")
  }

  /** Full Aggregation contract (initial/update/combine/output) through the
    * Spark Aggregator bridge: per-user stats with exact cent arithmetic.
    */
  def qAggContract(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val agg = new GraftAggregation[Event, UserStats, (Long, Double, Double)] {
      val name = "user_stats"
      def initialAccumulator = UserStats(0L, 0L, Double.NegativeInfinity)
      def update(e: Event, a: UserStats) =
        UserStats(a.n + 1, a.cents + roundHalfAway(e.value * 100), math.max(a.maxv, e.value))
      def combine(a: UserStats, b: UserStats) =
        UserStats(a.n + b.n, a.cents + b.cents, math.max(a.maxv, b.maxv))
      def output(a: UserStats) = (a.n, a.cents / 100.0, a.maxv)
    }
    Pipeline.source("agg_contract", eventsDs(s, dir))
      .keyBy(_.user_id)
      .aggregate(agg)
      .map { case (u, (n, total, mx)) => (u, n, total, mx) }
      .toDF("user_id", "n_events", "total", "max_value")
      .orderBy($"user_id")
  }

  /** alerts_stateless: filter computation emitting alerts
    * (reference examples/python/alerts_stateless).
    */
  def qAlertsStateless(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Pipeline.source("alerts", eventsDs(s, dir))
      .to(StatelessComputation.filter[Event]("threshold")(e =>
        e.event_type == "purchase" && e.value > 150.0))
      .toDF
      .select($"event_id", $"user_id", $"value")
      .orderBy($"event_id")
  }

  /** alerts_stateful: per-key running total emits an alert each time the
    * total crosses a 1000.00 boundary (reference
    * examples/python/alerts_stateful) — a true StateComputation folded in
    * event order.
    */
  def qAlertsStateful(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sc = new StateComputation[Event, Long, (Long, Long, Double)] {
      val name = "running_total_alert"
      def initialState = 0L
      def apply(e: Event, cum: Long) = {
        val next = cum + roundHalfAway(e.value * 100)
        // NOTE: Scala Long `/` truncates toward zero, and so does DuckDB's
        // integer `//` (verified r2) — the boundary check matches the oracle
        // on every sign without floorDiv.
        val out = if (next / 100000L > cum / 100000L)
          Iterator.single((e.user_id, e.event_id, next / 100.0))
        else Iterator.empty
        (next, out)
      }
    }
    Pipeline.source("alerts_stateful", eventsDs(s, dir))
      .keyBy(_.user_id)
      .toState(sc, col("event_id"))
      .toDF.toDF("user_id", "event_id", "total")
      .orderBy($"user_id", $"event_id")
  }

  /** market_spread: orders checked against the latest quote state per key
    * (reference examples/pony/market_spread) — as-of join: each purchase
    * sees the most recent prior 'view' value for its user.
    */
  def qAsofJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Sources.events(s, dir)
      .select($"event_id", $"user_id", $"event_type", $"value")
    val withQuote = AsOfJoin.lastNonNull(ev, $"user_id", $"event_id",
      when($"event_type" === "view", $"value"), "last_view_value")
    withQuote.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"value", $"last_view_value")
      .orderBy($"event_id")
  }

  /** The same market_spread as-of, but driven through the CUSTOM physical
    * operator ([[graft.plans.AsOfJoinExec]]: LogicalPlan + Strategy +
    * sort-merge exec) — putting the whole-operator tier under the DuckDB
    * correctness gate.
    */
  def qAsofExec(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Sources.events(s, dir)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"value")
    val views = ev.filter($"event_type" === "view")
      .select($"user_id", $"event_id", $"value")
    graft.plans.AsOfJoinExec.asOf(purchases, views,
      "user_id", "event_id", "value", "last_view_value")
      .select($"event_id", $"user_id", $"value", $"last_view_value")
      .orderBy($"event_id")
  }

  /** As-of with staleness tolerance (market_spread's stale-quote check):
    * a purchase only sees the prior view value if it is at most an hour
    * older, else null.
    */
  def qAsofTolerance(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Sources.events(s, dir)
      .select($"event_id", $"user_id", $"event_type", $"value",
        epochS($"ts").as("ts_s"))
    AsOfJoin.lastNonNullWithin(ev, $"user_id", $"ts_s", $"event_id",
      when($"event_type" === "view", $"value"), 3600L, "fresh_view_value")
      .filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"value", $"fresh_view_value")
      .orderBy($"event_id")
  }

  /** collect: global (keyless) aggregation over the whole stream
    * (reference Pipeline.collect, application.pony:250).
    */
  def qCollectGlobal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Sources.events(s, dir).agg(
      count(lit(1)).as("n_events"),
      countDistinct($"user_id").as("n_users"),
      xsum($"value").as("total_value"),
      min(epochS($"ts")).as("first_s"),
      max(epochS($"ts")).as("last_s"))
  }

  /** global window / per-key latest state: last event per user. */
  def qGlobalWindowLast(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"event_id".desc)
    Sources.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_id", $"event_type", $"value")
      .orderBy($"user_id")
  }

  val queries: Map[String, Q] = Map(
    "q_passthrough" -> qPassthrough,
    "q_celsius" -> qCelsius,
    "q_word_count" -> qWordCount,
    "q_keyby_running_total" -> qKeybyRunningTotal,
    "q_agg_contract" -> qAggContract,
    "q_alerts_stateless" -> qAlertsStateless,
    "q_alerts_stateful" -> qAlertsStateful,
    "q_asof_join" -> qAsofJoin,
    "q_asof_exec" -> qAsofExec,
    "q_asof_tolerance" -> qAsofTolerance,
    "q_collect_global" -> qCollectGlobal,
    "q_global_window_last" -> qGlobalWindowLast)

  val oracles: Map[String, String] = Map(
    "q_asof_exec" ->
      """SELECT event_id, user_id, value, last_view_value FROM (
        |  SELECT event_id, user_id, event_type, value,
        |    LAST_VALUE(CASE WHEN event_type = 'view' THEN value END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_view_value
        |  FROM events)
        |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,
    "q_asof_tolerance" ->
      """WITH b AS (
        |  SELECT event_id, user_id, event_type, value,
        |    CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS ts_s
        |  FROM events),
        |c AS (
        |  SELECT *,
        |    LAST_VALUE(CASE WHEN event_type = 'view' THEN value END IGNORE NULLS)
        |      OVER w AS lv,
        |    LAST_VALUE(CASE WHEN event_type = 'view' THEN ts_s END IGNORE NULLS)
        |      OVER w AS lts
        |  FROM b
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id, value,
        |  CASE WHEN ts_s - lts <= 3600 THEN lv END AS fresh_view_value
        |FROM c WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,
    "q_passthrough" ->
      """SELECT event_id, user_id, event_type, value, props FROM events
        |ORDER BY event_id""".stripMargin,
    "q_celsius" ->
      """SELECT event_id, value*1.8+32.0 AS fahrenheit FROM events
        |ORDER BY event_id""".stripMargin,
    "q_word_count" ->
      """SELECT w AS word, COUNT(*) AS n FROM (
        |  SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS w
        |  FROM documents)
        |WHERE w <> '' GROUP BY w ORDER BY w""".stripMargin,
    "q_keyby_running_total" ->
      """SELECT event_type,
        |  CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS total,
        |  COUNT(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_agg_contract" ->
      """SELECT user_id, COUNT(*) AS n_events,
        |  SUM(CAST(round(value*100,0) AS BIGINT))/100.0 AS total,
        |  MAX(value) AS max_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_alerts_stateless" ->
      """SELECT event_id, user_id, value FROM events
        |WHERE event_type = 'purchase' AND value > 150.0
        |ORDER BY event_id""".stripMargin,
    "q_alerts_stateful" ->
      """WITH c AS (
        |  SELECT user_id, event_id,
        |    CAST(round(value*100,0) AS BIGINT) AS cents,
        |    SUM(CAST(round(value*100,0) AS BIGINT)) OVER (
        |      PARTITION BY user_id ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM events)
        |SELECT user_id, event_id, cum/100.0 AS total FROM c
        |WHERE cum // 100000 > (cum - cents) // 100000
        |ORDER BY user_id, event_id""".stripMargin,
    "q_asof_join" ->
      """SELECT event_id, user_id, value, last_view_value FROM (
        |  SELECT event_id, user_id, event_type, value,
        |    LAST_VALUE(CASE WHEN event_type = 'view' THEN value END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_view_value
        |  FROM events)
        |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,
    "q_collect_global" ->
      """SELECT COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users,
        |  CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS total_value,
        |  MIN(CAST(epoch_ns(ts) // 1000000000 AS BIGINT)) AS first_s,
        |  MAX(CAST(epoch_ns(ts) // 1000000000 AS BIGINT)) AS last_s
        |FROM events""".stripMargin,
    "q_global_window_last" ->
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT user_id, event_id, event_type, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin)
}
