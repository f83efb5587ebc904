package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions._
import graft.sources.Sources

/** Temporal/state analytics over the event log: Markov transition
  * matrices, slowly-changing-dimension (type 2) version building, and
  * incremental (partial-state) aggregate maintenance.
  *
  * Scale shapes: transitions and SCD2 are ONE hash shuffle on the
  * entity key followed by partitioned window passes (never a global
  * sort); incremental maintenance re-aggregates stored algebraic
  * states — the 100 TB point is that refreshing a day's aggregates
  * touches the day's delta, not the historical base scan.
  */
object Temporal {

  private def orderedEvents(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Sources.events(s, dir)
      .select($"user_id", $"event_id", epochS($"ts").as("ts_s"), $"event_type")
  }

  /** Per-user next-event transition matrix with scaled-integer
    * probabilities (parts-per-million, floored — bit-exact in both
    * engines; no IEEE division chains).
    */
  def qTransitions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts_s", $"event_id")
    val pairs = orderedEvents(s, dir)
      .withColumn("to_type", lead($"event_type", 1).over(w))
      .where($"to_type".isNotNull)
    val counts = pairs.groupBy($"event_type".as("from_type"), $"to_type")
      .agg(count(lit(1)).as("n"))
    val wf = Window.partitionBy($"from_type")
    counts
      .withColumn("total", sum($"n").over(wf))
      // integer division in both engines — no IEEE quotient near a
      // floor boundary can perturb the gate
      .withColumn("prob_ppm", expr("(n * 1000000L) div total"))
      .drop("total")
      .orderBy($"from_type", $"to_type")
  }

  /** SCD type-2 history of each user's event_type "segment": collapse
    * consecutive repeats, emit versioned rows with [valid_from, valid_to)
    * epoch-second bounds (open current version → NULL) and a version
    * number per user. One shuffle on user_id; both window passes reuse
    * the same partitioning.
    */
  def qScd2(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts_s", $"event_id")
    val changes = orderedEvents(s, dir)
      .withColumn("prev_type", lag($"event_type", 1).over(w))
      .where($"prev_type".isNull || $"prev_type" =!= $"event_type")
    val wv = Window.partitionBy($"user_id").orderBy($"ts_s", $"event_id")
    changes
      .withColumn("version", row_number().over(wv))
      .withColumn("valid_to_s", lead($"ts_s", 1).over(wv))
      .select($"user_id", $"version", $"event_type".as("segment"),
        $"ts_s".as("valid_from_s"), $"valid_to_s")
      .orderBy($"user_id", $"version")
  }

  /** Incremental aggregate maintenance: per-priority algebraic states
    * (count / exact-decimal sum / min / max) computed separately over the
    * base (orders before the cutoff) and the delta (orders after), then
    * merged WITHOUT rescanning the base — bit-identical to a full
    * recompute because every piece is algebraic and the sum stays
    * decimal-exact until the single final cast.
    */
  def qIncrementalAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cutoff = lit("1995-07-01").cast("timestamp")
    def state(df: DataFrame): DataFrame =
      df.groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum($"o_totalprice".cast(DecimalType(27, 6))).as("tot_dec"),
          min($"o_totalprice").as("mn"),
          max($"o_totalprice").as("mx"))
    val o = Sources.orders(s, dir)
    val base = state(o.where($"o_orderdate" < cutoff))
    val delta = state(o.where($"o_orderdate" >= cutoff))
    base.union(delta)
      .groupBy($"o_orderpriority")
      .agg(sum($"n").as("n"), sum($"tot_dec").as("tot_dec"),
        min($"mn").as("min_price"), max($"mx").as("max_price"))
      .select($"o_orderpriority", $"n",
        $"tot_dec".cast("double").as("total_price"),
        ($"tot_dec".cast("double") / $"n").as("avg_price"),
        $"min_price", $"max_price")
      .orderBy($"o_orderpriority")
  }

  /** Incremental JOIN-view maintenance: with base/delta splits A = A₀∪ΔA,
    * B = B₀∪ΔB, the view V = γ(A⋈B) is refreshed as the merge of the old
    * state γ(A₀⋈B₀) with the delta joins γ(ΔA⋈B₀) ∪ γ(A₀⋈ΔB) ∪ γ(ΔA⋈ΔB)
    * — the batch statement of what a streaming join does per micro-batch.
    * Every delta join keys on the same join column (one partitioning
    * reused), merges are associative count/DECIMAL sums, and the oracle
    * recomputes the view from the FULL join — proving the delta algebra
    * exactly. At 100 TB the delta terms touch |Δ|-sized inputs, never the
    * full base re-join.
    */
  def qIvmJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Sources.orders(s, dir)
      .select($"o_orderkey", $"o_custkey")
    val l = Sources.lineitem(s, dir)
      .select($"l_orderkey", $"l_quantity")
    val (o0, dO) = (o.where($"o_orderkey" % 7 =!= 0),
      o.where($"o_orderkey" % 7 === 0))
    val (l0, dL) = (l.where($"l_orderkey" % 5 =!= 0),
      l.where($"l_orderkey" % 5 === 0))
    def view(a: DataFrame, b: DataFrame): DataFrame =
      a.join(b, $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_custkey")
        .agg(count(lit(1)).as("n"),
          sum($"l_quantity".cast(DecimalType(27, 6))).as("q_dec"))
    view(o0, l0).union(view(dO, l0)).union(view(o0, dL)).union(view(dO, dL))
      .groupBy($"o_custkey")
      .agg(sum($"n").as("n_items"), sum($"q_dec").cast("double").as("sum_qty"))
      .orderBy($"o_custkey")
  }

  /** Interval-union coverage per user (the "total active time" shape):
    * each event opens an interval [ts, ts + value seconds]; overlapping
    * intervals merge, and the report is each user's union length and
    * merged-segment count. ONE ordered window pass per key — the
    * classic sweep-line as a running max of interval ends (a new segment
    * starts where the running max of all PREVIOUS ends stays below the
    * next start), never an interval×interval self-join. All arithmetic
    * on epoch-second bigints.
    */
  def qIntervalUnion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val iv = Sources.events(s, dir)
      .select($"user_id", epochS($"ts").as("st"),
        (epochS($"ts") + ($"value".cast(DecimalType(18, 2)) * 100)
          .cast("long")).as("en"))
    val byStart = Window.partitionBy($"user_id").orderBy($"st", $"en")
    // running max of ends over STRICTLY previous rows; null for the first
    val prevMax = max($"en").over(byStart.rowsBetween(
      Window.unboundedPreceding, -1))
    val seg = iv
      .withColumn("new_seg",
        when(prevMax.isNull || prevMax < $"st", 1L).otherwise(0L))
      .withColumn("seg_id", sum($"new_seg").over(byStart))
    seg.groupBy($"user_id", $"seg_id")
      .agg(min($"st").as("seg_start"), max($"en").as("seg_end"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_segments"),
        sum($"seg_end" - $"seg_start").as("covered_s"))
      .orderBy($"user_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_transitions" -> qTransitions,
    "q_scd2" -> qScd2,
    "q_incremental_agg" -> qIncrementalAgg,
    "q_ivm_join" -> qIvmJoin,
    "q_interval_union" -> qIntervalUnion)

  private val EV =
    """SELECT user_id, event_id,
      |    CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS ts_s, event_type
      |  FROM events""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_transitions" ->
      s"""WITH ev AS ($EV),
         |pairs AS (
         |  SELECT event_type AS from_type,
         |    LEAD(event_type) OVER (PARTITION BY user_id
         |      ORDER BY ts_s, event_id) AS to_type
         |  FROM ev),
         |counts AS (
         |  SELECT from_type, to_type, COUNT(*) AS n
         |  FROM pairs WHERE to_type IS NOT NULL
         |  GROUP BY from_type, to_type)
         |SELECT from_type, to_type, n,
         |  CAST(n * 1000000 // SUM(n) OVER (PARTITION BY from_type) AS BIGINT)
         |    AS prob_ppm
         |FROM counts ORDER BY from_type, to_type""".stripMargin,
    "q_scd2" ->
      s"""WITH ev AS ($EV),
         |marked AS (
         |  SELECT user_id, event_id, ts_s, event_type,
         |    LAG(event_type) OVER (PARTITION BY user_id
         |      ORDER BY ts_s, event_id) AS prev_type
         |  FROM ev),
         |changes AS (
         |  SELECT user_id, event_id, ts_s, event_type FROM marked
         |  WHERE prev_type IS NULL OR prev_type <> event_type)
         |SELECT user_id,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY user_id
         |    ORDER BY ts_s, event_id) AS INT) AS version,
         |  event_type AS segment, ts_s AS valid_from_s,
         |  LEAD(ts_s) OVER (PARTITION BY user_id
         |    ORDER BY ts_s, event_id) AS valid_to_s
         |FROM changes ORDER BY user_id, version""".stripMargin,
    "q_interval_union" ->
      """WITH iv AS (
        |  SELECT user_id, epoch_ns(ts) // 1000000000 AS st,
        |    epoch_ns(ts) // 1000000000 +
        |      CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS en
        |  FROM events),
        |seg AS (
        |  SELECT user_id, st, en,
        |    CASE WHEN COALESCE(max(en) OVER (PARTITION BY user_id
        |        ORDER BY st, en
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |      -9223372036854775808) < st THEN 1 ELSE 0 END AS new_seg
        |  FROM iv),
        |seg2 AS (
        |  SELECT user_id, st, en,
        |    SUM(new_seg) OVER (PARTITION BY user_id ORDER BY st, en)
        |      AS seg_id
        |  FROM seg),
        |m AS (
        |  SELECT user_id, seg_id, MIN(st) AS s, MAX(en) AS e
        |  FROM seg2 GROUP BY user_id, seg_id)
        |SELECT user_id, COUNT(*) AS n_segments,
        |  CAST(SUM(e - s) AS BIGINT) AS covered_s
        |FROM m GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_ivm_join" ->
      """SELECT o_custkey, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sum_qty
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "q_incremental_agg" ->
      s"""SELECT o_orderpriority, COUNT(*) AS n,
         |  CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS total_price,
         |  CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*)
         |    AS avg_price,
         |  MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
         |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
}
