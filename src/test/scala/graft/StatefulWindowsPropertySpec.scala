package graft

import scala.collection.mutable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.api.GraftAggregation
import graft.streaming.StatefulWindows
import graft.streaming.StatefulWindows.LatePolicy

/** Randomized parity: StatefulWindows.rangeWindows vs an in-memory
  * simulator of the reference semantics (global watermark advancing at
  * batch boundaries, late rows per policy, watermark-driven close).
  * Catches ordering/lateness/flush regressions that fixed timelines miss.
  */
class StatefulWindowsPropertySpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.configure(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")).getOrCreate()

  val B = 1700000000L
  val RangeS = 10L
  val DelayS = 5L
  val AdmitS = 200L

  val sumAgg = new GraftAggregation[Reading, Long, Long] {
    val name = "sum"
    def initialAccumulator = 0L
    def update(in: Reading, acc: Long) = acc + in.v
    def combine(a: Long, b: Long) = a + b
    def output(acc: Long) = acc
  }

  /** Reference-semantics simulator (see StatefulWindows scaladoc). */
  private def simulate(batches: Seq[Seq[Reading]],
      policy: LatePolicy): Seq[(String, Long, Long)] = {
    val out = mutable.ArrayBuffer.empty[(String, Long, Long)]
    val open = mutable.Map.empty[(String, Long), Long]
    var wm = Long.MinValue
    var maxSeen = Long.MinValue
    for (batch <- batches) {
      for ((key, rows) <- batch.groupBy(_.key).toSeq.sortBy(_._1);
           in <- rows.sortBy(_.t)) {
        val t = in.t
        val wStart = math.floorDiv(t, RangeS) * RangeS
        val isLate = t < wm && !open.contains((key, wStart))
        if (!isLate)
          open((key, wStart)) = open.getOrElse((key, wStart), 0L) + in.v
        else policy match {
          case LatePolicy.Drop => ()
          case LatePolicy.FirePerMessage => out += ((key, wStart, in.v))
          case LatePolicy.PlaceInOldest =>
            val mine = open.keys.filter(_._1 == key)
            val target = if (mine.nonEmpty) mine.minBy(_._2) else (key, wStart)
            open(target) = open.getOrElse(target, 0L) + in.v
        }
        maxSeen = math.max(maxSeen, t)
      }
      if (maxSeen != Long.MinValue) wm = maxSeen - DelayS
      val closed = open.filter { case ((_, w), _) => w + RangeS <= wm }
      closed.toSeq.sortBy(x => (x._1._1, x._1._2)).foreach { case ((k, w), acc) =>
        out += ((k, w, acc))
        open.remove((k, w))
      }
    }
    out.sorted.toSeq
  }

  private def runStream(batches: Seq[Seq[Reading]], policy: LatePolicy,
      name: String): Seq[(String, Long, Long)] = {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Reading]
    val out = StatefulWindows.rangeWindows(in.toDS(), (_: Reading).key,
      (_: Reading).t, "t", RangeS, DelayS, policy, sumAgg, admitLateS = AdmitS)
    val q = out.toDF("key", "wstart", "total").writeStream
      .format("memory").queryName(name).outputMode("append").start()
    batches.foreach { b =>
      if (b.nonEmpty) in.addData(b: _*)
      q.processAllAvailable()
    }
    val rows = spark.table(name).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    q.stop()
    rows
  }

  private def scenario(seed: Int): Seq[Seq[Reading]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(3)(Seq.fill(1 + rng.nextInt(5))(
      Reading(if (rng.nextBoolean()) "a" else "b",
        B + rng.nextInt(80), 1 + rng.nextInt(9))))
  }

  for (policy <- Seq(LatePolicy.Drop, LatePolicy.FirePerMessage,
      LatePolicy.PlaceInOldest); seed <- Seq(11, 42, 97)) {
    test(s"randomized parity: $policy seed=$seed") {
      val batches = scenario(seed)
      val expected = simulate(batches, policy)
      val got = runStream(batches, policy,
        s"prop_${policy.getClass.getSimpleName.replace("$", "")}_$seed")
      assert(got == expected,
        s"\nbatches=$batches\nexpected=$expected\ngot=$got")
    }
  }

  // ---------- ephemeral windows (trigger + post-trigger + expiry) ----------

  val TriggerS = 10L
  val PostTriggerS = 8L
  val EDelayS = 3L

  /** Reference-semantics simulator for ephemeral windows: anchor at first
    * event's watermark, strict trigger, expiry at the remove point, reopen
    * after; per-key watermark advances with the key's own events, the
    * global watermark at batch boundaries.
    */
  private def simulateEphemeral(batches: Seq[Seq[Reading]],
      policy: LatePolicy): Seq[(String, Long, Long)] = {
    case class St(startTs: Long, var maxTs: Long, var triggered: Boolean,
      var acc: Long)
    val out = mutable.ArrayBuffer.empty[(String, Long, Long)]
    val st = mutable.Map.empty[String, St]
    var globalWm = Long.MinValue
    var maxSeen = Long.MinValue
    def trig(s: St) = s.startTs - EDelayS + TriggerS
    def remove(s: St) = trig(s) + PostTriggerS
    def tryTrigger(k: String, s: St, wm: Long): Unit =
      if (!s.triggered && wm > trig(s)) { out += ((k, s.startTs, s.acc)); s.triggered = true }
    def tryExpire(k: String, wm: Long): Unit = st.get(k).foreach { s =>
      if (wm >= remove(s)) { tryTrigger(k, s, wm); st.remove(k) }
    }
    for (batch <- batches) {
      for ((key, rows) <- batch.groupBy(_.key).toSeq.sortBy(_._1);
           in <- rows.sortBy(_.t)) {
        val t = in.t
        st.get(key).foreach { s =>
          val wm = math.max(math.max(globalWm, s.maxTs - EDelayS), t - EDelayS)
          if (wm >= remove(s)) { tryTrigger(key, s, wm); st.remove(key) }
        }
        st.get(key) match {
          case None => st(key) = St(t, t, triggered = false, in.v)
          case Some(s) if !s.triggered =>
            s.maxTs = math.max(s.maxTs, t); s.acc += in.v
          case Some(s) =>
            policy match {
              case LatePolicy.FirePerMessage => out += ((key, s.startTs, in.v))
              case _ => ()
            }
            s.maxTs = math.max(s.maxTs, t)
        }
        st.get(key).foreach(s =>
          tryTrigger(key, s, math.max(globalWm, s.maxTs - EDelayS)))
        maxSeen = math.max(maxSeen, t)
      }
      if (maxSeen != Long.MinValue) globalWm = maxSeen - EDelayS
      st.keys.toSeq.sorted.foreach { k =>
        st.get(k).foreach(s =>
          tryTrigger(k, s, math.max(globalWm, s.maxTs - EDelayS)))
        tryExpire(k, math.max(globalWm,
          st.get(k).map(_.maxTs - EDelayS).getOrElse(Long.MinValue)))
      }
    }
    out.sorted.toSeq
  }

  private def runEphemeral(batches: Seq[Seq[Reading]], policy: LatePolicy,
      name: String): Seq[(String, Long, Long)] = {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Reading]
    val out = StatefulWindows.ephemeralWindows(in.toDS(), (_: Reading).key,
      (_: Reading).t, "t", TriggerS, PostTriggerS, EDelayS, policy, sumAgg,
      admitLateS = AdmitS)
    val q = out.toDF("key", "wstart", "total").writeStream
      .format("memory").queryName(name).outputMode("append").start()
    batches.foreach { b =>
      if (b.nonEmpty) in.addData(b: _*)
      q.processAllAvailable()
    }
    val rows = spark.table(name).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    q.stop()
    rows
  }

  for (policy <- Seq(LatePolicy.Drop, LatePolicy.FirePerMessage);
      seed <- Seq(5, 23, 71)) {
    test(s"randomized ephemeral parity: $policy seed=$seed") {
      val batches = scenario(seed)
      val expected = simulateEphemeral(batches, policy)
      val got = runEphemeral(batches, policy,
        s"eprop_${policy.getClass.getSimpleName.replace("$", "")}_$seed")
      assert(got == expected,
        s"\nbatches=$batches\nexpected=$expected\ngot=$got")
    }
  }
}
