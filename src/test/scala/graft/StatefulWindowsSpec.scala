package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.api.GraftAggregation
import graft.streaming.StatefulWindows
import graft.streaming.StatefulWindows.LatePolicy

case class Reading(key: String, t: Long, v: Long)

class StatefulWindowsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.configure(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")).getOrCreate()

  val sumAgg = new GraftAggregation[Reading, Long, Long] {
    val name = "sum"
    def initialAccumulator = 0L
    def update(in: Reading, acc: Long) = acc + in.v
    def combine(a: Long, b: Long) = a + b
    def output(acc: Long) = acc
  }

  // realistic epoch base: Spark clamps watermarks at 0, so event times must
  // sit far enough above zero for `max event ts − delay` to be meaningful
  val B = 1700000000L

  private def run(policy: LatePolicy)(
      batches: Seq[Seq[Reading]]): Seq[(String, Long, Long)] = {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Reading]
    val out = StatefulWindows.rangeWindows(in.toDS(), (_: Reading).key,
      (_: Reading).t, "t", rangeS = 10L, delayS = 5L, policy, sumAgg,
      admitLateS = 60L)
    val name = s"sw_${policy.getClass.getSimpleName.replace("$", "")}"
    val q = out.toDF("key", "wstart", "total").writeStream
      .format("memory").queryName(name).outputMode("append").start()
    batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
    val rows = spark.table(name).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    q.stop()
    rows
  }

  // timeline: window [B,B+10) gets 1+2; event at B+27 moves the watermark to
  // B+22, closing [B,B+10); then B+3 is late (B+3 < B+22)
  val base = Seq(
    Seq(Reading("a", B + 1, 1), Reading("a", B + 5, 2)),
    Seq(Reading("a", B + 27, 10)),
    Seq(Reading("a", B + 3, 100)),
    Seq(Reading("a", B + 45, 7))) // watermark B+40 closes [B+20,B+30)

  test("late policy drop: late row vanishes") {
    val rows = run(LatePolicy.Drop)(base)
    assert(rows.contains(("a", B, 3L)))     // 1+2, no late 100
    assert(rows.contains(("a", B + 20, 10L)))
    assert(!rows.exists(_._3 == 100L))
  }

  test("late policy fire_per_message: late row emits immediately for its window") {
    val rows = run(LatePolicy.FirePerMessage)(base)
    assert(rows.contains(("a", B, 3L)))       // closed without the late row
    assert(rows.contains(("a", B, 100L)))     // late singleton fired for [B,B+10)
  }

  test("late policy place_in_oldest: late row folds into oldest open window") {
    val rows = run(LatePolicy.PlaceInOldest)(base)
    // when B+3 arrives, [B+20,B+30) (holding 10) is the oldest open window →
    // closes later with 110
    assert(rows.contains(("a", B, 3L)))
    assert(rows.contains(("a", B + 20, 110L)))
  }

  test("quiet key: windows flush on watermark advance without new input") {
    // key "q" emits once and goes silent; key "a" keeps advancing the
    // watermark — q's window must close via the event-time timeout
    // (reference windows.pony on_timeout), under every policy
    Seq(LatePolicy.Drop, LatePolicy.FirePerMessage,
        LatePolicy.PlaceInOldest).foreach { policy =>
      val rows = run(policy)(Seq(
        Seq(Reading("q", B + 2, 42), Reading("a", B + 1, 1)),
        Seq(Reading("a", B + 30, 1)),   // watermark → B+25: closes [B,B+10)
        Seq(Reading("a", B + 31, 1))))  // extra batch: lets timeouts run
      assert(rows.contains(("q", B, 42L)), s"$policy: $rows")
    }
  }

  test("count windows across micro-batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Reading]
    val out = StatefulWindows.countWindows(in.toDS(), (_: Reading).key,
      (_: Reading).t, count = 3, sumAgg)
    val q = out.toDF("key", "win", "total").writeStream
      .format("memory").queryName("cw_out").outputMode("append").start()
    in.addData(Reading("a", 1, 1), Reading("a", 2, 2))
    q.processAllAvailable()
    assert(spark.table("cw_out").count() == 0)  // window not full yet
    in.addData(Reading("a", 3, 3), Reading("a", 4, 4))
    q.processAllAvailable()
    val rows = spark.table("cw_out").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows == Seq(("a", 0L, 6L)))  // first 3 rows → sum 6; 4th pending
    q.stop()
  }
}
