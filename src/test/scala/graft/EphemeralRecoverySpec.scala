package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.api.{GraftAggregation, Pipeline, Sink, StateComputation}
import graft.operators.Event
import graft.sources.Sources
import graft.streaming.{StatefulWindows, StreamOps}
import graft.streaming.StatefulWindows.LatePolicy

class EphemeralRecoverySpec extends AnyFunSuite {
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

  test("ephemeral windows: open → trigger → post-trigger late fire → expire → reopen") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Reading]
    val out = StatefulWindows.ephemeralWindows(in.toDS(), (_: Reading).key,
      (_: Reading).t, "t", triggerS = 10L, postTriggerS = 10L, delayS = 0L,
      LatePolicy.FirePerMessage, sumAgg)
    val q = out.toDF("key", "wstart", "total").writeStream
      .format("memory").queryName("ew_out").outputMode("append").start()
    // window opens at t=1, collects 1+2
    in.addData(Reading("a", 1, 1), Reading("a", 5, 2))
    q.processAllAvailable()
    assert(spark.table("ew_out").count() == 0) // not yet triggered
    // t=12 passes trigger point (1+10) → fires 1+2+? (t=12 arrives before
    // trigger check, so it joins the window: 1+2+4=7)
    in.addData(Reading("a", 12, 4))
    q.processAllAvailable()
    val afterTrigger = spark.table("ew_out").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(afterTrigger == Seq((1L, 7L)))
    // t=15 is in the post-trigger phase → fire-per-message singleton
    in.addData(Reading("a", 15, 100))
    q.processAllAvailable()
    assert(spark.table("ew_out").collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
      == Seq((1L, 7L), (1L, 100L)))
    // t=40 is past the remove point (1+10+10) → expires old state, opens a
    // NEW window at t=40
    in.addData(Reading("a", 40, 5))
    q.processAllAvailable()
    in.addData(Reading("a", 55, 1)) // watermark 55 ≥ 40+10 → triggers new window
    q.processAllAvailable()
    val all = spark.table("ew_out").collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(all.contains((40L, 6L))) // 5 + 1 (t=55 joins before trigger check)
    q.stop()
  }

  test("ephemeral windows: quiet key triggers on global watermark advance") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val B = 1700000000L
    val in = MemoryStream[Reading]
    val out = StatefulWindows.ephemeralWindows(in.toDS(), (_: Reading).key,
      (_: Reading).t, "t", triggerS = 10L, postTriggerS = 10L, delayS = 0L,
      LatePolicy.Drop, sumAgg, admitLateS = 60L)
    val q = out.toDF("key", "wstart", "total").writeStream
      .format("memory").queryName("ew_quiet").outputMode("append").start()
    // key q fires once and goes silent; key a advances the query watermark
    in.addData(Reading("q", B + 1, 5), Reading("a", B + 1, 1))
    q.processAllAvailable()
    in.addData(Reading("a", B + 100, 1))
    q.processAllAvailable()
    in.addData(Reading("a", B + 101, 1)) // extra batch lets timeouts run
    q.processAllAvailable()
    val rows = spark.table("ew_quiet").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows.contains(("q", B + 1, 5L)), rows.toString)
    q.stop()
  }

  test("keyed state survives query restart from checkpoint") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val outDir = Files.createTempDirectory("graft_rec_out").toString
    val totals = new StateComputation[Event, Long, (Long, Long)] {
      val name = "running"
      def initialState = 0L
      def apply(e: Event, cum: Long) = {
        val next = cum + math.round(e.value)
        (next, Iterator.single((e.user_id, next)))
      }
    }
    def startQuery(in: MemoryStream[Event]) =
      StreamOps.computeKeyedState(in.toDS(), (_: Event).user_id,
        (_: Event).event_id, totals).toDF("user_id", "total")
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()

    val in1 = MemoryStream[Event]
    val q1 = startQuery(in1)
    in1.addData(Event(1, 42, "p", 10.0, ""))
    q1.processAllAvailable()
    q1.stop()
    // new query instance, same checkpoint: state (42 -> 10) must be restored.
    // MemoryStream offsets restart at 0, and the checkpoint has batch 0
    // committed — the first added item stands in for the replayed offset and
    // is skipped; the second lands in a fresh batch.
    val in2 = MemoryStream[Event]
    in2.addData(Event(1, 42, "p", 10.0, "")) // placeholder for committed offset
    val q2 = startQuery(in2)
    q2.processAllAvailable()
    in2.addData(Event(2, 42, "p", 5.0, ""))
    q2.processAllAvailable()
    q2.stop()
    val rows = spark.read.parquet(outDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows == Set((42L, 10L), (42L, 15L))) // 15 proves restored state
  }

  test("toSinks fans one pipeline out to multiple sinks") {
    import spark.implicits._
    val d1 = Files.createTempDirectory("graft_s1").toString
    val d2 = Files.createTempDirectory("graft_s2").toString
    val ev = Sources.events(spark, "/root/testdata/sf0.001")
      .select($"event_id", $"user_id", $"event_type", $"value", $"props").as[Event]
    Pipeline.source("multi", ev)
      .toSinks(Seq(Sink.parquet(s"$d1/out"), Sink.json(s"$d2/out")))
    assert(spark.read.parquet(s"$d1/out").count() == ev.count())
    assert(spark.read.json(s"$d2/out").count() == ev.count())
  }

  test("csv and json sources round-trip") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_src").toString
    val orig = Sources.nation(spark, "/root/testdata/sf0.001")
    orig.write.option("header", "true").csv(s"$dir/nation_csv")
    orig.write.json(s"$dir/nation_json")
    assert(Sources.csv(spark, s"$dir/nation_csv").count() == orig.count())
    assert(Sources.json(spark, s"$dir/nation_json").count() == orig.count())
  }
}
