package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.api.StateComputation
import graft.operators.Funnel
import graft.streaming.StreamOps

/** Streaming funnel: the ordered view→click→purchase machine expressed as
  * a plain [[StateComputation]] over the existing per-key-state operator —
  * no new streaming surface needed. Completed conversions match the batch
  * [[Funnel.funnelStages]] chain on the same events.
  */
class StreamingFunnelSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.configure(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")).getOrCreate()

  // (user, type, ts) → state (t0,t1,t2; -1 unset) → emit on completion
  private val machine =
    new StateComputation[(Long, String, Long), (Long, Long, Long),
        (Long, Long, Long, Long)] {
      val name = "funnel"
      def initialState = (-1L, -1L, -1L)
      def apply(e: (Long, String, Long), s: (Long, Long, Long)) = {
        val (u, tpe, ts) = e
        val (t0, t1, t2) = s
        val next = tpe match {
          case "view" if t0 < 0 => (ts, t1, t2)
          case "click" if t0 >= 0 && t1 < 0 && ts > t0 => (t0, ts, t2)
          case "purchase" if t1 >= 0 && t2 < 0 && ts > t1 => (t0, t1, ts)
          case _ => s
        }
        val out =
          if (t2 < 0 && next._3 >= 0)
            Iterator.single((u, next._1, next._2, next._3))
          else Iterator.empty
        (next, out)
      }
    }

  test("streaming funnel StateComputation matches the batch stage chain") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val rng = new scala.util.Random(13)
    val types = Seq("view", "click", "purchase", "error")
    // randomized event log over 40 users, ts strictly increasing
    val events = (1 to 600).map { i =>
      (rng.nextInt(40).toLong, types(rng.nextInt(types.length)), i.toLong)
    }
    val in = MemoryStream[(Long, String, Long)]
    val out = StreamOps.computeKeyedState[(Long, String, Long), Long,
        (Long, Long, Long), (Long, Long, Long, Long)](
      in.toDS(), _._1, _._3, machine)
      .toDF("user_id", "t0", "t1", "t2")
    val q = StreamOps.toMemorySink(out, "funnel_out", "append")
    events.grouped(200).foreach { batch =>
      in.addData(batch: _*)
      q.processAllAvailable()
    }
    val got = spark.table("funnel_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    q.stop()

    val batch = Funnel.funnelStages(
      events.toDF("user_id", "event_type", "ts"),
      "user_id", "event_type", "ts", Seq("view", "click", "purchase"))
      .filter($"t_2".isNotNull)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == batch)
    assert(got.nonEmpty, "expected at least one completed conversion")
  }
}
