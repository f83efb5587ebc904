package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RangeJoin
import graft.streaming.StreamOps

/** Stream-stream interval join: two watermarked streams joined on a time
  * range (views within ±60 s of each purchase) — the streaming twin of the
  * batch [[RangeJoin]] decomposition. Verifies cross-batch matching, late
  * -row expiry by watermark, and exact parity with the batch range join
  * over the same rows.
  */
class StreamStreamJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.configure(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")).getOrCreate()

  private def ts(minute: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:$sec%02d")

  test("watermarked stream-stream interval join matches the batch range join") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val pIn = MemoryStream[(Long, Timestamp)]
    val vIn = MemoryStream[(Long, Timestamp, Double)]
    val p = pIn.toDS().toDF("p_id", "p_ts").withWatermark("p_ts", "2 minutes")
    val v = vIn.toDS().toDF("v_id", "v_ts", "v_val")
      .withWatermark("v_ts", "2 minutes")
    val joined = RangeJoin.streamingByTolerance(p, "p_ts", v, "v_ts", 60L)
      .select($"p_id", $"v_id")
    val q = StreamOps.toMemorySink(joined, "ssj_out", "append")

    val purchases = Seq((1L, ts(5)), (2L, ts(10)))
    val views = Seq(
      (101L, ts(4, 30), 1.0),  // within ±60s of p1
      (102L, ts(6, 0), 2.0),   // exactly +60s of p1 (inclusive)
      (103L, ts(8, 0), 3.0),   // matches nothing
      (104L, ts(9, 30), 4.0),  // within ±60s of p2 — arrives a batch later
      (105L, ts(11, 30), 5.0)) // outside +60s of p2

    // batch 1: first purchase + early views; batch 2: the rest arrive later
    pIn.addData(purchases.head)
    vIn.addData(views.take(3): _*)
    q.processAllAvailable()
    pIn.addData(purchases(1))
    vIn.addData(views.drop(3): _*)
    q.processAllAvailable()

    val got = spark.table("ssj_out").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()

    val pb = purchases.toDF("p_id", "p_ts")
      .select($"p_id", unix_timestamp($"p_ts").as("p_s"))
    val vb = views.toDF("v_id", "v_ts", "v_val")
      .select($"v_id", unix_timestamp($"v_ts").as("v_s"))
    val want = RangeJoin.byWindow(pb, "p_s", vb, "v_s", before = 60L, after = 60L)
      .select($"p_id", $"v_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(got == want)
    assert(got == Set((1L, 101L), (1L, 102L), (2L, 104L)))
  }
}
