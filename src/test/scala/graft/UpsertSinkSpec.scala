package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.UpsertSink

/** The CDC upsert sink: last-writer-wins keyed store across micro-batches,
  * bucket-pruned rewrites, idempotence under batch replay.
  */
class UpsertSinkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.configure(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")).getOrCreate()

  test("streaming upsert keeps the latest row per key across batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val storeDir = Files.createTempDirectory("graft_upsert").toString + "/store"
    val ckpt = Files.createTempDirectory("graft_upsert_ckpt").toString
    val in = MemoryStream[(Long, Long, String)]
    val q = UpsertSink.start(in.toDF().toDF("key", "seq", "value"),
      "key", "seq", storeDir, ckpt, nBuckets = 4)
    try {
      in.addData((1L, 10L, "a1"), (2L, 10L, "b1"), (1L, 11L, "a2"))
      q.processAllAvailable()
      val s1 = UpsertSink.snapshot(spark, storeDir)
        .select("key", "value").collect().map(r => (r.getLong(0), r.getString(1))).toMap
      assert(s1 == Map(1L -> "a2", 2L -> "b1"))

      // batch 2: update key 1, insert key 3, stale update for key 2 ignored
      in.addData((1L, 12L, "a3"), (3L, 5L, "c1"), (2L, 9L, "b0"))
      q.processAllAvailable()
      val s2 = UpsertSink.snapshot(spark, storeDir)
        .select("key", "value").collect().map(r => (r.getLong(0), r.getString(1))).toMap
      assert(s2 == Map(1L -> "a3", 2L -> "b1", 3L -> "c1"))
      assert(UpsertSink.snapshot(spark, storeDir).count() == 3)
    } finally q.stop()
  }

  test("mergeBatch is idempotent under at-least-once replay") {
    import spark.implicits._
    val storeDir = Files.createTempDirectory("graft_upsert2").toString + "/store"
    val batch = Seq((1L, 10L, "x"), (2L, 20L, "y")).toDF("key", "seq", "value")
    UpsertSink.mergeBatch(batch, "key", "seq", storeDir, 4)
    UpsertSink.mergeBatch(batch, "key", "seq", storeDir, 4) // replay
    val rows = UpsertSink.snapshot(spark, storeDir)
      .select("key", "value").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.length == 2 && rows.toMap == Map(1L -> "x", 2L -> "y"))
  }
}
