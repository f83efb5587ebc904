package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingDedup

class StreamingDedupSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.configure(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")).getOrCreate()

  val a = "the quick brown fox jumps over the lazy dog every single morning"
  val aDup = a + " indeed" // one extra word: ~0.9 shingle jaccard with a
  val b = "spark structured streaming keeps per key state across micro batches reliably"
  val c = "completely different content about distributed columnar data processing engines"

  test("incremental dedup flags near-dups against the signature store") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val storeDir = Files.createTempDirectory("graft_sig_store").toString + "/store"
    val flagDir = Files.createTempDirectory("graft_flags").toString + "/flags"
    val ckpt = Files.createTempDirectory("graft_sd_ckpt").toString
    val in = MemoryStream[(Long, String)]
    val q = StreamingDedup.start(in.toDF().toDF("doc_id", "text"),
      storeDir, flagDir, ckpt)
    try {
      // batch 1: two distinct docs — no flags, store seeded
      in.addData((1L, a), (2L, b))
      q.processAllAvailable()
      assert(spark.read.parquet(flagDir).count() == 0)
      // batch 2: near-copy of doc 1 (cross-batch, via the store), a copy
      // of doc 4 inside the same batch, and a fresh doc
      in.addData((3L, aDup), (4L, c), (5L, c))
      q.processAllAvailable()
      val flags = spark.read.parquet(flagDir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(flags.contains((3L, 1L)), flags.toString) // cross-batch near-dup
      assert(flags.contains((5L, 4L)), flags.toString) // within-batch dup
      assert(!flags.exists(_._1 == 2L) && !flags.exists(_._1 == 4L))
      // store accumulated signatures for all five docs
      assert(spark.read.parquet(storeDir).select("doc_id")
        .distinct().count() == 5)
    } finally q.stop()
  }
}
