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

  test("replay is idempotent; compaction preserves probes and prunes by band") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_compact").toString
    val store = base + "/store"
    val flagsA = base + "/flagsA"
    val flagsB = base + "/flagsB"
    def batch(rows: (Long, String)*) = rows.toDF("doc_id", "text")
    // seed two batches, then replay batch 1 verbatim (at-least-once):
    // per-batch overwrite must leave the store and flags unchanged
    StreamingDedup.processBatch(batch((1L, a), (2L, b)), 0L, store, flagsA, 64, 16, 0.5)
    StreamingDedup.processBatch(batch((10L, c)), 1L, store, flagsA, 64, 16, 0.5)
    val storeOnce = spark.read.parquet(store).collect().toSet
    val flagsOnce = spark.read.parquet(flagsA).collect().toSet
    StreamingDedup.processBatch(batch((10L, c)), 1L, store, flagsA, 64, 16, 0.5)
    assert(spark.read.parquet(store).collect().toSet == storeOnce,
      "replayed batch must rewrite its partition, not double-append")
    assert(spark.read.parquet(flagsA).collect().toSet == flagsOnce)
    // and the replay must not flag doc 10 against its own failed write
    assert(!spark.read.parquet(flagsA).collect().exists(_.getLong(0) == 10L))
    def parquetFiles(dir: String): Int = {
      def walk(f: java.io.File): Int =
        if (f.isDirectory) Option(f.listFiles).toSeq.flatten.map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1 else 0
      walk(new java.io.File(dir))
    }
    val filesBefore = parquetFiles(store)

    // probe WITHOUT compaction → expected flags
    StreamingDedup.processBatch(batch((3L, aDup)), 2L, store, flagsA, 64, 16, 0.5)
    val expected = spark.read.parquet(flagsA)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // rebuild the same store (with a cross-batch re-ingest of doc 10 that
    // only compaction can dedup), compact, probe → same flags
    val store2 = base + "/store2"
    StreamingDedup.processBatch(batch((1L, a), (2L, b)), 0L, store2, flagsB, 64, 16, 0.5)
    StreamingDedup.processBatch(batch((10L, c)), 1L, store2, flagsB, 64, 16, 0.5)
    StreamingDedup.processBatch(batch((10L, c)), 5L, store2, flagsB, 64, 16, 0.5)
    StreamingDedup.compactStore(spark, store2)
    // compacted layout: fewer files than the three per-batch trees
    // (counted BEFORE the probe batch adds its own tree back)
    val filesAfter = parquetFiles(store2)
    assert(filesAfter < filesBefore, s"$filesAfter vs $filesBefore")
    val post = spark.read.parquet(store2)
      .select($"doc_id", $"band", $"bk", $"sh")
    assert(post.count() == post.distinct().count()) // cross-batch dups gone
    assert(post.select("doc_id").distinct().count() == 3)
    StreamingDedup.processBatch(batch((3L, aDup)), 2L, store2, flagsB, 64, 16, 0.5)
    val got = spark.read.parquet(flagsB)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(_._1 == 3L).toSet
    assert(got == expected.filter(_._1 == 3L), s"got=$got expected=$expected")
    assert(got.contains((3L, 1L)))

    // compacted layout: batch_id=-1/band=N partition dirs, and a band
    // probe prunes at the source
    val dirs = new java.io.File(store2 + "/batch_id=-1").listFiles
      .filter(_.isDirectory)
    assert(dirs.exists(_.getName.startsWith("band=")))
    val probePlan = spark.read.parquet(store2).filter($"band" === 3)
      .queryExecution.executedPlan.toString
    assert(probePlan.contains("PartitionFilters") &&
      probePlan.contains("band"), probePlan)
  }

  test("dropDuplicatesWithinWatermark: exact streaming dedup matches batch distinct") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sc = spark.sqlContext
    val outDir = java.nio.file.Files.createTempDirectory("graft_ddw").toString + "/out"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ddw_ckpt").toString
    val in = MemoryStream[(Long, Long, String)]
    // (event ts seconds, key, payload): duplicates of the same key arrive
    // across micro-batches but inside the watermark window
    val q = in.toDF().toDF("ts_s", "k", "v")
      .withColumn("ts", timestamp_seconds($"ts_s"))
      .withWatermark("ts", "10 seconds")
      .dropDuplicatesWithinWatermark("k")
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      in.addData((100L, 1L, "a"), (101L, 2L, "b"), (102L, 1L, "a-dup"))
      q.processAllAvailable()
      in.addData((103L, 2L, "b-dup"), (104L, 3L, "c"), (200L, 9L, "advance"))
      q.processAllAvailable()
      val keys = spark.read.parquet(outDir).select("k")
        .collect().map(_.getLong(0)).sorted
      // one row per key, exactly like batch dropDuplicates on the union
      assert(keys.toSeq == Seq(1L, 2L, 3L, 9L), keys.toSeq.toString)
    } finally q.stop()
  }
}
