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
      // store accumulated: one shingle payload per doc (docs tree), and
      // posting keys for all five docs (keys tree)
      assert(spark.read.parquet(storeDir + "/docs").count() == 5)
      assert(spark.read.parquet(storeDir + "/keys").select("doc_id")
        .distinct().count() == 5)
    } finally q.stop()
  }

  test("replay is idempotent; compaction preserves probes and prunes by bucket") {
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
    def storeRows() =
      spark.read.parquet(store + "/keys").collect().toSet ->
        spark.read.parquet(store + "/docs").collect().toSet
    val storeOnce = storeRows()
    val flagsOnce = spark.read.parquet(flagsA).collect().toSet
    StreamingDedup.processBatch(batch((10L, c)), 1L, store, flagsA, 64, 16, 0.5)
    assert(storeRows() == storeOnce,
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
    val postKeys = spark.read.parquet(store2 + "/keys")
      .select($"doc_id", $"band", $"bk")
    assert(postKeys.count() == postKeys.distinct().count()) // cross-batch dups gone
    assert(postKeys.select("doc_id").distinct().count() == 3)
    // merged rows keep the EARLIEST src_batch (doc 10 was first visible
    // at batch 1, not at its batch-5 re-ingest)
    assert(spark.read.parquet(store2 + "/docs")
      .filter($"doc_id" === 10L).select("src_batch")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    StreamingDedup.processBatch(batch((3L, aDup)), 2L, store2, flagsB, 64, 16, 0.5)
    val got = spark.read.parquet(flagsB)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(_._1 == 3L).toSet
    assert(got == expected.filter(_._1 == 3L), s"got=$got expected=$expected")
    assert(got.contains((3L, 1L)))

    // compacted layout: batch_id=-1/bucket=N partition dirs under the keys
    // tree, and a bucket probe prunes at the source
    val dirs = new java.io.File(store2 + "/keys/batch_id=-1").listFiles
      .filter(_.isDirectory)
    assert(dirs.exists(_.getName.startsWith("bucket=")))
    val probePlan = spark.read.parquet(store2 + "/keys")
      .filter($"bucket".isin(3L, 7L))
      .queryExecution.executedPlan.toString
    assert(probePlan.contains("PartitionFilters") &&
      "PartitionFilters: \\[[^\\]]*".r.findFirstIn(probePlan)
        .exists(_.contains("bucket")), probePlan)
  }

  test("late replay after compaction still excludes later batches (src_batch)") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_replay_compact").toString
    val store = base + "/store"
    val flags = base + "/flags"
    def batch(rows: (Long, String)*) = rows.toDF("doc_id", "text")
    // batch 0: original; batch 1: near-dup (flags (3,1) at J≈0.9);
    // batch 2: EXACT copy of batch 1's text (J=1.0 with doc 3)
    StreamingDedup.processBatch(batch((1L, a)), 0L, store, flags, 64, 16, 0.5)
    StreamingDedup.processBatch(batch((3L, aDup)), 1L, store, flags, 64, 16, 0.5)
    StreamingDedup.processBatch(batch((5L, aDup)), 2L, store, flags, 64, 16, 0.5)
    val before = spark.read.parquet(flags + "/batch_id=1")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(before == Set((3L, 1L)), before.toString)
    StreamingDedup.compactStore(spark, store)
    // late replay of batch 1 AFTER batch 2 committed and the store was
    // compacted: without src_batch the compacted tree (batch_id=-1) would
    // expose doc 5 (J=1.0 beats J≈0.9) and the flag would flip to (3,5) —
    // the r9 ADVICE hole. With src_batch preserved it must NOT.
    StreamingDedup.processBatch(batch((3L, aDup)), 1L, store, flags, 64, 16, 0.5)
    val after = spark.read.parquet(flags + "/batch_id=1")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after == before, s"replay after compaction changed flags: $after")
  }

  test("auto-compaction fires inside the streaming loop and keeps flags correct") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val base = Files.createTempDirectory("graft_autocompact").toString
    val storeDir = base + "/store"
    val flagDir = base + "/flags"
    val in = MemoryStream[(Long, String)]
    val q = StreamingDedup.start(in.toDF().toDF("doc_id", "text"),
      storeDir, flagDir, base + "/ckpt", autoCompactBatches = 2)
    try {
      in.addData((1L, a)); q.processAllAvailable()
      in.addData((2L, b)); q.processAllAvailable() // 2 trees → compacts
      def batchDirs(sub: String) =
        Option(new java.io.File(s"$storeDir/$sub").listFiles).toSeq.flatten
          .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
          .map(_.getName).toSet
      assert(batchDirs("keys").contains("batch_id=-1"),
        s"auto-compaction did not fire: ${batchDirs("keys")}")
      assert(batchDirs("keys") == Set("batch_id=-1"), batchDirs("keys").toString)
      // post-compaction the stream keeps flowing and probing correctly
      in.addData((3L, aDup)); q.processAllAvailable()
      val got = spark.read.parquet(flagDir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((3L, 1L)), got.toString)
    } finally q.stop()
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
