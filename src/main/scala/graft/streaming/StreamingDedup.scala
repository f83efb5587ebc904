package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Incremental near-dup detection over a DOCUMENT STREAM — the reference's
  * continuous-processing model applied to the LLM-pipeline dedup family:
  * each micro-batch hashes its documents once (native
  * [[graft.plans.ShingleHashes]] + [[graft.plans.MinHashAgg]] OPH
  * signatures), LSH band keys of the new docs are joined against the
  * accumulated signature store, verified near-dups are appended to a flag
  * sink, and the new signatures are appended to the store.
  *
  * Scale shape: per batch the work is O(batch) hashing + one band-bucket
  * join against the store (band keys are the store's partition/filter
  * column at 100 TB — only matching buckets are read); the store itself is
  * append-only parquet, compactable offline. No signature is ever
  * recomputed for old documents.
  *
  * Replay safety: foreachBatch is at-least-once, so each batch writes its
  * flags and signatures under its own `batch_id=` partition directory with
  * whole-subdir overwrite — a replayed batch rewrites exactly its prior
  * output instead of double-appending, and the store probe reads only
  * strictly earlier batches (`batch_id < batchId`) so flags are
  * replay-deterministic even for a late replay issued after later
  * batches committed.
  */
object StreamingDedup {

  /** Band keys + hashed shingles for a (doc_id, text) batch — band layout
    * comes from [[graft.operators.Dedup.minhashBandKeys]], the same code
    * the batch LSH family uses, so store contents stay band-compatible.
    */
  private[streaming] def signatures(batch: DataFrame, numHashes: Int,
      bands: Int): DataFrame = {
    val spark = batch.sparkSession
    graft.plans.ShingleHashes.register(spark, n = 3)
    val hashed = batch.select(col("doc_id"),
      graft.plans.ShingleHashes.shingleHashes(col("text")).as("_sh"))
    graft.operators.Dedup.minhashBandKeys(hashed, "doc_id", numHashes, bands)
      .join(hashed.withColumnRenamed("_sh", "sh"), "doc_id")
  }

  /** Start the incremental dedup: reads a streaming (doc_id, text) frame,
    * writes near-dup flags (doc_id, dup_of, jaccard) to `flagDir` and
    * signatures to `storeDir`.
    */
  def start(docs: DataFrame, storeDir: String, flagDir: String,
      checkpoint: String, numHashes: Int = 64, bandCount: Int = 16,
      threshold: Double = 0.5): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, storeDir, flagDir, numHashes, bandCount,
          threshold)
      }
      .start()

  private def exists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** One micro-batch step (factored out for direct testing). */
  def processBatch(batch: DataFrame, batchId: Long, storeDir: String,
      flagDir: String, numHashes: Int, bandCount: Int,
      threshold: Double): Unit = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return
    val sigs = signatures(batch, numHashes, bandCount)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val store =
        if (exists(spark, storeDir))
          // only STRICTLY EARLIER batches (compacted batch_id=-1 included):
          // a replayed batch must not probe its own (failed) prior write,
          // and a late replay issued after later batches committed must not
          // see them either — flags stay replay-deterministic both ways
          Some(spark.read.parquet(storeDir)
            .filter(col("batch_id") < batchId).drop("batch_id"))
        else None
      // candidates: new-vs-store (store doc wins as dup_of) + new-vs-new.
      // BROADCAST the batch side: a batch's band keys hit ALL bands, so
      // band partitioning prunes nothing on the ingest probe, and once
      // the store outgrows the auto-broadcast threshold Spark would
      // sort-merge-join it — shuffling the WHOLE store every batch, a
      // per-batch cost that grows linearly with store depth (measured:
      // 1.7→4.9 s/batch by 99× depth at sf2). With the hint the store
      // only STREAMS through a broadcast-hash-join — no store shuffle at
      // any depth; the batch side (operator-bounded) is the build side.
      val vsStore = store.map { st =>
        broadcast(sigs).join(st.select(col("doc_id").as("dup_of"), col("band"),
          col("bk"), col("sh").as("sh_b")), Seq("band", "bk"))
          .filter(col("doc_id") =!= col("dup_of"))
      }
      val newer = sigs.select(col("doc_id").as("dup_of"), col("band"),
        col("bk"), col("sh").as("sh_b"))
      val vsNew = sigs.join(newer, Seq("band", "bk"))
        .filter(col("doc_id") > col("dup_of")) // later id is the duplicate
      val jac = size(array_intersect(col("sh"), col("sh_b"))).cast("double") /
        size(array_union(col("sh"), col("sh_b")))
      // best match per doc: max jaccard, ties to the smaller dup_of — kept
      // together as one struct so the reported pair is consistent
      val flagged = vsStore.fold(vsNew)(vsNew.unionByName(_))
        .select(col("doc_id"), col("dup_of"), col("sh"), col("sh_b"))
        .distinct()
        .withColumn("jaccard", jac)
        .filter(col("jaccard") >= threshold)
        .groupBy(col("doc_id"))
        .agg(max(struct(col("jaccard"), (-col("dup_of")).as("nd"))).as("_best"))
        .select(col("doc_id"), (-col("_best.nd")).as("dup_of"),
          col("_best.jaccard").as("jaccard"))
      // whole-subdir overwrite per batch id: replay rewrites, never appends
      // (and an empty flag batch still lands a schema'd file, so the flag
      // dir is always readable)
      flagged.write.mode(SaveMode.Overwrite)
        .parquet(s"$flagDir/batch_id=$batchId")
      // band-partitioned under the batch dir so the layout matches what
      // compactStore rewrites (batch_id=-1) and band probes prune at the
      // source; repartition(band) gives one file per band, not one per task
      sigs.select(col("doc_id"), col("band"), col("bk"), col("sh"))
        .repartition(col("band"))
        .write.partitionBy("band").mode(SaveMode.Overwrite)
        .parquet(s"$storeDir/batch_id=$batchId")
    } finally sigs.unpersist()
  }

  /** Compact the signature store: drop duplicate rows (the same document
    * re-ingested across DIFFERENT batches — same-batch replay is already
    * idempotent via the per-batch overwrite) and rewrite the accumulated
    * per-batch small files into one `batch_id=-1` tree partitioned by
    * `band`.
    *
    * After compaction a targeted probe (filter on band values) prunes to
    * the matching partition directories at the source — the store scales
    * to a 100 TB corpus's signatures because no probe ever reads buckets
    * it can't match. The rewrite is a write-to-side-dir + atomic swap;
    * call it from a maintenance point between batches (foreachBatch
    * serializes batches, so scheduling it there is safe).
    */
  def compactStore(spark: SparkSession, storeDir: String): Unit = {
    // swap through the Hadoop FileSystem the store actually lives on —
    // processBatch resolves storeDir through it, so compaction must too.
    // rename is atomic on HDFS/local; for S3-like stores use the manifest
    // pattern (ManifestObjectStore) instead of dir renames.
    val storePath = new org.apache.hadoop.fs.Path(storeDir)
    val fs = storePath.getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new org.apache.hadoop.fs.Path(storeDir + "__compacting")
    val old = new org.apache.hadoop.fs.Path(storeDir + "__old")
    spark.read.parquet(storeDir)
      .select(col("doc_id"), col("band"), col("bk"), col("sh"))
      .distinct()
      .repartition(col("band"))
      .write.partitionBy("band").mode(SaveMode.Overwrite)
      .parquet(new org.apache.hadoop.fs.Path(tmp, "batch_id=-1").toString)
    if (!fs.rename(storePath, old))
      throw new java.io.IOException(s"compactStore: rename $storeDir -> $old failed")
    if (!fs.rename(tmp, storePath))
      throw new java.io.IOException(s"compactStore: rename $tmp -> $storeDir failed")
    fs.delete(old, true): Unit
  }
}
