package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Incremental CHUNK-level dedup over a document stream — the streaming
  * twin of [[graft.operators.Chunking]]: each micro-batch splits its
  * documents with the content-defined chunker (native
  * [[graft.plans.ChunkHashes]]), reports per document how much of its
  * content already exists (in the accumulated chunk store OR earlier in
  * the same batch), and appends the new chunk hashes to the store.
  *
  * Scale shape: per batch the work is O(batch) chunking + one equi-join
  * against the store keyed on the 60-bit chunk hash; the store is
  * parquet partitioned by a hash bucket (compactable like
  * [[StreamingDedup.compactStore]]). No old document is ever re-chunked.
  *
  * Replay safety: foreachBatch is at-least-once, so every write is keyed
  * on the batch id and uses DYNAMIC partition overwrite — a replayed
  * batch rewrites exactly its own `batch_id=` partitions instead of
  * double-appending report rows / store chunks (same discipline as
  * [[UpsertSink]]). Store reads exclude the replaying batch's own
  * partition so the report is also replay-deterministic.
  */
object StreamingChunkDedup {

  private val Buckets = 16

  def start(docs: DataFrame, storeDir: String, flagDir: String,
      checkpoint: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, storeDir, flagDir)
      }
      .start()

  private def exists(spark: org.apache.spark.sql.SparkSession,
      dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** One micro-batch step (factored out for direct testing). */
  def processBatch(batch: DataFrame, batchId: Long, storeDir: String,
      flagDir: String): Unit = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return
    graft.plans.ChunkHashes.register(spark, k = 8, modulus = 64)
    val ch = batch.select(col("doc_id"), explode(array_distinct(
        graft.plans.ChunkHashes.chunkHashes(col("text")))).as("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val store =
        if (exists(spark, storeDir))
          // only strictly earlier batches: a replayed batch must not see its
          // own (failed) prior write, nor later batches' chunks if the
          // replay comes after they committed
          Some(spark.read.parquet(storeDir)
            .filter(col("batch_id") < batchId)
            .select(col("h")).distinct())
        else None
      // broadcast the batch side: the store outgrows the auto-broadcast
      // threshold with depth and would otherwise be shuffle-sorted every
      // batch (see StreamingDedup.processBatch) — hinted, it only streams
      val storeHits = store.map(st => broadcast(ch).join(st, "h"))
      // within-batch: a chunk counts as duplicated for every doc after
      // its first (smallest-id) owner in this batch
      val owners = ch.groupBy(col("h")).agg(min(col("doc_id")).as("first_owner"))
      val batchHits = ch.join(owners, "h")
        .filter(col("doc_id") > col("first_owner"))
        .select(col("doc_id"), col("h"))
      val dups = storeHits.fold(batchHits)(batchHits.unionByName(_)).distinct()
      val report = ch.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"))
        .join(dups.groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup")),
          Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_chunks"),
          coalesce(col("n_dup"), lit(0L)).as("n_dup_chunks"))
      report.withColumn("batch_id", lit(batchId))
        .write.partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode(SaveMode.Overwrite).parquet(flagDir)
      ch.select(col("h"), pmod(col("h"), lit(Buckets)).as("hb")).distinct()
        .withColumn("batch_id", lit(batchId))
        .repartition(col("hb"))
        .write.partitionBy("hb", "batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode(SaveMode.Overwrite).parquet(storeDir)
    } finally ch.unpersist()
  }
}
