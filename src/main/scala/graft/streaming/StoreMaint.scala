package graft.streaming

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Shared maintenance for the append-only streaming stores
  * ([[StreamingDedup]], [[StreamingChunkDedup]],
  * [[StreamingSemanticDedup]]): compaction of per-batch partition trees
  * into one `batch_id=-1` tree, and the cheap trigger check the
  * auto-compaction policy polls from inside `foreachBatch`.
  *
  * Compaction preserves replay determinism: every store row carries a
  * `src_batch` DATA column (the batch that first wrote it), merged rows
  * keep `min(src_batch)` — the first batch that made the row visible — so
  * the probes' strictly-earlier filter (`src_batch < batchId`) gives a
  * late replay exactly the store view it saw the first time, regardless
  * of how many compactions ran in between.
  */
private[streaming] object StoreMaint {

  /** Number of uncompacted per-batch trees (`batch_id=N`, N ≥ 0) under
    * `dir` — ONE directory listing, no file walk, cheap enough to run
    * after every micro-batch as the auto-compaction trigger.
    */
  def uncompactedBatches(spark: SparkSession, dir: String): Int = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) 0
    else fs.listStatus(p).count { st =>
      val n = st.getPath.getName
      st.isDirectory && n.startsWith("batch_id=") && n != "batch_id=-1"
    }
  }

  /** Rewrite all of `dir`'s per-batch trees into one `batch_id=-1` tree
    * partitioned by `partCol`, merging duplicate `keyCols` rows to their
    * minimum `src_batch`. Atomic: write to a side dir, swap via rename
    * (atomic on HDFS/local; for S3-like stores use the manifest pattern —
    * ManifestObjectStore — instead of dir renames), then drop the old
    * tree. Resolves through the Hadoop FileSystem the store actually
    * lives on, the same way the batch writers do.
    */
  def compactTree(spark: SparkSession, dir: String, partCol: String,
      keyCols: Seq[String]): Unit = {
    val storePath = new org.apache.hadoop.fs.Path(dir)
    val fs = storePath.getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new org.apache.hadoop.fs.Path(dir + "__compacting")
    val old = new org.apache.hadoop.fs.Path(dir + "__old")
    spark.read.parquet(dir)
      .groupBy((keyCols :+ partCol).map(col): _*)
      .agg(min(col("src_batch")).as("src_batch"))
      .repartition(col(partCol))
      .write.partitionBy(partCol).mode(SaveMode.Overwrite)
      .parquet(new org.apache.hadoop.fs.Path(tmp, "batch_id=-1").toString)
    if (!fs.rename(storePath, old))
      throw new java.io.IOException(s"compactTree: rename $dir -> $old failed")
    if (!fs.rename(tmp, storePath))
      throw new java.io.IOException(s"compactTree: rename $tmp -> $dir failed")
    fs.delete(old, true): Unit
  }
}
