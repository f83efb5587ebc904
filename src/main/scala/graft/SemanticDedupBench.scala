package graft

import org.apache.spark.sql.functions._
import graft.streaming.StreamingSemanticDedup

/** Scale evidence for the incremental embedding dedup: stream a whole
  * embeddings table through [[StreamingSemanticDedup.processBatch]] in
  * micro-batches against a trained IVF centroid set, so the store grows
  * batch over batch exactly as it would in production, and report
  * end-to-end wall, per-batch mean, and the flag yield.
  *
  * Run: `sbt "runMain graft.SemanticDedupBench [sfDir] [nBatches] [K]"`.
  */
object SemanticDedupBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(10)
    val kCents = args.lift(2).map(_.toInt).getOrElse(32)
    val spark = GraftSession.local("semantic-dedup-bench")
    spark.sparkContext.setLogLevel("WARN")

    val emb = graft.sources.Sources.embeddings(spark, dir)
      .select(col("vec_id").cast("long").as("doc_id"),
        col("embedding").as("emb"))
      .persist()
    val rows = emb.count()
    val cents = graft.operators.Similarity.trainIvfCentroids(
      emb, "doc_id", "emb", k = kCents, iters = 3)

    val base = java.nio.file.Files.createTempDirectory("graft_semb").toString
    val store = s"$base/store"
    val flags = s"$base/flags"
    val t0 = System.nanoTime()
    var b = 0
    while (b < nBatches) {
      // deterministic round-robin batching; each batch probes the store
      // accumulated by all earlier batches
      val batch = emb.filter(pmod(col("doc_id"), lit(nBatches)) === b)
      StreamingSemanticDedup.processBatch(batch, b.toLong, cents, store,
        flags, threshold = 0.99, nprobe = 2)
      b += 1
    }
    val totalSec = (System.nanoTime() - t0) / 1e9
    val nFlags = spark.read.parquet(flags).count()
    val storeRows = spark.read.parquet(store).count()
    println(
      s"""{"metric":"semantic_dedup_stream","rows":$rows,""" +
        s""""batches":$nBatches,"centroids":$kCents,""" +
        f""""total_sec":$totalSec%.1f,"mean_batch_sec":${totalSec / nBatches}%.2f,""" +
        s""""flags":$nFlags,"store_rows":$storeRows}""")
    spark.stop()
  }
}
