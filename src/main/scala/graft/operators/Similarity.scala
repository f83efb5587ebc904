package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k (one scan, broadcast query vector).
  * Scale path: IVF — vectors are pre-assigned to the nearest of K
  * centroids (broadcast, K ≪ n); a query only scans the `nprobe` closest
  * centroid buckets, turning a full scan into a partition-pruned one.
  * At 100 TB the assignment writes out partitioned-by-bucket parquet and
  * queries prune at the source.
  */
object Similarity {

  /** Brute-force top-k by cosine against one query vector (broadcast; the
    * query norm is folded once on the broadcast side).
    */
  def cosineTopK(emb: DataFrame, idCol: String, vecCol: String,
      query: DataFrame, queryVecCol: String, k: Int,
      excludeId: Option[Long] = None): DataFrame = {
    val q = query.select(col(queryVecCol).as("_qv"))
      .withColumn("_qn", vecNormD(col("_qv")))
    val base = emb.crossJoin(broadcast(q))
    val filtered = excludeId.fold(base)(id => base.filter(col(idCol) =!= id))
    filtered
      .withColumn("cos",
        dotD(col(vecCol), col("_qv")) / (vecNormD(col(vecCol)) * col("_qn")))
      .drop("_qv", "_qn")
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Assign each vector to its nearest centroid (by cosine). Centroids are
    * broadcast; assignment is a rank-1 window over the small fan-out.
    */
  def assignIvf(emb: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, centroidIdCol: String, centroidVecCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fan = emb.crossJoin(broadcast(centroids.select(
      col(centroidIdCol).as("_cid"), col(centroidVecCol).as("_cv"))))
      .withColumn("_ccos", cosineSim(col(vecCol), col("_cv")))
    val w = Window.partitionBy(col(idCol)).orderBy(col("_ccos").desc, col("_cid"))
    fan.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_cv", "_ccos", "_rn")
      .withColumnRenamed("_cid", "bucket")
  }

  /** IVF top-k: probe only the `nprobe` buckets whose centroids are closest
    * to the query vector, then brute-force inside them.
    */
  def ivfTopK(assigned: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, centroidIdCol: String, centroidVecCol: String,
      query: DataFrame, queryVecCol: String, k: Int, nprobe: Int,
      excludeId: Option[Long] = None): DataFrame = {
    val probeBuckets = centroids
      .crossJoin(broadcast(query.select(col(queryVecCol).as("_qv"))))
      .withColumn("_ccos", cosineSim(col(centroidVecCol), col("_qv")))
      .orderBy(col("_ccos").desc, col(centroidIdCol))
      .limit(nprobe)
      .select(col(centroidIdCol).as("bucket"))
    val candidates = assigned.join(broadcast(probeBuckets), "bucket")
    cosineTopK(candidates, idCol, vecCol, query, queryVecCol, k, excludeId)
  }
}
