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
    graft.plans.VecCosine.register(emb.sparkSession)
    val q = query.select(col(queryVecCol).as("_qv"))
    val base = emb.crossJoin(broadcast(q))
    val filtered = excludeId.fold(base)(id => base.filter(col(idCol) =!= id))
    filtered
      .withColumn("cos", graft.plans.VecCosine.cosine(col(vecCol), col("_qv")))
      .drop("_qv")
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Assign each vector to its nearest centroid (by cosine) with ZERO
    * shuffle: the K centroids (K ≪ n) are collected once and folded as a
    * literal array inside a single projection — an argmax per row, no
    * crossJoin fan-out, no exchange. Strict `>` in the fold keeps the
    * lowest centroid id on ties, i.e. `ORDER BY cos DESC, cid ASC`.
    */
  def assignIvf(emb: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, centroidIdCol: String, centroidVecCol: String): DataFrame = {
    val cents = centroids
      .select(col(centroidIdCol).cast("long"), col(centroidVecCol))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
      .sortBy(_._1)
    require(cents.nonEmpty, "assignIvf: no centroids")
    val cArr = array(cents.map { case (cid, v) =>
      struct(lit(cid).as("cid"), typedLit(v).as("cv"))
    }: _*)
    graft.plans.VecCosine.register(emb.sparkSession)
    val best = aggregate(cArr,
      struct(lit(-1L).as("cid"), lit(Double.NegativeInfinity).as("cos")),
      (acc, c) => {
        val cs = graft.plans.VecCosine.cosine(col(vecCol), c.getField("cv"))
        when(cs > acc.getField("cos"),
          struct(c.getField("cid").as("cid"), cs.as("cos"))).otherwise(acc)
      })
    emb.withColumn("bucket", best.getField("cid"))
  }

  /** 100 TB layout: persist the IVF assignment partitioned by bucket so a
    * probe prunes at the source (only `nprobe` of K directories are read).
    */
  def writeBucketed(assigned: DataFrame, path: String): Unit =
    assigned.write.mode("overwrite").partitionBy("bucket").parquet(path)

  /** IVF top-k: probe only the `nprobe` buckets whose centroids are closest
    * to the query vector, then brute-force inside them.
    */
  def ivfTopK(assigned: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, centroidIdCol: String, centroidVecCol: String,
      query: DataFrame, queryVecCol: String, k: Int, nprobe: Int,
      excludeId: Option[Long] = None): DataFrame = {
    graft.plans.VecCosine.register(assigned.sparkSession)
    val probeBuckets = centroids
      .crossJoin(broadcast(query.select(col(queryVecCol).as("_qv"))))
      .withColumn("_ccos", graft.plans.VecCosine.cosine(col(centroidVecCol), col("_qv")))
      .orderBy(col("_ccos").desc, col(centroidIdCol))
      .limit(nprobe)
      .select(col(centroidIdCol).as("bucket"))
    val candidates = assigned.join(broadcast(probeBuckets), "bucket")
    cosineTopK(candidates, idCol, vecCol, query, queryVecCol, k, excludeId)
  }
}
