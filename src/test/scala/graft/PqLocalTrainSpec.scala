package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Pq

/** r15: the gated in-memory PQ/IVF trainer must be byte-identical to the
  * distributed loop — seeds (portable md5-60bit hash order), strict-<
  * argmin assignment with ties to the lowest cid, and truncating
  * integer-mean updates.
  */
class PqLocalTrainSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.configure(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")).getOrCreate()

  test("local trainBooks matches the distributed loop exactly") {
    val emb = graft.sources.Sources.embeddings(spark, "/root/testdata/sf0.001")
    val coded = Pq.quantizeCodes(emb, "vec_id", "embedding", dim = 64)
      .persist()
    try {
      for ((m, k, iters, salt) <- Seq((1, 4, 1, "ivf"), (4, 4, 2, "pqr"),
        (8, 4, 1, "pq"))) {
        val subDim = 64 / m
        val local = Pq.trainBooks(coded, subDim, m, k, iters, salt)
        val dist = Pq.trainBooksShuffle(coded, subDim, m, k, iters, salt)
        assert(local.length == dist.length, s"book count m=$m")
        local.zip(dist).zipWithIndex.foreach { case ((l, d), s0) =>
          assert(l.map(_._1) == d.map(_._1), s"cids differ sub=$s0 m=$m")
          l.zip(d).foreach { case ((cid, lc), (_, dc)) =>
            assert(lc.toSeq == dc.toSeq,
              s"centroid differs m=$m sub=$s0 cid=$cid: " +
                s"${lc.toSeq} vs ${dc.toSeq}")
          }
        }
      }
    } finally { coded.unpersist(): Unit }
  }

  test("local trainIvfCentroids matches the distributed loop exactly") {
    val emb = graft.sources.Sources.embeddings(spark, "/root/testdata/sf0.001")
      .persist()
    try {
      for ((k, iters) <- Seq((4, 2), (8, 1))) {
        val local = graft.operators.Similarity
          .trainIvfCentroids(emb, "vec_id", "embedding", k, iters)
        val dist = graft.operators.Similarity
          .trainIvfCentroidsShuffle(emb, "vec_id", "embedding", k, iters)
        assert(local.map(_._1) == dist.map(_._1), s"cids k=$k")
        local.zip(dist).foreach { case ((cid, lc), (_, dc)) =>
          assert(lc.toSeq == dc.toSeq,
            s"centroid differs k=$k cid=$cid")
        }
      }
    } finally { emb.unpersist(): Unit }
  }
}
