package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** Randomized contract test for the IVF-routed k-NN join: for random
  * corpora, centroid sets, k and nprobe, the distributed pipeline
  * (argmax bucket assignment → nprobe probe explosion → salted bucket
  * join → bounded-heap top-k) must equal an independent in-memory model
  * of the same contract, including the `cos DESC, id ASC` tie order.
  * This pins the route's SEMANTICS (not its recall, which is set by
  * nprobe/K by construction) against any future plan rewrite.
  */
class KnnJoinIvfPropertySpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.configure(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")).getOrCreate()

  private def cosine(a: Array[Float], b: Array[Double]): Double = {
    var dot = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i).toDouble; val y = b(i)
      dot += x * y; aa += x * x; bb += y * y
      i += 1
    }
    dot / (math.sqrt(aa) * math.sqrt(bb))
  }
  private def cosFF(a: Array[Float], b: Array[Float]): Double =
    cosine(a, b.map(_.toDouble))

  test("routed knn join equals the in-memory IVF model on random data") {
    import spark.implicits._
    val rng = new scala.util.Random(41)
    for (trial <- 0 until 3) {
      val dim = 8 + rng.nextInt(8)
      val nCorpus = 150 + rng.nextInt(100)
      val nCents = 3 + rng.nextInt(5)
      val k = 1 + rng.nextInt(4)
      val nprobe = 1 + rng.nextInt(nCents)
      val corpus = (0 until nCorpus).map(i =>
        (i.toLong, Array.fill(dim)(rng.nextGaussian().toFloat)))
      val cents = (0 until nCents).map(c =>
        (c.toLong, Array.fill(dim)(rng.nextGaussian()))).toSeq
      // queries = a corpus subset (self-match excluded, like the catalog)
      val queries = corpus.filter(_._1 % 3 == 0)

      // in-memory model of the contract
      def argmax(v: Array[Float]): Long =
        cents.map { case (cid, cv) => (cosine(v, cv), cid) }
          .maxBy { case (c, cid) => (c, -cid) }._2
      val bucketOf = corpus.map { case (id, v) => id -> argmax(v) }.toMap
      def probed(v: Array[Float]): Set[Long] =
        cents.map { case (cid, cv) => (cosine(v, cv), cid) }
          .sortBy { case (c, cid) => (-c, cid) }.take(nprobe)
          .map(_._2).toSet
      val expect = queries.flatMap { case (qid, qv) =>
        val pb = probed(qv)
        corpus
          .filter { case (id, _) => id != qid && pb.contains(bucketOf(id)) }
          .map { case (id, v) => (qid, id, cosFF(qv, v)) }
          .sortBy { case (_, id, c) => (-c, id) }
          .take(k)
      }.toSet

      val got = Similarity.knnJoinIvf(
        corpus.toDF("vec_id", "embedding"), "vec_id", "embedding",
        queries.toDF("qid", "qv"), "qid", "qv", k, cents, nprobe)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == expect,
        s"trial=$trial dim=$dim n=$nCorpus K=$nCents k=$k nprobe=$nprobe\n" +
          s"missing=${(expect -- got).take(5)}\nextra=${(got -- expect).take(5)}")
    }
  }

  test("bound-prune is lossless when the prefix genuinely truncates (dim > p)") {
    import spark.implicits._
    val rng = new scala.util.Random(97)
    // 64-dim CLUSTERED corpus (so τ is high and the prune actually bites):
    // 8 anchor directions + per-vector noise
    val dim = 64
    val anchors = Array.fill(8)(Array.fill(dim)(rng.nextGaussian()))
    val corpus = (0 until 400).map { i =>
      val a = anchors(i % 8)
      (i.toLong, Array.tabulate(dim)(d =>
        (a(d) + 0.3 * rng.nextGaussian()).toFloat))
    }
    val cents = (0 until 6).map(c =>
      (c.toLong, Array.fill(dim)(rng.nextGaussian()))).toSeq
    val queries = corpus.filter(_._1 % 5 == 0)
    def run(prune: Boolean) = Similarity.knnJoinIvf(
      corpus.toDF("vec_id", "embedding"), "vec_id", "embedding",
      queries.toDF("qid", "qv"), "qid", "qv", k = 3, cents, nprobe = 2,
      boundedPrune = prune, pruneSampleMod = 4, prunePrefixDims = 16,
      // force the size gate open: this tiny corpus is far below the
      // default threshold, and the A/B is vacuous if prune=true silently
      // takes the unpruned route
      pruneMinBytes = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val unpruned = run(prune = false)
    val pruned = run(prune = true)
    assert(pruned == unpruned,
      s"missing=${(unpruned -- pruned).take(5)}\n" +
        s"extra=${(pruned -- unpruned).take(5)}")
  }
}
