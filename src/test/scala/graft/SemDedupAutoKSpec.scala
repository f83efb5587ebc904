package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{DataOpsQueries, Dedup, Similarity}

/** Pins the corpus-adaptive quantizer sizing (round-11 verdict items
  * 1/5 — the fixed-K twin of the autoBanding oracle pin):
  *
  *  1. FLOORS — [[Similarity.autoK]] / [[Similarity.autoCoarseK]] must
  *     return the exact pinned K at both correctness scales (sf0.01
  *     n=500, sf0.1 n=2000), because the static DuckDB oracle SQL for
  *     q_semdedup / q_kmeans_train (k=4 chain), q_ann_ivf (vec_id<8)
  *     and q_knn_join_ivf (vec_id<32) encodes exactly those shapes;
  *  2. GROWTH — K tracks ⌈n/targetBucket⌉ (within-bucket pair work
  *     stays ≈ n·targetBucket, linear) resp. ⌊√n⌋, both integer-exact
  *     and capped at the argmaxCosine literal-centroid regime;
  *  3. ROUTE PARITY — qSemDedup on an oracle-scale corpus equals the
  *     pinned-K=4 pipeline spelled out independently (the floor makes
  *     them the same computation; this pins that it stays true).
  */
class SemDedupAutoKSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.configure(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")).getOrCreate()

  test("autoK floors to the pinned k=4 at oracle scales") {
    assert(Similarity.autoK(500L) === 4)   // sf0.01 embeddings
    assert(Similarity.autoK(2000L) === 4)  // sf0.1 embeddings
    assert(Similarity.autoK(2048L) === 4)  // floor boundary
    assert(Similarity.autoK(1L) === 4)
  }

  test("autoK tracks ceil(n/targetBucket) and caps") {
    assert(Similarity.autoK(2049L) === 5)
    assert(Similarity.autoK(6000L) === 12)
    assert(Similarity.autoK(20000L) === 40)   // sf1 replica corpus
    assert(Similarity.autoK(80000L) === 157)  // sf4 replica corpus
    assert(Similarity.autoK(10L * 1000 * 1000) === 1024) // capped
  }

  test("autoCoarseK floors at oracle scales and tracks isqrt(n)") {
    assert(Similarity.autoCoarseK(500L) === 32)   // q_knn_join_ivf oracle
    assert(Similarity.autoCoarseK(2000L) === 32)
    assert(Similarity.autoCoarseK(500L, kFloor = 8) === 8) // q_ann_ivf oracle
    assert(Similarity.autoCoarseK(2000L, kFloor = 8) === 8)
    assert(Similarity.autoCoarseK(20000L) === 141)
    assert(Similarity.autoCoarseK(80000L) === 282)
    assert(Similarity.autoCoarseK(4L * 1000 * 1000 * 1000) === 1024) // capped
    // isqrt exactness at the boundaries float sqrt could smear
    assert(Similarity.isqrt(0L) === 0L)
    assert(Similarity.isqrt(1L) === 1L)
    assert(Similarity.isqrt(80000L) === 282L)      // 282^2=79524, 283^2=80089
    assert(Similarity.isqrt(282L * 282L) === 282L)
    assert(Similarity.isqrt(282L * 282L - 1L) === 281L)
    assert(Similarity.isqrt((1L << 31) * (1L << 31) - 1L) === (1L << 31) - 1L)
  }

  test("dupClustersBucketed == dupClusters on seeded bucket-local edges") {
    import spark.implicits._
    // chains, cliques, singleton-pair and cross-component shapes, all
    // bucket-local (the variant's precondition), ids deliberately NOT
    // contiguous and labels spanning buckets' id ranges
    val rng = new scala.util.Random(7)
    val edges = (0 until 40).flatMap { b =>
      // each id belongs to exactly one bucket (the semdedup invariant:
      // a vector is assigned to one k-means bucket), ids non-contiguous
      val ids = (0 until 30).map(_ =>
        b.toLong * 1000000 + rng.nextInt(100000)).distinct
      val chain = ids.sliding(2).filter(_.size == 2)
        .map(p => (b.toLong, p(0), p(1))).toSeq.take(10)
      val clique = for {
        i <- ids.indices.take(6); j <- ids.indices.take(6) if i < j
      } yield (b.toLong, ids(i), ids(j))
      val loose = ids.takeRight(4).sliding(2).filter(_.size == 2)
        .map(p => (b.toLong, p(1), p(0))).toSeq // reversed order too
      chain ++ clique ++ loose
    }
    val pairs = edges.toDF("bucket", "doc_a", "doc_b")
    val expect = graft.operators.Dedup.dupClusters(pairs.drop("bucket"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = graft.operators.Dedup.dupClustersBucketed(pairs, "bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expect)
  }

  test("qSemDedup == pinned-K=4 pipeline at oracle scale (route parity)") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val adaptive = DataOpsQueries.qSemDedup(spark, dir).collect().toSeq
    // the same pipeline with K spelled as a literal 4 — what the DuckDB
    // oracle's k-means CTE chain encodes
    val emb = graft.sources.Sources.embeddings(spark, dir)
    val cents = Similarity.trainIvfCentroids(emb, "vec_id", "embedding",
      k = 4, iters = 2)
    val assigned = emb.withColumn("bucket",
      Similarity.argmaxCosine($"embedding", cents))
    val pairs = Dedup.embeddingPairs(assigned, "vec_id", "embedding",
      "bucket", 0.35)
      .select($"vec_a".as("doc_a"), $"vec_b".as("doc_b"))
    val dropped = Dedup.dupClusters(pairs)
      .filter($"id" =!= $"label").select($"id".as("vec_id"))
      .withColumn("_drop", lit(1L))
    val pinned = assigned.join(dropped, Seq("vec_id"), "left")
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_vecs"),
        sum(when($"_drop".isNull, 1L).otherwise(0L)).as("n_kept"))
      .orderBy($"bucket")
      .collect().toSeq
    assert(adaptive.nonEmpty)
    assert(adaptive === pinned)
  }
}
