package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** End-to-end invariant for the leakage-safe split composition: on a
  * random corpus with planted near-dup groups, run the REAL chain
  * (shingle-hash → MinHash-LSH pairs → connected components → cluster%10
  * split) and assert (1) no LSH-connected cluster spans a split boundary
  * and (2) every planted near-dup pair landed on one side — the property
  * the operator exists to guarantee.
  */
class SplitLeakageSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.configure(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")).getOrCreate()

  test("no near-dup cluster spans a split boundary (randomized corpus)") {
    import spark.implicits._
    val rng = new scala.util.Random(17)
    val words = Vector("alpha", "bravo", "charlie", "delta", "echo",
      "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima")
    def sentence(n: Int) =
      Seq.fill(n)(words(rng.nextInt(words.size))).mkString(" ")
    // 60 SHORT base docs (30 words ≪ 64 OPH buckets — the sparse-signature
    // case where global-min densification used to destabilize banding and
    // miss planted pairs); every third doc gets a near-copy (one word
    // appended) under a far-away id
    val base = (0L until 60L).map(i => (i, sentence(30)))
    val planted = base.filter(_._1 % 3 == 0).map { case (i, t) =>
      (1000L + i, t + " zulu")
    }
    val docs = (base ++ planted).toDF("doc_id", "text")
    graft.plans.ShingleHashes.register(spark, n = 3)
    val hashed = docs.select($"doc_id",
      graft.plans.ShingleHashes.shingleHashes($"text").as("sh"))
    val pairs = Dedup.minhashLshPairs(hashed, "doc_id", "sh",
      numHashes = 64, bands = 16, threshold = 0.5, preHashed = true)
    val labels = Dedup.dupClusters(pairs).withColumnRenamed("id", "doc_id")
    val assigned = docs.join(labels, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce($"label", $"doc_id"))
      .withColumn("split",
        when($"cluster" % 10 < 8, lit("train"))
          .when($"cluster" % 10 === 8, lit("valid"))
          .otherwise(lit("test")))
      .select($"doc_id", $"cluster", $"split")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getString(2))))
      .toMap
    assert(assigned.size == 80)
    // (1) cluster-coherence: one split per cluster
    val byCluster = assigned.values.groupBy(_._1).view
      .mapValues(_.map(_._2).toSet)
    byCluster.foreach { case (c, splits) =>
      assert(splits.size == 1, s"cluster $c spans splits $splits")
    }
    // (2) every planted pair is LSH-connected AND co-assigned
    base.map(_._1).filter(_ % 3 == 0).foreach { i =>
      assert(assigned(i)._1 == assigned(1000L + i)._1,
        s"planted pair ($i, ${1000 + i}) not in one cluster")
      assert(assigned(i)._2 == assigned(1000L + i)._2,
        s"planted pair ($i, ${1000 + i}) split apart")
    }
    // the split actually distributes (not everything in one bucket)
    assert(assigned.values.map(_._2).toSet.size == 3)
  }
}
