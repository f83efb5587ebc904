package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** The blocking-pushdown contract: jaccardPairs with a pairPredicate must
  * produce EXACTLY the rows of the unconstrained join filtered after the
  * fact — blocking prunes candidate generation, never changes semantics.
  */
class PairPredicateSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.configure(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")).getOrCreate()

  test("pairPredicate blocking equals post-filtering (randomized corpus)") {
    import spark.implicits._
    val rng = new scala.util.Random(29)
    val words = Vector("alpha", "bravo", "charlie", "delta", "echo",
      "foxtrot", "golf", "hotel", "india", "juliet")
    def sentence(n: Int) =
      Seq.fill(n)(words(rng.nextInt(words.size))).mkString(" ")
    val base = (0L until 40L).map(i => (i, sentence(120)))
    val dups = base.filter(_._1 % 4 == 0).map { case (i, t) =>
      (100L + i, t + " zulu")
    }
    val docs = (base ++ dups).toDF("doc_id", "text")
    graft.plans.ShingleHashes.register(spark, n = 3)
    val hashed = docs.select($"doc_id",
      graft.plans.ShingleHashes.shingleHashes($"text").as("sh"))
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_a", $"doc_b", $"jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val blocked = key(Dedup.jaccardPairs(hashed, "doc_id", "sh", Seq.empty,
      0.5, preHashed = true,
      pairPredicate = Some(col("doc_id") % 2 =!= col("doc_id_b") % 2)))
    val filtered = key(Dedup.jaccardPairs(hashed, "doc_id", "sh", Seq.empty,
      0.5, preHashed = true)
      .filter($"doc_a" % 2 =!= $"doc_b" % 2))
    assert(blocked == filtered)
    // the planted (i, 100+i) pairs for even i flip parity exactly when i
    // is even and 100+i is odd — never: both even. So planted pairs are
    // SAME-side and must all be blocked; cross-side pairs (if any) remain.
    assert(blocked.forall { case (a, b, _) => (a % 2) != (b % 2) })
    // sanity: the unconstrained join does find the planted pairs
    val all = key(Dedup.jaccardPairs(hashed, "doc_id", "sh", Seq.empty,
      0.5, preHashed = true))
    base.map(_._1).filter(_ % 4 == 0).foreach { i =>
      assert(all.exists { case (a, b, _) => a == i && b == 100L + i },
        s"planted pair ($i, ${100 + i}) missing from unconstrained join")
    }
  }
}
