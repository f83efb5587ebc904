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

  /** The collapseKeys SYMMETRY contract, enforced as a spec instead of
    * scaladoc-only (r13 advice): rep-level pruning under the collapse
    * evaluates the predicate at REP ids in rep (a < b) orientation while
    * the legacy path evaluates member pairs in member orientation — for
    * an ASYMMETRIC predicate the two can disagree across groups and the
    * collapse silently drops qualifying member pairs. This test pins
    * BOTH halves: a symmetric predicate makes the arms agree exactly,
    * and the documented asymmetric failure really happens (if a future
    * change makes asymmetric predicates safe, the second half fails and
    * the contract text should be retired with it).
    */
  test("collapseKeys requires a symmetric predicate (contract pinned)") {
    import spark.implicits._
    // two exact-dup groups with nearly-identical sets across groups:
    //   G_odd  = ids {3, 5}, set {a,b,c,d}   (both keys id%2 = 1)
    //   G_even = ids {2, 8}, set {a,b,c,e}   (both keys id%2 = 0)
    // cross-group J = 3/5 = 0.6 >= 0.5; within-group J = 1.0.
    val docs = Seq(
      (3L, Seq("a", "b", "c", "d")), (5L, Seq("a", "b", "c", "d")),
      (2L, Seq("a", "b", "c", "e")), (8L, Seq("a", "b", "c", "e")))
      .toDF("doc_id", "sh")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_a", $"doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    // SYMMETRIC predicate (the ingest parity gate): arms agree exactly
    val sym = col("doc_id") % 2 =!= col("doc_id_b") % 2
    val symLegacy = key(Dedup.jaccardPairs(docs, "doc_id", "sh", Seq.empty,
      0.5, pairPredicate = Some(sym),
      collapseKeys = Seq(col("doc_id") % 2), collapseExactDups = false))
    val symCollapse = key(Dedup.jaccardPairs(docs, "doc_id", "sh", Seq.empty,
      0.5, pairPredicate = Some(sym),
      collapseKeys = Seq(col("doc_id") % 2), collapseExactDups = true))
    assert(symCollapse == symLegacy)
    assert(symLegacy == Set((2L, 3L), (2L, 5L), (3L, 8L), (5L, 8L)))
    // ASYMMETRIC predicate (key_a odd AND key_b even): function of the
    // collapse keys, so group-homogeneous — but rep orientation
    // (rep_even=2 < rep_odd=3) evaluates p(2,3) = false and prunes the
    // rep pair, losing member pairs (3,8) and (5,8) that the legacy
    // member orientation keeps. The documented failure, pinned:
    val asym = col("doc_id") % 2 === 1 && col("doc_id_b") % 2 === 0
    val asymLegacy = key(Dedup.jaccardPairs(docs, "doc_id", "sh", Seq.empty,
      0.5, pairPredicate = Some(asym),
      collapseKeys = Seq(col("doc_id") % 2), collapseExactDups = false))
    val asymCollapse = key(Dedup.jaccardPairs(docs, "doc_id", "sh", Seq.empty,
      0.5, pairPredicate = Some(asym),
      collapseKeys = Seq(col("doc_id") % 2), collapseExactDups = true))
    assert(asymLegacy == Set((3L, 8L), (5L, 8L)))
    assert(asymCollapse != asymLegacy,
      "asymmetric predicate now agrees under collapse — retire the " +
        "symmetry contract if this is intentional")
  }
}
