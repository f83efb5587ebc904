package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Pins the round-15 containment arm-selection gate and the adaptive
  * LSH banding:
  *
  *  1. ORACLE PIN — [[Dedup.autoContainmentBanding]] floors to the
  *     committed (64, 32×2) shape below 2²⁰ distinct sets, covering both
  *     correctness scales (2 k / 20 k docs) and the whole 10–40× chain
  *     (≤ 800 k distinct sets), so the r14 hashes and curve rows are
  *     byte-stable under the adaptive rule; the octave steps land where
  *     documented (r = 3 at 2²⁰, r = 4 at 2²⁷).
  *  2. The [[Dedup.containmentPairs]] front door routes small corpora to
  *     the exact arm (doc floor) — result-identical to
  *     [[Dedup.containmentPairsExact]].
  *  3. The auto-banded LSH arm resolves the pinned shape at small reps:
  *     defaults == explicit (64, 32) pair-for-pair.
  *  4. LSH-arm recall on a planted high-J corpus is exact: every pair
  *     the exact arm emits (within-clique, sub→sup at J ≥ 0.8) survives
  *     the band-bucket candidate stage and the directed verify.
  */
class ContainmentArmSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.configure(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")).getOrCreate()

  test("autoContainmentBanding floors to the pinned (64,32) " +
      "through the measured chain") {
    assert(Dedup.autoContainmentBanding(1L) === (64, 32))
    assert(Dedup.autoContainmentBanding(2000L) === (64, 32))    // sf0.01
    assert(Dedup.autoContainmentBanding(20000L) === (64, 32))   // sf0.1
    assert(Dedup.autoContainmentBanding(800000L) === (64, 32))  // sf4f
    assert(Dedup.autoContainmentBanding((1L << 20) - 1) === (64, 32))
    // octave steps: r = 3 (96 hashes) from 2^20, r = 4 (128) from 2^27
    assert(Dedup.autoContainmentBanding(1L << 20) === (96, 32))
    assert(Dedup.autoContainmentBanding(1600000L) === (96, 32)) // sf8f
    assert(Dedup.autoContainmentBanding((1L << 27) - 1) === (96, 32))
    assert(Dedup.autoContainmentBanding(1L << 27) === (128, 32))
    // every shape keeps bands dividing hashes (minhashBandKeys contract)
    for (n <- Seq(1L, 1L << 20, 1L << 27, 1L << 40)) {
      val (h, b) = Dedup.autoContainmentBanding(n)
      assert(h % b === 0)
    }
  }

  // planted corpus: two exact-dup cliques, a contained pair at J = 0.8
  // (inside the R = 2 horizon, far above the 0.36 floor), a disjoint
  // doc, and empty docs — the IntersectCountSpec corpus with the
  // contained pair's Jaccard raised so the LSH arm's S-curve sits at
  // recall ≈ 1 − 4·10⁻¹⁵ (deterministic for fixed data: OPH is
  // xxhash64-keyed, not seeded randomness)
  private def plantedDocs = {
    import spark.implicits._
    val setA = (1L to 20L).toList
    val setB = (1L to 25L).toList   // A ⊂ B, C(A,B) = 1.0, J = 0.8
    val setC = (100L to 120L).toList
    Seq(
      (1L, setA), (2L, setA), (3L, setA),
      (10L, setB), (11L, setB),
      (20L, setC),
      (30L, List.empty[Long]), (31L, List.empty[Long]))
      .toDF("doc_id", "sh")
  }

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
    import spark.implicits._
    df.select($"doc_sub", $"doc_sup").as[(Long, Long)].collect().toSet
  }

  test("front door routes small corpora to the exact arm " +
      "(== containmentPairsExact)") {
    val auto = pairsOf(Dedup.containmentPairs(plantedDocs, "doc_id", "sh",
      num = 4, den = 5, preHashed = true))
    val exact = pairsOf(Dedup.containmentPairsExact(plantedDocs, "doc_id",
      "sh", num = 4, den = 5, preHashed = true))
    assert(auto === exact)
    assert(auto.nonEmpty)
  }

  test("LSH auto sentinel resolves the pinned shape at small reps") {
    val autoShape = pairsOf(Dedup.containmentPairsLsh(plantedDocs, "doc_id",
      "sh", num = 4, den = 5, preHashed = true))
    val pinned = pairsOf(Dedup.containmentPairsLsh(plantedDocs, "doc_id",
      "sh", num = 4, den = 5, preHashed = true, numHashes = 64, bands = 32))
    assert(autoShape === pinned)
  }

  test("LSH arm recall 1.0 on the planted high-J corpus") {
    val exact = pairsOf(Dedup.containmentPairsExact(plantedDocs, "doc_id",
      "sh", num = 4, den = 5, preHashed = true))
    val lsh = pairsOf(Dedup.containmentPairsLsh(plantedDocs, "doc_id",
      "sh", num = 4, den = 5, preHashed = true))
    assert(exact === lsh)
  }

  test("pinned-together banding contract rejects half-pinned shapes") {
    intercept[IllegalArgumentException] {
      Dedup.containmentPairsLsh(plantedDocs, "doc_id", "sh",
        num = 4, den = 5, preHashed = true, numHashes = 64, bands = 0)
    }
    intercept[IllegalArgumentException] {
      Dedup.containmentPairsLsh(plantedDocs, "doc_id", "sh",
        num = 4, den = 5, preHashed = true, numHashes = 63, bands = 32)
    }
  }
}
