package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Pins the corpus-adaptive LSH banding (round-10 verdict item 1):
  *
  *  1. the ORACLE PIN — [[Dedup.autoBanding]] must floor to the
  *     historical (bands=8, rows=8) at both correctness scales (sf0.01
  *     n=500, sf0.1 n=2000), because the static DuckDB oracle SQL for
  *     q_dedup_embedding{,_lsh} encodes exactly that shape;
  *  2. the LADDER — rows tracks ⌈log₂(n/occ)⌉ (occupancy stays bounded,
  *     so the coincidental-collision candidate term stays ≈ n·occ·bands,
  *     linear in corpus) and every rung's plane budget fits the bank;
  *  3. RECALL — on a seeded planted-pair corpus big enough to move the
  *     ladder off the floor (n = 6000 → rows = 9), the adaptive shape
  *     recovers at least as many planted near-dup pairs as the fixed
  *     (8, 8) shape. Deterministic end to end (seeded corpus, pinned
  *     hyperplane bank), so this is an exact regression pin, not a
  *     statistical assertion.
  */
class EmbeddingLshAutoSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.configure(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")).getOrCreate()

  test("autoBanding floors to the pinned (8,8) at oracle scales") {
    assert(Dedup.autoBanding(500L) === (8, 8))   // sf0.01 embeddings
    assert(Dedup.autoBanding(2000L) === (8, 8))  // sf0.1 embeddings
    assert(Dedup.autoBanding(4096L) === (8, 8))  // floor boundary
    assert(Dedup.autoBanding(1L) === (8, 8))
  }

  test("rows ladder tracks ceil(log2(n/occ)) and caps within the bank") {
    assert(Dedup.autoBanding(4097L)._2 === 9)
    assert(Dedup.autoBanding(20000L) === (16, 11))  // sf1 replica corpus
    assert(Dedup.autoBanding(80000L) === (23, 13))  // sf4 replica corpus
    assert(Dedup.autoBanding(100L * 1000 * 1000) === (92, 20)) // capped
    // every rung: recall-holding bands entry exists and planes fit
    (8 to 20).foreach { r =>
      val b = Dedup.bandsForRows(r)
      assert(b * r <= Dedup.hyperplanes.length,
        s"rows=$r bands=$b exceeds the hyperplane bank")
    }
  }

  test("bandsForRows literals = dual-design-point formula (0.95 AND 0.85)") {
    // independent re-derivation of the pinned table (round-12 ADVICE
    // item: the r11 single-point table only held recall >= baseline AT
    // c*=0.95; anchoring at both ends of the near-dup regime plus the
    // single-crossing property of this S-curve family gives pointwise
    // >= on all of cos in [0.85, 1])
    def p(c: Double) = 1.0 - math.acos(c) / math.Pi
    def bandsAt(c: Double, r: Int): Int = {
      val r8 = 1.0 - math.pow(1.0 - math.pow(p(c), 8), 8)
      math.ceil(math.log(1.0 - r8) / math.log(1.0 - math.pow(p(c), r))).toInt
    }
    assert(Dedup.bandsForRows(8) === 8)
    (9 to 20).foreach { r =>
      val want = math.max(bandsAt(0.95, r), bandsAt(0.85, r))
      assert(Dedup.bandsForRows(r) === want, s"rows=$r")
    }
    // and the theoretical pointwise dominance on a cosine grid — the
    // property the table is FOR, checked against the closed form
    def recall(c: Double, b: Int, r: Int) =
      1.0 - math.pow(1.0 - math.pow(p(c), r), b)
    (9 to 20).foreach { r =>
      val b = Dedup.bandsForRows(r)
      (850 to 999).foreach { m =>
        val c = m / 1000.0
        assert(recall(c, b, r) >= recall(c, 8, 8) - 1e-12,
          s"rows=$r bands=$b loses recall at cos=$c")
      }
    }
  }

  test("extended hyperplane bank is prefix-identical to the 64-plane bank") {
    // regenerate the historical bank with the same seed and compare the
    // prefix — the committed oracle SQL literals depend on it
    val rng = new scala.util.Random(42)
    val old = Array.fill(64)(Array.fill(64)(if (rng.nextBoolean()) 1.0 else -1.0))
    (0 until 64).foreach { i =>
      assert(Dedup.hyperplanes(i).sameElements(old(i)), s"plane $i drifted")
    }
  }

  test("adaptive recall >= fixed-(8,8) recall on planted pairs (n=6000)") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val dim = 64
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    def randVec(): Array[Float] = unit(Array.fill(dim)(rng.nextGaussian().toFloat))
    // 1200 base vectors x 5 family members: base + noise at a mix of
    // noise scales so family cosines land ~0.88-0.99 (the regime where
    // the S-curve actually discriminates, not saturated at 1.0)
    val fam = 5
    val rowsData = (0 until 1200).flatMap { b =>
      val base = randVec()
      (0 until fam).map { j =>
        // |noise·e| ≈ noise·√dim against a unit base: cos ≈
        // 1/√(1+noise²·dim) → 0.02..0.05 lands family cosines ~0.89-0.99,
        // the NEAR-DUP regime the recall-holding table is designed for
        // (above the (8,8)-vs-adaptive S-curve crossing at cos ≈ 0.85,
        // the adaptive shape dominates at every cosine — see the
        // bandsForRows scaladoc)
        val noise = 0.02f + 0.03f * j / fam
        val v =
          if (j == 0) base
          else unit(base.zip(Array.fill(dim)(rng.nextGaussian().toFloat))
            .map { case (x, e) => x + noise * e })
        (b.toLong * fam + j, b, v)
      }
    }
    val df = rowsData.toDF("vec_id", "family", "vec")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = df.count()
    val (ab, ar) = Dedup.autoBanding(n)
    assert(ar > 8, s"corpus n=$n must move the ladder off the floor")
    // planted truth: same-family pairs at cos >= threshold (0.85 = the
    // regime boundary above which adaptive recall >= fixed recall holds
    // pointwise on the theoretical S-curves, so the empirical assertion
    // is pinning the implementation, not luck)
    val thr = 0.85
    graft.plans.VecCosine.register(spark)
    val fams = df.select($"vec_id", $"family", $"vec")
    val planted = fams.as("a").join(fams.as("b"),
        $"a.family" === $"b.family" && $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("vec_a"), $"b.vec_id".as("vec_b"),
        graft.plans.VecCosine.cosine($"a.vec", $"b.vec").as("cos"))
      .filter($"cos" >= thr)
      .select("vec_a", "vec_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(planted.size > 2000, s"planted truth too small: ${planted.size}")
    def recovered(pairs: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      pairs.select("vec_a", "vec_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val fixed = recovered(
      Dedup.embeddingLshPairs(df, "vec_id", "vec", 8, 8, thr))
    val auto = recovered(
      Dedup.embeddingLshPairsAuto(df, "vec_id", "vec", thr))
    df.unpersist()
    val fixedRecall = (planted & fixed).size.toDouble / planted.size
    val autoRecall = (planted & auto).size.toDouble / planted.size
    info(f"planted=${planted.size} fixedRecall=$fixedRecall%.4f " +
      f"autoRecall=$autoRecall%.4f shape=($ab,$ar)")
    assert(autoRecall >= fixedRecall,
      f"adaptive recall $autoRecall%.4f < fixed recall $fixedRecall%.4f")
  }

  test("adaptive recall >= fixed-(8,8) on a DEEP rung (n=20000, rows=11)") {
    // the r11 spec only exercised rows=9 — the one rung where the old
    // single-design-point table happened to hold mid-cosine recall; this
    // pins the dual-point table at the sf1-replica rung (rows=11,
    // bands=16), with family cosines spread across 0.85-0.97 — exactly
    // the regime the old bands=12 entry lost (0.778 vs 0.850 at 0.85)
    import spark.implicits._
    val rng = new scala.util.Random(13)
    val dim = 64
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    val fam = 5
    val rowsData = (0 until 4000).flatMap { b =>
      val base = unit(Array.fill(dim)(rng.nextGaussian().toFloat))
      (0 until fam).map { j =>
        // noise 0.03..0.075 -> member-vs-base cos ~ 1/sqrt(1+noise^2*64)
        // ~ 0.97..0.86, so planted pairs populate the whole contract
        // regime instead of saturating near 1.0
        val noise = 0.03f + 0.045f * j / fam
        val v =
          if (j == 0) base
          else unit(base.zip(Array.fill(dim)(rng.nextGaussian().toFloat))
            .map { case (x, e) => x + noise * e })
        (b.toLong * fam + j, b, v)
      }
    }
    val df = rowsData.toDF("vec_id", "family", "vec")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = df.count()
    val (ab, ar) = Dedup.autoBanding(n)
    assert(ar >= 11, s"corpus n=$n must reach the deep rung (rows>=11)")
    val thr = 0.85
    graft.plans.VecCosine.register(spark)
    val fams = df.select($"vec_id", $"family", $"vec")
    val planted = fams.as("a").join(fams.as("b"),
        $"a.family" === $"b.family" && $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("vec_a"), $"b.vec_id".as("vec_b"),
        graft.plans.VecCosine.cosine($"a.vec", $"b.vec").as("cos"))
      .filter($"cos" >= thr)
      .select("vec_a", "vec_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(planted.size > 5000, s"planted truth too small: ${planted.size}")
    def recovered(pairs: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      pairs.select("vec_a", "vec_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val fixed = recovered(
      Dedup.embeddingLshPairs(df, "vec_id", "vec", 8, 8, thr))
    val auto = recovered(
      Dedup.embeddingLshPairsAuto(df, "vec_id", "vec", thr))
    df.unpersist()
    val fixedRecall = (planted & fixed).size.toDouble / planted.size
    val autoRecall = (planted & auto).size.toDouble / planted.size
    info(f"planted=${planted.size} fixedRecall=$fixedRecall%.4f " +
      f"autoRecall=$autoRecall%.4f shape=($ab,$ar)")
    assert(autoRecall >= fixedRecall,
      f"deep-rung adaptive recall $autoRecall%.4f < fixed $fixedRecall%.4f")
  }

  test("session sign_proj_keys stays pinned 8x8 after an adaptive run") {
    // ADVICE item: embeddingLshPairs registers the adaptive shape as the
    // session-global SQL function while it runs; it must restore the
    // pinned 64-plane/rows=8 shape (8 band keys) on exit, or later SQL
    // callers silently get drifted bucket keys
    import spark.implicits._
    val df = (0 until 64).map(i =>
      (i.toLong, Array.tabulate(64)(d => ((i * 31 + d) % 7 - 3).toFloat)))
      .toDF("vec_id", "vec")
    graft.plans.SignProjKeys.register(spark, Dedup.hyperplanes.take(64), 8)
    val before = spark.sql(
      "SELECT sign_proj_keys(array_repeat(cast(1.0 as float), 64)) AS k")
      .head.getSeq[Any](0)
    // adaptive shape (10 bands x 9 rows != pinned) registered + restored
    Dedup.embeddingLshPairs(df, "vec_id", "vec", bands = 10, rows = 9,
      threshold = 0.99).count()
    val after = spark.sql(
      "SELECT sign_proj_keys(array_repeat(cast(1.0 as float), 64)) AS k")
      .head.getSeq[Any](0)
    assert(after.size === 8, s"expected 8 pinned band keys, got ${after.size}")
    assert(after === before, "sign_proj_keys drifted after adaptive run")
  }
}
