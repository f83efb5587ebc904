package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Empirical losslessness of the PassJoin pigeonhole filter: documents
  * built as ≤ d random edits of a base string MUST all be found by
  * qEditJoin (the filter may only prune true negatives). Seeded RNG —
  * deterministic across runs.
  */
class EditJoinPropertySpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.configure(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")).getOrCreate()

  test("every <=2-edit variant pair is found by the segment filter") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    val alpha = "abcdefghij0123456789 "
    def randChar() = alpha(rng.nextInt(alpha.length))
    def edit(s: String): String = rng.nextInt(3) match {
      case 0 => // substitute
        val i = rng.nextInt(s.length)
        s.substring(0, i) + randChar() + s.substring(i + 1)
      case 1 => // insert
        val i = rng.nextInt(s.length + 1)
        s.substring(0, i) + randChar() + s.substring(i)
      case _ => // delete
        val i = rng.nextInt(s.length)
        s.substring(0, i) + s.substring(i + 1)
    }
    // 30 base strings, each with a 1-edit and a 2-edit variant
    val docs = (0 until 30).flatMap { b =>
      val base = Seq.fill(60)(randChar()).mkString
        .replaceAll(" +", " ").trim
      val v1 = edit(base)
      val v2 = edit(edit(base))
      Seq((b * 10L, base), (b * 10L + 1, v1), (b * 10L + 2, v2))
    }
    val df = docs.toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("t"))
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length($"text").cast("long"))
    val dir = java.nio.file.Files.createTempDirectory("editprop").toString
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val found = graft.operators.EditDist.qEditJoin(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ground truth within each family: pairs whose normalized-prefix
    // Levenshtein <= 2 (the 2-edit variant may drift past 2 from base
    // after normalization — recompute truth rather than assume it)
    def norm(s: String) =
      s.toLowerCase.replaceAll("[^a-z0-9]+", " ").take(48)
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val t = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = t
        }
      }
      dp(a.length)
    }
    val expected = for {
      (a, ta) <- docs; (b, tb) <- docs
      if a < b && (a / 10) == (b / 10)
      na = norm(ta); nb = norm(tb)
      if na.length >= 9 && nb.length >= 9 && lev(na, nb) <= 2
    } yield (a, b)
    val missed = expected.toSet -- found
    assert(missed.isEmpty,
      s"pigeonhole filter missed true pairs: ${missed.take(5)} " +
        s"(of ${expected.size} expected)")
    assert(expected.nonEmpty, "test degenerated: no true pairs generated")
  }
}
