package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._
import graft.sources.Sources

/** Edit-distance (Levenshtein) near-dup join and repeated-substring
  * duplication mass — the fuzzy-matching / templated-boilerplate end of
  * the dedup family.
  *
  * Scale shapes:
  *  - edit join: Ed-Join-style q-gram count filtering. One edit operation
  *    destroys at most q distinct q-gram types, so ed(a,b) ≤ d implies
  *    |G_a ∩ G_b| ≥ max(|G_a|,|G_b|) − d·q; by the prefix-filter theorem
  *    the FIRST d·q+1 gram hashes (global hash order) of each side must
  *    intersect. Each string therefore posts a CONSTANT d·q+1 postings —
  *    the candidate join is a posting equi-join, never a string×string
  *    product, and the O(len²) Levenshtein DP runs only on survivors.
  *  - substring dedup: the Lee-et-al repeated-substring signal. Char
  *    k-gram profiles are computed in ONE native pass per doc
  *    (WinnowHashes w=1 — no interpreted lambda inlining), duplicated
  *    gram types found by one hash aggregate on the gram, and the
  *    per-doc duplicated fraction by one join back — all shuffles keyed
  *    on single gram hashes (skew-safe under AQE).
  */
object EditDist {

  /** Normalized fixed-width join key: first `width` chars of the
    * lower/strip/collapse normalization (pure [a-z0-9 ] — SQL char
    * positions equal Java char positions).
    */
  private def normPrefix(text: Column, width: Int): Column =
    substring(regexp_replace(lower(text), "[^a-z0-9]+", " "), 1, width)

  /** Pairs of documents whose 48-char normalized prefixes are within
    * edit distance `d` = 2, via the lossless constant-prefix filter
    * (q = 3, posting d·q+1 = 7 smallest gram hashes per string).
    *
    * Contract: keys need at least d·q+1 = 7 grams (≥ 9 chars) — below
    * that the count bound `overlap ≥ max(|G_a|,|G_b|) − d·q` is vacuous
    * and no gram filter can prune. Degenerate short keys belong in a
    * tiny exact bucket at ingest, not in the filtered join.
    */
  def qEditJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = 2
    val q = 3
    graft.plans.WinnowHashes.register(s, k = q, w = 1, name = "char_gram_hashes")
    val base = Sources.documents(s, dir)
      .select($"doc_id", normPrefix($"text", 48).as("s"))
      .filter(length($"s") >= d * q + q) // ≥ 7 grams: filter is lossless
      .withColumn("grams", array_sort(call_function("char_gram_hashes", $"s")))
      .localCheckpoint(true) // feeds postings AND both verify sides
    val posts = base.select($"doc_id", $"s",
      explode(slice($"grams", 1, d * q + 1)).as("h"))
    val rhs = posts.toDF("doc_id_b", "s_b", "h")
    posts.join(rhs, "h")
      .filter($"doc_id" < $"doc_id_b")
      .select($"doc_id", $"doc_id_b", $"s", $"s_b")
      .distinct()
      .filter(abs(length($"s") - length($"s_b")) <= d)
      .withColumn("ed", levenshtein($"s", $"s_b").cast("long"))
      .filter($"ed" <= d)
      .select($"doc_id".as("doc_a"), $"doc_id_b".as("doc_b"), $"ed")
      .orderBy($"doc_a", $"doc_b")
  }

  /** Per-doc repeated-substring mass: the fraction (ppm, floored) of a
    * document's distinct char 20-grams that also occur in at least one
    * OTHER document — high values flag boilerplate/templated spans that
    * exact and whole-doc near-dup both miss.
    */
  def qSubstringDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.plans.WinnowHashes.register(s, k = 20, w = 1, name = "char20_hashes")
    val grams = Sources.documents(s, dir)
      .select($"doc_id", explode(call_function("char20_hashes", $"text")).as("h"))
      .localCheckpoint(true) // distinct per doc by construction
    val shared = grams.groupBy($"h").agg(count(lit(1)).as("df"))
      .filter($"df" >= 2).select($"h")
    val dup = grams.join(shared, "h")
      .groupBy($"doc_id").agg(count(lit(1)).as("n_dup_grams"))
    grams.groupBy($"doc_id").agg(count(lit(1)).as("n_grams"))
      .join(dup, Seq("doc_id"), "left")
      .select($"doc_id", $"n_grams",
        coalesce($"n_dup_grams", lit(0L)).as("n_dup_grams"))
      .withColumn("dup_ppm", expr("(n_dup_grams * 1000000L) div n_grams"))
      .orderBy($"doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_edit_join" -> qEditJoin,
    "q_substring_dedup" -> qSubstringDedup)

  /** DuckDB twin of [[graft.functions.portableHash64]]. */
  private def md(e: String) = s"CAST('0x'||substr(md5($e),1,15) AS BIGINT)"

  /** Distinct char k-gram hashes per doc of expression `src` (already
    * normalized text) as CTEs ending in `grams(doc_id, h)`.
    */
  private def gramChain(src: String, k: Int, where: String = "TRUE"): String =
    s"""base AS (
       |  SELECT doc_id, $src AS s FROM documents WHERE $where),
       |gi AS (
       |  SELECT doc_id, s,
       |    unnest(range(1, CAST(greatest(length(s) - ${k - 1} + 1, 1) AS BIGINT)))
       |      AS i
       |  FROM base),
       |grams AS (
       |  SELECT DISTINCT doc_id, ${md(s"substr(s, CAST(i AS INT), $k)")} AS h
       |  FROM gi)""".stripMargin

  private val Norm48 =
    "substr(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), 1, 48)"

  val oracles: Map[String, String] = Map(
    "q_edit_join" ->
      s"""WITH ${gramChain(Norm48, 3, s"length($Norm48) >= 9")},
         |pre AS (
         |  SELECT doc_id, h, ROW_NUMBER() OVER (
         |    PARTITION BY doc_id ORDER BY h) AS r
         |  FROM grams),
         |posts AS (
         |  SELECT p.doc_id, b.s, p.h FROM pre p JOIN base b USING (doc_id)
         |  WHERE p.r <= 7),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    a.s AS s_a, b.s AS s_b
         |  FROM posts a JOIN posts b ON a.h = b.h AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, CAST(levenshtein(s_a, s_b) AS BIGINT) AS ed
         |FROM cand
         |WHERE abs(length(s_a) - length(s_b)) <= 2
         |  AND levenshtein(s_a, s_b) <= 2
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q_substring_dedup" ->
      s"""WITH ${gramChain("regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')", 20)},
         |shared AS (SELECT h FROM grams GROUP BY h HAVING COUNT(*) >= 2),
         |dup AS (
         |  SELECT g.doc_id, COUNT(*) AS n_dup_grams
         |  FROM grams g JOIN shared USING (h) GROUP BY g.doc_id),
         |tot AS (SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY doc_id)
         |SELECT t.doc_id, t.n_grams,
         |  COALESCE(d.n_dup_grams, 0) AS n_dup_grams,
         |  (COALESCE(d.n_dup_grams, 0) * 1000000) // t.n_grams AS dup_ppm
         |FROM tot t LEFT JOIN dup d ON t.doc_id = d.doc_id
         |ORDER BY t.doc_id""".stripMargin)
}
