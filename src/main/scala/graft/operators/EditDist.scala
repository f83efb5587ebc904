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
    * edit distance `d` = 2, via the PassJoin pigeonhole filter: split
    * every string into d+1 = 3 contiguous segments; ed(a,b) ≤ d means at
    * most d segments are touched by edits, so at least ONE segment of `a`
    * appears EXACTLY in `b`, shifted by at most d (the prefix before it
    * absorbs ≤ d edits). The index side posts its 3 segments; the probe
    * side posts every substring that could match a segment of a string
    * with length within ±d (positions st±d, the exact st/sl recomputed
    * per candidate index length) — a constant ≤ 3·(2d+1)² postings per
    * row. The candidate join is an equi-join on (segment text, segment
    * number, index length); the O(len²) DP runs on survivors only.
    *
    * Chosen over the q-gram-prefix Ed-Join filter after measurement: on
    * a low-entropy corpus (small shared vocabulary) the 7-smallest-gram
    * filter passed 9.5M of 12.5M possible pairs at sf0.1, while exact
    * segment match passes ~2.5k — gram filters degrade with gram
    * entropy, pigeonhole segments don't.
    */
  def qEditJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = 2
    val base = Sources.documents(s, dir)
      .select($"doc_id", normPrefix($"text", 48).as("s"))
      .filter(length($"s") >= 9)
      .withColumn("ln", length($"s").cast("long"))
      // the parquet scan is a single partition at test SF — spread rows
      // before the posting fan-out so candidate generation parallelizes
      .repartition(col("doc_id"))
      .localCheckpoint(true) // feeds postings AND both verify sides
    val ks = array((0 until (d + 1)).map(k => lit(k.toLong)): _*)
    val idx = base
      .select($"doc_id".as("doc_i"), $"ln".as("ln_i"), $"s",
        explode(ks).as("k"))
      .withColumn("st", expr(s"1 + (k * ln_i) DIV ${d + 1}"))
      .withColumn("sl",
        expr(s"((k + 1) * ln_i) DIV ${d + 1} - (k * ln_i) DIV ${d + 1}"))
      .filter($"sl" >= 1)
      .select($"doc_i", $"ln_i", $"k", $"st",
        expr("substring(s, CAST(st AS INT), CAST(sl AS INT))").as("seg"))
    val probe = base
      .select($"doc_id".as("doc_p"), $"ln".as("ln_p"), $"s", explode(ks).as("k"))
      // L = the candidate INDEX string's length; st/sl recomputed exactly
      .withColumn("L", explode(sequence($"ln_p" - d, $"ln_p" + d)))
      .withColumn("st", expr(s"1 + (k * L) DIV ${d + 1}"))
      .withColumn("sl", expr(s"((k + 1) * L) DIV ${d + 1} - (k * L) DIV ${d + 1}"))
      .withColumn("off", explode(sequence(lit(-d.toLong), lit(d.toLong))))
      .withColumn("p", $"st" + $"off")
      .filter($"sl" >= 1 && $"p" >= 1 && $"p" + $"sl" - 1 <= $"ln_p")
      .select($"doc_p", $"ln_p", $"k", $"L".as("ln_i"),
        expr("substring(s, CAST(p AS INT), CAST(sl AS INT))").as("seg"))
      .distinct()
    val cand = idx.join(probe, Seq("k", "ln_i", "seg"))
      .filter($"doc_i" =!= $"doc_p")
      .select(least($"doc_i", $"doc_p").as("doc_id"),
        greatest($"doc_i", $"doc_p").as("doc_id_b"))
      .distinct()
    cand
      .join(base.select($"doc_id", $"s"), "doc_id")
      .join(base.select($"doc_id".as("doc_id_b"), $"s".as("s_b")), "doc_id_b")
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
    // brute force: the filter chain is lossless, so the output equals the
    // unfiltered length-gated Levenshtein join (cheap at oracle SF)
    "q_edit_join" ->
      s"""WITH base AS (
         |  SELECT doc_id, $Norm48 AS s FROM documents
         |  WHERE length($Norm48) >= 9)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(levenshtein(a.s, b.s) AS BIGINT) AS ed
         |FROM base a JOIN base b ON a.doc_id < b.doc_id
         |WHERE abs(length(a.s) - length(b.s)) <= 2
         |  AND levenshtein(a.s, b.s) <= 2
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
