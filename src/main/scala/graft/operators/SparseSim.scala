package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Sources

/** Sparse TF-IDF cosine similarity self-join over the inverted index —
  * the classic near-dup / related-document shape for text corpora where
  * embeddings aren't available. Entirely integer/decimal-exact so the
  * DuckDB oracle hash-matches:
  *
  *  - term weight w = tf · idfInt with idfInt = floor(100·N / df) — a
  *    log-free rational idf (same monotone ordering as ln(N/df) for
  *    ranking purposes, and exactly reproducible in both engines),
  *  - dot products and squared norms are DECIMAL(38,0) sums of bigint
  *    products (never IEEE),
  *  - the cosine gate `dot/√(na·nb) >= t` is evaluated as
  *    `dot² · t_den² >= na · nb · t_num²` — no sqrt in the gate.
  *
  * Scale shape: ONE corpus scan builds (doc, term, tf); df is a grouped
  * aggregate broadcast back; candidate pairs come from a posting
  * self-join on the term (docs sharing a term), never a doc×doc product.
  * Stop-terms (df > maxDf) are dropped BEFORE the self-join — exactly the
  * quadratic-blowup guard winnowing/AllPairs use: a term in half the
  * corpus contributes O(n²) candidate rows and ~zero idf weight. Shuffle
  * keys are single term strings (bounded skew after the df cap, AQE
  * handles the rest).
  */
object SparseSim {

  /** Near-dup pairs with TF-IDF cosine >= 4/5 (t² = 16/25), stop-term
    * cap df <= 100.
    */
  def qTfidfCosine(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.plans.CosineGate.register(s, tNum = 4, tDen = 5)
    // tf feeds df, the doc count AND the weight join; w feeds norms and
    // both dot sides — materialize each once or the optimizer re-embeds
    // the whole upstream chain per consumer (7 copies of the tf aggregate
    // in the unchecked plan)
    val tf = Sources.documents(s, dir)
      .select($"doc_id", explode(
        filter(split(lower($"text"), "[^a-z]+"), t => t =!= "")).as("term"))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(tf.select(countDistinct($"doc_id").as("n_docs"))))
      .filter($"df" <= 100)
      .select($"term", floor(lit(100) * $"n_docs" / $"df").as("idf"))
    val w = tf.join(df, "term")
      .select($"doc_id", $"term", ($"tf" * $"idf").as("w"))
      .localCheckpoint(true)
    val norms = w.groupBy($"doc_id")
      .agg(sum(($"w" * $"w").cast("decimal(38,0)")).as("n2"))
    val b = w.select($"term", $"doc_id".as("doc_b"), $"w".as("w_b"))
    val dots = w.join(b, "term")
      .filter($"doc_id" < $"doc_b")
      .groupBy($"doc_id".as("doc_a"), $"doc_b")
      .agg(sum(($"w" * $"w_b").cast("decimal(38,0)")).as("dot"))
    dots
      .join(norms.select($"doc_id".as("doc_a"), $"n2".as("na")), "doc_a")
      .join(norms.select($"doc_id".as("doc_b"), $"n2".as("nb")), "doc_b")
      // arbitrary-precision gate: the DECIMAL(38,0) product form
      // (dot*dot*25 >= na*nb*16) silently NULLs — and drops the pair —
      // once dot² leaves 38-digit precision on big corpora
      .filter($"dot" > 0 &&
        graft.plans.CosineGate.gate(4, 5, $"dot", $"na", $"nb"))
      .select($"doc_a", $"doc_b", $"dot".cast("long").as("dot"))
      .orderBy($"doc_a", $"doc_b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tfidf_cosine" -> qTfidfCosine)

  val oracles: Map[String, String] = Map(
    "q_tfidf_cosine" ->
      """WITH tf AS (
        |  SELECT doc_id, t.term, COUNT(*) AS tf
        |  FROM documents,
        |    UNNEST(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
        |                       x -> x <> '')) AS t(term)
        |  GROUP BY doc_id, t.term),
        |n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tf),
        |idf AS (
        |  SELECT term, CAST(floor(100.0 * n_docs / df) AS BIGINT) AS idf
        |  FROM (SELECT term, COUNT(*) AS df FROM tf GROUP BY term), n
        |  WHERE df <= 100),
        |w AS (
        |  SELECT doc_id, tf.term, tf * idf AS w
        |  FROM tf JOIN idf ON tf.term = idf.term),
        |norms AS (
        |  SELECT doc_id, SUM(CAST(w * w AS DECIMAL(38,0))) AS n2
        |  FROM w GROUP BY doc_id),
        |dots AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    SUM(CAST(a.w * b.w AS DECIMAL(38,0))) AS dot
        |  FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b, CAST(dot AS BIGINT) AS dot
        |FROM dots
        |  JOIN norms na ON na.doc_id = doc_a
        |  JOIN norms nb ON nb.doc_id = doc_b
        |WHERE dot > 0 AND dot * dot * 25 >= na.n2 * nb.n2 * 16
        |ORDER BY doc_a, doc_b""".stripMargin)
}
