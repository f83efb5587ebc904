package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._
import graft.sources.Sources

/** Perplexity-proxy language-model scoring without logs: score each
  * document against the corpus's own top-K bigram table — out-of-vocab
  * bigram count and the total frequency mass of the seen ones. Documents
  * whose bigrams are mostly OOV or low-frequency are the gibberish /
  * boilerplate candidates a real LM-perplexity filter would flag; this
  * integer formulation keeps the whole signal exact across engines
  * (IEEE log sums would diverge in the last bits between libms).
  *
  * Scale shape: one pair scan builds the bigram histogram (map-side
  * combine); the top-K table (K ≪ distinct bigrams, selected by a
  * WindowGroupLimit-style rank) broadcasts to a per-doc join; per-doc
  * stats aggregate with combine. Docs with fewer than two tokens get an
  * explicit zero row via the left join from the corpus spine.
  */
object LmScore {

  /** Per-doc (n_bigrams, n_oov, seen_cnt_sum) vs the corpus top-K table. */
  def scoreAgainstTopK(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.plans.AdjacentPairs.register(spark)
    val pairs = docs.select(col(idCol).as("doc_id"),
        explode(graft.plans.AdjacentPairs.pairs(wordTokens(col(textCol))))
          .as("pr"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val top = pairs.groupBy($"pr").agg(count(lit(1)).as("c"))
        .orderBy($"c".desc, $"pr")
        .limit(k)
      val stats = pairs
        .join(broadcast(top), Seq("pr"), "left")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          sum(when($"c".isNull, 1L).otherwise(0L)).as("n_oov"),
          sum(coalesce($"c", lit(0L))).as("seen_cnt_sum"))
      docs.select(col(idCol).as("doc_id"))
        .join(stats, Seq("doc_id"), "left")
        .select($"doc_id",
          coalesce($"n_bigrams", lit(0L)).as("n_bigrams"),
          coalesce($"n_oov", lit(0L)).as("n_oov"),
          coalesce($"seen_cnt_sum", lit(0L)).as("seen_cnt_sum"))
        .orderBy($"doc_id")
        .localCheckpoint(true)
    } finally pairs.unpersist()
  }

  // ---------------------------------------------------------------- queries

  /** Each document scored against the corpus top-1000 bigram table. */
  def qLmScore(s: SparkSession, dir: String): DataFrame =
    scoreAgainstTopK(Sources.documents(s, dir), "doc_id", "text", k = 1000)

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q_lm_score" -> qLmScore)

  val oracles: Map[String, String] = Map(
    "q_lm_score" ->
      """WITH tw AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
        |      x -> x <> '') AS ws
        |  FROM documents),
        |pairs AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(ws)),
        |    j -> ws[j] || ' ' || ws[j + 1])) AS pr
        |  FROM tw),
        |top AS (
        |  SELECT pr, c FROM (
        |    SELECT pr, COUNT(*) AS c FROM pairs GROUP BY pr)
        |  ORDER BY c DESC, pr LIMIT 1000),
        |stats AS (
        |  SELECT p.doc_id, COUNT(*) AS n_bigrams,
        |    SUM(CASE WHEN t.c IS NULL THEN 1 ELSE 0 END) AS n_oov,
        |    SUM(COALESCE(t.c, 0)) AS seen_cnt_sum
        |  FROM pairs p LEFT JOIN top t ON p.pr = t.pr
        |  GROUP BY p.doc_id)
        |SELECT d.doc_id, COALESCE(s.n_bigrams, 0) AS n_bigrams,
        |  CAST(COALESCE(s.n_oov, 0) AS BIGINT) AS n_oov,
        |  CAST(COALESCE(s.seen_cnt_sum, 0) AS BIGINT) AS seen_cnt_sum
        |FROM documents d LEFT JOIN stats s ON d.doc_id = s.doc_id
        |ORDER BY d.doc_id""".stripMargin)
}
