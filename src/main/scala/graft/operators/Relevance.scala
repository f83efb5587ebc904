package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._
import graft.sources.Sources

/** Corpus relevance scoring: BM25-shaped ranking of documents against a
  * term query — the retrieval primitive behind dedup-against-reference,
  * quality-weighted sampling, and eval-set mining over a training corpus.
  *
  * Scale shape: one scan; the native [[graft.plans.TermCounts]]
  * expression traverses each document's tokens exactly once inside
  * whole-stage codegen, yielding doc length and per-query-term
  * frequencies together — no per-term joins, no posting-list explosion,
  * no interpreted higher-order-function lambdas in the hot path.
  * Document frequencies and corpus stats are one tiny broadcast row;
  * scoring is a pure zero-shuffle projection.
  *
  * The idf factor is the RATIONAL variant `(N - df + 0.5) / (df + 0.5)`
  * WITHOUT the usual log wrap: ranking-equivalent per term (monotone in
  * df), and — unlike `ln` whose last-ulp rounding differs across libm
  * implementations — exactly reproducible in any engine from IEEE
  * divisions alone, which makes the whole scoring chain oracle-checkable.
  */
object Relevance {

  /** Per-document BM25 score for `terms` (k1/b standard defaults).
    * Expects a lower-cased-word-token column; emits (idCol, score, nw).
    */
  def bm25(docs: DataFrame, idCol: String, tokensCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = col(tokensCol)
    // one pass per row: [n_tokens, tf0, …] from the native expression.
    // (Per-term `size(filter(toks, ...))` would re-evaluate the token
    // split once per interpreted lambda reference — the HOF trap.)
    graft.plans.TermCounts.register(docs.sparkSession, terms)
    val tf = docs
      .select(col(idCol), graft.plans.TermCounts.termCounts(toks).as("_tc"))
      .select(col(idCol) +: col("_tc").getField("n").as("_nw") +:
        terms.indices.map(i =>
          col("_tc").getField(s"t$i").as(s"_tf$i")): _*)
      // one row per doc, consumed by the stats pass AND the scoring pass —
      // materialize so the corpus is tokenized once, not once per consumer
      .localCheckpoint(true)
    // corpus stats: N, avg doclen, df per term — one tiny row, broadcast
    val stats = tf.agg(
      count(lit(1)).as("_n"), sum(col("_nw")).as("_sumw") +:
        terms.indices.map(i =>
          sum(when(col(s"_tf$i") > 0, 1L).otherwise(0L)).as(s"_df$i")): _*)
    val scored = tf.crossJoin(broadcast(stats))
    val avgdl = col("_sumw").cast("double") / col("_n")
    val score = terms.indices.map { i =>
      val tfi = col(s"_tf$i").cast("double")
      val idf = (col("_n") - col(s"_df$i") + 0.5) / (col(s"_df$i") + 0.5)
      val denom = tfi + lit(k1) * (lit(1.0 - b) + lit(b) * col("_nw") / avgdl)
      idf * (tfi * (k1 + 1.0)) / denom
    }.reduce(_ + _)
    scored.select(col(idCol), score.as("score"), col("_nw").as("nw"))
  }

  // ---------------------------------------------------------------- queries

  private val QueryTerms = Seq("the", "data", "model")

  /** Top-20 documents for a 3-term query by log-free BM25. */
  def qBm25(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // coalesce makes the token array provably non-null: without it the
    // score>0 filter's inferred isnotnull constraints are pushed below
    // the projection and re-inline the whole tokenize+count chain once
    // per tf column (4 extra tokenization passes per row)
    // one compressed parquet file scans as ONE task — spread the raw text
    // across the cores before the tokenize+count pass
    val docs = Sources.documents(s, dir)
      .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt)
      .withColumn("toks", wordTokens(coalesce($"text", lit(""))))
    bm25(docs, "doc_id", "toks", QueryTerms)
      .filter($"score" > 0)
      .orderBy($"score".desc, $"doc_id")
      .limit(20)
  }

  /** Inverted-index posting statistics: per term, document frequency,
    * collection frequency, and the posting-list id range — the search /
    * retrieval index-build shape. One explode + one hash aggregate
    * (count-distinct expands map-side); df floor bounds the output to
    * the vocabulary that matters at any corpus size.
    */
  def qInvertedIndex(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Sources.documents(s, dir)
      .select($"doc_id", explode(wordTokens($"text")).as("term"))
      .groupBy($"term")
      .agg(countDistinct($"doc_id").as("df"), count(lit(1)).as("cf"),
        min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"))
      .where($"df" >= 5)
      .orderBy($"term")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q_bm25" -> qBm25, "q_inverted_index" -> qInvertedIndex)

  private val W =
    "list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), x -> x <> '')"

  val oracles: Map[String, String] = Map(
    "q_bm25" -> {
      val termSql = QueryTerms.zipWithIndex.map { case (t, i) =>
        s"CAST(len(list_filter(toks, w -> w = '$t')) AS BIGINT) AS tf$i"
      }.mkString(", ")
      val dfSql = QueryTerms.indices.map(i =>
        s"CAST(SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df$i")
        .mkString(", ")
      val scoreSql = QueryTerms.indices.map { i =>
        s"""((n - df$i + 0.5) / (df$i + 0.5)
           | * (CAST(tf$i AS DOUBLE) * (1.2 + 1.0))
           | / (CAST(tf$i AS DOUBLE)
           |    + 1.2 * (0.25 + 0.75 * nw / (CAST(sumw AS DOUBLE) / n))))"""
          .stripMargin.replace("\n", " ")
      }.mkString(" + ")
      s"""WITH t AS (
         |  SELECT doc_id, $W AS toks FROM documents),
         |tf AS (
         |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS nw, $termSql FROM t),
         |st AS (
         |  SELECT COUNT(*) AS n, CAST(SUM(nw) AS BIGINT) AS sumw, $dfSql
         |  FROM tf)
         |SELECT doc_id, $scoreSql AS score, nw
         |FROM tf, st
         |WHERE $scoreSql > 0
         |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin
    },
    "q_inverted_index" ->
      s"""WITH e AS (
         |  SELECT doc_id, unnest($W) AS term FROM documents)
         |SELECT term, COUNT(DISTINCT doc_id) AS df, COUNT(*) AS cf,
         |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
         |FROM e GROUP BY term HAVING COUNT(DISTINCT doc_id) >= 5
         |ORDER BY term""".stripMargin)
}
