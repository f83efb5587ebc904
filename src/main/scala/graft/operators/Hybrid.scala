package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Sources

/** Hybrid retrieval (the RAG-corpus search shape): a lexical ranking and
  * a vector ranking fused by Reciprocal Rank Fusion,
  * `score = Σ floor(10⁹ / (60 + rank_i))` — integer-exact, so the fused
  * ordering reproduces bit-for-bit in the oracle.
  *
  *  - lexical side: log-free idf-weighted term counts for the fixed
  *    query terms (the [[SparseSim]] weighting) over one corpus scan;
  *  - vector side: one-pass [[graft.plans.VecCosine]] against the query
  *    embedding (doc_id ≡ vec_id on the synthetic corpus);
  *  - both rankings are TRUNCATED to the top [[CandidateDepth]] docs
  *    (standard practice: RRF fuses the heads of each retriever's list,
  *    not full-corpus rankings); a doc outside a modality's head
  *    contributes nothing for that side — same as a doc missing from
  *    the ranking entirely;
  *  - a full outer join on doc id fuses the two heads.
  *
  * Scale shape: two corpus scans (one per modality); each head is a
  * distributed top-k (`TakeOrderedAndProject`: per-partition heaps, no
  * global sort), so the only rank window runs over ≤ [[CandidateDepth]]
  * rows — the full corpus is never pulled into one partition. At 100 TB
  * the vector head would come from the IVF probe instead of the scan.
  */
object Hybrid {

  /** Per-modality candidate-list depth fused by RRF. */
  val CandidateDepth = 100

  def qHybridSearch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val queryTerms = Seq("table", "hash", "merge")
    graft.plans.VecCosine.register(s)

    // lexical: idf-weighted query-term count (integer), docs with score>0
    val tf = Sources.documents(s, dir)
      .select($"doc_id", explode(
        filter(split(lower($"text"), "[^a-z]+"), t => t =!= "")).as("term"))
      .filter($"term".isin(queryTerms: _*))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val nDocs = Sources.documents(s, dir).count()
    val idf = tf.groupBy($"term").agg(count(lit(1)).as("df"))
      .select($"term", floor(lit(100) * nDocs / $"df").as("idf"))
    val lex = tf.join(broadcast(idf), "term")
      .groupBy($"doc_id")
      .agg(sum($"tf" * $"idf").as("lex_score"))
    // distributed top-k first (per-partition heaps), THEN the rank
    // window — it only ever sees CandidateDepth rows
    // the constant partition key is deliberate: input is bounded to
    // CandidateDepth rows by the limit, so one partition is the point
    val one = Window.partitionBy(lit(0))
    val lexRank = lex
      .orderBy($"lex_score".desc, $"doc_id").limit(CandidateDepth)
      .withColumn("rank_t",
        row_number().over(one.orderBy($"lex_score".desc, $"doc_id"))
          .cast("long"))

    // vector: cosine vs vec_id 0 over the doc-aligned embedding slice
    val emb = Sources.embeddings(s, dir).filter($"vec_id" < nDocs)
    val qv = emb.filter($"vec_id" === 0).select($"embedding".as("_qv"))
    val vec = emb.crossJoin(broadcast(qv))
      .select($"vec_id".as("doc_id"),
        graft.plans.VecCosine.cosine($"embedding", $"_qv").as("cos"))
    val vecRank = vec
      .orderBy($"cos".desc, $"doc_id").limit(CandidateDepth)
      .withColumn("rank_v",
        row_number().over(one.orderBy($"cos".desc, $"doc_id"))
          .cast("long"))

    lexRank.select($"doc_id", $"rank_t")
      .join(vecRank.select($"doc_id", $"rank_v"), Seq("doc_id"), "full_outer")
      .select($"doc_id",
        (coalesce(expr("1000000000L DIV (60 + rank_t)"), lit(0L)) +
          coalesce(expr("1000000000L DIV (60 + rank_v)"), lit(0L)))
          .as("fused"),
        $"rank_t", $"rank_v")
      .orderBy($"fused".desc, $"doc_id")
      .limit(20)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_hybrid_search" -> qHybridSearch)

  private val Cos =
    "list_sum(list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))"

  val oracles: Map[String, String] = Map(
    "q_hybrid_search" ->
      s"""WITH n AS (SELECT COUNT(*) AS n_docs FROM documents),
         |tf AS (
         |  SELECT doc_id, t.term, COUNT(*) AS tf
         |  FROM documents,
         |    UNNEST(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
         |                       x -> x <> '')) AS t(term)
         |  WHERE t.term IN ('table', 'hash', 'merge')
         |  GROUP BY doc_id, t.term),
         |idf AS (
         |  SELECT term, CAST(floor(100.0 * n_docs / df) AS BIGINT) AS idf
         |  FROM (SELECT term, COUNT(*) AS df FROM tf GROUP BY term), n),
         |lex AS (
         |  SELECT doc_id, SUM(tf * idf) AS lex_score
         |  FROM tf JOIN idf USING (term) GROUP BY doc_id),
         |lex_rank AS (
         |  SELECT doc_id, rank_t FROM (
         |    SELECT doc_id, CAST(row_number() OVER (
         |      ORDER BY lex_score DESC, doc_id) AS BIGINT) AS rank_t
         |    FROM lex) WHERE rank_t <= 100),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |vec AS (
         |  SELECT e.vec_id AS doc_id,
         |    ($Cos) / (sqrt(${Cos.replace("q.qv", "e.embedding")}) *
         |              sqrt(${Cos.replace("e.embedding", "q.qv")})) AS cos
         |  FROM embeddings e, q, n WHERE e.vec_id < n.n_docs),
         |vec_rank AS (
         |  SELECT doc_id, rank_v FROM (
         |    SELECT doc_id, CAST(row_number() OVER (
         |      ORDER BY cos DESC, doc_id) AS BIGINT) AS rank_v
         |    FROM vec) WHERE rank_v <= 100)
         |SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
         |  COALESCE(1000000000 // (60 + rank_t), 0) +
         |    COALESCE(1000000000 // (60 + rank_v), 0) AS fused,
         |  rank_t, rank_v
         |FROM lex_rank l FULL OUTER JOIN vec_rank v ON l.doc_id = v.doc_id
         |ORDER BY fused DESC, doc_id LIMIT 20""".stripMargin)
}
