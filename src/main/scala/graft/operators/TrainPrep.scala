package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Sources

/** Training-data preparation reports.
  *
  * `q_hard_negatives` — contrastive-pair mining: for each anchor
  * embedding, the k most-similar vectors with a DIFFERENT label (the
  * "nearest wrong answer" negatives a contrastive loss wants). Bounded
  * per-partition heaps via [[Similarity.hardNegatives]]; the corpus never
  * shuffles.
  *
  * `q_source_profile` — the dataset-card summary per source: document
  * counts, char mass, language mix, and exact-dup mass (distinct content
  * hashes vs rows) in ONE scan — all integer-exact aggregates, map-side
  * combining, no joins.
  *
  * `q_class_balance` — deterministic oversampling plan: per label, the
  * integer replication factor `ceil(max_n / n)` and the resulting
  * post-balance row count — the class-rebalance shard math without
  * materializing a row explosion (the plan IS the output; appliers
  * `posexplode(sequence(1, factor))` downstream).
  */
object TrainPrep {

  def qHardNegatives(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Sources.embeddings(s, dir)
    val anchors = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"embedding".as("qv"), $"label".as("qlabel"))
    Similarity.hardNegatives(emb, "vec_id", "embedding", "label",
      anchors, "qid", "qv", "qlabel", k = 5)
      .select($"query_id", $"vec_id", $"label".cast("long").as("neg_label"),
        $"cos")
      .orderBy($"query_id", $"vec_id")
  }

  def qSourceProfile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Sources.documents(s, dir)
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_chars").as("sum_chars"),
        min($"n_chars").as("min_chars"),
        max($"n_chars").as("max_chars"),
        countDistinct($"lang").as("n_langs"),
        countDistinct(md5($"text")).as("n_uniq_texts"),
        sum(when($"lang" === "en", 1L).otherwise(0L)).as("n_en"))
      .orderBy($"source")
  }

  def qClassBalance(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val counts = Sources.embeddings(s, dir)
      .groupBy($"label".cast("long").as("label"))
      .agg(count(lit(1)).as("n"))
    counts
      .crossJoin(broadcast(counts.agg(max($"n").as("max_n"))))
      .select($"label", $"n",
        expr("(max_n + n - 1) DIV n").as("factor"))
      .withColumn("balanced_n", $"factor" * $"n")
      .orderBy($"label")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_hard_negatives" -> qHardNegatives,
    "q_source_profile" -> qSourceProfile,
    "q_class_balance" -> qClassBalance)

  private def dot(a: String, b: String) =
    s"list_sum(list_transform(range(1, 65), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
  private def cos(a: String, b: String) =
    s"${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"

  val oracles: Map[String, String] = Map(
    "q_hard_negatives" ->
      s"""WITH q AS (
         |  SELECT vec_id AS qid, embedding AS qv, label AS qlabel
         |  FROM embeddings WHERE vec_id < 5),
         |c AS (
         |  SELECT q.qid AS query_id, e.vec_id,
         |    CAST(e.label AS BIGINT) AS neg_label,
         |    ${cos("e.embedding", "qv")} AS cos
         |  FROM embeddings e CROSS JOIN q
         |  WHERE CAST(e.label AS BIGINT) <> CAST(q.qlabel AS BIGINT)),
         |r AS (
         |  SELECT query_id, vec_id, neg_label, cos,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY cos DESC, vec_id) AS rn
         |  FROM c)
         |SELECT query_id, vec_id, neg_label, cos FROM r WHERE rn <= 5
         |ORDER BY query_id, vec_id""".stripMargin,
    "q_source_profile" ->
      """SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
        |  COUNT(DISTINCT lang) AS n_langs,
        |  COUNT(DISTINCT md5(text)) AS n_uniq_texts,
        |  CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q_class_balance" ->
      """WITH c AS (
        |  SELECT CAST(label AS BIGINT) AS label, COUNT(*) AS n
        |  FROM embeddings GROUP BY 1),
        |m AS (SELECT MAX(n) AS max_n FROM c)
        |SELECT label, n, (max_n + n - 1) // n AS factor,
        |  ((max_n + n - 1) // n) * n AS balanced_n
        |FROM c CROSS JOIN m ORDER BY label""".stripMargin)
}
