package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.sources.Sources

/** Within-document repetition filters (the Gopher "repetition removal"
  * rules): a document whose text is dominated by a few repeated n-grams is
  * boilerplate/template spam regardless of its other quality signals.
  *
  * Shape at scale: explode to (doc, gram) pairs, count per pair, aggregate
  * per doc — two shuffles keyed by high-cardinality (doc_id, gram) /
  * doc_id, map-side combining on both; no per-row lambdas over arrays.
  */
object Repetition {

  /** Per-document word-2-gram repetition stats: total grams, distinct
    * grams, the top gram's count, and the derived fractions
    * `top_frac` (count of the most frequent 2-gram / total) and
    * `dup_frac` ((total - distinct) / total). Documents shorter than two
    * words report zero grams and pass.
    */
  def bigramStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = split(col(textCol), " ")
    val grams = docs
      .select(col(idCol), posexplode(words).as(Seq("pos", "w")))
    // build (w_i, w_{i+1}) via a pos+1 self-join on the exploded pairs —
    // no array relookups, both sides shuffle once on (doc, pos)
    val a = grams.select(col(idCol), col("pos"), col("w").as("w1"))
    val b = grams.select(col(idCol), (col("pos") - 1).as("pos"), col("w").as("w2"))
    val pairs = a.join(b, Seq(idCol, "pos"))
      .select(col(idCol), concat_ws(" ", col("w1"), col("w2")).as("gram"))
    val perGram = pairs.groupBy(col(idCol), col("gram"))
      .agg(count(lit(1)).as("c"))
    perGram.groupBy(col(idCol))
      .agg(sum(col("c")).as("n_grams"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).as("top_count"))
  }

  // ---------------------------------------------------------------- queries

  /** Repetition-filter report per document: gram counts, fractions, and
    * the pass verdict (top 2-gram below 10% and duplicated-gram mass
    * below 30%). Short docs (< 2 words) pass vacuously.
    */
  def qRepFilter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Sources.documents(s, dir)
    val stats = bigramStats(docs, "doc_id", "text")
    docs.select($"doc_id").join(stats, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"n_grams", lit(0L)).as("n_grams"),
        coalesce($"n_distinct", lit(0L)).as("n_distinct"),
        coalesce($"top_count", lit(0L)).as("top_count"))
      .withColumn("top_frac",
        when($"n_grams" > 0, $"top_count".cast("double") / $"n_grams")
          .otherwise(0.0))
      .withColumn("dup_frac",
        when($"n_grams" > 0,
          ($"n_grams" - $"n_distinct").cast("double") / $"n_grams")
          .otherwise(0.0))
      .withColumn("pass", $"top_frac" <= 0.10 && $"dup_frac" <= 0.30)
      .orderBy($"doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q_rep_filter" -> qRepFilter)

  val oracles: Map[String, String] = Map(
    "q_rep_filter" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |g AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(l)),
        |    i -> l[i] || ' ' || l[i+1])) AS gram
        |  FROM w),
        |pg AS (
        |  SELECT doc_id, gram, COUNT(*) AS c FROM g GROUP BY doc_id, gram),
        |st AS (
        |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_grams,
        |    COUNT(*) AS n_distinct, CAST(MAX(c) AS BIGINT) AS top_count
        |  FROM pg GROUP BY doc_id),
        |j AS (
        |  SELECT d.doc_id,
        |    COALESCE(st.n_grams, 0) AS n_grams,
        |    COALESCE(st.n_distinct, 0) AS n_distinct,
        |    COALESCE(st.top_count, 0) AS top_count
        |  FROM (SELECT doc_id FROM documents) d
        |  LEFT JOIN st ON d.doc_id = st.doc_id)
        |SELECT doc_id, n_grams, n_distinct, top_count,
        |  CASE WHEN n_grams > 0
        |    THEN CAST(top_count AS DOUBLE) / n_grams ELSE 0.0 END AS top_frac,
        |  CASE WHEN n_grams > 0
        |    THEN CAST(n_grams - n_distinct AS DOUBLE) / n_grams
        |    ELSE 0.0 END AS dup_frac,
        |  (CASE WHEN n_grams > 0
        |     THEN CAST(top_count AS DOUBLE) / n_grams ELSE 0.0 END) <= 0.10
        |  AND
        |  (CASE WHEN n_grams > 0
        |     THEN CAST(n_grams - n_distinct AS DOUBLE) / n_grams
        |     ELSE 0.0 END) <= 0.30 AS pass
        |FROM j ORDER BY doc_id""".stripMargin)
}
