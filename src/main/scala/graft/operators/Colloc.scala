package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._
import graft.sources.Sources

/** Collocation extraction: rank adjacent word pairs by pointwise mutual
  * information — the "new-york"-finder of corpus preprocessing (merge
  * high-PMI pairs before tokenizer training, or flag boilerplate).
  *
  * PMI = p(xy) / (p(x)·p(y)) is ranked LOG-FREE with a scaled integer
  * quotient: score = (c_xy · N_u² · S) div (N_b · c_x · c_y), identical
  * truncating arithmetic in both engines (same trick as the log-free
  * BM25 in [[Relevance]]) — so the ranking is bit-deterministic and
  * SQL-replayable, with ties broken by the pair itself. A min-support
  * floor keeps hapax noise out, standard for PMI.
  *
  * Scale shape: one token scan feeds both the unigram and (via the
  * tail-zip) bigram histograms; the joins attach per-word counts to the
  * bigram table (two broadcast-or-shuffle hash joins on word). Integer
  * magnitudes: the PRODUCT c_xy·N_u²·S overflows i64 already at ~10⁷
  * total tokens (caught by the sf1 scale probe), so both engines compute
  * it in exact wide integers — DECIMAL(38,0) here, HUGEINT in DuckDB —
  * and only the QUOTIENT is narrowed back to i64, which it always fits:
  * score ≤ N_u²·S/(N_b·minCount²) ≈ N_u·S/minCount², ~4·10¹⁴ even at a
  * 10¹²-token corpus. 38 digits bound the product through N_u ≈ 10¹⁵
  * tokens; past that, shard the counts.
  */
object Colloc {

  private val S = 1000L

  /** Top-k adjacent-pair collocations by integer-scaled PMI. */
  def topCollocations(docs: DataFrame, textCol: String, minCount: Int,
      k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(wordTokens(col(textCol)).as("ws"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val uni = toks.select(explode($"ws").as("w"))
        .groupBy($"w").agg(count(lit(1)).as("c"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // adjacent pairs in one codegen'd pass (graft.plans.AdjacentPairs)
      graft.plans.AdjacentPairs.register(spark)
      val pairs = graft.plans.AdjacentPairs.pairs($"ws")
      val big = toks.select(explode(pairs).as("pr"))
        .groupBy($"pr").agg(count(lit(1)).as("c_xy"))
        .filter($"c_xy" >= minCount)
      val totals = uni.agg(sum($"c").as("n_u")).crossJoin(
        toks.select(greatest(size($"ws") - 1, lit(0)).as("nb"))
          .agg(sum($"nb").as("n_b")))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy($"score".desc, $"pr")
      big
        .withColumn("w1", split($"pr", " ")(0))
        .withColumn("w2", split($"pr", " ")(1))
        .join(uni.select($"w".as("w1"), $"c".as("c_x")), "w1")
        .join(uni.select($"w".as("w2"), $"c".as("c_y")), "w2")
        .crossJoin(broadcast(totals))
        .withColumn("score",
          expr(s"cast(c_xy as decimal(38,0)) * n_u * n_u * $S" +
            s" div (cast(n_b as decimal(38,0)) * c_x * c_y)"))
        .orderBy($"score".desc, $"pr")
        .limit(k)
        .withColumn("pos", row_number().over(w).cast("long"))
        .select($"pos", $"w1", $"w2", $"c_xy", $"score")
    } finally { toks.unpersist() }
  }

  // ---------------------------------------------------------------- queries

  /** Top-20 collocations (min count 5) over the documents corpus. */
  def qCollocations(s: SparkSession, dir: String): DataFrame =
    topCollocations(Sources.documents(s, dir), "text", minCount = 5, k = 20)

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q_collocations" -> qCollocations)

  val oracles: Map[String, String] = Map(
    "q_collocations" ->
      s"""WITH toks AS (
         |  SELECT regexp_split_to_array(lower(text), '[^a-z]+') AS ws0
         |  FROM documents),
         |tw AS (
         |  SELECT list_filter(ws0, x -> x <> '') AS ws FROM toks),
         |uni AS (
         |  SELECT w, COUNT(*) AS c FROM (SELECT unnest(ws) AS w FROM tw)
         |  GROUP BY w),
         |big AS (
         |  SELECT pr, COUNT(*) AS c_xy FROM (
         |    SELECT unnest(list_transform(range(1, len(ws)),
         |      j -> ws[j] || ' ' || ws[j + 1])) AS pr
         |    FROM tw)
         |  GROUP BY pr HAVING COUNT(*) >= 5),
         |totals AS (
         |  SELECT (SELECT SUM(c) FROM uni) AS n_u,
         |    (SELECT SUM(greatest(len(ws) - 1, 0)) FROM tw) AS n_b),
         |scored AS (
         |  SELECT string_split(b.pr, ' ')[1] AS w1,
         |    string_split(b.pr, ' ')[2] AS w2, b.pr, b.c_xy,
         |    CAST(CAST(b.c_xy AS HUGEINT) * t.n_u * t.n_u * $S // (CAST(t.n_b AS HUGEINT) * ux.c * uy.c) AS BIGINT) AS score
         |  FROM big b
         |  CROSS JOIN totals t
         |  JOIN uni ux ON string_split(b.pr, ' ')[1] = ux.w
         |  JOIN uni uy ON string_split(b.pr, ' ')[2] = uy.w)
         |SELECT CAST(ROW_NUMBER() OVER (ORDER BY score DESC, pr) AS BIGINT) AS pos,
         |  w1, w2, c_xy, score
         |FROM scored ORDER BY score DESC, pr LIMIT 20""".stripMargin)
}
