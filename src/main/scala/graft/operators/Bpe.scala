package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._
import graft.sources.Sources

/** BPE (byte-pair-encoding) merge-table learning — the tokenizer-training
  * step of an LLM data pipeline, run as a distributed histogram loop.
  *
  * The standard trainer shape: tokenize the corpus once into a WORD
  * HISTOGRAM (unique word → count; vastly smaller than the corpus, and
  * the only thing that ever shuffles), spell each word as space-separated
  * symbols, then repeat: count adjacent symbol pairs weighted by word
  * frequency (one map-side-combining aggregation over the histogram),
  * merge the most frequent pair everywhere (a pure projection using
  * left-to-right non-overlapping literal `replace` — identical semantics
  * in the JVM and DuckDB), emit (round, pair, merged, count).
  *
  * Determinism: counts are exact integers; the winning pair breaks ties
  * by binary string order; pair extraction double-counts overlapping
  * pairs ("a a a" yields "a a" twice) exactly like the reference BPE
  * formulation — and identically in the oracle. No end-of-word marker is
  * modeled (a simplification; adding one is a constant suffix symbol).
  *
  * Scale shape: corpus → histogram is the one big aggregation (the same
  * shape as word count); each merge round then aggregates the compact
  * histogram only. nMerges collect()s move one row each.
  */
object Bpe {

  /** Learn `nMerges` BPE merges over the word histogram of `docs.textCol`.
    * Returns one row per merge round: (round, pair, merged, cnt).
    */
  def trainMerges(docs: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val hist = docs
      .select(explode(wordTokens(col(textCol))).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("cnt"))
      // spell as space-separated single-char symbols
      .select(trim(regexp_replace($"w", "(.)", "$1 ")).as("s"), $"cnt")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      graft.plans.AdjacentPairs.register(spark)
      var cur = hist
      val merges = Seq.newBuilder[(Long, String, String, Long)]
      for (r <- 1 to nMerges) {
        // adjacent symbol pairs in one codegen'd pass (identical to the
        // zip_with-tail + filter composition)
        val pairs = graft.plans.AdjacentPairs.pairs(split($"s", " "))
        val top = cur
          .select($"cnt", explode(pairs).as("pr"))
          .groupBy($"pr").agg(sum($"cnt").as("c"))
          .orderBy($"c".desc, $"pr")
          .limit(1)
          .collect()
        if (top.nonEmpty) {
          val pair = top(0).getString(0)
          val cnt = top(0).getLong(1)
          val merged = pair.replace(" ", "")
          merges += ((r.toLong, pair, merged, cnt))
          cur = cur.select(
            replace($"s", lit(pair), lit(merged)).as("s"), $"cnt")
        }
      }
      merges.result()
        .toDF("round", "pair", "merged", "cnt")
        .orderBy($"round")
        .localCheckpoint(true)
    } finally hist.unpersist()
  }

  // ---------------------------------------------------------------- queries

  /** The first 6 BPE merges learned from the documents corpus. */
  def qBpeTrain(s: SparkSession, dir: String): DataFrame =
    trainMerges(Sources.documents(s, dir), "text", nMerges = 6)

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q_bpe_train" -> qBpeTrain)

  val oracles: Map[String, String] = Map("q_bpe_train" -> bpeOracle)

  /** The same 6-round loop unrolled in SQL: word histogram, spaced
    * spelling, per-round pair count + argmax + literal replace.
    */
  private def bpeOracle: String = {
    def round(r: Int): String =
      s"""p$r AS (
         |  SELECT pr, SUM(cnt) AS c FROM (
         |    SELECT cnt, unnest(list_transform(range(1, len(a)),
         |      j -> a[j] || ' ' || a[j + 1])) AS pr
         |    FROM (SELECT cnt, string_split(s, ' ') AS a FROM w${r - 1}))
         |  GROUP BY pr),
         |t$r AS (SELECT pr, c FROM p$r ORDER BY c DESC, pr LIMIT 1),
         |w$r AS (
         |  SELECT replace(w.s, t.pr, replace(t.pr, ' ', '')) AS s, w.cnt
         |  FROM w${r - 1} w CROSS JOIN t$r t)""".stripMargin
    val rounds = (1 to 6).map(round).mkString(",\n")
    val out = (1 to 6).map(r =>
      s"SELECT CAST($r AS BIGINT) AS round, pr AS pair, " +
        s"replace(pr, ' ', '') AS merged, CAST(c AS BIGINT) AS cnt FROM t$r")
      .mkString(" UNION ALL ")
    s"""WITH hist AS (
       |  SELECT w, COUNT(*) AS cnt FROM (
       |    SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS w
       |    FROM documents)
       |  WHERE w <> '' GROUP BY w),
       |w0 AS (
       |  SELECT trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS s, cnt
       |  FROM hist),
       |$rounds
       |SELECT round, pair, merged, cnt FROM ($out) ORDER BY round""".stripMargin
  }
}
