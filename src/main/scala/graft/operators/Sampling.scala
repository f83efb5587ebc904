package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._
import graft.sources.Sources

/** Exact stratified sampling: per stratum, take EXACTLY ceil(rate·n)
  * rows — the ones with the smallest salted portable hash — so the
  * sample is deterministic, reproducible from the data alone, and every
  * stratum is represented at the exact configured rate (unlike
  * Bernoulli `sample()`, whose per-stratum counts fluctuate).
  *
  * Complements [[CorpusOps]]' capped-rate domain mixing: this is the
  * "exact experimental-split" shape. One shuffle total: the per-stratum
  * rank and count share a single window partitioning, and the report
  * aggregation reuses it map-side. Skewed strata pay one sort each —
  * at extreme scale swap the exact rank for an approximate per-stratum
  * hash threshold (two scans, no sort) with the same determinism.
  */
object Sampling {

  /** Per-stratum sampling report: total rows, sampled rows
    * (= ceil(pct·total/100), integer-exact), and the sum of sampled ids
    * as a portable witness of WHICH rows were selected.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strata: Seq[String],
      pct: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strata.map(col): _*)
      .orderBy($"_h", col(idCol))
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy(strata.map(col): _*)
    df.select((strata :+ idCol).map(col) :+
        portableHash64(concat(lit("ss:"), col(idCol))).as("_h"): _*)
      .withColumn("_rn", row_number().over(w))
      .withColumn("_total", count(lit(1)).over(wc))
      // (n·pct + 99) div 100 = ceil(n·pct/100) for positive integers
      .filter($"_rn" <= expr(s"(_total * $pct + 99) div 100"))
      .groupBy(strata.map(col): _*)
      .agg(max($"_total").as("n_total"), count(lit(1)).as("n_sampled"),
        sum(col(idCol)).as("id_sum"))
      .orderBy(strata.map(col): _*)
  }

  // ---------------------------------------------------------------- queries

  /** 10% exact stratified sample of documents by (lang, source). */
  def qStratifiedSample(s: SparkSession, dir: String): DataFrame =
    stratifiedSample(Sources.documents(s, dir), "doc_id",
      Seq("lang", "source"), pct = 10)

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q_stratified_sample" -> qStratifiedSample)

  val oracles: Map[String, String] = Map(
    "q_stratified_sample" ->
      s"""WITH h AS (
         |  SELECT doc_id, lang, source,
         |    ${portableHash64Sql("'ss:'||doc_id")} AS h
         |  FROM documents),
         |r AS (
         |  SELECT *,
         |    ROW_NUMBER() OVER (PARTITION BY lang, source ORDER BY h, doc_id) AS rn,
         |    COUNT(*) OVER (PARTITION BY lang, source) AS total
         |  FROM h)
         |SELECT lang, source, MAX(total) AS n_total,
         |  COUNT(*) AS n_sampled, CAST(SUM(doc_id) AS BIGINT) AS id_sum
         |FROM r WHERE rn <= (total * 10 + 99) // 100
         |GROUP BY lang, source ORDER BY lang, source""".stripMargin)
}
