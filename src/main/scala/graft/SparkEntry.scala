package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator module's query + oracle maps. Each SURVEY.md §2
  * checklist line with a query name maps to one entry here.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Examples.queries ++ WindowQueries.queries ++
      DataOpsQueries.queries ++ Analytics.queries ++ TpchExt.queries ++
      CorpusOps.queries ++ Pack.queries ++ Freq.queries ++
      Repetition.queries ++ Quantize.queries ++ ZOrder.queries ++
      Relevance.queries ++ Funnel.queries ++ Pq.queries ++ IvfPq.queries ++ Bpe.queries ++ Graph.queries ++ Sampling.queries ++ Colloc.queries ++ Timeseries.queries ++ LmScore.queries ++
      Reshape.queries ++ Temporal.queries ++ Itemsets.queries ++ EditDist.queries ++
      Features.queries ++ TableDiff.queries ++ Chunking.queries ++ SparseSim.queries ++
      Sampling2.queries ++ TrainPrep.queries ++ Quality.queries ++ Spectral.queries ++ Hybrid.queries ++ Skew.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Examples.oracles ++ WindowQueries.oracles ++
      DataOpsQueries.oracles ++ Analytics.oracles ++ TpchExt.oracles ++
      CorpusOps.oracles ++ Pack.oracles ++ Freq.oracles ++
      Repetition.oracles ++ Quantize.oracles ++ ZOrder.oracles ++
      Relevance.oracles ++ Funnel.oracles ++ Pq.oracles ++ IvfPq.oracles ++ Bpe.oracles ++ Graph.oracles ++ Sampling.oracles ++ Colloc.oracles ++ Timeseries.oracles ++ LmScore.oracles ++
      Reshape.oracles ++ Temporal.oracles ++ Itemsets.oracles ++ EditDist.oracles ++
      Features.oracles ++ TableDiff.oracles ++ Chunking.oracles ++ SparseSim.oracles ++
      Sampling2.oracles ++ TrainPrep.oracles ++ Quality.oracles ++ Spectral.oracles ++ Hybrid.oracles ++ Skew.oracles
}
