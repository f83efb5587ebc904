package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Prints a compact physical-plan audit for headline queries: verifies
  * filters/projections reach the parquet scans (PushedFilters/ReadSchema),
  * dimension joins broadcast, and operators sit inside WholeStageCodegen.
  *
  * Usage: sbt "runMain graft.PlanAudit [sfDir]"
  */
object PlanAudit {
  val Audited = Seq("q6_revenue", "q3_shipping_priority", "q5_local_volume",
    "q1_pricing_summary", "q_asof_join", "q_window_tumbling",
    "q_dedup_ngram_jaccard", "q_ann_bruteforce", "q_knn_join_ivf", "q_triangles", "q_ingest_dedup",
    "q_bloom_join", "q_seq_pack", "q_dedup_containment", "q_bm25",
    "q_funnel", "q_countmin",
    "q_ann_ivfpq", "q_bpe_train", "q_pagerank", "q_stratified_sample",
    "q_edit_join", "q_skyline", "q_tfidf_cosine", "q_cdc_chunks",
    "q_hard_negatives", "q_bfs_levels", "q_topk_pergroup",
    "q_hybrid_search", "q_expectations", "q_skew_join")

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local("plan-audit")
    for (name <- Audited) {
      val df = SparkEntry.queries(name)(spark, dir)
      df.collect() // execute so AQE finalizes and codegen ids appear
      val qe = df.queryExecution
      val plan = qe.explainString(ExplainMode.fromString("formatted"))
      val simple = qe.explainString(ExplainMode.fromString("simple"))
      val pushed = plan.linesIterator
        .filter(l => l.contains("PushedFilters") || l.contains("ReadSchema"))
        .map(_.trim.take(110)).toSeq.distinct
      val joins = plan.linesIterator
        .filter(l => l.contains("Join") && l.contains("("))
        .map(_.trim.takeWhile(_ != '(').trim).toSeq
        .groupBy(identity).map { case (k, v) => s"$k x${v.size}" }
      val codegenSpans = "\\*\\((\\d+)\\)".r.findAllMatchIn(simple)
        .map(_.group(1).toInt).toSet.size
      println(s"== $name")
      pushed.foreach(l => println(s"   $l"))
      println(s"   joins: ${joins.mkString(", ")}; codegen spans: $codegenSpans")
    }
    spark.stop()
  }
}
