package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators._

/** Plan-shape regression guards for the scale properties the operators
  * claim: no cartesian products in the filtered joins, no O(n²)
  * shrinking window frames, single-aggregate chunk dedup. These lock in
  * the fixes measured at sf0.1 (edit join 8 min → 4 s, skyline
  * 22 s → 1 s) so a refactor can't silently reintroduce the shape bugs.
  */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.configure(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")).getOrCreate()
  val sf = "/root/testdata/sf0.001"

  private def executedPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("edit join plans as equi-joins — no cartesian, no nested loop") {
    val plan = executedPlan(EditDist.qEditJoin(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }

  test("skyline uses only growing/whole-partition window frames") {
    val plan = executedPlan(Sampling2.qSkyline(spark, sf))
    // the shrinking frame Spark recomputes per row would print
    // "unboundedfollowing$()" as a frame END; growing frames end at a
    // bounded offset or currentrow and whole-partition maxes are
    // unbounded on BOTH ends (O(n) single pass)
    val shrinking = plan.linesIterator.filter(l =>
      l.contains("unboundedfollowing") && !l.contains("unboundedpreceding"))
    assert(shrinking.isEmpty,
      s"skyline must not use a shrinking window frame:\n$plan")
  }

  test("CDC chunk report is one explode + one aggregate — no join") {
    val plan = executedPlan(Chunking.qCdcChunks(spark, sf))
    assert(!plan.contains("Join"), plan.take(2000))
  }

  test("tfidf cosine candidates come from an equi-join on the term") {
    val plan = executedPlan(SparseSim.qTfidfCosine(spark, sf))
    // the posting self-join must be hash/merge on the term key; the only
    // permissible nested-loop/cartesian is the broadcast of the 1-row
    // global doc count
    val nlj = plan.linesIterator.count(l =>
      l.contains("CartesianProduct") || l.contains("NestedLoopJoin"))
    assert(nlj <= 1, s"more nested-loop joins than the 1-row stats cross:\n$plan")
    assert("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[term".r
      .findFirstIn(plan).isDefined,
      s"posting self-join must be an equi-join on term:\n$plan")
  }

  test("hybrid search ranks only bounded candidate heads") {
    val plan = executedPlan(Hybrid.qHybridSearch(spark, sf))
    val lines = plan.linesIterator.toSeq
    // both modality heads come from a distributed top-k (per-partition
    // heaps), bounded to CandidateDepth rows
    val heads = lines.count(
      _.contains(s"TakeOrderedAndProject(limit=${Hybrid.CandidateDepth}"))
    assert(heads >= 2, s"expected 2 distributed top-k heads:\n$plan")
    // every rank window must consume one of those bounded heads — its
    // input (the next plan lines) reaches a limit before any other shuffle
    lines.zipWithIndex.filter(_._1.contains("Window [")).foreach {
      case (_, i) =>
        val below = lines.drop(i + 1).take(3)
        assert(below.exists(l => l.contains("TakeOrderedAndProject") ||
            l.contains("GlobalLimit")),
          s"rank window at line $i must sit on a limit-bounded input:\n$plan")
    }
  }

  test("vocab coverage ranks without any window over the vocabulary") {
    val plan = executedPlan(DataOpsQueries.qVocabCoverage(spark, sf))
    assert(!plan.contains("Window ["), plan.take(2000))
    // the only single-partition exchange allowed is the 1-row totals
    // aggregate feeding the broadcast; the vocabulary itself moves through
    // the range-partitioned prefix pass
    // the AQE string prints Final and Initial plans — count the final only
    val finalPlan = plan.split("== Initial Plan ==").head
    val sp =
      finalPlan.linesIterator.count(_.contains("Exchange SinglePartition"))
    assert(sp <= 1, s"vocabulary must not collapse to one partition:\n$plan")
  }

  test("co-purchase edge build is one aggregate + expansion — no self-join") {
    val plan = executedPlan(Graph.qDegreeDist(spark, sf))
    // PairCombos replaced the items distinct + per-order self-join +
    // distinct: any join in this plan is a regression
    assert(!plan.contains("Join"), plan.take(2000))
    assert(plan.contains("pair_combos"), plan.take(2000))
  }

  test("hard negatives never shuffles the corpus scan") {
    val df = TrainPrep.qHardNegatives(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the per-partition heap output (queries×k×partitions rows) shuffles;
    // the corpus chain UNDER MapPartitions (its child lines down to the
    // first parquet scan) must not contain an Exchange
    val lines = plan.linesIterator.toSeq
    val mapPartIdx = lines.indexWhere(_.contains("MapPartitions"))
    assert(mapPartIdx >= 0, plan.take(2000))
    val chain = lines.drop(mapPartIdx)
      .takeWhile(!_.contains("Scan parquet")) :+ ""
    assert(!chain.exists(_.contains("Exchange")),
      s"corpus scan below the heap stage must be shuffle-free:\n$plan")
  }
}
