package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOfJoin
import graft.plans.AsOfJoinExec

/** The custom LogicalPlan + Strategy + physical sort-merge as-of operator:
  * correctness vs the window-based formulation, and the plan actually
  * routes through AsOfJoinExec with one exchange per side.
  */
class AsOfExecSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.configure(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")).getOrCreate()

  test("AsOfJoinExec picks the latest preceding value per key") {
    import spark.implicits._
    val trades = Seq((1L, 10L), (1L, 20L), (2L, 15L)).toDF("sym", "t")
    val quotes = Seq((1L, 5L, 1.0), (1L, 12L, 2.0), (2L, 20L, 9.0))
      .toDF("sym", "t", "px")
    val joined = AsOfJoinExec.asOf(trades, quotes, "sym", "t", "px", "last_px")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan) // the custom exec node
    // exactly one exchange per side — the sort-merge as-of shape
    assert("Exchange".r.findAllIn(plan).size == 2, plan)
    val rows = joined.orderBy($"sym", $"t").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toSeq
    assert(rows == Seq((1L, 10L, Some(1.0)), (1L, 20L, Some(2.0)),
      (2L, 15L, None)))
  }

  test("AsOfJoinExec equals the window-based asOf on a random workload") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val trades = Seq.fill(400)((rng.nextInt(8).toLong,
      rng.nextInt(1000).toLong)).distinct.toDF("sym", "t")
    val quotes = Seq.fill(300)((rng.nextInt(8).toLong,
      rng.nextInt(1000).toLong, rng.nextInt(100) / 10.0)).distinct
      // one quote per (sym, t) so both formulations are deterministic
      .groupBy(q => (q._1, q._2)).map(_._2.head).toSeq
      .toDF("sym", "t", "px")
    val viaExec = AsOfJoinExec.asOf(trades, quotes, "sym", "t", "px", "last_px")
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).toSet
    val viaWindow = AsOfJoin.asOf(trades, quotes, "sym", "t", "px", "last_px")
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).toSet
    assert(viaExec == viaWindow && viaExec.nonEmpty)
  }
}
