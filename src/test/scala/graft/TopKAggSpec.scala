package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.TopKAgg

class TopKAggSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.configure(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")).getOrCreate()

  test("topk is exact and partitioning-invariant") {
    import spark.implicits._
    TopKAgg.register(spark, k = 3)
    val rng = new scala.util.Random(7)
    val rows = (0 until 5000).map(i =>
      (s"g${i % 7}", rng.nextInt(1000).toLong, i.toLong))
    def run(parts: Int) = rows.toDF("g", "score", "id")
      .repartition(parts)
      .groupBy($"g").agg(TopKAgg.topk($"score", $"id").as("top"))
      .select($"g", posexplode($"top"))
      .select($"g", $"pos", $"col.score", $"col.id")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSet
    val a = run(1)
    val b = run(13)
    assert(a == b, "top-k must be identical under any partitioning")
    // reference: exact top-3 by (score desc, id asc) per group
    val expect = rows.groupBy(_._1).flatMap { case (g, rs) =>
      rs.sortBy(r => (-r._2, r._3)).take(3).zipWithIndex
        .map { case ((_, s, i), pos) => (g, pos, s, i) }
    }.toSet
    assert(a == expect)
  }

  test("topk plans as a partial+final aggregate, not a window") {
    import spark.implicits._
    TopKAgg.register(spark, k = 3)
    val df = (0 until 100).map(i => (s"g${i % 3}", i.toLong, i.toLong))
      .toDF("g", "score", "id")
      .groupBy($"g").agg(TopKAgg.topk($"score", $"id").as("top"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("partial_topk"),
      s"map-side partial aggregation expected:\n$plan")
  }
}
