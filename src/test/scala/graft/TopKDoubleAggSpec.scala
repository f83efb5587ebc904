package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.TopKDoubleAgg

class TopKDoubleAggSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.configure(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")).getOrCreate()

  test("topkd is exact, partitioning-invariant, and tie-breaks by id asc") {
    import spark.implicits._
    TopKDoubleAgg.register(spark, k = 3)
    val rng = new scala.util.Random(11)
    // coarse scores force score ties so the id-asc tie-break is exercised
    val rows = (0 until 5000).map(i =>
      (s"g${i % 7}", rng.nextInt(40).toDouble / 8.0, i.toLong))
    def run(parts: Int) = rows.toDF("g", "score", "id")
      .repartition(parts)
      .groupBy($"g").agg(TopKDoubleAgg.topkd(3, $"score", $"id").as("top"))
      .select($"g", posexplode($"top"))
      .select($"g", $"pos", $"col.score", $"col.id")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2),
        r.getLong(3))).toSet
    val a = run(1)
    val b = run(13)
    assert(a == b, "top-k must be identical under any partitioning")
    val expect = rows.groupBy(_._1).flatMap { case (g, rs) =>
      rs.sortBy(r => (-r._2, r._3)).take(3).zipWithIndex
        .map { case ((_, s, i), pos) => (g, pos, s, i) }
    }.toSet
    assert(a == expect)
  }

  test("topkd matches the rank-window formulation row-for-row") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    TopKDoubleAgg.register(spark, k = 5)
    val rng = new scala.util.Random(23)
    val df = (0 until 2000).map(i =>
      (i.toLong % 17, rng.nextDouble(), i.toLong)).toDF("g", "score", "id")
    val viaAgg = df.groupBy($"g")
      .agg(TopKDoubleAgg.topkd(5, $"score", $"id").as("top"))
      .select($"g", explode($"top").as("e"))
      .select($"g", $"e.id", $"e.score")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val w = Window.partitionBy($"g").orderBy($"score".desc, $"id")
    val viaWindow = df.withColumn("_rn", row_number().over(w))
      .filter($"_rn" <= 5).select($"g", $"id", $"score")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaAgg == viaWindow)
  }

  test("topkd plans as a partial+final aggregate, not a window") {
    import spark.implicits._
    TopKDoubleAgg.register(spark, k = 3)
    val df = (0 until 100).map(i => (s"g${i % 3}", i.toDouble, i.toLong))
      .toDF("g", "score", "id")
      .groupBy($"g").agg(TopKDoubleAgg.topkd(3, $"score", $"id").as("top"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("partial_topkd"),
      s"map-side partial aggregation expected:\n$plan")
  }
}
