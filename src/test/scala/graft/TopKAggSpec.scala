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
      .groupBy($"g").agg(TopKAgg.topk(3, $"score", $"id").as("top"))
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

  test("topk maintains exact leaders across streaming micro-batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    graft.plans.TopKAgg.register(spark, k = 2)
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long, Long)]
    val agg = in.toDS().toDF("g", "score", "id")
      .groupBy($"g").agg(graft.plans.TopKAgg.topk(2, $"score", $"id").as("top"))
    val q = graft.streaming.StreamOps.toMemorySink(agg, "topk_stream", "complete")
    try {
      in.addData(("g1", 10L, 1L), ("g1", 30L, 2L), ("g2", 5L, 3L))
      q.processAllAvailable()
      in.addData(("g1", 20L, 4L), ("g2", 50L, 5L))
      q.processAllAvailable()
      val got = spark.table("topk_stream")
        .select($"g", $"top").collect()
        .map(r => r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(x => (x.getLong(0), x.getLong(1)))).toMap
      // cross-batch state: g1's batch-2 row (20,4) displaces (10,1)
      assert(got("g1") == Seq((30L, 2L), (20L, 4L)))
      assert(got("g2") == Seq((50L, 5L), (5L, 3L)))
    } finally q.stop()
  }

  test("topk plans as a partial+final aggregate, not a window") {
    import spark.implicits._
    TopKAgg.register(spark, k = 3)
    val df = (0 until 100).map(i => (s"g${i % 3}", i.toLong, i.toLong))
      .toDF("g", "score", "id")
      .groupBy($"g").agg(TopKAgg.topk(3, $"score", $"id").as("top"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("partial_topk"),
      s"map-side partial aggregation expected:\n$plan")
  }
}
