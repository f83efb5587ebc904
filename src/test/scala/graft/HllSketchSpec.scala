package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.HllSketchAgg
import graft.sources.Sources

class HllSketchSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.configure(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")).getOrCreate()

  test("hll sketch: estimate within bound and invariant under partitioning") {
    import spark.implicits._
    HllSketchAgg.register(spark)
    val ev = Sources.events(spark, "/root/testdata/sf0.001")
    val exact = ev.select(countDistinct($"user_id")).head.getLong(0)
    // merge-across-partitions parity: elementwise-max registers make the
    // estimate identical no matter how the rows are split
    val estimates = Seq(1, 4, 16).map { n =>
      ev.repartition(n).agg(HllSketchAgg.hllDistinct($"user_id")).head.getLong(0)
    }
    assert(estimates.distinct.size == 1, estimates.toString)
    assert(math.abs(estimates.head - exact).toDouble / exact <= 0.05,
      s"estimate ${estimates.head} vs exact $exact")
  }

  test("histogram quantile sketch: bounded error and invariant under partitioning") {
    import spark.implicits._
    graft.plans.HistQuantileAgg.register(spark, q = 0.5, lo = 0.0,
      hi = 1000.0, bins = 2000)
    val ev = Sources.events(spark, "/root/testdata/sf0.001")
    val exact = ev.selectExpr("percentile(value, 0.5)").head.getDouble(0)
    val estimates = Seq(1, 4, 16).map { n =>
      ev.repartition(n)
        .agg(graft.plans.HistQuantileAgg.histQuantile($"value"))
        .head.getDouble(0)
    }
    assert(estimates.distinct.size == 1, estimates.toString)
    assert(math.abs(estimates.head - exact) <= 0.5,
      s"estimate ${estimates.head} vs exact $exact")
  }

  test("hll sketch: SQL-callable and rejects non-bigint input") {
    HllSketchAgg.register(spark)
    Sources.events(spark, "/root/testdata/sf0.001").createOrReplaceTempView("ev_hll")
    val viaSql = spark.sql("SELECT hll_distinct(user_id) FROM ev_hll").head.getLong(0)
    assert(viaSql > 0)
    val err = intercept[Exception] {
      spark.sql("SELECT hll_distinct(event_type) FROM ev_hll").collect()
    }
    assert(err.getMessage.contains("BIGINT") || err.getMessage.toLowerCase.contains("type"))
  }
}
