package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Layout

/** The co-located-join layout (SURVEY §5): bucketed tables pay the
  * shuffle once at write time; joins and aggregations on the bucket key
  * then plan WITHOUT any Exchange.
  */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val wh = Files.createTempDirectory("graft-warehouse").toString
    // threshold configs AFTER configure() (it sets its own defaults);
    // broadcast is disabled so the test observes the bucketed SMJ shape
    GraftSession.configure(SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", wh))
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
  }
  val sf = "/root/testdata/sf0.001"

  test("join of two tables bucketed on the key plans with zero Exchange") {
    val orders = graft.sources.Sources.orders(spark, sf)
    val lineitem = graft.sources.Sources.lineitem(spark, sf)
    Layout.writeBucketedTable(orders, "b_orders", "o_orderkey", 8)
    Layout.writeBucketedTable(lineitem, "b_lineitem", "l_orderkey", 8)
    val joined = spark.table("b_orders")
      .join(spark.table("b_lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed join/agg should be shuffle-free:\n$plan")
    // and it computes the same thing as the plain-parquet plan
    val expect = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val got = joined.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == expect)
  }

  test("unbucketed baseline of the same join does shuffle (sanity)") {
    val orders = graft.sources.Sources.orders(spark, sf)
    val lineitem = graft.sources.Sources.lineitem(spark, sf)
    val plan = orders
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey")).agg(count(lit(1)).as("n"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Exchange"))
  }
}
