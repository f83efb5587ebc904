package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup
import graft.plans.SimHash64
import graft.sources.Sources

class SimHashSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.configure(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")).getOrCreate()
  val sf = "/root/testdata/sf0.001"

  test("native SimHash64 expression matches the columnar composition") {
    import spark.implicits._
    SimHash64.register(spark)
    val docs = Sources.documents(spark, sf)
      .withColumn("columnar", Dedup.simhash63($"text"))
      .withColumn("native",
        SimHash64.simhash64(graft.functions.wordTokens($"text")))
    assert(docs.filter($"columnar" =!= $"native").count() == 0)
    // signatures are non-negative (bit 63 clear) and non-trivial
    assert(docs.filter($"native" < 0).count() == 0)
    assert(docs.select(countDistinct($"native")).as[Long].head() > 400)
  }

  test("simhash64 is registered and callable from SQL") {
    SimHash64.register(spark)
    Sources.documents(spark, sf).createOrReplaceTempView("docs_sql")
    val n = spark.sql(
      """SELECT count(DISTINCT simhash64(filter(split(lower(text), '[^a-z]+'),
        |  w -> w <> ''))) AS n FROM docs_sql""".stripMargin)
      .collect()(0).getLong(0)
    assert(n > 400)
  }
}
