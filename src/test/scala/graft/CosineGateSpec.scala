package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.CosineGate

class CosineGateSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.configure(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")).getOrCreate()

  test("gate matches the rational threshold exactly around the boundary") {
    import spark.implicits._
    CosineGate.register(spark, 4, 5)
    // (dot, na, nb, expected dot/sqrt(na*nb) >= 4/5)
    val rows = Seq(
      (4L, 5L, 5L, true),   // 16*25 = 400 = 25*16 — exactly at threshold
      (3L, 5L, 5L, false),  // 9*25 = 225 < 400
      (5L, 5L, 5L, true),
      (79L, 98L, 100L, false), // 79²·25=156025 < 98·100·16=156800
      (80L, 100L, 100L, true))
    val got = rows.toDF("dot", "na", "nb", "want")
      .select($"want", CosineGate.gate(4, 5,
        $"dot".cast("decimal(38,0)"), $"na".cast("decimal(38,0)"),
        $"nb".cast("decimal(38,0)")).as("got"))
      .collect()
    got.foreach(r => assert(r.getBoolean(1) == r.getBoolean(0), r.toString))
  }

  test("gate stays exact where the DECIMAL(38,0) product form NULLs") {
    import spark.implicits._
    CosineGate.register(spark, 4, 5)
    val big = "1" + "0" * 19 // 10^19: dot² = 10^38 leaves decimal(38,0)
    val df = Seq((big, big, big)).toDF("d", "a", "b")
      .select($"d".cast("decimal(38,0)").as("dot"),
        $"a".cast("decimal(38,0)").as("na"),
        $"b".cast("decimal(38,0)").as("nb"))
    // ANSI on (Spark 4 default): the product form throws; ANSI off: it
    // NULLs and silently drops the pair — either way the query is wrong
    val naiveLost =
      try df.select(
        ($"dot" * $"dot" * 25 >= $"na" * $"nb" * 16).as("g")).head().isNullAt(0)
      catch { case e: Exception
          if e.getMessage.contains("NUMERIC_VALUE_OUT_OF_RANGE") => true }
    assert(naiveLost,
      "precondition: the decimal product form must overflow (NULL or throw)")
    val exact = df.select(
      CosineGate.gate(4, 5, $"dot", $"na", $"nb").as("g")).head()
    assert(exact.getBoolean(0), "cos = 1 >= 4/5 must survive any magnitude")
  }
}
