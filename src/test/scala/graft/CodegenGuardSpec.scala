package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{AdjacentPairs, PairCombos, SimHash64, SimHashBits}

/** Forces every `doGenCode`-bearing native expression through BOTH
  * evaluation modes and compares: `CODEGEN_ONLY` + `fallback=false` makes
  * a Janino compile failure THROW, where the default confs log an ERROR
  * and silently downgrade to interpreted eval — the failure mode that hid
  * the TermCounts binary-name bug (its guard lives in TermCountsSpec).
  */
class CodegenGuardSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.configure(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")).getOrCreate()

  private def inMode[A](mode: String)(body: => A): A = {
    spark.conf.set("spark.sql.codegen.factoryMode", mode)
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try body
    finally {
      spark.conf.unset("spark.sql.codegen.factoryMode")
      spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("simhash64 / simhash_bits / adjacent_pairs compile and agree") {
    import spark.implicits._
    SimHash64.register(spark)
    SimHashBits.register(spark, bits = 60)
    AdjacentPairs.register(spark)
    val df = Seq(
      "the quick brown fox jumps over the lazy dog",
      "one token",
      "").toDF("text")
    def run() = df.select(
        split($"text", " ").as("toks"),
        transform(split($"text", " "), t => xxhash64(t)).as("hs"))
      .select(
        SimHash64.simhash64($"toks").as("sh"),
        SimHashBits.simhashBits($"hs").as("sb"),
        AdjacentPairs.pairs($"toks").as("ap"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[String](2).toList))
      .toSeq
    val generated = inMode("CODEGEN_ONLY")(run())
    val interpreted = inMode("NO_CODEGEN")(run())
    assert(generated == interpreted,
      s"codegen and interpreted eval diverge:\n g=$generated\n i=$interpreted")
    assert(generated.head._3.nonEmpty) // bigram list materialized
  }

  test("pair_combos compiles, agrees across modes, and matches the self-join") {
    import spark.implicits._
    PairCombos.register(spark)
    val df = Seq(
      (1L, Seq(3L, 5L, 9L, 11L)),
      (2L, Seq(7L)),
      (3L, Seq.empty[Long])).toDF("g", "ps")
    def run() = df.select($"g", explode(PairCombos.pairs($"ps")).as("pr"))
      .select($"g", $"pr.a", $"pr.b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val generated = inMode("CODEGEN_ONLY")(run())
    assert(generated == inMode("NO_CODEGEN")(run()))
    // semantic twin: the distinct self-join pair build
    val flat = df.select($"g", explode($"ps").as("p"))
    val joined = flat.as("x").join(flat.as("y"),
        col("x.g") === col("y.g") && col("x.p") < col("y.p"))
      .select(col("x.g"), col("x.p"), col("y.p"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(generated == joined, s"expr=$generated join=$joined")
    assert(generated.size == 6) // C(4,2) pairs for group 1, none elsewhere
  }

  test("pair_combos rejects over-wide arrays identically in both modes") {
    import spark.implicits._
    PairCombos.register(spark)
    // past MaxWidth the codegen'd int size arithmetic would overflow
    // negative while interpreted eval would grind on — both must fail
    // with the same clear error instead
    val wide = Seq(Tuple1((0L until (PairCombos.MaxWidth + 1).toLong).toArray))
      .toDF("ps")
    def run(): Unit =
      wide.select(PairCombos.pairs($"ps")).collect()
    Seq("CODEGEN_ONLY", "NO_CODEGEN").foreach { mode =>
      val e = intercept[Throwable](inMode(mode)(run()))
      val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
      assert(msgs.contains("pair_combos") && msgs.contains("max"),
        s"$mode: want the width-guard error, got: $msgs")
    }
  }
}
