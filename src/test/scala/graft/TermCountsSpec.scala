package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.TermCounts
import graft.sources.Sources

class TermCountsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.configure(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")).getOrCreate()
  val sf = "/root/testdata/sf0.001"
  val terms = Seq("the", "data", "model")

  test("native term_counts matches the size/filter composition") {
    import spark.implicits._
    TermCounts.register(spark, terms)
    val toks = graft.functions.wordTokens($"text")
    val df = Sources.documents(spark, sf)
      .select($"doc_id", TermCounts.termCounts(toks).as("tc"),
        size(toks).cast("long").as("n_ref"),
        size(filter(toks, w => w === terms(0))).cast("long").as("t0_ref"),
        size(filter(toks, w => w === terms(1))).cast("long").as("t1_ref"),
        size(filter(toks, w => w === terms(2))).cast("long").as("t2_ref"))
    val bad = df.filter(
      $"tc.n" =!= $"n_ref" || $"tc.t0" =!= $"t0_ref" ||
        $"tc.t1" =!= $"t1_ref" || $"tc.t2" =!= $"t2_ref")
    assert(bad.count() == 0)
    // at least one query term actually occurs in the corpus
    assert(df.agg(sum($"tc.t0")).as[Long].head() > 0)
  }

  test("interpreted eval matches codegen output") {
    import spark.implicits._
    TermCounts.register(spark, terms)
    val texts = Seq("the data the model the", "", "data model",
      "nomatch words only").toDF("text")
    val rows = texts
      .select(TermCounts.termCounts(
        graft.functions.wordTokens(coalesce($"text", lit("")))).as("tc"))
      .select($"tc.n", $"tc.t0", $"tc.t1", $"tc.t2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.toSeq == Seq((5L, 3L, 1L, 1L), (0L, 0L, 0L, 0L),
      (2L, 0L, 1L, 1L), (3L, 0L, 0L, 0L)))
  }

  test("doGenCode compiles — no silent interpreted fallback") {
    import spark.implicits._
    TermCounts.register(spark, terms)
    // default confs MASK codegen bugs: Janino failures log an ERROR and
    // silently downgrade to interpreted eval (exactly what happened when
    // the reference-object type was a JVM binary name). Force both
    // expression and whole-stage codegen to THROW instead.
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val r = Seq("the data model the").toDF("text")
        .select(TermCounts.termCounts(
          graft.functions.wordTokens($"text")).as("tc"))
        .select($"tc.n", $"tc.t0", $"tc.t1", $"tc.t2").head()
      assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
        ((4L, 2L, 1L, 1L)))
    } finally {
      spark.conf.unset("spark.sql.codegen.factoryMode")
      spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("bm25 plan has no interpreted lambda in the hot path") {
    val df = graft.operators.Relevance.qBm25(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the only lambdas allowed are inside the single tokenize+term_counts
    // projection; no per-term size(filter(...)) expansion
    assert(!plan.contains("ArrayFilter"), plan.take(2000))
    val tcCount = "term_counts".r.findAllIn(
      plan.split("== Initial Plan ==").head).size
    assert(tcCount <= 1,
      s"term_counts must be computed once, found $tcCount:\n${plan.take(3000)}")
  }
}
