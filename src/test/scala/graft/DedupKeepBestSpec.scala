package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Graph}

/** Semantics + plan-shape guards for the round-8 additions: keep-best
  * survivor selection and the adjacency-intersection triangle path.
  */
class DedupKeepBestSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.configure(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")).getOrCreate()

  test("keep-best survivor: longest wins, ties break to lowest id, " +
      "singletons survive") {
    import spark.implicits._
    // clusters: {1,2,3} (3 longest), {10,11} (tie at 50 → keep 10), {99} solo
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val docs = Seq(
      (1L, 40L), (2L, 45L), (3L, 60L),
      (10L, 50L), (11L, 50L), (99L, 5L)).toDF("doc_id", "n_chars")
    val labels = Dedup.dupClusters(pairs).withColumnRenamed("id", "doc_id")
    val clustered = docs.join(labels, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce($"label", $"doc_id"))
    val best = clustered.groupBy($"cluster")
      .agg(max(struct($"n_chars", (-$"doc_id").as("_nid"))).as("_b"))
      .select(($"_b._nid" * -1).as("doc_id"))
    val kept = best.as[Long].collect().sorted
    assert(kept.toSeq == Seq(3L, 10L, 99L))
  }

  test("triangles shuffle path: adjacency-intersection plan has one " +
      "pair-producing join and no wedge-row closure join") {
    import spark.implicits._
    // 5-clique: 10 edges, C(5,3)=10 triangles; plus a pendant edge
    val und = (for (a <- 0L until 5L; b <- a + 1 until 5L) yield (a, b))
      .toDF("src", "dst").union(Seq((4L, 9L)).toDF("src", "dst"))
    val deg = und.select($"src".as("n"), $"dst")
      .union(und.select($"dst".as("n"), $"src"))
      .groupBy($"n").agg(count(lit(1)).as("deg"))
    val dirE = Graph.orientShuffle(und, deg, parts = 4)
    assert(Graph.countTrianglesShuffle(dirE) == 10L)
    // plan shape: the count is a single aggregate over ONE equi-join of
    // the re-exploded adjacency with itself — a second join (the old
    // wedge-closure probe) would mean the wedge stream materialized
    val adj = dirE.groupBy($"u").agg(collect_list($"v").as("nb"))
    val planned = adj.select($"u", explode($"nb").as("v"), $"nb".as("nbu"))
      .join(adj.select($"u".as("v"), $"nb".as("nbv")), Seq("v"))
      .select(sum(size(array_intersect($"nbu", $"nbv"))).as("t"))
    val plan = planned.queryExecution.executedPlan.toString
    val joins = "Join".r.findAllIn(plan).size
    assert(joins <= 2, s"expected a single join (saw $joins):\n${plan.take(900)}")
    assert(plan.contains("array_intersect"), plan.take(900))
  }

  test("triangles OHA fallback threshold is clone-scoped: the shared " +
      "session's conf is never mutated while the shuffle path runs, so a " +
      "concurrent TypedImperativeAggregate keeps planning hash-mode") {
    import spark.implicits._
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val before = spark.conf.get(key)
    assert(before != "128",
      "session threshold must differ from the scoped value for this test to observe a leak")
    // 40-clique: C(40,2)=780 edges, C(40,3)=9880 triangles — enough work
    // that the adjacency job spans many poll intervals
    val und = (for (a <- 0L until 40L; b <- a + 1 until 40L) yield (a, b))
      .toDF("src", "dst")
    val deg = und.select($"src".as("n"), $"dst")
      .union(und.select($"dst".as("n"), $"src"))
      .groupBy($"n").agg(count(lit(1)).as("deg"))
    val dirE = Graph.orientShuffle(und, deg, parts = 4)
    // poll the SHARED session's conf the whole time the triangles job runs:
    // the pre-clone implementation set it to 128 for the job's duration,
    // which any concurrent query on this session would read as its own
    // fallback threshold (sort-mode re-sorts on >128-group stages)
    @volatile var done = false
    @volatile var leaked: Option[String] = None
    val poller = new Thread(() => {
      while (!done) {
        val v = spark.conf.get(key)
        if (v != before) leaked = Some(v)
        Thread.sleep(1)
      }
    })
    poller.start()
    try assert(Graph.countTrianglesShuffle(dirE) == 9880L)
    finally { done = true; poller.join() }
    assert(leaked.isEmpty,
      s"shared-session fallback threshold mutated to $leaked during the triangles job")
    assert(spark.conf.get(key) == before)
  }
}
