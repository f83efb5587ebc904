package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Past-the-gate graph evidence: the join-per-round shuffle formulations
  * (pageRankShuffle / labelPropShuffle / bfsLevelsShuffle) are
  * parity-TESTED on small graphs, but inside `Graph.EdgeGate` every bench
  * query takes the in-memory path — so the 1000-executor path had no
  * recorded perf data. This main builds a synthetic graph ABOVE the gate
  * (default 4M directed edges over 1M nodes, deterministic Knuth-hash
  * wiring) and times each shuffle algorithm end-to-end, printing one JSON
  * line for the round notes.
  *
  * Run: `sbt "runMain graft.GraphScaleBench [nEdges]"`.
  */
object GraphScaleBench {
  def main(args: Array[String]): Unit = {
    val nEdges = args.headOption.map(_.toLong).getOrElse(4000000L)
    val nNodes = math.max(nEdges / 4, 1L)
    val spark = GraftSession.local("graph-scale-bench")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    require(nEdges > Graph.EdgeGate,
      s"this bench exists to exercise the PAST-the-gate paths: " +
        s"nEdges=$nEdges must exceed EdgeGate=${Graph.EdgeGate}")
    // deterministic pseudo-random wiring (Knuth multiplicative hash), a
    // few heavy hubs via the modulo skew of id*2654435761
    val edges = spark.range(nEdges).select(
        pmod(col("id"), lit(nNodes)).as("src"),
        pmod(col("id") * lit(2654435761L) + lit(12345L), lit(nNodes)).as("dst"))
      .filter(col("src") =!= col("dst"))

    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // public entry points: the gate measures the edge count and falls
    // through to the shuffle formulations on its own — proving the
    // dispatch, not just the inner methods
    val (prRows, prSec) = time(Graph.pageRank(edges, "src", "dst", 3).count())
    val (lpRows, lpSec) =
      time(Graph.labelPropagation(edges, "src", "dst", 2).count())
    val (bfsRows, bfsSec) = time {
      val und = edges.select($"src", $"dst").distinct()
      val e = und.union(und.select($"dst".as("src"), $"src".as("dst")))
      val deg = e.groupBy($"src".as("node")).agg(count(lit(1)).as("deg"))
      val sources = deg
        .crossJoin(broadcast(deg.agg(max($"deg").as("max_deg"))))
        .filter($"deg" === $"max_deg").select($"node")
      Graph.bfsLevelsShuffle(e, sources, maxDepth = 3).count()
    }

    // triangles: the full past-the-gate chain (distributed degree-ordered
    // orientation + adjacency-intersection count) on the UNDIRECTED view
    val (triCount, triSec) = time {
      // the hash wiring alone closes ~no triangles; union n/3 deterministic
      // triples so the count proves the intersections actually fire
      val triples = spark.range(nNodes / 3).select((col("id") * 3).as("t"))
      val closing = triples.select($"t".as("src"), ($"t" + 1).as("dst"))
        .union(triples.select(($"t" + 1).as("src"), ($"t" + 2).as("dst")))
        .union(triples.select($"t".as("src"), ($"t" + 2).as("dst")))
      val und = edges.union(closing)
        .select(least($"src", $"dst").as("src"), greatest($"src", $"dst").as("dst"))
        .distinct()
      val deg = und.select($"src".as("n"), $"dst")
        .union(und.select($"dst".as("n"), $"src"))
        .groupBy($"n").agg(count(lit(1)).as("deg"))
      Graph.countTrianglesShuffle(Graph.orientShuffle(und, deg,
        spark.conf.get("spark.sql.shuffle.partitions").toInt))
    }

    println(
      s"""{"metric":"graph_scale","n_edges":$nEdges,"n_nodes":$nNodes,""" +
        s""""edge_gate":${Graph.EdgeGate},""" +
        s""""pagerank_sec":${f"$prSec%.1f"},"pagerank_rows":$prRows,""" +
        s""""label_prop_sec":${f"$lpSec%.1f"},"label_prop_rows":$lpRows,""" +
        s""""bfs_sec":${f"$bfsSec%.1f"},"bfs_rows":$bfsRows,""" +
        s""""triangles_sec":${f"$triSec%.1f"},"triangles":$triCount}""")
    spark.stop()
  }
}
