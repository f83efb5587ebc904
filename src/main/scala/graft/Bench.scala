package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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
    // optional comma-separated query filter for targeted timing runs
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.filter { case (n, _) =>
      only.forall(_.contains(n))
    }
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err = try { fn(spark, sfDir).count(); None } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
          Some(e.getClass.getSimpleName)
      }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    // a failed query reports -1 (never a fake-fast wall time) + an errors row
    val qs = results.map { case (k, v, err) =>
      s"\"" + k + "\":" + (if (err.isDefined) "-1" else v.toString)
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => s"\"$k: $e\"" }
      .mkString("[", ",", "]")
    val total = results.filter(_._3.isEmpty).map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
