package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Event
import graft.streaming.{MetricsCollector, StreamOps}

class MetricsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.configure(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")).getOrCreate()

  test("metrics collector reports per-query batches, rows and state") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val collector = MetricsCollector.attach(spark)
    try {
      val in = MemoryStream[Event]
      val counts = in.toDS().toDF()
        .groupBy($"event_type").agg(count(lit(1)).as("n"))
      val q = counts.writeStream.format("memory")
        .queryName("metrics_probe").outputMode("complete").start()
      try {
        in.addData(Event(1, 1, "a", 1.0, ""), Event(2, 1, "b", 2.0, ""))
        q.processAllAvailable()
        in.addData(Event(3, 2, "a", 3.0, ""))
        q.processAllAvailable()
        // listener events are delivered async — wait for both batches
        val deadline = System.currentTimeMillis() + 30000
        var s = collector.summary("metrics_probe")
        while (s.forall(_.totalInputRows < 3) &&
            System.currentTimeMillis() < deadline) {
          Thread.sleep(100)
          s = collector.summary("metrics_probe")
        }
        val sum = s.getOrElse(fail("no metrics reported"))
        assert(sum.totalInputRows == 3)
        assert(sum.nBatches >= 2)
        assert(sum.maxStateRows >= 2) // the two event_type groups
        assert(sum.maxBatchMs >= 0 && sum.meanBatchMs >= 0.0)
      } finally q.stop()
    } finally MetricsCollector.detach(spark, collector)
  }
}
