package graft.streaming

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Pipeline metrics — the reference's computation/pipeline throughput-and-
  * latency reporting (metrics channel in
  * /root/reference/lib/wallaroo/core/metrics/metrics.pony:1, wired into
  * every step) re-expressed Spark-first: a [[StreamingQueryListener]]
  * aggregating per-query micro-batch progress. No custom
  * instrumentation inside operators — Structured Streaming already
  * measures rows, rates and durations per batch; this collects and
  * summarizes them per query, the role wallaroo's metrics receiver plays.
  *
  * Thread-safety: listener callbacks arrive on the streaming bus thread
  * while readers poll from test/driver threads — samples go into a
  * concurrent map of per-query buffers, summaries are computed on read.
  */
final class MetricsCollector extends StreamingQueryListener {
  import MetricsCollector.{BatchSample, QuerySummary}

  private val samples = TrieMap.empty[String, ArrayBuffer[BatchSample]]

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val name = Option(p.name).getOrElse(p.id.toString)
    val duration = Option(p.durationMs.get("triggerExecution"))
      .map(_.longValue).getOrElse(0L)
    val state = Option(p.stateOperators).toSeq.flatten
      .map(_.numRowsTotal).sum
    val wm = Option(p.eventTime).map(_.get("watermark")).flatMap(Option(_))
      .getOrElse("")
    val buf = samples.getOrElseUpdate(name, ArrayBuffer.empty)
    buf.synchronized {
      buf += BatchSample(p.batchId, p.numInputRows,
        p.processedRowsPerSecond, duration, state, wm)
    }
  }

  /** Summaries for every query that has reported at least one batch. */
  def report(): Seq[QuerySummary] =
    samples.toSeq.sortBy(_._1).map { case (name, buf) =>
      val snap = buf.synchronized(buf.toVector)
      QuerySummary(
        name,
        nBatches = snap.size.toLong,
        totalInputRows = snap.map(_.inputRows).sum,
        maxStateRows = if (snap.isEmpty) 0L else snap.map(_.stateRows).max,
        meanBatchMs =
          if (snap.isEmpty) 0.0
          else snap.map(_.batchDurationMs).sum.toDouble / snap.size,
        maxBatchMs = if (snap.isEmpty) 0L else snap.map(_.batchDurationMs).max,
        lastWatermark = snap.reverseIterator
          .map(_.watermark).find(_.nonEmpty).getOrElse(""))
    }

  def summary(name: String): Option[QuerySummary] =
    report().find(_.name == name)
}

object MetricsCollector {
  // companion scope (not class-nested): pattern matches on these are
  // exact — no unverifiable outer-instance reference in the type test
  final case class BatchSample(
      batchId: Long,
      inputRows: Long,
      processedRowsPerSec: Double,
      batchDurationMs: Long,
      stateRows: Long,
      watermark: String)

  final case class QuerySummary(
      name: String,
      nBatches: Long,
      totalInputRows: Long,
      maxStateRows: Long,
      meanBatchMs: Double,
      maxBatchMs: Long,
      lastWatermark: String)

  /** Attach a fresh collector to the session's streams. */
  def attach(spark: SparkSession): MetricsCollector = {
    val c = new MetricsCollector
    spark.streams.addListener(c)
    c
  }

  def detach(spark: SparkSession, c: MetricsCollector): Unit =
    spark.streams.removeListener(c)
}
