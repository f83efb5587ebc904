package graft.streaming

import java.net.Socket
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** External metrics reporting — the reference streams per-period metric
  * frames from every step to monitoring_hub over a TCP connection
  * (/root/reference/lib/wallaroo/core/metrics/metrics.pony,
  * monitoring_hub/). The Spark reading: [[MetricsCollector]] already
  * aggregates in-process; this emitter SHIPS each micro-batch progress as
  * one newline-framed JSON object to a pluggable transport (TCP socket =
  * the monitoring-hub shape, or an append-only file for a directory-queue
  * consumer). The listener runs on the streaming bus thread, so transport
  * failures are counted and dropped, never thrown — a dead metrics
  * receiver must not wedge the pipeline (the reference's metrics channel
  * is fire-and-forget for the same reason).
  */
trait MetricsTransport extends AutoCloseable {
  def emit(line: String): Unit
  def close(): Unit
}

object MetricsTransport {

  /** Newline-framed JSON over TCP — the monitoring_hub connection shape.
    * Connects lazily and reconnects once per emit after a failure. A remote
    * failure (receiver restart, RST) never flips `isClosed` on the LOCAL
    * socket, so a failed write must tear the connection down itself —
    * otherwise every later emit keeps throwing into a dead pipe forever.
    */
  def tcp(host: String, port: Int): MetricsTransport = new MetricsTransport {
    private var socket: Socket = _
    private var out: java.io.Writer = _
    private def connect(): Unit = {
      socket = new Socket(host, port)
      out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
        socket.getOutputStream, StandardCharsets.UTF_8))
    }
    private def teardown(): Unit = {
      if (socket != null) { try socket.close() catch { case _: Throwable => () } }
      socket = null; out = null
    }
    def emit(line: String): Unit = {
      if (socket == null || socket.isClosed) connect()
      try { out.write(line); out.write('\n'); out.flush() }
      catch { case e: java.io.IOException => teardown(); throw e }
    }
    def close(): Unit = if (socket != null) socket.close()
  }

  /** Append-only JSONL file (tail it like a directory-queue connector). */
  def file(path: String): MetricsTransport = new MetricsTransport {
    def emit(line: String): Unit =
      Files.writeString(Paths.get(path), line + "\n",
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    def close(): Unit = ()
  }
}

final class MetricsEmitter(transport: MetricsTransport)
    extends StreamingQueryListener {

  /** Emits dropped because the transport failed (visible to tests/ops). */
  val dropped = new AtomicLong(0)

  private def js(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val name = Option(p.name).getOrElse(p.id.toString)
    val duration = Option(p.durationMs.get("triggerExecution"))
      .map(_.longValue).getOrElse(0L)
    val state = Option(p.stateOperators).toSeq.flatten.map(_.numRowsTotal).sum
    // zero-duration/first batches report NaN or Infinity, which is not
    // valid JSON — a hub-style consumer's parser would reject the frame
    val rps = {
      val d = p.processedRowsPerSecond
      if (d.isNaN || d.isInfinite) 0.0 else d
    }
    val line =
      s"""{"query":${js(name)},"ts":${js(p.timestamp)},""" +
        s""""batch_id":${p.batchId},"input_rows":${p.numInputRows},""" +
        s""""rows_per_sec":$rps,""" +
        s""""batch_ms":$duration,"state_rows":$state}"""
    try transport.emit(line)
    catch { case _: java.io.IOException => dropped.incrementAndGet() }
  }
}

object MetricsEmitter {
  /** Attach an emitter shipping every micro-batch progress to `transport`. */
  def attach(spark: SparkSession, transport: MetricsTransport): MetricsEmitter = {
    val m = new MetricsEmitter(transport)
    spark.streams.addListener(m)
    m
  }

  def detach(spark: SparkSession, m: MetricsEmitter): Unit =
    spark.streams.removeListener(m)
}
