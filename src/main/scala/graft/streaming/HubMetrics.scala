package graft.streaming

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** The monitoring-hub BINARY metrics protocol — the wire format the
  * reference's metrics receiver actually consumes
  * (lib/wallaroo_labs/hub/hub_protocol.pony encoder,
  * lib/wallaroo_labs/hub/hub_decoder.pony decoder,
  * lib/wallaroo/core/metrics/metrics.pony reporter): big-endian frames
  * `u32 size | u8 type | body` with Connect(1), Join(2: topic
  * [+ worker]), Payload(3: event, topic, data); a metrics payload's data
  * is one length-headed record of four length-prefixed strings
  * (name, category, worker, pipeline), a u16 id, the 65-bin power-of-two
  * latency histogram, then min/max/period/period_ends_at as u64.
  *
  * [[HubMetricsEmitter]] speaks it live: per streaming progress event it
  * counts the batch latency into a per-query [[HubHistogram]] and every
  * `periodMs` ships one frame per query over TCP — Connect + Join on each
  * (re)connection, Payload per period, reconnect-on-broken-pipe like the
  * reference's ReconnectingMetricsSink. The JSON transport
  * ([[MetricsTransport]]/[[MetricsEmitter]]) remains the default; this is
  * the option a reference hub can decode.
  */
object HubProtocol {

  /** 65-bin next-power-of-two histogram, pony Histogram semantics:
    * bin index = 64 - clz(v) (0 → bin 0, 3 → bin 2, 2^k → bin k);
    * min starts at U64 max (-1 as a signed long), max at 0.
    */
  final class HubHistogram {
    val counts = new Array[Long](65)
    var min: Long = -1L // U64.max_value
    var max: Long = 0L
    def record(v: Long): Unit = {
      val idx = 64 - java.lang.Long.numberOfLeadingZeros(v)
      counts(idx) += 1
      if (java.lang.Long.compareUnsigned(v, min) < 0) min = v
      if (java.lang.Long.compareUnsigned(v, max) > 0) max = v
    }
    def total: Long = counts.sum
  }

  private def be(body: DataOutputStream => Unit): Array[Byte] = {
    val bo = new ByteArrayOutputStream()
    val o = new DataOutputStream(bo)
    body(o); o.flush(); bo.toByteArray
  }
  private def str(o: DataOutputStream, s: String): Unit = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    o.writeInt(b.length); o.write(b)
  }

  /** `u32 1 | u8 1` — HubMsgTypes.connect. */
  def connect(): Array[Byte] = be { o => o.writeInt(1); o.writeByte(1) }

  /** `u32 size | u8 2 | u32 len topic | u32 len worker` — the join frame
    * the engine sends for its metrics topic (HubProtocol.join_metrics).
    */
  def joinMetrics(topic: String, worker: String): Array[Byte] = be { o =>
    val t = topic.getBytes(StandardCharsets.UTF_8)
    val w = worker.getBytes(StandardCharsets.UTF_8)
    o.writeInt(1 + 4 + t.length + 4 + w.length)
    o.writeByte(2)
    o.writeInt(t.length); o.write(t)
    o.writeInt(w.length); o.write(w)
  }

  /** The metrics record that rides INSIDE a payload frame's data
    * (HubProtocol.metrics): `u32 size | 4 × (u32 len + str) | u16 id |
    * 65 × u64 bins | u64 min | u64 max | u64 period | u64 period_ends_at`.
    */
  def metricsData(name: String, category: String, worker: String,
      pipeline: String, id: Short, h: HubHistogram, period: Long,
      periodEndsAt: Long): Array[Byte] = be { o =>
    val n = name.getBytes(StandardCharsets.UTF_8)
    val c = category.getBytes(StandardCharsets.UTF_8)
    val w = worker.getBytes(StandardCharsets.UTF_8)
    val p = pipeline.getBytes(StandardCharsets.UTF_8)
    // Byte-exact parity with the reference encoder's size field
    // (hub_protocol.pony:107-108): the fixed tail is written as `64 * 11`
    // = 704 there, NOT the actual byte count (65*8 bins + 4*8 = 552+32).
    // Reference and graft decoders both ignore this field, but a strict
    // consumer validating sizes against reference-encoded frames sees
    // identical bytes this way.
    o.writeInt(4 + 4 + 4 + 4 + 2 + n.length + c.length + w.length +
      p.length + 64 * 11)
    o.writeInt(n.length); o.write(n)
    o.writeInt(c.length); o.write(c)
    o.writeInt(w.length); o.write(w)
    o.writeInt(p.length); o.write(p)
    o.writeShort(id)
    h.counts.foreach(o.writeLong)
    o.writeLong(h.min); o.writeLong(h.max)
    o.writeLong(period); o.writeLong(periodEndsAt)
  }

  /** `u32 size | u8 3 | u32 len event | u32 len topic | u32 len data`. */
  def payload(event: String, topic: String, data: Array[Byte]): Array[Byte] =
    be { o =>
      val e = event.getBytes(StandardCharsets.UTF_8)
      val t = topic.getBytes(StandardCharsets.UTF_8)
      o.writeInt(1 + e.length + t.length + data.length + 12)
      o.writeByte(3)
      o.writeInt(e.length); o.write(e)
      o.writeInt(t.length); o.write(t)
      o.writeInt(data.length); o.write(data)
    }
}

/** Streaming listener shipping hub-binary metric frames over TCP: batch
  * latency (ns) per query accumulates into a [[HubProtocol.HubHistogram]]
  * under the "start-to-end" category (the reference's pipeline-latency
  * category) and flushes every `periodMs`. Failures drop-and-count — the
  * metrics channel must never wedge the pipeline.
  */
final class HubMetricsEmitter(host: String, port: Int, appName: String,
    workerName: String, periodMs: Long = 2000L)
    extends StreamingQueryListener with AutoCloseable {

  val dropped = new java.util.concurrent.atomic.AtomicLong(0)
  private val topic = s"metrics:$appName"
  private var socket: Socket = _
  private var periodEndsAt = 0L
  private val hists =
    scala.collection.mutable.Map.empty[String, HubProtocol.HubHistogram]

  private def ensureConnected(): java.io.OutputStream = {
    if (socket == null || socket.isClosed) {
      socket = new Socket(host, port)
      val out = socket.getOutputStream
      out.write(HubProtocol.connect())
      out.write(HubProtocol.joinMetrics(topic, workerName))
      out.flush()
    }
    socket.getOutputStream
  }

  private def teardown(): Unit = {
    if (socket != null) { try socket.close() catch { case _: Throwable => () } }
    socket = null
  }

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
    flush() // ship the tail so short-lived queries still report

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
    synchronized {
      val p = e.progress
      val name = Option(p.name).getOrElse(p.id.toString)
      val durNs = Option(p.durationMs.get("triggerExecution"))
        .map(_.longValue).getOrElse(0L) * 1000000L
      hists.getOrElseUpdate(name, new HubProtocol.HubHistogram).record(durNs)
      val now = System.currentTimeMillis
      if (periodEndsAt == 0L) periodEndsAt = now + periodMs
      if (now >= periodEndsAt) { flush(); periodEndsAt = now + periodMs }
    }

  /** Send one payload frame per query histogram, then reset them. */
  def flush(): Unit = synchronized {
    if (hists.nonEmpty) {
      try {
        val out = ensureConnected()
        hists.foreach { case (name, h) =>
          val data = HubProtocol.metricsData(name, "start-to-end",
            workerName, name, 1.toShort, h, periodMs * 1000000L,
            System.currentTimeMillis * 1000000L)
          out.write(HubProtocol.payload("metrics", topic, data))
        }
        out.flush()
        hists.clear()
      } catch {
        case _: java.io.IOException =>
          teardown(); dropped.incrementAndGet(); hists.clear()
      }
    }
  }

  def close(): Unit = { flush(); teardown() }
}

object HubMetricsEmitter {
  def attach(spark: SparkSession, host: String, port: Int, appName: String,
      workerName: String, periodMs: Long = 2000L): HubMetricsEmitter = {
    val m = new HubMetricsEmitter(host, port, appName, workerName, periodMs)
    spark.streams.addListener(m)
    m
  }
  def detach(spark: SparkSession, m: HubMetricsEmitter): Unit = {
    spark.streams.removeListener(m)
    m.close()
  }
}
