package graft

import java.io.DataInputStream
import java.net.ServerSocket
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{HubMetricsEmitter, HubProtocol}

/** Hub BINARY protocol conformance: frames produced by [[HubProtocol]] /
  * [[HubMetricsEmitter]] are decoded here with an INDEPENDENT reader that
  * follows lib/wallaroo_labs/hub/hub_decoder.pony field-for-field — if a
  * reference hub parsed these bytes, it would see the same records.
  */
class HubMetricsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.configure(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")).getOrCreate()

  // --- the independent decoder (mirrors hub_decoder.pony) ---
  case class Frame(msgType: Int, body: Array[Byte])
  case class MetricsRec(name: String, category: String, worker: String,
      pipeline: String, id: Int, bins: Seq[Long], min: Long, max: Long,
      period: Long, periodEndsAt: Long)

  private def readFrame(in: DataInputStream): Frame = {
    val size = in.readInt()
    assert(size >= 1, s"bad frame size $size")
    val body = new Array[Byte](size - 1)
    val t = in.readUnsignedByte()
    in.readFully(body)
    Frame(t, body)
  }
  private def str(in: DataInputStream): String = {
    val n = in.readInt(); val b = new Array[Byte](n); in.readFully(b)
    new String(b, StandardCharsets.UTF_8)
  }
  private def decodePayload(body: Array[Byte]): (String, String, MetricsRec) = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(body))
    val event = str(in)
    val topic = str(in)
    val dataSize = in.readInt()
    val data = new Array[Byte](dataSize); in.readFully(data)
    val d = new DataInputStream(new java.io.ByteArrayInputStream(data))
    // The pony encoder writes the fixed histogram tail of the size field
    // as 64*11 = 704 (hub_protocol.pony:107-108) while actually emitting
    // 65*8 bins + 4*8 trailers = 552 bytes; its decoder ignores the
    // field. We mirror the reference bytes exactly, so check for THAT
    // arithmetic: headerSize overshoots the real payload (dataSize - 4)
    // by exactly 704 - 552 = 152.
    val headerSize = d.readInt()
    assert(headerSize == dataSize - 4 + 152,
      s"header size field $headerSize vs $dataSize")
    val rec = MetricsRec(str(d), str(d), str(d), str(d),
      d.readUnsignedShort(), Seq.fill(65)(d.readLong()),
      d.readLong(), d.readLong(), d.readLong(), d.readLong())
    assert(d.available() == 0, "trailing bytes after metrics record")
    (event, topic, rec)
  }

  test("frame byte layouts match the reference encoder arithmetic") {
    // connect: u32 1 | u8 1
    assert(HubProtocol.connect().toSeq == Seq[Byte](0, 0, 0, 1, 1))
    // join_metrics("t", "w"): size = 1 + 4+1 + 4+1 = 11
    val join = HubProtocol.joinMetrics("t", "w")
    assert(java.nio.ByteBuffer.wrap(join, 0, 4).getInt == 11)
    assert(join(4) == 2.toByte)
    // payload size = 1 + event + topic + data + 12 (size_of_sizes)
    val data = Array[Byte](9, 9, 9)
    val pay = HubProtocol.payload("metrics", "metrics:app", data)
    assert(java.nio.ByteBuffer.wrap(pay, 0, 4).getInt ==
      1 + 7 + 11 + 3 + 12)
    assert(pay(4) == 3.toByte)
    // histogram binning follows the pony CODE (64 - clz(v)): 3 → idx 2,
    // 4 and 5 → idx 3, 0 → idx 0. (The reference's doc comment claims
    // 4→bin 4, but its get_idx(4) = 3 — bytes beat comments.)
    val h = new HubProtocol.HubHistogram
    h.record(3L); h.record(4L); h.record(5L); h.record(0L)
    assert(h.counts(2) == 1 && h.counts(3) == 2 && h.counts(0) == 1)
    assert(h.min == 0L && h.max == 5L && h.total == 4L)
  }

  test("emitter ships decodable Connect/Join/Payload over a live socket") {
    val server = new ServerSocket(0)
    val frames = mutable.ArrayBuffer.empty[Frame]
    val reader = new Thread(() => {
      try {
        val s = server.accept()
        val in = new DataInputStream(s.getInputStream)
        // read OUTSIDE the lock: holding it across a blocking read would
        // deadlock the polling assertions
        while (true) { val f = readFrame(in); frames.synchronized(frames += f) }
      } catch { case _: Exception => () }
    })
    reader.setDaemon(true); reader.start()

    val emitter = HubMetricsEmitter.attach(spark, "localhost",
      server.getLocalPort, "graft_app", "worker1", periodMs = 1)
    try {
      import spark.implicits._
      implicit val sc = spark.sqlContext
      val in = MemoryStream[Long]
      val q = in.toDF().groupBy().count()
        .writeStream.format("memory").outputMode("complete")
        .queryName("hub_metrics_q").start()
      try {
        in.addData(1L, 2L, 3L); q.processAllAvailable()
        in.addData(4L); q.processAllAvailable()
      } finally q.stop()
      emitter.flush()
      val deadline = System.currentTimeMillis + 15000
      def payloads() = frames.synchronized(frames.filter(_.msgType == 3)).toVector
      while (payloads().isEmpty && System.currentTimeMillis < deadline)
        Thread.sleep(50)

      val all = frames.synchronized(frames.toVector)
      // session preamble: Connect then Join, exactly the hub handshake
      assert(all.head.msgType == 1, "first frame must be Connect")
      assert(all(1).msgType == 2, "second frame must be Join")
      val joinIn = new DataInputStream(new java.io.ByteArrayInputStream(all(1).body))
      assert(str(joinIn) == "metrics:graft_app" && str(joinIn) == "worker1")

      // payload: a reference hub would decode this to our query's record
      val decoded = payloads().map(f => decodePayload(f.body))
      decoded.foreach { case (event, topic, _) =>
        assert(event == "metrics" && topic == "metrics:graft_app")
      }
      val recs = decoded.map(_._3).filter(_.pipeline == "hub_metrics_q")
      assert(recs.nonEmpty, s"no record for the query in ${decoded.map(_._3.pipeline)}")
      recs.foreach { r =>
        assert(r.category == "start-to-end" && r.worker == "worker1")
        assert(r.bins.size == 65)
        assert(java.lang.Long.compareUnsigned(r.min, r.max) <= 0)
        assert(r.period > 0 && r.periodEndsAt > 0)
      }
      // every batch latency landed in some bin
      assert(recs.map(_.bins.sum).sum >= 2, "want >=2 batches histogrammed")
      assert(emitter.dropped.get == 0)
    } finally {
      HubMetricsEmitter.detach(spark, emitter)
      server.close()
    }
  }
}
