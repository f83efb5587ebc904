package graft

import java.net.{DatagramPacket, DatagramSocket, InetAddress}
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import scala.collection.mutable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.sources._

/** Live-socket tests for the reference-connector adapters: UDP relay
  * source (connectors/udp_source), UDP sink (connectors/udp_sink), and
  * the object-store sink (connectors/s3_bucket_sink) over a `file:` tree
  * — the same Hadoop FS code path an `s3a://bucket` URI takes.
  */
class UdpConnectorSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.configure(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")).getOrCreate()

  private def sendUdp(port: Int, msgs: Seq[String]): Unit = {
    val sock = new DatagramSocket()
    try msgs.foreach { m =>
      val b = m.getBytes(StandardCharsets.UTF_8)
      sock.send(new DatagramPacket(b, b.length,
        InetAddress.getLoopbackAddress, port))
    } finally sock.close()
  }

  test("udp source: datagrams land via the relay and stream through") {
    val dir = Files.createTempDirectory("udp_land").toString
    val relay = UdpIngest.start(0, dir, flushEvery = 3)
    try {
      sendUdp(relay.port, Seq("evt:1", "evt:2", "evt:3"))
      // relay flushes at 3 messages (or 250 ms quiet); wait for the file
      val deadline = System.currentTimeMillis + 10000
      while (!Files.list(java.nio.file.Paths.get(dir)).findAny().isPresent &&
        System.currentTimeMillis < deadline) Thread.sleep(100)
      val q = UdpSourceConfig("udp_in", dir).load(spark)
        .writeStream.format("memory").queryName("udp_out").start()
      try {
        q.processAllAvailable()
        assert(spark.table("udp_out").collect().map(_.getString(0)).toSet ==
          Set("evt:1", "evt:2", "evt:3"))
        // late datagrams arrive in a later trigger — at-least-once tail
        sendUdp(relay.port, Seq("evt:4", "evt:5", "evt:6"))
        val d2 = System.currentTimeMillis + 10000
        while (spark.table("udp_out").count() < 6 &&
          System.currentTimeMillis < d2) {
          q.processAllAvailable(); Thread.sleep(100)
        }
        assert(spark.table("udp_out").count() == 6)
      } finally q.stop()
    } finally relay.close()
  }

  test("udp sink: one datagram per row arrives on a live socket") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val receiver = new DatagramSocket()
    receiver.setSoTimeout(500)
    val received = mutable.ArrayBuffer.empty[String]
    @volatile var running = true
    val reader = new Thread(() => {
      val p = new DatagramPacket(new Array[Byte](65536), 65536)
      while (running) {
        try {
          receiver.receive(p)
          received.synchronized(received += new String(
            p.getData, p.getOffset, p.getLength, StandardCharsets.UTF_8))
        } catch { case _: java.net.SocketTimeoutException => () }
      }
    })
    reader.setDaemon(true)
    reader.start()
    val in = MemoryStream[String]
    val q = UdpSinkConfig("localhost", receiver.getLocalPort)
      .start(in.toDF())
    try {
      in.addData("alert:7", "alert:9", "alert:11")
      q.processAllAvailable()
      val deadline = System.currentTimeMillis + 10000
      while (received.synchronized(received.size) < 3 &&
        System.currentTimeMillis < deadline) Thread.sleep(100)
      assert(received.synchronized(received.toSet) ==
        Set("alert:7", "alert:9", "alert:11"))
    } finally { q.stop(); running = false; receiver.close() }
  }

  test("object-store sink: rows PUT as keyed objects under the base uri") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val dir = Files.createTempDirectory("objstore").toString
    val ckpt = Files.createTempDirectory("objstore_ckpt").toString
    val in = MemoryStream[(String, String)]
    val q = ObjectStoreSinkConfig(s"file:$dir", ckpt)
      .start(in.toDF().toDF("key", "body"))
    try {
      in.addData(("docs/a.txt", "alpha"), ("docs/b.txt", "beta"),
        ("top.txt", "gamma"))
      q.processAllAvailable()
      def read(rel: String) =
        new String(Files.readAllBytes(java.nio.file.Paths.get(s"$dir/$rel")),
          StandardCharsets.UTF_8)
      assert(read("docs/a.txt") == "alpha")
      assert(read("docs/b.txt") == "beta")
      assert(read("top.txt") == "gamma")
      // same-key PUT overwrites — the idempotent-replay contract
      in.addData(("top.txt", "gamma2"))
      q.processAllAvailable()
      assert(read("top.txt") == "gamma2")
    } finally q.stop()
  }
}
