package graft

import java.io.{BufferedReader, InputStreamReader}
import java.net.ServerSocket
import java.nio.file.Files
import scala.collection.mutable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{MetricsEmitter, MetricsTransport}

/** The metrics emit shape: every micro-batch progress ships as one JSON
  * line to a TCP receiver (the monitoring_hub connection shape) or an
  * append-only file; a dead receiver drops-and-counts, never throws.
  */
class MetricsEmitSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.configure(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")).getOrCreate()

  private def runTwoBatches(queryName: String): Unit = {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Long]
    val q = in.toDF().groupBy().count()
      .writeStream.format("memory").outputMode("complete")
      .queryName(queryName).start()
    try {
      in.addData(1L, 2L, 3L); q.processAllAvailable()
      in.addData(4L); q.processAllAvailable()
    } finally q.stop()
  }

  test("tcp transport ships one JSON line per micro-batch") {
    val server = new ServerSocket(0)
    val lines = mutable.ArrayBuffer.empty[String]
    val reader = new Thread(() => {
      try {
        val s = server.accept()
        val r = new BufferedReader(new InputStreamReader(s.getInputStream))
        var line = r.readLine()
        while (line != null) {
          lines.synchronized(lines += line)
          line = r.readLine()
        }
      } catch { case _: Exception => () }
    })
    reader.setDaemon(true)
    reader.start()
    val transport = MetricsTransport.tcp("localhost", server.getLocalPort)
    val emitter = MetricsEmitter.attach(spark, transport)
    try {
      runTwoBatches("metrics_tcp_q")
      val deadline = System.currentTimeMillis + 15000
      while (lines.synchronized(lines.count(_.contains("metrics_tcp_q"))) < 2 &&
        System.currentTimeMillis < deadline) Thread.sleep(100)
      val got = lines.synchronized(lines.filter(_.contains("metrics_tcp_q")))
      assert(got.size >= 2, s"want >=2 progress lines, got $lines")
      // snapshot shape: the monitoring-hub consumer's contract
      got.foreach { l =>
        assert(l.contains("\"batch_id\":") && l.contains("\"input_rows\":") &&
          l.contains("\"batch_ms\":") && l.contains("\"state_rows\":"), l)
      }
      // rows flow through: batches carried 3 then 1 input rows
      assert(got.exists(_.contains("\"input_rows\":3")), got)
      assert(emitter.dropped.get() == 0)
    } finally {
      MetricsEmitter.detach(spark, emitter)
      transport.close()
      server.close()
    }
  }

  test("tcp transport reconnects after the receiver breaks an established connection") {
    val server = new ServerSocket(0)
    val received = mutable.ArrayBuffer.empty[String]
    val conns = new java.util.concurrent.LinkedBlockingQueue[java.net.Socket]()
    val acceptor = new Thread(() => {
      try while (true) {
        val c = server.accept()
        conns.put(c)
        val rd = new Thread(() => {
          try {
            val r = new BufferedReader(new InputStreamReader(c.getInputStream))
            var line = r.readLine()
            while (line != null) {
              received.synchronized(received += line); line = r.readLine()
            }
          } catch { case _: Exception => () }
        })
        rd.setDaemon(true); rd.start()
      } catch { case _: Exception => () }
    })
    acceptor.setDaemon(true); acceptor.start()
    val t = MetricsTransport.tcp("localhost", server.getLocalPort)
    try {
      t.emit("before")
      val c1 = conns.poll(5, java.util.concurrent.TimeUnit.SECONDS)
      assert(c1 != null)
      val deadline0 = System.currentTimeMillis + 5000
      while (!received.synchronized(received.contains("before")) &&
        System.currentTimeMillis < deadline0) Thread.sleep(50)
      assert(received.synchronized(received.contains("before")))
      // receiver restart: RST the established connection. The local socket
      // never learns via isClosed — only a failed write reveals the break,
      // and emit must tear down + reconnect instead of wedging forever.
      c1.setSoLinger(true, 0); c1.close()
      var i = 0
      while (!received.synchronized(received.exists(_.startsWith("after"))) &&
        i < 100) {
        try t.emit(s"after$i")
        catch { case _: java.io.IOException => () } // the revealing write
        i += 1; Thread.sleep(50)
      }
      assert(received.synchronized(received.exists(_.startsWith("after"))),
        s"no post-break line delivered after $i emits: $received")
    } finally { t.close(); server.close() }
  }

  test("file transport appends JSONL; dead TCP receiver drops, not throws") {
    val path = Files.createTempDirectory("metrics").resolve("m.jsonl").toString
    val ft = MetricsTransport.file(path)
    val fileEmitter = MetricsEmitter.attach(spark, ft)
    // a transport pointed at a closed port must count drops, not wedge
    val deadPort = { val s = new ServerSocket(0); val p = s.getLocalPort; s.close(); p }
    val dead = MetricsTransport.tcp("localhost", deadPort)
    val deadEmitter = MetricsEmitter.attach(spark, dead)
    try {
      runTwoBatches("metrics_file_q")
      val deadline = System.currentTimeMillis + 15000
      def fileLines() =
        if (Files.exists(java.nio.file.Paths.get(path)))
          scala.jdk.CollectionConverters.ListHasAsScala(
            Files.readAllLines(java.nio.file.Paths.get(path))).asScala.toVector
            .filter(_.contains("metrics_file_q"))
        else Vector.empty
      while ((fileLines().size < 2 || deadEmitter.dropped.get() < 2) &&
        System.currentTimeMillis < deadline) Thread.sleep(100)
      assert(fileLines().size >= 2, fileLines())
      assert(deadEmitter.dropped.get() >= 2,
        "dead receiver must surface as dropped count")
    } finally {
      MetricsEmitter.detach(spark, fileEmitter)
      MetricsEmitter.detach(spark, deadEmitter)
      ft.close(); dead.close()
    }
  }
}
