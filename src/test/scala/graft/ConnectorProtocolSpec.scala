package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.connector._

/** The live-TCP at-least-once connector protocol, end to end: wire codec
  * byte-compatibility, the DSv2 `graft-connector` source's offset=por
  * contract, and the crash/restart replay — kill the query mid-stream,
  * restart on the same checkpoint, and prove the sender resumes at the
  * acked por, re-sending only the unflushed tail (reference:
  * machida/lib/wallaroo/experimental/connectors.py + the Frame layout in
  * connector_wire_messages.py).
  */
class ConnectorProtocolSpec extends AnyFunSuite with BeforeAndAfterEach {
  lazy val spark: SparkSession = GraftSession.configure(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")).getOrCreate()

  /** Sender threads started by the current test; teardown proves each one
    * actually terminated — a lingering reconnect loop is a test failure
    * HERE, not interference for whichever test runs next.
    */
  private val senderThreads = mutable.Buffer.empty[Thread]
  private def track(t: Thread): Thread = { senderThreads += t; t }

  override def afterEach(): Unit = {
    try {
      spark.streams.active.foreach(q => try q.stop() catch { case _: Throwable => () })
      val leaked = senderThreads.filter { t => t.join(15000); t.isAlive }
      assert(leaked.isEmpty,
        s"sender threads still alive after test: ${leaked.map(_.getName)}")
    } finally {
      senderThreads.clear()
      Delivered.rows.clear()
      super.afterEach()
    }
  }

  test("wire frames round-trip and match the reference byte layout") {
    val msgs: Seq[Wire.Msg] = Seq(
      Wire.Hello("0.0.1", "cookie", "prog", "inst"),
      Wire.Ok(100),
      Wire.ErrorMsg("boom"),
      Wire.Notify(7L, "s7", 42L),
      Wire.NotifyAck(success = true, 7L, 42L),
      Wire.Message(7L, 43L, 1234L, "k".getBytes, "hello".getBytes),
      Wire.Message(7L, 44L, 0L, null, "no key".getBytes),
      Wire.Ack(10, Seq(1L -> 12L, 2L -> 25L, 5L -> 501L)),
      Wire.Restart("127.0.0.1:5555"),
      Wire.Restart(null),
      Wire.Eos(7L))
    msgs.foreach { m =>
      val framed = Wire.encode(m)
      val len = java.nio.ByteBuffer.wrap(framed, 0, 4).getInt
      assert(len == framed.length - 4, s"length header for $m")
      val decoded = Wire.decode(framed.drop(4))
      (m, decoded) match { // Message carries arrays — compare by value
        case (a: Wire.Message, b: Wire.Message) =>
          assert(a.streamId == b.streamId && a.messageId == b.messageId &&
            a.eventTime == b.eventTime &&
            java.util.Arrays.equals(a.key, b.key) &&
            java.util.Arrays.equals(a.payload, b.payload), s"$m")
        case (a, b) => assert(a == b)
      }
    }
    // layouts pinned by the reference's own test vectors:
    // test_hello: Hello("a","b","c","d") payload is 12 bytes
    assert(Wire.encode(Wire.Hello("a", "b", "c", "d")).length == 4 + 1 + 12)
    // test_ack: 4+4 + n*(8+8) payload
    assert(Wire.encode(Wire.Ack(100, Seq(1L -> 2L))).length == 4 + 1 + 8 + 16)
    // test_notify: 8 + 2 + len + 8
    assert(Wire.encode(Wire.Notify(0L, "0", 1L)).length == 4 + 1 + 19)
    // frame tags, in _FRAME_TYPE_TUPLES order
    assert(Wire.encode(Wire.Ok(1))(4) == 1.toByte)
    assert(Wire.encode(Wire.Message(0, 0, 0, null, null))(4) == 5.toByte)
    assert(Wire.encode(Wire.Eos(0))(4) == 8.toByte)
  }

  /** All rows every micro-batch delivered, keyed by test run. */
  object Delivered {
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, String)]()
    def snapshot(): Vector[(Long, Long, String)] = {
      val it = rows.iterator(); val b = Vector.newBuilder[(Long, Long, String)]
      while (it.hasNext) b += it.next(); b.result()
    }
  }

  private def startQuery(ckpt: String, name: String) =
    spark.readStream.format("graft-connector")
      .option("port", "0").option("name", name).option("cookie", "secret")
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach { r =>
          Delivered.rows.add((r.getLong(0), r.getLong(1),
            new String(r.getAs[Array[Byte]]("value"), StandardCharsets.UTF_8)))
        }
      }
      .start()

  test("kill and restart mid-stream: sender resumes at the acked por, tail-only") {
    val n = 2000
    val records = (1 to n).map(i => s"rec-$i".getBytes(StandardCharsets.UTF_8))
    // ~1.5 ms/record so the kill lands mid-stream deterministically
    val source = new SeqSource(records) {
      override def next(): Option[(Array[Byte], Long)] = {
        Thread.sleep(1); super.next()
      }
    }
    val ckpt = Files.createTempDirectory("connector_ckpt").toString
    val porFile = Paths.get(ckpt, "sources", "0", "graft-connector-por.json")
    Delivered.rows.clear()

    val client = new AtLeastOnceClient(
      "localhost", () => ConnectorRegistry.port("resume_test").getOrElse(
        throw new java.io.IOException("listener not up")),
      "secret", "graft_app", "worker1", 7L, "stream7", source)

    val q1 = startQuery(ckpt, "resume_test")
    val clientThread = track(client.runInBackground())
    try {
      // wait until at least one batch COMMITTED (por persisted) mid-stream
      val deadline = System.currentTimeMillis + 60000
      def committedPor(): Long =
        if (Files.exists(porFile))
          ConnectorOffset.parse(new String(Files.readAllBytes(porFile),
            StandardCharsets.UTF_8)).pors.getOrElse(7L, -1L)
        else -1L
      while ((committedPor() < 100 || committedPor() > n - 500) &&
        System.currentTimeMillis < deadline) Thread.sleep(20)
      val k = committedPor()
      assert(k >= 100 && k <= n - 500, s"kill window missed: por=$k")
      q1.stop() // crash: server gone, client enters its reconnect loop
      val sentAtKill = client.sent.get

      val q2 = startQuery(ckpt, "resume_test")
      try {
        // client must finish: source exhausted AND final por acked
        clientThread.join(90000)
        assert(!clientThread.isAlive, "client did not finish (no final ack?)")
        q2.processAllAvailable()

        // complete: every record delivered at least once, content intact
        val got = Delivered.snapshot()
        val ids = got.map(_._2).toSet
        assert(ids == (1L to n.toLong).toSet,
          s"missing ${(1L to n.toLong).toSet.diff(ids).take(5)}...")
        got.foreach { case (sid, mid, payload) =>
          assert(sid == 7L && payload == s"rec-$mid")
        }

        // resume-at-por: some reconnect session was told to resume at a
        // committed position ≥ the por at kill — never from scratch
        val resets = source.resets.toArray(Array.empty[java.lang.Long]).map(_.longValue)
        assert(resets.head == Wire.PorUnknown,
          s"fresh stream must reset to U64-max sentinel, got ${resets.head}")
        val postKill = resets.drop(1)
        assert(postKill.nonEmpty && postKill.forall(p => p >= k && p <= n),
          s"post-kill resumes must be at the acked por ($k), got ${postKill.toSeq}")

        // tail-only replay: duplicates can only sit above the killed por,
        // and the client's total sends are first-pass + unflushed tail
        val dupIds = got.groupBy(_._2).filter(_._2.size > 1).keySet
        assert(dupIds.forall(_ > k),
          s"re-delivery below the acked por $k: ${dupIds.filter(_ <= k).take(5)}")
        val resent = client.sent.get - sentAtKill
        assert(resent <= (n - k) + 64,
          s"client re-sent $resent rows; tail after por $k is only ${n - k}")

        // final ack: the source learned the whole stream is durable
        assert(source.ackedPor.get == n.toLong)
      } finally q2.stop()
    } finally {
      client.stopped.set(true)
    }
  }

  test("two senders, two streams: independent por tracking on one listener") {
    val ckpt = Files.createTempDirectory("connector_ckpt3").toString
    Delivered.rows.clear()
    val q = startQuery(ckpt, "multi_test")
    val srcA = new SeqSource((1 to 300).map(i => s"a-$i".getBytes))
    val srcB = new SeqSource((1 to 150).map(i => s"b-$i".getBytes))
    def port() = ConnectorRegistry.port("multi_test").getOrElse(
      throw new java.io.IOException("listener not up"))
    val ca = new AtLeastOnceClient("localhost", () => port(), "secret",
      "app", "wA", 1L, "stream_a", srcA)
    val cb = new AtLeastOnceClient("localhost", () => port(), "secret",
      "app", "wB", 2L, "stream_b", srcB)
    try {
      val ta = track(ca.runInBackground()); val tb = track(cb.runInBackground())
      ta.join(60000); tb.join(60000)
      assert(!ta.isAlive && !tb.isAlive, "a sender missed its final ack")
      q.processAllAvailable()
      val got = Delivered.snapshot()
      val byStream = got.groupBy(_._1)
      assert(byStream(1L).map(_._2).toSet == (1L to 300L).toSet)
      assert(byStream(2L).map(_._2).toSet == (1L to 150L).toSet)
      byStream(1L).foreach { case (_, mid, v) => assert(v == s"a-$mid") }
      byStream(2L).foreach { case (_, mid, v) => assert(v == s"b-$mid") }
      // both streams' pors acked independently at their own frontiers
      assert(srcA.ackedPor.get == 300L && srcB.ackedPor.get == 150L)
      val porFile = Paths.get(ckpt, "sources", "0", "graft-connector-por.json")
      val pors = ConnectorOffset.parse(new String(
        Files.readAllBytes(porFile), StandardCharsets.UTF_8)).pors
      assert(pors == scala.collection.immutable.SortedMap(1L -> 300L, 2L -> 150L),
        s"persisted por map: $pors")
    } finally {
      ca.stopped.set(true); cb.stopped.set(true); q.stop()
    }
  }

  test("windowed app over the live connector: protocol event_time drives event-time windows") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ckpt = Files.createTempDirectory("connector_ckpt4").toString
    val n = 300
    // amount rides in the payload, event time in the protocol field —
    // one synthetic reading every 2s of event time
    val source = new SeqSource((1 to n).map(i => f"${i * 1.5}%.1f".getBytes))
    val client = new AtLeastOnceClient(
      "localhost", () => ConnectorRegistry.port("window_test").getOrElse(
        throw new java.io.IOException("listener not up")),
      "secret", "app", "w1", 3L, "readings", source,
      eventTimeOf = por => por * 2L)
    val q = spark.readStream.format("graft-connector")
      .option("port", "0").option("name", "window_test")
      .option("cookie", "secret")
      .load()
      .select(timestamp_seconds($"event_time").as("ts"),
        $"value".cast("string").cast("double").as("amount"))
      .groupBy(window($"ts", "60 seconds"))
      .agg(sum($"amount").as("total"), count(lit(1)).as("n"))
      .writeStream.format("memory").outputMode("complete")
      .queryName("connector_windows")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      val t = track(client.runInBackground())
      t.join(60000)
      assert(!t.isAlive, "sender did not finish")
      q.processAllAvailable()
      val got = spark.table("connector_windows")
        .select(unix_timestamp($"window.start").as("w"), $"total", $"n")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
        .sortBy(_._1)
      // oracle: reading i has event time 2i sec, amount 1.5i
      val expect = (1 to n).groupBy(i => (2L * i) / 60 * 60)
        .map { case (w, is) =>
          (w, is.map(i => (f"${i * 1.5}%.1f").toDouble).sum, is.size.toLong)
        }.toSeq.sortBy(_._1)
      assert(got.map(t3 => (t3._1, t3._3)).toSeq == expect.map(t3 => (t3._1, t3._3)),
        s"window row counts diverge:\n got=${got.toSeq}\n want=$expect")
      got.zip(expect).foreach { case ((w, total, _), (_, want, _)) =>
        assert(math.abs(total - want) < 1e-6, s"window $w: $total vs $want")
      }
    } finally { client.stopped.set(true); q.stop() }
  }

  test("union of two listeners: per-source ack indexing into the shared offset log") {
    // the documented scale path — N listeners union'd into one query —
    // gives each source its own sources/<idx> checkpoint; the durable-ack
    // flusher must pick ITS line out of the shared offsets file (idx 1
    // would silently read idx 0's pors if the indexing were wrong)
    val ckpt = Files.createTempDirectory("connector_ckpt5").toString
    Delivered.rows.clear()
    def src(name: String) = spark.readStream.format("graft-connector")
      .option("port", "0").option("name", name).option("cookie", "secret")
      .load()
    val q = src("union_a").union(src("union_b"))
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach { r =>
          Delivered.rows.add((r.getLong(0), r.getLong(1),
            new String(r.getAs[Array[Byte]]("value"), StandardCharsets.UTF_8)))
        }
      }
      .start()
    val sa = new SeqSource((1 to 200).map(i => s"a-$i".getBytes))
    val sb = new SeqSource((1 to 200).map(i => s"b-$i".getBytes))
    val ca = new AtLeastOnceClient("localhost",
      () => ConnectorRegistry.port("union_a").getOrElse(
        throw new java.io.IOException("a not up")),
      "secret", "app", "wA", 10L, "sa", sa)
    val cb = new AtLeastOnceClient("localhost",
      () => ConnectorRegistry.port("union_b").getOrElse(
        throw new java.io.IOException("b not up")),
      "secret", "app", "wB", 20L, "sb", sb)
    try {
      val ta = track(ca.runInBackground()); val tb = track(cb.runInBackground())
      ta.join(60000); tb.join(60000)
      // both senders got their final acks — i.e. BOTH sources' durable-ack
      // flushers found their own line in the shared offset log
      assert(!ta.isAlive && !tb.isAlive, "a union'd sender missed its final ack")
      assert(sa.ackedPor.get == 200L && sb.ackedPor.get == 200L)
      q.processAllAvailable()
      val got = Delivered.snapshot().groupBy(_._1)
      assert(got(10L).map(_._2).toSet == (1L to 200L).toSet)
      assert(got(20L).map(_._2).toSet == (1L to 200L).toSet)
      // each source persisted only ITS stream's por
      def pors(idx: Int) = ConnectorOffset.parse(new String(Files.readAllBytes(
        Paths.get(ckpt, "sources", idx.toString, "graft-connector-por.json")),
        StandardCharsets.UTF_8)).pors
      assert(pors(0) == scala.collection.immutable.SortedMap(10L -> 200L))
      assert(pors(1) == scala.collection.immutable.SortedMap(20L -> 200L))
    } finally {
      ca.stopped.set(true); cb.stopped.set(true); q.stop()
    }
  }

  test("replay timeout: a restart with no sender fails loud, not silent") {
    // at-least-once has a failure contract too: if a query restarts with
    // an uncommitted WAL batch and NO sender reconnects to re-send the
    // tail, the batch must fail with the protocol's explanation — never
    // hang forever or fabricate an empty batch (silent data loss).
    //
    // The WAL gap is constructed DETERMINISTICALLY: Spark writes a batch's
    // offsets-WAL entry before foreachBatch runs and its commit-log entry
    // only after it returns, so blocking foreachBatch on a latch and
    // stopping the query while blocked GUARANTEES an uncommitted batch
    // with data. (The previous form raced q1.stop() against the final
    // commit — if the commit won there was no gap and no exception.)
    val ckpt = Files.createTempDirectory("connector_ckpt6").toString
    Delivered.rows.clear()
    val gateArmed = new java.util.concurrent.atomic.AtomicBoolean(false)
    val inFlight = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    def start(timeoutMs: Int, gated: Boolean) =
      spark.readStream.format("graft-connector")
        .option("port", "0").option("name", "timeout_test")
        .option("cookie", "secret")
        .option("replayTimeoutMs", timeoutMs.toString)
        .load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = batch.collect()
          rows.foreach { r =>
            Delivered.rows.add((r.getLong(0), r.getLong(1), ""))
          }
          if (gated && rows.nonEmpty && Delivered.rows.size >= 50 &&
            gateArmed.compareAndSet(false, true)) {
            inFlight.countDown()
            release.await() // q1.stop() interrupts this → batch never commits
          }
        }
        .start()
    val source = new SeqSource((1 to 400).map(i => s"t-$i".getBytes))
    val client = new AtLeastOnceClient("localhost",
      () => ConnectorRegistry.port("timeout_test").getOrElse(
        throw new java.io.IOException("not up")),
      "secret", "app", "w1", 5L, "s5", source)
    val q1 = start(timeoutMs = 60000, gated = true)
    val t = track(client.runInBackground())
    try {
      assert(inFlight.await(60, java.util.concurrent.TimeUnit.SECONDS),
        "no non-empty batch reached the commit gate")
      client.stopped.set(true) // the sender is GONE for good
      t.join(10000)
      assert(!t.isAlive, "sender did not stop")
      q1.stop() // interrupts the gated batch → its WAL entry stays uncommitted

      val q2 = start(timeoutMs = 2000, gated = false)
      try {
        val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q2.processAllAvailable()
        }
        val msgs = Iterator.iterate(e: Throwable)(_.getCause)
          .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
          .mkString(" | ")
        assert(msgs.contains("re-send") || msgs.contains("replay"),
          s"want the replay-contract error, got: $msgs")
      } finally q2.stop()
    } finally {
      release.countDown()
      client.stopped.set(true)
    }
  }

  test("bad cookie is rejected with an Error frame") {
    val ckpt = Files.createTempDirectory("connector_ckpt2").toString
    val q = startQuery(ckpt, "cookie_test")
    try {
      val port = {
        val deadline = System.currentTimeMillis + 15000
        var p: Option[Int] = None
        while (p.isEmpty && System.currentTimeMillis < deadline) {
          p = ConnectorRegistry.port("cookie_test"); Thread.sleep(20)
        }
        p.getOrElse(fail("listener never registered"))
      }
      val s = new java.net.Socket("localhost", port)
      try {
        Wire.writeFrame(s.getOutputStream,
          Wire.Hello("0.0.1", "WRONG", "p", "i"))
        Wire.readFrame(s.getInputStream) match {
          case Some(Wire.ErrorMsg(m)) => assert(m.contains("cookie"))
          case other => fail(s"want Error frame, got $other")
        }
      } finally s.close()
    } finally q.stop()
  }
}
