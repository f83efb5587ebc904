package graft

import java.io.{DataOutputStream, IOException}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.connector.{TwoPcSinkClient, TwoPcSink, Wire}
import Wire.TwoPc

/** In-process sink server speaking the connector-sink 2PC protocol with the
  * aloc_sink's semantics (testing/correctness/tests/aloc_sink/
  * aloc_sink_impl.py — the reference's stated source of truth): append
  * output per stream-1 message, vote on Phase1 (start must equal last
  * committed, end must not pass the output tell), truncate to start on
  * Phase2 abort, truncate the un-voted tail at Hello after a reconnect,
  * report uncommitted txns to ListUncommitted. State survives connection
  * drops (the "sink process" outlives engine crashes), which is exactly
  * what the crash-window tests need.
  */
final class MockAlocSink {
  private val server = new ServerSocket(0)
  val port: Int = server.getLocalPort

  // durable-ish sink state — survives engine disconnects
  private var output = Array.emptyByteArray
  @volatile var lastCommitted = 0L
  private var txnState = Map.empty[String, (Boolean, Long, Long)] // vote, start, end
  // fault injection
  @volatile var voteRollbackNext = false
  @volatile var dropAfterPhase1Reply = false
  val phase2Log = new scala.collection.mutable.ArrayBuffer[(String, Boolean)]

  def outputBytes: Array[Byte] = synchronized(output.take(lastCommitted.toInt))
  def uncommitted: Set[String] = synchronized(txnState.keySet)

  private val thread = new Thread(() => {
    try while (!server.isClosed) {
      val s = server.accept()
      try serve(s) catch { case _: IOException => () }
      finally s.close()
    } catch { case _: IOException => () }
  })
  thread.setDaemon(true)
  thread.start()

  private def serve(s: Socket): Unit = {
    s.setTcpNoDelay(true)
    val in = new java.io.DataInputStream(s.getInputStream)
    val out = new DataOutputStream(s.getOutputStream)
    def reply(m: Wire.Msg): Unit = Wire.writeFrame(out, m)
    var done = false
    while (!done) Wire.readFrame(in) match {
      case None => done = true
      case Some(m) => m match {
        case _: Wire.Hello =>
          synchronized {
            // reconnect truncation (aloc_sink_impl.py:322-344): a phase1-ok
            // txn keeps its bytes pending phase 2; anything else drops the
            // un-voted tail back to the last committed offset
            val keepTo = txnState.values.collectFirst {
              case (true, _, end) => end
            }.getOrElse(lastCommitted)
            output = output.take(keepTo.toInt)
          }
          reply(Wire.Ok(500))
        case Wire.Notify(sid, _, _) =>
          reply(Wire.NotifyAck(success = true, sid, synchronized(lastCommitted)))
        case msg: Wire.Message if msg.streamId == 0L =>
          TwoPc.unwrap(msg).get match {
            case TwoPc.ListUncommitted(rtag) =>
              reply(TwoPc.carrier(
                TwoPc.ReplyUncommitted(rtag, synchronized(txnState.keys.toSeq))))
            case TwoPc.Phase1(txn, wl) =>
              val (sid, start, end) = wl.head
              val vote = synchronized {
                val ok = sid == 1L && start == lastCommitted &&
                  start <= end && end <= output.length && !voteRollbackNext
                voteRollbackNext = false
                txnState += txn -> (ok, start, end)
                ok
              }
              reply(TwoPc.carrier(TwoPc.Reply(txn, vote)))
              if (dropAfterPhase1Reply) { dropAfterPhase1Reply = false; done = true }
            case TwoPc.Phase2(txn, commit) =>
              synchronized {
                txnState.get(txn).foreach { case (_, start, end) =>
                  if (commit) lastCommitted = end
                  else output = output.take(start.toInt)
                  txnState -= txn
                }
              }
              phase2Log.synchronized(phase2Log += ((txn, commit)))
            case other => throw new IOException(s"sink got $other")
          }
        case msg: Wire.Message =>
          synchronized {
            assert(msg.messageId == output.length,
              s"message_id ${msg.messageId} != output tell ${output.length}")
            output = output ++ msg.payload
          }
        case Wire.Eos(sid) =>
          reply(Wire.Ack(1, Seq((sid, synchronized(lastCommitted)))))
        case other => throw new IOException(s"sink got $other")
      }
    }
  }

  def close(): Unit = server.close()
}

class TwoPcSinkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.configure(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")).getOrCreate()

  private def bytes(s: String) = s.getBytes(StandardCharsets.UTF_8)

  /** Phase 2 is fire-and-forget on the wire (no reply by protocol), so
    * sink-side state trails processBatch's return by one in-flight frame —
    * poll briefly instead of asserting instantly. */
  private def awaitCond(label: String)(cond: => Boolean): Unit = {
    val deadline = System.currentTimeMillis + 5000
    while (!cond && System.currentTimeMillis < deadline) Thread.sleep(10)
    assert(cond, label)
  }

  test("2PC frame codec round-trips and uses the reference tags") {
    val msgs: Seq[TwoPc.TMsg] = Seq(
      TwoPc.ListUncommitted(77L),
      TwoPc.ReplyUncommitted(77L, Seq("s:c_id=1", "s:c_id=2")),
      TwoPc.Phase1("s:c_id=3", Seq((1L, 100L, 250L))),
      TwoPc.Reply("s:c_id=3", commit = true),
      TwoPc.Phase2("s:c_id=3", commit = false))
    msgs.foreach(m => assert(TwoPc.decode(TwoPc.encode(m)) == m, m))
    // tags per connector_wire_messages.py:784-789
    assert((TwoPc.encode(TwoPc.ListUncommitted(1)).head & 0xff) == 201)
    assert((TwoPc.encode(TwoPc.ReplyUncommitted(1, Nil)).head & 0xff) == 202)
    assert((TwoPc.encode(TwoPc.Phase1("t", Nil)).head & 0xff) == 203)
    assert((TwoPc.encode(TwoPc.Reply("t", true)).head & 0xff) == 204)
    assert((TwoPc.encode(TwoPc.Phase2("t", true)).head & 0xff) == 205)
    // TwoPCReply body layout: >H len | txn | 0x01
    val r = TwoPc.encode(TwoPc.Reply("ab", commit = true))
    assert(r.toSeq == Seq[Byte](204.toByte, 0, 2, 'a', 'b', 1))
  }

  test("happy path: each batch is one committed txn, output exactly once") {
    val sink = new MockAlocSink
    val dir = Files.createTempDirectory("twopc")
    val c = new TwoPcSinkClient("127.0.0.1", sink.port, "s1", dir)
    try {
      assert(c.processBatch(0L, Iterator(bytes("aa"), bytes("bbb"))) == Some((0L, 5L)))
      assert(c.processBatch(1L, Iterator(bytes("cccc"))) == Some((5L, 9L)))
      awaitCond("both txns committed") {
        new String(sink.outputBytes, StandardCharsets.UTF_8) == "aabbbcccc" &&
          sink.lastCommitted == 9L && sink.uncommitted.isEmpty
      }
      // replaying an already-committed batch is a no-op (exactly-once skip)
      assert(c.processBatch(1L, Iterator(bytes("cccc"))).isEmpty)
      assert(sink.lastCommitted == 9L)
    } finally { c.close(); sink.close() }
  }

  test("sink rollback vote: batch throws, retry lands exactly once") {
    val sink = new MockAlocSink
    val dir = Files.createTempDirectory("twopc")
    val c = new TwoPcSinkClient("127.0.0.1", sink.port, "s1", dir)
    try {
      c.processBatch(0L, Iterator(bytes("base.")))
      sink.voteRollbackNext = true
      intercept[IOException] { c.processBatch(1L, Iterator(bytes("retry."))) }
      // abort truncated the tail; the same batch replays clean
      assert(c.processBatch(1L, Iterator(bytes("retry."))) == Some((5L, 11L)))
      awaitCond("retry committed") {
        new String(sink.outputBytes, StandardCharsets.UTF_8) == "base.retry."
      }
    } finally { c.close(); sink.close() }
  }

  test("crash after phase 1: recovery aborts the txn, replay has no dups or loss") {
    val sink = new MockAlocSink
    val dir = Files.createTempDirectory("twopc")
    val c1 = new TwoPcSinkClient("127.0.0.1", sink.port, "s1", dir)
    c1.processBatch(0L, Iterator(bytes("one.")))
    c1.crashAfterPhase1 = true
    intercept[IOException] { c1.processBatch(1L, Iterator(bytes("two."))) }
    c1.close() // engine "crashed": txn s1:c_id=1 is phase1-ok at the sink
    assert(sink.uncommitted == Set("s1:c_id=1"))

    val c2 = new TwoPcSinkClient("127.0.0.1", sink.port, "s1", dir)
    try {
      // replayed batch: recovery (inside ensureConnected) must abort the
      // leftover txn first, then the same byte range re-sends
      assert(c2.processBatch(1L, Iterator(bytes("two."))) == Some((4L, 8L)))
      awaitCond("abort-then-resend committed exactly once") {
        new String(sink.outputBytes, StandardCharsets.UTF_8) == "one.two." &&
          sink.uncommitted.isEmpty
      }
      assert(sink.phase2Log.contains(("s1:c_id=1", false)))
    } finally { c2.close(); sink.close() }
  }

  test("same client instance survives an I/O failure: next call re-handshakes") {
    val sink = new MockAlocSink
    val dir = Files.createTempDirectory("twopc")
    val c = new TwoPcSinkClient("127.0.0.1", sink.port, "s1", dir)
    try {
      c.processBatch(0L, Iterator(bytes("one.")))
      c.crashAfterPhase1 = true
      intercept[IOException] { c.processBatch(1L, Iterator(bytes("two."))) }
      c.crashAfterPhase1 = false
      // the SAME instance must recover: the failed call tore its socket
      // down, so this retry re-runs ensureConnected's handshake AND the
      // leftover-txn resolution (Socket.isConnected is sticky-true, so
      // without the teardown the wedged session would be reused forever
      // and the phase1-ok leftover at the sink would never be aborted)
      assert(c.processBatch(1L, Iterator(bytes("two."))) == Some((4L, 8L)))
      awaitCond("abort-then-resend on one client, exactly once") {
        new String(sink.outputBytes, StandardCharsets.UTF_8) == "one.two." &&
          sink.uncommitted.isEmpty
      }
      assert(sink.phase2Log.synchronized(
        sink.phase2Log.contains(("s1:c_id=1", false))))
    } finally { c.close(); sink.close() }
  }

  test("crash after the commit decision is logged: recovery re-sends commit, replay skips") {
    val sink = new MockAlocSink
    val dir = Files.createTempDirectory("twopc")
    val c1 = new TwoPcSinkClient("127.0.0.1", sink.port, "s1", dir)
    c1.processBatch(0L, Iterator(bytes("one.")))
    c1.crashAfterDecisionLog = true
    intercept[IOException] { c1.processBatch(1L, Iterator(bytes("two."))) }
    c1.close() // decision=commit is durable engine-side; sink never heard it
    assert(sink.uncommitted == Set("s1:c_id=1"))
    assert(sink.lastCommitted == 4L)

    val c2 = new TwoPcSinkClient("127.0.0.1", sink.port, "s1", dir)
    try {
      // the replayed batch is already committed per the log → skipped whole;
      // but connecting first resolves the leftover txn as COMMIT
      assert(c2.processBatch(1L, Iterator(bytes("two."))).isEmpty)
      awaitCond("recovery re-sent the commit") {
        new String(sink.outputBytes, StandardCharsets.UTF_8) == "one.two." &&
          sink.phase2Log.synchronized(sink.phase2Log.contains(("s1:c_id=1", true)))
      }
      assert(c2.processBatch(2L, Iterator(bytes("three."))) == Some((8L, 14L)))
      awaitCond("next txn committed") {
        new String(sink.outputBytes, StandardCharsets.UTF_8) == "one.two.three."
      }
    } finally { c2.close(); sink.close() }
  }

  test("sink drops the connection after phase 1: next batch reconnects and recovers") {
    val sink = new MockAlocSink
    val dir = Files.createTempDirectory("twopc")
    val c = new TwoPcSinkClient("127.0.0.1", sink.port, "s1", dir)
    try {
      sink.dropAfterPhase1Reply = true
      // the vote arrives, then the socket dies: the commit decision IS
      // logged before the phase-2 send, which may or may not throw
      // depending on when TCP notices the peer close — both outcomes
      // converge: the decision is durable and replays as commit
      try c.processBatch(0L, Iterator(bytes("x."))) catch { case _: IOException => () }
      c.close()
      val c2 = new TwoPcSinkClient("127.0.0.1", sink.port, "s1", dir)
      assert(c2.processBatch(0L, Iterator(bytes("x."))).isEmpty)
      awaitCond("leftover txn resolved as commit") {
        new String(sink.outputBytes, StandardCharsets.UTF_8) == "x." &&
          sink.uncommitted.isEmpty
      }
      c2.close()
    } finally sink.close()
  }

  test("streaming end-to-end: mid-txn kill + restart from checkpoint, exactly once") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val sink = new MockAlocSink
    val dir = Files.createTempDirectory("twopc")
    val ckpt = Files.createTempDirectory("twopc-ckpt").toString
    val input = MemoryStream[String]

    val c1 = new TwoPcSinkClient("127.0.0.1", sink.port, "docs", dir)
    val q1 = input.toDS().select($"value".cast("binary").as("b")).writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(TwoPcSink.foreachBatchWriter(c1, "b"))
      .start()
    input.addData("alpha;", "beta;")
    q1.processAllAvailable()
    awaitCond("first batch committed") {
      new String(sink.outputBytes, StandardCharsets.UTF_8) == "alpha;beta;"
    }

    // kill mid-transaction: the next batch dies after phase 1, before the
    // commit decision — the classic torn window
    c1.crashAfterPhase1 = true
    input.addData("gamma;")
    intercept[Exception] { q1.processAllAvailable() }
    assert(!q1.isActive)
    c1.close()
    assert(sink.uncommitted.nonEmpty) // sink is left holding the vote

    // restart from the same checkpoint with a fresh client on the same txn
    // log: Spark replays the failed batch, recovery aborts the leftover
    // txn, and the bytes land exactly once
    val c2 = new TwoPcSinkClient("127.0.0.1", sink.port, "docs", dir)
    val q2 = input.toDS().select($"value".cast("binary").as("b")).writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(TwoPcSink.foreachBatchWriter(c2, "b"))
      .start()
    input.addData("delta;")
    q2.processAllAvailable()
    awaitCond("replayed + new batches committed exactly once") {
      new String(sink.outputBytes, StandardCharsets.UTF_8) ==
        "alpha;beta;gamma;delta;" && sink.uncommitted.isEmpty
    }
    q2.stop()
    c2.close()
    sink.close()
  }
}
