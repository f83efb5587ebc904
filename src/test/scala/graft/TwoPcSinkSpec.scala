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

  // durable-ish sink state — survives engine disconnects. Keyed by STREAM
  // NAME (one output log per stream; the sharded writer opens one stream
  // per output partition over its own connection, like one aloc_sink
  // instance per wallaroo worker). txn ids embed their stream
  // (`<stream>:c_id=N`), so the txn map stays flat.
  private var outputs = Map.empty[String, Array[Byte]]
  private var committed = Map.empty[String, Long]
  private var txnState = Map.empty[String, (Boolean, Long, Long)] // vote, start, end
  // fault injection
  @volatile var voteRollbackNext = false
  @volatile var dropAfterPhase1Reply = false
  val phase2Log = new scala.collection.mutable.ArrayBuffer[(String, Boolean)]

  private def streamOf(txn: String): String = txn.split(":c_id=").head
  /** No-arg accessors serve the single-stream tests: whatever one stream
    * the sink has seen (falling back to "s1" before any traffic). */
  private def soleStream: String = synchronized {
    val ks = outputs.keySet ++ committed.keySet
    if (ks.size == 1) ks.head else "s1"
  }
  def outputBytes: Array[Byte] = outputBytes(soleStream)
  def outputBytes(stream: String): Array[Byte] = synchronized(
    outputs.getOrElse(stream, Array.emptyByteArray)
      .take(committed.getOrElse(stream, 0L).toInt))
  def lastCommitted: Long = lastCommittedOf(soleStream)
  def lastCommittedOf(stream: String): Long =
    synchronized(committed.getOrElse(stream, 0L))
  def uncommitted: Set[String] = synchronized(txnState.keySet)

  private val thread = new Thread(() => {
    try while (!server.isClosed) {
      val s = server.accept()
      // thread per connection: the sharded writer's N partition clients
      // all hold their connections open concurrently
      val t = new Thread(() => {
        try serve(s) catch { case _: IOException => () }
        finally (try s.close() catch { case _: IOException => () })
      })
      t.setDaemon(true)
      t.start()
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
    var curStream: String = null // set by Notify; Messages target it
    while (!done) Wire.readFrame(in) match {
      case None => done = true
      case Some(m) => m match {
        case _: Wire.Hello =>
          reply(Wire.Ok(500))
        case Wire.Notify(sid, stream, _) =>
          curStream = stream
          synchronized {
            // reconnect truncation (aloc_sink_impl.py:322-344), per
            // stream: a phase1-ok txn keeps its bytes pending phase 2;
            // anything else drops the un-voted tail back to the last
            // committed offset
            val keepTo = txnState.collect {
              case (txn, (true, _, end)) if streamOf(txn) == stream => end
            }.maxOption.getOrElse(committed.getOrElse(stream, 0L))
            outputs += stream ->
              outputs.getOrElse(stream, Array.emptyByteArray).take(keepTo.toInt)
          }
          reply(Wire.NotifyAck(success = true, sid,
            synchronized(committed.getOrElse(stream, 0L))))
        case msg: Wire.Message if msg.streamId == 0L =>
          TwoPc.unwrap(msg).get match {
            case TwoPc.ListUncommitted(rtag) =>
              // per-connection stream scope, like one aloc_sink instance
              reply(TwoPc.carrier(TwoPc.ReplyUncommitted(rtag, synchronized(
                txnState.keys.filter(t => curStream == null ||
                  streamOf(t) == curStream).toSeq))))
            case TwoPc.Phase1(txn, wl) =>
              val (sid, start, end) = wl.head
              val vote = synchronized {
                val streamCommitted = committed.getOrElse(curStream, 0L)
                val tell = outputs.getOrElse(curStream, Array.emptyByteArray).length
                val ok = sid == 1L && start == streamCommitted &&
                  start <= end && end <= tell && !voteRollbackNext
                voteRollbackNext = false
                txnState += txn -> (ok, start, end)
                ok
              }
              reply(TwoPc.carrier(TwoPc.Reply(txn, vote)))
              if (dropAfterPhase1Reply) { dropAfterPhase1Reply = false; done = true }
            case TwoPc.Phase2(txn, commit) =>
              synchronized {
                txnState.get(txn).foreach { case (_, start, end) =>
                  val stream = streamOf(txn)
                  if (commit) committed += stream -> end
                  else outputs += stream ->
                    outputs.getOrElse(stream, Array.emptyByteArray).take(start.toInt)
                  txnState -= txn
                }
              }
              phase2Log.synchronized(phase2Log += ((txn, commit)))
            case other => throw new IOException(s"sink got $other")
          }
        case msg: Wire.Message =>
          synchronized {
            val cur = outputs.getOrElse(curStream, Array.emptyByteArray)
            assert(msg.messageId == cur.length,
              s"[$curStream] message_id ${msg.messageId} != output tell ${cur.length}")
            outputs += curStream -> (cur ++ msg.payload)
          }
        case Wire.Eos(sid) =>
          reply(Wire.Ack(1, Seq((sid,
            synchronized(committed.getOrElse(curStream, 0L))))))
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

  test("sharded sink: one connection per partition, mid-txn kill on one, exactly-once per stream") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val sink = new MockAlocSink
    val root = Files.createTempDirectory("twopc_shard")
    TwoPcSink.resetClients()
    def batch(tag: String) = spark.range(0, 40)
      .select($"id".as("k"),
        concat(lit(tag + "-"), $"id".cast("string"), lit("."))
          .cast("binary").as("b"))
    // expected per-stream bytes: replay the writer's deterministic
    // partitioning (hash(k) into 2, sorted by (k, b)) independently
    def expect(tag: String): Map[Int, Array[Byte]] =
      batch(tag).repartition(2, $"k").sortWithinPartitions($"k", $"b")
        .select($"b").rdd
        .mapPartitionsWithIndex { (pid, it) =>
          Iterator((pid, it.map(_.getAs[Array[Byte]](0))
            .foldLeft(Array.emptyByteArray)(_ ++ _)))
        }.collect().toMap
    val expA = expect("a"); val expB = expect("b")
    assert(expA(0).nonEmpty && expA(1).nonEmpty, "both partitions need rows")
    val writer = TwoPcSink.shardedForeachBatchWriter("127.0.0.1", sink.port,
      "shard", root.toString, "b", "k", numPartitions = 2)
    try {
      writer(batch("a"), 0L)
      awaitCond("batch 0 committed on both streams") {
        sink.outputBytes("shard-p0").sameElements(expA(0)) &&
          sink.outputBytes("shard-p1").sameElements(expA(1))
      }
      // mid-txn kill on ONE partition: p1's client crashes after its
      // phase-1 vote (decision never logged); p0 is untouched
      val p1 = TwoPcSink.cachedClient("shard-p1")
        .getOrElse(fail("no cached client for shard-p1"))
      p1.crashAfterPhase1 = true
      intercept[org.apache.spark.SparkException] { writer(batch("b"), 1L) }
      p1.crashAfterPhase1 = false
      // whole-engine restart: fresh clients must replay their per-
      // partition txn logs (p0 either committed batch 1 before the job
      // died — replay skips — or not — replay re-sends; p1 must abort
      // its leftover phase1-ok txn and re-send. Either way: exactly once
      // per stream.)
      TwoPcSink.resetClients()
      writer(batch("b"), 1L)
      awaitCond("batch 1 exactly once on both streams") {
        sink.outputBytes("shard-p0").sameElements(expA(0) ++ expB(0)) &&
          sink.outputBytes("shard-p1").sameElements(expA(1) ++ expB(1)) &&
          sink.uncommitted.isEmpty
      }
      // p1's crashed txn really went through the abort-then-recommit path
      assert(sink.phase2Log.synchronized(
        sink.phase2Log.contains(("shard-p1:c_id=1", false))))
      assert(sink.phase2Log.synchronized(
        sink.phase2Log.contains(("shard-p1:c_id=1", true))))
    } finally { TwoPcSink.resetClients(); sink.close() }
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

  test("sharded streaming: shards torn in DIFFERENT 2PC windows of the same " +
      "batch compose to whole-batch exactly-once across checkpoint restarts") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    implicit val sc = spark.sqlContext
    val sink = new MockAlocSink
    val root = Files.createTempDirectory("twopc_sstream")
    val ckpt = Files.createTempDirectory("twopc_sstream_ckpt").toString
    TwoPcSink.resetClients()
    val input = MemoryStream[(Long, String)]
    val P = 3

    def rows(tag: String): Seq[(Long, String)] =
      (0L until 30L).map(i => (i, s"$tag-$i."))
    // expected per-stream bytes: replay the writer's deterministic
    // partitioning (hash(k) into 3, sorted by (k, b)) independently
    def expect(tag: String): Map[Int, Array[Byte]] =
      rows(tag).toDF("k", "v").select($"k", $"v".cast("binary").as("b"))
        .repartition(P, $"k").sortWithinPartitions($"k", $"b")
        .select($"b").rdd
        .mapPartitionsWithIndex { (pid, it) =>
          Iterator((pid, it.map(_.getAs[Array[Byte]](0))
            .foldLeft(Array.emptyByteArray)(_ ++ _)))
        }.collect().toMap
    val expA = expect("a"); val expB = expect("b"); val expC = expect("c")
    assert((0 until P).forall(p => expA(p).nonEmpty && expB(p).nonEmpty),
      "every shard needs rows in every batch")

    def startQ() = input.toDS().toDF("k", "v")
      .select($"k", $"v".cast("binary").as("b"))
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch(TwoPcSink.shardedForeachBatchWriter("127.0.0.1",
        sink.port, "sstream", root.toString, "b", "k", numPartitions = P))
      .start()
    def client(p: Int): TwoPcSinkClient =
      TwoPcSink.cachedClient(s"sstream-p$p")
        .getOrElse(fail(s"no cached client for sstream-p$p"))
    def logLines(p: Int): Seq[String] = {
      val f = root.resolve(s"p$p").resolve(s"txnlog-sstream-p$p")
      if (Files.exists(f)) Files.readAllLines(f, StandardCharsets.UTF_8)
        .asScala.toSeq
      else Seq.empty
    }
    // durable proof each armed window actually fired for batch 1: an armed
    // client throws AT its window, so its log reaching that point while
    // armed means it died inside the window, never past it
    def p0TornPreDecision: Boolean =
      logLines(0).exists(_.startsWith("1 sstream-p0:c_id=1 ")) &&
        !logLines(0).contains("2 sstream-p0:c_id=1 commit")
    def p2TornPostDecision: Boolean =
      logLines(2).contains("2 sstream-p2:c_id=1 commit")

    try {
      val q1 = startQ()
      input.addData(rows("a"): _*)
      q1.processAllAvailable()
      awaitCond("batch 0 committed on all shards") {
        (0 until P).forall(p =>
          sink.outputBytes(s"sstream-p$p").sameElements(expA(p)))
      }
      // arm BOTH torn windows for the SAME batch: p0 dies after its
      // phase-1 vote (pre-decision), p2 dies right after its commit
      // decision is durably logged but before phase 2 reaches the sink
      // (post-decision). p1 is untouched. The per-stream clients are
      // cached per JVM, so the armed flags survive query restarts.
      client(0).crashAfterPhase1 = true
      client(2).crashAfterDecisionLog = true
      input.addData(rows("b"): _*)
      intercept[Exception] { q1.processAllAvailable() }
      assert(!q1.isActive)

      // The first thrower fails the job and Spark may cancel the OTHER
      // armed shard before it reaches its own window. Keep restarting from
      // the checkpoint (Spark replays batch 1) with the unexercised hooks
      // still armed, disarming each as its durable txn log proves it fired
      // — each restart exercises at least one armed window, so this takes
      // at most 2 failing attempts before the clean pass.
      var attempts = 0
      var clean = false
      var p0Fired = false // once p0 recovers, its log gains a commit line,
      var p2Fired = false // so remember tear evidence when first observed
      while (!clean) {
        attempts += 1
        assert(attempts <= 5, "torn windows never exercised")
        if (!p0Fired && p0TornPreDecision) {
          p0Fired = true; client(0).crashAfterPhase1 = false
        }
        if (!p2Fired && p2TornPostDecision) {
          p2Fired = true; client(2).crashAfterDecisionLog = false
        }
        val armed =
          client(0).crashAfterPhase1 || client(2).crashAfterDecisionLog
        val q = startQ()
        if (armed) {
          intercept[Exception] { q.processAllAvailable() }
          assert(!q.isActive)
        } else {
          q.processAllAvailable()
          awaitCond("replayed batch 1 exactly once on every shard") {
            (0 until P).forall(p => sink.outputBytes(s"sstream-p$p")
              .sameElements(expA(p) ++ expB(p))) && sink.uncommitted.isEmpty
          }
          // stream continues normally past the recovered batch
          input.addData(rows("c"): _*)
          q.processAllAvailable()
          awaitCond("batch 2 committed on every shard") {
            (0 until P).forall(p => sink.outputBytes(s"sstream-p$p")
              .sameElements(expA(p) ++ expB(p) ++ expC(p)))
          }
          q.stop()
          clean = true
        }
      }
      // both windows were genuinely exercised on batch 1 …
      assert(p0Fired && p2Fired)
      // … and recovered through the right phase-2 paths: p0's leftover
      // phase-1 txn aborted then re-sent + committed; p2's logged decision
      // re-sent as commit with NO abort ever issued for it
      sink.phase2Log.synchronized {
        assert(sink.phase2Log.contains(("sstream-p0:c_id=1", false)))
        assert(sink.phase2Log.contains(("sstream-p0:c_id=1", true)))
        assert(sink.phase2Log.contains(("sstream-p2:c_id=1", true)))
        assert(!sink.phase2Log.contains(("sstream-p2:c_id=1", false)))
      }
      // the commit decision for the post-decision shard is durable exactly
      // once — replays re-SEND phase 2, they never re-DECIDE
      assert(logLines(2).count(_ == "2 sstream-p2:c_id=1 commit") == 1)
    } finally { TwoPcSink.resetClients(); sink.close() }
  }
}
