package graft.sources.connector

import java.io.{DataOutputStream, IOException}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardOpenOption}

import org.apache.spark.sql.DataFrame

/** The OUTBOUND half of the connector wire protocol: the engine is the TCP
  * CLIENT, an external sink process the server, and every micro-batch is one
  * two-phase-commit transaction — the reference's ConnectorSink semantics
  * (lib/wallaroo/core/sink/connector_sink/connector_sink_twopc.pony,
  * validated against the aloc_sink source of truth at
  * testing/correctness/tests/aloc_sink/aloc_sink_impl.py):
  *
  *   engine → Hello, Notify(1, stream, por)        sink → Ok, NotifyAck
  *   engine → Message(0,…, ListUncommitted)        sink → ReplyUncommitted
  *   engine → Phase2(txn, commit/abort) per leftover txn   (recovery)
  *   engine → Message(1, offset, 0, ∅, bytes)*             (batch data)
  *   engine → Message(0,…, Phase1(txn, [(1,start,end)]))   sink → Reply
  *   engine → Message(0,…, Phase2(txn, commit))
  *
  * txn_id = `<stream>:c_id=<batchId>` (connector_sink_twopc.pony:64-65);
  * message_id is the output byte offset BEFORE each message and the
  * where_list carries [start, end) byte offsets (connector_sink.pony:1502).
  *
  * EXACTLY-ONCE is the composition of two write-ahead logs:
  *   - the sink's: phase-1 fsyncs output + txn state, abort truncates to
  *     start_por, reconnect truncates any un-voted tail;
  *   - the engine's (this class): an append-fsync'd txn log in the query's
  *     checkpoint-adjacent `txnLogDir`. The commit DECISION is logged
  *     BEFORE Phase2 ships, so every crash window replays deterministically:
  *       crash before Phase1        → sink truncates tail; batch re-sends
  *       crash before decision log  → recovery ABORTS txn; batch re-sends
  *       crash after decision log   → recovery RE-SENDS commit; batch skips
  *     A replayed Spark batch whose txn is already committed is skipped
  *     whole — the no-duplicates half of the guarantee. Requires the
  *     batch → bytes mapping be deterministic under replay, which Spark's
  *     replayable sources (file, kafka, memory) provide per batch id.
  *
  * One client = one connection = one "worker" in the reference topology.
  * At cluster scale you run one instance per output partition-group with
  * its own stream name and txn log, exactly like the reference runs one
  * connection per wallaroo worker; the protocol itself is single-stream.
  */
final class TwoPcSinkClient(host: String, port: Int, streamName: String,
    txnLogDir: Path, cookie: String = "", program: String = "graft",
    instance: String = "worker", replyTimeoutMs: Int = 15000)
    extends AutoCloseable {

  import Wire.TwoPc

  private val logPath = txnLogDir.resolve(s"txnlog-$streamName")
  Files.createDirectories(txnLogDir)

  // ---- engine-side txn log ------------------------------------------------
  // line format (append-only, space-separated, fsync per append):
  //   1 <txnId> <start> <end>      phase-1 sent for [start, end)
  //   2 <txnId> <commit|abort>     phase-2 DECISION (logged before send)
  private[connector] var phase1Ranges = Map.empty[String, (Long, Long)]
  private[connector] var decisions = Map.empty[String, Boolean]
  private[connector] var lastCommitted = 0L
  replayLog()

  private def replayLog(): Unit = {
    if (!Files.exists(logPath)) return
    import scala.jdk.CollectionConverters._
    Files.readAllLines(logPath, StandardCharsets.UTF_8).asScala
      .filter(_.nonEmpty).foreach { line =>
        line.split(" ") match {
          case Array("1", txn, s, e) =>
            phase1Ranges += txn -> (s.toLong, e.toLong)
          case Array("2", txn, d) =>
            val commit = d == "commit"
            decisions += txn -> commit
            if (commit) phase1Ranges.get(txn).foreach { case (_, e) =>
              lastCommitted = math.max(lastCommitted, e)
            }
          case _ => throw new IOException(s"bad txn log line: $line")
        }
      }
  }

  private def appendLog(line: String): Unit = {
    val ch = java.nio.channels.FileChannel.open(logPath,
      StandardOpenOption.CREATE, StandardOpenOption.WRITE,
      StandardOpenOption.APPEND)
    try {
      ch.write(java.nio.ByteBuffer.wrap(
        (line + "\n").getBytes(StandardCharsets.UTF_8)))
      ch.force(true) // the whole point: durable BEFORE the wire message
    } finally ch.close()
  }

  // ---- session ------------------------------------------------------------
  private var socket: Socket = _
  private var out: DataOutputStream = _
  private var in: java.io.DataInputStream = _
  private var rtagCounter = 1L
  // test hooks: simulate a crash at the two interesting points of the
  // commit window (see TwoPcSinkSpec) — production leaves them false
  @volatile private[graft] var crashAfterPhase1 = false
  @volatile private[graft] var crashAfterDecisionLog = false

  private def connected: Boolean =
    socket != null && socket.isConnected && !socket.isClosed

  /** Read frames until `pf` matches; tolerate interleaved acks/credits. */
  private def await[A](what: String)(pf: PartialFunction[Wire.Msg, A]): A = {
    val deadline = System.currentTimeMillis + replyTimeoutMs
    while (System.currentTimeMillis < deadline) {
      Wire.readFrame(in) match {
        case None => throw new IOException(s"sink closed while waiting for $what")
        case Some(m) if pf.isDefinedAt(m) => return pf(m)
        case Some(Wire.ErrorMsg(msg)) => throw new IOException(s"sink error: $msg")
        case Some(_: Wire.Restart) => throw new IOException("sink requested restart")
        case Some(_) => () // Ack / credit noise — fine
      }
    }
    throw new IOException(s"timed out waiting for $what")
  }

  private def send(m: Wire.Msg): Unit = Wire.writeFrame(out, m)

  /** Handshake + leftover-txn resolution; idempotent. On ANY I/O failure
    * the socket is torn down (see [[processBatch]]): `Socket.isConnected`
    * is sticky-true after the first connect, so a wedged or
    * desynchronized connection would otherwise pass the `connected` check
    * forever and no retry could ever re-run this recovery handshake.
    */
  private def ensureConnected(): Unit = {
    if (connected) return
    socket = new Socket()
    socket.connect(new InetSocketAddress(host, port), replyTimeoutMs)
    socket.setTcpNoDelay(true)
    socket.setSoTimeout(replyTimeoutMs)
    out = new DataOutputStream(socket.getOutputStream)
    in = new java.io.DataInputStream(socket.getInputStream)

    send(Wire.Hello("0.0.1", cookie, program, instance))
    await("Ok") { case m: Wire.Ok => m }
    send(Wire.Notify(1L, streamName, lastCommitted))
    val na = await("NotifyAck") { case m: Wire.NotifyAck => m }
    if (!na.success) throw new IOException("sink refused stream notify")
    // the reference engine ignores the sink's advertised por and trusts its
    // own accounting (connector_sink_external_connection.pony:131-134); we
    // do the same — our txn log is the commit truth.
    rtagCounter += 1
    send(TwoPc.carrier(TwoPc.ListUncommitted(rtagCounter)))
    val reply = await("ReplyUncommitted") {
      case m: Wire.Message if TwoPc.unwrap(m).exists(
        _.isInstanceOf[TwoPc.ReplyUncommitted]) =>
        TwoPc.unwrap(m).get.asInstanceOf[TwoPc.ReplyUncommitted]
    }
    // resolve leftovers: a txn whose commit decision made it to OUR durable
    // log commits (the sink just never heard phase 2); anything else aborts
    // — its Spark batch never committed engine-side and WILL replay.
    reply.txnIds.foreach { txn =>
      val commit = decisions.getOrElse(txn, false)
      if (!decisions.contains(txn)) {
        appendLog(s"2 $txn abort") // make the abort decision durable too
        decisions += txn -> false // and mirror it, like processBatch does —
        // else a second reconnect re-resolves and re-appends the same abort
      }
      send(TwoPc.carrier(TwoPc.Phase2(txn, commit)))
    }
  }

  /** Ship one micro-batch as one 2PC transaction. Returns the committed
    * [start, end) byte range, or None when the batch was already committed
    * in a previous incarnation (exactly-once replay skip).
    */
  def processBatch(batchId: Long, rows: Iterator[Array[Byte]]): Option[(Long, Long)] =
    try processBatchInner(batchId, rows)
    catch {
      case e: IOException =>
        // tear the session down so the NEXT attempt re-runs
        // ensureConnected's handshake + leftover-txn recovery — a
        // once-failed socket must never be reused (isConnected stays
        // true after the first connect, so `connected` can't detect a
        // desynchronized or half-dead session on its own)
        close()
        throw e
    }

  private def processBatchInner(batchId: Long, rows: Iterator[Array[Byte]]): Option[(Long, Long)] = {
    val txnId = s"$streamName:c_id=$batchId"
    // connect BEFORE the replay-skip check: recovery (leftover-txn phase 2
    // resolution) must reach the sink even when this batch itself is skipped
    ensureConnected()
    if (decisions.getOrElse(txnId, false)) return None // replayed + committed
    val start = lastCommitted
    var off = start
    rows.foreach { bytes =>
      send(Wire.Message(1L, off, 0L, null, bytes))
      off += bytes.length
    }
    appendLog(s"1 $txnId $start $off")
    phase1Ranges += txnId -> (start, off)
    send(TwoPc.carrier(TwoPc.Phase1(txnId, Seq((1L, start, off)))))
    val vote = await(s"TwoPCReply($txnId)") {
      case m: Wire.Message if TwoPc.unwrap(m).exists {
        case TwoPc.Reply(t, _) => t == txnId; case _ => false
      } => TwoPc.unwrap(m).get.asInstanceOf[TwoPc.Reply]
    }
    if (crashAfterPhase1) throw new IOException("test crash: after phase 1")
    if (!vote.commit) {
      appendLog(s"2 $txnId abort")
      decisions += txnId -> false
      send(TwoPc.carrier(TwoPc.Phase2(txnId, commit = false)))
      throw new IOException(s"sink voted rollback for $txnId; batch will replay")
    }
    appendLog(s"2 $txnId commit") // decision durable BEFORE the wire
    decisions += txnId -> true
    lastCommitted = off
    if (crashAfterDecisionLog) throw new IOException("test crash: after decision log")
    send(TwoPc.carrier(TwoPc.Phase2(txnId, commit = true)))
    Some((start, off))
  }

  override def close(): Unit = {
    if (socket != null) {
      try socket.close() catch { case _: IOException => () }
      socket = null
    }
  }
}

object TwoPcSink {
  /** foreachBatch adapter: serialize `bytesCol` (BinaryType) of each
    * micro-batch through `client` as one 2PC txn. `toLocalIterator` keeps
    * driver memory bounded to one partition; iteration order is the
    * batch's partition order, deterministic under replay for replayable
    * sources — the precondition the byte-offset accounting needs.
    *
    * Single-connection driver funnel: right for modest output volumes;
    * at scale use [[shardedForeachBatchWriter]].
    */
  def foreachBatchWriter(client: TwoPcSinkClient, bytesCol: String)
      : (DataFrame, Long) => Unit = { (df, batchId) =>
    import scala.jdk.CollectionConverters._
    val it = df.select(bytesCol).toLocalIterator().asScala
      .map(_.getAs[Array[Byte]](0))
    client.processBatch(batchId, it)
    ()
  }

  /** Executor-side client cache: ONE persistent connection per stream name
    * per JVM, exactly the reference's one-connection-per-worker topology
    * (connector_sink_twopc.pony — each wallaroo worker owns one sink
    * connection). Cached across micro-batches so the handshake +
    * leftover-txn recovery runs once per incarnation, not once per batch;
    * a client that hit an I/O error tears its socket down and re-runs
    * recovery on the next batch by itself.
    */
  private val shardClients =
    new java.util.concurrent.ConcurrentHashMap[String, TwoPcSinkClient]()

  /** Test/diagnostics hook: the live cached client for `stream`, if any. */
  private[graft] def cachedClient(stream: String): Option[TwoPcSinkClient] =
    Option(shardClients.get(stream))

  /** Test hook: simulate a whole-engine restart — close and drop every
    * cached client so the next batch builds fresh ones that replay their
    * durable txn logs.
    */
  private[graft] def resetClients(): Unit = {
    val it = shardClients.values().iterator()
    while (it.hasNext) { try it.next().close() catch { case _: Throwable => () } }
    shardClients.clear()
  }

  /** SHARDED 2PC sink — the scale form of [[foreachBatchWriter]]: the
    * batch is hash-partitioned on `partitionKeyCol` into `numPartitions`
    * output groups and each group ships over ITS OWN connection, stream
    * `<streamBase>-p<pid>`, with a per-partition txn log directory
    * `<txnLogRoot>/p<pid>` — N independent single-stream 2PC protocols,
    * which is exactly how the reference scales its connector sink (one
    * connection per worker, each with its own stream and txn ids). No
    * driver funnel: rows never leave the executors.
    *
    * Exactly-once holds PER STREAM by the same two-log composition as the
    * single client; a crash mid-batch leaves each partition either
    * committed (its replay skips) or aborted-and-resent (its replay
    * re-sends) independently.
    *
    * Determinism contract: `repartition(hash(partitionKeyCol))` +
    * `sortWithinPartitions(key, bytes)` make each partition's byte
    * sequence a pure function of the batch's ROW SET, so a replayed batch
    * re-produces each stream's exact bytes regardless of input
    * partitioning or task order. `numPartitions` must stay fixed across
    * restarts (like the reference's worker count); `txnLogRoot` must be
    * storage every executor can reach (shared fs / DFS).
    */
  def shardedForeachBatchWriter(host: String, port: Int, streamBase: String,
      txnLogRoot: String, bytesCol: String, partitionKeyCol: String,
      numPartitions: Int, cookie: String = "", replyTimeoutMs: Int = 15000)
      : (DataFrame, Long) => Unit = { (df, batchId) =>
    import org.apache.spark.sql.functions.col
    require(numPartitions >= 1, "shardedForeachBatchWriter: numPartitions >= 1")
    df.select(col(partitionKeyCol).as("_k"), col(bytesCol).as("_b"))
      .repartition(numPartitions, col("_k"))
      .sortWithinPartitions(col("_k"), col("_b"))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        if (it.hasNext) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val stream = s"$streamBase-p$pid"
          val client = shardClients.computeIfAbsent(stream, _ =>
            new TwoPcSinkClient(host, port, stream,
              java.nio.file.Paths.get(txnLogRoot, s"p$pid"), cookie,
              instance = stream, replyTimeoutMs = replyTimeoutMs))
          // one partition == one task per batch, but speculative retries
          // could race on the shared per-JVM client — serialize per client
          client.synchronized {
            client.processBatch(batchId, it.map(_.getAs[Array[Byte]]("_b")))
          }
        }
        ()
      }
  }
}
