package graft.sources.connector

import java.net.Socket
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger, AtomicLong}

/** Sender-side of the connector protocol — the Scala twin of the
  * reference's `BaseSource` + `AtLeastOnceSourceConnector`
  * (machida/lib/wallaroo/experimental/connectors.py): a resettable source
  * abstraction plus the reconnect/handshake/replay loop that makes the
  * stream at-least-once end-to-end against a [[ConnectorSourceProvider]]
  * listener (or the reference engine — the wire format is the same).
  */
trait ClientSource {
  /** Reset to position `pos`; [[Wire.PorUnknown]] = never processed →
    * reset to the beginning (the reference's U64-max contract).
    */
  def reset(pos: Long): Unit
  /** Current position — the por after the last value [[next]] returned. */
  def pointOfRef: Long
  /** Next (payload, por-after-it), or None when exhausted (→ EOS). */
  def next(): Option[(Array[Byte], Long)]
  /** The engine acked durably processing up to `por`. */
  def acked(por: Long): Unit = ()
}

/** In-memory resettable source over an indexed record list: por = count of
  * records sent (so resume-at-por is just an index seek). The shape of
  * the reference's FramedFileReader with records instead of byte spans.
  */
class SeqSource(records: IndexedSeq[Array[Byte]]) extends ClientSource {
  private var i = 0L
  val resets = new java.util.concurrent.CopyOnWriteArrayList[java.lang.Long]()
  val ackedPor = new AtomicLong(0L)
  def reset(pos: Long): Unit = {
    resets.add(pos)
    i = if (pos == Wire.PorUnknown) 0L else pos
  }
  def pointOfRef: Long = i
  def next(): Option[(Array[Byte], Long)] =
    if (i >= records.length) None
    else { val r = records(i.toInt); i += 1; Some((r, i)) }
  override def acked(por: Long): Unit = {
    var cur = ackedPor.get
    while (por > cur && !ackedPor.compareAndSet(cur, por)) cur = ackedPor.get
  }
}

/** Connect–handshake–stream loop for one stream. Each connection:
  * Hello → Ok(credits) → Notify(por) → NotifyAck(resume) → reset source to
  * resume → send Messages while credits last (Acks replenish credits and
  * advance the source's acked por). On a broken socket it reconnects and
  * replays from the last acked position — exactly the unflushed tail.
  * `run()` returns once the source is exhausted and the final por is acked.
  */
final class AtLeastOnceClient(host: String, portOf: () => Int, cookie: String,
    program: String, instance: String, streamId: Long, streamName: String,
    source: ClientSource, eventTimeOf: Long => Long = _ => 0L) {

  val sent = new AtomicInteger(0)
  val stopped = new AtomicBoolean(false)

  private def session(): Boolean = {
    val socket = new Socket(host, portOf())
    socket.setTcpNoDelay(true)
    val in = socket.getInputStream
    val out = socket.getOutputStream
    val credits = new java.util.concurrent.Semaphore(0)
    val lastAcked = new AtomicLong(-1L)
    val restart = new AtomicBoolean(false)
    def send(m: Wire.Msg): Unit = out.synchronized(Wire.writeFrame(out, m))
    try {
      send(Wire.Hello("0.0.1", cookie, program, instance))
      Wire.readFrame(in) match {
        case Some(Wire.Ok(c)) => credits.release(c)
        case other => throw new java.io.IOException(s"handshake failed: $other")
      }
      send(Wire.Notify(streamId, streamName, source.pointOfRef))
      val resumeAt = new AtomicLong(Wire.PorUnknown)
      val resumed = new java.util.concurrent.Semaphore(0)
      // reader: NotifyAck → reset; Ack → credits + acked por; Restart → bail
      val reader = new Thread(() => {
        try {
          var open = true
          while (open) Wire.readFrame(in) match {
            case None => open = false
            case Some(Wire.NotifyAck(true, sid, por)) if sid == streamId =>
              // the resume position IS an ack: the engine has durably
              // processed everything ≤ por. Without this, a sender that
              // reconnects AFTER the engine committed its final batch
              // would wait forever for an Ack frame that only flows on
              // NEW commits (none are coming — the stream is drained).
              if (por != Wire.PorUnknown) {
                source.acked(por); lastAcked.set(por)
              }
              resumeAt.set(por); resumed.release()
            case Some(Wire.NotifyAck(false, _, _)) => open = false
            case Some(Wire.Ack(c, acks)) =>
              credits.release(c)
              acks.foreach { case (sid, por) =>
                if (sid == streamId) { source.acked(por); lastAcked.set(por) }
              }
            case Some(_: Wire.Restart) => restart.set(true); open = false
            case Some(_) => ()
          }
        } catch { case _: java.io.IOException => () }
      }, s"connector-client-reader-$streamId")
      reader.setDaemon(true); reader.start()
      if (!resumed.tryAcquire(10, java.util.concurrent.TimeUnit.SECONDS))
        throw new java.io.IOException("no NotifyAck")
      source.reset(resumeAt.get)
      var exhausted = false
      while (!exhausted && !restart.get && !stopped.get) {
        if (credits.tryAcquire(1, java.util.concurrent.TimeUnit.SECONDS)) {
          source.next() match {
            case Some((payload, por)) =>
              send(Wire.Message(streamId, por, eventTimeOf(por), null, payload))
              sent.incrementAndGet()
            case None =>
              send(Wire.Eos(streamId))
              exhausted = true
          }
        }
      }
      if (exhausted) {
        // linger for the final ack so the engine's commit covers the tail
        val deadline = System.currentTimeMillis + 30000
        while (lastAcked.get < source.pointOfRef &&
          System.currentTimeMillis < deadline && !restart.get &&
          !stopped.get) Thread.sleep(25)
        lastAcked.get >= source.pointOfRef
      } else false
    } finally { try socket.close() catch { case _: Throwable => () } }
  }

  /** Reconnect loop until the whole source is sent and acked. */
  def run(): Unit = {
    var done = false
    while (!done && !stopped.get) {
      done =
        try session()
        catch { case _: java.io.IOException => false
                case _: InterruptedException => return }
      if (!done && !stopped.get) Thread.sleep(200)
    }
  }

  def runInBackground(): Thread = {
    val t = new Thread(() => run(), s"connector-client-$streamId")
    t.setDaemon(true); t.start(); t
  }
}
