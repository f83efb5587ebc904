package graft.sources.connector

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream, EOFException, InputStream, OutputStream}
import java.nio.charset.StandardCharsets

/** The connector wire protocol — binary frame codec for the at-least-once
  * source handshake the reference engine speaks with external senders
  * (machida/lib/wallaroo/experimental/connector_wire_messages.py): each
  * frame is a 4-byte big-endian length header (payload length + 1) followed
  * by a 1-byte frame tag and the payload. The session shape:
  *
  *   sender → Hello(version, cookie, program, instance)
  *   engine → Ok(initial_credits) | Error(msg)
  *   sender → Notify(stream_id, stream_name, point_of_ref)
  *   engine → NotifyAck(success, stream_id, resume_point_of_ref)
  *   sender → Message(stream_id, message_id=por, event_time, key, payload)*
  *   engine → Ack(credit_replenish, [(stream_id, acked_por)])  (async)
  *   sender → EosMessage(stream_id) when a stream ends
  *   engine → Restart(addr) to force a reconnect (e.g. before shutdown)
  *
  * `point_of_ref` is the sender's own replayable position (byte offset,
  * sequence number, …); `message_id` carries the por AFTER the message, so
  * an engine ack of por P means "everything up to P is durable — on
  * reconnect, reset to P and re-send only the tail". [[Wire.PorUnknown]]
  * (U64 max, -1 as a signed long) in a NotifyAck means the engine has
  * never processed this stream: the sender resets to its beginning.
  *
  * All integers are big-endian; U64 fields ride in signed Longs with
  * identical bit patterns (only PorUnknown exercises the sign bit).
  */
object Wire {

  /** U64.max_value — "no position known" sentinel, per the reference. */
  val PorUnknown: Long = -1L

  sealed trait Msg
  final case class Hello(version: String, cookie: String,
      program: String, instance: String) extends Msg
  final case class Ok(initialCredits: Int) extends Msg
  final case class ErrorMsg(message: String) extends Msg
  final case class Notify(streamId: Long, streamName: String,
      pointOfRef: Long) extends Msg
  final case class NotifyAck(success: Boolean, streamId: Long,
      pointOfRef: Long) extends Msg
  final case class Message(streamId: Long, messageId: Long, eventTime: Long,
      key: Array[Byte], payload: Array[Byte]) extends Msg
  final case class Ack(credits: Int, acks: Seq[(Long, Long)]) extends Msg
  final case class Restart(address: String) extends Msg
  final case class Eos(streamId: Long) extends Msg

  private def shortStr(o: DataOutputStream, s: Array[Byte]): Unit = {
    o.writeShort(s.length); o.write(s)
  }
  private def utf8(s: String): Array[Byte] =
    s.getBytes(StandardCharsets.UTF_8)
  private def readShortBytes(i: DataInputStream): Array[Byte] = {
    val n = i.readUnsignedShort()
    val b = new Array[Byte](n); i.readFully(b); b
  }

  private def payload(m: Msg): Array[Byte] = {
    val bo = new ByteArrayOutputStream()
    val o = new DataOutputStream(bo)
    m match {
      case Hello(v, c, p, i) =>
        shortStr(o, utf8(v)); shortStr(o, utf8(c))
        shortStr(o, utf8(p)); shortStr(o, utf8(i))
      case Ok(cr) => o.writeInt(cr)
      case ErrorMsg(msg) => shortStr(o, utf8(msg))
      case Notify(sid, name, por) =>
        o.writeLong(sid); shortStr(o, utf8(name)); o.writeLong(por)
      case NotifyAck(ok, sid, por) =>
        o.writeBoolean(ok); o.writeLong(sid); o.writeLong(por)
      case Message(sid, mid, et, key, body) =>
        o.writeLong(sid); o.writeLong(mid); o.writeLong(et)
        shortStr(o, if (key == null) Array.emptyByteArray else key)
        if (body != null) o.write(body)
      case Ack(cr, acks) =>
        o.writeInt(cr); o.writeInt(acks.size)
        acks.foreach { case (sid, por) => o.writeLong(sid); o.writeLong(por) }
      case Restart(addr) =>
        if (addr == null || addr.isEmpty) o.writeInt(0)
        else { val b = utf8(addr); o.writeInt(b.length); o.write(b) }
      case Eos(sid) => o.writeLong(sid)
    }
    o.flush(); bo.toByteArray
  }

  private def tag(m: Msg): Byte = m match {
    case _: Hello => 0; case _: Ok => 1; case _: ErrorMsg => 2
    case _: Notify => 3; case _: NotifyAck => 4; case _: Message => 5
    case _: Ack => 6; case _: Restart => 7; case _: Eos => 8
  }

  /** Frame `m` as length-header + tag + payload bytes. */
  def encode(m: Msg): Array[Byte] = {
    val p = payload(m)
    val bo = new ByteArrayOutputStream(p.length + 5)
    val o = new DataOutputStream(bo)
    o.writeInt(p.length + 1); o.writeByte(tag(m)); o.write(p)
    o.flush(); bo.toByteArray
  }

  /** Decode one tag+payload frame body (length header already consumed). */
  def decode(bs: Array[Byte]): Msg = {
    val i = new DataInputStream(new java.io.ByteArrayInputStream(bs, 1, bs.length - 1))
    def str() = new String(readShortBytes(i), StandardCharsets.UTF_8)
    bs(0) match {
      case 0 => Hello(str(), str(), str(), str())
      case 1 => Ok(i.readInt())
      case 2 => ErrorMsg(str())
      case 3 => Notify(i.readLong(), str(), i.readLong())
      case 4 => NotifyAck(i.readBoolean(), i.readLong(), i.readLong())
      case 5 =>
        val sid = i.readLong(); val mid = i.readLong(); val et = i.readLong()
        val key = readShortBytes(i)
        val body = i.readAllBytes()
        Message(sid, mid, et, if (key.isEmpty) null else key,
          if (body.isEmpty) null else body)
      case 6 =>
        val cr = i.readInt()
        val n = i.readInt()
        Ack(cr, Seq.fill(n)((i.readLong(), i.readLong())))
      case 7 =>
        if (bs.length <= 1) Restart(null)
        else {
          val n = i.readInt()
          if (n == 0) Restart(null)
          else { val b = new Array[Byte](n); i.readFully(b)
            Restart(new String(b, StandardCharsets.UTF_8)) }
        }
      case 8 => Eos(i.readLong())
      case t => throw new java.io.IOException(s"unknown frame tag $t")
    }
  }

  /** The 2PC message family rides INSIDE `Message(streamId = 0)` payloads
    * (never as top-level frames, and with no inner length header): 1-byte
    * tag 201-206 + body, per the reference's TwoPCFrame
    * (machida/lib/wallaroo/experimental/connector_wire_messages.py:783-805)
    * and the engine's send shape `MessageMsg(0, 0, 0, None, bytes)`
    * (lib/wallaroo/core/sink/connector_sink/connector_sink_twopc.pony:72).
    */
  object TwoPc {
    sealed trait TMsg
    final case class ListUncommitted(rtag: Long) extends TMsg
    final case class ReplyUncommitted(rtag: Long, txnIds: Seq[String]) extends TMsg
    /** whereList entries are (streamId, startPor, endPor) — byte offsets in
      * the sink's output; streamId is always 1 for the single data stream. */
    final case class Phase1(txnId: String, whereList: Seq[(Long, Long, Long)]) extends TMsg
    final case class Reply(txnId: String, commit: Boolean) extends TMsg
    final case class Phase2(txnId: String, commit: Boolean) extends TMsg

    def encode(m: TMsg): Array[Byte] = {
      val bo = new ByteArrayOutputStream()
      val o = new DataOutputStream(bo)
      m match {
        case ListUncommitted(rtag) =>
          o.writeByte(201); o.writeLong(rtag)
        case ReplyUncommitted(rtag, txns) =>
          o.writeByte(202); o.writeLong(rtag); o.writeInt(txns.size)
          txns.foreach(t => shortStr(o, utf8(t)))
        case Phase1(txn, wl) =>
          o.writeByte(203); shortStr(o, utf8(txn)); o.writeInt(wl.size)
          wl.foreach { case (sid, s, e) =>
            o.writeLong(sid); o.writeLong(s); o.writeLong(e)
          }
        case Reply(txn, c) =>
          o.writeByte(204); shortStr(o, utf8(txn)); o.writeBoolean(c)
        case Phase2(txn, c) =>
          o.writeByte(205); shortStr(o, utf8(txn)); o.writeBoolean(c)
      }
      o.flush(); bo.toByteArray
    }

    def decode(bs: Array[Byte]): TMsg = {
      val i = new DataInputStream(
        new java.io.ByteArrayInputStream(bs, 1, bs.length - 1))
      def str() = new String(readShortBytes(i), StandardCharsets.UTF_8)
      (bs(0) & 0xff) match {
        case 201 => ListUncommitted(i.readLong())
        case 202 =>
          val rtag = i.readLong()
          val n = i.readInt()
          ReplyUncommitted(rtag, Seq.fill(n)(str()))
        case 203 =>
          val txn = str()
          val n = i.readInt()
          Phase1(txn, Seq.fill(n)((i.readLong(), i.readLong(), i.readLong())))
        case 204 => Reply(str(), i.readBoolean())
        case 205 => Phase2(str(), i.readBoolean())
        case t => throw new java.io.IOException(s"unknown 2PC frame tag $t")
      }
    }

    /** Wrap a 2PC message in its carrier: `Message(0, 0, 0, null, bytes)`. */
    def carrier(m: TMsg): Message = Message(0L, 0L, 0L, null, encode(m))

    /** Unwrap a stream-0 carrier Message, or None for data messages. */
    def unwrap(m: Message): Option[TMsg] =
      if (m.streamId == 0L && m.payload != null) Some(decode(m.payload))
      else None
  }

  /** Blocking-read one frame off `in`; None on clean EOF at a boundary. */
  def readFrame(in: InputStream): Option[Msg] = {
    val d = new DataInputStream(in)
    val len =
      try d.readInt()
      catch { case _: EOFException => return None }
    if (len < 1 || len > 64 * 1024 * 1024)
      throw new java.io.IOException(s"bad frame length $len")
    val body = new Array[Byte](len)
    d.readFully(body)
    Some(decode(body))
  }

  /** Write one frame to `out` (caller synchronizes the stream). */
  def writeFrame(out: OutputStream, m: Msg): Unit = {
    out.write(encode(m)); out.flush()
  }
}
