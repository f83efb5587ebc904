"""Binary frame codec + at-least-once TCP sender for the connector wire
protocol — the Python twin of ``graft.sources.connector.Wire`` and the
sender half of the reference's connector session (machida/lib/wallaroo/
experimental/connector_wire_messages.py layout: big-endian ``u32 size``
header over ``u8 tag | payload``; Hello 0, Ok 1, Error 2, Notify 3,
NotifyAck 4, Message 5, Ack 6, Restart 7, Eos 8).

A Python pipeline's sender can stream straight into the Scala engine's
``spark.readStream.format("graft-connector")`` listener with full
at-least-once semantics: Notify carries the local point of reference,
NotifyAck answers with the engine's resume position (``POR_UNKNOWN`` =
never processed -> start from the beginning), Message ids ARE points of
reference, and Acks release everything up to the acked por.
"""

import socket
import struct
import sys
import threading
from collections import namedtuple

POR_UNKNOWN = 0xFFFFFFFFFFFFFFFF

Hello = namedtuple("Hello", "version cookie program instance")
Ok = namedtuple("Ok", "credits")
Error = namedtuple("Error", "message")
Notify = namedtuple("Notify", "stream_id stream_name point_of_ref")
NotifyAck = namedtuple("NotifyAck", "success stream_id point_of_ref")
Message = namedtuple("Message", "stream_id message_id event_time key payload")
Ack = namedtuple("Ack", "credits acks")
Restart = namedtuple("Restart", "address")
Eos = namedtuple("Eos", "stream_id")

_TAGS = {Hello: 0, Ok: 1, Error: 2, Notify: 3, NotifyAck: 4, Message: 5,
         Ack: 6, Restart: 7, Eos: 8}

# --- 2PC inner frames (ride INSIDE Message(stream_id=0) payloads with no
# --- inner length header; tags per connector_wire_messages.py:784-789) ---

ListUncommitted = namedtuple("ListUncommitted", "rtag")
ReplyUncommitted = namedtuple("ReplyUncommitted", "rtag txn_ids")
TwoPCPhase1 = namedtuple("TwoPCPhase1", "txn_id where_list")
TwoPCReply = namedtuple("TwoPCReply", "txn_id commit")
TwoPCPhase2 = namedtuple("TwoPCPhase2", "txn_id commit")

_TWOPC_TAGS = {ListUncommitted: 201, ReplyUncommitted: 202,
               TwoPCPhase1: 203, TwoPCReply: 204, TwoPCPhase2: 205}


def twopc_encode(msg):
    """Tag + body bytes for a 2PC inner frame (no length header)."""
    tag = struct.pack(">B", _TWOPC_TAGS[type(msg)])
    if isinstance(msg, ListUncommitted):
        return tag + struct.pack(">Q", msg.rtag)
    if isinstance(msg, ReplyUncommitted):
        return (tag + struct.pack(">QI", msg.rtag, len(msg.txn_ids)) +
                b"".join(_short_bytes(t) for t in msg.txn_ids))
    if isinstance(msg, TwoPCPhase1):
        return (tag + _short_bytes(msg.txn_id) +
                struct.pack(">I", len(msg.where_list)) +
                b"".join(struct.pack(">QQQ", s, a, b)
                         for (s, a, b) in msg.where_list))
    if isinstance(msg, (TwoPCReply, TwoPCPhase2)):
        return (tag + _short_bytes(msg.txn_id) +
                (b"\x01" if msg.commit else b"\x00"))
    raise TypeError("not a 2PC message: %r" % (msg,))


def twopc_decode(bs):
    tag, at = bs[0], 1
    if tag == 201:
        return ListUncommitted(*struct.unpack_from(">Q", bs, at))
    if tag == 202:
        rtag, n = struct.unpack_from(">QI", bs, at)
        at += 12
        txns = []
        for _ in range(n):
            t, at = _take_short(bs, at)
            txns.append(t.decode())
        return ReplyUncommitted(rtag, txns)
    if tag == 203:
        txn, at = _take_short(bs, at)
        (n,) = struct.unpack_from(">I", bs, at)
        at += 4
        wl = [struct.unpack_from(">QQQ", bs, at + 24 * i) for i in range(n)]
        return TwoPCPhase1(txn.decode(), wl)
    if tag in (204, 205):
        txn, at = _take_short(bs, at)
        commit = bs[at:at + 1] == b"\x01"
        cls = TwoPCReply if tag == 204 else TwoPCPhase2
        return cls(txn.decode(), commit)
    raise ValueError("unknown 2PC frame tag %d" % tag)


def twopc_carrier(msg):
    """Wrap a 2PC frame in its stream-0 carrier Message."""
    return Message(0, 0, 0, None, twopc_encode(msg))


def twopc_unwrap(msg):
    """TwoPC frame inside a stream-0 Message, or None for data messages."""
    if isinstance(msg, Message) and msg.stream_id == 0 and msg.payload:
        return twopc_decode(msg.payload)
    return None


def _short_bytes(value):
    data = value.encode() if isinstance(value, str) else (value or b"")
    return struct.pack(">H", len(data)) + data


def _encode_body(msg):
    if isinstance(msg, Hello):
        return b"".join(_short_bytes(x) for x in msg)
    if isinstance(msg, Ok):
        return struct.pack(">I", msg.credits)
    if isinstance(msg, Error):
        return _short_bytes(msg.message)
    if isinstance(msg, Notify):
        return (struct.pack(">Q", msg.stream_id) +
                _short_bytes(msg.stream_name) +
                struct.pack(">Q", msg.point_of_ref))
    if isinstance(msg, NotifyAck):
        return struct.pack(">?QQ", msg.success, msg.stream_id,
                           msg.point_of_ref)
    if isinstance(msg, Message):
        payload = msg.payload or b""
        if isinstance(payload, str):
            payload = payload.encode()
        return (struct.pack(">QQq", msg.stream_id, msg.message_id,
                            msg.event_time) +
                _short_bytes(msg.key) + payload)
    if isinstance(msg, Ack):
        out = struct.pack(">II", msg.credits, len(msg.acks))
        for sid, por in msg.acks:
            out += struct.pack(">QQ", sid, por)
        return out
    if isinstance(msg, Restart):
        if not msg.address:
            return struct.pack(">I", 0)
        addr = msg.address.encode()
        return struct.pack(">I", len(addr)) + addr
    if isinstance(msg, Eos):
        return struct.pack(">Q", msg.stream_id)
    raise TypeError("not a wire message: %r" % (msg,))


def encode(msg):
    """Full frame bytes: u32 length (= body + 1), u8 tag, body."""
    body = _encode_body(msg)
    return struct.pack(">IB", len(body) + 1, _TAGS[type(msg)]) + body


def _take_short(buf, at):
    (n,) = struct.unpack_from(">H", buf, at)
    return buf[at + 2:at + 2 + n], at + 2 + n


def decode(frame):
    """Decode one tag+body frame (length header already stripped)."""
    tag, buf, at = frame[0], frame, 1
    if tag == 0:
        parts = []
        for _ in range(4):
            p, at = _take_short(buf, at)
            parts.append(p.decode())
        return Hello(*parts)
    if tag == 1:
        return Ok(*struct.unpack_from(">I", buf, at))
    if tag == 2:
        m, at = _take_short(buf, at)
        return Error(m.decode())
    if tag == 3:
        (sid,) = struct.unpack_from(">Q", buf, at)
        name, at = _take_short(buf, at + 8)
        (por,) = struct.unpack_from(">Q", buf, at)
        return Notify(sid, name.decode(), por)
    if tag == 4:
        return NotifyAck(*struct.unpack_from(">?QQ", buf, at))
    if tag == 5:
        sid, mid, et = struct.unpack_from(">QQq", buf, at)
        key, at = _take_short(buf, at + 24)
        return Message(sid, mid, et, key or None, buf[at:] or None)
    if tag == 6:
        credits, count = struct.unpack_from(">II", buf, at)
        acks = [struct.unpack_from(">QQ", buf, at + 8 + 16 * i)
                for i in range(count)]
        return Ack(credits, acks)
    if tag == 7:
        if len(buf) <= at:
            return Restart(None)
        (n,) = struct.unpack_from(">I", buf, at)
        return Restart(buf[at + 4:at + 4 + n].decode() if n else None)
    if tag == 8:
        return Eos(*struct.unpack_from(">Q", buf, at))
    raise ValueError("unknown frame tag %d" % tag)


def read_frame(sock):
    """Read one frame off a socket; None on clean EOF at a boundary."""
    header = _read_exact(sock, 4)
    if header is None:
        return None
    (size,) = struct.unpack(">I", header)
    body = _read_exact(sock, size)
    if body is None:
        raise IOError("truncated frame")
    return decode(body)


def _read_exact(sock, n):
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            if buf:
                # partial bytes then EOF is a TORN frame, not a clean close
                raise IOError("EOF mid-frame (%d of %d bytes)" % (len(buf), n))
            return None
        buf += chunk
    return buf


class TcpAtLeastOnceSender(object):
    """Drive a [[graft.experimental.BaseSource]] through a LIVE connector
    socket with at-least-once semantics (the reference's
    AtLeastOnceSourceConnector run over TCP instead of the directory
    queue): reconnect + handshake + resume-at-por loop; `join(source)`
    returns once the source is exhausted and the final por is acked.
    """

    def __init__(self, host, port, cookie="", program="graft",
                 instance="python", version="0.0.1", progress_every=0):
        self.host, self.port = host, port
        self.cookie, self.program = cookie, program
        self.instance, self.version = instance, version
        self.sent = 0
        self.stopped = False
        # > 0: emit "STREAM_TCP_PROGRESS sent=N" to stdout every N sends —
        # lets a supervising process act on REAL progress instead of wall
        # time (the kill-resume test SIGKILLs inside a sent-count window)
        self.progress_every = progress_every

    def join(self, source, stream_id, stream_name, event_time=0,
             give_up_after_s=None):
        """Reconnect + resume until the source is exhausted and acked.

        `give_up_after_s` bounds the retry loop: if that many seconds pass
        with NO forward progress (no message newly sent across sessions),
        raise IOError instead of spinning forever against a dead engine.
        None (the default) keeps the production at-least-once semantic —
        retry indefinitely, the engine may come back any time.
        """
        import time
        last_sent = self.sent
        last_progress = time.monotonic()
        while not self.stopped:
            try:
                if self._session(source, stream_id, stream_name, event_time):
                    return
            except (IOError, OSError):
                pass
            if self.sent != last_sent:
                last_sent = self.sent
                last_progress = time.monotonic()
            elif (give_up_after_s is not None and
                  time.monotonic() - last_progress > give_up_after_s):
                raise IOError(
                    "no progress for %.0fs against %s:%d (engine gone?)"
                    % (give_up_after_s, self.host, self.port))
            time.sleep(0.2)

    def _session(self, source, stream_id, stream_name, event_time):
        sock = socket.create_connection((self.host, self.port), timeout=30)
        sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        state = {"credits": 0, "acked": -1, "resume": None, "restart": False}
        cond = threading.Condition()

        def pump():
            try:
                while True:
                    msg = read_frame(sock)
                    if msg is None:
                        # peer closed: the session is over either way, so
                        # wake the send loop instead of letting it stall
                        # until the credit timeout
                        with cond:
                            state["restart"] = True
                            cond.notify_all()
                        break
                    with cond:
                        if isinstance(msg, Ok):
                            state["credits"] += msg.credits
                        elif isinstance(msg, NotifyAck) and msg.success:
                            state["resume"] = msg.point_of_ref
                        elif isinstance(msg, Ack):
                            state["credits"] += msg.credits
                            for sid, por in msg.acks:
                                if sid == stream_id:
                                    state["acked"] = por
                                    source.acked(por)
                        elif isinstance(msg, Restart):
                            state["restart"] = True
                        cond.notify_all()
            except (IOError, OSError):
                with cond:
                    state["restart"] = True
                    cond.notify_all()

        reader = threading.Thread(target=pump, daemon=True)
        reader.start()
        try:
            sock.sendall(encode(Hello(self.version, self.cookie,
                                      self.program, self.instance)))
            sock.sendall(encode(Notify(stream_id, stream_name,
                                       source.point_of_ref())))
            with cond:
                cond.wait_for(lambda: state["resume"] is not None or
                              state["restart"], timeout=10)
                if state["resume"] is None:
                    raise IOError("no NotifyAck")
            resume = state["resume"]
            source.reset(0 if resume == POR_UNKNOWN else resume)
            final_por = None
            for value, por in source:
                with cond:
                    ok = cond.wait_for(
                        lambda: state["credits"] > 0 or state["restart"],
                        timeout=30)
                    if state["restart"] or not ok:
                        return False
                    state["credits"] -= 1
                sock.sendall(encode(Message(stream_id, por, event_time,
                                            None, value)))
                self.sent += 1
                if self.progress_every and self.sent % self.progress_every == 0:
                    sys.stdout.write(
                        "STREAM_TCP_PROGRESS sent=%d\n" % self.sent)
                    sys.stdout.flush()
                final_por = por
            sock.sendall(encode(Eos(stream_id)))
            if final_por is None:
                final_por = source.point_of_ref()
            with cond:
                cond.wait_for(lambda: state["acked"] >= final_por or
                              state["restart"], timeout=30)
                return state["acked"] >= final_por
        finally:
            try:
                sock.close()
            except OSError:
                pass
