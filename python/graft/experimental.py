"""graft.experimental — the reference's external-connector protocol
(machida/lib/wallaroo/experimental: SourceConnector / SinkConnector, the
classes every script under the reference's connectors/ directory is built
on) re-expressed for the Spark engine.

A *source connector* is an external process bridging some transport (UDP,
rabbitmq, kinesis, ...) into the engine. The reference's version writes
framed messages into a socket; graft's version lands them in a
DIRECTORY QUEUE as atomically renamed JSONL files — the same at-least-once
boundary the Scala `DirectoryQueueSourceConfig` / `UdpIngest` tier tails,
so everything after the rename is replayable by Structured Streaming.

A *sink connector* is an external process receiving the pipeline's output;
it is a plain TCP listener speaking the same length-framed encoding that
`graft.TCPSinkConfig` (and the Scala `TcpSinkConfig`) emit.

A reference connector script ports nearly verbatim::

    # reference:                        # graft:
    import wallaroo.experimental        import graft.experimental
    c = wallaroo.experimental\\         c = graft.experimental\\
        .SourceConnector(...)               .SourceConnector(...)
    c.connect()                         c.connect()
    c.write(data)                       c.write(data)

(the one deviation: graft passes the landing directory / decoder directly
instead of re-importing the application module to look them up.)
"""

import argparse
import json
import os
import socket
import struct
import sys


def parse_connector_args(args, required_params=(), optional_params=()):
    """`--connector NAME --NAME-host H --NAME-port P ...` → namespace,
    exactly the reference's CLI contract."""
    pre = argparse.ArgumentParser()
    pre.add_argument("--connector", dest="connector_name")
    prefix = pre.parse_known_args(args)[0].connector_name or "CONNECTOR_NAME"
    parser = argparse.ArgumentParser()
    parser.add_argument("--connector", dest="connector_name", required=True)
    for key in required_params:
        parser.add_argument("--%s-%s" % (prefix, key.replace("_", "-")),
                            dest=key, required=True)
    for key in optional_params:
        parser.add_argument("--%s-%s" % (prefix, key.replace("_", "-")),
                            dest=key)
    return parser.parse_known_args(args)[0]


class SourceConnector(object):
    """Bridge an external transport into the engine: `write()` lands
    messages in the directory queue as atomically renamed JSONL files
    (fields: `value`, `event_time`, `key`). Messages buffer until
    `flush_every` then land as ONE file — a crashed connector loses only
    its unflushed buffer, never a partially visible file.
    """

    def __init__(self, args=None, required_params=(), optional_params=(),
                 landing_dir=None, flush_every=64):
        self.params = parse_connector_args(
            args or sys.argv,
            tuple(required_params) +
            (("landing_dir",) if landing_dir is None else ()),
            optional_params)
        self._dir = landing_dir or self.params.landing_dir
        self._flush_every = flush_every
        self._buf = []
        self._seq = 0
        self.count = 0
        self._connected = False

    def connect(self):
        os.makedirs(self._dir, exist_ok=True)
        # resume the file sequence past any prior run's landings — a
        # restarted connector must never overwrite files already handed
        # to the engine (one connector per landing dir at a time)
        seqs = [int(f[len("land_"):-len(".jsonl")])
                for f in os.listdir(self._dir)
                if f.startswith("land_") and f.endswith(".jsonl")]
        self._seq = max(seqs) + 1 if seqs else 0
        self._connected = True

    def write(self, message, event_time=0, key=None):
        if not self._connected:
            raise RuntimeError("Please call connect before writing")
        if isinstance(message, bytes):
            message = message.decode("utf-8", errors="replace")
        self._buf.append(json.dumps(
            {"value": message, "event_time": event_time, "key": key}))
        self.count += 1
        if len(self._buf) >= self._flush_every:
            self.flush()

    def flush(self):
        if not self._buf:
            return
        tmp = os.path.join(self._dir, ".land_%d.jsonl.tmp" % self._seq)
        with open(tmp, "w") as f:
            f.write("\n".join(self._buf) + "\n")
        os.rename(tmp, os.path.join(self._dir, "land_%d.jsonl" % self._seq))
        self._seq += 1
        self._buf = []

    def close(self):
        self.flush()


class BaseSource(object):
    """The reference's resumable-source contract (experimental
    connectors.py BaseSource): `reset(pos)` rewinds to a point of
    reference, `point_of_ref()` reports the current one, iteration yields
    `(value, new_point_of_ref)` tuples, and `acked(por)` is called when
    everything up to `por` is durably handed off.
    """

    def __str__(self):
        raise NotImplementedError

    def reset(self, pos=0):
        raise NotImplementedError

    def point_of_ref(self):
        raise NotImplementedError

    def __iter__(self):
        return self

    def __next__(self):
        raise NotImplementedError

    def acked(self, point_of_ref):
        pass


class AtLeastOnceSourceConnector(SourceConnector):
    """At-least-once driver for a [[BaseSource]] (the reference replaced
    its plain SourceConnector with exactly this shape): the connector
    persists the last ACKED point of reference next to the landing
    directory, `reset()`s the source there on startup, and acks after
    every atomic file rename — the rename IS the durable handoff, since
    everything after it is replayed by the engine, so a crash re-sends
    only the unflushed tail. The sidecar is underscore-prefixed, which
    the streaming file source ignores.
    """

    def __init__(self, args=None, required_params=(), optional_params=(),
                 landing_dir=None, flush_every=64):
        SourceConnector.__init__(self, args, required_params,
                                 optional_params, landing_dir, flush_every)
        self._source = None
        self._pending_por = None

    def _por_path(self, source):
        return os.path.join(self._dir, "_por_%s.json" % str(source))

    def acked_point_of_ref(self, source):
        """Last durably landed point of reference, or None for a fresh
        stream (the reference signals 'nothing processed' with
        U64.max_value; None is the pythonic reading)."""
        path = self._por_path(source)
        if os.path.exists(path):
            with open(path) as f:
                return json.load(f)["point_of_ref"]
        return None

    def flush(self):
        SourceConnector.flush(self)
        if self._source is not None and self._pending_por is not None:
            tmp = self._por_path(self._source) + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"point_of_ref": self._pending_por}, f)
            os.rename(tmp, self._por_path(self._source))
            self._source.acked(self._pending_por)
            self._pending_por = None

    def join(self, source, event_time=0, key=None):
        """Drive `source` to exhaustion with resume + ack bookkeeping."""
        self.connect()
        self._source = source
        por = self.acked_point_of_ref(source)
        source.reset(por if por is not None else 0)
        for value, new_por in source:
            # set BEFORE write: write() may flush at the batch boundary,
            # and the flushed file includes this message
            self._pending_por = new_por
            self.write(value, event_time=event_time, key=key)
        self.close()
        self._source = None


class SinkConnector(object):
    """Receive the pipeline's output: a TCP listener decoding the
    length-framed stream `graft.TCPSinkConfig` emits. `read()` blocks for
    the next decoded message (connections from many partitions drain
    round-robin, like the reference's select loop).
    """

    def __init__(self, args=None, required_params=(), optional_params=(),
                 decoder=None):
        self.params = parse_connector_args(
            args or sys.argv, required_params, optional_params)
        self._decoder = decoder
        self._acceptor = None
        self._conns = []

    def listen(self, host=None, port=None, backlog=8):
        acceptor = socket.socket()
        acceptor.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        acceptor.bind((host or self.params.host,
                       int(port or self.params.port)))
        acceptor.listen(backlog)
        self._acceptor = acceptor

    @property
    def port(self):
        return self._acceptor.getsockname()[1]

    def _read_exact(self, conn, n):
        buf = b""
        while len(buf) < n:
            chunk = conn.recv(n - len(buf))
            if not chunk:
                return None
            buf += chunk
        return buf

    def read(self, timeout=None):
        import select as _select
        while True:
            readable, _, _ = _select.select(
                [self._acceptor] + self._conns, [], [], timeout)
            if not readable:
                return None
            for sock in readable:
                if sock is self._acceptor:
                    conn, _ = sock.accept()
                    self._conns.append(conn)
                    continue
                header = self._read_exact(
                    sock, self._decoder.header_length() if self._decoder else 4)
                if header is None:
                    self._conns.remove(sock)
                    sock.close()
                    continue
                n = (self._decoder.payload_length(header) if self._decoder
                     else struct.unpack(">I", header)[0])
                payload = self._read_exact(sock, n)
                if payload is None:
                    self._conns.remove(sock)
                    sock.close()
                    continue
                return (self._decoder.decode(payload) if self._decoder
                        else payload)

    def close(self):
        for c in self._conns:
            c.close()
        if self._acceptor:
            self._acceptor.close()


class TwoPCSinkConnector(object):
    """Exactly-once sink server: the external half of the connector-sink
    2PC protocol (the reference's aloc_sink source of truth,
    testing/correctness/tests/aloc_sink/aloc_sink_impl.py, with the
    pony_connector_sink's state machine). The ENGINE is the TCP client;
    this process appends its stream-1 bytes to ``out_path`` and votes on
    each ``TwoPCPhase1``:

    * phase 1 must name ``[start, end)`` with start == the last committed
      offset and end <= the current file tell; the vote and the output are
      fsync'd BEFORE the ``TwoPCReply`` ships;
    * phase 2 commit advances the committed offset; abort truncates the
      file back to start;
    * on (re)connect the txn log replays: a pending phase1-ok txn keeps
      its bytes (awaiting the engine's recovery decision), anything else
      truncates to the committed offset; ``ListUncommitted`` reports the
      pending txns so the engine can resolve them.

    Committed output is therefore exactly the byte ranges the engine
    confirmed — kill either process mid-transaction and the replay
    converges with no duplicates and no loss.

    The txn log (``out_path + ".txnlog"``) is JSON lines in the aloc
    format: ``[ts, "1-ok"|"1-rollback", txn_id, where_list]`` and
    ``[ts, "2-ok"|"2-rollback", txn_id, offset]``.
    """

    def __init__(self, out_path, host="127.0.0.1", port=0, cookie=""):
        self.out_path = out_path
        self.txnlog_path = out_path + ".txnlog"
        self.host, self.cookie = host, cookie
        self._port = port
        self._acceptor = None
        # fault injection for tests
        self.abort_next = False
        self.drop_after_phase1 = False

    def listen(self):
        acceptor = socket.socket()
        acceptor.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        acceptor.bind((self.host, self._port))
        acceptor.listen(2)
        self._acceptor = acceptor

    @property
    def port(self):
        return self._acceptor.getsockname()[1]

    # --- durable state -----------------------------------------------------

    def _load(self):
        """Replay the txn log: (last_committed, {txn: (ok, start, end)})."""
        last_committed, txn_state = 0, {}
        if os.path.exists(self.txnlog_path):
            with open(self.txnlog_path) as f:
                for line in f:
                    if not line.strip():
                        continue
                    entry = json.loads(line)
                    tag, txn = entry[1], entry[2]
                    if tag in ("1-ok", "1-rollback"):
                        (sid, start, end) = entry[3][0]
                        txn_state[txn] = (tag == "1-ok", start, end)
                    elif tag in ("2-ok", "2-rollback"):
                        if tag == "2-ok":
                            last_committed = max(last_committed, entry[3])
                        txn_state.pop(txn, None)
        return last_committed, txn_state

    def _log(self, entry):
        import time
        with open(self.txnlog_path, "a") as f:
            f.write(json.dumps([time.time()] + entry) + "\n")
            f.flush()
            os.fsync(f.fileno())

    def _truncate(self, offset):
        with open(self.out_path, "ab") as f:
            f.truncate(offset)
            f.flush()
            os.fsync(f.fileno())

    def committed_output(self):
        last_committed, _ = self._load()
        if not os.path.exists(self.out_path):
            return b""
        with open(self.out_path, "rb") as f:
            return f.read()[:last_committed]

    # --- protocol ----------------------------------------------------------

    def serve_one_session(self, timeout=None):
        """Accept ONE engine connection and serve it to EOF. Returns after
        the engine disconnects (call again for the next session)."""
        from . import wire
        if timeout is not None:
            self._acceptor.settimeout(timeout)
        conn, _ = self._acceptor.accept()
        conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        try:
            self._serve(conn, wire)
        except (IOError, OSError):
            pass
        finally:
            conn.close()

    def _serve(self, conn, wire):
        if not os.path.exists(self.out_path):
            open(self.out_path, "wb").close()
        last_committed, txn_state = self._load()
        # reconnect truncation (aloc_sink_impl.py:322-344): keep a pending
        # phase1-ok txn's bytes; drop any un-voted tail
        keep_to = last_committed
        for (ok, start, end) in txn_state.values():
            if ok:
                keep_to = max(keep_to, end)
        self._truncate(keep_to)
        out = open(self.out_path, "r+b")
        out.seek(0, os.SEEK_END)
        try:
            while True:
                msg = wire.read_frame(conn)
                if msg is None:
                    return
                if isinstance(msg, wire.Hello):
                    if self.cookie and msg.cookie != self.cookie:
                        conn.sendall(wire.encode(wire.Error("bad cookie")))
                        return
                    conn.sendall(wire.encode(wire.Ok(500)))
                elif isinstance(msg, wire.Notify):
                    conn.sendall(wire.encode(wire.NotifyAck(
                        True, msg.stream_id, last_committed)))
                elif isinstance(msg, wire.Eos):
                    conn.sendall(wire.encode(wire.Ack(
                        1, [(msg.stream_id, last_committed)])))
                elif isinstance(msg, wire.Message) and msg.stream_id != 0:
                    if msg.message_id != out.tell():
                        conn.sendall(wire.encode(wire.Error(
                            "offset gap: message_id %d != tell %d"
                            % (msg.message_id, out.tell()))))
                        return
                    out.write(msg.payload or b"")
                elif isinstance(msg, wire.Message):
                    inner = wire.twopc_unwrap(msg)
                    if isinstance(inner, wire.ListUncommitted):
                        conn.sendall(wire.encode(wire.twopc_carrier(
                            wire.ReplyUncommitted(inner.rtag,
                                                  sorted(txn_state)))))
                    elif isinstance(inner, wire.TwoPCPhase1):
                        (sid, start, end) = inner.where_list[0]
                        out.flush()
                        os.fsync(out.fileno())
                        ok = (sid == 1 and start == last_committed and
                              start <= end and end <= out.tell() and
                              not self.abort_next)
                        self.abort_next = False
                        txn_state[inner.txn_id] = (ok, start, end)
                        self._log(["1-ok" if ok else "1-rollback",
                                   inner.txn_id, [[sid, start, end]]])
                        conn.sendall(wire.encode(wire.twopc_carrier(
                            wire.TwoPCReply(inner.txn_id, ok))))
                        if self.drop_after_phase1:
                            self.drop_after_phase1 = False
                            return
                    elif isinstance(inner, wire.TwoPCPhase2):
                        if inner.txn_id in txn_state:
                            (_, start, end) = txn_state.pop(inner.txn_id)
                            if inner.commit:
                                last_committed = end
                                self._log(["2-ok", inner.txn_id, end])
                            else:
                                out.flush()
                                self._truncate(start)
                                out.seek(start)
                                self._log(["2-rollback", inner.txn_id, start])
                        # unknown txn: already resolved — ignore (aloc:566)
                    else:
                        conn.sendall(wire.encode(wire.Error(
                            "bad stream-0 message: %r" % (inner,))))
                        return
        finally:
            out.flush()
            os.fsync(out.fileno())
            out.close()


class DirectoryQueueSource(BaseSource):
    """Replayable [[BaseSource]] over the landing directory the
    SourceConnector writes (`land_*.jsonl` in sequence order): the point
    of reference is the GLOBAL message index from the start of the queue,
    so `reset(pos)` seeks by skipping `pos` messages — the engine's
    NotifyAck por maps directly onto it and a killed sender re-sends only
    the unacked tail. Iteration covers the files present at reset time
    plus any that land while draining (sorted by sequence number); it
    raises StopIteration at the current end of queue.
    """

    def __init__(self, landing_dir, name="dirqueue", throttle_s=0.0):
        self.landing_dir = landing_dir
        self.name = name
        self.throttle_s = throttle_s  # per-message pacing (giles-style)
        # retained window: _values holds messages [_base, _base+len) of the
        # global index — the acked prefix is dropped (see acked()), so a
        # long-running sender's memory is bounded by the UNACKED tail, not
        # the whole queue history
        self._values = []
        self._base = 0
        self._pos = 0
        self._loaded = set()
        self.acked_por = -1

    def __str__(self):
        return self.name

    def _seq(self, fname):
        return int(fname[len("land_"):-len(".jsonl")])

    def _load_tail(self):
        names = sorted(
            (f for f in os.listdir(self.landing_dir)
             if f.startswith("land_") and f.endswith(".jsonl")
             and f not in self._loaded),
            key=self._seq)
        for f in names:
            with open(os.path.join(self.landing_dir, f)) as fh:
                for line in fh:
                    line = line.strip()
                    if line:
                        self._values.append(json.loads(line)["value"])
            self._loaded.add(f)

    def reset(self, pos=0):
        pos = int(pos)
        if pos < self._base:
            # resume below the dropped prefix: the protocol never asks for
            # this (acks only advance), but the landing files are durable,
            # so rebuild the whole window rather than fail
            self._values = []
            self._loaded = set()
            self._base = 0
        self._load_tail()
        self._pos = pos

    def point_of_ref(self):
        return self._pos

    def __next__(self):
        if self._pos >= self._base + len(self._values):
            self._load_tail()
        if self._pos >= self._base + len(self._values):
            raise StopIteration
        if self.throttle_s:
            import time
            time.sleep(self.throttle_s)
        value = self._values[self._pos - self._base]
        self._pos += 1
        return (value, self._pos)

    def acked(self, point_of_ref):
        self.acked_por = point_of_ref
        # drop the acked prefix (por is a global index; everything <= por
        # is durable engine-side and will never be asked for again)
        keep_from = min(int(point_of_ref), self._base + len(self._values))
        if keep_from > self._base:
            del self._values[:keep_from - self._base]
            self._base = keep_from
