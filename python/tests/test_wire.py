"""Cross-language connector-protocol test: a PYTHON at-least-once sender
(graft.wire.TcpAtLeastOnceSender) streams through a live TCP socket into
the SCALA engine's `graft-connector` DSv2 source (ConnectorDemo), which
dumps what it ingested; every message must arrive exactly once with the
final por acked back to the Python side — the machida-connector-to-engine
session, reproduced across the language boundary.

Also unit-checks the Python frame codec round-trip and its byte-layout
agreement with the reference's published test vectors.

Run:  python3 python/tests/test_wire.py   (spawns one sbt runMain)
"""

import json
import os
import socket
import struct
import subprocess
import sys
import tempfile
import threading
import time

_PYDIR = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, _PYDIR)

from graft import wire
from graft.experimental import BaseSource

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))


def test_codec_roundtrip():
    msgs = [
        wire.Hello("0.0.1", "cookie", "prog", "inst"),
        wire.Ok(100),
        wire.Error("boom"),
        wire.Notify(7, "s7", 42),
        wire.NotifyAck(True, 7, 42),
        wire.Message(7, 43, 1234, b"k", b"hello"),
        wire.Message(7, 44, 0, None, b"no key"),
        wire.Ack(10, [(1, 12), (2, 25), (5, 501)]),
        wire.Restart("127.0.0.1:5555"),
        wire.Restart(None),
        wire.Eos(7),
    ]
    for m in msgs:
        framed = wire.encode(m)
        (size,) = struct.unpack(">I", framed[:4])
        assert size == len(framed) - 4, m
        assert wire.decode(framed[4:]) == m, m
    # reference test vectors: Hello("a","b","c","d") body is 12 bytes,
    # Ack(100,[(1,2)]) body is 4+4+16, Notify(0,"0",1) body is 19
    assert len(wire.encode(wire.Hello("a", "b", "c", "d"))) == 4 + 1 + 12
    assert len(wire.encode(wire.Ack(100, [(1, 2)]))) == 4 + 1 + 24
    assert len(wire.encode(wire.Notify(0, "0", 1))) == 4 + 1 + 19
    assert wire.encode(wire.Ok(1))[4] == 1
    assert wire.encode(wire.Eos(0))[4] == 8
    print("ok wire codec round-trip + reference byte layout")


class ListSource(BaseSource):
    """Resettable indexed source; por = records handed out."""

    def __init__(self, records):
        self._records = records
        self._i = 0
        self.resets = []
        self.acked_por = 0

    def __str__(self):
        return "list_source"

    def reset(self, pos=0):
        self.resets.append(pos)
        self._i = int(pos)

    def point_of_ref(self):
        return self._i

    def __next__(self):
        if self._i >= len(self._records):
            raise StopIteration
        value = self._records[self._i]
        self._i += 1
        return value, self._i

    def acked(self, point_of_ref):
        self.acked_por = max(self.acked_por, point_of_ref)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_python_sender_to_scala_engine():
    n = 500
    port = _free_port()
    out = tempfile.mktemp(suffix=".jsonl", prefix="graft_wire_")
    engine = subprocess.Popen(
        ["sbt", "-batch",
         "runMain graft.sources.connector.ConnectorDemo %d %s %d secret"
         % (port, out, n)],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        text=True)
    try:
        # wait for the listener, then stream through the live socket
        deadline = time.time() + 120
        while time.time() < deadline:
            try:
                socket.create_connection(("127.0.0.1", port), 0.5).close()
                break
            except OSError:
                time.sleep(0.5)
        source = ListSource(["msg-%d" % i for i in range(1, n + 1)])
        sender = wire.TcpAtLeastOnceSender(
            "127.0.0.1", port, cookie="secret", program="py_app",
            instance="w1")
        sender.join(source, stream_id=9, stream_name="py_stream")

        assert source.acked_por == n, (
            "final por not acked: %r" % (source.acked_por,))
        # fresh stream: the engine must answer POR_UNKNOWN (U64 max)
        assert source.resets[0] == 0 and sender.sent == n

        stdout, _ = engine.communicate(timeout=120)
        assert "CONNECTOR_DEMO_DONE rows=%d" % n in stdout, stdout[-2000:]
        got = {}
        with open(out) as f:
            for line in f:
                rec = json.loads(line)
                got[rec["message_id"]] = rec["value"]
        assert len(got) == n
        for i in range(1, n + 1):
            assert got[i] == "msg-%d" % i
        print("ok python sender -> scala engine (%d msgs, final por acked)"
              % n)
    finally:
        if engine.poll() is None:
            engine.kill()


def test_sender_resumes_at_engine_por():
    """Resume contract, sender side: when the engine's NotifyAck carries
    por=100 (it already processed 100), the sender must reset there and
    send ONLY the tail 101..200 — verified against a pure-Python mock
    engine speaking the same frames."""
    server = socket.socket()
    server.bind(("127.0.0.1", 0))
    server.listen(1)
    port = server.getsockname()[1]
    got = {"messages": [], "eos": False}

    def engine():
        conn, _ = server.accept()
        hello = wire.read_frame(conn)
        assert isinstance(hello, wire.Hello) and hello.cookie == "ck"
        conn.sendall(wire.encode(wire.Ok(1 << 16)))
        notify = wire.read_frame(conn)
        assert isinstance(notify, wire.Notify)
        conn.sendall(wire.encode(wire.NotifyAck(True, notify.stream_id, 100)))
        last = 100
        while True:
            msg = wire.read_frame(conn)
            if msg is None:
                break
            if isinstance(msg, wire.Message):
                got["messages"].append(
                    (msg.message_id, msg.payload.decode()))
                last = msg.message_id
            elif isinstance(msg, wire.Eos):
                got["eos"] = True
                conn.sendall(wire.encode(wire.Ack(0, [(msg.stream_id, last)])))
        conn.close()

    t = threading.Thread(target=engine, daemon=True)
    t.start()
    source = ListSource(["r-%d" % i for i in range(1, 201)])
    sender = wire.TcpAtLeastOnceSender("127.0.0.1", port, cookie="ck")
    sender.join(source, stream_id=4, stream_name="resume")
    server.close()

    assert source.resets == [100], source.resets
    ids = [mid for mid, _ in got["messages"]]
    assert ids == list(range(101, 201)), (ids[:3], ids[-3:], len(ids))
    assert got["messages"][0] == (101, "r-101")
    assert got["eos"] and source.acked_por == 200
    print("ok python sender resumes at the engine's por (tail-only)")


def test_torn_frame_raises():
    # EOF exactly at a frame boundary is a clean close (None); EOF after
    # PARTIAL header or body bytes is a torn frame and must raise, not
    # masquerade as clean EOF (ADVICE r5: a torn header used to return
    # None and stall the sender until the credit timeout).
    def serve(payload):
        srv = socket.socket()
        srv.bind(("127.0.0.1", 0))
        srv.listen(1)

        def run():
            conn, _ = srv.accept()
            conn.sendall(payload)
            conn.close()
        threading.Thread(target=run, daemon=True).start()
        c = socket.create_connection(srv.getsockname())
        return srv, c

    whole = wire.encode(wire.Ok(5))
    srv, c = serve(whole)
    assert wire.read_frame(c) == wire.Ok(5)
    assert wire.read_frame(c) is None  # boundary EOF → clean close
    srv.close(); c.close()

    for cut in (2, len(whole) - 1):  # mid-header and mid-body
        srv, c = serve(whole[:cut])
        try:
            wire.read_frame(c)
        except IOError:
            pass
        else:
            raise AssertionError("torn frame (cut=%d) did not raise" % cut)
        srv.close(); c.close()
    print("ok torn frames raise; boundary EOF is clean")


def main():
    test_codec_roundtrip()
    test_torn_frame_raises()
    test_sender_resumes_at_engine_por()
    test_python_sender_to_scala_engine()
    print("ALL PYTHON WIRE TESTS PASSED")


if __name__ == "__main__":
    main()
