"""Connector-sink 2PC protocol tests: the Python codec, the durable
ALOC-style sink server (graft.experimental.TwoPCSinkConnector), and the
cross-language session — the SCALA engine's TwoPcSinkClient committing
micro-batches into the PYTHON sink with a mid-transaction crash and a
resume, proving no duplicates and no loss across the language boundary.

Run:  python3 python/tests/test_twopc.py   (spawns two sbt runMains)
"""

import os
import socket
import struct
import subprocess
import sys
import tempfile
import threading

_PYDIR = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, _PYDIR)

from graft import wire
from graft.experimental import TwoPCSinkConnector

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))


def test_twopc_codec():
    msgs = [
        wire.ListUncommitted(77),
        wire.ReplyUncommitted(77, ["s:c_id=1", "s:c_id=2"]),
        wire.TwoPCPhase1("s:c_id=3", [(1, 100, 250)]),
        wire.TwoPCReply("s:c_id=3", True),
        wire.TwoPCPhase2("s:c_id=3", False),
    ]
    for m in msgs:
        assert wire.twopc_decode(wire.twopc_encode(m)) == m, m
    # byte layout: tag 204 | u16 len | txn | 0x01  (encode_phase2r)
    assert wire.twopc_encode(wire.TwoPCReply("ab", True)) == \
        b"\xcc\x00\x02ab\x01"
    assert wire.twopc_encode(wire.ListUncommitted(7))[0] == 201
    # carrier rides stream 0 with message_id 0
    carrier = wire.twopc_carrier(wire.ListUncommitted(7))
    assert carrier.stream_id == 0 and carrier.message_id == 0
    assert wire.twopc_unwrap(carrier) == wire.ListUncommitted(7)
    assert wire.twopc_unwrap(wire.Message(1, 0, 0, None, b"data")) is None
    print("ok 2pc codec round-trip + reference byte layout")


class _PyEngine(object):
    """Minimal python-side engine client for exercising the sink server
    (the Scala TwoPcSinkClient's protocol, just enough for the tests)."""

    def __init__(self, port):
        self.sock = socket.create_connection(("127.0.0.1", port))
        self.sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)

    def handshake(self, resolve=None):
        self.sock.sendall(wire.encode(wire.Hello("0.0.1", "", "t", "w")))
        assert isinstance(wire.read_frame(self.sock), wire.Ok)
        self.sock.sendall(wire.encode(wire.Notify(1, "xl", 0)))
        ack = wire.read_frame(self.sock)
        assert isinstance(ack, wire.NotifyAck) and ack.success
        self.sock.sendall(wire.encode(
            wire.twopc_carrier(wire.ListUncommitted(1))))
        reply = wire.twopc_unwrap(wire.read_frame(self.sock))
        assert isinstance(reply, wire.ReplyUncommitted)
        for txn in reply.txn_ids:
            commit = resolve(txn) if resolve else False
            self.sock.sendall(wire.encode(
                wire.twopc_carrier(wire.TwoPCPhase2(txn, commit))))
        return ack.point_of_ref, reply.txn_ids

    def send_txn(self, txn, start, chunks, phase2=True):
        off = start
        for c in chunks:
            self.sock.sendall(wire.encode(wire.Message(1, off, 0, None, c)))
            off += len(c)
        self.sock.sendall(wire.encode(wire.twopc_carrier(
            wire.TwoPCPhase1(txn, [(1, start, off)]))))
        vote = wire.twopc_unwrap(wire.read_frame(self.sock))
        assert isinstance(vote, wire.TwoPCReply) and vote.txn_id == txn
        if phase2 and vote.commit:
            self.sock.sendall(wire.encode(wire.twopc_carrier(
                wire.TwoPCPhase2(txn, True))))
        return vote.commit, off

    def close(self):
        self.sock.close()


def test_sink_server_commit_abort_recover():
    tmp = tempfile.mkdtemp()
    out = os.path.join(tmp, "out")
    sink = TwoPCSinkConnector(out)
    sink.listen()
    port = sink.port
    sessions = threading.Thread(
        target=lambda: [sink.serve_one_session() for _ in range(4)],
        daemon=True)
    sessions.start()

    # session 1: commit one txn, then die mid-transaction (phase1 voted,
    # no phase2) — the sink is left holding an uncommitted txn
    e = _PyEngine(port)
    por, pending = e.handshake()
    assert por == 0 and pending == []
    ok, off = e.send_txn("xl:c_id=0", 0, [b"one.", b"two."])
    assert ok and off == 8
    ok, _ = e.send_txn("xl:c_id=1", 8, [b"LOST."], phase2=False)
    assert ok
    e.close()

    # session 2: reconnect → sink reports the pending txn; abort it; its
    # bytes are gone, the committed prefix intact; re-send and commit
    e = _PyEngine(port)
    por, pending = e.handshake()  # default resolver aborts
    assert por == 8 and pending == ["xl:c_id=1"], (por, pending)
    ok, off = e.send_txn("xl:c_id=1", 8, [b"three."])
    assert ok and off == 14
    e.close()

    # session 3: sink-side abort vote (fault injection)
    sink.abort_next = True
    e = _PyEngine(port)
    e.handshake()
    ok, _ = e.send_txn("xl:c_id=2", 14, [b"reject"])
    assert not ok
    e.close()

    assert sink.committed_output() == b"one.two.three."
    print("ok python sink: commit, crash-recovery abort, vote rollback")


def test_scala_engine_to_python_sink():
    tmp = tempfile.mkdtemp()
    out = os.path.join(tmp, "out")
    logdir = os.path.join(tmp, "enginelog")
    sink = TwoPCSinkConnector(out)
    sink.listen()
    port = sink.port
    # two engine incarnations -> two sink sessions (+1 spare accept in case
    # the crashed client's socket teardown splits a session)
    sessions = threading.Thread(
        target=lambda: [sink.serve_one_session() for _ in range(4)],
        daemon=True)
    sessions.start()

    def run(mode):
        return subprocess.run(
            ["sbt", "-batch",
             "runMain graft.sources.connector.TwoPcSinkDemo "
             "127.0.0.1 %d %s %s" % (port, logdir, mode)],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            timeout=600)

    # incarnation 1: batch 0 commits, batch 1 crashes after phase 1
    r1 = run("crash")
    assert r1.returncode == 0 and b"CRASH_OK" in r1.stdout, \
        r1.stdout.decode()[-2000:]
    committed = sink.committed_output()
    assert committed == b"alpha;beta;", committed

    # incarnation 2: same txn log → recovery aborts the leftover txn,
    # batch 1 replays, batch 2 commits — exactly once end to end
    r2 = run("resume")
    assert r2.returncode == 0 and b"RESUME_OK" in r2.stdout, \
        r2.stdout.decode()[-2000:]
    assert sink.committed_output() == b"alpha;beta;gamma;delta;"
    print("ok scala engine -> python 2pc sink: crash + resume, exactly once")


def main():
    test_twopc_codec()
    test_sink_server_commit_abort_recover()
    test_scala_engine_to_python_sink()
    print("ALL PYTHON 2PC TESTS PASSED")


if __name__ == "__main__":
    main()
