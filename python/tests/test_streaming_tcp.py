"""Full machida topology across the language boundary, with a mid-stream
kill: a PYTHON app's source streams over the LIVE connector socket into
the SCALA engine (`python -m graft.run --stream-tcp`), the engine runs the
word-count aggregation, and ships the result to a PYTHON SinkConnector.
The first sender incarnation is SIGKILLed mid-stream; the second resumes
at the engine's acked point of reference — the final counts prove every
message arrived EXACTLY once end-to-end.

Run:  python3 python/tests/test_streaming_tcp.py   (spawns one sbt runMain)
"""

import json
import os
import signal
import socket
import struct
import subprocess
import sys
import tempfile
import time

_PYDIR = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, _PYDIR)

from graft.experimental import SinkConnector, SourceConnector

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))

APP_MODULE = '''
import graft

def application_setup(args):
    pipeline = (graft.source("words",
                    graft.DirectoryQueueSourceConfig("words", %(landing)r))
                .to_sink(graft.MemorySinkConfig("out")))
    return graft.build_application("wc_tcp", pipeline)
'''

WORDS = {"apple": 120, "banana": 90, "cherry": 60, "date": 30}
TOTAL = sum(WORDS.values())


class _PairDecoder(object):
    def header_length(self):
        return 4

    def payload_length(self, header):
        return struct.unpack(">I", header)[0]

    def decode(self, payload):
        k, v = json.loads(payload.decode())
        return (k, v)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_stream_tcp_kill_resume():
    tmp = tempfile.mkdtemp()
    landing = os.path.join(tmp, "queue")

    # the app's source data: one word per message, landed in several files
    src = SourceConnector(args=["--connector", "w"], landing_dir=landing,
                          flush_every=50)
    src.connect()
    words = [w for w, n in sorted(WORDS.items()) for _ in range(n)]
    # deterministic interleave so every file mixes words
    words = [words[(i * 7) % TOTAL] for i in range(TOTAL)]
    for w in words:
        src.write(w)
    src.close()

    # the app module the launcher loads (machida application_setup contract)
    with open(os.path.join(tmp, "wc_tcp_app.py"), "w") as f:
        f.write(APP_MODULE % {"landing": landing})

    # python sink: receives the engine's final framed-JSON counts
    sink = SinkConnector(args=["--connector", "s", "--s-host", "127.0.0.1",
                               "--s-port", "0"],
                         required_params=("host", "port"),
                         decoder=_PairDecoder())
    sink.listen()

    src_port = _free_port()
    engine = subprocess.Popen(
        ["sbt", "-batch",
         "runMain graft.sources.connector.ConnectorWordCountDemo "
         "%d 127.0.0.1 %d %d" % (src_port, sink.port, TOTAL)],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    try:
        env = dict(os.environ, PYTHONPATH=os.pathsep.join(
            [_PYDIR, tmp, os.environ.get("PYTHONPATH", "")]))

        def sender(throttle, extra=()):
            return subprocess.Popen(
                [sys.executable, "-m", "graft.run",
                 "--application-module", "wc_tcp_app",
                 "--stream-tcp", "127.0.0.1:%d" % src_port,
                 "--throttle", str(throttle)] + list(extra),
                cwd=tmp, env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT)

        # incarnation 1: PROGRESS-BASED kill — read the sender's own
        # STREAM_TCP_PROGRESS counter off stdout and SIGKILL once sent is
        # inside [50, 250], so the kill lands mid-stream no matter how fast
        # or slow the engine starts (a fixed sleep raced engine startup: a
        # warm sbt cache let incarnation 1 finish all %d messages first,
        # after which the engine exited and incarnation 2 hung against the
        # dead port). Throttle keeps the window wide: 0.02 s/msg means
        # ~4 s of stream remain after the kill threshold trips.
        s1 = sender(0.02, ["--progress-every", "10",
                           "--give-up-after", "180"])
        kill_at = 60  # inside the [50, 250] mid-stream window
        seen = []
        armed = False
        deadline = time.time() + 240
        while time.time() < deadline:
            line = s1.stdout.readline()
            if not line:
                break  # sender stdout EOF — died on its own
            seen.append(line)
            if line.startswith(b"STREAM_TCP_PROGRESS sent="):
                if int(line.split(b"=", 1)[1]) >= kill_at:
                    armed = True
                    break
        assert armed, ("sender never reached sent=%d (died or stalled): %r"
                       % (kill_at, b"".join(seen)[-2000:]))
        s1.send_signal(signal.SIGKILL)
        s1.wait()
        s1.stdout.close()

        # incarnation 2: full speed, resumes at the engine's acked por.
        # --give-up-after bounds the reconnect loop: if the engine really is
        # gone, this asserts cleanly instead of spinning on ECONNREFUSED.
        s2 = sender(0, ["--give-up-after", "120"])
        out2, _ = s2.communicate(timeout=300)
        assert b"STREAM_TCP_DONE" in out2, out2.decode()[-2000:]

        # the engine ships the final counts once the total hits TOTAL —
        # exactly-once: any duplicate would overshoot a word's count, any
        # loss would time out before the snapshot ships
        got = {}
        deadline = time.time() + 240
        while len(got) < len(WORDS) and time.time() < deadline:
            pair = sink.read(timeout=5)
            if pair is not None:
                got[pair[0]] = int(pair[1])
        assert got == WORDS, (got, WORDS)
        print("ok python source -> scala engine -> python sink, "
              "SIGKILL mid-stream, exactly once (%d msgs)" % TOTAL)
    finally:
        sink.close()
        engine.wait(timeout=300)


def main():
    test_stream_tcp_kill_resume()
    print("ALL PYTHON STREAM-TCP TESTS PASSED")


if __name__ == "__main__":
    main()
