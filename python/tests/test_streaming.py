"""Streaming runner test: the SAME Python word_count pipeline definition
that passes batch parity runs CONTINUOUSLY — a machida-style micro-batch
loop tailing the at-least-once directory queue while a SourceConnector
lands documents chunk by chunk from another thread. The runner's final
per-word counts must equal the Scala engine's q_word_count exactly, and
the consumption must be genuinely incremental (several non-empty polls,
interleaved with the sender).

Run:  python3 python/tests/test_streaming.py
Env:  GRAFT_SF_DIR     testdata dir (default /root/testdata/sf0.001)
      GRAFT_SCALA_OUT  dir with Verify output (q_word_count/); generated
                       via sbt if absent.
"""

import os
import sys
import tempfile
import threading
import time

_PYDIR = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, _PYDIR)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import graft
import graft.experimental as experimental
from test_parity import split, extract_word, CountAgg, scala_out, SF_DIR

import duckdb


def scala_word_counts(scala_dir):
    rows = duckdb.sql(
        "SELECT word, n FROM '%s/q_word_count/*.parquet'"
        % scala_dir).fetchall()
    return {w: n for (w, n) in rows}


def test_word_count_stream():
    scala_dir = scala_out()
    want = scala_word_counts(scala_dir)

    texts = [r[0] for r in duckdb.sql(
        "SELECT text FROM '%s/documents.parquet' ORDER BY doc_id"
        % SF_DIR).fetchall()]
    landing = tempfile.mkdtemp(prefix="graft_stream_q_")

    pipeline = (graft.source(
            "Split and Count (stream)",
            graft.DirectoryQueueSourceConfig("docs", landing))
        .to(split)
        .key_by(extract_word)
        .to(CountAgg())
        .to_sink(graft.MemorySinkConfig()))
    app = graft.build_application("Streaming Word Count", pipeline)

    batches = []
    done = threading.Event()
    result = {}

    def run():
        sinks = app.run_stream(
            poll_interval=0.05,
            stop=done.is_set,
            idle_polls=None,
            on_batch=batches.append)
        result["emissions"] = sinks[0]

    runner = threading.Thread(target=run, daemon=True)
    runner.start()

    # the sender: land the corpus in 8 chunks with gaps, so consumption
    # interleaves — each flush is one atomically renamed queue file
    conn = experimental.SourceConnector(
        args=["--connector", "docs"], landing_dir=landing,
        flush_every=10 ** 9)
    conn.connect()
    chunk = max(1, len(texts) // 8)
    for i in range(0, len(texts), chunk):
        for t in texts[i:i + chunk]:
            conn.write(t)
        conn.flush()
        time.sleep(0.3)
    conn.close()

    # let the runner drain everything landed, then stop it
    deadline = time.time() + 60
    while time.time() < deadline and sum(batches) < conn.count:
        time.sleep(0.2)
    done.set()
    runner.join(30)
    assert not runner.is_alive(), "stream runner did not stop"

    emissions = result["emissions"]
    # running-count semantics: the LAST emission per word is its count
    got = {}
    for (w, n) in emissions:
        got[w] = n
    assert got == want, (
        "stream word_count mismatch: %d words vs %d; e.g. %r"
        % (len(got), len(want),
           sorted(set(got.items()) ^ set(want.items()))[:5]))
    # continuity: the corpus arrived over several distinct polls, and
    # counts grew monotonically per word
    assert len(batches) >= 4, "consumed in %d polls — not incremental" % (
        len(batches),)
    seen = {}
    for (w, n) in emissions:
        assert n == seen.get(w, 0) + 1, "non-monotonic count for %r" % (w,)
        seen[w] = n
    print("ok streaming word_count parity (%d words, %d polls, %d msgs)"
          % (len(got), len(batches), conn.count))


def test_stream_stateless_and_count_windows():
    landing = tempfile.mkdtemp(prefix="graft_stream_cw_")

    @graft.computation(name="parse int")
    def parse(s):
        return int(s)

    @graft.key_extractor
    def mod3(v):
        return v % 3

    class SumAgg(graft.Aggregation):
        def initial_accumulator(self):
            return [0]

        def update(self, v, acc):
            acc[0] += v

        def combine(self, a, b):
            return [a[0] + b[0]]

        def output(self, key, acc):
            return (key, acc[0])

    pipeline = (graft.source(
            "ints", graft.DirectoryQueueSourceConfig("ints", landing))
        .to(parse)
        .key_by(mod3)
        .to(graft.count_windows(4).over(SumAgg))
        .to_sink(graft.MemorySinkConfig()))
    app = graft.build_application("Count Windows Stream", pipeline)

    done = threading.Event()
    result = {}

    def run():
        result["sinks"] = app.run_stream(
            poll_interval=0.05, stop=done.is_set, idle_polls=None)

    runner = threading.Thread(target=run, daemon=True)
    runner.start()

    conn = experimental.SourceConnector(
        args=["--connector", "ints"], landing_dir=landing,
        flush_every=10 ** 9)
    conn.connect()
    for lo in range(0, 30, 10):
        for v in range(lo, lo + 10):
            conn.write(str(v))
        conn.flush()
        time.sleep(0.2)
    conn.close()
    time.sleep(2.0)
    done.set()
    runner.join(30)
    assert not runner.is_alive()

    got = result["sinks"][0]
    # 30 ints over keys 0/1/2 → 10 per key: two full 4-windows per key
    # mid-stream + one 2-remainder window flushed at end of stream
    per_key = {}
    for (k, s) in got:
        per_key.setdefault(k, []).append(s)
    assert set(per_key) == {0, 1, 2}
    for k, sums in per_key.items():
        assert len(sums) == 3, (k, sums)
        expect_total = sum(v for v in range(30) if v % 3 == k)
        assert sum(sums) == expect_total, (k, sums)
    print("ok streaming count windows (%d emissions)" % (len(got),))


def test_stream_range_windows():
    """Event-time range windows in stream mode: the queue's event_time
    field drives window assignment across polls; open windows flush at
    end of stream with the same totals as a batch replay."""
    landing = tempfile.mkdtemp(prefix="graft_stream_rw_")

    @graft.computation(name="parse")
    def parse(s):
        return int(s)

    @graft.key_extractor
    def one_key(v):
        return "k"

    class SumAgg(graft.Aggregation):
        def initial_accumulator(self):
            return [0]

        def update(self, v, acc):
            acc[0] += v

        def combine(self, a, b):
            return [a[0] + b[0]]

        def output(self, key, acc):
            return acc[0]

    pipeline = (graft.source(
            "vals", graft.DirectoryQueueSourceConfig("vals", landing))
        .to(parse)
        .key_by(one_key)
        .to(graft.range_windows(graft.seconds(10)).over(SumAgg))
        .to_sink(graft.MemorySinkConfig()))
    app = graft.build_application("Range Windows Stream", pipeline)

    done = threading.Event()
    result = {}

    def run():
        result["sinks"] = app.run_stream(
            poll_interval=0.05, stop=done.is_set, idle_polls=None)

    runner = threading.Thread(target=run, daemon=True)
    runner.start()

    conn = experimental.SourceConnector(
        args=["--connector", "vals"], landing_dir=landing,
        flush_every=10 ** 9)
    conn.connect()
    # value i at event time i seconds, landed in three separate polls:
    # tumbling 10s windows [0,10) [10,20) [20,30)
    for lo in (0, 10, 20):
        for v in range(lo, lo + 10):
            conn.write(str(v), event_time=graft.seconds(v))
        conn.flush()
        time.sleep(0.2)
    conn.close()
    time.sleep(1.5)
    done.set()
    runner.join(30)
    assert not runner.is_alive()

    got = sorted(result["sinks"][0])
    want = sorted(sum(range(lo, lo + 10)) for lo in (0, 10, 20))
    assert got == want, (got, want)
    print("ok streaming range windows (%r)" % (got,))


def main():
    test_word_count_stream()
    test_stream_stateless_and_count_windows()
    test_stream_range_windows()
    print("ALL PYTHON STREAMING TESTS PASSED")


if __name__ == "__main__":
    main()
