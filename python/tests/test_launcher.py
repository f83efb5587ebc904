"""Launcher test: a machida-shaped app module (application_setup(args))
runs via `python -m graft.run` in both modes — batch over parquet and
--stream over the directory queue — producing the same word counts.

Run:  python3 python/tests/test_launcher.py
"""

import os
import subprocess
import sys
import tempfile
import textwrap

_PYDIR = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, _PYDIR)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.001")

APP = textwrap.dedent('''
    import graft

    @graft.computation_multi(name="split into words")
    def split(text):
        import re
        return [w for w in re.split("[^a-z]+", text.lower()) if w]

    @graft.key_extractor
    def extract_word(word):
        return word

    class CountAgg(graft.Aggregation):
        def initial_accumulator(self):
            return [0]
        def update(self, _w, acc):
            acc[0] += 1
        def combine(self, a, b):
            return [a[0] + b[0]]
        def output(self, key, acc):
            return (key, acc[0])

    def application_setup(args):
        mode = args[args.index("--wc-source") + 1]
        if mode == "parquet":
            src = graft.ParquetSourceConfig(
                "docs", args[args.index("--wc-path") + 1],
                decoder=lambda r: r.text)
        else:
            src = graft.DirectoryQueueSourceConfig(
                "docs", args[args.index("--wc-path") + 1])
        pipeline = (graft.source("Split and Count", src)
            .to(split)
            .key_by(extract_word)
            .to(CountAgg())
            .to_sink(graft.MemorySinkConfig()))
        return graft.build_application("Word Count", pipeline)
''')


def parse_counts(stdout):
    got = {}
    for line in stdout.splitlines():
        if line.startswith("sink[0] ("):
            word, n = eval(line[len("sink[0] "):])
            got[word] = n  # streaming: later (running) emissions win
    return got


def run_launcher(workdir, extra):
    env = dict(os.environ)
    env["PYTHONPATH"] = _PYDIR + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-m", "graft.run",
         "--application-module", "wc_app"] + extra,
        cwd=workdir, env=env, capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    return proc.stdout


def main():
    workdir = tempfile.mkdtemp(prefix="graft_launcher_")
    with open(os.path.join(workdir, "wc_app.py"), "w") as f:
        f.write(APP)

    batch = parse_counts(run_launcher(workdir, [
        "--wc-source", "parquet",
        "--wc-path", os.path.join(SF_DIR, "documents.parquet")]))
    assert batch and sum(batch.values()) > 0
    print("ok launcher batch mode (%d words)" % len(batch))

    # stream mode: land the same corpus into a queue dir first, then run
    # with an idle-poll stop — counts must match the batch run exactly
    import duckdb
    from graft.experimental import SourceConnector
    landing = tempfile.mkdtemp(prefix="graft_launcher_q_")
    conn = SourceConnector(args=["--connector", "docs"],
                           landing_dir=landing, flush_every=100)
    conn.connect()
    for (t,) in duckdb.sql(
            "SELECT text FROM '%s/documents.parquet' ORDER BY doc_id"
            % SF_DIR).fetchall():
        conn.write(t)
    conn.close()

    stream = parse_counts(run_launcher(workdir, [
        "--stream", "--idle-polls", "8", "--poll-interval", "0.1",
        "--wc-source", "queue", "--wc-path", landing]))
    assert stream == batch, (
        "stream/batch mismatch: %r" % (
            sorted(set(stream.items()) ^ set(batch.items()))[:5],))
    print("ok launcher stream mode matches batch (%d words)" % len(stream))
    print("ALL LAUNCHER TESTS PASSED")


if __name__ == "__main__":
    main()
