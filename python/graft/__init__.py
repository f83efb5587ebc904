"""graft Python API — the reference's Python application-builder surface
(machida: /root/reference/machida/lib/wallaroo/__init__.py) re-expressed
over PySpark.

A pipeline is declared exactly like a machida app::

    import graft

    lines = graft.source("Split and Count",
                         graft.ParquetSourceConfig("docs", path,
                                                   decoder=lambda r: r.text))
    pipeline = (lines
        .to(split)                       # @graft.computation_multi
        .key_by(extract_word)            # @graft.key_extractor
        .to(count_word)                  # @graft.state_computation
        .to_sink(graft.MemorySinkConfig()))
    app = graft.build_application("Word Count Application", pipeline)
    results = app.run(spark)             # -> one result per sink

Execution model: stages carry arbitrary pickled Python objects, exactly
the reference's per-message model, so they run on the RDD tier (Python
lambdas cannot enter Catalyst codegen — there is nothing to push down).
This module is the *parity veneer* for machida-style apps; anything with
relational shape belongs on the Scala column/Dataset tier
(graft.operators.*), which stays inside whole-stage codegen and is where
the 100 TB paths live. State computations here are per-key sequential
folds (the reference's single-actor-per-key semantics); aggregations use
the initial/update/combine/output contract so partials combine map-side.
"""

import pickle
import socket
import struct


class GraftParameterError(Exception):
    pass


def serialize(obj):
    return pickle.dumps(obj)


def deserialize(data):
    return pickle.loads(data)


# ---------------------------------------------------------------------------
# Time units (reference: nanoseconds are the base unit)
# ---------------------------------------------------------------------------

def nanoseconds(x):
    return x


def microseconds(x):
    return x * 1000


def milliseconds(x):
    return x * 1000 * 1000


def seconds(x):
    return x * 1000 * 1000 * 1000


def minutes(x):
    return seconds(x) * 60


def hours(x):
    return minutes(x) * 60


# ---------------------------------------------------------------------------
# Computations — the decorator surface
# ---------------------------------------------------------------------------

class _Wrapped(object):
    """Base for decorated user functions; instances are pickled to executors."""
    name = "anonymous"

    def __call__(self, *args):
        return self


class Computation(_Wrapped):
    is_multi = False
    is_stateful = False

    def __init__(self, name, func):
        self.name = name
        self.func = func

    def compute(self, data):
        return self.func(data)


class ComputationMulti(Computation):
    is_multi = True


class StateComputation(Computation):
    is_stateful = True

    def __init__(self, name, func, state_class, order=None):
        Computation.__init__(self, name, func)
        self.state_class = state_class
        # optional per-key fold order (e.g. event time) — the batch
        # equivalent of the Scala KeyedPipeline.toState order columns;
        # without it, fold order is partition arrival order, exactly a
        # multi-worker reference run
        self.order = order

    def initial_state(self):
        return self.state_class()

    def compute(self, data, state):
        return self.func(data, state)


class StateComputationMulti(StateComputation):
    is_multi = True


class KeyExtractor(_Wrapped):
    def __init__(self, func):
        self.func = func

    def extract_key(self, data):
        key = self.func(data)
        if isinstance(key, int):
            # reference normalizes int keys (machida chr()s them); keep the
            # int — Spark hash-partitions any hashable key
            return key
        return key


class Encoder(_Wrapped):
    def __init__(self, func):
        self.func = func

    def encode(self, data):
        return self.func(data)


class Decoder(_Wrapped):
    def __init__(self, func, header_length=4, length_fmt=">I"):
        self.func = func
        self._header_length = header_length
        self._length_fmt = length_fmt

    def header_length(self):
        return self._header_length

    def payload_length(self, bs):
        return struct.unpack(self._length_fmt, bs)[0]

    def decode(self, bs):
        return self.func(bs)


def computation(name):
    def wrap(func):
        return Computation(name, func)
    return wrap


def computation_multi(name):
    def wrap(func):
        return ComputationMulti(name, func)
    return wrap


def state_computation(name, state, order=None):
    def wrap(func):
        return StateComputation(name, func, state, order)
    return wrap


def state_computation_multi(name, state, order=None):
    def wrap(func):
        return StateComputationMulti(name, func, state, order)
    return wrap


def key_extractor(func):
    return KeyExtractor(func)


def encoder(func):
    return Encoder(func)


def decoder(header_length, length_fmt):
    def wrap(func):
        return Decoder(func, header_length, length_fmt)
    return wrap


# ---------------------------------------------------------------------------
# Aggregations + window builders (reference aggregations.pony contract:
# initial_accumulator / update(in, acc) mutates / combine pure / output)
# ---------------------------------------------------------------------------

class Aggregation(object):
    def name(self):
        return self.__class__.__name__

    def initial_accumulator(self):
        raise NotImplementedError

    def update(self, data, acc):
        raise NotImplementedError

    def combine(self, acc1, acc2):
        raise NotImplementedError

    def output(self, key, acc):
        raise NotImplementedError


def _validate_aggregation(agg):
    for m in ("initial_accumulator", "update", "combine", "output"):
        if not hasattr(agg, m):
            raise GraftParameterError(
                "Aggregation must have method '%s'" % m)


class RangeWindows(object):
    def __init__(self, wrange, slide, delay, agg, late_policy):
        _validate_aggregation(agg)
        self.range = wrange
        self.slide = slide
        self.delay = delay
        self.aggregation = agg
        self.late_data_policy = late_policy


class RangeWindowsBuilder(object):
    def __init__(self, wrange):
        self._range = wrange
        self._slide = None
        self._delay = None
        self._late = None

    def with_slide(self, slide):
        if self._slide is not None:
            raise GraftParameterError("with_slide() may only be called once")
        self._slide = slide
        return self

    def with_delay(self, delay):
        if self._delay is not None:
            raise GraftParameterError("with_delay() may only be called once")
        self._delay = delay
        return self

    def with_late_data_policy(self, policy):
        if self._late is not None:
            raise GraftParameterError(
                "with_late_data_policy() may only be called once")
        self._late = policy
        return self

    def over(self, aggregation_cls):
        return RangeWindows(self._range,
                            self._slide if self._slide is not None else self._range,
                            self._delay if self._delay is not None else 0,
                            aggregation_cls(),
                            self._late if self._late is not None else "drop")


class CountWindows(object):
    def __init__(self, count, agg):
        _validate_aggregation(agg)
        self.count = count
        self.aggregation = agg


class CountWindowsBuilder(object):
    def __init__(self, count):
        self._count = count

    def over(self, aggregation_cls):
        return CountWindows(self._count, aggregation_cls())


def range_windows(wrange):
    return RangeWindowsBuilder(wrange)


def count_windows(count):
    return CountWindowsBuilder(count)


# ---------------------------------------------------------------------------
# Source configs
# ---------------------------------------------------------------------------

class DataFrameSourceConfig(object):
    """Any PySpark DataFrame as a source; `decoder(row) -> message`."""

    def __init__(self, name, df, decoder=None, event_time=None):
        self.name = name
        self.df = df
        self.decoder = decoder
        self.event_time = event_time

    def to_tuple(self):
        return ("dataframe", self.name, self.decoder)

    def load(self, spark):
        rdd = self.df.rdd
        return rdd.map(self.decoder) if self.decoder else rdd


class ParquetSourceConfig(object):
    def __init__(self, name, path, decoder=None, event_time=None):
        self.name = name
        self.path = path
        self.decoder = decoder
        self.event_time = event_time

    def to_tuple(self):
        return ("parquet", self.name, self.path, self.decoder)

    def load(self, spark):
        rdd = spark.read.parquet(self.path).rdd
        return rdd.map(self.decoder) if self.decoder else rdd


class GenSourceConfig(object):
    """Reference GenSource: `gen.initial_value()` then `gen.apply(last)`.
    The stream is unbounded there; the batch runner takes `count` values.
    """

    def __init__(self, name, gen_instance, count=100, event_time=None):
        self.name = name
        self.gen = gen_instance
        self.count = count
        self.event_time = event_time

    def to_tuple(self):
        return ("gen", self.name, self.gen)

    def load(self, spark):
        vals = []
        if self.count > 0:
            v = self.gen.initial_value()
            vals.append(v)
            for _ in range(self.count - 1):
                v = self.gen.apply(v)
                vals.append(v)
        return spark.sparkContext.parallelize(vals)


class TCPSourceConfig(object):
    """Length-framed TCP read: connects to host:port, reads
    `header | payload` frames via the decoder contract until EOF. The
    batch twin of the reference's TCP source (a bounded replay, not a
    listener); unbounded socket streams live on the Scala tier
    (graft.sources.TcpStreamSource).
    """

    def __init__(self, name, host, port, decoder, valid=True,
                 parallelism=10, max_size=16384, max_received_count=50,
                 event_time=None):
        self.name = name
        self.host = host
        self.port = port
        self.decoder = decoder
        self.valid = valid
        self.parallelism = parallelism
        self.max_size = max_size
        self.max_received_count = max_received_count
        self.event_time = event_time

    def to_tuple(self):
        return ("tcp", self.name, self.host, self.port, self.decoder,
                self.valid, self.parallelism, self.max_size,
                self.max_received_count)

    def _read_exact(self, sock, n):
        buf = b""
        while len(buf) < n:
            chunk = sock.recv(n - len(buf))
            if not chunk:
                return None
            buf += chunk
        return buf

    def load(self, spark):
        msgs = []
        with socket.create_connection((self.host, int(self.port))) as sock:
            while True:
                header = self._read_exact(sock, self.decoder.header_length())
                if header is None:
                    break
                payload = self._read_exact(
                    sock, self.decoder.payload_length(header))
                if payload is None:
                    break
                msgs.append(self.decoder.decode(payload))
        return spark.sparkContext.parallelize(msgs)


class DirectoryQueueSourceConfig(object):
    """Streaming source over the at-least-once directory queue that
    `graft.experimental.SourceConnector` lands into (atomically renamed
    `land_*.jsonl` files of `{"value","event_time","key"}` records):
    `poll()` returns the messages of files that appeared since the last
    poll, in landing order — the machida run loop's ingest side. Files
    are never seen partially (the rename is the visibility barrier) and
    never re-read (processed names are tracked), so a batch is exactly
    the newly landed tail.
    """

    def __init__(self, name, landing_dir, decoder=None, event_time=None):
        import os
        self.name = name
        self.landing_dir = landing_dir
        self.decoder = decoder
        self.event_time = event_time
        self._seen = set()
        os.makedirs(landing_dir, exist_ok=True)

    def to_tuple(self):
        return ("directory_queue", self.name, self.landing_dir)

    def poll(self):
        import json as _json
        import os
        names = sorted(
            f for f in os.listdir(self.landing_dir)
            if f.startswith("land_") and f.endswith(".jsonl")
            and f not in self._seen)
        out = []
        for f in names:
            with open(os.path.join(self.landing_dir, f)) as fh:
                for line in fh:
                    line = line.strip()
                    if line:
                        rec = _json.loads(line)
                        msg = rec["value"]
                        if self.decoder:
                            msg = self.decoder(msg)
                        out.append((rec.get("event_time", 0), msg))
            self._seen.add(f)
        return out

    def load(self, spark):
        """Batch fallback: everything landed so far, one RDD."""
        msgs = [m for _, m in self.poll()]
        return spark.sparkContext.parallelize(msgs)


# ---------------------------------------------------------------------------
# Sink configs
# ---------------------------------------------------------------------------

class MemorySinkConfig(object):
    """Collects results to the driver (bounded outputs only — tests and
    interactive use, like the reference's examples printing to stdout)."""

    def __init__(self, encoder=None):
        self.encoder = encoder

    def to_tuple(self):
        return ("memory", self.encoder)

    def write(self, spark, rdd):
        out = rdd.collect()
        if self.encoder:
            return [self.encoder.encode(m) for m in out]
        return out


class ParquetSinkConfig(object):
    """Messages must be Rows, dicts, or tuples (+ `columns` names)."""

    def __init__(self, path, columns=None):
        self.path = path
        self.columns = columns

    def to_tuple(self):
        return ("parquet", self.path, self.columns)

    def write(self, spark, rdd):
        df = spark.createDataFrame(rdd, self.columns) \
            if self.columns else spark.createDataFrame(rdd)
        df.write.mode("overwrite").parquet(self.path)
        return self.path


class CsvSinkConfig(object):
    def __init__(self, path, columns=None):
        self.path = path
        self.columns = columns

    def to_tuple(self):
        return ("csv", self.path, self.columns)

    def write(self, spark, rdd):
        df = spark.createDataFrame(rdd, self.columns) \
            if self.columns else spark.createDataFrame(rdd)
        df.write.mode("overwrite").option("header", "true").csv(self.path)
        return self.path


class TCPSinkConfig(object):
    """Encoded messages sent over TCP from the EXECUTORS (one connection
    per partition — the scale shape; never a driver collect)."""

    def __init__(self, host, port, encoder):
        self.host = host
        self.port = port
        self.encoder = encoder

    def to_tuple(self):
        return ("tcp", self.host, self.port, self.encoder)

    def write(self, spark, rdd):
        host, port, enc = self.host, int(self.port), self.encoder

        def send(partition):
            msgs = list(partition)
            if not msgs:
                return
            with socket.create_connection((host, port)) as sock:
                for m in msgs:
                    sock.sendall(enc.encode(m))

        rdd.foreachPartition(send)
        return None


# ---------------------------------------------------------------------------
# Pipeline builder
# ---------------------------------------------------------------------------

class Pipeline(object):
    """Immutable stage list; every builder call returns a new Pipeline
    (reference Pipeline.clone semantics)."""

    def __init__(self, stages, closed=False):
        self._stages = tuple(stages)
        self._closed = closed

    def _require_open(self):
        if self._closed:
            raise GraftParameterError("You can't add stages after to_sink/s.")

    def _with(self, stage, closed=False):
        self._require_open()
        return Pipeline(self._stages + (stage,), closed)

    def to(self, computation):
        if isinstance(computation, RangeWindows):
            return self._with(("to_range_windows", computation))
        if isinstance(computation, CountWindows):
            return self._with(("to_count_windows", computation))
        if isinstance(computation, Aggregation):
            # a bare Aggregation is a global-window state computation
            # (reference aggregations.pony:45-50 builds exactly that)
            return self._with(("to_aggregation", computation))
        if isinstance(computation, StateComputation):
            return self._with(("to_state", computation))
        if isinstance(computation, Computation):
            return self._with(("to", computation))
        raise GraftParameterError(
            "to() expects a decorated computation or a windows spec, got %r"
            % (computation,))

    def key_by(self, extractor):
        if not isinstance(extractor, KeyExtractor):
            raise GraftParameterError(
                "key_by() expects an @graft.key_extractor")
        return self._with(("key_by", extractor))

    def collect(self):
        return self._with(("collect",))

    def merge(self, other):
        self._require_open()
        other._require_open()
        return self._with(("merge", other._stages))

    def to_sink(self, sink_config):
        return self._with(("to_sink", sink_config), closed=True)

    def to_sinks(self, sink_configs):
        return self._with(("to_sinks", tuple(sink_configs)), closed=True)


def source(name, source_config):
    return Pipeline((("source", name, source_config),))


def build_application(app_name, pipeline):
    if not pipeline._closed:
        raise GraftParameterError("An application must end with to_sink/s.")
    return Application(app_name, pipeline._stages)


# ---------------------------------------------------------------------------
# Executor
# ---------------------------------------------------------------------------

def _apply_stateless(rdd, keyed, comp):
    if keyed:
        if comp.is_multi:
            return rdd.flatMap(
                lambda kv: [(kv[0], o) for o in comp.compute(kv[1])])
        return rdd.map(lambda kv: (kv[0], comp.compute(kv[1]))) \
                  .filter(lambda kv: kv[1] is not None)
    if comp.is_multi:
        return rdd.flatMap(comp.compute)
    return rdd.map(comp.compute).filter(lambda m: m is not None)


def _apply_state(rdd, keyed, comp):
    if not keyed:
        raise GraftParameterError(
            "state computations need key_by() or collect() first")

    def fold(kv):
        key, msgs = kv
        state = comp.initial_state()
        outs = []
        if comp.order is not None:
            msgs = sorted(msgs, key=comp.order)
        for m in msgs:
            res = comp.compute(m, state)
            if res is None:
                continue
            if comp.is_multi:
                outs.extend((key, o) for o in res)
            else:
                outs.append((key, res))
        return outs

    # one sequential fold per key — the reference's actor-per-key model;
    # message order within a key is partition order, exactly as a
    # multi-worker reference run (no cross-source ordering either)
    return rdd.groupByKey().flatMap(fold)


def _apply_aggregation(rdd, keyed, agg):
    """Global-window aggregation: initial/update/combine/output with
    MAP-SIDE partials (combineByKey merges accumulators with
    `agg.combine` before the key shuffle — the mergeable-aggregate scale
    shape, not a per-key replay)."""
    if not keyed:
        raise GraftParameterError(
            "aggregations need key_by() or collect() first")

    def create(m):
        acc = agg.initial_accumulator()
        agg.update(m, acc)
        return acc

    def add(acc, m):
        agg.update(m, acc)
        return acc

    return (rdd.combineByKey(create, add, agg.combine)
            .map(lambda kv: (kv[0], agg.output(kv[0], kv[1])))
            .filter(lambda kv: kv[1] is not None))


def _window_starts(ts, wrange, slide):
    """Epoch-aligned window starts containing ts (tumbling when
    slide == range; overlapping when slide < range): the multiples of
    `slide` in (ts - wrange, ts] — including NEGATIVE starts for events
    near the epoch, exactly like the Scala sliding assignment
    (Windows.withSliding's sequence(wMin, wMax))."""
    last = (ts // slide) * slide
    starts = []
    s = last
    while s + wrange > ts:
        starts.append(s)
        s -= slide
    return starts


def _apply_range_windows(rdd, keyed, win):
    if not keyed:
        raise GraftParameterError("range windows need key_by() first")
    agg = win.aggregation
    wrange, slide = win.range, win.slide

    def assign(kv):
        (key, ts), m = (kv[0], kv[1][0]), kv[1][1]
        return [((key, s), m) for s in _window_starts(ts, wrange, slide)]

    def finish(kv):
        (key, _start), msgs = kv
        acc = agg.initial_accumulator()
        for m in msgs:
            agg.update(m, acc)
        out = agg.output(key, acc)
        return [] if out is None else [(key, out)]

    # rdd elements here are (key, (event_time, msg)); batch replay means
    # every message is on time — delay / late policies only bite on live
    # streams (the Scala StatefulWindows tier implements all three)
    return rdd.flatMap(assign).groupByKey().flatMap(finish)


def _apply_count_windows(rdd, keyed, win):
    if not keyed:
        raise GraftParameterError("count windows need key_by() first")
    agg, n = win.aggregation, win.count

    def fold(kv):
        key, msgs = kv
        outs = []
        acc = agg.initial_accumulator()
        filled = 0
        for m in msgs:
            agg.update(m, acc)
            filled += 1
            if filled == n:
                out = agg.output(key, acc)
                if out is not None:
                    outs.append((key, out))
                acc = agg.initial_accumulator()
                filled = 0
        if filled > 0:
            out = agg.output(key, acc)
            if out is not None:
                outs.append((key, out))
        return outs

    return rdd.groupByKey().flatMap(fold)


class Application(object):
    def __init__(self, name, stages):
        self.name = name
        self._stages = stages

    def run(self, spark):
        """Execute the pipeline; returns the list of sink results
        (MemorySinkConfig entries yield message lists)."""
        rdd, keyed, results = self._execute(spark, self._stages)
        return results

    def run_stream(self, spark=None, poll_interval=0.25, idle_polls=None,
                   stop=None, on_batch=None):
        """machida-style CONTINUOUS run: a micro-batch loop over a
        streaming source config (one with `poll()`, e.g.
        [[DirectoryQueueSourceConfig]]). Per poll, newly landed messages
        flow through the stages message-at-a-time; state computations and
        aggregations keep per-key state ACROSS batches (the reference's
        one-actor-per-key model — this runner IS that single worker
        process; the multi-executor scale tier is the Scala engine), and
        aggregations emit their updated output per message, so a sink's
        LAST emission per key is the current value — exactly machida's
        running-count behavior.

        Stops when `stop()` returns True, or after `idle_polls` empty
        polls (None = run until stopped). Returns the sink results
        (memory sinks: list of every emission, in order). `on_batch`
        (n_msgs -> None) fires after each non-empty batch for tests.
        """
        import time as _time
        stages = self._stages
        if stages[0][0] != "source":
            raise GraftParameterError("pipeline must start with source()")
        cfg = stages[0][2]
        if not hasattr(cfg, "poll"):
            raise GraftParameterError(
                "run_stream needs a streaming source config with poll(), "
                "e.g. DirectoryQueueSourceConfig")
        state = {}       # stage index -> per-key state / accumulator
        window_acc = {}  # stage index -> (key, window_start) -> accumulator
        sinks = [list() for s in stages if s[0] in ("to_sink", "to_sinks")]
        idle = 0
        while True:
            if stop is not None and stop():
                break
            batch = cfg.poll()
            if not batch:
                idle += 1
                if idle_polls is not None and idle >= idle_polls:
                    break
                _time.sleep(poll_interval)
                continue
            idle = 0
            self._stream_batch(batch, stages, state, window_acc, sinks)
            if on_batch is not None:
                on_batch(len(batch))
        # end-of-stream: range/count windows flush their open accumulators
        self._stream_flush(stages, state, window_acc, sinks)
        return sinks

    def run_stream_tcp(self, host, port, stream_id=1, stream_name=None,
                       cookie="", event_time=0, throttle_s=0.0,
                       progress_every=0, give_up_after_s=None):
        """Feed the app's streaming source into a SCALA engine over the
        LIVE connector socket (`spark.readStream.format("graft-connector")`)
        with at-least-once resume — the machida topology where the python
        process is the source connector and the distributed engine runs
        the pipeline. The source must be a [[DirectoryQueueSourceConfig]]
        (the replayable boundary); its landing dir is wrapped in a
        `graft.experimental.DirectoryQueueSource` whose por is the global
        message index, so a killed sender re-Notifies and re-sends only
        past the engine's acked position. Returns (sent, final_por).
        """
        from .experimental import DirectoryQueueSource
        from .wire import TcpAtLeastOnceSender
        stages = self._stages
        if stages[0][0] != "source":
            raise GraftParameterError("pipeline must start with source()")
        cfg = stages[0][2]
        if not isinstance(cfg, DirectoryQueueSourceConfig):
            raise GraftParameterError(
                "run_stream_tcp needs a DirectoryQueueSourceConfig source "
                "(the replayable landing-dir boundary)")
        name = stream_name or cfg.name
        source = DirectoryQueueSource(cfg.landing_dir, name=name,
                                      throttle_s=throttle_s)
        sender = TcpAtLeastOnceSender(host, int(port), cookie=cookie,
                                      program=self.name, instance=name,
                                      progress_every=progress_every)
        sender.join(source, stream_id=stream_id, stream_name=name,
                    event_time=event_time, give_up_after_s=give_up_after_s)
        return (sender.sent, source.acked_por)

    def _stream_batch(self, batch, stages, state, window_acc, sinks):
        """One micro-batch through the stage list. Messages ride as
        (key, event_time, value) triples; key is None until key_by."""
        msgs = [(None, et, m) for (et, m) in batch]
        self._stream_stages(msgs, stages, state, window_acc, sinks,
                            flush=False)

    def _stream_flush(self, stages, state, window_acc, sinks):
        self._stream_stages([], stages, state, window_acc, sinks,
                            flush=True)

    def _stream_stages(self, msgs, stages, state, window_acc, sinks,
                       flush):
        sink_i = 0
        for si, stage in enumerate(stages):
            kind = stage[0]
            if kind == "source":
                continue
            elif kind == "to":
                comp = stage[1]
                out = []
                for (k, et, m) in msgs:
                    r = comp.compute(m)
                    if r is None:
                        continue
                    if comp.is_multi:
                        out.extend((k, et, o) for o in r)
                    else:
                        out.append((k, et, r))
                msgs = out
            elif kind == "key_by":
                ex = stage[1]
                msgs = [(ex.extract_key(m), et, m) for (_, et, m) in msgs]
            elif kind == "collect":
                msgs = [(0, et, m) for (_, et, m) in msgs]
            elif kind == "to_state":
                comp = stage[1]
                st = state.setdefault(si, {})
                out = []
                for (k, et, m) in msgs:
                    if k is None:
                        raise GraftParameterError(
                            "state computations need key_by()/collect()")
                    if k not in st:
                        st[k] = comp.initial_state()
                    r = comp.compute(m, st[k])
                    if r is None:
                        continue
                    if comp.is_multi:
                        out.extend((k, et, o) for o in r)
                    else:
                        out.append((k, et, r))
                msgs = out
            elif kind == "to_aggregation":
                agg = stage[1]
                st = state.setdefault(si, {})
                out = []
                for (k, et, m) in msgs:
                    if k is None:
                        raise GraftParameterError(
                            "aggregations need key_by()/collect()")
                    if k not in st:
                        st[k] = agg.initial_accumulator()
                    agg.update(m, st[k])
                    r = agg.output(k, st[k])
                    if r is not None:
                        out.append((k, et, r))
                msgs = out
            elif kind == "to_range_windows":
                win = stage[1]
                acc = window_acc.setdefault(si, {})
                agg = win.aggregation
                for (k, et, m) in msgs:
                    for s in _window_starts(et, win.range, win.slide):
                        wk = (k, s)
                        if wk not in acc:
                            acc[wk] = agg.initial_accumulator()
                        agg.update(m, acc[wk])
                if flush:
                    out = []
                    for (k, s) in sorted(acc.keys()):
                        r = agg.output(k, acc[(k, s)])
                        if r is not None:
                            out.append((k, s, r))
                    msgs = out
                else:
                    msgs = []  # windows emit on flush (end of stream)
            elif kind == "to_count_windows":
                win = stage[1]
                agg, n = win.aggregation, win.count
                st = state.setdefault(si, {})
                out = []
                for (k, et, m) in msgs:
                    acc, filled = st.get(k, (None, 0))
                    if acc is None:
                        acc = agg.initial_accumulator()
                    agg.update(m, acc)
                    filled += 1
                    if filled == n:
                        r = agg.output(k, acc)
                        if r is not None:
                            out.append((k, et, r))
                        acc, filled = None, 0
                    st[k] = (acc, filled)
                if flush:
                    for k in sorted(st.keys()):
                        acc, filled = st[k]
                        if filled > 0:
                            r = agg.output(k, acc)
                            if r is not None:
                                out.append((k, 0, r))
                        st[k] = (None, 0)
                msgs = out
            elif kind == "merge":
                raise GraftParameterError(
                    "merge() is not supported in run_stream yet — run "
                    "each branch as its own streaming pipeline")
            elif kind in ("to_sink", "to_sinks"):
                cfgs = (stage[1],) if kind == "to_sink" else stage[1]
                for cfg in cfgs:
                    enc = getattr(cfg, "encoder", None)
                    for (_, _, m) in msgs:
                        sinks[sink_i].append(enc.encode(m) if enc else m)
                sink_i += 1
            else:
                raise GraftParameterError("unknown stage %r" % (kind,))

    def _execute(self, spark, stages):
        rdd = None
        keyed = False
        event_time = None
        results = []
        for stage in stages:
            kind = stage[0]
            if kind == "source":
                cfg = stage[2]
                rdd = cfg.load(spark)
                event_time = getattr(cfg, "event_time", None)
                keyed = False
            elif kind == "merge":
                other, other_keyed, other_results = \
                    self._execute(spark, stage[1])
                if other_keyed != keyed:
                    raise GraftParameterError(
                        "merge() requires both pipelines at the same "
                        "keyed/unkeyed stage")
                rdd = rdd.union(other)
                results.extend(other_results)
            elif kind == "to":
                rdd = _apply_stateless(rdd, keyed, stage[1])
            elif kind == "to_state":
                rdd = _apply_state(rdd, keyed, stage[1])
                keyed = True  # outputs stay key-routed, reference semantics
            elif kind == "to_aggregation":
                rdd = _apply_aggregation(rdd, keyed, stage[1])
            elif kind == "to_range_windows":
                if event_time is None:
                    raise GraftParameterError(
                        "range windows need an event_time extractor on "
                        "the source config")
                et = event_time
                timed = rdd.map(lambda kv: (kv[0], (et(kv[1]), kv[1])))
                rdd = _apply_range_windows(timed, keyed, stage[1])
            elif kind == "to_count_windows":
                rdd = _apply_count_windows(rdd, keyed, stage[1])
            elif kind == "key_by":
                ex = stage[1]
                base = rdd.map(lambda kv: kv[1]) if keyed else rdd
                rdd = base.map(lambda m: (ex.extract_key(m), m))
                keyed = True
            elif kind == "collect":
                base = rdd.map(lambda kv: kv[1]) if keyed else rdd
                rdd = base.map(lambda m: (0, m))
                keyed = True
            elif kind == "to_sink":
                results.append(self._write(spark, rdd, keyed, stage[1]))
            elif kind == "to_sinks":
                flat = self._strip(rdd, keyed).cache()
                for cfg in stage[1]:
                    results.append(cfg.write(spark, flat))
                flat.unpersist()
            else:
                raise GraftParameterError("unknown stage %r" % (kind,))
        return rdd, keyed, results

    def _strip(self, rdd, keyed):
        return rdd.map(lambda kv: kv[1]) if keyed else rdd

    def _write(self, spark, rdd, keyed, cfg):
        return cfg.write(spark, self._strip(rdd, keyed))


# ---------------------------------------------------------------------------
# CLI helpers (reference arg-parsing surface)
# ---------------------------------------------------------------------------

def tcp_parse_input_addrs(args):
    """`-i N1@H1:P1,N2@H2:P2` -> [(N1, H1, P1), ...]"""
    import argparse
    parser = argparse.ArgumentParser(prog="graft")
    parser.add_argument("-i", "--in", dest="input_addrs", required=True)
    addrs = parser.parse_known_args(args)[0].input_addrs
    return [tuple(x.replace("@", ":").split(":")) for x in addrs.split(",")]


def tcp_parse_output_addrs(args):
    """`-o H1:P1,H2:P2` -> [(H1, P1), ...]"""
    import argparse
    parser = argparse.ArgumentParser(prog="graft")
    parser.add_argument("-o", "--out", dest="output_addrs", required=True)
    addrs = parser.parse_known_args(args)[0].output_addrs
    return [tuple(x.split(":")) for x in addrs.split(",")]


def _kafka_parse_broker(broker):
    """`host[:port]` -> (host, port); port defaults to 9092."""
    host_and_port = broker.split(":")
    host = host_and_port[0]
    port = "9092"
    if len(host_and_port) == 2:
        port = host_and_port[1]
    return (host, port)


def kafka_parse_source_options(args):
    """Reference `--kafka_source_*` argv -> (name, topic, brokers,
    log_level), brokers as [(host, port), ...]."""
    import argparse
    parser = argparse.ArgumentParser(prog="graft")
    parser.add_argument("--kafka_source_name", dest="name")
    parser.add_argument("--kafka_source_topic", dest="topic", default="")
    parser.add_argument("--kafka_source_brokers", dest="brokers", default="")
    parser.add_argument("--kafka_source_log_level", dest="log_level",
                        default="Warn",
                        choices=["Fine", "Info", "Warn", "Error"])
    known = parser.parse_known_args(args)[0]
    brokers = [_kafka_parse_broker(b) for b in known.brokers.split(",")]
    return (known.name, known.topic, brokers, known.log_level)


def kafka_parse_sink_options(args):
    """Reference `--kafka_sink_*` argv -> (name, topic, brokers, log_level,
    max_produce_buffer_ms, max_message_size); name is "" pending named
    sinks, exactly like the reference."""
    import argparse
    parser = argparse.ArgumentParser(prog="graft")
    parser.add_argument("--kafka_sink_topic", dest="topic", default="")
    parser.add_argument("--kafka_sink_brokers", dest="brokers", default="")
    parser.add_argument("--kafka_sink_log_level", dest="log_level",
                        default="Warn",
                        choices=["Fine", "Info", "Warn", "Error"])
    parser.add_argument("--kafka_sink_max_produce_buffer_ms",
                        dest="max_produce_buffer_ms", type=int, default=0)
    parser.add_argument("--kafka_sink_max_message_size",
                        dest="max_message_size", type=int, default=100000)
    known = parser.parse_known_args(args)[0]
    brokers = [_kafka_parse_broker(b) for b in known.brokers.split(",")]
    return ("", known.topic, brokers, known.log_level,
            known.max_produce_buffer_ms, known.max_message_size)
