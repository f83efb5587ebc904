"""Mock-service tests for the thin connector adapters
(graft.connectors): each adapter's glue logic — what is polled, what is
written to the engine boundary, what lands on the service — verified
against in-memory mock clients, since the service SDKs (boto3, redis-py,
pika) are not in this environment.

Run:  python3 python/tests/test_connectors.py   (no engine needed)
"""

import json
import os
import socket
import struct
import sys
import tempfile
import threading

_PYDIR = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, _PYDIR)

from graft import connectors
from graft.experimental import SinkConnector, SourceConnector


def _source(tmp):
    c = SourceConnector(args=["--connector", "t"], landing_dir=tmp,
                        flush_every=100)
    c.connect()
    return c


def _landed(tmp):
    rows = []
    for f in sorted(os.listdir(tmp)):
        if f.startswith("land_"):
            with open(os.path.join(tmp, f)) as fh:
                rows += [json.loads(l)["value"] for l in fh if l.strip()]
    return rows


def test_kinesis_source():
    class MockKinesis(object):
        def __init__(self):
            self.iterator_requests = []
            self.batches = [
                {"Records": [{"Data": b"k-rec-1"}, {"Data": b"k-rec-2"}],
                 "NextShardIterator": "it-2"},
                {"Records": [{"Data": b"k-rec-3"}],
                 "NextShardIterator": "it-3"},
                {"Records": [], "NextShardIterator": "it-4"},
            ]

        def get_shard_iterator(self, **kw):
            self.iterator_requests.append(kw)
            return {"ShardIterator": "it-1"}

        def get_records(self, ShardIterator, Limit):
            assert ShardIterator.startswith("it-")
            return self.batches[int(ShardIterator.split("-")[1]) - 1]

    tmp = tempfile.mkdtemp()
    mock = MockKinesis()
    connectors.kinesis_source(_source(tmp), "events", "shard-0", client=mock,
                              poll_interval=0, max_batches=3)
    assert mock.iterator_requests == [{
        "StreamName": "events", "ShardId": "shard-0",
        "ShardIteratorType": "LATEST"}]
    assert _landed(tmp) == ["k-rec-1", "k-rec-2", "k-rec-3"]
    print("ok kinesis_source polls shards into the landing queue")


def test_redis_subscriber_source():
    class MockPubSub(object):
        def __init__(self):
            self.subscribed = None

        def subscribe(self, topic):
            self.subscribed = topic

        def listen(self):
            yield {"type": "subscribe", "data": 1}  # redis sends this first
            yield {"type": "message", "data": b"r1"}
            yield {"type": "message", "data": b"r2"}

    class MockRedis(object):
        def __init__(self):
            self.ps = MockPubSub()

        def pubsub(self):
            return self.ps

    tmp = tempfile.mkdtemp()
    mock = MockRedis()
    connectors.redis_subscriber_source(_source(tmp), "alerts", redis=mock,
                                       max_messages=2)
    assert mock.ps.subscribed == "alerts"
    assert _landed(tmp) == ["r1", "r2"]
    print("ok redis_subscriber_source writes pubsub payloads")


def test_rabbitmq_source():
    captured = {}

    def factory(url, queue, handler):
        captured["url"], captured["queue"] = url, queue

        class _Consumer(object):
            def run(self):
                for body in (b"m1", b"m2", b"m3"):
                    handler(body)
        return _Consumer()

    tmp = tempfile.mkdtemp()
    connectors.rabbitmq_source(_source(tmp), "amqp://localhost", "jobs",
                               consumer_factory=factory)
    assert captured == {"url": "amqp://localhost", "queue": "jobs"}
    assert _landed(tmp) == ["m1", "m2", "m3"]
    print("ok rabbitmq_source consumes via the handler contract")


class _PairDecoder(object):
    """App-side sink encoding for the k/v sinks: 4-byte framed JSON
    [key, value] pairs (the engine's TCP sink frames payloads the same
    way)."""

    def header_length(self):
        return 4

    def payload_length(self, header):
        return struct.unpack(">I", header)[0]

    def decode(self, payload):
        k, v = json.loads(payload.decode())
        return (k, v)


def _sink_with_feed(pairs):
    sink = SinkConnector(args=["--connector", "t", "--t-host", "127.0.0.1",
                               "--t-port", "0"],
                         required_params=("host", "port"),
                         decoder=_PairDecoder())
    sink.listen()  # port 0 -> ephemeral, read back via sink.port
    port = sink.port

    def feed():
        s = socket.create_connection(("127.0.0.1", port))
        for k, v in pairs:
            body = json.dumps([k, v]).encode()
            s.sendall(struct.pack(">I", len(body)) + body)
        s.close()

    threading.Thread(target=feed, daemon=True).start()
    return sink


def test_redis_hash_sink():
    class MockRedis(object):
        def __init__(self):
            self.hset_calls = []

        def hset(self, key, field, value):
            self.hset_calls.append((key, field, value))

    mock = MockRedis()
    sink = _sink_with_feed([("sym1", "99.5"), ("sym2", "100.25")])
    connectors.redis_hash_sink(sink, "prices", redis=mock, max_messages=2)
    sink.close()
    assert mock.hset_calls == [("prices", "sym1", "99.5"),
                               ("prices", "sym2", "100.25")]
    print("ok redis_hash_sink HSETs each output pair")


def test_kinesis_sink():
    class MockKinesis(object):
        def __init__(self):
            self.puts = []

        def put_record(self, StreamName, PartitionKey, Data):
            self.puts.append((StreamName, PartitionKey, Data))

    mock = MockKinesis()
    sink = _sink_with_feed([("pk-a", "va"), ("pk-b", "vb")])
    connectors.kinesis_sink(sink, "out-stream", client=mock, max_messages=2)
    sink.close()
    assert mock.puts == [("out-stream", "pk-a", "va"),
                         ("out-stream", "pk-b", "vb")]
    print("ok kinesis_sink put_records each output pair")


def test_alo_kafka_config_contract():
    ns = connectors.alo_kafka_parse_args(
        ["--host", "127.0.0.1", "--port", "7100", "--topic", "celsius"])
    assert (ns.host, ns.port, ns.topic) == ("127.0.0.1", "7100", "celsius")
    # reference defaults (alo_kafka_source:60-62)
    assert ns.bootstrap_servers == "127.0.0.1:9092"
    assert ns.version == "0.0.1" and ns.cookie == "cookie"
    try:
        connectors.alo_kafka_parse_args(["--host", "h"])  # missing required
    except SystemExit:
        pass
    else:
        raise AssertionError("missing required args must fail")
    print("ok alo_kafka_source config contract")


def main():
    test_kinesis_source()
    test_redis_subscriber_source()
    test_rabbitmq_source()
    test_redis_hash_sink()
    test_kinesis_sink()
    test_alo_kafka_config_contract()
    print("ALL PYTHON CONNECTOR-ADAPTER TESTS PASSED")


if __name__ == "__main__":
    main()
