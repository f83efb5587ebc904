"""Thin service adapters over the connector protocol — the ports of the
reference's single-file connector scripts (connectors/kinesis_source,
rabbitmq_source, redis_subscriber_source, redis_hash_sink, kinesis_sink),
re-expressed as functions over `graft.experimental`'s SourceConnector /
SinkConnector.

The reference scripts hard-import boto3 / redis / pika at module top;
these adapters take the service CLIENT as a parameter instead (imported
lazily when omitted), so the glue logic — which is the actual contract:
what gets polled, what gets written, what gets acked — is testable against
mock clients without the service SDKs installed. Each loop accepts an
optional `max_messages`/`max_batches` bound; production callers leave it
None and run forever, exactly like the reference scripts' `while True`.
"""

import argparse
import time


# --- sources ----------------------------------------------------------------

def kinesis_source(connector, stream, shard, client=None,
                   iterator_type="LATEST", poll_interval=0.2,
                   record_limit=2, max_batches=None):
    """connectors/kinesis_source: poll a shard iterator, write each
    record's Data. `client` is a boto3 kinesis client (or a mock with
    get_shard_iterator/get_records)."""
    if client is None:  # pragma: no cover - needs boto3 + AWS
        import boto3
        client = boto3.client("kinesis")
    shard_it = client.get_shard_iterator(
        StreamName=stream, ShardId=shard,
        ShardIteratorType=iterator_type)["ShardIterator"]
    batches = 0
    while max_batches is None or batches < max_batches:
        message = client.get_records(ShardIterator=shard_it,
                                     Limit=record_limit)
        for record in message["Records"]:
            connector.write(record["Data"])
        shard_it = message["NextShardIterator"]
        batches += 1
        if shard_it is None:
            break
        if max_batches is None or batches < max_batches:
            time.sleep(poll_interval)
    connector.flush()


def redis_subscriber_source(connector, topic, redis=None, host=None,
                            port=6379, password=None, max_messages=None):
    """connectors/redis_subscriber_source: subscribe and write every
    pubsub payload. `redis` is a redis.Redis (or a mock with .pubsub())."""
    if redis is None:  # pragma: no cover - needs redis-py + a server
        from redis import Redis
        redis = Redis(host, int(port), password)
    pubsub = redis.pubsub()
    pubsub.subscribe(topic)
    n = 0
    for message in pubsub.listen():
        if message["type"] == "message":
            connector.write(message["data"])
            n += 1
            if max_messages is not None and n >= max_messages:
                break
    connector.flush()


def rabbitmq_source(connector, amqp_url, queue, consumer_factory=None):
    """connectors/rabbitmq_source: consume a queue, ack-then-write each
    body (the reference's AsyncConsumer acks before handling).
    `consumer_factory(url, queue, handler)` returns an object with
    `.run()`; the default builds the pika SelectConnection consumer."""
    def handle_text(message):
        connector.write(message)

    if consumer_factory is None:  # pragma: no cover - needs pika + broker
        import pika

        def consumer_factory(url, q, handler):
            connection = pika.BlockingConnection(pika.URLParameters(url))
            channel = connection.channel()
            channel.queue_declare(queue=q)

            class _Consumer(object):
                def run(self):
                    for _, _, body in channel.consume(q):
                        handler(body)
            return _Consumer()

    consumer = consumer_factory(amqp_url, queue, handle_text)
    consumer.run()
    connector.flush()


# --- sinks ------------------------------------------------------------------

def redis_hash_sink(connector, key, redis=None, host=None, port=6379,
                    password=None, max_messages=None):
    """connectors/redis_hash_sink: every (field, value) output message
    becomes HSET key field value. The connector's decoder must yield
    (field, value) pairs, as the reference's app-side encoder does."""
    if redis is None:  # pragma: no cover - needs redis-py + a server
        from redis import Redis
        redis = Redis(host, int(port), password)
    n = 0
    while max_messages is None or n < max_messages:
        k, v = connector.read()
        redis.hset(key, k, v)
        n += 1


def kinesis_sink(connector, stream, client=None, max_messages=None):
    """connectors/kinesis_sink: every (key, value) output message becomes
    a put_record with the key as partition key."""
    if client is None:  # pragma: no cover - needs boto3 + AWS
        import boto3
        client = boto3.client("kinesis")
    n = 0
    while max_messages is None or n < max_messages:
        key, value = connector.read()
        client.put_record(StreamName=stream, PartitionKey=key, Data=value)
        n += 1


# --- kafka (config contract only; no broker/client in this environment) ----

def alo_kafka_parse_args(argv):
    """The ALO kafka source's CLI contract
    (connectors/experimental/alo_kafka_source:57-76): engine host/port +
    topic required, bootstrap_servers/version/cookie defaulted. Returns
    the parsed namespace; the consumer itself needs kafka-python and a
    broker, so runtime wiring stays with the caller."""
    parser = argparse.ArgumentParser("ALO Kafka Source Connector")
    parser.add_argument("--host", required=True)
    parser.add_argument("--port", required=True)
    parser.add_argument("--topic", required=True)
    parser.add_argument("--bootstrap_servers", default="127.0.0.1:9092")
    parser.add_argument("--version", default="0.0.1")
    parser.add_argument("--cookie", default="cookie")
    return parser.parse_args(argv)
