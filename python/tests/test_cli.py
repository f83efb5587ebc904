"""CLI helper parity: the reference's arg-parsing surface
(machida/lib/wallaroo/__init__.py:599-676) against reference-format argv,
so example apps' argument handling ports unchanged.

Run:  python3 python/tests/test_cli.py   (no engine needed)
"""

import os
import sys

_PYDIR = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, _PYDIR)

import graft


def test_tcp_parse_input_addrs():
    # the reference examples' shape: `-i name@host:port,...`
    argv = ["app", "-i", "celsius@127.0.0.1:7000,fahrenheit@10.0.0.1:7001",
            "--other", "ignored"]
    assert graft.tcp_parse_input_addrs(argv) == [
        ("celsius", "127.0.0.1", "7000"),
        ("fahrenheit", "10.0.0.1", "7001")]
    # long form + single addr
    assert graft.tcp_parse_input_addrs(["--in", "s@h:1"]) == [("s", "h", "1")]
    print("ok tcp_parse_input_addrs")


def test_tcp_parse_output_addrs():
    argv = ["app", "-o", "127.0.0.1:7002,10.0.0.2:7003"]
    assert graft.tcp_parse_output_addrs(argv) == [
        ("127.0.0.1", "7002"), ("10.0.0.2", "7003")]
    assert graft.tcp_parse_output_addrs(["--out", "h:9"]) == [("h", "9")]
    print("ok tcp_parse_output_addrs")


def test_kafka_parse_source_options():
    argv = ["app",
            "--kafka_source_name", "orders",
            "--kafka_source_topic", "orders-in",
            "--kafka_source_brokers", "b1:9093,b2",  # port defaults to 9092
            "--kafka_source_log_level", "Info",
            "-i", "x@y:1"]  # unrelated args must be ignored
    assert graft.kafka_parse_source_options(argv) == (
        "orders", "orders-in", [("b1", "9093"), ("b2", "9092")], "Info")
    # defaults mirror the reference: empty topic/brokers, Warn
    name, topic, brokers, level = graft.kafka_parse_source_options(["app"])
    assert (name, topic, level) == (None, "", "Warn")
    assert brokers == [("", "9092")]  # "".split(",") -> [""], like the ref
    print("ok kafka_parse_source_options")


def test_kafka_parse_sink_options():
    argv = ["app",
            "--kafka_sink_topic", "alerts-out",
            "--kafka_sink_brokers", "k1:9092",
            "--kafka_sink_log_level", "Error",
            "--kafka_sink_max_produce_buffer_ms", "250",
            "--kafka_sink_max_message_size", "65536"]
    assert graft.kafka_parse_sink_options(argv) == (
        "", "alerts-out", [("k1", "9092")], "Error", 250, 65536)
    # defaults: buffer 0, max size 100000 — the reference's values
    assert graft.kafka_parse_sink_options(["app"])[4:] == (0, 100000)
    print("ok kafka_parse_sink_options")


def main():
    test_tcp_parse_input_addrs()
    test_tcp_parse_output_addrs()
    test_kafka_parse_source_options()
    test_kafka_parse_sink_options()
    print("ALL PYTHON CLI TESTS PASSED")


if __name__ == "__main__":
    main()
