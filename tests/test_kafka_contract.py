"""Kafka wiring contracts, broker-less.

No Kafka broker or connector jar exists in this environment, so these
tests pin the OPTION ASSEMBLY of every Kafka entry point against the
reference's wiring (src/naolib_consumer.py:49-54, src/topics.py:10-67)
by recording the reader/writer builder chain instead of executing it.
The downstream semantics are covered by the file/rate streaming twins.
"""

from __future__ import annotations

import pytest

from ue_big_data_project_spark.sources import kafka_batch, kafka_write
from ue_big_data_project_spark.streaming import kafka_stream
from ue_big_data_project_spark.topics import ensure_topic


class RecordingBuilder:
    """Stands in for DataFrameReader/Writer AND their result: every
    builder method returns self, so the chain records instead of runs."""

    def __init__(self):
        self.fmt = None
        self.opts = {}
        self.loaded = False
        self.saved = False

    def format(self, fmt):
        self.fmt = fmt
        return self

    def option(self, k, v):
        self.opts[k] = v
        return self

    def load(self):
        self.loaded = True
        return self

    def save(self):
        self.saved = True


class FakeSpark:
    def __init__(self):
        self.reader = RecordingBuilder()

    @property
    def read(self):
        return self.reader

    @property
    def readStream(self):
        return self.reader


class FakeDF:
    """Enough DataFrame surface for kafka_write: column names for the
    to_json(struct(...)) payload, select passthrough, recording writer."""

    columns = ["stop", "temps"]

    def __init__(self):
        self.writer = RecordingBuilder()
        self.selected = None

    def select(self, col):
        self.selected = col
        return self

    @property
    def write(self):
        return self.writer


def test_kafka_batch_scan_options():
    fake = FakeSpark()
    kafka_batch(fake, "localhost:9092", "naolib")
    r = fake.reader
    assert r.fmt == "kafka" and r.loaded
    assert r.opts == {
        "kafka.bootstrap.servers": "localhost:9092",
        "subscribe": "naolib",
        "startingOffsets": "earliest",
        "endingOffsets": "latest",
    }


def test_kafka_stream_scan_options():
    # Reference consumer wiring: subscribe + startingOffsets=latest
    # (src/naolib_consumer.py:49-54).
    fake = FakeSpark()
    kafka_stream(fake, "broker-1:9092,broker-2:9092", "tan_bus", "latest")
    r = fake.reader
    assert r.fmt == "kafka" and r.loaded
    assert r.opts == {
        "kafka.bootstrap.servers": "broker-1:9092,broker-2:9092",
        "subscribe": "tan_bus",
        "startingOffsets": "latest",
    }


def test_kafka_write_options(spark):
    fake = FakeDF()
    kafka_write(fake, "localhost:9092", "out_topic")
    w = fake.writer
    assert w.fmt == "kafka" and w.saved
    assert w.opts == {
        "kafka.bootstrap.servers": "localhost:9092",
        "topic": "out_topic",
    }
    # The payload column is the JSON-serialized full row as binary.
    assert "to_json" in str(fake.selected)
    assert fake.selected._jc.toString().endswith("AS value")


def test_ensure_topic_import_gate():
    with pytest.raises(RuntimeError, match="kafka-python"):
        ensure_topic("localhost:9092", "t")
