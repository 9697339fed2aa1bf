"""REAL-broker Pulsar integration tests — jar-gated, env-gated.

The loopback `pulsarlite` broker proves the full A5-A7 surface in the
sandbox (tests/test_pulsarlite.py); this module runs the SAME builders
(`pulsar_source_reader` / `pulsar_backfill_reader` / `pulsar_sink_writer`)
against a real Apache Pulsar broker through the StreamNative DSv2
connector, so the day an environment has the jar + a broker, A5-A7
upgrade from loopback-proven to wire-proven with zero new work.

Activation (both required, else every test SKIPS — never fails):
- ``SPARK_GRAFT_PULSAR_URL``  e.g. ``pulsar://localhost:6650``
- the ``pulsar`` streaming format on the session classpath, e.g.
  ``--packages io.streamnative.connectors:pulsar-spark-connector_2.13:<v>``

Optional: ``SPARK_GRAFT_PULSAR_ADMIN_URL`` (e.g. ``http://localhost:8080``)
— 2.x connectors require ``admin.url``; 3.x+ resolve metadata over the
binary protocol and ignore it.

Option surface mirrors the reference producer/consumer
(DIPA_Controller.py:67-90: Shared subscription semantics, zlib
compression, RoundRobinPartition routing, pending cap; column mapping
__publishTime/__topic/value as in threaded_consumer.py:38-44).
Assertions mirror tests/test_pulsarlite.py one-for-one where the real
wire allows (no raw-log introspection here — compression transparency is
asserted as a round-trip instead).
"""

from __future__ import annotations

import os
import uuid

import pytest
from pyspark.sql import functions as F

from dipa_collaborative_pulsar_idps_spark.sources.pulsar import (
    _has_format,
    pulsar_backfill_reader,
    pulsar_sink_writer,
    pulsar_source_reader,
)

BROKER_URL = os.environ.get("SPARK_GRAFT_PULSAR_URL")
ADMIN_URL = os.environ.get("SPARK_GRAFT_PULSAR_ADMIN_URL")

pytestmark = pytest.mark.skipif(
    not BROKER_URL,
    reason="real-broker Pulsar tests need SPARK_GRAFT_PULSAR_URL "
    "(pulsarlite loopback covers this surface in-sandbox)",
)


@pytest.fixture()
def pulsar_env(spark):
    """(service_url, extra_options, unique topic namespace) — or SKIP when
    the connector jar isn't on this session's classpath."""
    if not _has_format(spark, "pulsar"):
        pytest.skip(
            "pulsar DSv2 connector not on the classpath "
            "(io.streamnative.connectors:pulsar-spark-connector)"
        )
    opts = {"admin.url": ADMIN_URL} if ADMIN_URL else {}
    ns = f"it{uuid.uuid4().hex[:12]}"  # fresh topics: no admin-API cleanup
    return BROKER_URL, opts, ns


def _seed(spark, url, opts, topic, values):
    """Batch-produce ``values`` to ``topic`` via the connector's batch
    writer (the same value-column contract the sink builder uses)."""
    w = (
        spark.createDataFrame([(v,) for v in values], "value string")
        .select(F.col("value").cast("binary").alias("value"))
        .write.format("pulsar")
        .option("service.url", url)
        .option("topic", topic)
    )
    for k, v in opts.items():
        w = w.option(k, v)
    w.save()


def _drain(df, tmp_path, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table(name).collect()


def test_consume_seeded_topic_earliest(spark, pulsar_env, tmp_path):
    """A5 on the wire: single-topic consume — values, topic column,
    publish timestamps (mirror of the pulsarlite test of the same name)."""
    url, opts, ns = pulsar_env
    topic = f"{ns}-mirai"
    _seed(spark, url, opts, topic, ["10.0.0.2@BOT", "10.0.0.9@CNC"])
    stream = pulsar_source_reader(
        spark, url, topic, starting_offsets="earliest", options=opts
    )
    rows = _drain(stream, tmp_path, f"t_{ns}_consume")
    assert sorted(r["value"] for r in rows) == ["10.0.0.2@BOT", "10.0.0.9@CNC"]
    assert all(topic in r["topic"] for r in rows)  # full persistent:// name
    assert all(r["msg_ts"] is not None for r in rows)


def test_topics_pattern_multi_topic_fan_in(spark, pulsar_env, tmp_path):
    """A6 on the wire: topicsPattern fan-in reads update1+update2, not
    time1; the topic column carries the subnet key."""
    url, opts, ns = pulsar_env
    _seed(spark, url, opts, f"{ns}-update1", ["h1@23@40.0"])
    _seed(spark, url, opts, f"{ns}-update2", ["h2@23@40.0", "h3@80@9.0"])
    _seed(spark, url, opts, f"{ns}-time1", ["1700000000.0"])
    stream = pulsar_source_reader(
        spark,
        url,
        f"persistent://public/default/{ns}-update.*",
        starting_offsets="earliest",
        options=opts,
    )
    rows = _drain(stream, tmp_path, f"t_{ns}_fanin")
    by_topic: dict[str, list[str]] = {}
    for r in rows:
        by_topic.setdefault(r["topic"].rsplit("/", 1)[-1], []).append(r["value"])
    assert set(by_topic) == {f"{ns}-update1", f"{ns}-update2"}
    assert len(by_topic[f"{ns}-update2"]) == 2


def test_produce_consume_roundtrip_zlib(spark, pulsar_env, tmp_path):
    """A7 on the wire: produce through pulsar_sink_writer (zlib
    compression + RoundRobinPartition + pending cap accepted by the real
    client) and consume back — content round-trips through broker-side
    compression transparently."""
    url, opts, ns = pulsar_env
    topic = f"{ns}-alerts"
    src = tmp_path / "outbox"
    src.mkdir()
    (src / "a.txt").write_text("10.0.0.2@BOT\n10.0.0.5@BOT\n")
    alerts = spark.readStream.text(str(src))
    q = (
        pulsar_sink_writer(
            alerts,
            url,
            topic,
            str(tmp_path / "ckpt_prod"),
            compression="zlib",
            options=opts,
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = pulsar_backfill_reader(
        spark, url, f"persistent://public/default/{topic}", options=opts
    ).collect()
    assert sorted(r["value"] for r in got) == ["10.0.0.2@BOT", "10.0.0.5@BOT"]


def test_offsets_advance_across_restart_no_duplicates(spark, pulsar_env, tmp_path):
    """I12 on the wire: a second availableNow pass on the SAME checkpoint
    sees only messages published after the first pass — offsets persist,
    nothing is re-delivered (mirror of the pulsarlite offset tests)."""
    url, opts, ns = pulsar_env
    topic = f"{ns}-offsets"
    _seed(spark, url, opts, topic, ["m1", "m2"])
    stream = pulsar_source_reader(
        spark, url, topic, starting_offsets="earliest", options=opts
    )
    name = f"t_{ns}_off"
    first = _drain(stream, tmp_path, name)
    assert sorted(r["value"] for r in first) == ["m1", "m2"]
    _seed(spark, url, opts, topic, ["m3"])
    # same queryName + same checkpoint: memory sink truncates per restart,
    # so the table now holds ONLY what the second pass delivered
    second = _drain(stream, tmp_path, name)
    assert [r["value"] for r in second] == ["m3"]


def test_backfill_batch_read(spark, pulsar_env):
    """A5 batch form: full-history read of a topic's log."""
    url, opts, ns = pulsar_env
    topic = f"{ns}-hist"
    _seed(spark, url, opts, topic, [f"r{i}" for i in range(5)])
    got = pulsar_backfill_reader(
        spark, url, f"persistent://public/default/{topic}", options=opts
    ).collect()
    assert sorted(r["value"] for r in got) == [f"r{i}" for i in range(5)]
    assert all(r["msg_ts"] is not None for r in got)
