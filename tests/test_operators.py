"""Unit tests for the generic operator library (operators/, functions/)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from dipa_collaborative_pulsar_idps_spark.operators import (
    asof_join,
    counter_delta,
    top_k,
    top_k_per_group,
)
from dipa_collaborative_pulsar_idps_spark.functions.multimodal import (
    extract_features,
    frame_sample_stub,
    media_stats,
    resize_images,
)

T0 = dt.datetime(2024, 1, 1)


def _ts(s):
    return T0 + dt.timedelta(seconds=s)


def test_counter_delta_reset_detection(spark):
    rows = [
        ("f1", _ts(0), 100),
        ("f1", _ts(2), 250),
        ("f1", _ts(4), 50),  # reset: 50 < 250 → delta = 50
        ("f1", _ts(6), 80),
        ("f2", _ts(0), 10),
    ]
    df = spark.createDataFrame(rows, ["flow", "poll_ts", "pkts"])
    out = {
        (r.flow, r.poll_ts): r.delta
        for r in counter_delta(df, ["flow"], "pkts", ["poll_ts"]).collect()
    }
    assert out[("f1", _ts(0))] == 100  # first sample vs zero-seeded state
    assert out[("f1", _ts(2))] == 150
    assert out[("f1", _ts(4))] == 50  # reset handled, not -200
    assert out[("f1", _ts(6))] == 30
    assert out[("f2", _ts(0))] == 10


def test_asof_join_nearest_prior(spark):
    left = spark.createDataFrame(
        [("u1", _ts(5), "p1"), ("u1", _ts(1), "p0"), ("u2", _ts(3), "p2")],
        ["uid", "ts", "purchase"],
    )
    right = spark.createDataFrame(
        [("u1", _ts(2), 10.0), ("u1", _ts(4), 20.0), ("u1", _ts(6), 30.0)],
        ["uid", "ts", "price"],
    )
    out = {
        (r.uid, r.purchase): r.price_asof
        for r in asof_join(left, right, ["uid"], "ts", ["price"]).collect()
    }
    assert out[("u1", "p1")] == 20.0  # latest right ≤ ts(5) is ts(4)
    assert out[("u1", "p0")] is None  # nothing before ts(1)
    assert out[("u2", "p2")] is None  # no right rows for u2


def test_asof_join_same_instant_visible(spark):
    left = spark.createDataFrame([("u1", _ts(2), "p")], ["uid", "ts", "purchase"])
    right = spark.createDataFrame([("u1", _ts(2), 7.0)], ["uid", "ts", "price"])
    out = asof_join(left, right, ["uid"], "ts", ["price"]).collect()[0]
    assert out.price_asof == 7.0  # right sorts before left at identical ts


def test_topk_helpers(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 30.0), ("a", 3, 20.0), ("b", 4, 5.0)],
        ["g", "id", "v"],
    )
    top = top_k(df, [F.desc("v"), F.asc("id")], 2).collect()
    assert [(r.g, r.id) for r in top] == [("a", 2), ("a", 3)]
    per = top_k_per_group(df, ["g"], [F.desc("v"), F.asc("id")], 1).collect()
    assert {(r.g, r.id) for r in per} == {("a", 2), ("b", 4)}


def _media_df(spark):
    rows = [
        ("m1", "image", bytearray(b"\x01" * 100), 640, 480, None),
        ("m2", "image", bytearray(b"\x02" * 50), 320, 240, None),
        ("m3", "audio", bytearray(b"\x03" * 200), None, None, 5000),
        ("m4", "video", bytearray(b"\x04" * 300), 1920, 1080, 2500),
    ]
    from dipa_collaborative_pulsar_idps_spark.functions.multimodal import MEDIA_SCHEMA

    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_multimodal_feature_extract(spark):
    out = extract_features(_media_df(spark)).collect()
    assert len(out) == 4
    by_id = {r.media_id: r for r in out}
    assert len(by_id["m1"].feature) == 16
    assert by_id["m1"].n_bytes == 100
    # deterministic stub: same payload → same features
    again = extract_features(_media_df(spark)).collect()
    assert {r.media_id: r.feature for r in again} == {r.media_id: r.feature for r in out}


def test_multimodal_resize_and_frames(spark):
    m = _media_df(spark)
    resized = resize_images(m, 224, 224).collect()
    assert {r.media_id for r in resized} == {"m1", "m2"}
    assert all(r.width == 224 and r.height == 224 for r in resized)
    frames = frame_sample_stub(m, every_ms=1000).collect()
    assert [(r.media_id, r.frame_ts_ms) for r in frames] == [
        ("m4", 0), ("m4", 1000), ("m4", 2000)
    ]
    stats = {r.media_type: r for r in media_stats(m).collect()}
    assert stats["image"].n_items == 2 and stats["image"].total_bytes == 150


def test_interval_join_matches_naive(spark):
    """Binned range join ≡ naive non-equi join on a synthetic set that
    crosses bin boundaries (intervals longer and shorter than the bin)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from dipa_collaborative_pulsar_idps_spark.operators.rangejoin import interval_join

    base = dt.datetime(2024, 1, 1)
    pts = spark.createDataFrame(
        [(i, base + dt.timedelta(minutes=7 * i)) for i in range(200)],
        "pid long, pts timestamp_ntz",
    )
    iv = spark.createDataFrame(
        [
            (j, base + dt.timedelta(minutes=13 * j), base + dt.timedelta(minutes=13 * j + span))
            for j, span in [(0, 5), (1, 45), (2, 90), (3, 30), (4, 0), (5, 1440)]
        ],
        "iid long, istart timestamp_ntz, iend timestamp_ntz",
    )
    got = interval_join(pts, "pts", iv, "istart", "iend", bin_seconds=1800)
    expect = pts.join(
        iv, (F.col("istart") <= F.col("pts")) & (F.col("pts") < F.col("iend"))
    )
    g = {(r.pid, r.iid) for r in got.collect()}
    e = {(r.pid, r.iid) for r in expect.collect()}
    assert g == e and len(e) > 50


def test_connected_components_chains_and_singletons(spark):
    """Min-label propagation needs one round per hop: a 6-node path plus a
    triangle plus an isolated vertex must all collapse correctly."""
    from dipa_collaborative_pulsar_idps_spark.operators.components import (
        connected_components,
    )

    edges = spark.createDataFrame(
        # path 10-11-12-13-14-15 (entered highest-first to force propagation),
        # triangle 20-21-22, pair 30-31
        [(15, 14), (14, 13), (13, 12), (12, 11), (11, 10),
         (20, 21), (21, 22), (22, 20), (30, 31)],
        "src long, dst long",
    )
    nodes = spark.createDataFrame([(n,) for n in [10, 11, 12, 13, 14, 15, 20, 21, 22, 30, 31, 99]], "id long")
    got = {
        r.node: r.component
        for r in connected_components(edges, nodes=nodes).collect()
    }
    assert got == {10: 10, 11: 10, 12: 10, 13: 10, 14: 10, 15: 10,
                   20: 20, 21: 20, 22: 20, 30: 30, 31: 30, 99: 99}
