"""Wave-5 operators: weighted per-stratum sampling, grid resample with
forward fill, geofence enter/exit transitions, anchor-text aggregation,
token co-occurrence lift."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from pbf2json_spark import corpus, sampling, temporal, trajectory, weburl


# --- weighted_sample ------------------------------------------------------


def _docs(spark, n=400):
    rows = [(i, ["en", "fr"][i % 2], 100 + (i * 37) % 900) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")


def test_weighted_sample_expected_size_and_determinism(spark):
    d = _docs(spark)
    out = sampling.weighted_sample(d, k=40, weight_col="n_chars")
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # E[kept] = 40 per stratum; binomial sd ~6 — accept a wide band
    for lang in ("en", "fr"):
        assert 20 <= counts[lang] <= 60, counts
    # membership is a pure function of the row: identical on a repartition
    again = sampling.weighted_sample(d.repartition(13), k=40,
                                     weight_col="n_chars")
    assert sorted(r["doc_id"] for r in out.collect()) == \
        sorted(r["doc_id"] for r in again.collect())


def test_weighted_sample_weight_bias(spark):
    # two strata-in-one: heavy docs (w=1000) vs light docs (w=10) in the
    # same stratum — kept heavies should outnumber kept lights roughly
    # in proportion to the 100x weight gap
    rows = [(i, "en", 1000 if i < 200 else 10) for i in range(400)]
    d = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    out = sampling.weighted_sample(d, k=60, weight_col="n_chars").collect()
    heavy = sum(1 for r in out if r["doc_id"] < 200)
    light = len(out) - heavy
    assert heavy > 10 * max(light, 1)


def test_weighted_sample_rejects_bad_k(spark):
    with pytest.raises(ValueError):
        sampling.weighted_sample(_docs(spark), k=0, weight_col="n_chars")


# --- resample_ffill -------------------------------------------------------


def _events(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: obs in buckets 0, 1, 4 (gap of 2 buckets filled from b1)
        (1, 1, t0 + dt.timedelta(hours=1), 10.0),
        (2, 1, t0 + dt.timedelta(days=1, hours=2), 20.0),
        (3, 1, t0 + dt.timedelta(days=1, hours=3), 21.0),  # later, wins b1
        (4, 1, t0 + dt.timedelta(days=4), 50.0),
        # user 2: single bucket
        (5, 2, t0 + dt.timedelta(days=2), 7.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, value double"
    )


def test_resample_ffill_grid_and_fill(spark):
    out = temporal.resample_ffill(_events(spark), step=86400)
    rows = {(r["user_id"], r["bucket"]): r for r in out.collect()}
    u1 = sorted(b for (u, b) in rows if u == 1)
    assert len(u1) == 5 and u1 == list(range(u1[0], u1[0] + 5))
    base = u1[0]
    assert rows[(1, base)]["value"] == 10.0 and not rows[(1, base)]["filled"]
    # bucket 1: last event of the day wins (ts tie-break by event_id)
    assert rows[(1, base + 1)]["value"] == 21.0
    # gap buckets carry the last value forward and are marked filled
    assert rows[(1, base + 2)]["value"] == 21.0 and rows[(1, base + 2)]["filled"]
    assert rows[(1, base + 3)]["value"] == 21.0 and rows[(1, base + 3)]["filled"]
    assert rows[(1, base + 4)]["value"] == 50.0
    assert rows[(1, base)]["bucket_start"] == base * 86400
    # user 2: exactly one grid row
    assert sum(1 for (u, _b) in rows if u == 2) == 1


def test_resample_ffill_span_guard(spark):
    with pytest.raises(ValueError, match="max_buckets"):
        temporal.resample_ffill(_events(spark), step=3600, max_buckets=10)


# --- geofence_transitions -------------------------------------------------


def test_geofence_transitions_sequence(spark):
    t0 = dt.datetime(2024, 1, 1)
    pings = [
        # user 1 walks into and out of fence A (lat 0..10, lon 0..10)
        (1, t0 + dt.timedelta(minutes=0), -5.0, 5.0),   # outside
        (1, t0 + dt.timedelta(minutes=1), 5.0, 5.0),    # enter
        (1, t0 + dt.timedelta(minutes=2), 6.0, 6.0),    # still in
        (1, t0 + dt.timedelta(minutes=3), 20.0, 5.0),   # exit
        # user 2 starts inside -> first ping emits enter
        (2, t0 + dt.timedelta(minutes=0), 1.0, 1.0),
    ]
    pts = spark.createDataFrame(
        pings, "user_id long, ts timestamp_ntz, lat double, lon double"
    )
    fences = spark.createDataFrame(
        [(1, 0.0, 10.0, 0.0, 10.0)],
        "fence_id int, lat_min double, lat_max double, "
        "lon_min double, lon_max double",
    )
    out = trajectory.geofence_transitions(pts, fences).collect()
    got = sorted((r["user_id"], r["ts"].minute, r["event"]) for r in out)
    assert got == [(1, 1, "enter"), (1, 3, "exit"), (2, 0, "enter")]


# --- anchor_stats ---------------------------------------------------------


def test_anchor_stats_top_anchor_and_counts(spark):
    links = spark.createDataFrame(
        [
            (1, 100, "home"), (2, 100, "home"), (2, 100, "start"),
            (3, 100, "start"), (3, 100, "begin"),
            (1, 200, "docs"),
        ],
        "src long, dst long, anchor string",
    )
    out = {r["dst"]: r for r in weburl.anchor_stats(links).collect()}
    assert out[100]["n_links"] == 5
    assert out[100]["n_srcs"] == 3
    # 'home' and 'start' both count 2 -> tie breaks to the LARGER string
    # under (count, anchor) struct-max
    assert out[100]["top_anchor"] == "start"
    assert out[100]["top_anchor_count"] == 2
    assert out[200]["n_links"] == 1 and out[200]["top_anchor"] == "docs"


# --- token_lift -----------------------------------------------------------


def test_token_lift_values(spark):
    docs = spark.createDataFrame(
        [
            (0, "alpha beta"), (1, "alpha beta"), (2, "alpha beta"),
            (3, "alpha gamma"), (4, "beta gamma"), (5, "delta solo"),
        ],
        "doc_id long, text string",
    )
    out = {(r["term_a"], r["term_b"]): r
           for r in corpus.token_lift(docs, min_pair_count=1).collect()}
    n = 6
    ab = out[("alpha", "beta")]
    assert ab["pair_count"] == 3 and ab["df_a"] == 4 and ab["df_b"] == 4
    assert ab["lift_e6"] == (3 * n * 1_000_000) // (4 * 4)
    ag = out[("alpha", "gamma")]
    assert ag["pair_count"] == 1
    assert ag["lift_e6"] == (1 * n * 1_000_000) // (4 * 2)
    # presence, not token counts: repeated words in one doc count once
    docs2 = spark.createDataFrame(
        [(0, "x y x y x"), (1, "x y")], "doc_id long, text string"
    )
    out2 = corpus.token_lift(docs2, min_pair_count=1).collect()
    assert len(out2) == 1 and out2[0]["pair_count"] == 2


def test_token_lift_df_bounds(spark):
    docs = spark.createDataFrame(
        [(i, "stop rare" if i == 0 else "stop other") for i in range(10)],
        "doc_id long, text string",
    )
    # max_df_frac kicks 'stop' (df=10) out -> no pair survives with 'stop'
    out = corpus.token_lift(docs, min_pair_count=1, max_df_frac=0.5).collect()
    assert all("stop" not in (r["term_a"], r["term_b"]) for r in out)
