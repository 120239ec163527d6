"""Stage contracts of jobs/crawl_curate_job.py: canonical-URL uniqueness
under duplicate captures, quality/repetition filtering, exact-dedup
first-wins determinism, and resume across checkpointed stages."""

from __future__ import annotations

import importlib.util
import sys

from pyspark.sql import functions as F


def _job():
    spec = importlib.util.spec_from_file_location(
        "crawl_curate_job", "jobs/crawl_curate_job.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["crawl_curate_job"] = mod
    spec.loader.exec_module(mod)
    return mod


GOOD = (
    "The mapping of streets and parks is a detailed task and the survey "
    "of every area is a careful effort to record a city in full depth."
)


def _pages(spark, rows):
    df = spark.createDataFrame(
        rows, "url string, warc_ts long, text string, lang string"
    ).withColumn("warc_ts", F.timestamp_seconds("warc_ts"))
    return df.withColumn(
        "html",
        F.encode(F.concat(F.lit("<html><body><p>"), F.col("text"), F.lit("</p></body></html>")), "utf-8"),
    ).select("url", "warc_ts", "html", "text", "lang")


def test_canon_one_row_per_canonical_url_with_duplicate_captures(spark):
    job = _job()
    rows = [
        # SAME raw url captured twice (two dump segments) — the case a
        # url-only join-back would resurrect
        ("https://a.io/x", 100, GOOD, "en"),
        ("https://a.io/x", 200, GOOD + " updated", "en"),
        # different surface forms of one canonical url
        ("https://A.IO/x#frag", 150, GOOD + " older", "en"),
        ("https://b.io/y", 50, GOOD, "en"),
    ]
    ext = job.extract(_pages(spark, rows))
    out = job.canon(ext).collect()
    by_norm = {r["norm_url"]: r for r in out}
    assert len(out) == 2, out
    win = by_norm["https://a.io/x"]
    assert win["warc_ts"].timestamp() == 200  # latest capture won
    assert win["text"] == GOOD + " updated"   # and carried ITS text


def test_extract_text_matches_source_and_score_filters(spark):
    job = _job()
    rows = [
        ("https://a.io/good", 1, GOOD, "en"),
        ("https://a.io/junk", 2, "spam spam spam spam spam spam", "en"),
        ("https://a.io/tiny", 3, "x", "en"),
    ]
    ext = job.extract(_pages(spark, rows))
    assert {r["text"] for r in ext.collect()} == {r[2] for r in rows}  # byte-exact
    kept = {r["url"] for r in job.score(job.canon(ext), 0.3, 0.5).collect()}
    assert kept == {"https://a.io/good"}  # repetition + quality filters bite


def test_dedup_exact_first_wins(spark):
    job = _job()
    rows = [
        ("https://a.io/1", 100, GOOD, "en"),
        ("https://b.io/1", 50, GOOD, "en"),    # same content, EARLIER -> wins
        ("https://c.io/1", 70, "  " + GOOD + "  ", "en"),  # ws-normalized dup
        ("https://d.io/1", 10, GOOD + " unique tail", "en"),
    ]
    ext = job.canon(job.extract(_pages(spark, rows)))
    kept = {r["url"] for r in job.dedup_exact(ext).collect()}
    assert kept == {"https://b.io/1", "https://d.io/1"}


def test_stages_resume_from_checkpoint(spark, tmp_path):
    job = _job()
    from pbf2json_spark.checkpoint import CheckpointManager, run_stages

    rows = [
        (f"https://h{i % 3}.io/p/{i}", i, GOOD + f" v{i}", "en") for i in range(20)
    ]
    src = _pages(spark, rows)
    mgr = CheckpointManager(spark, str(tmp_path), "crawl_curate_test")
    stages = [
        ("pages", lambda _: src),
        ("extracted", job.extract),
        ("canon", job.canon),
        ("scored", lambda p: job.score(p, 0.0, 1.0)),
        ("deduped", job.dedup_exact),
    ]
    first = run_stages(mgr, stages, mode="overwrite").collect()
    # a resume run must serve every stage from its committed snapshot and
    # produce the identical result
    resumed = run_stages(mgr, stages, mode="resume").collect()
    assert sorted(r["url"] for r in first) == sorted(r["url"] for r in resumed)
    assert len(first) == 20


def test_redact_and_pack_stages(spark):
    job = _job()

    rows = [
        (f"https://h{i}.io/p", i, GOOD + f" v{i} mail x{i}@ex.io", "en")
        for i in range(8)
    ]
    deduped = job.dedup_exact(
        job.score(job.canon(job.extract(_pages(spark, rows))), 0.0, 1.0)
    )
    red = job.redact(deduped)
    got = red.collect()
    assert len(got) == 8
    assert all("<EMAIL>" in r["text"] and "@ex.io" not in r["text"] for r in got)
    assert all(r["n_redactions"] >= 1 for r in got)

    packed = job.pack(red, budget=32).collect()
    assert len(packed) == 8
    # packs partition the token stream: offsets are exactly the exclusive
    # prefix sums in pack_key order
    by_off = sorted(packed, key=lambda r: r["offset"])
    acc = 0
    for r in by_off:
        assert r["offset"] == acc
        assert r["pack_first"] == acc // 32
        acc += r["ws_tokens"]
    assert {r["n_packs"] for r in packed} >= {1}
