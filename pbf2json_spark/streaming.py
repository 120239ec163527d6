"""Structured Streaming face of the engine.

The reference is bounded batch (SURVEY.md §2.9: its "streaming" is only
pipelined stdout), so nothing here mirrors reference semantics. This module
exists for the north-star workload shape: a pages table that GROWS —
Common-Crawl dumps landing as micro-batches — where tile statistics must
stay fresh without re-scanning history.

Design: the same pure-Column kernels the batch path uses (pages.geocode,
cells.cell_col) applied to a streaming DataFrame, then a watermarked
event-time window aggregation per tile. Because geocode and cell-encode are
stateless Column expressions, batch and stream share one code path — the
Spark guarantee that a streaming query is the incrementalized batch query.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pbf2json_spark import cells
from pbf2json_spark.pages import GEO_RE


def geocode_stream(pages: DataFrame) -> DataFrame:
    """Identical extraction to pages.geocode (kept inline so the streaming
    module has no batch-only imports beyond the regex contract)."""
    t = F.col("text")
    lat = F.nullif(F.regexp_extract(t, GEO_RE, 1), F.lit("")).cast("double")
    lon = F.nullif(F.regexp_extract(t, GEO_RE, 2), F.lit("")).cast("double")
    return pages.withColumn("lat", lat).withColumn("lon", lon)


def streaming_tile_counts(
    pages_stream: DataFrame,
    res: int,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Per-(event-time-window, tile) page counts over an unbounded stream.

    * watermark bounds state: rows later than `watermark` behind the max
      event time are dropped, closed windows are evicted from the state
      store — mandatory for an unbounded 10^12-row stream;
    * the groupBy is (window, tile): tile comes from the same Column bit
      math as the batch path, so a backfill batch job and the live stream
      produce byte-identical aggregates for on-time data.
    """
    g = geocode_stream(pages_stream).filter(F.col("lat").isNotNull())
    tiled = g.withColumn("tile", cells.cell_col(F.col("lat"), F.col("lon"), res))
    return (
        tiled.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col("tile"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "tile",
            "n",
        )
    )


def streaming_dedup(
    pages_stream: DataFrame,
    text_col: str = "text",
    state_ttl: str | None = None,
) -> DataFrame:
    """Streaming exact dedup with cross-micro-batch state: the first page
    with a given content fingerprint is emitted, every later arrival —
    same batch or any later batch — is dropped. The custom-stateful-operator
    path (applyInPandasWithState); nothing built-in expresses "emit first
    occurrence ever, keep a seen-set forever" (dropDuplicates on a stream
    keys state by the dedup columns too, but can't report duplicate counts
    or apply TTL semantics per key — this operator carries both).

    Scale shape for an unbounded 10^12-page stream:
      * group key = 128-bit (fp64, fp64b) — two INDEPENDENT xxhash64
        passes (`xxhash64(lit(1), text)` reseeds; see dedup.exact_dedup).
        A single 64-bit key expects ~27k birthday collisions at 10^12
        pages = distinct documents silently dropped as duplicates. Keys
        stay uniform by construction, no hot keys; the shuffle carries
        (fp64, fp64b, url, warc_ts) — never the document body;
      * state per distinct document = one long (arrival count), ~24 B/key
        in RocksDB state store;
      * `state_ttl` (e.g. '30 days') bounds state for truly unbounded runs:
        a key idle longer is evicted and a later duplicate would re-emit —
        the standard freshness/state tradeoff, off by default.

    Output: url, warc_ts, (fp64, fp64b) of each kept (first-seen) page.
    Determinism within a batch: min (warc_ts, url) wins — tracked across
    ALL pandas chunks of the group (a group larger than
    arrow.maxRecordsPerBatch arrives split; taking the first chunk's head
    would be ordering-dependent).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    hashed = pages_stream.select(
        "url",
        "warc_ts",
        F.xxhash64(F.col(text_col)).alias("fp64"),
        F.xxhash64(F.lit(1), F.col(text_col)).alias("fp64b"),
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl
        else GroupStateTimeout.NoTimeout
    )
    ttl_ms = None
    if state_ttl:
        qty, unit = state_ttl.split()
        ttl_ms = int(qty) * {
            "seconds": 1_000, "minutes": 60_000, "hours": 3_600_000,
            "days": 86_400_000,
        }[unit if unit.endswith("s") else unit + "s"]

    def _dedup(key, pdf_iter, state):
        if state.hasTimedOut:
            state.remove()
            return
        first = None
        n = 0
        for pdf in pdf_iter:
            n += len(pdf)
            if len(pdf):
                # running min across ALL chunks — a group split over
                # multiple arrow batches must still emit min(warc_ts, url)
                cand = pdf.sort_values(["warc_ts", "url"]).head(1)
                if first is None or (
                    tuple(cand.iloc[0][["warc_ts", "url"]])
                    < tuple(first.iloc[0][["warc_ts", "url"]])
                ):
                    first = cand
        fresh = not state.exists
        seen = 0 if fresh else state.get[0]
        state.update((seen + n,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        if fresh and first is not None:
            yield first[["url", "warc_ts", "fp64", "fp64b"]]

    return hashed.groupBy("fp64", "fp64b").applyInPandasWithState(
        _dedup,
        "url string, warc_ts timestamp, fp64 long, fp64b long",
        "seen long",
        "append",
        timeout,
    )


def run_stream_to_memory(
    tiles: DataFrame, query_name: str, timeout_s: float = 60.0,
    output_mode: str = "append",
):
    """Drive a (bounded-source) streaming frame to completion into an
    in-memory sink table — the test/CI harness path. On a cluster the same
    frame goes to `writeStream.format('iceberg'/'parquet')` with a
    checkpointLocation instead; only the sink line differs.

    output_mode: 'append' (watermark-gated, production shape — final
    still-open windows are withheld) or 'complete' (full refresh — what the
    batch-equivalence test asserts against)."""
    q = (
        tiles.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return q


def streaming_cms(
    docs_stream: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Streaming count-min sketch: the SAME (row, bucket) cells as the
    batch sketch.cms_build, maintained incrementally over an unbounded
    stream (outputMode 'update'/'complete' — a sum over a bounded key
    space of depth x width cells, so the state store is FIXED-SIZE no
    matter how many keys flow through — this is exactly why a sketch, and
    not an exact per-key count, is the streaming-safe frequency monitor).

    Batch ≡ streaming: the plan IS sketch.cms_build applied to the
    streaming frame (explode + groupBy-sum is streaming-capable as-is) —
    one construction, so the batch/streaming cell layouts can never
    drift, and a live sketch merges with historical batch sketches via
    sketch.cms_merge.
    """
    from pbf2json_spark import sketch

    return sketch.cms_build(docs_stream, key_col, depth, width)


def streaming_sessions(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming gap-based sessionization — the incremental twin of
    temporal.sessionize, on the NATIVE session_window operator: events
    within `gap` of each other merge into one growing session per key;
    the watermark closes sessions once event time moves `watermark`
    past their end, and append mode emits each exactly once.

    State per open session is one (key, window, count, min/max ts) row
    — Spark's session-window state store merges adjacent windows
    in-place, the same mechanism the batch operator compiles to, so
    batch and stream agree wherever the watermark has finalized.

    Shape on an unbounded stream: ONE shuffle on the key into the
    stateful session operator; aggregates are combinable longs. Skewed
    keys shard exactly like batch sessionize (a key's sessions close
    over time, so state is bounded by open sessions, not history).

    Output (append, finalized sessions only): (key_col, session_start,
    session_end, n_events).
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(key_col),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            F.col("n_events"),
        )
    )


def streaming_attribution(
    impressions: DataFrame,
    clicks: DataFrame,
    key_col: str = "ad_id",
    ts_col: str = "ts",
    within: str = "10 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream interval join — last-mile click attribution: match
    each click to the SAME-key impressions it followed within `within`.
    This is the canonical Structured Streaming two-sided stateful join:
    both sides are watermarked, and the time-range predicate bounds how
    long either side's rows stay in the join state store (impressions
    age out `within`+watermark after their event time; clicks drop as
    soon as the left watermark passes them).

    Shape on unbounded streams: ONE shuffle of each side on the key into
    the symmetric stateful join; state is watermark-bounded, not
    history-bounded — the property that makes the operator viable at
    10^12 events/day.

    Output (append, finalized matches): (key_col, imp_ts, click_ts,
    lag_us).
    """
    li = impressions.withWatermark(ts_col, watermark).select(
        F.col(key_col).alias("_k"), F.col(ts_col).alias("imp_ts")
    )
    rc = clicks.withWatermark(ts_col, watermark).select(
        F.col(key_col).alias("_ck"), F.col(ts_col).alias("click_ts")
    )
    j = li.join(
        rc,
        F.expr(
            "_k = _ck AND click_ts >= imp_ts "
            f"AND click_ts <= imp_ts + interval {within}"
        ),
    )
    return j.select(
        F.col("_k").alias(key_col),
        "imp_ts",
        "click_ts",
        (
            F.unix_micros("click_ts") - F.unix_micros("imp_ts")
        ).alias("lag_us"),
    )


_RATE_SCHEMA = T.StructType([
    T.StructField("key", T.StringType()),
    T.StructField("batch_count", T.LongType()),
    T.StructField("hist_batches", T.LongType()),
    T.StructField("hist_total", T.LongType()),
    T.StructField("flagged", T.BooleanType()),
])


def rate_anomaly(
    events: DataFrame,
    key_col: str = "host",
    min_history: int = 3,
    factor: int = 5,
) -> DataFrame:
    """Streaming per-key rate-anomaly screen: for every micro-batch, flag
    keys whose event count exceeds `factor`× their own HISTORICAL
    per-batch mean — the crawler-trap / DDoS / scraper-burst alarm,
    incremental and stateful (the batch operators see the whole history;
    this sees one micro-batch plus ~24 B of state per key).

    State per key = (n_batches, total_events) — two longs; the flag test
    is pure integer cross-multiplication (count·n > factor·total), so
    identical on any engine/partitioning. Keys with fewer than
    `min_history` prior batches never flag (cold start). History updates
    AFTER the test, so a flagged burst still enters the running mean (a
    sustained new level stops flagging once it becomes the norm —
    deliberate, documented).

    Shape on an unbounded stream: ONE shuffle on the key into
    applyInPandasWithState; per-batch per-key output row. No TTL by
    default (hosts are a bounded keyspace); wrap keys with a coarse
    time-bucket upstream if unbounded.

    Output per micro-batch: (key, batch_count, hist_batches, hist_total,
    flagged).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def _update(key, pdf_iter, state):
        n = 0
        for pdf in pdf_iter:
            n += len(pdf)
        if n == 0:
            return
        if state.exists:
            hb, ht = state.get
        else:
            hb, ht = 0, 0
        flagged = bool(hb >= min_history and n * hb > factor * ht)
        state.update((hb + 1, ht + n))
        yield pd.DataFrame({
            "key": [key[0]], "batch_count": [n],
            "hist_batches": [hb], "hist_total": [ht],
            "flagged": [flagged],
        })

    return (
        events.select(F.col(key_col).cast("string").alias("key"))
        .groupBy("key")
        .applyInPandasWithState(
            _update, _RATE_SCHEMA, "hist_batches long, hist_total long",
            "append", GroupStateTimeout.NoTimeout,
        )
    )
