"""spark-submit entry point for the webtext curation pipeline — the
training-data path over the Common-Crawl-shaped pages table (BASELINE.json
input_hint schema: url, warc_ts, html, text, lang).

    zip -r /tmp/pbf2json_spark.zip pbf2json_spark
    spark-submit --py-files /tmp/pbf2json_spark.zip \
        jobs/crawl_curate_job.py \
        --n-pages 1000000 --checkpoint-root /tmp/ckpt --output /tmp/curated

Stages (resumable snapshots with per-partition lineage + metrics, same
contract as pages_tiles_job):

    pages     → Iceberg/parquet scan via --input, else deterministic synth
    extracted → html → text (byte-identical per url, the input_hint
                invariant) + canonical URL
    canon     → crawl dedup: ONE row per canonical URL (latest capture) —
                the id-keyed dedup the reference's LevelDB keying plays,
                re-expressed as a struct-max groupBy
    scored    → language ID + quality + repetition signals, filtered by
                --min-quality / --max-top-word
    deduped   → exact content dedup on the normalized fingerprint (first
                occurrence per 128-bit (fp64_norm, fp64b_norm) key wins,
                deterministic by (ts, url))
    redacted  → PII scrub (email/phone/IPv4) — after dedup so fingerprints
                see original bytes; scrubbed text replaces text
    packed    → training-mix export: token counts + concat-and-cut pack
                assignment (--pack-budget tokens per pack, hash order)

Every stage is a pure DataFrame plan (no Python except none at all — the
whole pipeline is JVM Column expressions), so the job scales with
executors; checkpoints make each stage a restart point at 10^12 rows.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from pbf2json_spark import iceberg, textops, weburl
from pbf2json_spark import pages as pages_mod
from pbf2json_spark.checkpoint import CheckpointManager, run_stages

STAGES = (
    "pages", "extracted", "canon", "scored", "deduped", "redacted", "packed",
)


# stage functions are module-level so tests can pin each stage's contract
# (tests/test_crawl_job.py) — main() only wires them into run_stages


def extract(p):
    e = pages_mod.extract_text(p)  # html -> text_extracted, byte-exact
    return weburl.with_norm_url(e).select(
        "url", "norm_url", "host", "warc_ts", "lang",
        F.col("text_extracted").alias("text"),
    )


def canon(p):
    # latest capture per canonical URL, then rejoin the payload by the
    # FULL winning key (norm_url, url, warc_ts) — joining on url alone
    # would resurrect every duplicate capture of the winning raw URL
    # (same page crawled in two segments) and break the one-row-per-
    # canonical-URL stage contract. Ids-only through the aggregate,
    # text joined back — the same shape as the LSH joins. A same-(url,
    # ts) re-capture is byte-identical by construction, so the residual
    # dropDuplicates is a no-op except on pathological inputs.
    best = p.groupBy("norm_url").agg(
        F.max(F.struct("warc_ts", "url")).alias("b")
    ).select(
        "norm_url", F.col("b.url").alias("url"), F.col("b.warc_ts").alias("warc_ts")
    )
    return (
        best.join(p, ["norm_url", "url", "warc_ts"])
        .select("url", "norm_url", "host", "warc_ts", "lang", "text")
        .dropDuplicates(["norm_url"])
    )


def score(p, min_quality: float = 0.3, max_top_word: float = 0.5):
    q = textops.quality_features(textops.detect_language(p))
    r = textops.repetition_features(q, id_col="url")
    return r.filter(
        (F.col("quality_score") >= min_quality)
        & (F.col("top_word_ratio") <= max_top_word)
    ).select(
        "url", "norm_url", "host", "warc_ts", "lang", "lang_pred",
        "quality_score", "top_word_ratio", "text",
    )


def dedup_exact(p):
    # 128-bit group key (fp64_norm, fp64b_norm): one 64-bit key expects
    # ~27k birthday merges at the 10^12-row design point (see
    # dedup.exact_dedup). Semi-join back on the FULL winning key — not url
    # alone — so the stage is correct standalone too: with repeated urls
    # across fingerprint groups a url-only join would keep losing
    # duplicates that happen to share a winning url.
    f = textops.fingerprint(p)
    keep = f.groupBy("fp64_norm", "fp64b_norm").agg(
        F.min(F.struct("warc_ts", "url")).alias("b")
    ).select(
        "fp64_norm", "fp64b_norm",
        F.col("b.warc_ts").alias("warc_ts"), F.col("b.url").alias("url"),
    )
    return f.join(keep, ["fp64_norm", "fp64b_norm", "warc_ts", "url"], "left_semi")


def redact(p):
    # PII scrub AFTER dedup (fingerprints must see the original bytes so a
    # redacted and an unredacted copy of the same page still collapse);
    # the scrubbed text REPLACES text for every LATER stage and the final
    # output. NB the EARLIER stages' checkpoint snapshots under
    # --checkpoint-root still hold pre-redaction text by design (that is
    # what makes them resumable) — treat the checkpoint root with the same
    # access controls as the raw crawl, and delete it after the run if the
    # redacted output is the only artifact allowed to persist.
    r = textops.redact_pii(p)
    return r.select(
        "url", "norm_url", "host", "warc_ts", "lang", "lang_pred",
        "quality_score", "n_redactions",
        F.col("text_redacted").alias("text"),
    )


def pack(p, budget: int = 2048):
    # training-mix export: whitespace token counts + concat-and-cut pack
    # assignment. The pack order key is xxhash64(norm_url) — deterministic,
    # and DELIBERATELY pseudo-random: packing in hash order is the shuffle
    # a training mix wants (no crawl locality inside a pack). norm_url is
    # unique after canon, so the order is total up to 64-bit hash
    # collisions (~birthday 27k pairs at 10^12 docs, which swap only the
    # colliding pair's relative order).
    from pbf2json_spark import packing

    t = textops.token_count(p)
    keyed = t.withColumn("pack_key", F.xxhash64("norm_url"))
    return packing.pack_sequences(
        keyed, budget, token_col="ws_tokens", order_col="pack_key"
    ).select(
        "url", "norm_url", "warc_ts", "lang_pred", "text",
        "ws_tokens", "offset", "pack_first", "pack_last", "n_packs",
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-pages", type=int, default=1_000_000)
    ap.add_argument(
        "--input", default=None,
        help="pages table (Iceberg identifier or parquet path); default synth",
    )
    ap.add_argument("--min-quality", type=float, default=0.3)
    ap.add_argument("--max-top-word", type=float, default=0.5,
                    help="drop pages whose most frequent word exceeds this share")
    ap.add_argument("--pack-budget", type=int, default=2048,
                    help="tokens per training pack (concat-and-cut)")
    ap.add_argument("--checkpoint-root", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--mode", choices=["resume", "overwrite"], default="resume")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("crawl-curate").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    mgr = CheckpointManager(spark, args.checkpoint_root, "crawl_curate")

    curated = run_stages(
        mgr,
        [
            (
                "pages",
                lambda _: (
                    iceberg.read_pages(spark, args.input)
                    if args.input
                    else pages_mod.generate_pages(
                        spark, args.n_pages,
                        partitions=spark.sparkContext.defaultParallelism * 4,
                    )
                ),
            ),
            ("extracted", extract),
            ("canon", canon),
            ("scored", lambda p: score(p, args.min_quality, args.max_top_word)),
            ("deduped", dedup_exact),
            ("redacted", redact),
            ("packed", lambda p: pack(p, args.pack_budget)),
        ],
        mode=args.mode,
    )
    curated.write.mode("overwrite").parquet(args.output)

    report = {}
    for stage in STAGES:
        m = mgr.read_metrics(stage).agg(
            F.sum("rows").alias("rows"),
            F.count(F.lit(1)).alias("partitions"),
            F.sum("bytes_est").alias("bytes_est"),
        ).collect()[0]
        report[stage] = {
            "rows": int(m["rows"]), "partitions": int(m["partitions"]),
            "bytes_est": int(m["bytes_est"]),
        }
    print("STAGE_METRICS " + json.dumps(report))


if __name__ == "__main__":
    main()
