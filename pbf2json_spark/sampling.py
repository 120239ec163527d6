"""Deterministic sampling for training-data curation.

`df.sample()` is partition-dependent (a repartition or a re-run with a
different split layout changes WHICH rows are kept). At 10^12 rows a
curation pipeline needs sampling that is a pure function of the ROW — so
the sample is reproducible across re-runs, resumable mid-job, and
consistent between a backfill and an incremental run that sees the same
row again.

Mechanism: u32(row) = first 8 hex chars of md5(id [+ salt]) as an integer
uniform in [0, 2^32); keep the row iff u32 < floor(fraction * 2^32).
md5 is available and identical in Spark and DuckDB, so the driver oracle
re-derives the exact sample membership (no float comparison anywhere —
the threshold compare is integer).

No shuffle: both operators are pure Column filters; stratified thresholds
compile to a CASE over the stratum column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_U32_SPAN = 1 << 32


def _u32(key: Column, seed: int) -> Column:
    """Deterministic uniform u32 from a row key: first 32 bits of
    md5(key || ':' || seed), portable across engines."""
    s = F.concat(key.cast("string"), F.lit(f":{seed}"))
    return F.conv(F.substring(F.md5(s.cast("binary")), 1, 8), 16, 10).cast("long")


def sample_exact(
    df: DataFrame, fraction: float, id_col: str = "doc_id", seed: int = 0
) -> DataFrame:
    """Keep ~fraction of rows, deterministically by row id (Bernoulli with
    a hash in place of an RNG)."""
    thr = int(fraction * _U32_SPAN)
    return df.filter(_u32(F.col(id_col), seed) < F.lit(thr))


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 0,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the language/domain rebalancing
    step of a training-data mix. `fractions` maps stratum value → keep
    fraction; strata not listed keep `default_fraction` (0 = drop).

    Same u32-threshold mechanism; thresholds become one CASE expression, so
    the whole operator is a scan-level filter (predicate-pushdown friendly,
    zero shuffle, trivially parallel at any cluster size).
    """
    thr = F.lit(int(default_fraction * _U32_SPAN))
    expr = None
    for value, frac in fractions.items():
        cond = F.col(stratum_col) == value
        t = F.lit(int(frac * _U32_SPAN))
        expr = F.when(cond, t) if expr is None else expr.when(cond, t)
    thr = expr.otherwise(thr) if expr is not None else thr
    return df.filter(_u32(F.col(id_col), seed) < thr)
