"""The r2/r3 windowed_events driver-red regression, pinned: the same
query must be bit-exact vs its DuckDB oracle under EVERY timestamp-reader
configuration — NTZ parquet read (local default) and LTZ read
(inferTimestampNTZ off) × UTC and non-UTC session zones. The old
F.window + hour()/cast-to-date derivation shifted whole hours under
LTZ + non-UTC while preserving group structure (rows matched, hash
didn't) — exactly the two-round driver signature."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _oracle(name: str):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF}/events.parquet')"
    )
    return con.execute(entry.oracle_sql()[name]).df()


def _norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("ntz", ["true", "false"])
@pytest.mark.parametrize("tz", ["Etc/UTC", "America/New_York", "Asia/Kolkata"])
@pytest.mark.parametrize("qname", ["windowed_events", "ts_probe"])
def test_reader_config_invariance(spark, ntz, tz, qname):
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", ntz)
        spark.conf.set("spark.sql.session.timeZone", tz)
        got = _norm(entry.queries()[qname](spark, SF).toPandas())
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    want = _norm(_oracle(qname))
    assert got.shape == want.shape
    for c in got.columns:
        # Dtype KIND must match, not just values: int64 123 == float64
        # 123.0 numerically, but the driver's hash is dtype-faithful and
        # sees "123" vs "123.0".  An uncast DuckDB SUM(BIGINT) promotes
        # to HUGEINT and lands in pandas as float64 — the r2-r4
        # windowed_events red signature this test previously masked.
        gk = "f" if got[c].dtype.kind == "f" else "i" if got[c].dtype.kind in "iu" else "o"
        wk = "f" if want[c].dtype.kind == "f" else "i" if want[c].dtype.kind in "iu" else "o"
        assert gk == wk, (qname, c, got[c].dtype, want[c].dtype)
        assert (got[c].values == want[c].values).all(), (qname, ntz, tz, c)
