"""Hypothesis property tests for the pure kernels (no Spark session):
PNG/WAV codec round-trips on arbitrary arrays, and URL canonicalization
idempotence — normalize(normalize(u)) == normalize(u), the defining
property of a canonical form (evaluated through DuckDB running the same
SQL expression the driver oracle uses, so the property covers the mirror
too)."""

from __future__ import annotations

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pbf2json_spark import codecs

# --- codecs ---------------------------------------------------------------------


@settings(max_examples=60, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    ch=st.sampled_from([1, 3, 4]),
    ft=st.integers(0, 4),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(h, w, ch, ft, seed):
    rng = np.random.default_rng(seed)
    shape = (h, w) if ch == 1 else (h, w, ch)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    out = codecs.decode_png(codecs.encode_png(img, filter_type=ft))
    assert out.shape == img.shape and (out == img).all()


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(1, 2000),
    sr=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_property(n, sr, seed):
    rng = np.random.default_rng(seed)
    s = rng.integers(-32768, 32767, n).astype(np.int16)
    sr2, ch, out = codecs.decode_wav(codecs.encode_wav(s, sr))
    assert (sr2, ch) == (sr, 1) and (out == s).all()


# --- URL canonicalization idempotence --------------------------------------------

# evaluate weburl.normalize_url's EXACT SQL mirror (the expression the
# driver oracle runs) in DuckDB — a pure function we can property-test
# without a Spark session
import sys

sys.path.insert(0, ".")
from __spark_entry__ import _norm_url_sql  # noqa: E402

_CON = duckdb.connect()


def _norm(u: str) -> str:
    expr = _norm_url_sql("u")
    return _CON.execute(f"SELECT {expr} FROM (SELECT ? AS u)", [u]).fetchone()[0]


_scheme = st.sampled_from(["http", "https", "HTTP", "HtTpS", "ftp"])
_host = st.from_regex(r"[A-Za-z0-9.-]{1,20}", fullmatch=True)
_port = st.sampled_from(["", ":80", ":443", ":8080", ":0080"])
_path = st.from_regex(r"(/[A-Za-z0-9._~%-]{0,8}){0,3}/?", fullmatch=True)
_query = st.sampled_from(["", "?a=1", "?a=1&b=2", "?"])
_frag = st.sampled_from(["", "#x", "#a/b?c"])
_user = st.sampled_from(["", "alice@", "A:p@"])


@settings(max_examples=300, deadline=None)
@given(
    scheme=_scheme, user=_user, host=_host, port=_port,
    path=_path, query=_query, frag=_frag,
)
def test_normalize_url_idempotent(scheme, user, host, port, path, query, frag):
    u = f"{scheme}://{user}{host}{port}{path}{query}{frag}"
    once = _norm(u)
    twice = _norm(once)
    assert twice == once, (u, once, twice)


@settings(max_examples=100, deadline=None)
@given(st.text(min_size=0, max_size=40))
def test_normalize_url_total_on_garbage(s):
    # unparseable inputs pass through unchanged (and hence idempotently)
    out = _norm(s)
    if "://" not in s:
        # inputs without an authority either pass through or (when a
        # scheme-like prefix parses) still normalize idempotently
        assert _norm(out) == out


# --- quadkey <-> Morton cell equivalence -----------------------------------------


@settings(max_examples=200, deadline=None)
@given(
    lat=st.floats(min_value=-90.0, max_value=90.0, allow_nan=False),
    lon=st.floats(min_value=-180.0, max_value=180.0, allow_nan=False),
    res=st.integers(1, 26),
)
def test_quadkey_cell_equivalence_property(lat, lon, res):
    """For any point and resolution, the quadkey digit string built from
    the grid (x, y) names the same tile as the int64 Morton cell id, and
    every prefix names the enclosing parent tile."""
    from pbf2json_spark import cells

    cell = int(cells.encode(np.array([lat]), np.array([lon]), res)[0])
    x, y = cells.xy(np.array([lat]), np.array([lon]), res)
    qk = "".join(
        str(((int(y[0]) >> (res - 1 - j)) & 1) * 2 + ((int(x[0]) >> (res - 1 - j)) & 1))
        for j in range(res)
    )
    assert cells.quadkey_to_cell(qk) == cell
    for plen in {1, res // 2, res} - {0}:
        parent = int(cells.parent(np.array([cell]), plen)[0])
        assert cells.quadkey_to_cell(qk[:plen]) == parent


