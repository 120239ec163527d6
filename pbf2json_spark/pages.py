"""Synthetic Common-Crawl-style `pages` table + geocode extraction.

Input shape per BASELINE.json input_hint: (url:string, warc_ts:timestamp,
html:binary, text:string, lang:string). The generator is fully deterministic
(pure Column expressions of the row id seeded through xxhash64 — no Python,
no RNG state), so the same (n, seed) always yields byte-identical text per
url — the pipeline invariant the tests assert.

Geo distribution: a mixture of hot city clusters (forces cell skew — the
salting/AQE test bed) and a uniform background; a configurable fraction of
pages embeds machine-readable coordinates in `text` ("lat=..; lon=..") for
the geocode step.

Geocoding (north_star: "pages are geocoded (lat/lon extracted from text)"):
  * `geocode` — pure JVM `regexp_extract`, the default hot path (stays in
    WholeStageCodegen);
  * `geocode_arrow` — the vectorized Arrow/pandas-UDF variant mandated by
    input_hint; tests assert both agree exactly.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# (name-ish seed, lat, lon, weight) — a few heavy hitters on purpose
HOT_CENTERS = [
    (60.17, 24.94, 30),   # Helsinki — deliberately dominant
    (40.71, -74.01, 20),  # NYC
    (51.51, -0.13, 15),   # London
    (35.68, 139.69, 10),  # Tokyo
    (-33.87, 151.21, 8),  # Sydney
    (49.25, -123.10, 7),  # Vancouver (the reference's fixture city)
    (48.86, 2.35, 5),
    (55.76, 37.62, 3),
    (1.35, 103.82, 1),
    (-23.55, -46.63, 1),
]

LANGS = [("en", 55), ("fi", 15), ("sv", 10), ("de", 8), ("fr", 6), ("ja", 4), ("zz", 2)]

GEO_RE = r"lat=(-?\d+\.\d{6}); lon=(-?\d+\.\d{6})"


def _u(h: Column, salt: int, mod: int = 1_000_003) -> Column:
    """Deterministic uniform in [0,1) derived from a hash column."""
    return (F.pmod(F.xxhash64(h, F.lit(salt)), F.lit(mod)) / F.lit(float(mod)))


def generate_pages(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    geo_fraction: float = 0.7,
    hot_fraction: float = 0.6,
    partitions: int | None = None,
) -> DataFrame:
    df = spark.range(0, n, 1, partitions) if partitions else spark.range(n)
    rid = F.col("id")
    h = F.xxhash64(rid, F.lit(seed))

    # location: hot cluster vs uniform background
    total_w = sum(w for _, _, w in HOT_CENTERS)
    pick = _u(h, 1) * total_w
    acc = 0.0
    clat, clon = F.lit(None).cast("double"), F.lit(None).cast("double")
    clat_expr = None
    clon_expr = None
    for lat, lon, w in HOT_CENTERS:
        cond = (pick >= acc) & (pick < acc + w)
        clat_expr = F.when(cond, F.lit(lat)) if clat_expr is None else clat_expr.when(cond, F.lit(lat))
        clon_expr = F.when(cond, F.lit(lon)) if clon_expr is None else clon_expr.when(cond, F.lit(lon))
        acc += w
    is_hot = _u(h, 2) < hot_fraction
    lat = F.when(is_hot, clat_expr + (_u(h, 3) - 0.5) * 0.2).otherwise(
        _u(h, 4) * 130.0 - 60.0
    )
    lon = F.when(is_hot, clon_expr + (_u(h, 5) - 0.5) * 0.2).otherwise(
        _u(h, 6) * 360.0 - 180.0
    )
    lat = F.round(lat, 6)
    lon = F.round(lon, 6)

    has_geo = _u(h, 7) < geo_fraction
    geo_snippet = F.format_string("lat=%.6f; lon=%.6f", lat, lon)
    filler = F.format_string(
        "Document %d discusses topic-%d in depth. ", rid, F.pmod(h, F.lit(97))
    )
    text = F.when(
        has_geo,
        F.concat(filler, F.lit("Location: "), geo_snippet, F.lit(". More text follows.")),
    ).otherwise(F.concat(filler, F.lit("No location is mentioned here.")))

    lang_pick = F.pmod(F.xxhash64(rid, F.lit(seed + 1)), F.lit(100))
    acc = 0
    lang_expr = None
    for code, w in LANGS:
        cond = (lang_pick >= acc) & (lang_pick < acc + w)
        lang_expr = (
            F.when(cond, F.lit(code)) if lang_expr is None else lang_expr.when(cond, F.lit(code))
        )
        acc += w
    lang = F.coalesce(lang_expr, F.lit("en"))

    url = F.format_string("https://host%d.example/p/%d", F.pmod(h, F.lit(1000)), rid)
    warc_ts = F.timestamp_seconds(F.lit(1_600_000_000) + rid % F.lit(86_400 * 365))
    html = F.encode(
        F.concat(F.lit("<html><body><p>"), text, F.lit("</p></body></html>")), "utf-8"
    )
    return df.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        lang.alias("lang"),
    )


# --- text extraction -------------------------------------------------------------


# Java-regex AND RE2 compatible (no backreferences) so the DuckDB oracle can
# run the identical patterns: script/style handled as two separate literals.
_SCRIPT_RE = r"(?is)<script[^>]*>.*?</script>"
_STYLE_RE = r"(?is)<style[^>]*>.*?</style>"
_TAG_RE = r"<[^>]*>"
# &amp; deliberately last so "&amp;lt;" decodes to "&lt;" not "<".
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")]


def extract_text(
    pages: DataFrame, html_col: str = "html", out_col: str = "text_extracted"
) -> DataFrame:
    """HTML → text extraction, pure JVM (stays in WholeStageCodegen).

    Closes the input_hint per-row invariant literally: "byte-identical
    extracted text per url" — extraction is a pure function of the html
    bytes (UTF-8 decode → drop <script>/<style> blocks → strip tags →
    decode the five XML entities), so the same bytes produce the same text
    on any executor, any partitioning, any cluster size. Round-trips the
    generator: extract_text(generate_pages(...).html) == text, byte-equal
    (tests/test_webscale.py)."""
    s = F.decode(F.col(html_col), "utf-8")
    s = F.regexp_replace(s, _SCRIPT_RE, "")
    s = F.regexp_replace(s, _STYLE_RE, "")
    s = F.regexp_replace(s, _TAG_RE, "")
    for ent, ch in _ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    return pages.withColumn(out_col, s)


@F.pandas_udf(T.StringType())
def _extract_text_udf(html: pd.Series) -> pd.Series:
    s = html.apply(lambda b: b.decode("utf-8") if b is not None else None)
    s = s.str.replace(_SCRIPT_RE, "", regex=True)
    s = s.str.replace(_STYLE_RE, "", regex=True)
    s = s.str.replace(_TAG_RE, "", regex=True)
    for ent, ch in _ENTITIES:
        s = s.str.replace(ent, ch, regex=False)
    return s


def extract_text_arrow(
    pages: DataFrame, html_col: str = "html", out_col: str = "text_extracted"
) -> DataFrame:
    """Arrow-batched pandas-UDF twin of `extract_text` (input_hint mandates
    the vectorized-UDF surface); tests assert both agree byte-for-byte."""
    return pages.withColumn(out_col, _extract_text_udf(F.col(html_col)))


# --- geocode -------------------------------------------------------------------


def geocode(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """JVM-side geocode: adds nullable lat/lon extracted from the text.

    Two grouped regexp_extract calls; Catalyst's common-subexpression
    elimination shares the underlying match (verified in PLANS.md and by an
    interleaved A/B: a hand-rolled single-regex + substring_index variant
    measured ~3% SLOWER — the regex is not the bottleneck here)."""
    t = F.col(text_col)
    lat = F.nullif(F.regexp_extract(t, GEO_RE, 1), F.lit("")).cast("double")
    lon = F.nullif(F.regexp_extract(t, GEO_RE, 2), F.lit("")).cast("double")
    return pages.withColumn("lat", lat).withColumn("lon", lon)


_GEOCODE_SCHEMA = T.StructType(
    [T.StructField("lat", T.DoubleType()), T.StructField("lon", T.DoubleType())]
)


@F.pandas_udf(_GEOCODE_SCHEMA)
def _geocode_udf(text: pd.Series) -> pd.DataFrame:
    ext = text.str.extract(GEO_RE)
    return pd.DataFrame(
        {"lat": pd.to_numeric(ext[0], errors="coerce"),
         "lon": pd.to_numeric(ext[1], errors="coerce")}
    )


def geocode_arrow(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """Arrow-batched pandas-UDF geocode (input_hint-mandated variant)."""
    g = _geocode_udf(F.col(text_col))
    return pages.withColumn("lat", g["lat"]).withColumn("lon", g["lon"])


def toponym_resolve(
    mentions: DataFrame,
    gazetteer: DataFrame,
    doc_col: str = "doc_id",
    name_col: str = "name",
    id_col: str = "place_id",
    lat_col: str = "lat_e6",
    lon_col: str = "lon_e6",
    pop_col: str = "population",
) -> DataFrame:
    """Gazetteer toponym disambiguation — the second stage of geoparsing
    (after `geocode`'s literal lat/lon extraction): every (doc, place-name)
    mention is resolved to ONE gazetteer entry even when the name is
    ambiguous ("Paris" the capital vs. "Paris, Texas").

    Two classic signals, combined deterministically:

    * **spatial coherence** — a document's UNAMBIGUOUS mentions (names with
      exactly one gazetteer row) vote for a region; ambiguous names pick
      the candidate nearest that anchor point (planar L1 distance on
      integer microdegrees; no longitude wrap — gazetteers are bounded
      synthetic regions here, and a wrapped variant would only change the
      distance term).
    * **population prior** — with no anchors in the doc (or to break exact
      distance ties), the most populous candidate wins; final tie-break is
      the smallest ``place_id``, so the output is a pure function of the
      input (re-run / re-partition / cross-engine stable).

    Exactness discipline: the anchor point is the per-doc MEAN of the
    unambiguous coordinates — kept as the exact rational (sum, n) pair, so
    the candidate distance is compared as ``|lat*n - sum_lat| + |lon*n -
    sum_lon|`` — all BIGINT, no division, bit-exact in any engine.

    Plan shape at 10^12 mentions: the gazetteer is a metadata-scale dim →
    its name-ambiguity census is a broadcast; candidates = mentions ⋈
    gazetteer broadcast equi-join on name; anchors = ONE map-side-
    combinable groupBy(doc) over the unambiguous subset (slim integer
    payload); candidates ⋈ anchors is a hash join on doc (AQE-splittable if
    one doc mentions everything); the final per-(doc,name) pick is a
    struct-MIN groupBy — map-side combinable, never a window sort.

    Reference analog: pbf2json's tag dictionaries map raw OSM names to
    display names one-to-one (enrich.py J6/J7 citations); this operator is
    the web-scale generalization where the mapping is one-to-MANY and the
    engine must pick.

    Output: one row per distinct (doc, name): doc, name, place_id, lat_e6,
    lon_e6, method ('unique' | 'coherence' | 'prior').
    """
    d, nm = F.col(doc_col), F.col(name_col)

    # name → candidate count (metadata-scale census on the dim itself)
    ncand = gazetteer.groupBy(name_col).agg(F.count(F.lit(1)).alias("_ncand"))
    gaz = gazetteer.join(F.broadcast(ncand), name_col)

    men = mentions.select(doc_col, name_col).distinct()
    cand = men.join(F.broadcast(gaz), name_col)

    # per-doc anchor: exact rational mean of unambiguous mention coords
    anchors = (
        cand.filter(F.col("_ncand") == 1)
        .groupBy(doc_col)
        .agg(
            F.sum(F.col(lat_col)).alias("_alat"),
            F.sum(F.col(lon_col)).alias("_alon"),
            F.count(F.lit(1)).alias("_an"),
        )
    )
    c = cand.join(anchors, doc_col, "left")

    # |lat*n - sum| + |lon*n - sum|, scaled-by-n exact integer L1; docs
    # with no anchor rank all candidates at distance 0 (prior decides)
    dist = F.when(
        F.col("_an").isNotNull(),
        F.abs(F.col(lat_col) * F.col("_an") - F.col("_alat"))
        + F.abs(F.col(lon_col) * F.col("_an") - F.col("_alon")),
    ).otherwise(F.lit(0)).cast("long")

    pick = F.struct(
        dist.alias("d"),
        (-F.col(pop_col).cast("long")).alias("negpop"),
        F.col(id_col).cast("long").alias("pid"),
        F.col(lat_col).cast("long").alias("plat"),
        F.col(lon_col).cast("long").alias("plon"),
        F.col("_ncand").alias("nc"),
        F.col("_an").alias("an"),
    )
    best = (
        c.groupBy(doc_col, name_col)
        .agg(F.min(pick).alias("_b"))
        .select(
            d,
            nm,
            F.col("_b.pid").alias(id_col),
            F.col("_b.plat").alias(lat_col),
            F.col("_b.plon").alias(lon_col),
            F.when(F.col("_b.nc") == 1, F.lit("unique"))
            .when(F.col("_b.an").isNotNull(), F.lit("coherence"))
            .otherwise(F.lit("prior"))
            .alias("method"),
        )
    )
    return best
