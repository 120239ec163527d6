"""Distribution profiling primitives — the per-group statistics a corpus
pipeline runs to characterize hosts, languages, and regions before
setting curation thresholds: exact histogram quantiles (p50/p90/p99 of
document length per host) and concentration indices (how dominated is a
host by one page template, a region by one domain).

Everything is integer arithmetic end to end — bin edges, cumulative
ranks, e6 ratios — so results are bit-identical on any engine and the
DuckDB oracles compare value-exact. (`F.percentile` covers the
EXACT-quantile case at interpolated precision — see host_median_len;
these histogram quantiles are the SCALE path: fixed-width bins make the
state per group `range/bin_width` counters instead of the full value
multiset, the same trade t-digest/KLL make but deterministic.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def hist_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    bin_width: int,
    percents: list[int] = (50, 90, 99),
) -> DataFrame:
    """Histogram quantiles per group: values bucket into fixed-width bins
    (bin = value div bin_width, integer), and the p-th quantile is the
    LOWER EDGE of the first bin whose cumulative count reaches
    ceil(p·total/100) — the classic "histogram_quantile" estimator
    (Prometheus/HDR-histogram semantics, conservative to the bin floor),
    fully deterministic: no interpolation, no float.

    Scale shape at 10^12 rows: ONE map-side-combinable groupBy to
    (group, bin) counts — state per group is the OCCUPIED bin count, not
    the row count — then a window cumsum over each group's bins (bins
    per group ≤ range/bin_width, thousands at most, so the window
    partition is tiny regardless of group size) and one aggregation
    picking each percentile's first crossing bin. Rows never shuffle
    twice; values never leave the scan stage.

    Output: (group_cols..., n_total) + one `p<P>` BIGINT column per
    requested percent (the bin lower edge, in value units).
    """
    if bin_width <= 0:
        raise ValueError("bin_width > 0")
    b = (
        df.select(*group_cols,
                  F.expr(f"{value_col} div {bin_width}").alias("_bin"))
        .groupBy(*group_cols, "_bin")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    w = Window.partitionBy(*group_cols).orderBy("_bin")
    c = b.select(
        *group_cols, "_bin", "_n",
        F.sum("_n").over(w).alias("_cum"),
        F.sum("_n").over(
            Window.partitionBy(*group_cols)
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("_tot"),
    )
    aggs = [F.max("_tot").alias("n_total")]
    for p in percents:
        # rank needed = ceil(p * total / 100), integer: (p*tot + 99) div 100
        aggs.append(
            F.min(
                F.when(
                    F.col("_cum") * 100 >= F.col("_tot") * p,
                    F.col("_bin") * bin_width,
                )
            ).alias(f"p{p}")
        )
    return c.groupBy(*group_cols).agg(*aggs)


def concentration(
    df: DataFrame,
    group_cols: list[str],
    item_col: str,
) -> DataFrame:
    """Concentration profile per group — how dominated a group is by its
    top item: the host-level "is this site one template repeated 10^6
    times", region-level "is this area one domain's CDN" screen.

        top_share_e6 = max(n_i) · 1e6 div N
        hhi_e8       = Σ n_i² · 1e8 div N²   (Herfindahl–Hirschman)

    hhi_e8 ranges from ~1e8/k (k equal items) to 1e8 (single item); e8
    keeps two extra digits so small-share sums don't vanish in the
    integer division. All integer — sums of squares are
    order-independent, so any partitioning and any engine agree exactly.

    Scale shape: TWO map-side-combinable groupBys — (group, item)
    counts, then per-group moments (count, max, sum of squares). No
    window, no sort; shuffle payload is (group, item, count).

    Output: (group_cols..., n_items, n_total, top_share_e6, hhi_e8).
    """
    per_item = (
        df.groupBy(*group_cols, item_col)
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    return (
        per_item.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("_n").alias("n_total"),
            F.max("_n").alias("_top"),
            F.sum(F.col("_n") * F.col("_n")).alias("_ss"),
        )
        .select(
            *group_cols, "n_items", "n_total",
            F.expr("_top * 1000000 div n_total").alias("top_share_e6"),
            F.expr("_ss * 100000000 div (n_total * n_total)").alias("hhi_e8"),
        )
    )
