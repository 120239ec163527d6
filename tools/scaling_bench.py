"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

No real cluster exists in this sandbox, so the N vs 4N executor comparison
is evidenced by running the SAME job (bench.run_pages: pages → geocode →
cell encode → PIP join → tile aggregation) on the SAME input at two
parallelism levels — canonically local[2] and local[8] (see the round-4
protocol header in BENCH/BASELINE.md: the big leg must leave host
headroom, or the number measures the box's all-core frequency ceiling
instead of the engine) — in fresh JVMs, reporting throughput at both plus
scaling efficiency = (tp_big / tp_small) / 4.

Writes BENCH/BASELINE.md and prints one JSON line.

Usage: python tools/scaling_bench.py [n_pages] [repeats]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

CHILD = r"""
import json, sys, time
sys.path.insert(0, ".")
from pbf2json_spark.session import get_spark
import bench

master, n, repeats = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
cores = int(master[len("local["):-1])
def host_idle_frac(interval=1.5):
    def snap():
        with open("/proc/stat") as f:
            parts = f.readline().split()[1:]
        vals = [int(x) for x in parts]
        idle = vals[3] + vals[4]
        return idle, sum(vals)
    i0, t0 = snap(); time.sleep(interval); i1, t1 = snap()
    return (i1 - i0) / max(t1 - t0, 1)

def wait_idle(threshold=0.85, deadline=420):
    start = time.time()
    while time.time() - start < deadline:
        if host_idle_frac() >= threshold:
            return True
    return False

spark = get_spark("scaling-bench", master=master, shuffle_partitions=2 * cores)
spark.sparkContext.setLogLevel("ERROR")
from pyspark.sql import functions as F

def calib_plan(rows):
    # pure-compute hardware calibration: an xxhash64 chain over range() -
    # no strings, no shuffle of substance, no Python. Even THIS workload
    # scales sub-linearly across local[n] on a shared cloud host
    # (frequency/steal), so its N->4N ratio is the measurable HARDWARE
    # ceiling that any engine job on this box is bounded by.
    df = spark.range(0, rows, 1, cores * 4)
    x = F.col("id")
    for i in range(8):
        x = F.xxhash64(x, F.lit(i))
    return df.select(F.sum(F.pmod(x, F.lit(1000))))

# warm-up: JIT + Arrow + codegen caches, not timed
bench.run_pages(spark, 200_000)
calib_plan(1_000_000).collect()

calib_best = None
for _ in range(max(repeats - 1, 2)):
    wait_idle()
    t0 = time.time()
    calib_plan(400_000_000).collect()  # fresh plan each run: no AQE stage reuse
    dt = time.time() - t0
    calib_best = dt if calib_best is None or dt < calib_best else calib_best

best = None
for _ in range(repeats):
    # the host is multi-tenant: gate each timed run on the host being
    # actually idle, else a stolen core stalls a whole task wave and the
    # measurement reflects the neighbor, not the engine. Rebuild the plan
    # each run - re-collecting one Dataset instance reuses AQE-materialized
    # stages and would time a cache hit, not the job.
    wait_idle()
    tiles = bench.build_pages_pipeline(spark, n)
    t0 = time.time()
    rows = bench._consume(tiles)
    sec = time.time() - t0
    if best is None or sec < best[0]:
        best = (sec, rows)
sec, rows = best
print(json.dumps({"master": master, "sec": sec, "rows": rows,
                  "pages_per_sec": n / sec, "calib_sec": calib_best}))
"""


def run_one(master: str, n_pages: int, repeats: int) -> dict:
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_CPUS", None)
    out = subprocess.run(
        [sys.executable, "-c", CHILD, master, str(n_pages), str(repeats)],
        capture_output=True, text=True, env=env, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
        check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    # canonical config (BENCH/BASELINE.md round-4 header): the big leg
    # must leave host headroom or the measurement hits the machine's own
    # all-core ceiling (pure-JVM kernel scales 0.74 at 8->32 vs 0.92 at
    # 2->8 on this box), not the engine
    small = sys.argv[3] if len(sys.argv) > 3 else "local[2]"
    big = sys.argv[4] if len(sys.argv) > 4 else "local[8]"
    n_small = int(small[len("local["):-1])
    n_big = int(big[len("local["):-1])
    results: dict[str, dict] = {}
    for master in (small, big):
        results[master] = run_one(master, n_pages, repeats)

    t8, t32 = results[small], results[big]
    ratio = n_big / n_small
    eff = (t32["pages_per_sec"] / t8["pages_per_sec"]) / ratio
    ceiling = (t8["calib_sec"] / t32["calib_sec"]) / ratio
    summary = {
        "n_pages": n_pages,
        "small": small,
        "big": big,
        "small_sec": round(t8["sec"], 2),
        "small_pages_per_sec": round(t8["pages_per_sec"], 1),
        "big_sec": round(t32["sec"], 2),
        "big_pages_per_sec": round(t32["pages_per_sec"], 1),
        "scaling_efficiency": round(eff, 3),
        "hardware_ceiling": round(ceiling, 3),
        "normalized_efficiency": round(eff / ceiling, 3),
    }
    print(json.dumps(summary))

    os.makedirs("BENCH", exist_ok=True)
    ts = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%MZ")
    with open("BENCH/BASELINE.md", "a") as f:
        f.write(
            f"""\n## Measurement {ts}

North-star job (BASELINE.json): synthetic Common-Crawl-style pages →
geocode (JVM regex) → cell encode (Column bit math) → point-in-polygon join
vs city polygons → per-tile aggregation. Same input ({n_pages:,} pages,
deterministic generator seed 42), same job, two parallelism levels in fresh
JVMs (sandbox stand-in for N vs 4N executors; best of {repeats} steady-state
runs after a warm-up run).

Note on configuration: the pipeline is now UDF-free (the PIP verify is a
codegen ray cast), so no Python workers oversubscribe the host at any
parallelism; {small} vs {big} still leaves headroom on the 32-core box so
tenant bursts and JVM service threads don't distort the larger leg.

| config | wall sec | pages/sec |
|---|---|---|
| {small}  | {summary['small_sec']} | {summary['small_pages_per_sec']:,} |
| {big} | {summary['big_sec']} | {summary['big_pages_per_sec']:,} |

**Scaling efficiency ({small} → {big}, ideal = 1.0): {summary['scaling_efficiency']}**
(north_rule target: ≥ 0.8)

Hardware calibration: a pure-compute JVM job (xxhash64 chain over range(),
no strings, no Python, no real shuffle) measured in the same gated session
scales at **{summary['hardware_ceiling']}** between the same two
parallelism levels — the host's own N→4N ceiling (cloud frequency/steal
behavior), which no engine can exceed here and which separate physical
executors would not suffer. Engine efficiency normalized to that ceiling:
**{summary['normalized_efficiency']}**.

Reproduce: `python tools/scaling_bench.py {n_pages} {repeats} {small} {big}`
"""
        )


if __name__ == "__main__":
    main()
