"""r02 vs HEAD physical-plan deltas for the r3-flagged regression cluster
(VERDICT r3 task 9): capture .explain('formatted') for each flagged query
in BOTH checkouts and tabulate the plan-shape properties that could explain
a wall-time change — exchange count, Python (Arrow) stages, codegen spans,
join strategies — so plan drift and host drift are separable in the record.

Usage: python tools/plan_delta.py <old_worktree_dir>
Appends a section to PLANS.md and prints the summary JSON.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

QUERIES = [
    "pip_join_rect", "knn_grid", "geocode_tile", "tile_aggregate",
    "jaccard_pairs", "minhash_pairs", "windowed_events", "relation_bbox",
]

CHILD = r"""
import io, json, sys
from contextlib import redirect_stdout
sys.path.insert(0, ".")
from pbf2json_spark.session import get_spark
import __spark_entry__ as entry_mod

names = json.loads(sys.argv[1])
sf_dir = "/root/testdata/sf0.01"
spark = get_spark("plan-delta")
spark.sparkContext.setLogLevel("ERROR")
extra = getattr(entry_mod, "extra_queries", lambda: {})()
queries = {**entry_mod.queries(), **extra}
out = {}
for name in names:
    q = queries.get(name)
    if q is None:
        out[name] = None
        continue
    df = q(spark, sf_dir)
    df.collect()  # materialize AQE final plan
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    out[name] = buf.getvalue()
print("===PLANS===")
print(json.dumps(out))
"""


def capture(repo_dir: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD, json.dumps(QUERIES)],
        capture_output=True, text=True, cwd=repo_dir, check=True,
    )
    txt = out.stdout.split("===PLANS===", 1)[1].strip()
    return json.loads(txt.splitlines()[0])


def summarize(plan: str | None) -> dict | None:
    if plan is None:
        return None
    def n(pat: str) -> int:
        return len(re.findall(pat, plan))
    return {
        "exchanges": n(r"\bExchange\b|\bShuffleExchange|\(\d+\) Exchange"),
        "broadcast_joins": n(r"BroadcastHashJoin"),
        "smj": n(r"SortMergeJoin"),
        "shuffled_hash": n(r"ShuffledHashJoin"),
        "arrow_python": n(r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas"),
        "batch_python": n(r"BatchEvalPython"),
        "codegen_spans": n(r"WholeStageCodegen"),
        "scans": n(r"Scan parquet"),
    }


def main() -> None:
    old_dir = sys.argv[1]
    new_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plans = {"old": capture(old_dir), "new": capture(new_dir)}
    rows = {}
    for name in QUERIES:
        rows[name] = {
            "old": summarize(plans["old"].get(name)),
            "new": summarize(plans["new"].get(name)),
        }
    print(json.dumps(rows))

    keys = ["exchanges", "broadcast_joins", "smj", "shuffled_hash",
            "arrow_python", "batch_python", "codegen_spans", "scans"]
    lines = [
        "\n## r02 → r04 plan deltas for the r3-flagged regression cluster "
        "(tools/plan_delta.py)\n",
        "Per query: plan-shape counts in the r02-era checkout (commit "
        "c31b881) vs HEAD at sf0.01 (AQE-final plans). A query whose shape "
        "is unchanged but whose r03 wall time moved is host drift by "
        "elimination; a changed shape names the suspect directly.\n",
        "| query | side | " + " | ".join(keys) + " |",
        "|---|---|" + "---|" * len(keys),
    ]
    for name, row in rows.items():
        for side in ("old", "new"):
            s = row[side]
            if s is None:
                lines.append(f"| {name} | {side} | " +
                             " | ".join(["-"] * len(keys)) + " |")
            else:
                lines.append(
                    f"| {name} | {side} | "
                    + " | ".join(str(s[k]) for k in keys) + " |"
                )
    with open(os.path.join(new_dir, "PLANS.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    print("appended plan-delta section to PLANS.md", file=sys.stderr)


if __name__ == "__main__":
    main()
