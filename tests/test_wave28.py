"""Wave-28: HMM map-matching (Viterbi) vs brute-force DP, plus the
noise-robustness property nearest-segment matching lacks."""

from __future__ import annotations

import random

from pbf2json_spark import spatial

SH, JP = 10_000, 1_000_000_000


def _point_seg_dist2(px, py, ax, ay, bx, by):
    # mirrors the operator: lon = x, lat = y, projection + clamp
    dx, dy = bx - ax, by - ay
    len2 = dx * dx + dy * dy
    t = 0.0 if len2 == 0.0 else max(0.0, min(1.0, ((px - ax) * dx + (py - ay) * dy) / len2))
    qx, qy = ax + t * dx, ay + t * dy
    return (px - qx) * (px - qx) + (py - qy) * (py - qy)


def _brute_match(pings, segs, radius, cand_k, jp=JP):
    """pings: [(ts, lat, lon)]; segs: {sid: (alat, alon, blat, blon)}."""
    r2 = radius * radius
    levels = []
    for ts, la, lo in sorted(pings):
        cands = []
        for sid, (aa, ab, ba, bb) in segs.items():
            d2 = _point_seg_dist2(lo, la, ab, aa, bb, ba)
            if d2 <= r2:
                cands.append((int(d2 * 1e12), sid))
        cands.sort()                      # (emis, sid) — the operator's rank
        cands = cands[:cand_k]
        if cands:
            # DP iterates sid-ascending (the operator sorts by _sid), so
            # the strict-< predecessor tie-break matches
            levels.append((ts, sorted((sid, e) for e, sid in cands)))
    if not levels:
        return []
    ends = {s: {(v[0], v[1]), (v[2], v[3])} for s, v in segs.items()}
    costs = [e for _s, e in levels[0][1]]
    backs = []
    for li in range(1, len(levels)):
        prev = levels[li - 1][1]
        ncosts, nback = [], []
        for sid, e in levels[li][1]:
            bc, bp = None, -1
            for pi, (psid, _pe) in enumerate(prev):
                tr = 0 if psid == sid else (SH if ends[sid] & ends[psid] else jp)
                c = costs[pi] + tr + e
                if bc is None or c < bc:
                    bc, bp = c, pi
            ncosts.append(bc)
            nback.append(bp)
        costs = ncosts
        backs.append(nback)
    cur = min(range(len(costs)), key=lambda i: (costs[i], levels[-1][1][i][0]))
    idxs = [0] * len(levels)
    idxs[-1] = cur
    for lvl in range(len(levels) - 1, 0, -1):
        cur = backs[lvl - 1][cur]
        idxs[lvl - 1] = cur
    return [(ts, cands[j][0], cands[j][1])
            for (ts, cands), j in zip(levels, idxs)]


def _run(spark, users, segs, radius, cand_k=3, jp=JP):
    pts = [(u, ts, la, lo) for u, pings in users.items()
           for ts, la, lo in pings]
    pdf = spark.createDataFrame(
        pts, "user_id long, ts long, lat double, lon double")
    sdf = spark.createDataFrame(
        [(s, *v) for s, v in segs.items()],
        "seg_id long, alat double, alon double, blat double, blon double")
    got = {}
    rows = spatial.map_match(pdf, sdf, radius, res=8, cand_k=cand_k,
                             switch_jump_e12=jp).collect()
    for r in rows:
        got.setdefault(r["user_id"], []).append(
            (r["ts"], r["seg_id"], r["emis_e12"]))
    return {u: sorted(v) for u, v in got.items()}


def test_map_match_vs_brute(spark):
    rng = random.Random(281)
    # grid of short segments around the origin, some sharing endpoints
    segs = {}
    sid = 0
    for i in range(6):
        x = i * 0.3
        segs[sid] = (0.0, x, 0.0, x + 0.3); sid += 1          # chain on y=0
        segs[sid] = (0.5, x, 0.5, x + 0.3); sid += 1          # chain on y=0.5
    users = {}
    for u in range(4):
        pings = []
        y = rng.choice([0.02, 0.48])
        for t in range(12):
            pings.append((t, y + rng.uniform(-0.05, 0.05),
                          rng.uniform(0, 1.7)))
        users[u] = pings
    got = _run(spark, users, segs, radius=0.3)
    want = {u: sorted(_brute_match(p, segs, 0.3, 3))
            for u, p in users.items()}
    want = {u: v for u, v in want.items() if v}
    assert got == want


def test_map_match_bridges_noise(spark):
    # road A at y=0, road B at y=0.4 (disjoint). Pings hug A except one
    # noisy ping slightly nearer B: Viterbi keeps it on A (two jumps cost
    # more than one worse emission); nearest-segment would flip it.
    segs = {1: (0.0, 0.0, 0.0, 3.0), 2: (0.4, 0.0, 0.4, 3.0)}
    pings = [(t, 0.01, 0.3 * t) for t in range(8)]
    pings[4] = (4, 0.25, 1.2)            # nearer B (0.15) than A (0.25)
    # jump penalty 1e11 outweighs the 4e10 emission gap; nearest-segment
    # (and a low penalty) would flip ping 4 to road B
    got = _run(spark, {7: pings}, segs, radius=0.5, cand_k=2,
               jp=100_000_000_000)
    assert [s for _t, s, _e in got[7]] == [1] * 8
    want = sorted(_brute_match(pings, segs, 0.5, 2, jp=100_000_000_000))
    assert got[7] == want
    # with a negligible penalty the same trace DOES flip — the memoryless
    # behavior the operator exists to avoid
    flip = _run(spark, {7: pings}, segs, radius=0.5, cand_k=2, jp=1)
    assert [s for _t, s, _e in flip[7]][4] == 2


def test_map_match_out_of_range_pings_drop(spark):
    segs = {1: (0.0, 0.0, 0.0, 1.0)}
    pings = [(0, 0.01, 0.2), (1, 5.0, 5.0), (2, 0.02, 0.8)]
    got = _run(spark, {1: pings}, segs, radius=0.2, cand_k=2)
    assert [t for t, _s, _e in got[1]] == [0, 2]
