"""Compare two bench-detail artifacts: wall-time and shuffle-byte
deltas per query, regressions first, with per-rep sentinel attribution.

Usage:
    python tools/bench_diff.py OLD.json NEW.json [min_ratio]
    python tools/bench_diff.py r08 r09 [min_ratio]     # round shorthand

Round arguments (``r08`` / ``8``) resolve to ``BENCH_DETAIL_r{N}.json``
in the repo root — ``bench.py`` archives one per round precisely so a
wall-time wobble is adjudicable later (r8 lesson: pagerank +42% with
zero code change and no archived reps to attribute it).

Wall time on this box is noisy (sentinel-documented 4x swings), but
shuffle bytes are PLAN TRUTH: a broadcast join silently degrading to
sort-merge multiplies exchange volume deterministically, long before
it dominates wall clock at bench scale.  This prints any query whose
shuffle volume grew by more than ``min_ratio`` (default 1.5x) or that
appeared/disappeared, then the biggest wall movements WITH each run's
per-rep walls and contention sentinels, so "slow query + slow sentinel
= contended box" vs "slow query + flat sentinel = plan regression" is
readable from one command.
"""

from __future__ import annotations

import json
import os
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _resolve(arg: str) -> str:
    m = re.fullmatch(r"r?(\d+)", arg)
    if m:
        path = os.path.join(_REPO, f"BENCH_DETAIL_r{int(m.group(1)):02d}.json")
        if not os.path.exists(path):
            sys.exit(f"no archived detail for round {arg}: {path}")
        return path
    return arg


def _reps_line(detail: dict, q: str) -> str:
    pr = detail.get("per_rep", {}).get(q, {})
    reps = pr.get("reps", [])
    sent = pr.get("sentinel", [])
    shuf = pr.get("shuffle_bytes", [])
    bits = [f"reps={[round(r, 2) for r in reps]}"]
    if sent:
        bits.append(f"sentinel={[round(s, 2) for s in sent]}")
    if shuf:
        bits.append(f"shuffleMB={[round(b / 1e6, 1) for b in shuf]}")
    return " ".join(bits)


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(1)
    old_path, new_path = _resolve(sys.argv[1]), _resolve(sys.argv[2])
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    min_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5

    if old.get("sf") != new.get("sf"):
        print(
            f"WARNING: sf mismatch ({old.get('sf')} vs {new.get('sf')}) — "
            "timings are not comparable"
        )

    so = old.get("shuffle_bytes", {})
    sn = new.get("shuffle_bytes", {})
    regressions = []
    for q, b_new in sorted(sn.items()):
        b_old = so.get(q)
        if b_old is None:
            continue
        if b_old == 0 and b_new > 1_000_000:
            regressions.append((q, b_old, b_new, float("inf")))
        elif b_old > 0 and b_new / b_old >= min_ratio and b_new - b_old > 1_000_000:
            regressions.append((q, b_old, b_new, b_new / b_old))
    if regressions:
        print(f"SHUFFLE REGRESSIONS (>= {min_ratio}x and >1 MB growth):")
        for q, a, b, r in sorted(regressions, key=lambda x: -x[3]):
            print(f"  {q}: {a/1e6:.2f} MB -> {b/1e6:.2f} MB ({r:.1f}x)")
    else:
        print(f"no shuffle regressions >= {min_ratio}x (with >1 MB growth)")

    added = sorted(set(new.get("queries", {})) - set(old.get("queries", {})))
    gone = sorted(set(old.get("queries", {})) - set(new.get("queries", {})))
    if added:
        print(f"new queries ({len(added)}): {', '.join(added)}")
    if gone:
        print(f"removed queries ({len(gone)}): {', '.join(gone)}")

    wo, wn = old.get("queries", {}), new.get("queries", {})
    moves = [
        (q, wo[q], wn[q]) for q in wn if q in wo and max(wo[q], wn[q]) > 1.0
    ]
    moves.sort(key=lambda x: -(x[2] - x[1]))
    print("largest wall movements (old -> new, sec):")
    for q, a, b in moves[:10]:
        print(f"  {q}: {a:.2f} -> {b:.2f} ({b - a:+.2f})")
        print(f"    old {_reps_line(old, q)}")
        print(f"    new {_reps_line(new, q)}")
        s_old = so.get(q)
        s_new = sn.get(q)
        if s_old is not None and s_new is not None:
            same = abs(s_new - s_old) <= max(1_000_000, 0.05 * max(s_old, 1))
            if not same:
                # Shuffle-WRITE bytes are lz4-compressed, and a stage
                # coalescing N upstream tasks into one writer sees its
                # input in scheduling order — so byte counts for
                # identical data wobble ±20% rep-to-rep (adjudicated
                # r14: srp_multiprobe's 12.8 vs 15.8 MB was one
                # single-task stage at 11.9–14.3 MB across reps with
                # hash-identical output).  If the two runs' per-rep
                # RANGES overlap (with 5% slack), the plan is flat.
                ro = old.get("per_rep", {}).get(q, {}).get("shuffle_bytes", [])
                rn = new.get("per_rep", {}).get(q, {}).get("shuffle_bytes", [])
                if ro and rn:
                    slack = 0.05 * max(max(ro), max(rn))
                    same = (
                        min(ro) - slack <= max(rn)
                        and min(rn) - slack <= max(ro)
                    )
            verdict = "plan unchanged (shuffle flat)" if same else "SHUFFLE MOVED"
            print(f"    {verdict}: {s_old/1e6:.2f} MB -> {s_new/1e6:.2f} MB")
    print(
        f"TOTAL: {old.get('value')}s/{len(wo)}q -> "
        f"{new.get('value')}s/{len(wn)}q"
    )


if __name__ == "__main__":
    main()
