"""Compare two BENCH_DETAIL.json artifacts: wall-time and
shuffle-byte deltas per query, regressions first.

Usage:  python tools/bench_diff.py OLD.json NEW.json [min_ratio]

Wall time on this box is noisy (sentinel-documented 4x swings), but
shuffle bytes are PLAN TRUTH: a broadcast join silently degrading to
sort-merge multiplies exchange volume deterministically, long before
it dominates wall clock at bench scale.  This prints any query whose
shuffle volume grew by more than ``min_ratio`` (default 1.5x) or that
appeared/disappeared, then the biggest wall movements for context.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(1)
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    min_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5

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
    print(
        f"TOTAL: {old.get('value')}s/{len(wo)}q -> "
        f"{new.get('value')}s/{len(wn)}q"
    )


if __name__ == "__main__":
    main()
