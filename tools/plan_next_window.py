"""Compute the NEXT round's driver window mechanically — no prose
arithmetic (the r8 failure mode this repo is still paying down).

Usage:  python tools/plan_next_window.py [window_size]

Reads every ``CORRECTNESS_r*.json`` plus the current registry and
prints, in priority order, the ``window_size`` (default 50) names the
next ``_R{N}_WINDOW`` constant should hold:

1. queries never driver-checked (process rule: new registrations front
   in their own round);
2. queries listed in ``_BELOW_WINDOW`` (staged by the previous round);
3. everything else, stalest evidence first (ties in registration
   order).

The output is a ready-to-paste Python list.  After pasting, update
``_PREV_CORRECTNESS`` in tests/test_driver_window.py to the newest
correctness artifact and rerun the window guard tests — they enforce
length, registration, verbatim prefix, and zero overlap with the
previous round's checked set.
"""

from __future__ import annotations

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def latest_evidence() -> dict[str, int]:
    latest: dict[str, int] = {}
    for fn in sorted(os.listdir(_REPO)):
        if fn.startswith("CORRECTNESS_r") and fn.endswith(".json"):
            rnd = int(fn[len("CORRECTNESS_r") : -len(".json")])
            with open(os.path.join(_REPO, fn)) as f:
                for name in json.load(f):
                    latest[name] = max(latest.get(name, 0), rnd)
    return latest


def plan(window_size: int = 50) -> list[str]:
    from vector_db_handler_spark import driver_queries as dq

    latest = latest_evidence()
    reg_order = {n: i for i, n in enumerate(dq._QUERIES)}
    staged = getattr(dq, "_BELOW_WINDOW", [])
    staged_rank = {n: i for i, n in enumerate(staged)}

    def key(name: str) -> tuple:
        never = name not in latest
        return (
            0 if never else (1 if name in staged_rank else 2),
            staged_rank.get(name, 0),
            latest.get(name, 0),
            reg_order[name],
        )

    return sorted(dq._QUERIES, key=key)[:window_size]


def main() -> None:
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    latest = latest_evidence()
    names = plan(size)
    print(f"# next window ({size} names; latest-evidence round in comments)")
    print("_NEXT_WINDOW: list[str] = [")
    for n in names:
        tag = latest.get(n)
        print(f'    "{n}",  # {"NEVER CHECKED" if tag is None else f"r{tag}"}')
    print("]")


if __name__ == "__main__":
    main()
