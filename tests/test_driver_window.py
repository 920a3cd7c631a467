"""Window-arithmetic guard for the driver-evidence rotation.

The correctness driver hash-checks only the FIRST ``DRIVER_WINDOW``
entries of ``queries()``.  Round 8 shipped a rotation that never took
effect because a comment mis-counted the window (the refresh names sat
at rank 51+ and the driver re-hashed the byte-identical round-7 set).
These tests make that failure mode impossible to ship again:

* the intended window is an explicit constant (``_R15_WINDOW``) of
  EXACTLY ``DRIVER_WINDOW`` names — no prose arithmetic;
* ``queries()`` / ``oracle_sql()`` must begin with it verbatim;
* every fronted name must be registered, exactly once;
* the new window must not overlap the previous round's checked set
  (re-buying evidence we already have is the round-8 failure);
* after this window lands, no registered query's latest driver
  evidence may be older than round 4 (the r8 verdict's done-bar).
"""

from __future__ import annotations

import json
import os

from vector_db_handler_spark import driver_queries as dq

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: The previous round's correctness artifact: the set the driver checked
#: last round.  Bump alongside _R15_WINDOW when planning the next window.
_PREV_CORRECTNESS = os.path.join(_REPO, "CORRECTNESS_r14.json")

#: Latest round with driver evidence for each query, derived from every
#: CORRECTNESS_r*.json in the repo root.
def _latest_evidence() -> dict[str, int]:
    latest: dict[str, int] = {}
    for fn in sorted(os.listdir(_REPO)):
        if fn.startswith("CORRECTNESS_r") and fn.endswith(".json"):
            rnd = int(fn[len("CORRECTNESS_r") : -len(".json")])
            with open(os.path.join(_REPO, fn)) as f:
                for name in json.load(f):
                    latest[name] = max(latest.get(name, 0), rnd)
    return latest


def test_window_is_exactly_driver_window_names():
    assert len(dq._R15_WINDOW) == dq.DRIVER_WINDOW, (
        f"_R15_WINDOW has {len(dq._R15_WINDOW)} names, the driver checks "
        f"exactly {dq.DRIVER_WINDOW} — a mis-count here silently wastes "
        "the round's evidence window"
    )
    assert len(set(dq._R15_WINDOW)) == len(dq._R15_WINDOW), "duplicate names"


def test_every_fronted_name_is_registered():
    registered = set(dq._QUERIES)
    missing = [n for n in dq._DRIVER_FRONT if n not in registered]
    assert not missing, f"fronted but not registered (typo?): {missing}"
    assert len(set(dq._DRIVER_FRONT)) == len(dq._DRIVER_FRONT), (
        "duplicate in _DRIVER_FRONT — a name listed in both the window "
        "and _BELOW_WINDOW silently shifts every rank below it"
    )


def test_queries_begin_with_the_intended_window():
    got = list(dq.queries())[: dq.DRIVER_WINDOW]
    assert got == dq._R15_WINDOW, (
        "queries() does not start with the intended window — the "
        "rotation sort is not applying _R15_WINDOW verbatim"
    )


def test_oracles_rotated_consistently():
    # Oracle iteration order must match queries() for the names that
    # have oracles (the driver zips them by key, but keep order sane).
    q_order = [n for n in dq.queries() if n in dq._ORACLES]
    assert q_order == list(dq.oracle_sql())


def test_window_does_not_overlap_previous_round():
    with open(_PREV_CORRECTNESS) as f:
        prev = set(json.load(f))
    overlap = sorted(set(dq._R15_WINDOW) & prev)
    assert not overlap, (
        f"window re-checks {len(overlap)} queries the driver already "
        f"hashed last round: {overlap[:10]} — rotate stale evidence in "
        "instead (round-8 failure mode)"
    )


def test_no_query_older_than_the_rotation_cycle_after_this_window():
    """Staleness floor COMPUTED from the registry size, not a pinned
    round number (r10 verdict #4a): a ``len(registry) / DRIVER_WINDOW``
    rotation cannot keep evidence fresher than one full cycle, so the
    accepted floor for the round about to run (latest recorded round
    + 1) is ``current_round - ceil(len(registry) / DRIVER_WINDOW)``.
    With 217 queries and a 50-row window that is currently r6; the
    formula self-adjusts as the registry grows or gets pruned —
    the r12 planner needs no hand-editing of a staleness constant."""
    import math

    latest = _latest_evidence()
    current_round = max(latest.values()) + 1
    cycle = math.ceil(len(dq._QUERIES) / dq.DRIVER_WINDOW)
    floor = current_round - cycle
    window = set(dq._R15_WINDOW)
    stale = sorted(
        n
        for n in dq._QUERIES
        if latest.get(n, 0) < floor and n not in window
    )
    assert not stale, (
        f"queries with pre-r{floor} evidence not in this round's window "
        f"(cycle={cycle} rounds over {len(dq._QUERIES)} queries): {stale}"
    )


def test_new_registrations_front_in_their_own_round():
    # Process rule (SURVEY §8.0): every query registered this round is
    # inside the window, so it gets first-round driver evidence.
    latest = _latest_evidence()
    never_checked = [n for n in dq._QUERIES if n not in latest]
    missing = [n for n in never_checked if n not in dq._R15_WINDOW]
    assert not missing, (
        f"registered but not fronted (violates the same-commit rule): "
        f"{missing}"
    )


def test_tpch_rotation_round_is_current():
    """The TPC-H fold (SURVEY §8.0 cap policy) cycles a 4-query digest
    subset per round.  The subset is derived from
    ``_TPCH_ROTATION_ROUND``, which the rotation commit must bump
    alongside the window constant — otherwise the driver re-hashes the
    same subset and the 6-round cycle stalls."""
    latest = _latest_evidence()
    current_round = max(latest.values()) + 1
    assert dq._TPCH_ROTATION_ROUND == current_round, (
        f"_TPCH_ROTATION_ROUND={dq._TPCH_ROTATION_ROUND} but the round "
        f"about to run is r{current_round} — bump it in the rotation commit"
    )
    # Every retired TPC-H row is in exactly one rotation group, and the
    # digest spec covers all of them.  (_RETIRED_QUERIES may also hold
    # non-TPC-H retirements under the cap policy's parameter-variant
    # rule — r14 retired knn_graph_beam_search_batch — so the TPC-H
    # set is a subset, not an equality.)
    flat = [q for g in dq._TPCH_FOLD_GROUPS for q in g]
    assert set(flat) <= set(dq._RETIRED_QUERIES)
    assert len(set(flat)) == len(flat)
    assert sorted(dq._TPCH_DIGEST_SPEC) == sorted(flat)


def test_next_window_planner_is_well_formed():
    """tools/plan_next_window.py is how the next round's window gets
    built — it must emit exactly DRIVER_WINDOW registered, distinct
    names, never-checked queries first (process rule), then the
    staged _BELOW_WINDOW rows."""
    import sys

    sys.path.insert(0, os.path.join(_REPO, "tools"))
    from plan_next_window import plan

    names = plan(dq.DRIVER_WINDOW)
    assert len(names) == dq.DRIVER_WINDOW
    assert len(set(names)) == len(names)
    assert all(n in dq._QUERIES for n in names)
    latest = _latest_evidence()
    never = [n for n in dq._QUERIES if n not in latest]
    assert names[: len(never)] == never  # never-checked lead the window
