"""Static guard: no ``.cache()`` without a paired release.

A ``DataFrame.cache()`` entry lives in the session CacheManager until
an explicit ``unpersist()`` — it is NOT ContextCleaner-collected when
the DataFrame goes out of scope (unlike ``localCheckpoint`` blocks).
In a long driver session (110 registered queries, bench reps) leaked
caches accumulate executor storage memory, so the repo rule is: every
function that calls ``.cache()`` either calls ``unpersist()`` before
returning (materializing downstream results via an eager
``localCheckpoint`` first), or appears in the documented allowlist
below with the reason the lazy cache is intentional.

This pins VERDICT r5 finding #1 (``winnow_containment_pairs`` leaked
its fingerprint cache) so the class of bug cannot silently return.
"""

from __future__ import annotations

import ast
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "vector_db_handler_spark"

#: (module, function) -> why a cache may outlive the function.
ALLOWED_LAZY = {
    # Probe-side caches are micro-batch-sized (a query batch, not the
    # corpus) and the probe plan must stay lazy so the pushed key
    # IN (...) scan filter remains visible to callers/tests.
    ("operators/dedup.py", "lsh_probe_table"),
    # SPARK-21610: the _corrupt_record column of a file scan cannot be
    # referenced alone, so the readers cache to pin one consistent
    # valid/corrupt split; the registered driver queries materialize
    # and unpersist these caches themselves (driver_queries.py
    # jsonl/csv roundtrip entries).
    ("sources/jsonl.py", "read_documents_jsonl"),
    ("sources/csv.py", "read_documents_csv"),
}


def _cache_callers(path: Path):
    """Yield (func_name, has_release) for every function in ``path``
    whose body calls ``.cache()``."""
    tree = ast.parse(path.read_text())
    for node in ast.walk(tree):
        if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        calls = {
            sub.func.attr
            for sub in ast.walk(node)
            if isinstance(sub, ast.Call) and isinstance(sub.func, ast.Attribute)
        }
        if "cache" in calls:
            yield node.name, "unpersist" in calls


def test_every_cache_has_a_release_or_is_allowlisted():
    leaks = []
    for path in sorted(PKG.rglob("*.py")):
        rel = str(path.relative_to(PKG))
        for func, released in _cache_callers(path):
            if released or (rel, func) in ALLOWED_LAZY:
                continue
            leaks.append(f"{rel}::{func}")
    assert not leaks, (
        "cache() without unpersist() outside the documented allowlist "
        f"(add a release or an ALLOWED_LAZY entry with a reason): {leaks}"
    )


def test_allowlist_entries_still_exist():
    """A stale allowlist row would silently waive the rule for a new
    same-named function; require each entry to match a real cache
    site."""
    live = set()
    for path in sorted(PKG.rglob("*.py")):
        rel = str(path.relative_to(PKG))
        for func, released in _cache_callers(path):
            if not released:
                live.add((rel, func))
    assert ALLOWED_LAZY <= live, f"stale allowlist rows: {ALLOWED_LAZY - live}"
