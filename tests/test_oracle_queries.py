"""Registry-driven oracle parity: every ``driver_queries`` entry with an
oracle runs against DuckDB at sf0.001 — the same comparison the driver
applies at sf0.01, so a regression shows up locally first.  New
operators get covered automatically the moment they are registered."""

from __future__ import annotations

import pytest

from tests.oracle_check import compare
from vector_db_handler_spark import driver_queries as dq

_ORACLES = dq.oracle_sql()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    compare(dq.queries()[name](spark, sf_dir), duck, _ORACLES[name])


#: Rows retired from the DRIVER registry under the §8.0 cap policy
#: (the 22 TPC-H refreshes, folded into ``tpch_rotating``).  The
#: policy's premise is that retirement loses no LOCAL coverage — this
#: replay keeps every retired twin running on every suite run.
@pytest.mark.parametrize("name", sorted(dq._RETIRED_ORACLES))
def test_retired_query_matches_oracle(name, spark, duck, sf_dir):
    compare(
        dq._RETIRED_QUERIES[name](spark, sf_dir),
        duck,
        dq._RETIRED_ORACLES[name],
    )


#: Queries that intentionally ship WITHOUT an oracle (driver records a
#: weaker rows-only check).  Each needs a reason.
ROWS_ONLY = {
    # md5-seeded PCG64 embedder is not SQL-expressible; shape/score
    # semantics are pytest-asserted in test_golden_scenario.py.
    "pipeline_ingest_search",
    # audio_neardup_pairs graduated to hash-checked in r15: the WHT
    # butterfly has no relational form, but the transform does — the
    # parity kernel Σ_j (−1)^popcount(j&k)·x_j, O(frame²) per frame,
    # fine for an oracle (_AUDIO_NEARDUP_SQL).
}


def test_every_query_has_oracle_or_reason():
    no_oracle = set(dq.queries()) - set(_ORACLES)
    assert no_oracle == ROWS_ONLY, f"unexplained oracle-free queries: {sorted(no_oracle - ROWS_ONLY)}"


def test_rows_only_queries_run(spark, sf_dir):
    for name in sorted(ROWS_ONLY):
        assert dq.queries()[name](spark, sf_dir).count() > 0
