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


def test_every_query_has_oracle_or_reason():
    # Queries without an oracle get only the driver's weaker rows-only
    # check; keep the list explicit so additions are deliberate.
    no_oracle = set(dq.queries()) - set(_ORACLES)
    assert no_oracle == set(), f"queries without oracle SQL: {sorted(no_oracle)}"
