"""Registration-time oracle type lint (r6 verdict ask #2).

The driver's value hash is type-sensitive, but ``oracle_check.compare``
used to normalize through pandas before r7, so a DuckDB HUGEINT column
(what ``SUM(BIGINT)`` / ``SUM(CASE …)`` / windowed ``SUM`` return unless
cast) passed the 628-test local gate while hash-failing the driver —
exactly what happened to ``tpch_q12`` / ``decayed_type_scores`` /
``pack_sequences`` in round 6.  This lint plans EVERY registered oracle
against DuckDB and fails on any type Spark cannot emit, so the class
cannot recur: a new oracle with an un-cast SUM fails here before it ever
reaches the driver.
"""

from __future__ import annotations

import pytest

from tests.oracle_check import assert_oracle_types_hashable
from vector_db_handler_spark import driver_queries as dq

_ORACLES = dq.oracle_sql()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_emits_hashable_types(name, duck):
    assert_oracle_types_hashable(duck, _ORACLES[name], name=name)


def test_lint_catches_uncast_sum(duck):
    """Sanity: the lint actually fires on the r6 failure shape."""
    with pytest.raises(AssertionError, match="HUGEINT"):
        assert_oracle_types_hashable(
            duck, "SELECT SUM(CAST(1 AS BIGINT)) AS s", name="uncast_sum"
        )
