"""Skew mitigation: salted joins.

AQE's skew-join splitting (on in ``session.py``) handles moderate
skew transparently; salting is the structural fix when one key owns a
double-digit percentage of a fact table (the "null key" / "default
tenant" / "empty document" pathologies of real training corpora).

``salted_join`` spreads each left key over ``n_salts`` synthetic
sub-keys and replicates the right side once per salt: the hot key's
rows land on ``n_salts`` reducers instead of one.  Replication factor
is bounded by ``n_salts × |right|`` — use it for joins whose right
side is small-ish but too big (or too skewed) to broadcast outright.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``key`` with the left side salted over ``n_salts``
    buckets and the right side replicated per salt.

    The salt is derived deterministically from the full left row's
    hash (not ``rand()``), so results are reproducible and retries of
    a failed task produce identical partitioning.  Output columns =
    plain ``left.join(right, key, how)``.

    Only LEFT-preserving shapes are accepted: replication is on the
    right side, so inner/left-outer/left-semi/left-anti results are
    unchanged (every left row carries exactly one salt and sees every
    right row of its key), but right/full-outer would emit each
    UNMATCHED right row once per salt — silently duplicated.  Salt the
    other side (swap the arguments) for right-skewed outer joins.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower().replace(" ", "") not in allowed:
        raise ValueError(
            f"salted_join supports left-preserving joins only ({sorted(allowed)}); "
            f"got how={how!r} — right-side replication would duplicate "
            "unmatched right rows under right/full outer shapes"
        )
    # pmod, not abs(hash) % n: hash == Integer.MIN_VALUE survives abs()
    # (two's complement) and would yield a negative salt matching no
    # replicated right row — a silently dropped join partner.
    salt = (F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(n_salts))).alias("_salt")
    l_salted = left.withColumn("_salt", salt)
    r_salted = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return l_salted.join(r_salted, [key, "_salt"], how).drop("_salt")
