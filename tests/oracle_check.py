"""Local replica of the driver's Spark-vs-DuckDB comparison: row count +
column-name set + order-insensitive value comparison.  Stricter than a
hash — on mismatch it shows the differing rows."""

from __future__ import annotations

import math

import pandas as pd


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    out = out[sorted(out.columns)]
    for c in out.columns:
        if out[c].dtype == object:
            out[c] = out[c].astype(str)
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)


#: DuckDB types the driver's type-sensitive value hash can never match:
#: Spark has no 128-bit integer, so a HUGEINT column hash-fails even when
#: every value is int64-representable (r6 lesson: SUM(BIGINT), SUM(CASE…)
#: and windowed SUM all return HUGEINT unless the oracle casts).
BANNED_DUCK_TYPES = ("HUGEINT", "UHUGEINT")


def assert_oracle_types_hashable(duck_con, sql: str, name: str = "<oracle>") -> None:
    """Fail if the oracle SQL produces a DuckDB type Spark cannot emit."""
    rel = duck_con.sql(sql)
    for col, typ in zip(rel.columns, rel.types):
        ts = str(typ).upper()
        assert not any(b in ts for b in BANNED_DUCK_TYPES), (
            f"{name}: oracle column {col!r} has DuckDB type {ts} — the driver "
            f"value-hash is type-sensitive and Spark has no 128-bit integer; "
            f"wrap the expression in CAST(... AS BIGINT/DOUBLE)"
        )


def compare(spark_df, duck_con, sql: str, float_exact: bool = True) -> None:
    """Assert the Spark DataFrame and the DuckDB SQL result match.

    ``float_exact=True`` demands bit-identical floats (what a value-hash
    comparison effectively requires).
    """
    assert_oracle_types_hashable(duck_con, sql)
    got = _normalize(spark_df.toPandas())
    want = _normalize(duck_con.sql(sql).df())

    assert sorted(got.columns) == sorted(want.columns), (
        f"column mismatch: spark={sorted(got.columns)} oracle={sorted(want.columns)}"
    )
    assert len(got) == len(want), f"row count mismatch: spark={len(got)} oracle={len(want)}"

    for col in got.columns:
        g, w = got[col], want[col]
        gk, wk = g.dtype.kind, w.dtype.kind
        # The driver hash is type-sensitive: int-vs-float (or int-vs-object,
        # the pandas shadows of a DuckDB type divergence) fails it even when
        # the values coincide numerically — so equal-after-coercion is NOT
        # good enough locally.  Enforce numeric-family agreement before any
        # value coercion below can paper over it.
        if gk in "iufc" or wk in "iufc":
            fam = lambda k: "int" if k in "iu" else ("float" if k in "fc" else k)
            assert fam(gk) == fam(wk), (
                f"col {col}: dtype family mismatch spark={g.dtype} oracle={w.dtype} "
                f"— a type-sensitive driver hash will fail even if values agree; "
                f"align the oracle (CAST) or the Spark schema"
            )
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            for i, (a, b) in enumerate(zip(g.astype(float), w.astype(float))):
                if math.isnan(a) and math.isnan(b):
                    continue
                if float_exact:
                    assert a == b, f"col {col} row {i}: spark={a!r} oracle={b!r} (diff={a - b!r})"
                else:
                    assert math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12), (
                        f"col {col} row {i}: spark={a!r} oracle={b!r}"
                    )
        else:
            mism = (g != w) & ~(g.isna() & w.isna())
            assert not mism.any(), (
                f"col {col} mismatches at rows {list(mism[mism].index[:5])}: "
                f"spark={g[mism].head().tolist()} oracle={w[mism].head().tolist()}"
            )
