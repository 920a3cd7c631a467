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


def compare(spark_df, duck_con, sql: str, float_exact: bool = True) -> None:
    """Assert the Spark DataFrame and the DuckDB SQL result match.

    ``float_exact=True`` demands bit-identical floats (what a value-hash
    comparison effectively requires).
    """
    got = _normalize(spark_df.toPandas())
    want = _normalize(duck_con.sql(sql).df())

    assert sorted(got.columns) == sorted(want.columns), (
        f"column mismatch: spark={sorted(got.columns)} oracle={sorted(want.columns)}"
    )
    assert len(got) == len(want), f"row count mismatch: spark={len(got)} oracle={len(want)}"

    for col in got.columns:
        g, w = got[col], want[col]
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
