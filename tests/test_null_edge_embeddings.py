"""Null / ragged embedding tolerance for the vector family — the
similarity-side twin of ``test_null_edge_docs.py``.

A crawl-scale corpus will carry rows whose embedder call failed (null
array) and, after schema drift, rows with the wrong dimensionality.
Contracts pinned here:

* ``quantize_int8`` DROPS null-embedding rows declaratively, so every
  downstream consumer (SRP, PQ, IVF, k-means) sees only real vectors;
* ragged dimensions raise a ``ValueError`` naming offending ids
  instead of an untraceable numpy shape error;
* the raw-float scorers emit NULL (never NaN!) for null embeddings —
  Spark orders NaN above every real double, so a NaN would hijack a
  descending top-k, while nulls sort last and drop under filters.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from vector_db_handler_spark.functions import vector as vec
from vector_db_handler_spark.operators.quantize import quantize_int8

_SCHEMA = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(FloatType()), True),
        StructField("label", StringType(), True),
    ]
)


@pytest.fixture(scope="module")
def emb(spark):
    rows = [
        (0, None, "failed"),               # embedder failure
        (1, [0.5] * 64, "a"),
        (2, [1.0] * 64, "b"),
        (3, [-0.25] * 64, "c"),
    ]
    return spark.createDataFrame(rows, _SCHEMA)


def test_quantize_drops_null_embeddings(emb):
    out = quantize_int8(emb).collect()
    assert sorted(r.vec_id for r in out) == [1, 2, 3]
    assert all(len(r.qvec) == 64 for r in out)


def test_quantize_raises_on_ragged_dims(spark):
    rows = [(1, [0.5] * 64, "a"), (2, [1.0] * 32, "short")]
    df = spark.createDataFrame(rows, _SCHEMA).coalesce(1)
    with pytest.raises(Exception, match="ragged embedding dimensions"):
        quantize_int8(df).collect()


def test_cosine_score_nulls_not_nan(emb):
    q = [1.0] * 64
    scored = emb.select("vec_id", vec.cosine_score(F.col("embedding"), q).alias("s"))
    rows = {r.vec_id: r.s for r in scored.collect()}
    assert rows[0] is None  # null, NOT NaN
    assert rows[1] == pytest.approx(1.0)
    assert rows[3] == pytest.approx(-1.0)
    # a descending top-1 must NOT be hijacked by the degenerate row
    top = scored.orderBy(F.col("s").desc()).limit(1).collect()[0]
    assert top.vec_id in (1, 2)


def test_pairwise_dot_null_propagation(emb):
    a = emb.select(F.col("vec_id").alias("i"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("j"), F.col("embedding").alias("eb"))
    pairs = a.crossJoin(b).select(
        "i", "j", vec.pairwise_dot(F.col("ea"), F.col("eb")).alias("d")
    )
    got = {(r.i, r.j): r.d for r in pairs.collect()}
    assert got[(0, 1)] is None and got[(1, 0)] is None
    assert got[(1, 2)] == pytest.approx(0.5 * 1.0 * 64)
