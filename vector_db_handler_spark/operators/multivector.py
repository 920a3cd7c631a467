"""Multi-vector late-interaction retrieval: ColBERT-style MaxSim.

No reference analog (single-vector cosine only, H13); extension
surface — late interaction (Khattab & Zaharia, ColBERT) scores a doc
as Σ_q max_d <q_token, d_token>: each query token picks its best
matching doc token, so phrase- and aspect-level matches survive where
a single pooled vector averages them away.  It is the standard
quality tier between single-vector ANN and full cross-encoders.

Fixture adaptation, stated honestly: the corpus stores ONE pooled
vector per doc, so token vectors are stood in by equal slices of the
64-dim embedding (4 × 16).  The OPERATOR's layout is the real one —
any (id, token vectors) relation works by changing ``n_tokens``/the
slicing — and the fixture slices exercise the full scoring path.

Exactness + plan shape (the point): everything happens on the int8
grid (corpus max-|x| scale, same as the quantized KNN tier), so every
token dot product is an exact integer and the whole MaxSim value
hash-checks cross-engine.  The 16 token-pair dots are generated as
literal multiply-add chains over the quantized array — plain codegen
projection, NO higher-order functions, NO join, NO explode: MaxSim
top-k plans as scan → project → TakeOrderedAndProject, exactly like
single-vector KNN, with per-row cost n_tokens² · d_token = d · n_tokens.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_db_handler_spark.operators.quantize import (
    max_abs_scale,
    quantize_int8,
    quantize_vector,
)


def _token_dot_sql(t: int, d_tok: int, qtok: list[int], vec_col: str) -> str:
    """Literal multiply-add chain: <doc token t, quantized query token>."""
    return " + ".join(
        f"element_at({vec_col}, {t * d_tok + i + 1}) * ({qtok[i]})"
        for i in range(d_tok)
    )


def maxsim_topk(
    emb: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    n_tokens: int = 4,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k docs by MaxSim against ``query_vec`` (sliced into
    ``n_tokens`` query tokens).  Returns ``(vec_id, maxsim)`` with the
    exact integer score; ties break to the smaller id."""
    dim = len(query_vec)
    if dim % n_tokens:
        raise ValueError(f"dim {dim} not divisible by n_tokens={n_tokens}")
    d_tok = dim // n_tokens

    s_row = max_abs_scale(emb, embedding_col).collect()
    s = float(s_row[0]["s"] or 0.0) if s_row else 0.0
    if not s > 0.0:
        s = 1.0
    qq = quantize_vector(query_vec, s)
    qtoks = [qq[j * d_tok : (j + 1) * d_tok] for j in range(n_tokens)]

    q = quantize_int8(emb, embedding_col=embedding_col, id_col=id_col)
    per_query_token = [
        "GREATEST("
        + ", ".join(
            _token_dot_sql(t, d_tok, qtoks[j], "qvec") for t in range(n_tokens)
        )
        + ")"
        for j in range(n_tokens)
    ]
    score = " + ".join(per_query_token)
    return (
        q.select(
            F.col(id_col),
            F.expr(f"CAST({score} AS BIGINT)").alias("maxsim"),
        )
        .orderBy(F.col("maxsim").desc(), F.col(id_col).asc())
        .limit(int(k))
    )
