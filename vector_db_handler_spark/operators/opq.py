"""OPQ — Optimized Product Quantization (Ge et al., CVPR 2013):
learn an orthogonal rotation R so that PQ's independent per-subspace
codebooks fit the data better (PQ assumes subspaces are independent
and equally important; a rotation redistributes variance to make that
true).  Completes the faiss quantization lineage here: SQ8
(``quantize.py``) → PQ (``pq.py``) → OPQ (this) → binary
(``driver_queries.binary_hamming_topk``).

Training/serving split (how real systems run this): the rotation and
codebooks are TRAINED ON A SAMPLE driver-side — alternating
(a) per-subspace Lloyd on the rotated sample and (b) the orthogonal
Procrustes update R ← V·Uᵀ from SVD(ŶᵀX) — because a 64×64 rotation
and an M×K×(D/M) codebook are KB-sized model state, while the
distributed work is ENCODING the full corpus: one Arrow-batched
kernel computing X·Rᵀ → per-subspace argmin → M codes per row, with
R and the codebooks broadcast by value.  Sample-trained / full-corpus
applied is exactly faiss's ``OPQMatrix`` flow.

Monotonicity (the pytest contract): iterate 0 is plain PQ (R = I);
each alternation step — optimal R for fixed codes, then Lloyd refit —
does not increase reconstruction error, so OPQ distortion ≤ PQ
distortion on the training sample by construction, and the pytest
verifies it holds corpus-wide too.

Float caveat: the rotation is an SVD product, so unlike the int8
PQ/SQ8 pipelines this stage is NOT cross-engine hash-exact — it ships
pytest-verified (orthogonality, determinism under a fixed seed,
distortion improvement) rather than oracle-checked, and is therefore
not in the driver registry.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _lloyd(y: np.ndarray, k: int, iters: int, cents: np.ndarray | None) -> np.ndarray:
    """Plain float Lloyd seeded with the first k rows (or warm-started
    from ``cents``); deterministic — no RNG anywhere."""
    if cents is None:
        cents = y[:k].copy()
    for _ in range(iters):
        d2 = ((y[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        for c in range(len(cents)):
            m = a == c
            if m.any():
                cents[c] = y[m].mean(axis=0)
    return cents


def _reconstruct(y: np.ndarray, books: list[np.ndarray]) -> np.ndarray:
    m = len(books)
    d_sub = y.shape[1] // m
    out = np.empty_like(y)
    for s in range(m):
        sub = y[:, s * d_sub : (s + 1) * d_sub]
        d2 = ((sub[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
        out[:, s * d_sub : (s + 1) * d_sub] = books[s][d2.argmin(axis=1)]
    return out


def train_opq(
    emb: DataFrame,
    m: int = 4,
    k: int = 8,
    opq_iters: int = 8,
    lloyd_iters: int = 4,
    sample_n: int = 1024,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[list[list[float]], list[list[list[float]]]]:
    """Learn (rotation R, codebooks) on the deterministic sample
    ``id < sample_n`` (KB-sized model state — the broadcast-small side
    by construction).  Returns plain nested lists so the result ships
    into encode kernels by value."""
    rows = (
        emb.filter(F.col(id_col) < sample_n)
        .orderBy(id_col)
        .select(embedding_col)
        .collect()
    )
    x = np.array([np.asarray(r[0], dtype=np.float64) for r in rows])
    if x.size == 0:
        raise ValueError("empty training sample")
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d_sub = dim // m
    r = np.eye(dim)
    books: list[np.ndarray] = [None] * m  # type: ignore[list-item]
    for _ in range(opq_iters):
        y = x @ r.T
        for s in range(m):
            sub = y[:, s * d_sub : (s + 1) * d_sub]
            books[s] = _lloyd(sub, k, lloyd_iters, books[s])
        y_hat = _reconstruct(y, books)
        # Orthogonal Procrustes: argmin_R ||X·Rᵀ − Ŷ||_F over
        # orthogonal R  ⇒  R = V·Uᵀ from SVD(Xᵀ·Ŷ) = U·S·Vᵀ.
        u, _, vt = np.linalg.svd(x.T @ y_hat)
        r = (u @ vt).T
    return (
        [[float(v) for v in row] for row in r],
        [[[float(v) for v in cw] for cw in b] for b in books],
    )


def opq_encode(
    emb: DataFrame,
    rotation: list[list[float]],
    codebooks: list[list[list[float]]],
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Encode the FULL corpus: (id, codes ARRAY<INT>) — one
    zero-shuffle Arrow pass; R (dim², ~32 KB) and the codebook tensor
    ride the closure."""
    r_flat = [float(v) for row in rotation for v in row]
    dim = len(rotation)
    m = len(codebooks)
    d_sub = dim // m
    books_flat = [
        [float(v) for cw in b for v in cw] for b in codebooks
    ]
    k = len(codebooks[0])
    id_type = emb.schema[id_col].dataType.simpleString()

    def kernel(batches):
        import numpy as np

        rr = np.asarray(r_flat).reshape(dim, dim)
        bb = [np.asarray(bf).reshape(k, d_sub) for bf in books_flat]
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.array([np.asarray(v, dtype=np.float64) for v in pdf[emb_col]])
            y = x @ rr.T
            codes = np.empty((len(x), m), dtype=np.int32)
            for s in range(m):
                sub = y[:, s * d_sub : (s + 1) * d_sub]
                d2 = ((sub[:, None, :] - bb[s][None, :, :]) ** 2).sum(axis=2)
                codes[:, s] = d2.argmin(axis=1)
            out = pdf[[id_col]].copy()
            out["codes"] = list(codes)
            yield out

    emb_col = embedding_col
    return emb.select(id_col, embedding_col).mapInPandas(
        kernel, schema=f"{id_col} {id_type}, codes array<int>"
    )


def reconstruction_mse(
    emb: DataFrame,
    rotation: list[list[float]],
    codebooks: list[list[list[float]]],
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
) -> float:
    """Corpus-wide mean squared reconstruction error in the ROTATED
    space (‖X·Rᵀ − reconstruct(codes)‖² is rotation-invariant back in
    the original space since R is orthogonal).  One Arrow pass + a
    1-row aggregate — the distortion measurement OPQ optimizes."""
    r_flat = [float(v) for row in rotation for v in row]
    dim = len(rotation)
    m = len(codebooks)
    d_sub = dim // m
    books_flat = [[float(v) for cw in b for v in cw] for b in codebooks]
    k = len(codebooks[0])

    def kernel(batches):
        import numpy as np
        import pandas as pd

        rr = np.asarray(r_flat).reshape(dim, dim)
        bb = [np.asarray(bf).reshape(k, d_sub) for bf in books_flat]
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.array([np.asarray(v, dtype=np.float64) for v in pdf[embedding_col]])
            y = x @ rr.T
            err = np.zeros(len(x))
            for s in range(m):
                sub = y[:, s * d_sub : (s + 1) * d_sub]
                d2 = ((sub[:, None, :] - bb[s][None, :, :]) ** 2).sum(axis=2)
                err += d2.min(axis=1)
            yield pd.DataFrame({"err": err})

    errs = emb.select(id_col, embedding_col).mapInPandas(kernel, schema="err double")
    row = errs.agg(F.sum("err").alias("s"), F.count("*").alias("n")).collect()[0]
    return float(row["s"]) / int(row["n"]) if row["n"] else 0.0
