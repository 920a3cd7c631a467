"""Chunk geometry: full coverage, overlap reconstruction, edge cases."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from vector_db_handler_spark.operators.chunking import chunk_documents


def _chunks(spark, texts, size, overlap):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = chunk_documents(df, size=size, overlap=overlap).collect()
    out: dict[int, list[str]] = {}
    for r in sorted(rows, key=lambda r: (r.doc_id, r.chunk_idx)):
        out.setdefault(r.doc_id, []).append(r.chunk_text)
    # chunk_idx must be dense 0..n-1 per doc
    for r in rows:
        assert 0 <= r.chunk_idx < len(out[r.doc_id])
    return out


def _reference(text, size, overlap):
    """Arbitrary-precision Python replay of the pinned geometry."""
    stride = size - overlap
    if not text:
        return []
    n = len(text)
    nc = 1 if n <= size else -((n - size) // -stride) + 1
    return [text[i * stride : i * stride + size] for i in range(nc)]


def test_known_geometry(spark):
    """len 10 / size 4 / overlap 1 (stride 3): chunks at 0,3,6 cover
    [0:4],[3:7],[6:10] — ceil((10-4)/3)+1 = 3 chunks, full coverage."""
    got = _chunks(spark, ["abcdefghij"], size=4, overlap=1)
    assert got[0] == ["abcd", "defg", "ghij"]


def test_short_and_exact_docs_single_chunk(spark):
    got = _chunks(spark, ["ab", "abcd", ""], size=4, overlap=1)
    assert got[0] == ["ab"]
    assert got[1] == ["abcd"]
    assert 2 not in got  # empty text: no chunks


def test_null_text_produces_no_chunks(spark):
    df = spark.createDataFrame([(0, None), (1, "hello")], "doc_id long, text string")
    rows = chunk_documents(df, size=4, overlap=0).collect()
    assert {r.doc_id for r in rows} == {1}


def test_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, size=4, overlap=4)
    with pytest.raises(ValueError):
        chunk_documents(df, size=4, overlap=-1)


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(min_value=0, max_value=600),
    size=st.integers(min_value=2, max_value=64),
    data=st.data(),
)
def test_matches_reference_and_reconstructs(spark, n, size, data):
    """Property: chunks equal the Python replay; every chunk is
    non-empty; stripping the overlap from chunks 1.. reassembles the
    exact original text."""
    overlap = data.draw(st.integers(min_value=0, max_value=size - 1))
    text = "".join(chr(97 + (i * 7) % 26) for i in range(n))
    got = _chunks(spark, [text], size=size, overlap=overlap).get(0, [])
    ref = _reference(text, size, overlap)
    assert got == ref
    assert all(c for c in got)
    if got:
        rebuilt = got[0] + "".join(c[overlap:] for c in got[1:])
        assert rebuilt == text
