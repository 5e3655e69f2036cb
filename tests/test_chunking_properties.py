"""Hypothesis property tests for the round-4 chunking/dedup operators:
the invariants that must hold over the whole input space, not just the
fixture — lossless reassembly, full coverage, idempotence."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import Row

from soict20221_bigdata_financialplatform_spark.operators.corpus import (
    cdc_chunk_documents,
    chunk_documents,
)

_SETTINGS = dict(max_examples=15, deadline=None)

# word-salad docs over a tiny alphabet (high repetition — the hard case
# for boundary logic), 1..120 tokens
_doc = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd", "ee", "zz"]),
    min_size=1,
    max_size=120,
).map(" ".join)


@given(st.lists(_doc, min_size=1, max_size=4), st.integers(2, 16))
@settings(**_SETTINGS)
def test_cdc_reassembly_is_lossless(spark, texts, modulus):
    """Concatenating a doc's CDC chunks in chunk_id order reproduces the
    doc exactly, for every modulus."""
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    rows = cdc_chunk_documents(df, modulus=modulus).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, t in enumerate(texts):
        got = sorted(by_doc[i], key=lambda r: r.chunk_id)
        assert " ".join(r.chunk_text for r in got) == t
        assert sum(r.n_tokens for r in got) == len(t.split(" "))


@given(
    st.lists(_doc, min_size=1, max_size=4),
    st.integers(2, 40),
    st.integers(1, 40),
)
@settings(**_SETTINGS)
def test_fixed_chunking_covers_every_position(spark, texts, size, stride):
    """Every token position lands in >= 1 chunk; chunk 0 starts at the
    doc start; consecutive chunk starts differ by exactly `stride`."""
    stride = min(stride, size)  # gaps would void coverage by design
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    rows = chunk_documents(df, size=size, stride=stride).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, t in enumerate(texts):
        toks = t.split(" ")
        got = sorted(by_doc[i], key=lambda r: r.chunk_idx)
        covered = 0  # positions [0, covered) seen so far
        for j, r in enumerate(got):
            start = j * stride
            body = r.chunk_text.split(" ")
            assert body == toks[start : start + size]
            assert r.n_tokens == len(body)
            assert start <= covered  # no gap
            covered = max(covered, start + len(body))
        assert covered == len(toks)
