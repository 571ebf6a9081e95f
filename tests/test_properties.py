"""Property-based tests (hypothesis) — the reference uses rapidcheck
for bit vectors, topk_queue, payload vectors and algorithms
(SURVEY §5.4); these mirror that strategy for our analogues."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from pisa_spark.codecs import CODECS
from pisa_spark.query.kernels import PRUNE_EPS, _TopK, _finalize

u40 = st.integers(min_value=0, max_value=(1 << 40) - 1)


@settings(max_examples=150, deadline=None)
@given(st.lists(u40, min_size=1, max_size=300), st.sampled_from(["varint", "bitpack", "ef"]))
def test_codec_roundtrip_property(vals, codec):
    enc, dec = CODECS[codec]
    arr = np.array(vals, dtype=np.uint64)
    out = dec(enc(arr), len(arr))
    assert np.array_equal(out, arr)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 10_000_000), st.integers(0, 10_000)),
        min_size=0, max_size=200,
    ),
    st.integers(1, 20),
)
def test_topk_heap_matches_sort(entries, k):
    """_TopK retains exactly the (micro desc, doc asc) top-k of the
    positive-score inserts (topk_queue.hpp finalize semantics)."""
    topk = _TopK(k)
    for micro, doc in entries:
        topk.insert(micro, doc)
    docs, scores = topk.finalize(k)
    # oracle: dedupe by insertion (doc can repeat with diff scores —
    # kernels never do that, but finalize keeps all inserted rows)
    arr_d = np.array([d for _, d in entries], dtype=np.int64)
    arr_m = np.array([m for m, _ in entries], dtype=np.int64)
    exp_d, exp_s = _finalize(arr_d, arr_m, k)
    assert np.array_equal(docs, exp_d)
    assert np.array_equal(scores, exp_s)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.tuples(st.integers(1, 5_000_000), st.integers(0, 10_000)),
             min_size=0, max_size=200),
    st.integers(1, 10),
    st.integers(0, 4_000_000),
)
def test_topk_threshold_never_prunes_topk(entries, k, init):
    """With a SOUND init threshold (<= true k-th micro), would_enter
    must stay True for every entry that belongs to the final top-k."""
    micros = sorted((m for m, _ in entries), reverse=True)
    true_kth = micros[k - 1] if len(micros) >= k else 0
    init = min(init, max(0, true_kth - PRUNE_EPS))
    topk = _TopK(k, float(init))
    for micro, doc in entries:
        if micro >= true_kth and len(micros) >= k:
            assert topk.would_enter(micro + PRUNE_EPS + 1)
        topk.insert(micro, doc)
    docs, scores = topk.finalize(k)
    exp_d, exp_s = _finalize(
        np.array([d for _, d in entries], dtype=np.int64),
        np.array([m for m, _ in entries], dtype=np.int64), k,
    )
    assert np.array_equal(docs, exp_d)


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=200))
def test_native_regex_tokens_never_crash(text):
    """EnglishTokenizer pandas kernel is total on arbitrary unicode."""
    import pandas as pd

    from pisa_spark.analysis import analyze_series

    out = analyze_series(pd.Series([text]), tokenizer="english").iloc[0]
    for t in out:
        assert t and "." not in t and "'" not in t
        assert t == t.lower()


u12 = st.integers(min_value=0, max_value=(1 << 12) - 1)


@settings(max_examples=100, deadline=None)
@given(st.lists(u12, min_size=1, max_size=300),
       st.sampled_from(["simple16", "rankedbv", "g8iu", "hybrid", "qmx"]))
def test_capped_codec_roundtrip_property(vals, codec):
    """The width/universe-capped codecs (and the hybrid dispatcher)
    under their in-range domain: 12-bit values keep simple16 under
    its 28-bit lanes, g8iu under u32, and a 300-value sum far under
    rankedbv's universe guard."""
    enc, dec = CODECS[codec]
    arr = np.array(vals, dtype=np.uint64)
    out = dec(enc(arr), len(arr))
    assert np.array_equal(out, arr)
