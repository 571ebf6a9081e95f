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


# ------------------------------------------------- kernel agreement
# The reference pins every pruning algorithm against ranked_or on
# randomized inputs (test/test_ranked_queries.cpp); this mirrors that
# directly at the kernel layer: random tiny corpora, random block
# boundaries (1-5 postings/block, so block-max pruning and interval
# alignment are stressed far harder than the fixed 128 default), a
# random sound bootstrap threshold — every kernel must match the
# exhaustive kernel's (score desc, doc asc) top-k exactly.

def _mk_term_postings(doc_ids, tfs, lens, weight, stats, rnd):
    from pisa_spark.codecs import CODECS
    from pisa_spark.functions.scoring import MICRO
    from pisa_spark.query import kernels as K

    enc, dec = CODECS["varint"]
    tp = K.TermPostings(
        term_id=0, df=float(len(doc_ids)), weight=weight,
        max_score=0.0,
        block_max_doc=None, block_max_score=None, block_count=None,
        doc_payloads=[], tf_payloads=[], len_payloads=[], decode=dec,
    )
    # exact per-posting micro scores (same path the kernels use)
    micros = K._score(tp, np.asarray(tfs), np.asarray(lens), stats)
    bmd, bms, bc = [], [], []
    i = 0
    while i < len(doc_ids):
        n = min(int(rnd.integers(1, 6)), len(doc_ids) - i)
        d = np.asarray(doc_ids[i:i + n], dtype=np.int64)
        gaps = np.diff(d) - 1
        tp.doc_payloads.append(enc(np.concatenate(([d[0]], gaps))))
        tp.tf_payloads.append(enc(np.asarray(tfs[i:i + n]) - 1))
        tp.len_payloads.append(enc(np.asarray(lens[i:i + n]) - 1))
        bmd.append(d[-1])
        bms.append(float(micros[i:i + n].max()))
        bc.append(n)
        i += n
    tp.block_max_doc = np.asarray(bmd, dtype=np.uint64)
    tp.block_max_score = np.asarray(bms, dtype=np.float64)
    tp.block_count = np.asarray(bc, dtype=np.int64)
    tp.max_score = float(micros.max())
    return tp


@settings(max_examples=250, deadline=None)
@given(
    st.integers(min_value=0, max_value=2**32 - 1),  # corpus seed
    st.integers(min_value=1, max_value=4),          # terms
    st.integers(min_value=1, max_value=12),         # k
    st.floats(min_value=0.0, max_value=1.0),        # bootstrap frac
    st.booleans(),                                  # quantized index
)
def test_all_kernels_match_exhaustive(seed, n_terms, k, boot_frac, quantized):
    from pisa_spark.query import kernels as K

    rnd = np.random.default_rng(seed)
    n_docs = int(rnd.integers(5, 41))
    lens_by_doc = rnd.integers(1, 21, size=n_docs)
    stats = K.Stats(num_docs=float(n_docs),
                    avg_len=float(lens_by_doc.mean()),
                    quantized=quantized)
    terms = []
    for _ in range(n_terms):
        sz = int(rnd.integers(1, n_docs + 1))
        d = np.sort(rnd.choice(n_docs, size=sz, replace=False)).astype(np.int64)
        tfs = rnd.integers(1, 9, size=sz).astype(np.int64)
        w = float(rnd.choice([1.0, 2.0]))
        terms.append(_mk_term_postings(
            d, tfs, lens_by_doc[d], w, stats, rnd))

    exp_docs, exp_scores = K.ranked_or_kernel(terms, k, stats)
    # a sound bootstrap never changes the result: anything strictly
    # below (kth micro - PRUNE_EPS) keeps ties enterable
    kth = int(round(exp_scores[-1] * 1e6)) if len(exp_docs) >= k else 0
    boot = boot_frac * max(0, kth - K.PRUNE_EPS)

    from pisa_spark.query.executor import RANKED_KERNELS

    for name in ("wand", "block_max_wand", "block_max_maxscore",
                 "maxscore", "adaptive"):
        got_d, got_s = RANKED_KERNELS[name](
            terms, k, stats, init_threshold=boot)
        np.testing.assert_array_equal(got_d, exp_docs, err_msg=name)
        np.testing.assert_allclose(got_s, exp_scores, rtol=0, atol=0,
                                   err_msg=name)
    for fn in (K.wand_kernel_daat, K.block_max_wand_kernel_daat):
        got_d, got_s = fn(terms, k, stats, init_threshold=boot)
        np.testing.assert_array_equal(got_d, exp_docs, err_msg=fn.__name__)
        np.testing.assert_allclose(got_s, exp_scores, rtol=0, atol=0)

    # conjunctive: brute-force AND of the decoded lists
    sets = [set(t.decode_all()[0].tolist()) for t in terms]
    both = np.asarray(sorted(set.intersection(*sets)), dtype=np.int64)
    and_docs = K.and_kernel(terms)
    np.testing.assert_array_equal(and_docs, both)
    ra_d, ra_s = K.ranked_and_kernel(terms, k, stats)
    bra_d, bra_s = K.block_max_ranked_and_kernel(terms, k, stats)
    np.testing.assert_array_equal(bra_d, ra_d)
    np.testing.assert_allclose(bra_s, ra_s, rtol=0, atol=0)

    # shared decoded-block cache (batch-major) must not change results
    for t in terms:
        t.block_cache = {}
    got_d, got_s = RANKED_KERNELS["block_max_maxscore"](terms, k, stats)
    np.testing.assert_array_equal(got_d, exp_docs)
    got_d2, _ = RANKED_KERNELS["block_max_maxscore"](terms, k, stats)
    np.testing.assert_array_equal(got_d2, exp_docs)  # warm-cache rerun


@given(
    st.lists(
        st.lists(
            st.integers(min_value=0, max_value=2**32 - 1),
            max_size=50,
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=50, deadline=None)
def test_binary_collection_roundtrip_property(seqs):
    """write_binary_collection o _parse_sequences == identity for any
    sequence list (incl. empty sequences — a zero-count header is a
    legal binary_collection record)."""
    import tempfile

    from pisa_spark.build.bincoll import (
        _parse_sequences,
        write_binary_collection,
    )

    with tempfile.NamedTemporaryFile(suffix=".docs") as f:
        write_binary_collection(seqs, f.name)
        blob = open(f.name, "rb").read()
    back = [list(map(int, s)) for s in _parse_sequences(blob)]
    assert back == [list(map(int, s)) for s in seqs]


@settings(max_examples=80, deadline=None)
@given(
    st.lists(  # per term: (term, [(docid gap>=0 applied cumulatively, tf)])
        st.tuples(
            st.text(
                alphabet=st.characters(codec="utf-8",
                                       exclude_categories=("Cs",)),
                min_size=1, max_size=12,
            ),
            st.lists(
                st.tuples(st.integers(0, 1 << 20), st.integers(1, 1 << 18)),
                min_size=1, max_size=40,
            ),
        ),
        min_size=0, max_size=12,
    ),
    st.lists(
        st.tuples(st.text(min_size=0, max_size=16), st.integers(0, 1 << 20)),
        min_size=0, max_size=20,
    ),
)
def test_ciff_wire_roundtrip_property(term_lists, doc_recs):
    """CIFF wire walker round-trip (local, no Spark): arbitrary terms
    (any UTF-8), multi-byte varint docids/tfs, empty files — the
    reader must return exactly what the writer was given, including
    gap re-decoding."""
    import tempfile

    from pisa_spark.build.ciff import (
        _delimited, _header_from_msg, _parse_postings_list,
        parse_ciff_header, write_ciff,
    )

    # build absolute-docid postings from gaps (strictly increasing)
    postings = []
    for term, pairs in term_lists:
        docid = -1
        plist = []
        for gap, tf in pairs:
            docid += gap + 1
            plist.append((docid, tf))
        postings.append((term, plist))
    docs = [(i, ext, dl) for i, (ext, dl) in enumerate(doc_recs)]

    with tempfile.NamedTemporaryFile(suffix=".ciff") as f:
        write_ciff(f.name, postings, docs)
        blob = memoryview(open(f.name, "rb").read())

    hdr = parse_ciff_header(bytes(blob))
    assert hdr["num_postings_lists"] == len(postings)
    assert hdr["num_docs"] == len(docs)

    msgs = _delimited(blob)
    assert _header_from_msg(next(msgs)) == hdr
    for term, plist in postings:
        got_term, df, cf, docids, tfs = _parse_postings_list(next(msgs))
        assert got_term == term
        assert df == len(plist)
        assert cf == sum(tf for _, tf in plist)
        assert list(docids) == [d for d, _ in plist]
        assert list(tfs) == [tf for _, tf in plist]


def test_intersection_slicings_are_valid_partitions():
    """Pin the hand-transcribed INTERSECTION_SLICINGS against the
    reference's getAllPossibleSlicing
    (tools/kth_threshold_intersection.cpp:114-204): byte-wise equal to
    the C++ initializer lists when the reference tree is present;
    structurally always — every slicing is a valid set partition of
    0..n-1, n=2..4 enumerate ALL set partitions (Bell 2, 5, 15), and
    the n=5 list has 37 entries, 34 distinct: the reference's 2+2+1
    block repeats 3 partitions and misses 8, and the 3+1+1 family (10)
    is absent entirely — duplicates/omissions are value-irrelevant or
    the fork's own semantics, so they are transcribed verbatim."""
    from collections import Counter

    from pisa_spark.query.thresholds import (
        INTERSECTION_SLICINGS, slicing_position_rows,
    )

    def all_partitions(items):
        if not items:
            yield []
            return
        first, rest = items[0], items[1:]
        for part in all_partitions(rest):
            yield [[first]] + part
            for i in range(len(part)):
                yield part[:i] + [[first] + part[i]] + part[i + 1:]

    bell = {2: 2, 3: 5, 4: 15}
    for n, slicings in INTERSECTION_SLICINGS.items():
        keys = []
        for slicing in slicings:
            flat = sorted(p for comb in slicing for p in comb)
            assert flat == list(range(n)), (n, slicing)
            keys.append(frozenset(frozenset(c) for c in slicing))
        if n <= 4:
            assert len(set(keys)) == len(keys) == bell[n]
        else:
            assert len(keys) == 37 and len(set(keys)) == 34
            full = {
                frozenset(frozenset(c) for c in p)
                for p in all_partitions(list(range(5)))
            }
            shapes = Counter(
                tuple(sorted(len(c) for c in part))
                for part in full - set(keys)
            )
            assert shapes == {(1, 1, 3): 10, (1, 2, 2): 8}

    # byte-wise parity with the C++ initializer lists (skipped when
    # the read-only reference tree is absent)
    import os
    import re

    ref = "/root/reference/tools/kth_threshold_intersection.cpp"
    if os.path.exists(ref):
        src = open(ref).read()
        body = src[src.index("getAllPossibleSlicing"):
                   src.index("for (vector<vector<int>> comb : retVal)")]
        blocks = re.split(r"numOfTerm == (\d)", body)
        parsed = {}
        for i in range(1, len(blocks), 2):
            pushes = re.findall(
                r"retVal\.push_back\(\{(.*?)\}\);", blocks[i + 1], re.S
            )
            parsed[int(blocks[i])] = [
                [
                    [int(x) for x in c.replace(" ", "").split(",") if x]
                    for c in re.findall(r"\{([\d,\s]*)\}", p)
                ]
                for p in pushes
            ]
        assert parsed == INTERSECTION_SLICINGS

    # the flattened SQL inline table is a faithful projection
    rows = slicing_position_rows()
    assert len(rows) == sum(
        n * len(s) for n, s in INTERSECTION_SLICINGS.items()
    )
    rebuilt: dict = {}
    for n, sid, cid, pos in rows:
        rebuilt.setdefault(n, {}).setdefault(sid, {}).setdefault(
            cid, []
        ).append(pos)
    for n, slicings in INTERSECTION_SLICINGS.items():
        assert [
            [rebuilt[n][sid][cid] for cid in sorted(rebuilt[n][sid])]
            for sid in sorted(rebuilt[n])
        ] == slicings


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1),
                min_size=1, max_size=64))
def test_bit_widths_exact_everywhere(vals):
    """codecs.widths.bit_widths == int.bit_length for the FULL uint64
    range — the float-log2 fast path's ±1 rounding near powers of two
    must be repaired exactly (the old per-codec copies crashed on
    2^60-1 under simple8b and on >= 2^63 under optpfor/qmx)."""
    import numpy as np

    from pisa_spark.codecs.widths import bit_widths

    v = np.array(vals, dtype=np.uint64)
    got = bit_widths(v)
    for x, w in zip(vals, got):
        assert w == int(x).bit_length(), (x, int(w))


def test_codec_boundary_values_roundtrip():
    """The exact width boundary inputs that used to crash encode:
    simple8b near its 60-bit cap, optpfor/qmx across the 2^63 line."""
    import numpy as np

    from pisa_spark.codecs.optpfor import optpfor_decode, optpfor_encode
    from pisa_spark.codecs.qmx import qmx_decode, qmx_encode
    from pisa_spark.codecs.simple8b import s8b_decode, s8b_encode

    s8 = np.array([(1 << 60) - 1, (1 << 60) - 128, (1 << 59), 0, 7],
                  dtype=np.uint64)
    assert (s8b_decode(s8b_encode(s8), len(s8)) == s8).all()
    big = np.array([1 << 63, (1 << 64) - 1, (1 << 63) - 1, 0, 42],
                   dtype=np.uint64)
    assert (optpfor_decode(optpfor_encode(big), len(big)) == big).all()
    assert (qmx_decode(qmx_encode(big), len(big)) == big).all()
    allhi = np.full(8, 1 << 63, dtype=np.uint64)
    assert (optpfor_decode(optpfor_encode(allhi), len(allhi)) == allhi).all()
