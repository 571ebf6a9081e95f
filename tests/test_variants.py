"""Quantized-impact index + reordering tests (SURVEY §2.5/§2.8)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pisa_spark.config import AnalyzerConfig, EngineConfig, IndexConfig

SF = "/root/testdata/sf0.001"

QCFG = EngineConfig(
    analyzer=AnalyzerConfig(tokenizer="whitespace"),
    index=IndexConfig(salt_bucket_docs=256, quantize_bits=8),
)


@pytest.fixture(scope="module")
def qindex(spark):
    from pisa_spark.corpus import pages_from_documents
    from pisa_spark.index import build_index

    pages = pages_from_documents(spark, SF).limit(200)
    return build_index(spark, pages, QCFG)


def test_quantized_impacts_bounded(qindex):
    """Decoded 'tf' slots of a quantized index are impacts in
    [1, 2^bits] (linear_quantizer.hpp: ceil(score*scale) <= 2^bits
    because score <= max)."""
    from pisa_spark.build import decode_segments

    dec = decode_segments(qindex.segments, qindex.config.index).toPandas()
    assert dec["tf"].between(1, 256).all()
    # term_meta max_score bounds every stored impact of that term
    meta = qindex.term_meta.toPandas().set_index("term_id")["max_score"]
    gmax = dec.groupby("term_id")["tf"].max()
    for tid, mx in gmax.items():
        assert mx <= meta[tid] + 1e-9


def test_varblock_same_topk_fewer_block_decodes(spark):
    """Variable (score-optimal) blocks must return the IDENTICAL
    top-k as fixed blocks while BMW performs fewer block decodes on a
    pruning-heavy workload (rare+head term pairs: the rare term's
    top-10 raises the threshold above head-term block maxes), and the
    partition carries less block-max metadata for the same lists —
    the VSBMW profiler evidence (score_opt_partition.hpp)."""
    import pyspark.sql.functions as F

    from pisa_spark.corpus import synth_pages
    from pisa_spark.index import build_index
    from pisa_spark.query.executor import topk_search
    from pisa_spark.query.parser import parse_queries

    # Long Zipf-head posting lists in ONE salt bucket — the regime
    # variable blocks exist for (uniform blocks are loose on skew).
    pages = synth_pages(spark, 1500, vocab_size=300, max_len=150)
    fixed_cfg = EngineConfig(index=IndexConfig())
    var_cfg = EngineConfig(
        index=IndexConfig(block_partition="variable", block_lambda=4.0)
    )
    fixed = build_index(spark, pages, fixed_cfg)
    var = build_index(spark, pages, var_cfg)
    lex = fixed.lexicon.orderBy(F.col("df").desc()).toPandas()
    heads = lex.head(8)["term"].tolist()
    rares = lex[(lex["df"] >= 10) & (lex["df"] <= 30)]["term"].tolist()[:8]
    rows = [
        (f"q{i}", [rares[i % len(rares)], heads[i % len(heads)]], 10)
        for i in range(16)
    ]
    qdf = spark.createDataFrame(
        pd.DataFrame(rows, columns=["query_id", "terms", "k"])
    )

    def run(idx):
        parsed = parse_queries(qdf, idx.lexicon, pre_tokenized=True)
        df = topk_search(
            idx, parsed, algorithm="block_max_wand", k=10, profile=True
        ).toPandas()
        res = df.sort_values(["query_id", "rank"])[
            ["query_id", "rank", "doc_id", "score"]
        ].reset_index(drop=True)
        blocks = df.groupby("query_id")["blocks_decoded"].first().sum()
        return res, blocks

    res_f, blk_f = run(fixed)
    res_v, blk_v = run(var)
    pd.testing.assert_frame_equal(res_f, res_v)
    # Tighter score-adaptive bounds let BMW skip more blocks outright
    # (observed ~5x on this workload), even though the partition has
    # MORE (smaller) blocks where scores vary.
    assert blk_v < blk_f, (blk_v, blk_f)


def test_compressed_blockmax_same_topk(spark):
    """wand_data_compressed parity: u8 block maxes (relative to the
    term max, rounded up) must keep BMW rank-identical to the f32
    bounds while the segments carry max_score_q instead of
    max_score."""
    from pisa_spark.corpus import synth_pages, synth_queries
    from pisa_spark.index import build_index
    from pisa_spark.query.executor import topk_search
    from pisa_spark.query.parser import parse_queries

    pages = synth_pages(spark, 400, vocab_size=800, max_len=120)
    plain = build_index(
        spark, pages, EngineConfig(index=IndexConfig(salt_bucket_docs=128))
    )
    comp = build_index(
        spark, pages,
        EngineConfig(
            index=IndexConfig(salt_bucket_docs=128, compress_blockmax=True)
        ),
    )
    assert "max_score_q" in comp.segments.columns
    assert "max_score" not in comp.segments.columns
    qdf = spark.createDataFrame(synth_queries(20, vocab_size=800))

    def run(idx):
        parsed = parse_queries(qdf, idx.lexicon, pre_tokenized=True)
        return (
            topk_search(idx, parsed, algorithm="block_max_wand", k=10)
            .toPandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)[["query_id", "rank", "doc_id", "score"]]
        )

    pd.testing.assert_frame_equal(run(plain), run(comp))


def test_quantized_topk_close_to_exact(spark, qindex):
    """Quantized ranking approximates the exact BM25 ranking: the
    top-1 doc of each query agrees for most queries (the reference's
    quantization regression expectation)."""
    from pisa_spark.corpus import pages_from_documents
    from pisa_spark.index import build_index
    from pisa_spark.query.executor import topk_search
    from pisa_spark.query.parser import parse_queries

    exact_cfg = EngineConfig(
        analyzer=AnalyzerConfig(tokenizer="whitespace"),
        index=IndexConfig(salt_bucket_docs=256),
    )
    pages = pages_from_documents(spark, SF).limit(200)
    eindex = build_index(spark, pages, exact_cfg)

    terms = [r["term"] for r in qindex.lexicon.limit(40).collect()]
    rows = [(f"q{i}", [terms[(3 * i) % len(terms)], terms[(3 * i + 1) % len(terms)]], 10)
            for i in range(10)]
    qdf = spark.createDataFrame(
        pd.DataFrame(rows, columns=["query_id", "terms", "k"]),
        schema="query_id string, terms array<string>, k int",
    )
    qres = topk_search(
        qindex, parse_queries(qdf, qindex.lexicon, pre_tokenized=True),
        algorithm="block_max_wand", k=10,
    ).toPandas()
    eres = topk_search(
        eindex, parse_queries(qdf, eindex.lexicon, pre_tokenized=True),
        algorithm="block_max_wand", k=10,
    ).toPandas()
    # Guaranteed property (not head agreement — the tiny synthetic
    # corpus clusters scores into few quantization levels, so exact
    # heads legitimately reshuffle): the exact BM25 score of the
    # quantized winner is within the quantization error bound of the
    # exact winner: per-term error < index_max/2^bits, n_terms=2.
    from pyspark.sql import functions as F

    index_max = float(
        eindex.term_meta.agg(F.max("max_score")).collect()[0][0]
    )
    bound = 2 * index_max / 256 + 1e-6
    exact_scores = {}
    for r in eres.itertuples():
        exact_scores[(r.query_id, r.doc_id)] = r.score
    e_head = eres[eres["rank"] == 1].set_index("query_id")["score"]
    for r in qres[qres["rank"] == 1].itertuples():
        s = exact_scores.get((r.query_id, r.doc_id))
        if s is None:
            # quantized head fell outside the exact top-10: its exact
            # score is below the exact 10th => within bound of head
            s = eres[eres["query_id"] == r.query_id]["score"].min()
        assert e_head[r.query_id] - s <= bound


def test_reorder_random_permutation_and_loggap(spark):
    from pisa_spark.build import build_doc_sizes, build_lexicon, build_postings, tokenize_pages
    from pisa_spark.build.reorder import log_gap_cost, random_mapping, reorder_postings
    from pisa_spark.corpus import pages_from_documents

    pages = pages_from_documents(spark, SF).limit(150)
    docs = tokenize_pages(pages, AnalyzerConfig(tokenizer="whitespace")).persist()
    mapping = random_mapping(docs.select("doc_id")).toPandas()
    # bijection onto 0..n-1
    assert sorted(mapping["new_doc_id"]) == list(range(len(mapping)))

    lex = build_lexicon(docs)
    postings = build_postings(docs, lex).persist()
    mdf = spark.createDataFrame(mapping)
    rp = reorder_postings(postings, mdf)
    assert rp.count() == postings.count()

    c0 = log_gap_cost(postings).collect()[0]
    c1 = log_gap_cost(rp).collect()[0]
    assert c0["n_gaps"] == c1["n_gaps"]
    assert c0["cost_micro"] > 0 and c1["cost_micro"] > 0
