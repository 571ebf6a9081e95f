"""Sharding tests (build/shards.py): single-job shard semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pisa_spark.build.shards import assign_shards, shard_stats, shard_term_stats

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    from pisa_spark.build.forward import tokenize_pages
    from pisa_spark.config import AnalyzerConfig
    from pisa_spark.corpus import pages_from_documents

    pages = pages_from_documents(spark, SF).limit(100)
    return tokenize_pages(pages, AnalyzerConfig(tokenizer="whitespace")).persist()


def test_shard_assignment_partitions_corpus(docs):
    sharded = assign_shards(docs, 4).toPandas()
    assert set(sharded["shard_id"]) == {0, 1, 2, 3}
    assert (sharded["shard_id"] == sharded["doc_id"] % 4).all()


def test_shard_stats_sum_to_global(spark, docs):
    stats = shard_stats(docs, 4).toPandas()
    assert stats["num_docs"].sum() == docs.count()
    total_len = docs.agg(F.sum("doc_len")).collect()[0][0]
    assert stats["collection_len"].sum() == total_len
    # vocab sizes: per-shard <= global, union covers global
    global_vocab = docs.select(F.explode("terms")).distinct().count()
    assert (stats["vocab_size"] <= global_vocab).all()


def test_shard_taily_moments_consistent(spark, docs):
    """Per-shard Taily moments must sum to the global Taily moments
    (the reference computes them per shard file; ours is one job)."""
    from pisa_spark.build import build_doc_sizes, build_lexicon, build_postings, collection_stats
    from pisa_spark.build.segments import scored_postings

    lex = build_lexicon(docs)
    sizes = build_doc_sizes(docs)
    postings = build_postings(docs, lex)
    st = collection_stats(sizes).collect()[0]
    scored = scored_postings(
        postings, sizes, lex, int(st["num_docs"]), float(st["avg_len"])
    )
    per_shard = shard_term_stats(
        scored, int(st["num_docs"]), float(st["avg_len"]), n_shards=4
    ).toPandas()
    glob = (
        per_shard.groupby("term_id")[["df", "sum_micro", "sum_micro_sq"]]
        .sum()
        .reset_index()
    )
    # df per term across shards == global df from the lexicon
    lexdf = lex.toPandas().set_index("term_id")["df"]
    for _, row in glob.iterrows():
        assert row["df"] == lexdf[row["term_id"]]
        assert row["sum_micro"] > 0
