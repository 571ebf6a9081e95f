"""Sharding tests (build/shards.py): single-job shard semantics."""

from __future__ import annotations

import numpy as np
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


def test_rank_shards_distributed_matches_driver(spark, docs):
    """The distributed Taily ranking (broadcast-pruned join +
    per-query applyInPandas) must reproduce the driver-side pandas
    form on the same moments/workload."""
    import numpy as np
    import pandas as pd

    from pisa_spark.build import (
        build_doc_sizes, build_lexicon, build_postings, collection_stats,
    )
    from pisa_spark.build.segments import scored_postings
    from pisa_spark.query.taily import (
        rank_shards_distributed, rank_shards_for_queries,
    )

    lex = build_lexicon(docs)
    sizes = build_doc_sizes(docs)
    postings = build_postings(docs, lex)
    st = collection_stats(sizes).collect()[0]
    scored = scored_postings(
        postings, sizes, lex, int(st["num_docs"]), float(st["avg_len"])
    )
    moments_df = shard_term_stats(
        scored, int(st["num_docs"]), float(st["avg_len"]), n_shards=4
    )
    moments = moments_df.toPandas()
    szs = sizes.toPandas()
    shard_docs = {s: int((szs["doc_id"] % 4 == s).sum()) for s in range(4)}

    lexp = lex.toPandas()
    terms = lexp.sort_values("df", ascending=False).head(6)["term_id"].tolist()
    queries = {
        "qa": [int(terms[0])],
        "qb": [int(terms[1]), int(terms[2])],
        "qc": [int(t) for t in terms[3:6]],
        # every term missing from the moments table (a foreign index
        # generation's ids): BOTH forms must still emit all shards at
        # score 0 — the distributed form used to drop such queries
        "qz": [10_000_001, 10_000_002],
    }
    driver = rank_shards_for_queries(queries, moments, shard_docs, n_c=5)

    rows = [(qid, int(t)) for qid, ts in queries.items() for t in ts]
    parsed = spark.createDataFrame(
        pd.DataFrame(rows, columns=["query_id", "term_id"]),
        schema="query_id string, term_id long",
    )
    dist = rank_shards_distributed(
        parsed, moments_df, shard_docs, n_c=5
    ).toPandas()

    d = driver.sort_values(["query_id", "shard_id"]).reset_index(drop=True)
    x = dist.sort_values(["query_id", "shard_id"]).reset_index(drop=True)
    assert (d["rank"].to_numpy() == x["rank"].to_numpy()).all()
    np.testing.assert_allclose(d["score"], x["score"], rtol=1e-9, atol=1e-12)


def test_gamma_sf_sanity():
    """Incomplete-gamma implementation vs known values: for
    Gamma(k=1, theta) (exponential), P(X>s) = exp(-s/theta)."""
    import math

    from pisa_spark.query.taily import gamma_sf

    # E=theta, Var=theta^2 -> k=1
    for theta in (0.5, 2.0):
        for s in (0.1, 1.0, 5.0):
            want = math.exp(-s / theta)
            got = gamma_sf(theta, theta * theta, s)
            assert abs(got - want) < 1e-9
    # chi-square-like case k=2 (E=2t, Var=2t^2): P(X>s)=(1+s/t)exp(-s/t)
    t = 1.5
    for s in (0.3, 2.0, 7.0):
        want = (1 + s / t) * math.exp(-s / t)
        assert abs(gamma_sf(2 * t, 2 * t * t, s) - want) < 1e-9


def test_taily_ranks_exclusive_shard_first(spark):
    """Controlled scenario: a term that exists ONLY in shard 0's docs
    must rank shard 0 first; a term present everywhere must give all
    shards nonzero scores."""
    import pandas as pd

    from pisa_spark.build import build_doc_sizes, build_lexicon, build_postings, collection_stats
    from pisa_spark.build.forward import tokenize_pages
    from pisa_spark.build.segments import scored_postings
    from pisa_spark.build.shards import shard_term_stats
    from pisa_spark.config import AnalyzerConfig
    from pisa_spark.query.taily import rank_shards_for_queries

    texts = []
    for i in range(80):
        base = f"common{i % 7} filler{i % 13} shared word"
        if i % 4 == 0:  # shard 0 under doc_id % 4 (ids are 0..79)
            base += " exclusivezero exclusivezero"
        texts.append(base)
    pages = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": [f"https://t/{i:04d}" for i in range(80)],
                "warc_ts": pd.Timestamp("2024-01-01"),
                "html": [b"x"] * 80,
                "text": texts,
                "lang": "en",
            }
        ),
        schema="url string, warc_ts timestamp, html binary, text string, lang string",
    )
    docs = tokenize_pages(pages, AnalyzerConfig(tokenizer="whitespace"))
    lex = build_lexicon(docs)
    sizes = build_doc_sizes(docs)
    postings = build_postings(docs, lex)
    st = collection_stats(sizes).collect()[0]
    scored = scored_postings(
        postings, sizes, lex, int(st["num_docs"]), float(st["avg_len"])
    )
    moments = shard_term_stats(
        scored, int(st["num_docs"]), float(st["avg_len"]), n_shards=4
    ).toPandas()
    shard_docs = {s: 20 for s in range(4)}

    lexp = lex.toPandas().set_index("term")["term_id"]
    ranked = rank_shards_for_queries(
        {"q_excl": [int(lexp["exclusivezero"])], "q_all": [int(lexp["shared"])]},
        moments, shard_docs, n_c=5,
    )
    excl = ranked[ranked["query_id"] == "q_excl"]
    assert int(excl[excl["rank"] == 1].iloc[0]["shard_id"]) == 0
    assert (excl[excl["shard_id"] != 0]["score"] == 0).all()
    alls = ranked[ranked["query_id"] == "q_all"]
    assert (alls["score"] > 0).all()


def test_estimate_cutoff_inverts_expected_count():
    """estimate_cutoff is the inverse of the Gamma expected-count
    model: plugging the cutoff back in recovers ~k expected docs."""
    from pisa_spark.query.taily import estimate_cutoff, gamma_sf

    for n_any, e, var, k in [
        (5000.0, 8.0, 4.0, 10),
        (300.0, 2.5, 0.7, 25),
        (1e9, 12.0, 30.0, 1000),
    ]:
        s = estimate_cutoff(n_any, e, var, k)
        assert s > 0
        got = n_any * gamma_sf(e, var, s)
        assert abs(got - k) / k < 1e-3, (got, k)
    # degenerate / no-pruning cases
    assert estimate_cutoff(5.0, 8.0, 4.0, 10) == 0.0   # n_any <= k
    assert estimate_cutoff(0.0, 8.0, 4.0, 10) == 0.0
    assert estimate_cutoff(100.0, 3.0, 0.0, 10) == 3.0  # point mass


def test_taily_thresholds_distributed_matches_local(spark, docs):
    """estimate_taily_thresholds (the taily_thresholds tool) agrees
    with a local per-query estimate_cutoff over the same global
    moments, and larger k never raises the threshold."""
    import numpy as np

    from pisa_spark.build import (
        build_doc_sizes, build_lexicon, build_postings, collection_stats,
    )
    from pisa_spark.build.segments import scored_postings
    from pisa_spark.query.taily import (
        estimate_cutoff, estimate_taily_thresholds,
    )

    lex = build_lexicon(docs)
    sizes = build_doc_sizes(docs)
    postings = build_postings(docs, lex)
    st = collection_stats(sizes).collect()[0]
    n = int(st["num_docs"])
    scored = scored_postings(postings, sizes, lex, n, float(st["avg_len"]))
    moments_df = shard_term_stats(
        scored, n, float(st["avg_len"]), n_shards=1
    ).drop("shard_id")

    lexp = lex.toPandas().sort_values("df", ascending=False)
    terms = lexp.head(4)["term_id"].tolist()
    parsed = spark.createDataFrame(
        [("qa", int(terms[0])), ("qb", int(terms[1])), ("qb", int(terms[2])),
         ("qc", int(terms[0])), ("qc", int(terms[3]))],
        "query_id string, term_id long",
    )
    got = (
        estimate_taily_thresholds(parsed, moments_df, n, k=5)
        .toPandas().set_index("query_id")["threshold"]
    )

    m = moments_df.toPandas().set_index("term_id")
    queries = {"qa": [terms[0]], "qb": [terms[1], terms[2]],
               "qc": [terms[0], terms[3]]}
    for qid, tids in queries.items():
        e = sum((m.loc[t, "sum_micro"] / m.loc[t, "df"]) / 1e6 for t in tids)
        var = sum(
            max(0.0, (m.loc[t, "sum_micro_sq"] / m.loc[t, "df"]) / 1e12
                - ((m.loc[t, "sum_micro"] / m.loc[t, "df"]) / 1e6) ** 2)
            for t in tids
        )
        n_any = n * float(np.prod([m.loc[t, "df"] / n for t in tids]))
        want = estimate_cutoff(n_any, e, var, 5)
        assert abs(got[qid] - want) <= max(1e-9, 1e-6 * abs(want)), qid

    got25 = (
        estimate_taily_thresholds(parsed, moments_df, n, k=25)
        .toPandas().set_index("query_id")["threshold"]
    )
    for qid in queries:
        assert got25[qid] <= got[qid] + 1e-12


def test_taily_moment_sums_survive_int64_overflow(spark):
    """SUM(micro^2) wraps an int64 accumulator at only ~25k postings
    of a strong term (micro ~ 3e7 -> micro^2 ~ 1e15): the moments must
    accumulate exactly (DECIMAL) and emit the one deterministically
    rounded DOUBLE both engines agree on — Spark used to wrap silently
    where DuckDB raises, exactly at the scale the sf fixtures never
    reach."""
    import duckdb

    from pisa_spark.functions.scoring import bm25_score_np, micro_sql

    n_rows, num_docs, avg_len = 50_000, 1e9, 100.0
    scored = (
        spark.range(n_rows)
        .select(
            F.lit(0).cast("long").alias("term_id"),
            F.col("id").alias("doc_id"),
            F.lit(100).cast("int").alias("tf"),
            F.lit(100).cast("int").alias("doc_len"),
            F.lit(10).cast("long").alias("df"),
        )
    )
    got = shard_term_stats(
        scored, int(num_docs), avg_len, n_shards=1
    ).toPandas().iloc[0]

    s = bm25_score_np(
        np.array([100.0]), np.array([10.0]), np.array([100.0]),
        num_docs, avg_len,
    )[0]
    micro = int(np.floor(s * 1e6 + 0.5))
    exact_sq = n_rows * micro * micro
    assert exact_sq > 2**63  # the old BIGINT accumulator wrapped here
    assert got["df"] == n_rows
    assert got["sum_micro"] == float(n_rows * micro)
    assert got["sum_micro_sq"] == float(exact_sq)  # same rounding rule

    # DuckDB runs the identical accumulation text (the gated taily
    # entries' formula) and must land on the same double
    dd = duckdb.sql(
        f"SELECT CAST(SUM(CAST(m * m AS DECIMAL(38,0))) AS DOUBLE) AS x "
        f"FROM (SELECT CAST({micro} AS BIGINT) AS m "
        f"      FROM range({n_rows}))"
    ).fetchone()[0]
    assert dd == got["sum_micro_sq"]
