"""Recursive graph bisection tests (build/bp.py).

Mirrors the reference's BP acceptance criterion: the reordering must
lower the log-gap objective (evaluate_collection_ordering) — here on
a corpus whose original docID order interleaves topic clusters, the
worst case BP exists to fix.
"""

from __future__ import annotations

import pandas as pd
import pytest

N = 320
CLUSTERS = 8


def _cluster(i: int) -> int:
    # md5-based assignment: clusters interleave over docIDs WITHOUT
    # being exactly balanced between any median split. (A perfectly
    # balanced round-robin assignment makes every BP move gain exactly
    # zero — a measure-zero pathology real corpora never hit.)
    import hashlib

    return hashlib.md5(str(i).encode()).digest()[0] % CLUSTERS


@pytest.fixture(scope="module")
def clustered_docs(spark):
    from pisa_spark.build.forward import tokenize_pages
    from pisa_spark.config import AnalyzerConfig

    texts = []
    for i in range(N):
        c = _cluster(i)
        n_words = 12 + (i * 13) % 9
        toks = [f"c{c}w{j}" for j in range(n_words)] + ["shared0", "shared1"]
        texts.append(" ".join(toks))
    pages = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": [f"https://t/{i:05d}" for i in range(N)],
                "warc_ts": pd.Timestamp("2024-01-01"),
                "html": [b"x"] * N,
                "text": texts,
                "lang": "en",
            }
        ),
        schema="url string, warc_ts timestamp, html binary, text string,"
               " lang string",
    )
    return tokenize_pages(
        pages, AnalyzerConfig(tokenizer="whitespace")
    ).persist()


def test_bp_mapping_is_permutation(spark, clustered_docs):
    from pisa_spark.build.bp import recursive_graph_bisection

    mp = recursive_graph_bisection(
        clustered_docs, depth=3, iterations=3
    ).toPandas()
    assert sorted(mp["new_doc_id"]) == list(range(N))
    assert sorted(mp["doc_id"]) == list(range(N))


def test_bp_reduces_log_gap_cost(spark, clustered_docs):
    """BP must clearly beat the interleaved original ordering on the
    log-gap objective (the quantity tools/evaluate_collection_ordering
    scores and BP minimizes)."""
    from pisa_spark.build import build_lexicon, build_postings
    from pisa_spark.build.bp import recursive_graph_bisection
    from pisa_spark.build.reorder import log_gap_cost, reorder_postings

    lex = build_lexicon(clustered_docs)
    postings = build_postings(clustered_docs, lex).persist()
    base = log_gap_cost(postings).collect()[0]

    mapping = recursive_graph_bisection(clustered_docs, depth=4, iterations=4)
    remapped = reorder_postings(postings, mapping)
    bp = log_gap_cost(remapped).collect()[0]

    assert bp["n_gaps"] == base["n_gaps"]
    # interleaved clusters give gaps ~CLUSTERS; BP groups them so most
    # gaps collapse to 1 — demand at least a 3x objective cut
    # (measured ~8x on this fixture)
    assert bp["cost_micro"] < base["cost_micro"] / 3, (
        bp["cost_micro"], base["cost_micro"],
    )


def test_bp_groups_clusters(spark, clustered_docs):
    """After one bisection, each topic cluster lands almost entirely
    on one side (the KDD'16 behavior the gains exist to produce)."""
    from pisa_spark.build.bp import recursive_graph_bisection

    mp = recursive_graph_bisection(
        clustered_docs, depth=1, iterations=8
    ).toPandas()
    mp["cluster"] = mp["doc_id"].map(_cluster)
    mp["half"] = (mp["new_doc_id"] >= N // 2).astype(int)
    tab = mp.groupby(["cluster", "half"]).size().unstack(fill_value=0)
    mixing = tab.min(axis=1).sum() / N
    assert mixing < 0.05, mixing


def _balanced_nodes(n: int, depth: int, iters: int) -> list[dict]:
    nodes = []
    for level in range(depth):
        step = n >> level
        for start in range(0, n, step):
            mid = start + step // 2
            nodes.append(
                {
                    "level": level,
                    "iters": iters,
                    "lf": start,
                    "ll": mid,
                    "rf": mid,
                    "rl": start + step,
                    "cache": False,
                }
            )
    return nodes


def test_bp_node_config_permutation_and_cost(spark, clustered_docs):
    """--node-config mode (reorder_docids.hpp:40-63): an explicit
    balanced tree must produce a valid permutation and the same kind
    of log-gap cut as the depth-driven recursion."""
    from pisa_spark.build import build_lexicon, build_postings
    from pisa_spark.build.bp import recursive_graph_bisection_from_config
    from pisa_spark.build.reorder import log_gap_cost, reorder_postings

    mapping = recursive_graph_bisection_from_config(
        clustered_docs, _balanced_nodes(N, depth=4, iters=4)
    ).persist()
    mp = mapping.toPandas()
    assert sorted(mp["new_doc_id"]) == list(range(N))
    assert sorted(mp["doc_id"]) == list(range(N))

    lex = build_lexicon(clustered_docs)
    postings = build_postings(clustered_docs, lex).persist()
    base = log_gap_cost(postings).collect()[0]
    bp = log_gap_cost(reorder_postings(postings, mapping)).collect()[0]
    assert bp["n_gaps"] == base["n_gaps"]
    assert bp["cost_micro"] < base["cost_micro"] / 3, (
        bp["cost_micro"], base["cost_micro"],
    )
    mapping.unpersist()
    postings.unpersist()


def test_bp_node_config_untouched_positions_pass_through(spark,
                                                         clustered_docs):
    """Positions no node claims keep their slots (read_node_config
    builds only the nodes listed — a partial tree reorders only its
    own ranges)."""
    from pisa_spark.build.bp import recursive_graph_bisection_from_config

    # one node over the first half only; [160, 320) is unclaimed
    nodes = [
        {"level": 0, "iters": 2, "lf": 0, "ll": 80, "rf": 80,
         "rl": 160, "cache": False}
    ]
    mp = recursive_graph_bisection_from_config(
        clustered_docs, nodes
    ).toPandas()
    tail = mp[mp.doc_id >= 160]
    assert (tail["new_doc_id"] == tail["doc_id"]).all()
    head = mp[mp.doc_id < 160]
    assert sorted(head["new_doc_id"]) == list(range(160))


def test_read_node_config_format():
    """from_stream parity (recursive_graph_bisection.hpp:134-146):
    six ints + optional cache flag; default cache = size > 64."""
    from pisa_spark.build.bp import read_node_config

    nodes = read_node_config(
        "0 20 0 500 500 1000 0\n"
        "1 5 0 250 250 500\n"      # no flag, size 500 > 64 -> True
        "2 5 0 10 10 20\n"          # no flag, size 20 <= 64 -> False
        "\n"
    )
    assert [n["level"] for n in nodes] == [0, 1, 2]
    assert nodes[0] == {
        "level": 0, "iters": 20, "lf": 0, "ll": 500, "rf": 500,
        "rl": 1000, "cache": False,
    }
    assert nodes[1]["cache"] is True and nodes[2]["cache"] is False


def test_bp_node_config_rejects_overlapping_ranges(spark, clustered_docs):
    from pisa_spark.build.bp import recursive_graph_bisection_from_config

    nodes = [
        {"level": 0, "iters": 1, "lf": 0, "ll": 80, "rf": 80,
         "rl": 160, "cache": False},
        {"level": 0, "iters": 1, "lf": 100, "ll": 200, "rf": 200,
         "rl": 320, "cache": False},
    ]
    with pytest.raises(ValueError, match="overlapping"):
        recursive_graph_bisection_from_config(clustered_docs, nodes)


def test_bp_zero_iterations_is_flat_and_valid(spark, clustered_docs):
    """iterations=0 skips every swap round — the level loop must still
    checkpoint per level (CLAUDE.md iterative-loop rule; _swap_rounds
    normally provides the per-round flatten) and emit a valid
    permutation (pure median splits in docID order)."""
    from pisa_spark.build.bp import recursive_graph_bisection

    mapping = recursive_graph_bisection(
        clustered_docs, depth=3, iterations=0
    ).toPandas()
    n = len(mapping)
    assert sorted(mapping["new_doc_id"]) == list(range(n))
    assert mapping["doc_id"].nunique() == n
