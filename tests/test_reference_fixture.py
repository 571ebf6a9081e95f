"""Regression suite over the REFERENCE'S OWN test fixtures.

The reference ships a real 1,000-page ClueWeb09 sample
(`test/test_data/clueweb1k.plaintext`, the input of its CLI pipeline
`test/cli/setup.sh`: parse_collection -F lowercase porter2 → invert →
compress --check → create_wand_data) plus the document-order golden
(`clueweb1k.documents`) and the `partition_fwd_index --shard-files`
inputs (`clueweb1k.shard.00..03`). Driving THIS engine with the same
real web text closes the gap synthetic corpora leave: messy
vocabulary (33k terms over 1k docs), long documents (~600 tokens
avg), and the reference's exact analyzer configuration.

The binary `test_collection` postings that the reference's golden
`top5_thresholds` were computed from are NOT in the snapshot (only
`.sizes` survives), so score-level parity against that file is not
reproducible here; rank identity is pinned against the exhaustive SQL
oracle on the real corpus instead — the same oracle construction the
reference's own test_ranked_queries.cpp:99-144 uses (exhaustive
ranked_or as ground truth for every pruned algorithm).

Skipped wholesale when /root/reference is absent (public checkout of
this repo without the reference snapshot).
"""

from __future__ import annotations

import datetime
from pathlib import Path

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import Window, functions as F

from pisa_spark.config import AnalyzerConfig, EngineConfig
from pisa_spark.functions.scoring import bm25_sql_expr, dlit, micro_sql
from pisa_spark.index import build_index
from pisa_spark.query.executor import topk_search, topk_search_batch
from pisa_spark.query.parser import parse_queries

TEST_DATA = Path("/root/reference/test/test_data")

pytestmark = pytest.mark.skipif(
    not TEST_DATA.is_dir(), reason="reference test_data snapshot not present"
)


def _load_pages(spark):
    """clueweb1k.plaintext → the input_hint pages table. Record
    format per the reference plaintext parser (document_record.hpp
    operator>>): first whitespace token = trecid, rest of line =
    content."""
    rows = []
    for ln in (TEST_DATA / "clueweb1k.plaintext").read_text().splitlines():
        parts = ln.split(None, 1)
        rows.append((parts[0], parts[1] if len(parts) > 1 else ""))
    pdf = pd.DataFrame(rows, columns=["url", "text"])
    pdf["warc_ts"] = datetime.datetime(2024, 1, 1)
    pdf["html"] = b""
    pdf["lang"] = "en"
    return spark.createDataFrame(
        pdf[["url", "warc_ts", "html", "text", "lang"]],
        schema="url string, warc_ts timestamp, html binary, "
               "text string, lang string",
    )


@pytest.fixture(scope="module")
def clueweb_index(spark):
    """The setup.sh build: english tokenizer (parse_collection's
    default, tools/app.hpp:97) + lowercase + porter2."""
    pages = _load_pages(spark)
    cfg = EngineConfig(
        analyzer=AnalyzerConfig(
            tokenizer="english", lowercase=True, stemmer="porter2"
        )
    )
    return build_index(spark, pages, cfg)


def test_doc_order_matches_reference_documents(clueweb_index):
    """Our docIDs are dense ranks over url order; the reference's are
    input order (forward_index_builder.cpp:45-66, titles written as
    read). clueweb1k's titles arrive sorted, so the two orders must
    coincide EXACTLY — the golden `.documents` file pins it."""
    golden = (TEST_DATA / "clueweb1k.documents").read_text().splitlines()
    ours = [
        r["url"]
        for r in clueweb_index.docmap.orderBy("doc_id").collect()
    ]
    assert ours == golden


def test_real_webtext_corpus_shape(clueweb_index):
    """Sanity anchors for the real corpus: 1,000 docs, a web-scale
    vocabulary on 1k pages, and Σtf == doc_len per doc (the reference's
    count_postings invariant on real text)."""
    assert clueweb_index.num_docs == 1000
    vocab = clueweb_index.lexicon.count()
    assert vocab > 30_000  # messy real vocabulary, not synthetic
    bad = (
        clueweb_index.postings.groupBy("doc_id")
        .agg(F.sum("tf").alias("s"))
        .join(clueweb_index.doc_sizes, "doc_id")
        .filter(F.col("s") != F.col("doc_len"))
        .count()
    )
    assert bad == 0


def test_shard_mapping_matches_reference_files(spark, clueweb_index):
    """partition_fwd_index --shard-files parity (sharding.cpp:56-103 +
    136-268): the four clueweb1k.shard.* title files drive the
    mapping; every document must land in exactly the shard whose file
    lists its title."""
    from pisa_spark.build.shards import (
        assign_shards_from_mapping, shard_mapping_from_files,
    )

    files = sorted(TEST_DATA.glob("clueweb1k.shard.*"))
    assert len(files) == 4
    mapping = shard_mapping_from_files(spark, files)
    sharded = assign_shards_from_mapping(clueweb_index.docmap, mapping)

    got = {
        (r["url"], r["shard_id"]) for r in sharded.collect()
    }
    want = set()
    for sid, path in enumerate(files):
        for title in path.read_text().splitlines():
            if title:
                want.add((title, sid))
    assert got == want
    # per-shard counts match the files (250 each here)
    counts = {
        r["shard_id"]: r["count"]
        for r in sharded.groupBy("shard_id").count().collect()
    }
    assert counts == {0: 250, 1: 250, 2: 250, 3: 250}


def _real_queries(spark, index, n_queries: int = 30):
    """Deterministic head/tail-mixed workload over the REAL
    vocabulary: terms sampled by df rank so every query mixes a head
    term (huge list) with tail terms — the regime where pruning
    kernels earn their keep."""
    lex = (
        index.lexicon.orderBy(F.col("df").desc(), F.col("term"))
        .limit(4000)
        .collect()
    )
    terms = [r["term"] for r in lex]
    rows = []
    for qi in range(n_queries):
        n = 2 + qi % 4
        picked = [
            terms[(qi * 131 + j * j * 577) % len(terms)] for j in range(n)
        ]
        rows.append((f"cw{qi:03d}", picked, 10))
    qdf = spark.createDataFrame(
        pd.DataFrame(rows, columns=["query_id", "terms", "k"]),
        schema="query_id string, terms array<string>, k int",
    )
    return parse_queries(qdf, index.lexicon, pre_tokenized=True)


def _oracle_topk(index, parsed, k: int = 10) -> pd.DataFrame:
    scored = (
        parsed.join(index.postings, "term_id")
        .join(index.doc_sizes, "doc_id")
        .join(index.lexicon.select("term_id", "df"), "term_id")
        .withColumn(
            "s",
            F.expr(
                micro_sql(
                    bm25_sql_expr(
                        num_docs=dlit(index.num_docs),
                        avg_len=dlit(index.avg_len),
                    ),
                    weight="weight",
                )
            ),
        )
        .groupBy("query_id", "doc_id")
        .agg((F.sum("s") / F.lit(1e6)).alias("score"))
        .filter(F.col("score") > 0)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )


def test_kernels_rank_identical_on_real_webtext(spark, clueweb_index):
    """The reference's regression bar (test_ranked_queries.cpp:99-144)
    on its own corpus: every pruned kernel rank-identical to the
    exhaustive oracle, scores equal to 1e-6 (micro quantum)."""
    parsed = _real_queries(spark, clueweb_index).persist()
    parsed.count()
    exp = _oracle_topk(clueweb_index, parsed)
    for runner in (
        lambda: topk_search(
            clueweb_index, parsed, algorithm="block_max_wand", k=10
        ),
        lambda: topk_search(
            clueweb_index, parsed, algorithm="maxscore", k=10
        ),
        lambda: topk_search_batch(
            clueweb_index, parsed, algorithm="block_max_maxscore", k=10,
            batches=3,
        ),
    ):
        got = (
            runner()
            .toPandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
            .astype({"rank": "int64", "doc_id": "int64"})
        )
        pd.testing.assert_frame_equal(
            got[["query_id", "rank", "doc_id"]],
            exp[["query_id", "rank", "doc_id"]].astype(
                {"rank": "int64", "doc_id": "int64"}
            ),
        )
        np.testing.assert_allclose(
            got["score"], exp["score"], rtol=0, atol=1e-6
        )
    parsed.unpersist()


def test_query_id_file_parses_like_reference(spark):
    """The reference's own `queries` fixture (100 tab-separated
    int-ID queries, the input of its thresholds/queries CLI in ID
    mode) through parse_query_id_lines. Pins split_query_at_colon +
    parse_query_ids semantics (src/query/queries.cpp:14-68) and the
    query_freqs multiplicity collapse (:107-120) on the real file:
    exact ids for line 0, per-query term counts, and the duplicated
    terms of line 53 carrying weight 2."""
    from pisa_spark.query.parser import parse_query_id_lines

    raw = (TEST_DATA / "queries").read_text().splitlines()
    lines = spark.createDataFrame(
        list(enumerate(raw)), "line_no bigint, line string"
    )
    parsed = parse_query_id_lines(lines, k=5).toPandas()

    assert parsed["k"].eq(5).all()
    # no colon prefixes in the fixture -> line numbers name queries
    assert set(parsed["query_id"]) == {str(i) for i in range(100)}
    q0 = parsed[parsed.query_id == "0"].sort_values("term_id")
    assert list(q0["term_id"]) == [61936, 101587]
    assert q0["weight"].eq(1.0).all()
    # line 53: 67262, 62044, 105677 each appear twice; 96886 once
    q53 = dict(
        parsed[parsed.query_id == "53"][["term_id", "weight"]].values
    )
    assert q53 == {67262: 2.0, 62044: 2.0, 105677: 2.0, 96886: 1.0}
    # unique (query, term) pairs after the collapse: 325 raw tokens
    # minus one per collapsed duplicate
    assert len(parsed) == 325 - sum(
        len(ln.split()) - len(set(ln.split())) for ln in raw
    )


def test_query_id_colon_and_separator_semantics(spark):
    """Engineered lines covering the colon/id split and the
    reference's full separator set (space, tab, comma — the char set
    of boost::is_any_of at src/query/queries.cpp:55 includes ','),
    empty-token erasure, and the fatal non-integer contract."""
    from pisa_spark.query.parser import parse_query_id_lines

    lines = spark.createDataFrame(
        [
            (0, "Q7:3 1  2,2"),   # id prefix; mixed seps; dup -> w=2
            (1, "::5"),            # empty id; second colon is DATA...
            (2, "8\t9"),
        ],
        "line_no bigint, line string",
    )
    # ...but ":5" doesn't stoi -> reference exits; we raise
    with pytest.raises(ValueError):
        parse_query_id_lines(lines).toPandas()

    ok = parse_query_id_lines(
        lines.where("line_no != 1"), k=3
    ).toPandas()
    q7 = dict(ok[ok.query_id == "Q7"][["term_id", "weight"]].values)
    assert q7 == {3: 1.0, 1: 1.0, 2: 2.0}
    assert set(ok[ok.query_id == "2"]["term_id"]) == {8, 9}

    # term ids are BIGINT engine-wide (assign_global_ids): an id
    # beyond 2^31 is well-formed, not a "non-integer" parse failure
    big = spark.createDataFrame(
        [(0, "3000000000 7")], "line_no bigint, line string"
    )
    wide = parse_query_id_lines(big, k=3).toPandas()
    assert set(wide["term_id"]) == {3000000000, 7}


def test_bp_node_config_fixture_parses():
    """The reference's own bp-node-config.txt (the input of
    test_recursive_graph_bisection.cpp:128): a full depth-10 balanced
    tree over the 1,000-doc collection. Pins the file format and the
    tree invariants our config-driven BP consumes: level 0 bisects
    [0,1000), ranges are contiguous (ll == rf), children nest inside a
    parent's span, and 20 iterations everywhere."""
    from pisa_spark.build.bp import read_node_config

    nodes = read_node_config((TEST_DATA / "bp-node-config.txt").read_text())
    assert len(nodes) == 999
    assert all(n["iters"] == 20 and n["cache"] is False for n in nodes)
    assert all(n["ll"] == n["rf"] for n in nodes)
    roots = [n for n in nodes if n["level"] == 0]
    assert roots == [
        {"level": 0, "iters": 20, "lf": 0, "ll": 500, "rf": 500,
         "rl": 1000, "cache": False}
    ]
    spans = {0: [(0, 1000)]}
    for n in nodes:
        spans.setdefault(n["level"] + 1, []).extend(
            [(n["lf"], n["ll"]), (n["rf"], n["rl"])]
        )
        assert any(
            p[0] <= n["lf"] and n["rl"] <= p[1] for p in spans[n["level"]]
        ), n


def test_sizes_fixture_reads_via_binary_collection(spark):
    """test_collection.sizes through the binary_collection importer
    (binary_collection.hpp wire format): 10,000 docs whose first five
    lengths and total token count pin the parse byte-exactly."""
    from pisa_spark.build.bincoll import read_sizes

    sizes = read_sizes(
        spark, str(TEST_DATA / "test_collection.sizes")
    ).toPandas().sort_values("doc_id")
    assert len(sizes) == 10_000
    assert list(sizes["doc_len"].head(5)) == [126, 313, 312, 199, 207]
    assert int(sizes["doc_len"].sum()) == 17_700_745
