"""Physical-plan shape regression tests.

BENCH.md's plan audit makes three structural claims about the engine;
these tests pin them so future edits can't silently reintroduce the
round-1 scale-killers:

1. the kernel query path plans NO SortMergeJoin (the query side is
   broadcast into the segment scan — segments never shuffle);
2. no BroadcastExchange is ever fed by the SEGMENTS side (broadcasting
   the 100 TB side would OOM every executor);
3. with ``lexicon_broadcast_threshold=0`` the build path adds no
   broadcast hint anywhere (maybe_broadcast is identity).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pisa_spark.config import AnalyzerConfig, EngineConfig, IndexConfig

SF = "/root/testdata/sf0.001"
CFG = EngineConfig(
    analyzer=AnalyzerConfig(tokenizer="whitespace"),
    index=IndexConfig(salt_bucket_docs=256),
)


@pytest.fixture(scope="module")
def index(spark):
    from pisa_spark.corpus import pages_from_documents
    from pisa_spark.index import build_index

    pages = pages_from_documents(spark, SF).limit(200)
    idx = build_index(spark, pages, CFG)
    idx.segments.persist().count()
    idx.term_meta.persist().count()
    return idx


@pytest.fixture(scope="module")
def parsed(spark, index):
    from pisa_spark.query.parser import parse_queries

    terms = [r["term"] for r in index.lexicon.limit(12).collect()]
    rows = [(f"q{i}", [terms[i], terms[(i + 5) % len(terms)]], 10)
            for i in range(4)]
    qdf = spark.createDataFrame(
        pd.DataFrame(rows, columns=["query_id", "terms", "k"]),
        schema="query_id string, terms array<string>, k int",
    )
    return parse_queries(qdf, index.lexicon, pre_tokenized=True)


def _plan_str(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _subtree_lines(plan: str, marker: str):
    """Yield the text of each subtree rooted at a line containing
    ``marker`` (tree-art indentation: a child's first alphanumeric
    column is strictly greater than its parent's)."""
    lines = plan.splitlines()

    def depth(line: str) -> int:
        for i, ch in enumerate(line):
            if ch.isalnum() or ch == "*":
                return i
        return len(line)

    for i, line in enumerate(lines):
        if marker not in line:
            continue
        d = depth(line)
        sub = [line]
        for nxt in lines[i + 1:]:
            if not nxt.strip():
                break
            # AQE section markers ("+- == Initial Plan ==") start a
            # SIBLING printout of an AdaptiveSparkPlan's pre-adaptive
            # plan, not a tree child — and depth() mis-ranks them
            # because '=' is not alphanumeric. Never cross one.
            if "== Initial Plan ==" in nxt or "== Final Plan ==" in nxt:
                break
            if depth(nxt) <= d:
                break
            sub.append(nxt)
        yield "\n".join(sub)


def test_kernel_path_has_no_sort_merge_join(index, parsed):
    from pisa_spark.query.executor import topk_search

    plan = _plan_str(topk_search(index, parsed, algorithm="block_max_wand"))
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan  # the intended strategy


def test_segments_never_broadcast(index, parsed):
    """No BroadcastExchange subtree may contain the segments payload
    columns (doc_bytes is segments-only) — the broadcast sides must be
    the query-sized parsed/term_meta tables."""
    from pisa_spark.query.executor import topk_range, topk_search

    for df in (
        topk_search(index, parsed, algorithm="block_max_wand"),
        topk_range(index, parsed, algorithm="maxscore"),
    ):
        plan = _plan_str(df)
        subtrees = list(_subtree_lines(plan, "BroadcastExchange"))
        assert subtrees, plan  # the hinted joins must exist
        for sub in subtrees:
            assert "doc_bytes" not in sub, sub


def test_threshold_zero_disables_lexicon_broadcast(spark):
    from pisa_spark.build.invert import maybe_broadcast
    from pisa_spark.corpus import pages_from_documents
    from pisa_spark.index import build_index

    df = spark.range(5).toDF("term_id")
    # identity when disabled or unknown size; hint only when counted small
    assert maybe_broadcast(df, 5, 0) is df
    assert maybe_broadcast(df, None, 10_000) is df
    assert maybe_broadcast(df, 5, 10_000) is not df

    cfg = EngineConfig(
        analyzer=AnalyzerConfig(tokenizer="whitespace"),
        index=IndexConfig(salt_bucket_docs=256, lexicon_broadcast_threshold=0),
    )
    pages = pages_from_documents(spark, SF).limit(100)
    idx = build_index(spark, pages, cfg)
    for art in (idx.postings, idx.segments, idx.term_meta):
        analyzed = art._jdf.queryExecution().analyzed().toString()
        # The ONLY permitted hint is assign_global_ids' per-partition
        # offset table (__pid/__off: one row per partition — small by
        # construction, never corpus- or vocabulary-proportional).
        lines = analyzed.splitlines()
        for i, line in enumerate(lines):
            if "ResolvedHint" not in line:
                continue
            target = lines[i + 1] if i + 1 < len(lines) else ""
            assert "__off" in target, f"unexpected broadcast hint:\n{line}\n{target}"
    # results still correct without hints (pinned cheaply by counts)
    assert idx.postings.count() > 0 and idx.segments.count() > 0


def test_workload_term_filter_reaches_parquet_scan(spark, tmp_path_factory):
    """File-backed indexes (BuildPipeline) get the workload's term_ids
    pushed INTO the parquet segment scan (PushedFilters: In(term_id,..))
    so each query batch row-group-prunes instead of reading the whole
    table; results are identical with pruning off; in-memory indexes
    skip the extra job entirely."""
    from pisa_spark.build.pipeline import BuildPipeline
    from pisa_spark.corpus import pages_from_documents
    from pisa_spark.query.executor import _pruned_segments, topk_search
    from pisa_spark.query.parser import parse_queries

    out = str(tmp_path_factory.mktemp("pipe_idx"))
    pages = pages_from_documents(spark, SF).limit(200)
    idx = BuildPipeline(spark, out, CFG).run(pages)
    assert idx.segments_file_backed

    terms = [r["term"] for r in idx.lexicon.limit(8).collect()]
    qdf = spark.createDataFrame(
        pd.DataFrame(
            [(f"q{i}", [terms[i], terms[i + 4]], 10) for i in range(4)],
            columns=["query_id", "terms", "k"],
        ),
        schema="query_id string, terms array<string>, k int",
    )
    parsed = parse_queries(qdf, idx.lexicon, pre_tokenized=True)

    pruned = topk_search(idx, parsed, algorithm="maxscore", scan_prune=True)
    plan = _plan_str(pruned)
    assert "In(term_id" in plan or "term_id IN" in plan, plan

    plain = topk_search(idx, parsed, algorithm="maxscore", scan_prune=False)
    assert "In(term_id" not in _plan_str(plain)
    a = pruned.toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = plain.toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    # AUTO mode's vocab-fraction gate: this workload's 8 distinct terms
    # cover ~26% of the tiny vocabulary — far past
    # SCAN_PRUNE_MAX_VOCAB_FRAC — so the IN filter could not skip any
    # row group and auto must fall back to the plain join (the 100TB
    # case, vocab >= 1e8, passes the gate for any capped workload).
    import pisa_spark.query.executor as ex

    assert idx.num_terms and idx.num_terms > 0
    assert _pruned_segments(idx, parsed, None) is idx.segments
    # With a generous fraction the same workload auto-engages.
    orig = ex.SCAN_PRUNE_MAX_VOCAB_FRAC
    ex.SCAN_PRUNE_MAX_VOCAB_FRAC = 0.9
    try:
        assert _pruned_segments(idx, parsed, None) is not idx.segments
    finally:
        ex.SCAN_PRUNE_MAX_VOCAB_FRAC = orig


def test_in_memory_index_skips_scan_prune(index, parsed):
    """The auto heuristic must NOT add the collect+filter for computed
    (non-file-backed) segment DAGs — there is no scan to prune."""
    from pisa_spark.query.executor import _pruned_segments

    assert _pruned_segments(index, parsed, None) is index.segments


def test_live_range_join_is_unhinted(index, parsed, spark):
    """The (rows x live_ranges) join deliberately carries NO broadcast
    hint — at 10^12 docs the live set can be large; AQE must pick the
    strategy. Pin: no BroadcastExchange subtree under that join's
    aggregate contains doc_bytes (covered above) and the plan builds
    without a hard hint from our side."""
    from pisa_spark.query.executor import topk_range

    thr = parsed.select("query_id").distinct().withColumn(
        "threshold_micro", F.lit(0).cast("long")
    )
    df = topk_range(index, parsed, algorithm="maxscore", thresholds=thr)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    # exactly the broadcasts we hint (parsed/qt/thresholds) — counted
    # conservatively: every ResolvedHint line must reference a
    # query-sized relation, never the segments schema
    for line in analyzed.splitlines():
        if "ResolvedHint" in line:
            assert "doc_bytes" not in line


def test_estimator_plans_have_no_sort_merge_join(index, parsed):
    """The threshold-estimator jobs keep the kernel path's join
    discipline: every WORKLOAD-keyed join (query_id / comb keys —
    sides bounded by the query batch, not the corpus) is hinted
    broadcast, never sort-merge — pinned for the intersection-slicing
    and lookup-pipeline families, whose multi-stage comb machinery is
    the likeliest place for a future edit to drop a hint. The one
    permitted SortMergeJoin is postings ⨝ lexicon on term_id:
    scored_postings deliberately never force-broadcasts an
    unknown-size vocabulary (AQE converts small ones at runtime)."""
    from pisa_spark.query.thresholds import (
        intersection_kth_thresholds, lookup_kth_thresholds,
    )

    for df in (
        intersection_kth_thresholds(index, parsed, k=10),
        lookup_kth_thresholds(index, parsed, budget=16, k=10, gram=2),
    ):
        plan = _plan_str(df)
        assert "BroadcastHashJoin" in plan
        for line in plan.splitlines():
            if "SortMergeJoin" in line:
                assert "query_id" not in line and "comb" not in line, line
                assert "term_id" in line, line  # the permitted lexicon join


def test_docid_assignment_never_moves_the_corpus(spark):
    """docIDs join in from the url projection (forward.
    _with_assigned_ids): the docs plan must contain no range
    exchange at all (the one range shuffle ran over urls only,
    inside assign_global_ids' eager localCheckpoint) and no Exchange
    subtree may carry the terms arrays — the corpus never shuffles
    or re-materializes for an id column. This pins the BROADCAST
    regime (doc count under ID_BROADCAST_ROWS); above the gate the
    join is a plain hash join where the corpus moves once — the same
    single movement the old range shuffle made, still without the
    second materialization (SCALE.md docID row)."""
    from pisa_spark.build.forward import tokenize_pages
    from pisa_spark.corpus import synth_pages

    docs = tokenize_pages(synth_pages(spark, 300), CFG.analyzer)
    plan = _plan_str(docs)
    assert "rangepartitioning" not in plan.lower(), plan
    for sub in _subtree_lines(plan, "Exchange"):
        assert "terms#" not in sub, sub
    # ids actually joined: dense 0..n-1 over sorted urls
    pdf = docs.select("doc_id", "url").toPandas().sort_values("url")
    assert list(pdf["doc_id"]) == list(range(len(pdf)))


def test_simhash_cap_is_broadcast_antijoin(spark):
    """The simhash bucket cap must stay a broadcast LeftAnti join
    against the over-cap key set — the key space is bounded by
    construction (SIM_CHUNKS x 2^15 values), so the cap filter is
    map-side on both self-join sides. A count-window form here would
    re-shuffle the full exploded chunk table just to annotate it."""
    from pisa_spark.datapipe.dedup import simhash_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan_str(simhash_pairs(docs))
    assert "Window" not in plan, plan
    anti = [ln for ln in plan.splitlines() if "LeftAnti" in ln]
    assert anti and all("Broadcast" in ln for ln in anti), plan


def test_minhash_cap_is_antijoin_not_window(spark):
    """The minhash band-bucket cap must be a LeftAnti join against
    the groupBy'd over-cap key set, never a count window: a window
    partitioned on (band_id, band_key) holds the dominant bucket —
    the exact degenerate bucket the cap exists for — in ONE task,
    while the groupBy is map-side combined and a skewed LeftAnti
    stream side is AQE-splittable. Unlike the simhash/embedding caps
    the key space (md5) is NOT bounded by construction, so no
    broadcast hint (the known-small rule); the join may still
    RESOLVE to broadcast via AQE on tiny inputs, so only the
    window's absence and the LeftAnti's presence are pinned. The
    pin targets the lazy _cap_bands subtree: inside
    minhash_lsh_pairs it sits behind an eager localCheckpoint whose
    LogicalRDD hides it from the end-to-end plan."""
    from pisa_spark.datapipe.dedup import _cap_bands, minhash_bands

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan_str(_cap_bands(minhash_bands(docs), 64))
    # The shingle builder's per-doc lead() window (bounded by one
    # doc) is fine; what must not exist is any window over the band
    # key — that partition is the unbounded bucket.
    band_windows = [
        ln for ln in plan.splitlines()
        if "Window" in ln and "band_key" in ln
    ]
    assert not band_windows, band_windows
    assert "LeftAnti" in plan, plan


def test_embedding_cell_cap_is_broadcast_antijoin(spark):
    """Same contract as the simhash cap: the IVF cell cap in
    embedding_dup_pairs is a broadcast LeftAnti join (cell ids are
    bounded by n_centroids, so the over-cap set is provably small),
    never a count window over the full assignment table."""
    from pisa_spark.datapipe.similarity import embedding_dup_pairs

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = _plan_str(embedding_dup_pairs(emb))
    anti = [ln for ln in plan.splitlines() if "LeftAnti" in ln]
    assert anti and all("Broadcast" in ln for ln in anti), plan


def test_build_scale_growth(tmp_path):
    """Two-size build probe (scripts/scale_probe.py, fresh sessions):
    shuffle bytes must grow ~linearly with the corpus while the
    driver process's peak RSS stays flat — the measured form of this
    file's plan-shape claims (nothing driver-side scales with docs;
    the postings shuffle is the data volume). Small sizes keep the
    broadcast-gate regime fixed (both < ID_BROADCAST_ROWS), so the
    byte growth here isolates pure scaling, not the documented
    regime switch measured in SCALE.md."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "probe.json")
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "scale_probe.py"),
         "--docs", "8000,32000", "--cores", "8", "--out", out],
        capture_output=True, text=True, cwd=repo, timeout=420,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    data = json.load(open(out))
    (growth,) = data["growth_vs_first"]
    assert growth["docs_ratio"] == 4.0
    # linear shuffle: 4x docs -> ~4x bytes (vocab growth adds a few
    # percent; anything quadratic or corpus-broadcast-shaped lands
    # far outside this band)
    assert 3.0 <= growth["shuffle_write_ratio"] <= 5.5, growth
    # flat driver: the Python driver's peak RSS must not track docs
    assert growth["driver_rss_ratio"] <= 1.5, growth


def test_dedup_scale_growth(tmp_path):
    """Two-size dedup probe (scale_probe.py --job dedup): the
    minhash-banding and simhash-chunk shuffles must grow ~linearly
    with the corpus and the driver RSS stay flat. The simhash chunk
    cap is what makes this hold — 15-bit chunk buckets grow with the
    corpus, and without the MAX_BUCKET guard the candidate join's
    output (and its shuffle) grows quadratically on self-similar
    corpora (SCALE.md "Training-data pipeline")."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "probe.json")
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "scale_probe.py"),
         "--job", "dedup", "--docs", "4000,8000", "--cores", "8",
         "--out", out],
        capture_output=True, text=True, cwd=repo, timeout=420,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    data = json.load(open(out))
    (growth,) = data["growth_vs_first"]
    assert growth["docs_ratio"] == 2.0
    assert 1.5 <= growth["shuffle_write_ratio"] <= 2.8, growth
    assert growth["driver_rss_ratio"] <= 1.5, growth
    a, b = data["runs"]
    # capped pair output stays near-linear (uncapped: ~4x at 2x docs)
    assert b["simhash_pairs"] <= 3.2 * max(a["simhash_pairs"], 1), data
    # the cap is actually exercising: dropped buckets are reported
    assert a["simhash_dropped_chunks"] > 0 and b["simhash_dropped_chunks"] > 0
