"""Distributed query execution: fan kernels out with applyInPandas.

Two physical strategies, mirroring the reference's two processing
modes:

- ``topk_search`` (query-major, mirrors tools/queries.cpp:175-288):
  each query is one task; its terms' segments are shuffled/broadcast
  to it and a numpy kernel runs the whole query. Right when posting
  lists fit a task (the query side broadcasts, so Catalyst plans a
  broadcast-hash join against the big segment table — segments never
  move).
- ``topk_range`` (doc-range-major, mirrors range_query.hpp:8-37):
  kernels run per (query, docID-bucket) partition producing partial
  top-k, then a window merges heaps. This is the 10^12-doc path: no
  task ever sees a full head-term posting list.

Neither strategy touches any global per-document structure: doc
lengths are encoded inside each segment block (segments.py
``len_bytes``), so there is no driver-side collect and no broadcast
of anything proportional to the corpus — the reference's design of
keeping lengths with the wand data (wand_data.hpp:38-117), in Spark
form.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, Window

from pisa_spark.codecs import CODECS
from pisa_spark.config import EngineConfig
from pisa_spark.functions.scoring import MICRO
from pisa_spark.index import InvertedIndex
from pisa_spark.query.kernels import (
    CappedBlockCache,
    adaptive_kernel,
    PRUNE_EPS,
    Stats,
    TermPostings,
    and_kernel,
    block_max_maxscore_kernel,
    block_max_ranked_and_kernel,
    block_max_wand_kernel,
    maxscore_kernel,
    or_kernel,
    ranked_and_kernel,
    ranked_or_kernel,
    wand_kernel,
)

RANKED_KERNELS = {
    # per-query algorithm selection from pre-decode metadata
    # (kernels.choose_algorithm) — latency-only, answers identical
    "adaptive": adaptive_kernel,
    "ranked_or": ranked_or_kernel,
    "ranked_and": ranked_and_kernel,
    "block_max_ranked_and": block_max_ranked_and_kernel,
    "wand": wand_kernel,
    "block_max_wand": block_max_wand_kernel,
    "block_max_maxscore": block_max_maxscore_kernel,
    "maxscore": maxscore_kernel,
}
BOOLEAN_KERNELS = {"and": and_kernel, "or": or_kernel}

# Algorithms whose score is a sum over ALL matching terms of >= 0
# contributions (disjunctive semantics). Only for these is a cached
# k-th best SINGLE-TERM score a lower bound on the query's k-th final
# score. Conjunctive algorithms (ranked_and / block_max_ranked_and)
# restrict candidates to the intersection, whose k-th score can be
# LOWER than one term's k-th score — bootstrapping them with the same
# cache silently drops valid results, so topk_search rejects it.
DISJUNCTIVE_ALGORITHMS = frozenset(
    {"ranked_or", "wand", "block_max_wand", "block_max_maxscore",
     "maxscore", "adaptive"}  # adaptive dispatches to disjunctive only
)

# Scan pruning: push the workload's distinct term_ids into the parquet
# segment scan as a literal IN filter. The broadcast-hash join already
# restricts ROWS, but a join alone prunes nothing at the SCAN — every
# query batch reads the full 100TB segment table. An IN(term_id)
# predicate reaches the parquet reader (PushedFilters) and skips whole
# row groups via min/max + dictionary stats, which is what makes the
# per-batch read O(workload lists), not O(corpus) — provided segments
# were written sorted by term_id (build/pipeline.py does). The id list
# is WORKLOAD-sized (distinct query terms, capped), never corpus-sized.
SCAN_PRUNE_MAX_TERMS = 4096
# Auto mode additionally disengages when the workload covers more than
# this fraction of the vocabulary: with terms spread across most row
# groups the IN filter skips nothing and just adds a collect job plus
# per-row filter work (measured 12% slower on a 3200-query batch over
# a 6.4k-term vocab). At 10^12-doc scale (vocab >= 10^8) any workload
# under SCAN_PRUNE_MAX_TERMS passes trivially — the fraction gate only
# bites small-vocab corpora, exactly where pruning cannot help.
# scan_prune=True bypasses the fraction gate (forced).
SCAN_PRUNE_MAX_VOCAB_FRAC = 0.02


def _is_bare_relation(df: DataFrame) -> bool:
    """True iff ``df`` is a direct table read (file-source relation at
    the analyzed-plan root, no computation on top) — the artifact-backed
    index shape produced by BuildPipeline.run / IncrementalIndexer._read
    where an extra tiny collect to build the pushdown filter is always
    worth one avoided full scan. In-memory indexes (the test/bench gate
    builds) skip pruning: their segment "scan" is a computed DAG, so
    there is no row group to skip and the filter would only add a job."""
    try:
        plan = df._jdf.queryExecution().analyzed().toString()
    except Exception:
        return False
    return plan.split("\n", 1)[0].startswith("Relation")


def _pruned_segments(
    index: InvertedIndex, parsed: DataFrame, scan_prune: bool | None
) -> DataFrame:
    """index.segments, IN-filtered to the workload's term_ids when
    pruning applies. ``scan_prune=None`` auto-enables for file-backed
    segment tables only; True forces (useful when segments sit under a
    view/filter the heuristic does not see); False disables. The
    collect here is workload-sized and capped (SCAN_PRUNE_MAX_TERMS) —
    beyond the cap the IN literal would bloat the plan, so we fall back
    to the plain join (still correct, just unpruned)."""
    auto = scan_prune is None
    if auto:
        scan_prune = index.segments_file_backed or _is_bare_relation(
            index.segments
        )
    if not scan_prune:
        return index.segments
    cap = SCAN_PRUNE_MAX_TERMS
    if auto and index.num_terms:
        # vocab-fraction gate (see SCAN_PRUNE_MAX_VOCAB_FRAC)
        cap = min(cap, int(SCAN_PRUNE_MAX_VOCAB_FRAC * index.num_terms))
    if cap < 1:
        return index.segments
    ids = [
        r[0]
        for r in parsed.select("term_id")
        .distinct()
        .limit(cap + 1)
        .collect()
    ]
    if not ids or len(ids) > cap:
        return index.segments
    return index.segments.filter(F.col("term_id").isin(ids))


def _group_to_terms(pdf: pd.DataFrame, decode) -> list[TermPostings]:
    terms = []
    compressed = "max_score_q" in pdf.columns
    for term_id, g in pdf.groupby("term_id", sort=True):
        g = g.sort_values("block_id")
        weight = float(g["weight"].iloc[0])
        tmax = float(g["term_max_score"].iloc[0])
        if compressed:
            # wand_data_compressed recovery: u8 relative to term max
            # (quantization rounded up at build -> still one-sided)
            block_max = g["max_score_q"].to_numpy(np.float64) / 255.0 * tmax
        else:
            block_max = g["max_score"].to_numpy(np.float64)
        # Upper bounds scaled to MICRO units (+1 covers the <=0.5-micro
        # quantization shift) so they stay sound vs micro-int scores.
        from pisa_spark.functions.scoring import MICRO

        terms.append(
            TermPostings(
                term_id=int(term_id),
                df=float(g["df"].iloc[0]),
                weight=weight,
                max_score=weight * tmax * MICRO + 1.0,
                block_max_doc=g["max_doc_id"].to_numpy(np.uint64),
                block_max_score=weight * block_max * MICRO + 1.0,
                block_count=g["count"].to_numpy(np.int64),
                doc_payloads=[bytes(x) for x in g["doc_bytes"]],
                tf_payloads=[bytes(x) for x in g["tf_bytes"]],
                len_payloads=[bytes(x) for x in g["len_bytes"]],
                decode=decode,
            )
        )
    return terms


def _query_segments(
    index: InvertedIndex, parsed: DataFrame, scan_prune: bool | None = None
) -> DataFrame:
    """parsed(query_id, k, term_id, weight) ⨝ term_meta ⨝ segments.

    The parsed-query side is tiny -> broadcast, so the segment table
    (the 100TB side) is scanned once with a broadcast-hash join and
    never shuffled — and for file-backed indexes the scan itself is
    row-group-pruned by the workload's term_ids (_pruned_segments).

    Incrementally-built indexes carry a per-term ``bound_factor`` in
    term_meta (streaming/incremental.py): the sound upper-bound
    inflation for terms whose stored blocks were encoded under older
    global stats. It is applied HERE — to the term max and the block
    maxes — so stored segments stay immutable while every kernel's
    pruning bounds stay one-sided. Batch indexes have no such column
    (factor 1 by construction)."""
    return _factored_segment_rows(index, parsed, parsed, scan_prune)


def _factored_segment_rows(
    index: InvertedIndex,
    parsed: DataFrame,
    query_side: DataFrame,
    scan_prune: bool | None,
) -> DataFrame:
    """The ONE place the bound-factor contract is applied (query-major
    and batch-major execution both come through here, so they can
    never diverge on pruning bounds): term_meta columns joined to the
    broadcast-sized ``query_side`` (parsed queries, or a batch term
    set), joined into the workload-pruned segment scan (driven by
    ``parsed``), with ``bound_factor`` multiplied into the term max
    and block maxes."""
    # Broadcast the query-sized side into the vocabulary-sized
    # term_meta (never the reverse), then the result into the
    # segment scan.
    tm = index.term_meta
    has_factor = "bound_factor" in tm.columns
    cols = ["term_id", "df", F.col("max_score").alias("term_max_score")]
    if has_factor:
        cols.append("bound_factor")
    qt = tm.select(*cols).join(F.broadcast(query_side), "term_id")
    rows = _pruned_segments(index, parsed, scan_prune).join(
        F.broadcast(qt), "term_id"
    )
    if has_factor:
        rows = rows.withColumn(
            "term_max_score", F.col("term_max_score") * F.col("bound_factor")
        )
        if "max_score" in rows.columns:
            rows = rows.withColumn(
                "max_score", F.col("max_score") * F.col("bound_factor")
            )
        # compressed block maxes (max_score_q) are relative to the
        # term max and inherit its scaling automatically
        rows = rows.drop("bound_factor")
    return rows


def topk_search(
    index: InvertedIndex,
    parsed: DataFrame,
    algorithm: str = "block_max_wand",
    k: int = 10,
    thresholds: DataFrame | None = None,
    profile: bool = False,
    scan_prune: bool | None = None,
) -> DataFrame:
    """(query_id, rank, doc_id, score) — query-major execution.

    ``thresholds``: optional (query_id, threshold_micro) sound lower
    bounds (thresholds.estimate_thresholds) that bootstrap each
    kernel's heap threshold — the fork's kth_threshold pipeline, but
    safe by construction (no --safe rerun needed). Only valid for
    DISJUNCTIVE_ALGORITHMS (see above): passing thresholds with a
    conjunctive algorithm raises ValueError instead of silently
    dropping intersection results below the single-term bound.

    ``profile``: adds (blocks_decoded, postings_decoded) per query —
    the reference's profile_queries/block_profiler counters — making
    pruning effectiveness measurable (a pruned kernel must decode
    fewer blocks than the exhaustive one on the same query)."""
    kernel = RANKED_KERNELS[algorithm]
    decode = CODECS[index.config.index.codec][1]
    stats = Stats(
        num_docs=float(index.num_docs),
        avg_len=float(index.avg_len),
        k1=index.config.bm25.k1,
        b=index.config.bm25.b,
        quantized=bool(index.config.index.quantize_bits),
    )
    if thresholds is not None:
        if algorithm not in DISJUNCTIVE_ALGORITHMS:
            raise ValueError(
                f"threshold bootstrapping is unsound for conjunctive "
                f"algorithm {algorithm!r}: the cached k-th single-term "
                f"score can exceed the intersection's k-th score"
            )
        parsed = parsed.join(F.broadcast(thresholds), "query_id", "left")

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        from pisa_spark.query.kernels import Profiler

        terms = _group_to_terms(pdf, decode)
        kk = int(pdf["k"].iloc[0]) if "k" in pdf else k
        init = 0.0
        if "threshold_micro" in pdf and pd.notna(pdf["threshold_micro"].iloc[0]):
            # estimate is a true lower bound; keep the quantization
            # slack so boundary ties are never pruned
            init = float(pdf["threshold_micro"].iloc[0]) - PRUNE_EPS
        Profiler.reset()
        docs, scores = kernel(terms, kk, stats, init_threshold=init)
        out = pd.DataFrame(
            {
                "query_id": pdf["query_id"].iloc[0],
                "rank": np.arange(1, len(docs) + 1, dtype=np.int32),
                "doc_id": docs,
                "score": scores,
            }
        )
        if profile:
            out["blocks_decoded"] = np.int64(Profiler.blocks)
            out["postings_decoded"] = np.int64(Profiler.postings)
        return out

    schema = "query_id string, rank int, doc_id long, score double"
    if profile:
        schema += ", blocks_decoded long, postings_decoded long"
    rows = _query_segments(index, parsed, scan_prune)
    return rows.groupBy("query_id").applyInPandas(run, schema)


def topk_search_safe(
    index: InvertedIndex,
    parsed: DataFrame,
    algorithm: str = "block_max_wand",
    k: int = 10,
    thresholds: DataFrame | None = None,
    scan_prune: bool | None = None,
) -> DataFrame:
    """topk_search bootstrapped by POSSIBLY-UNSOUND threshold
    estimates, made exact by the reference's --safe rerun
    (tools/queries.cpp:74-90: a heap that did not fill to k under the
    initial threshold is rerun from threshold 0).

    The sound estimators (kth_score_cache / pairs / combine_did /
    intersection / lookup) never need this — topk_search alone is
    already exact with them. This is the companion of the RISKY
    sampling estimator (thresholds.sampling_kth_thresholds): its
    estimate over-shoots the true k-th score with probability <=
    target_o, in which case the bootstrapped heap under-fills; the
    rerun restores exactness, so the pipeline trades a bounded
    probability of one extra (cheap, per-query) pass for starting
    every heap near its final threshold.

    Under-fill is counted over RELIABLE entries only — those scoring
    >= the query's estimate. The reference's topk_queue never admits
    a sub-threshold entry, so its heap size is that count by
    construction; these kernels admit any doc they happened to score
    (a decoded block can contain sub-threshold docs), and with an
    over-shot threshold such lucky entries could fill the heap while
    a true top-k doc's block was pruned. Counting entries >= the
    estimate restores the WAND invariant the rerun rests on: every
    doc scoring >= theta is provably enumerated (its upper bound
    exceeds theta), so k reliable entries == the exact top-k, and
    fewer means rerun. Scores must be in the engine's micro scale
    (non-quantized indexes — same contract as the estimators).

    Spark shape: one bootstrapped pass over all queries, one
    unbootstrapped pass over ONLY the under-filled queries (per-query
    k respected when the workload carries a k column), stitched by an
    anti-join. The rerun side is workload-sized — never a second full
    pass."""
    first = topk_search(
        index, parsed, algorithm=algorithm, k=k,
        thresholds=thresholds, scan_prune=scan_prune,
    )
    if thresholds is None:
        return first
    # `first` feeds the under-fill count AND both stitch branches —
    # pin it eagerly so the kernel pass runs once, not per consumer
    # (eager localCheckpoint over persist per the repo rule:
    # CacheManager entries leak in per-micro-batch callers).
    first = first.localCheckpoint()
    reliable = (
        first.join(F.broadcast(thresholds), "query_id", "left")
        .filter(
            F.col("threshold_micro").isNull()
            | (
                F.floor(F.col("score") * F.lit(1e6) + F.lit(0.5))
                >= F.col("threshold_micro")
            )
        )
    )
    counts = reliable.groupBy("query_id").agg(F.count("*").alias("nres"))
    qk = parsed.select(
        "query_id",
        (F.col("k") if "k" in parsed.columns else F.lit(k)).alias("qk"),
    ).distinct()
    # only a genuinely bootstrapped heap (non-negative estimate) can
    # under-fill from over-pruning; NULL/sentinel-threshold queries
    # already ran unbootstrapped and exact — rerunning them would
    # just repeat the identical pass
    under = (
        qk.join(counts, "query_id", "left")
        .join(F.broadcast(thresholds), "query_id", "left")
        .filter(
            (F.coalesce(F.col("nres"), F.lit(0)) < F.col("qk"))
            & (F.coalesce(F.col("threshold_micro"), F.lit(-1)) >= 0)
        )
        .select("query_id")
    )
    rerun = topk_search(
        index,
        parsed.join(F.broadcast(under), "query_id"),
        algorithm=algorithm, k=k, thresholds=None, scan_prune=scan_prune,
    )
    kept = first.join(F.broadcast(under), "query_id", "left_anti")
    return kept.unionByName(rerun)


def boolean_query(
    index: InvertedIndex,
    parsed: DataFrame,
    op: str = "and",
    scan_prune: bool | None = None,
) -> DataFrame:
    """(query_id, doc_id) Boolean AND/OR result sets."""
    kernel = BOOLEAN_KERNELS[op]
    decode = CODECS[index.config.index.codec][1]

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        docs = kernel(_group_to_terms(pdf, decode))
        return pd.DataFrame({"query_id": pdf["query_id"].iloc[0], "doc_id": docs})

    rows = _query_segments(index, parsed, scan_prune)
    return rows.groupBy("query_id").applyInPandas(
        run, "query_id string, doc_id long"
    )


def live_ranges(rows: DataFrame) -> DataFrame:
    """(query_id, bucket) ranges that can still beat their query's
    threshold — the Catalyst form of wand_data_range.hpp
    compute_live_blocks. ``rows`` is the (segments ⨝ parsed-with-
    thresholds ⨝ bucket) table; a range's score upper bound is the
    sum over query terms of the term's best weighted block-max inside
    the range (micro units, +1 quantization margin exactly like
    _group_to_terms). Queries with NULL thresholds keep every range."""
    if "max_score_q" in rows.columns:  # wand_data_compressed segments
        bm = F.col("max_score_q") / F.lit(255.0) * F.col("term_max_score")
    else:
        bm = F.col("max_score")
    term_ub = rows.groupBy("query_id", "bucket", "term_id").agg(
        (F.max(F.col("weight") * bm) * F.lit(MICRO)
         + F.lit(1.0)).alias("t_ub"),
        F.first("threshold_micro").alias("thr"),
    )
    return (
        term_ub.groupBy("query_id", "bucket")
        .agg(
            F.sum("t_ub").alias("range_ub"),
            F.first("thr").alias("thr"),
        )
        .filter(
            F.col("thr").isNull()
            | (F.col("range_ub") > F.col("thr") - F.lit(float(PRUNE_EPS)))
        )
        .select("query_id", "bucket")
    )


def topk_range(
    index: InvertedIndex,
    parsed: DataFrame,
    algorithm: str = "maxscore",
    k: int = 10,
    blocks_per_range: int | None = None,
    thresholds: DataFrame | None = None,
    scan_prune: bool | None = None,
) -> DataFrame:
    """(query_id, rank, doc_id, score) — doc-range-major execution
    (range_query.hpp: run the algorithm per docID range with a shared
    heap; Spark shape = partial top-k per range + window merge).

    No global doc-length structure exists anywhere: lengths ride
    inside each block's ``len_bytes`` payload, so every (query,
    bucket) task is self-contained. Bucket granularity reuses the
    segment salt buckets (segments never re-shuffle across buckets).

    ``thresholds`` (query_id, threshold_micro — sound lower bounds on
    the k-th final score, disjunctive algorithms only) enables the
    LIVE-BLOCK pruning of wand_data_range.hpp compute_live_blocks:
    a (query, bucket) range whose summed per-term block-max upper
    bound cannot beat the threshold is dropped by a pure Catalyst
    pre-filter BEFORE any kernel task runs — dead ranges cost one
    aggregation row, not a Python group."""
    from pisa_spark.build.segments import blocks_per_bucket

    kernel = RANKED_KERNELS[algorithm]
    decode = CODECS[index.config.index.codec][1]
    cfg = index.config.index
    bucket_stride = blocks_per_bucket(cfg)
    stats = Stats(
        num_docs=float(index.num_docs),
        avg_len=float(index.avg_len),
        k1=index.config.bm25.k1,
        b=index.config.bm25.b,
        quantized=bool(index.config.index.quantize_bits),
    )

    if thresholds is not None and algorithm not in DISJUNCTIVE_ALGORITHMS:
        raise ValueError(
            f"threshold bootstrapping is unsound for conjunctive "
            f"algorithm {algorithm!r}"
        )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        terms = _group_to_terms(pdf, decode)
        kk = int(pdf["k"].iloc[0]) if "k" in pdf else k
        init = 0.0
        if "threshold_micro" in pdf and pd.notna(pdf["threshold_micro"].iloc[0]):
            init = float(pdf["threshold_micro"].iloc[0]) - PRUNE_EPS
        docs, scores = kernel(terms, kk, stats, init_threshold=init)
        return pd.DataFrame(
            {
                "query_id": pdf["query_id"].iloc[0],
                "doc_id": docs,
                "score": scores,
            }
        )

    if thresholds is not None:
        parsed = parsed.join(F.broadcast(thresholds), "query_id", "left")
    rows = _query_segments(index, parsed, scan_prune).withColumn(
        "bucket", (F.col("block_id") / F.lit(bucket_stride)).cast("long")
    )
    if thresholds is not None:
        # no broadcast hint: at 10^12 docs the live set can be large;
        # the join keys match the following groupBy, so the shuffle is
        # shared (AQE broadcasts small live sets on its own)
        rows = rows.join(live_ranges(rows), ["query_id", "bucket"])
    partial = rows.groupBy("query_id", "bucket").applyInPandas(
        run, "query_id string, doc_id long, score double"
    )
    return _merge_range_partials(partial, parsed, k)


def _merge_range_partials(
    partial: DataFrame, parsed: DataFrame, k: int
) -> DataFrame:
    """Shared heap merge for range execution (range_query.hpp's single
    heap across ranges, in window form): rank the per-bucket partial
    top-k rows per query and cap at the query's k."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    merged = partial.withColumn("rank", F.row_number().over(w))
    if "k" in parsed.columns:
        # Per-query k parity with topk_search: each bucket's partial
        # already honored the query's own k, so the merge must cap at
        # the same per-query value (the arg k is only the no-column
        # fallback). Query-count-sized side -> broadcast.
        qk = parsed.select("query_id", F.col("k").alias("merge_k")).distinct()
        merged = merged.join(F.broadcast(qk), "query_id").filter(
            F.col("rank") <= F.col("merge_k")
        )
    else:
        merged = merged.filter(F.col("rank") <= k)
    return merged.select(
        "query_id", F.col("rank").cast("int"), "doc_id", "score"
    )


# Working-set cap for the batch-major decoded-block cache: beyond
# this many cached postings per term the cache stops growing (blocks
# decode again per query, exactly as query-major execution). Bounds
# task memory at ~24 bytes/posting regardless of batch composition.
BATCH_CACHE_MAX_POSTINGS = 1 << 22

# Row cap under which topk_range_batch's (batch x bucket) query-
# replication table keeps its broadcast hint; it grows linearly with
# the corpus (n_buckets = docs / salt_bucket_docs), and the repo rule
# is hints on known-small sides only — above the cap the planner
# decides.
RANGE_BB_BROADCAST_ROWS = 1 << 20


def _build_batch_protos(left: pd.DataFrame, decode):
    """(protos, base_bm) for one cogroup's distinct term segment rows
    — the per-batch TermPostings prototypes both batch-major executors
    (topk_search_batch, topk_range_batch) share: weight-neutral bounds
    (weight rebound per query via dataclasses.replace), a shared
    per-term decoded-block cache, CappedBlockCache beyond the
    working-set cap."""
    protos: dict[int, TermPostings] = {}
    base_bm: dict[int, np.ndarray] = {}
    for term_id, g in left.groupby("term_id", sort=True):
        g = g.sort_values("block_id")
        tmax = float(g["term_max_score"].iloc[0])
        if "max_score_q" in g.columns:
            bm = g["max_score_q"].to_numpy(np.float64) / 255.0 * tmax
        else:
            bm = g["max_score"].to_numpy(np.float64)
        tid = int(term_id)
        base_bm[tid] = bm * MICRO
        cache: dict = {}
        if int(g["count"].sum()) > BATCH_CACHE_MAX_POSTINGS:
            # over-cap term: cache its first cap-worth of blocks
            # (first-come) instead of disabling caching — see
            # kernels.CappedBlockCache
            cache = CappedBlockCache(BATCH_CACHE_MAX_POSTINGS)
        protos[tid] = TermPostings(
            term_id=tid,
            df=float(g["df"].iloc[0]),
            weight=1.0,
            max_score=tmax * MICRO + 1.0,
            block_max_doc=g["max_doc_id"].to_numpy(np.uint64),
            block_max_score=base_bm[tid] + 1.0,
            block_count=g["count"].to_numpy(np.int64),
            doc_payloads=[bytes(x) for x in g["doc_bytes"]],
            tf_payloads=[bytes(x) for x in g["tf_bytes"]],
            len_payloads=[bytes(x) for x in g["len_bytes"]],
            decode=decode,
            block_cache=cache,
        )
    return protos, base_bm


def _walk_batch_queries(right: pd.DataFrame, protos, base_bm, kernel, stats):
    """Column-array walk over a batch's (query-sorted) parsed rows —
    no per-query pandas groupby/iterrows. Yields (query_id, docs,
    scores) per query: protos rebound to the query's weights (shared
    payload/caches), threshold bootstrap honored, per-query k from
    the mandatory k column, idf caches shared back into the protos."""
    from dataclasses import replace

    r = right.sort_values("query_id", kind="stable")
    q_ids = r["query_id"].to_numpy()
    t_ids = r["term_id"].to_numpy()
    weights = r["weight"].to_numpy(np.float64)
    ks = r["k"].to_numpy()
    thr = (
        r["threshold_micro"].to_numpy(np.float64)
        if "threshold_micro" in r
        else None
    )
    i, n_rows = 0, len(r)
    while i < n_rows:
        j = i
        terms = []
        while j < n_rows and q_ids[j] == q_ids[i]:
            proto = protos.get(int(t_ids[j]))
            if proto is not None:
                w = float(weights[j])
                terms.append(replace(
                    proto,
                    weight=w,
                    max_score=w * (proto.max_score - 1.0) + 1.0,
                    block_max_score=w * base_bm[proto.term_id] + 1.0,
                ))
            j += 1
        init = 0.0
        if thr is not None and not np.isnan(thr[i]):
            init = float(thr[i]) - PRUNE_EPS
        docs, scores = kernel(terms, int(ks[i]), stats, init_threshold=init)
        for tp in terms:  # idf grows once, shared thereafter
            if tp.idf_cache is not None:
                protos[tp.term_id].idf_cache = tp.idf_cache
        yield q_ids[i], docs, scores
        i = j


def topk_search_batch(
    index: InvertedIndex,
    parsed: DataFrame,
    algorithm: str = "block_max_maxscore",
    k: int = 10,
    thresholds: DataFrame | None = None,
    batches: int | None = None,
    scan_prune: bool | None = None,
) -> DataFrame:
    """(query_id, rank, doc_id, score) — BATCH-major execution.

    Query-major `topk_search` ships each query's term lists to its
    own task: a term shared by Q queries is Arrow-transferred and
    block-decoded Q times. This variant hashes queries into
    ``batches`` groups and cogroups (distinct term segments per
    batch) with (the batch's query table): every term's list crosses
    the wire ONCE per batch, and a shared per-term block cache
    (TermPostings.block_cache) decodes each block at most once per
    batch. Same kernels, same results — per-query weight/bound
    fields are rebuilt per query (cheap per-block arrays), while the
    decoded payloads and the weight-independent idf cache are shared.

    This is the amortized shape a production workload wants (the
    reference amortizes the same way through the OS page cache on a
    resident index, tools/queries.cpp batch loop); query-major stays
    the low-latency path. Parallelism = ``batches`` tasks; per-task
    working set = the batch's distinct lists (same head-term caveat
    as topk_search — use topk_range for beyond-task-size lists), with
    cache growth capped at BATCH_CACHE_MAX_POSTINGS postings/term.

    ``batches`` defaults to 2x the cluster's default parallelism —
    the sharing/parallelism sweet spot measured in BENCH.md (at 3200
    queries, sf0.1: 1x par = 3.7x over query-major but the largest
    per-task frames; 2x = 2.9x; 4x = 2.3x; AQE-uncoalesced 16x =
    1.2x). Fewer batches share more but each task's distinct-term
    frame grows; 2x keeps working sets half the size of 1x and
    smooths hash-collision stragglers across two waves. Both cogroup
    sides are explicitly ``repartition(batches, batch_id)`` — the
    count is then exempt from AQE coalescing, which otherwise merges
    these byte-light, CPU-heavy Python groups onto a fraction of the
    cores (measured: 512 batches coalesced to 10 tasks).
    """
    kernel = RANKED_KERNELS[algorithm]
    decode = CODECS[index.config.index.codec][1]
    stats = Stats(
        num_docs=float(index.num_docs),
        avg_len=float(index.avg_len),
        k1=index.config.bm25.k1,
        b=index.config.bm25.b,
        quantized=bool(index.config.index.quantize_bits),
    )
    if thresholds is not None:
        if algorithm not in DISJUNCTIVE_ALGORITHMS:
            raise ValueError(
                f"threshold bootstrapping is unsound for conjunctive "
                f"algorithm {algorithm!r}: the cached k-th single-term "
                f"score can exceed the intersection's k-th score"
            )
        parsed = parsed.join(F.broadcast(thresholds), "query_id", "left")

    # Parity with topk_search: a parsed frame without a per-query k
    # column falls back to the k argument (query-major reads it
    # row-wise inside the UDF; here the column must exist before the
    # cogroup ships it).
    if "k" not in parsed.columns:
        parsed = parsed.withColumn("k", F.lit(int(k)))

    if batches is None:
        batches = 2 * index.segments.sparkSession.sparkContext.defaultParallelism
    batch_expr = F.pmod(F.xxhash64("query_id"), F.lit(batches)).cast("int")
    # Explicit repartition(batches) on BOTH cogroup sides: the
    # cogroup's required hash distribution on batch_id is already
    # satisfied, so no extra shuffle is planned — and the
    # user-specified partition count is exempt from AQE coalescing,
    # which otherwise merges these byte-light but CPU-heavy Python
    # groups onto a fraction of the cores (measured: AQE coalesced
    # 512 batches to 10 tasks; pinning restored full parallelism).
    pq = parsed.withColumn("batch_id", batch_expr).repartition(
        batches, "batch_id"
    )
    # Segments side: DISTINCT terms per batch (this dedup is the whole
    # point) joined with term stats, then broadcast into the segment
    # scan — segments still never shuffle and are never broadcast.
    # batch_id is recomputed from `parsed` (not projected off `pq`) so
    # the cogroup's two sides carry distinct attribute ids.
    bt = parsed.select(batch_expr.alias("batch_id"), "term_id").distinct()
    rows = _factored_segment_rows(index, parsed, bt, scan_prune)

    def run(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        # left: the batch's distinct term segment rows (+ term stats);
        # right: the batch's parsed queries (query_id, k, term_id,
        # weight[, threshold_micro]). Shared proto build + query walk
        # (_build_batch_protos/_walk_batch_queries); one output frame.
        protos, base_bm = _build_batch_protos(left, decode)
        out_q: list = []
        out_d: list = []
        out_s: list = []
        out_n: list = []
        for qid, docs, scores in _walk_batch_queries(
            right, protos, base_bm, kernel, stats
        ):
            out_q.append(qid)
            out_d.append(docs)
            out_s.append(scores)
            out_n.append(len(docs))
        if not out_q:
            return pd.DataFrame(
                {"query_id": pd.Series(dtype=object),
                 "rank": pd.Series(dtype=np.int32),
                 "doc_id": pd.Series(dtype=np.int64),
                 "score": pd.Series(dtype=np.float64)}
            )
        counts = np.asarray(out_n)
        return pd.DataFrame(
            {
                "query_id": np.repeat(np.asarray(out_q, dtype=object), counts),
                "rank": np.concatenate(
                    [np.arange(1, c + 1, dtype=np.int32) for c in out_n]
                ),
                "doc_id": np.concatenate(out_d) if out_d else np.empty(0, np.int64),
                "score": np.concatenate(out_s) if out_s else np.empty(0),
            }
        )

    schema = "query_id string, rank int, doc_id long, score double"
    rows = rows.repartition(batches, "batch_id")  # AQE-coalesce exempt
    return rows.groupBy("batch_id").cogroup(pq.groupBy("batch_id")).applyInPandas(
        lambda left, right: run(left, right), schema
    )


def topk_range_batch(
    index: InvertedIndex,
    parsed: DataFrame,
    algorithm: str = "maxscore",
    k: int = 10,
    thresholds: DataFrame | None = None,
    batches: int | None = None,
    scan_prune: bool | None = None,
) -> DataFrame:
    """(query_id, rank, doc_id, score) — BATCH-major RANGE execution.

    ``topk_range`` ships each (query, docID-bucket) group its own copy
    of the bucket's term blocks: a term shared by Q queries is
    Arrow-transferred and block-decoded Q times per bucket — the same
    per-query payload duplication topk_search_batch removes for the
    query-major path (reference analogue: range_query.hpp's shared
    per-range state amortized across the tools/queries.cpp batch loop
    via the resident index). This variant cogroups on
    (batch_id, bucket): LEFT = the batch's DISTINCT terms' blocks
    within the bucket (each list crosses the wire once per batch per
    bucket, decoded at most once via the shared per-term block cache);
    RIGHT = the batch's parsed queries replicated per live bucket
    (fixed-width metadata rows only — payload bytes never replicate).
    Kernels then run per query over the bucket-local protos exactly as
    topk_range's per-group kernel would, and the partial top-k rows
    merge through the same shared-heap window — results are identical
    by construction.

    Scale shape: parallelism = batches x buckets tasks; per-task
    working set = the batch's distinct lists WITHIN ONE BUCKET, so the
    head-term caveat of topk_search_batch does not apply — no task
    ever sees a full posting list, same as topk_range. ``batches``
    defaults to ceil(defaultParallelism / bucket-count): buckets
    already provide the parallelism axis at scale (batches -> 1, full
    sharing per bucket), while small corpora (few buckets) keep the
    cores busy via query batching.

    ``thresholds`` enables the same Catalyst live-range pre-filter as
    topk_range (wand_data_range.hpp compute_live_blocks): the
    (query, bucket) live set prunes the replicated query side, and its
    per-batch projection prunes dead buckets off the segment side
    before any payload ships.
    """
    import math

    from pisa_spark.build.segments import blocks_per_bucket

    kernel = RANKED_KERNELS[algorithm]
    decode = CODECS[index.config.index.codec][1]
    cfg = index.config.index
    bucket_stride = blocks_per_bucket(cfg)
    stats = Stats(
        num_docs=float(index.num_docs),
        avg_len=float(index.avg_len),
        k1=index.config.bm25.k1,
        b=index.config.bm25.b,
        quantized=bool(index.config.index.quantize_bits),
    )
    if thresholds is not None:
        if algorithm not in DISJUNCTIVE_ALGORITHMS:
            raise ValueError(
                f"threshold bootstrapping is unsound for conjunctive "
                f"algorithm {algorithm!r}"
            )
        parsed = parsed.join(F.broadcast(thresholds), "query_id", "left")
    merge_parsed = parsed  # k-column presence decides the merge cap
    if "k" not in parsed.columns:
        parsed = parsed.withColumn("k", F.lit(int(k)))

    par = index.segments.sparkSession.sparkContext.defaultParallelism
    n_buckets = max(
        1, math.ceil(max(int(index.num_docs), 1) / cfg.salt_bucket_docs)
    )
    if batches is None:
        # Buckets are the parallelism axis at scale (batches -> 1,
        # maximal payload sharing per bucket); small corpora (few
        # buckets) keep the cores busy via query batching. 1x the
        # cores — unlike topk_search_batch's 2x — because each
        # (batch, bucket) group is already bucket-bounded, so the
        # straggler-smoothing second wave buys less than the extra
        # payload copies cost (measured at 100q/sf0.1: 1x par 0.63 s,
        # 2x par 0.87 s).
        batches = max(1, math.ceil(par / n_buckets))
    batch_expr = F.pmod(F.xxhash64("query_id"), F.lit(batches)).cast("int")
    pq = parsed.withColumn("batch_id", batch_expr)
    # Segment side: distinct terms per batch (the dedup that removes
    # the per-query payload copies), bucketed exactly as topk_range.
    bt = parsed.select(batch_expr.alias("batch_id"), "term_id").distinct()
    rows = _factored_segment_rows(index, parsed, bt, scan_prune).withColumn(
        "bucket", (F.col("block_id") / F.lit(bucket_stride)).cast("long")
    )
    if thresholds is not None:
        # Live-range pruning in Catalyst (metadata columns only — the
        # aggregate reads block maxes/weights, so column pruning keeps
        # payload bytes out of this pass): the per-(query, bucket)
        # live set filters the replicated query side; its per-batch
        # bucket projection filters the payload-carrying segment side.
        qmeta = _query_segments(index, parsed, scan_prune).withColumn(
            "bucket", (F.col("block_id") / F.lit(bucket_stride)).cast("long")
        )
        live = live_ranges(qmeta).localCheckpoint()
        live_b = (
            live.join(pq.select("query_id", "batch_id").distinct(), "query_id")
            .select("batch_id", "bucket")
            .distinct()
        )
        rows = rows.join(live_b, ["batch_id", "bucket"])
        # inner join on query_id adds the query's live buckets — the
        # replication step for this path, restricted to live ranges
        pq = pq.join(live, ["query_id"])
    else:
        # Replicate the batch's queries to every bucket: a pure
        # driver-side (batches x n_buckets) literal table — NO segment
        # pass (a data-derived distinct(batch, bucket) costs a full
        # workload-metadata aggregation per call; measured ~0.2 s of
        # the bench job). Sound because this engine's doc ids are
        # DENSE by construction (build/ids.assign_global_ids;
        # incremental generations stack contiguous offsets), so every
        # real bucket < ceil(num_docs / salt_bucket_docs); the kernel
        # below still guards loudly against a bucket outside the
        # range (left rows with no replicated queries) rather than
        # ever dropping results silently.
        spark = index.segments.sparkSession
        bb = spark.range(int(batches)).select(
            F.col("id").cast("int").alias("batch_id")
        ).crossJoin(
            spark.range(int(n_buckets)).select(F.col("id").alias("bucket"))
        )
        # Broadcast hint only while the replication table is known
        # small (repo rule: hints on counted-small sides only). At
        # 10^12 docs n_buckets ~ 10^6 and the table grows linearly
        # with the corpus — beyond the cap the hint comes off and the
        # planner (AQE) chooses; the join itself stays the same.
        if batches * n_buckets <= RANGE_BB_BROADCAST_ROWS:
            bb = F.broadcast(bb)
        pq = pq.join(bb, "batch_id")

    def run(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        # left: the (batch, bucket)'s distinct term blocks (+ stats);
        # right: the batch's parsed queries for this bucket. Shared
        # proto build + query walk (_build_batch_protos/
        # _walk_batch_queries); output is UNranked partials for the
        # window merge.
        if len(left) and not len(right):
            # Every real bucket must have received the batch's query
            # replica (see the bb construction above). Fail loudly —
            # returning empty here would silently drop this bucket's
            # docs from the top-k.
            raise RuntimeError(
                "topk_range_batch: segment bucket "
                f"{int(left['bucket'].iloc[0]) if 'bucket' in left else '?'} "
                "outside the replicated query range — non-dense doc ids?"
            )
        protos, base_bm = _build_batch_protos(left, decode)
        out_q: list = []
        out_d: list = []
        out_s: list = []
        for qid, docs, scores in _walk_batch_queries(
            right, protos, base_bm, kernel, stats
        ):
            if len(docs):
                out_q.append(np.repeat(qid, len(docs)))
                out_d.append(docs)
                out_s.append(scores)
        if not out_q:
            return pd.DataFrame(
                {"query_id": pd.Series(dtype=object),
                 "doc_id": pd.Series(dtype=np.int64),
                 "score": pd.Series(dtype=np.float64)}
            )
        return pd.DataFrame(
            {
                "query_id": np.concatenate(out_q),
                "doc_id": np.concatenate(out_d),
                "score": np.concatenate(out_s),
            }
        )

    # Pinned partition count (AQE-coalesce exempt, same rationale as
    # topk_search_batch): ~one (batch, bucket) group per partition up
    # to 4x the cores — beyond that, groups within a partition run
    # sequentially inside one task, which is the right shape when
    # buckets vastly outnumber cores (10^12-doc corpora).
    n_parts = int(max(batches, min(batches * n_buckets, 4 * par)))
    rows = rows.repartition(n_parts, "batch_id", "bucket")
    pq = pq.repartition(n_parts, "batch_id", "bucket")
    partial = (
        rows.groupBy("batch_id", "bucket")
        .cogroup(pq.groupBy("batch_id", "bucket"))
        .applyInPandas(
            lambda left, right: run(left, right),
            "query_id string, doc_id long, score double",
        )
    )
    return _merge_range_partials(partial, merge_parsed, k)
