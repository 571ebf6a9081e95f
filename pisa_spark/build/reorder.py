"""Document reordering (reorder_docids.hpp): docID permutations that
trade shuffle work for posting-gap compression.

- ``reorder_by_feature`` (URL sort, reorder_docids.hpp:240-266) is the
  engine's DEFAULT docID assignment (build/ids.assign_global_ids) — the
  reference's recommended cheap approximation of BP for web corpora.
- ``random_mapping``/``reorder_from_mapping`` (:225-237, :268-290)
  re-permute an existing index: join the mapping, remap doc_id,
  re-sort, re-encode segments. One shuffle; no per-list loop.
- ``log_gap_cost`` (tools/evaluate_collection_ordering.cpp) scores an
  ordering: sum of log2(docID gaps) over all posting lists — the
  objective BP minimizes.

The random permutation is md5-rank based (deterministic, engine-
agnostic) instead of an RNG, so oracles and retries agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from pisa_spark.build.ids import assign_global_ids


def random_mapping(docs: DataFrame) -> DataFrame:
    """(doc_id, new_doc_id): deterministic pseudo-random permutation —
    dense rank of md5(doc_id) (reference create_random_mapping,
    src/sharding.cpp:105-126, made reproducible)."""
    keyed = docs.select(
        "doc_id", F.md5(F.col("doc_id").cast("string")).alias("__k")
    )
    ranked = assign_global_ids(keyed, "__k", "new_doc_id")
    return ranked.select("doc_id", "new_doc_id")


def reorder_postings(postings: DataFrame, mapping: DataFrame) -> DataFrame:
    """postings(term_id, doc_id, tf) remapped through (doc_id ->
    new_doc_id); downstream segment build re-sorts within salt
    buckets, so no global sort is needed here."""
    return (
        postings.join(mapping, "doc_id")
        .select("term_id", F.col("new_doc_id").alias("doc_id"), "tf")
    )


def log_gap_cost(postings: DataFrame,
                 bucket_docs: int = 1 << 16) -> DataFrame:
    """(cost_micro, n_gaps): Σ log2(gap) over docID-sorted posting
    lists, micro-quantized per gap (evaluate_collection_ordering).

    The lag runs over (term_id, docID-bucket) windows — a bare
    per-term window would hold a Zipf-head term's ENTIRE posting list
    in one task (the segments salt-bucket rule applied to the
    evaluation metric). Cross-bucket gaps are recovered exactly from
    per-bucket (min, max) boundaries: one consecutive-nonempty-bucket
    lag per term over at most n_docs/bucket_docs tiny rows. The two
    gap sets partition the full consecutive-pair set, so the result
    is identical to the single-window form for any bucket_docs."""
    wb = Window.partitionBy("term_id", "__b").orderBy("doc_id")
    bucketed = postings.select(
        "term_id", "doc_id",
        (F.col("doc_id") - (F.col("doc_id") % bucket_docs)).alias("__b"),
    )
    in_gaps = bucketed.select(
        "term_id",
        (F.col("doc_id") - F.lag("doc_id").over(wb)).alias("gap"),
    )
    bounds = bucketed.groupBy("term_id", "__b").agg(
        F.min("doc_id").alias("__lo"), F.max("doc_id").alias("__hi")
    )
    wt = Window.partitionBy("term_id").orderBy("__b")
    cross_gaps = bounds.select(
        "term_id",
        (F.col("__lo") - F.lag("__hi").over(wt)).alias("gap"),
    )
    gaps = in_gaps.unionByName(cross_gaps).filter(
        F.col("gap").isNotNull() & (F.col("gap") > 0)
    )
    per_gap = F.expr(
        "CAST(FLOOR(LOG2(CAST(gap AS DOUBLE)) * CAST(1000000.0 AS DOUBLE)"
        " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
    )
    return gaps.select(per_gap.alias("c")).agg(
        F.sum("c").cast("long").alias("cost_micro"),
        F.count("*").cast("long").alias("n_gaps"),
    )
