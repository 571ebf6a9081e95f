"""Recursive graph bisection docID reordering (BP).

Reference parity: ``recursive_graph_bisection.hpp:160-340`` (Dhulipala
et al., "Compressing Graphs and Indexes with Recursive Graph
Bisection", KDD 2016), the reference's ``reorder-docids
--recursive-graph-bisection``. Minimizes the log-gap cost of the
inverted index (evaluate_collection_ordering / ``log_gap_cost`` gate
entry is the objective this optimizes).

Algorithm, level by level (this is the reference's recursion unrolled
breadth-first — every tree node at one depth processes in the same
Spark job, which is exactly the parallelism the reference gets from
TBB, minus the shared-memory coupling):

  1. inside every node (``label``), docs sort by doc_id and split at
     the median into sides L/R (document_range::split);
  2. ``iterations`` times (process_partition): per-term side degrees,
     per-doc move gains via the expb formula
     (compute_move_gains_caching), sort each side by gain desc, and
     swap the r-th best L doc with the r-th best R doc while the
     pair's combined gain is positive (swap(), whose early break
     equals filtering on the non-increasing pair-gain sum);
  3. children become labels 2l and 2l+1; recurse until ``depth``.

Gain formula (bp::expb decoded from its SSE lanes):

    expb(l1, l2, d1, d2) = d1*l1 - d1*log2(d1+1) + d2*l2 - d2*log2(d2+1)
    term_gain = expb(log2 n_from, log2 n_to, fd, td)
              - expb(log2 n_from, log2 n_to, fd-1, td+1)

computed here as native Catalyst LOG2 arithmetic (the reference uses
a 4096-entry lookup approximation; we use exact log2 — same algorithm,
slightly different tie decisions).

Everything is DataFrame-native: degrees = one groupBy, gains = one
join + aggregation, swaps = two windows. No driver-side state, no
Python in the loop; per level the working set re-materializes via an
eager localCheckpoint to keep the plan flat. Cost: O(depth *
iterations) shuffles over the forward index — BP is an expensive
offline job in the reference too (hours on large corpora).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _expb(l1: str, l2: str, d1: str, d2: str) -> str:
    return (
        f"({d1}) * {l1} - ({d1}) * LOG2(({d1}) + 1.0D)"
        f" + ({d2}) * {l2} - ({d2}) * LOG2(({d2}) + 1.0D)"
    )


def recursive_graph_bisection(
    docs: DataFrame,
    depth: int = 6,
    iterations: int = 8,
) -> DataFrame:
    """docs(doc_id, terms) -> (doc_id, new_doc_id): BP ordering.

    ``depth`` levels of bisection (reference default is
    ceil(log2(n)) - 5), ``iterations`` swap rounds per node
    (reference default 20; gains converge much earlier on small
    nodes)."""
    d = docs.select("doc_id", "terms").withColumn(
        "label", F.lit(0).cast("long")
    )
    for _level in range(depth):
        # split each node at the median of docID order (split())
        w = Window.partitionBy("label").orderBy("doc_id")
        sizes = d.groupBy("label").agg(F.count("*").alias("n_node"))
        d = (
            d.withColumn("rn", F.row_number().over(w))
            .join(sizes, "label")
            .withColumn(
                "side",
                (F.col("rn") > F.floor(F.col("n_node") / 2)).cast("int"),
            )
            .drop("rn", "n_node")
        )
        for _it in range(iterations):
            ex = d.select(
                "label", "side", "doc_id", F.explode("terms").alias("term")
            )
            deg = ex.groupBy("label", "term").agg(
                F.sum(F.when(F.col("side") == 0, 1).otherwise(0)).alias("dl"),
                F.sum(F.when(F.col("side") == 1, 1).otherwise(0)).alias("dr"),
            )
            ns = d.groupBy("label").agg(
                F.sum(F.when(F.col("side") == 0, 1).otherwise(0)).alias("n0"),
                F.sum(F.when(F.col("side") == 1, 1).otherwise(0)).alias("n1"),
            )
            fd = "CASE WHEN side = 0 THEN dl ELSE dr END"
            td = "CASE WHEN side = 0 THEN dr ELSE dl END"
            lf = "LOG2(CASE WHEN side = 0 THEN n0 ELSE n1 END + 1e-9D)"
            lt = "LOG2(CASE WHEN side = 0 THEN n1 ELSE n0 END + 1e-9D)"
            tg = (
                f"({_expb(lf, lt, fd, td)})"
                f" - ({_expb(lf, lt, f'({fd}) - 1', f'({td}) + 1')})"
            )
            gains = (
                ex.join(deg, ["label", "term"])
                .join(ns, "label")
                .withColumn("tg", F.expr(tg))
                .groupBy("label", "side", "doc_id")
                .agg(F.sum("tg").alias("gain"))
            )
            d = d.join(
                gains.select("doc_id", "gain"), "doc_id", "left"
            ).fillna(0.0, ["gain"])
            # rank by gain desc inside (label, side); pair rank r of L
            # with rank r of R; both sides' ranked gains are
            # non-increasing, so "swap while sum > 0" == filter on the
            # pair's gain sum — computed with ONE window over
            # (label, r) (the pair has exactly 2 rows) instead of a
            # split + self-join, so the gains plan evaluates once
            wg = Window.partitionBy("label", "side").orderBy(
                F.col("gain").desc(), F.col("doc_id").asc()
            )
            wp = Window.partitionBy("label", "r")
            d = (
                d.withColumn("r", F.row_number().over(wg))
                .withColumn("pair_sum", F.sum("gain").over(wp))
                .withColumn("pair_cnt", F.count("*").over(wp))
                .withColumn(
                    "side",
                    F.when(
                        (F.col("pair_cnt") == 2) & (F.col("pair_sum") > 0),
                        1 - F.col("side"),
                    ).otherwise(F.col("side")),
                )
                .drop("r", "gain", "pair_sum", "pair_cnt")
            )
            # flatten the plan EVERY round — without a checkpoint the
            # per-iteration joins stack into an exponentially growing
            # logical plan
            d = d.localCheckpoint(eager=True)
        d = d.withColumn(
            "label", F.col("label") * 2 + F.col("side")
        ).drop("side")

    # final ordering: leaves in label order, docID order inside a leaf
    # (the reference sorts leaf ranges back to identifier order)
    sizes = d.groupBy("label").agg(F.count("*").alias("cnt"))
    # distributed dense rank over (label, doc_id) without a global
    # single-partition window: offsets per label (labels are tiny:
    # 2^depth rows), broadcast back
    offs = sizes.withColumn(
        "off",
        F.sum("cnt").over(
            Window.orderBy("label").rowsBetween(
                Window.unboundedPreceding, -1
            )
        ),
    ).fillna(0, ["off"]).select("label", "off")
    wl = Window.partitionBy("label").orderBy("doc_id")
    return (
        d.join(F.broadcast(offs), "label")
        .withColumn("new_doc_id", F.col("off") + F.row_number().over(wl) - 1)
        .select("doc_id", "new_doc_id")
    )
