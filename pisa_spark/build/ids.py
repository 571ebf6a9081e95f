"""Scalable deterministic dense-ID assignment.

The reference assigns docIDs by input order and recommends URL
ordering for web corpora (``reorder_by_feature``,
reorder_docids.hpp:240-266); term IDs are the rank of the
lexicographically sorted term set (forward_index_builder.cpp:85-133).
Both are "row_number over a global sort" — which in naive Spark
(``row_number() over (order by col)``) collapses to ONE partition and
dies at scale.

``assign_global_ids`` is the scalable idiom, all JVM-native:
range-repartition (distributed sort), count rows per partition
(cheap agg), broadcast the per-partition offsets back, and number
with ``offset[pid] + row_number() over (partition by pid order by
col)`` — a PARTITIONED window, so no single-reducer stage and no
Python anywhere. Deterministic because range boundaries only affect
WHERE a row is numbered, not its global rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def assign_global_ids(
    df: DataFrame,
    order_col: str,
    id_col: str = "id",
    num_partitions: int | None = None,
    count_out: dict | None = None,
    sum_col: str | None = None,
    forbid_null: bool = False,
) -> DataFrame:
    """Add ``id_col`` = 0-based dense rank of ``order_col`` (must be
    unique) without a single-partition window.

    ``count_out``: pass a dict to receive ``{"n_rows": total}`` for
    free — the per-partition offset collect below already knows the
    total, so callers that need the row count (e.g. the lexicon
    broadcast gate) don't have to run a separate count job.
    ``sum_col``: additionally receive ``{"sum": SUM(sum_col)}`` from
    the SAME collect — one aggregate column on a partition-count-sized
    result, so e.g. collection length (sum of doc lengths) costs no
    extra pass over the frame (IncrementalIndexer's per-batch delta
    numbering uses this; the batch builds assign ids over a bare url
    projection and aggregate stats separately).

    ``forbid_null=True`` raises if any ``order_col`` value is NULL
    (checked from the same offset collect, no extra job). A NULL key
    violates the uniqueness contract and — for callers that JOIN the
    ids back on the key (forward._with_assigned_ids) — would silently
    drop the row in the inner join instead of failing."""
    # Default to the input's partition count (parallelism-independent:
    # the same input produces the same layout at any core count);
    # defaultParallelism only as a floor for degenerate 1-part inputs.
    spark = df.sparkSession
    parts = num_partitions or max(
        df.rdd.getNumPartitions(),
        spark.sparkContext.defaultParallelism,
    )
    # Pinning the physical partitioning is load-bearing: the offsets
    # collected below must describe the SAME partitioning the numbering
    # job reads — otherwise the range partitioner re-samples on the
    # second job and boundaries can shift (observed: duplicate ids).
    # localCheckpoint(eager=True) materializes it NOW and, unlike
    # persist() (whose CacheManager entry survives driver GC), is
    # released by the ContextCleaner once this DataFrame goes out of
    # scope — so per-micro-batch callers (IncrementalIndexer) don't
    # accumulate cached partitions forever.
    ranged = df.repartitionByRange(parts, F.col(order_col)).withColumn(
        "__pid", F.spark_partition_id()
    ).localCheckpoint(eager=True)
    aggs = [F.count("*").alias("__n")]
    if sum_col is not None:
        aggs.append(F.sum(sum_col).alias("__s"))
    if forbid_null:
        # count(col) skips NULLs, count(*) does not — the difference
        # is the null-key count, from the same partition-sized result
        aggs.append(F.count(F.col(order_col)).alias("__nn"))
    rows = ranged.groupBy("__pid").agg(*aggs).collect()  # tiny
    if forbid_null:
        nulls = sum(int(r["__n"]) - int(r["__nn"]) for r in rows)
        if nulls:
            raise ValueError(
                f"{nulls} NULL {order_col!r} value(s) in id-assignment "
                f"input: {order_col} is the unique key and must be "
                "non-null"
            )
    counts = {r["__pid"]: r["__n"] for r in rows}
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    if count_out is not None:
        count_out["n_rows"] = acc
        if sum_col is not None:
            count_out["sum"] = sum(int(r["__s"] or 0) for r in rows)
    off_df = spark.createDataFrame(offsets, schema="__pid int, __off long")

    w = Window.partitionBy("__pid").orderBy(order_col)
    return (
        ranged.join(F.broadcast(off_df), "__pid")
        .withColumn(id_col, F.col("__off") + F.row_number().over(w) - 1)
        .drop("__pid", "__off")
    )
