"""Scalable deterministic dense-ID assignment.

The reference assigns docIDs by input order and recommends URL
ordering for web corpora (``reorder_by_feature``,
reorder_docids.hpp:240-266); term IDs are the rank of the
lexicographically sorted term set (forward_index_builder.cpp:85-133).
Both are "row_number over a global sort" — which in naive Spark
(``row_number() over (order by col)``) collapses to ONE partition and
dies at scale.

``assign_global_ids`` is the scalable idiom: range-repartition +
in-partition sort (Spark's distributed sort), count rows per
partition (cheap agg), broadcast the per-partition offsets, then add
``offset[pid] + local_position`` inside ``mapInPandas``. Two jobs, no
single-reducer stage, deterministic because the range boundaries only
affect WHERE a row is numbered, not its global rank.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def assign_global_ids(
    df: DataFrame,
    order_col: str,
    id_col: str = "id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``id_col`` = 0-based dense rank of ``order_col`` (must be
    unique) without a single-partition window."""
    # Default to the input's partition count (parallelism-independent:
    # the same input produces the same layout at any core count);
    # defaultParallelism only as a floor for degenerate 1-part inputs.
    parts = num_partitions or max(
        df.rdd.getNumPartitions(),
        df.sparkSession.sparkContext.defaultParallelism,
    )
    sorted_df = (
        df.repartitionByRange(parts, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("__pid", F.spark_partition_id())
    )
    sorted_df = sorted_df.persist()
    counts = dict(
        sorted_df.groupBy("__pid").count().collect()
    )  # tiny: one row per partition
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in sorted_df.schema.fields
        if f.name != "__pid"
    ) + f", `{id_col}` long"

    def number(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pos = {}
        for b in batches:
            if len(b) == 0:
                continue
            pid = int(b["__pid"].iloc[0])
            start = offsets[pid] + pos.get(pid, 0)
            pos[pid] = pos.get(pid, 0) + len(b)
            out = b.drop(columns="__pid")
            out[id_col] = range(start, start + len(b))
            yield out

    return sorted_df.mapInPandas(number, out_schema)
