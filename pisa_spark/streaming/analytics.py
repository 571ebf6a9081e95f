"""Streaming event analytics: watermarked windows, session windows,
and a stateful running top-k threshold operator.

The reference engine is batch-only; its workload tooling (AOL query
logs, `tools/queries.cpp` latency protocol) assumes a static file of
queries. Continuously-arriving workloads (crawler fetch events, live
query logs) need the Structured Streaming idioms instead:

- ``windowed_event_volume``: tumbling-window per-type volume/value
  rollup with a watermark for late data. The SAME function serves
  batch frames (``withWatermark`` is a no-op outside streaming), so
  the streaming result is pinned value-exact against the batch plan
  and a DuckDB ``time_bucket`` oracle in tests.
- ``user_sessions``: ``session_window`` gap sessionization per user —
  the standard activity-session feature for training-data pipelines.
- ``running_topk_thresholds``: ``applyInPandasWithState`` keeping a
  per-key top-k value sketch across micro-batches — the ONLINE form
  of the engine's kth-threshold caches (query/thresholds.py): each
  batch updates the state and emits the current k-th best value, so
  a query router can bootstrap WAND/BMW with a fresh threshold
  without rebuilding the cache.

Scale: windows and sessions key on (window/user) — Spark's streaming
state store partitions by key hash, so state is executor-local and
sized by distinct keys per watermark horizon, not by throughput. The
top-k state is k floats per key. Nothing here collects to the driver.

Values ride as micro-quantized integers (functions/scoring.dlit
convention) so cross-engine comparisons are exact.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from pisa_spark.functions.scoring import micro_sql

VALUE_MICRO = micro_sql("value")  # shared dlit-literal quantizer


def windowed_event_volume(events: DataFrame, window: str = "10 minutes",
                          watermark: str = "30 minutes") -> DataFrame:
    """(w_start, w_end, event_type, n_events, value_micro_sum) —
    tumbling-window rollup; watermarked when ``events`` is streaming.

    Late rows older than the watermark are dropped by the state store
    (pinned in tests across an availableNow restart); in batch mode
    the watermark is a no-op and every row aggregates.
    """
    e = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        e.withColumn("value_micro", F.expr(VALUE_MICRO))
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value_micro").alias("value_micro_sum"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type", "n_events", "value_micro_sum",
        )
    )


def user_sessions(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """(user_id, s_start, s_end, n_events, value_micro_sum) — gap
    sessionization via ``session_window`` (merges in the streaming
    state store; batch plan is identical)."""
    e = events.withWatermark("ts", gap) if events.isStreaming else events
    return (
        e.withColumn("value_micro", F.expr(VALUE_MICRO))
        .groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value_micro").alias("value_micro_sum"),
        )
        .select(
            "user_id",
            F.col("s.start").alias("s_start"),
            F.col("s.end").alias("s_end"),
            "n_events", "value_micro_sum",
        )
    )


_TOPK_OUT = "key string, kth_micro long, n_seen long"
_TOPK_STATE = "topk array<long>, n_seen long"


def _topk_update(k: int):
    """Builds the applyInPandasWithState update function: state is the
    running top-k micro values (descending) + total count; each
    micro-batch folds its rows in and emits (key, kth, n_seen)."""

    def update(key: tuple, pdfs: Iterable[pd.DataFrame],
               state: GroupState) -> Iterable[pd.DataFrame]:
        if state.exists:
            topk, n_seen = state.get
            topk = list(topk)
        else:
            topk, n_seen = [], 0
        for pdf in pdfs:
            # NULL event values never enter the sketch or the count —
            # the same skip-null semantics as the windowed SUM
            vals = [int(v) for v in pdf["value_micro"].dropna()]
            n_seen += len(vals)
            topk = sorted(topk + vals, reverse=True)[:k]
        state.update((topk, n_seen))
        # below k observations -> NULL (not a sentinel: any integer,
        # including -1, is a legitimate threshold for negative values)
        kth = topk[k - 1] if len(topk) >= k else None
        yield pd.DataFrame(
            {"key": [key[0]], "kth_micro": [kth], "n_seen": [n_seen]}
        )

    return update


def running_topk_thresholds(events: DataFrame, k: int = 10,
                            key_col: str = "event_type") -> DataFrame:
    """Per-key running k-th-best value over a stream — emits one row
    per key per micro-batch with the threshold AFTER that batch
    (``kth_micro`` is NULL until k non-null values have been seen;
    NULL event values are skipped, matching aggregate-SUM semantics).

    State per key is exactly k longs + a counter; update cost per
    batch is a sort of (k + batch rows per key). Output mode must be
    ``update``/``append`` with ``foreachBatch``/memory sink.
    """
    prepped = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.expr(VALUE_MICRO).alias("value_micro"),
    )
    return prepped.groupBy("key").applyInPandasWithState(
        _topk_update(k),
        outputStructType=_TOPK_OUT,
        stateStructType=_TOPK_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
