"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All implementations live in ``pisa_spark``; this module is a thin
registry. See SURVEY.md §2 for the operator inventory each entry
maps to.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: top-k BM25 via block-max WAND over compressed
    postings (the engine's signature path, BASELINE.json north_star) —
    tokenize -> invert -> salted block segments -> BMW kernel — over
    sf0.001 documents. The exhaustive ranked_or SQL oracle reproduces
    this top-k rank-identically (gate entry ``bmw_topk``)."""
    from pisa_spark.gated import gated_queries

    return gated_queries()["bmw_topk"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pisa_spark.gated import gated_queries

    q = dict(gated_queries())
    try:
        from pisa_spark.datapipe.entries import datapipe_queries

        q.update(datapipe_queries())
    except ImportError:
        pass
    # The driver records the FIRST 50 entries (dict order); the
    # registry is consolidated to exactly 50 so every component
    # family lands a driver CORRECTNESS row (gated/entries.py).
    return q


def oracle_sql() -> dict[str, str]:
    from pisa_spark.gated import gated_oracle_sql

    o = dict(gated_oracle_sql())
    try:
        from pisa_spark.datapipe.entries import datapipe_oracle_sql

        o.update(datapipe_oracle_sql())
    except ImportError:
        pass
    return o
