"""Driver benchmark: ONE JSON line with end-to-end timings at sf0.1.

Protocol (BASELINE.md "Target protocol"): build the inverted index
over the documents corpus (throughput = docs/sec), then run the
headline query workloads — exhaustive SQL oracle (pure Catalyst),
BMW / MaxScore / WAND kernels (applyInPandas), and the
training-data-pipeline jobs — each timed after one untimed warmup of
the Spark session (mirrors the reference's 1-warmup protocol,
tools/queries.cpp:74-90).

Env:
  SPARK_GRAFT_SF_DIR  input dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[N] cores (default 32)

Output: {"metric": "e2e_sec", "value": <total query sec>, "unit":
"sec", "queries": {...}, "sf": ..., "build_sec": ...,
"build_docs_per_sec": ..., "cores": N}
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("pisa-spark-bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pisa_spark.config import AnalyzerConfig, EngineConfig, IndexConfig
    from pisa_spark.corpus import pages_from_documents
    from pisa_spark.index import build_index

    pages = pages_from_documents(spark, sf_dir)
    n_docs = pages.count()  # warms the session + pins the input size

    cfg = EngineConfig(
        analyzer=AnalyzerConfig(tokenizer="whitespace"),
        index=IndexConfig(salt_bucket_docs=1 << 20),
    )

    t0 = time.perf_counter()
    index = build_index(spark, pages, cfg)
    # Force every artifact the queries need (segments + meta + lexicon).
    index.segments.persist().count()
    index.term_meta.persist().count()
    build_sec = time.perf_counter() - t0

    queries: dict[str, float] = {}

    def timed(name: str, fn) -> None:
        t = time.perf_counter()
        fn()
        queries[name] = round(time.perf_counter() - t, 4)

    # --- SQL path: exhaustive ranked_or over the documents view (Catalyst).
    from pisa_spark.gated.sql import DIALECT_SPARK, core_sql_entries

    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    sql_entries = core_sql_entries(DIALECT_SPARK)
    timed("ranked_or_sql", lambda: spark.sql(sql_entries["ranked_or_topk"]).count())

    # --- Kernel path: synthetic 100-query workload against the index.
    import pandas as pd

    from pisa_spark.corpus import synth_queries
    from pisa_spark.query.executor import topk_range, topk_search
    from pisa_spark.query.parser import parse_queries

    # Query terms drawn from the documents vocabulary (Zipf-free small
    # vocab): reuse lexicon terms cyclically for a 100-query batch.
    terms = [r["term"] for r in index.lexicon.limit(400).collect()]
    rows = []
    for qi in range(100):
        n = 1 + qi % 5
        rows.append(
            (f"q{qi:04d}", [terms[(qi * 7 + j * 13) % len(terms)] for j in range(n)], 10)
        )
    qdf = spark.createDataFrame(
        pd.DataFrame(rows, columns=["query_id", "terms", "k"]),
        schema="query_id string, terms array<string>, k int",
    )
    parsed = parse_queries(qdf, index.lexicon, pre_tokenized=True).persist()
    parsed.count()

    for algo, key in (
        ("block_max_wand", "bmw_100q"),
        ("block_max_maxscore", "bmm_100q"),
        ("maxscore", "maxscore_100q"),
        ("wand", "wand_100q"),
        ("ranked_or", "taat_100q"),
    ):
        timed(key, lambda a=algo: topk_search(index, parsed, algorithm=a, k=10).count())
    timed(
        "range_maxscore_100q",
        lambda: topk_range(index, parsed, algorithm="maxscore", k=10).count(),
    )

    # Threshold-bootstrapped BMW (kth_threshold pipeline end-to-end).
    from pisa_spark.query.thresholds import estimate_thresholds, kth_score_cache

    cache = kth_score_cache(index, k=10).persist()
    cache.count()
    est = estimate_thresholds(parsed, cache).persist()
    est.count()
    timed(
        "bmw_boot_100q",
        lambda: topk_search(
            index, parsed, algorithm="block_max_wand", k=10, thresholds=est
        ).count(),
    )

    # --- Training-data pipeline jobs (datapipe module), if present.
    try:
        from pisa_spark.datapipe.entries import bench_jobs

        for name, job in bench_jobs().items():
            timed(name, lambda j=job: j(spark, sf_dir))
    except ImportError:
        pass

    total = round(sum(queries.values()), 4)
    print(
        json.dumps(
            {
                "metric": "e2e_sec",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": sf,
                "build_sec": round(build_sec, 4),
                "build_docs_per_sec": round(n_docs / build_sec, 2),
                "n_docs": n_docs,
                "cores": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
