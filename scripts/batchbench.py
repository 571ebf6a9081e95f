"""Batch-major vs query-major executor throughput (BENCH.md evidence).

Builds the sf0.1 index once, synthesises a large repeated-term query
workload (the regime batch-major execution targets: many queries
sharing a head-heavy vocabulary), and times
executor.topk_search (query-major) vs executor.topk_search_batch
(batch-major, shared payload transfer + decoded-block cache) as
best-of-N after one untimed warmup each (scripts/scaling.py protocol
— shared-host VM, see BENCH.md).

Usage: python scripts/batchbench.py [n_queries ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_REPEATS (default 3)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeats = int(os.environ.get("SPARK_GRAFT_REPEATS", "3"))
    sizes = [int(a) for a in sys.argv[1:]] or [3200]

    import pandas as pd
    from pyspark.sql import SparkSession

    from pisa_spark.config import AnalyzerConfig, EngineConfig, IndexConfig
    from pisa_spark.corpus import pages_from_documents
    from pisa_spark.index import build_index
    from pisa_spark.query.executor import topk_search, topk_search_batch
    from pisa_spark.query.parser import parse_queries

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("pisa-spark-batchbench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    pages = pages_from_documents(spark, sf_dir)
    cfg = EngineConfig(
        analyzer=AnalyzerConfig(tokenizer="whitespace"),
        index=IndexConfig(salt_bucket_docs=1 << 20),
    )
    index = build_index(spark, pages, cfg)
    index.segments.persist().count()
    index.term_meta.persist().count()

    # orderBy before limit: a bare limit() takes whatever rows the
    # plan yields first, so the benchmarked workload would differ
    # across partition layouts / runs
    terms = [r["term"]
             for r in index.lexicon.orderBy("term_id").limit(400).collect()]
    results = {}
    for nq in sizes:
        rows = []
        for qi in range(nq):
            n = 1 + qi % 5
            rows.append(
                (
                    f"q{qi:05d}",
                    [terms[(qi * 7 + j * 13) % len(terms)] for j in range(n)],
                    10,
                )
            )
        qdf = spark.createDataFrame(
            pd.DataFrame(rows, columns=["query_id", "terms", "k"]),
            schema="query_id string, terms array<string>, k int",
        )
        parsed = parse_queries(qdf, index.lexicon, pre_tokenized=True).persist()
        parsed.count()

        def timed(fn) -> float:
            fn()  # warmup
            best = float("inf")
            for _ in range(max(1, repeats)):
                t = time.perf_counter()
                fn()
                best = min(best, time.perf_counter() - t)
            return round(best, 3)

        qm = timed(
            lambda: topk_search(
                index, parsed, algorithm="block_max_maxscore", k=10
            ).count()
        )
        bm = timed(
            lambda: topk_search_batch(
                index, parsed, algorithm="block_max_maxscore", k=10
            ).count()
        )
        results[nq] = {
            "query_major_s": qm,
            "batch_major_s": bm,
            "speedup": round(qm / bm, 2),
            "qm_qps": round(nq / qm, 1),
            "bm_qps": round(nq / bm, 1),
        }
        parsed.unpersist()
        print(json.dumps({str(nq): results[nq]}), flush=True)

    print(json.dumps({"sf_dir": sf_dir, "cores": cpus, "results": results}))


if __name__ == "__main__":
    main()
