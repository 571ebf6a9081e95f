"""Calibrate kernels.ADAPTIVE_TAAT_MAX_POSTINGS.

Measures per-query min latency (1 warmup + 3 timed, the bench
protocol) of exhaustive TAAT vs the pruned kernels over the sf0.1
workload, bucketed by the query's TOTAL candidate postings (sum of
term dfs) — the exact statistic choose_algorithm reads. Prints the
per-bucket means and the empirical crossover so the constant in
query/kernels.py can be pinned to measured data.

Run solo (shared-host VM — see BENCH.md measurement discipline):
    python scripts/calibrate_adaptive.py [sf_dir] [n_queries]
"""

from __future__ import annotations

import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 400

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("calibrate-adaptive")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pisa_spark.codecs import CODECS
    from pisa_spark.config import AnalyzerConfig, EngineConfig, IndexConfig
    from pisa_spark.corpus import pages_from_documents
    from pisa_spark.index import build_index
    from pisa_spark.query.executor import _group_to_terms, _query_segments
    from pisa_spark.query.kernels import (
        Stats, block_max_maxscore_kernel, maxscore_kernel, ranked_or_kernel,
    )
    from pisa_spark.query.parser import parse_queries

    cfg = EngineConfig(
        analyzer=AnalyzerConfig(tokenizer="whitespace"),
        index=IndexConfig(salt_bucket_docs=1 << 20),
    )
    index = build_index(spark, pages_from_documents(spark, sf_dir), cfg)
    index.segments.persist().count()
    index.term_meta.persist().count()

    # Workload spanning the df spectrum: singles of every lexicon
    # term stratum + multi-term mixes, so buckets are populated from
    # tiny (rare single term) to huge (several head terms).
    terms = [
        (r["term"], r["df"])
        for r in index.lexicon.select("term", "df").collect()
    ]
    terms.sort(key=lambda x: x[1])
    rows = []
    for qi in range(n_queries):
        n = 1 + qi % 5
        stride = max(1, len(terms) // n_queries)
        base = (qi * stride) % len(terms)
        picks = [terms[(base + j * 37) % len(terms)][0] for j in range(n)]
        rows.append((f"c{qi:04d}", picks, 10))
    qdf = spark.createDataFrame(
        pd.DataFrame(rows, columns=["query_id", "terms", "k"]),
        schema="query_id string, terms array<string>, k int",
    )
    parsed = parse_queries(qdf, index.lexicon, pre_tokenized=True)
    pdf = _query_segments(index, parsed).toPandas()

    decode = CODECS[cfg.index.codec][1]
    stats = Stats(
        num_docs=float(index.num_docs), avg_len=float(index.avg_len),
        k1=cfg.bm25.k1, b=cfg.bm25.b, quantized=False,
    )
    kernels = {
        "taat": ranked_or_kernel,
        "bmm": block_max_maxscore_kernel,
        "maxscore": maxscore_kernel,
    }
    recs = []
    for _, g in pdf.groupby("query_id"):
        tps = _group_to_terms(g, decode)
        total_df = sum(int(t.df) for t in tps)
        rec = {"total_df": total_df, "n_terms": len(tps)}
        for name, kern in kernels.items():
            kern(tps, 10, stats)  # warmup
            best = float("inf")
            for _ in range(3):
                t = time.perf_counter()
                kern(tps, 10, stats)
                best = min(best, time.perf_counter() - t)
            rec[name] = best * 1e6
        recs.append(rec)
    df = pd.DataFrame(recs)
    edges = [0, 256, 512, 1024, 2048, 4096, 8192, 16384, 1 << 30]
    df["bucket"] = pd.cut(df["total_df"], edges)
    by = df.groupby("bucket", observed=True)[["taat", "bmm", "maxscore"]].mean()
    cnt = df.groupby("bucket", observed=True).size()
    print(pd.concat([by.round(1), cnt.rename("n")], axis=1).to_string())
    win = by["taat"] < by[["bmm", "maxscore"]].min(axis=1)
    print("\nTAAT wins buckets:", [str(b) for b in by.index[win]])
    spark.stop()


if __name__ == "__main__":
    main()
