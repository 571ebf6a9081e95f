"""Query parsing: raw query text / term arrays -> (term_id, weight).

Mirrors the reference term processing (src/query/queries.cpp:28-47,
query/term_processor.hpp:19-63): analyze with the SAME analyzer as
the build, look terms up in the lexicon (OOV terms dropped), and
collapse duplicates into weights (query_freqs,
src/query/queries.cpp:107-120 — term weight = multiplicity).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from pisa_spark.analysis import analyze_series
from pisa_spark.config import AnalyzerConfig


def parse_queries(
    queries: DataFrame,
    lexicon: DataFrame,
    cfg: AnalyzerConfig | None = None,
    pre_tokenized: bool = False,
) -> DataFrame:
    """queries(query_id, text|terms, k) -> (query_id, k, term_id, weight).

    ``pre_tokenized`` skips the analyzer when ``terms`` is already an
    array column (the reference's parse_query_ids fixture path,
    src/query/queries.cpp:49-68 — int-ID queries).
    """
    cfg = cfg or AnalyzerConfig()
    if not pre_tokenized and "text" in queries.columns:

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for b in batches:
                yield pd.DataFrame(
                    {
                        "query_id": b["query_id"],
                        "terms": analyze_series(
                            b["text"],
                            tokenizer=cfg.tokenizer,
                            lowercase=cfg.lowercase,
                            stopwords=cfg.stopwords,
                            stemmer=cfg.stemmer,
                        ),
                        "k": b["k"],
                    }
                )

        queries = queries.mapInPandas(
            kernel, "query_id string, terms array<string>, k int"
        )

    exploded = queries.select(
        "query_id", "k", F.explode("terms").alias("term")
    )
    weighted = exploded.groupBy("query_id", "k", "term").agg(
        F.count("*").cast("double").alias("weight")
    )
    # Broadcast the QUERY side (bounded by the workload), never the
    # lexicon (vocabulary-sized): the lexicon table is scanned once
    # with a broadcast-hash join and OOV terms drop out via the inner
    # join, exactly the term_processor lookup semantics.
    return lexicon.select("term", "term_id").join(
        F.broadcast(weighted), "term"
    ).select("query_id", "k", "term_id", "weight")
