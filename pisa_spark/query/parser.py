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


# Reference parse_query_ids separators (src/query/queries.cpp:55 —
# boost::is_any_of over the char SET of "\t, ,\v,\f,\r,\n", which
# includes the comma itself); empty tokens are erased (:58-60).
_ID_SEPARATORS = "[\\t, \\x0b\\f\\r\\n]"


def parse_query_id_lines(lines: DataFrame, k: int = 10) -> DataFrame:
    """Raw query-file lines in int-ID mode -> (query_id, k, term_id,
    weight).

    Mirrors the reference's pre-resolved query path
    (src/query/queries.cpp:14-26 split_query_at_colon, :49-68
    parse_query_ids): an optional ``qid:`` prefix before the FIRST
    colon names the query (an absent id falls back to the input line
    number, the convention the reference's evaluate/queries tools
    apply); the remainder splits on the separator set above, empty
    tokens drop, and every surviving token must parse as an integer
    term id (no lexicon lookup — ids are authoritative). Duplicate
    ids collapse to multiplicity weights exactly as query_freqs does
    for the text path (src/query/queries.cpp:107-120).

    ``lines`` is a DataFrame (line_no bigint, line string); all the
    parsing is native Catalyst (split/filter/explode) — workload
    tables are small, but this also keeps the path usable on a
    billion-query batch.
    """
    has_colon = F.instr("line", ":") > 0
    raw = F.when(
        has_colon, F.expr("substring(line, instr(line, ':') + 1)")
    ).otherwise(F.col("line"))
    qid = F.when(
        has_colon, F.expr("substring(line, 1, instr(line, ':') - 1)")
    ).otherwise(F.col("line_no").cast("string"))
    terms = F.filter(F.split(raw, _ID_SEPARATORS), lambda t: t != "")
    parsed = lines.select(
        qid.alias("query_id"),
        F.lit(k).alias("k"),
        F.explode(terms).alias("tok"),
    ).select(
        # long, not int: lexicon term_id is BIGINT (assign_global_ids),
        # so a valid id >= 2^31 must not be rejected as non-integer.
        "query_id", "k", F.col("tok").try_cast("long").alias("term_id")
    )
    # std::stoi failure is fatal in the reference (:64-66); surface
    # the same contract as a hard error instead of a silent null.
    # Eager localCheckpoint first: the validation count is an action,
    # and without pinning, the returned plan would re-run the whole
    # split/explode parse a second time when consumed — the pin makes
    # validate + aggregate ONE pass over the input (eager
    # localCheckpoint, not persist, per the repo rule).
    parsed = parsed.localCheckpoint(eager=True)
    bad = parsed.where(F.col("term_id").isNull()).limit(1).count()
    if bad:
        raise ValueError("non-integer term id in ID-mode query file")
    return parsed.groupBy("query_id", "k", "term_id").agg(
        F.count("*").cast("double").alias("weight")
    )
