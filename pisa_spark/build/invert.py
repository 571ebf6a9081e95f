"""Invert stage: docs -> lexicon, postings, doc sizes, collection stats.

The heart of the reference build (src/invert.cpp). Mapping:

- ``map_to_postings`` (invert.cpp:45-56)  -> ``explode(terms)``
- par sort by (term, doc) (invert.cpp:109) -> shuffle on the groupBy keys
- run-length tf count (invert.cpp:270-296) -> ``groupBy(term, doc).count()``
  — Spark's partial (map-side) + final hash aggregation IS the
  reference's per-batch invert + ``merge_batches`` k-way combine
  (invert.cpp:167-238); no serial merge stage remains.
- ``.sizes`` (invert.cpp:77-83,120-137)    -> ``size(terms)`` projection
- lexicon (forward_index_builder.cpp:85-133) -> distinct terms, dense
  rank by sorted order (assign_global_ids), df from distinct
  (term, doc) pairs.

Scale notes: postings shuffle hash-partitions on (term_id, doc_id) so
Zipf head terms spread across reducers — the skew problem only
appears later when collecting per-term lists, which segments.py
handles with salt buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pisa_spark.build.ids import assign_global_ids


def build_lexicon(docs: DataFrame) -> DataFrame:
    """docs(doc_id, terms) -> lexicon(term, term_id, df).

    term_id = dense rank of lexicographically sorted terms (parity
    with the reference's sorted global term space); df = number of
    distinct docs containing the term.
    """
    term_docs = docs.select(
        F.explode("terms").alias("term"), F.col("doc_id")
    ).distinct()
    df_counts = term_docs.groupBy("term").agg(F.count("*").alias("df"))
    lex = assign_global_ids(df_counts, "term", "term_id")
    return lex.select("term", "term_id", "df")


def maybe_broadcast(
    df: DataFrame,
    known_rows: int | None,
    broadcast_threshold: int,
) -> DataFrame:
    """Broadcast hint ONLY when the row count is known to be under the
    threshold. ``F.broadcast`` is a hard hint AQE honors, so hinting a
    web-scale vocabulary (billions of distinct tokens) would OOM every
    executor; with no hint Catalyst/AQE picks broadcast vs sort-merge
    from runtime statistics, which is the safe default when the size
    is unknown."""
    if known_rows is not None and broadcast_threshold and known_rows < broadcast_threshold:
        return F.broadcast(df)
    return df


def build_postings(
    docs: DataFrame,
    lexicon: DataFrame,
    lexicon_size: int | None = None,
    broadcast_threshold: int = 10_000_000,
) -> DataFrame:
    """docs ⨝ lexicon -> postings(term_id, doc_id, tf).

    The lexicon join is broadcast only when the vocabulary is known
    to be small (``lexicon_size`` under ``broadcast_threshold`` —
    build_index passes the counted size); otherwise a plain join lets
    AQE choose. tf via hash aggregation with map-side partial combine.
    """
    exploded = docs.select(F.col("doc_id"), F.explode("terms").alias("term"))
    lex_side = maybe_broadcast(
        lexicon.select("term", "term_id"), lexicon_size, broadcast_threshold
    )
    joined = exploded.join(lex_side, "term")
    return (
        joined.groupBy("term_id", "doc_id")
        .agg(F.count("*").cast("int").alias("tf"))
    )


def build_doc_sizes(docs: DataFrame) -> DataFrame:
    """docs -> doc_sizes(doc_id, doc_len) (the ``.sizes`` sequence)."""
    return docs.select("doc_id", F.col("doc_len").cast("int").alias("doc_len"))


def collection_stats(doc_sizes: DataFrame) -> DataFrame:
    """Global stats for BM25: num_docs, avg_len, collection_len
    (wand_data.hpp:38-117 global pass)."""
    return doc_sizes.agg(
        F.count("*").alias("num_docs"),
        F.avg("doc_len").alias("avg_len"),
        F.sum("doc_len").cast("long").alias("collection_len"),
    )
