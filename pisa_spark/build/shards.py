"""Sharding: partition the corpus into independent index shards.

The reference's ``partition_fwd_index`` (src/sharding.cpp:136-268)
splits the forward index by a doc->shard mapping and re-lexes each
shard (detect live terms, remap term IDs); the ``shards`` meta-tool
(tools/shards.cpp:49-76) then runs invert/compress/wand per shard.
Taily statistics (taily_stats.hpp:24-169) rank shards per query.

Spark shape: a shard is a partition-set keyed by ``shard_id``; the
whole "loop over shards" collapses into ONE job per stage with
``shard_id`` prepended to every key — the shuffle co-locates each
shard's data, so per-shard lexicons/stats come out of a single
groupBy instead of a driver loop. Assignment is deterministic
(``doc_id % n`` mirrors the reference's round-robin-ish random
mapping, src/sharding.cpp:105-126, but reproducible for the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pisa_spark.functions.scoring import bm25_sql_expr, micro_sql


def assign_shards(docs: DataFrame, n_shards: int = 4) -> DataFrame:
    """docs(doc_id, ...) -> + shard_id (deterministic doc_id % n)."""
    return docs.withColumn(
        "shard_id", (F.col("doc_id") % n_shards).cast("int")
    )


def shard_mapping_from_files(spark, shard_files) -> DataFrame:
    """(url, shard_id) from reference-format shard title files —
    ``partition_fwd_index --shard-files`` input (sharding.cpp:56-103):
    one document title per line, shard id = the file's position in the
    list, and the FIRST file claiming a title wins (min shard_id here —
    files are processed in order, so the earliest claim has the
    smallest id). The mapping stays a distributed DataFrame end to end
    (``spark.read.text`` + union + groupBy) — at web scale the title
    list is corpus-sized, never driver state."""
    import os

    out = None
    for sid, path in enumerate(shard_files):
        df = spark.read.text(os.path.abspath(str(path))).select(
            F.col("value").alias("url"),
            F.lit(int(sid)).cast("int").alias("shard_id"),
        )
        out = df if out is None else out.unionByName(df)
    if out is None:
        raise ValueError("shard_mapping_from_files: no shard files given")
    return (
        out.filter(F.length("url") > 0)
        .groupBy("url")
        .agg(F.min("shard_id").cast("int").alias("shard_id"))
    )


def assign_shards_from_mapping(docs: DataFrame, mapping: DataFrame) -> DataFrame:
    """docs(url, ...) -> + shard_id from an explicit (url, shard_id)
    mapping — the reference's title-file path (sharding.cpp:136-268 via
    mapping_from_files). Documents absent from the mapping fall to
    shard 0 with the same semantics as the reference's warning path
    (sharding.cpp:78-84). No broadcast hint: the mapping is
    corpus-sized at scale; AQE picks the strategy."""
    has = mapping.select("url", F.col("shard_id").alias("_map_shard"))
    return (
        docs.join(has, "url", "left")
        .withColumn(
            "shard_id",
            F.coalesce(F.col("_map_shard"), F.lit(0)).cast("int"),
        )
        .drop("_map_shard")
    )


def shard_stats(docs: DataFrame, n_shards: int = 4) -> DataFrame:
    """(shard_id, num_docs, collection_len, vocab_size): per-shard
    corpus statistics — the reference's per-shard .sizes/.termlex
    summary, one aggregation instead of a shard loop."""
    sharded = assign_shards(docs, n_shards)
    term_docs = sharded.select(
        "shard_id", F.explode("terms").alias("term"), "doc_id", "doc_len"
    )
    per_doc = sharded.groupBy("shard_id").agg(
        F.count("*").alias("num_docs"),
        F.sum("doc_len").cast("long").alias("collection_len"),
    )
    vocab = (
        term_docs.select("shard_id", "term").distinct()
        .groupBy("shard_id").agg(F.count("*").alias("vocab_size"))
    )
    return per_doc.join(vocab, "shard_id").select(
        "shard_id", "num_docs", "collection_len", "vocab_size"
    )


def shard_term_stats(
    scored: DataFrame, num_docs: int, avg_len: float, n_shards: int = 4,
    k1: float = 0.9, b: float = 0.4,
) -> DataFrame:
    """Taily per-(shard, term) score moments (taily_stats.hpp:24-169):
    df, sum and sum-of-squares of micro-quantized BM25 — enough to fit
    Taily's gamma distribution for shard ranking; exact integers.

    ``scored``: (term_id, doc_id, tf, doc_len, df) from
    segments.scored_postings. One aggregation over all shards at once.
    """
    bm25 = bm25_sql_expr(
        tf="tf", df="df", doc_len="doc_len",
        num_docs=str(float(num_docs)), avg_len=str(float(avg_len)),
        k1=k1, b=b,
    )
    m = micro_sql(bm25)
    # Accumulator widths: micro <= ~5.3e7 for any unweighted BM25
    # (idf <= ln(1e12)*1.9 ~ 52 score units), so the PER-ELEMENT
    # micro*micro product (<= ~2.8e15) always fits int64 — but the
    # SUMS do not: SUM(micro^2) wraps int64 at only ~25k postings of
    # a strong term, and SUM(micro) at ~1.7e11 df. Both accumulate in
    # exact DECIMAL(38,0) (Spark and DuckDB sum decimals exactly; the
    # identical SQL text runs in both dialects) and emit DOUBLE — one
    # deterministic rounding of the same exact integer in every
    # engine, so cross-engine value equality is preserved while the
    # moments stay correct at any df. Taily consumes them as floats
    # anyway (E/Var in query/taily.py).
    return (
        scored.withColumn("shard_id", (F.col("doc_id") % n_shards).cast("int"))
        .withColumn("micro", F.expr(m))
        .groupBy("shard_id", "term_id")
        .agg(
            F.count("*").cast("long").alias("df"),
            F.sum(F.expr("CAST(micro AS DECIMAL(38,0))"))
            .cast("double").alias("sum_micro"),
            F.sum(F.expr("CAST(micro * micro AS DECIMAL(38,0))"))
            .cast("double").alias("sum_micro_sq"),
        )
    )


