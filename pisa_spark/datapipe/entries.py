"""Driver-gate entries for the training-data pipeline operators.

Every entry pairs an idiomatic Spark job (DataFrame API / pandas
kernels) with a DuckDB oracle that reproduces the result
value-exactly (integer-quantized math throughout — see the module
docstrings). ``dedup_minhash_lsh`` and the indexed ``ann_topk``
methods (IVF cell probing, hyperplane-LSH banding) are approximate
ALGORITHMS, but their oracles implement the identical algorithm, so
agreement is still exact; their recall vs the exhaustive operators
is pinned separately in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pisa_spark.datapipe import dedup, multimodal, similarity, textstats


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pisa_spark.corpus import pages_from_documents

    return pages_from_documents(spark, sf_dir)


# Gate-scale cell cap for the dedup_embedding_cosine entry: at sf0.01
# (500 vecs, 8 cells of ~108-133) it drops the two largest cells, so
# the quadratic-cell guard AND its embedding_dropped_cells audit are
# exercised cross-engine on every driver run (the production default
# MAX_CELL=4096 never engages at gate scale).
GATE_EMB_MAX_CELL = 130


def _embedding_cosine_union(s: SparkSession, d: str) -> DataFrame:
    """Tagged union: near-dup pairs + the dropped-cell audit frame
    (similarity.embedding_dropped_cells), one (kind, a, b, v) row
    shape — same consolidation pattern as boolean_docs/range_topk."""
    from pyspark.sql import functions as F

    emb = _emb(s, d)
    # ONE assignment job shared by the pair path and the audit path
    # (eager localCheckpoint per the repo rule: released by the
    # ContextCleaner, unlike persist()'s CacheManager entry).
    assign = similarity._cell_assignments(
        emb, similarity.N_CENTROIDS, similarity.N_PROBE
    ).localCheckpoint(eager=True)
    pairs = similarity.embedding_dup_pairs(
        emb, max_cell=GATE_EMB_MAX_CELL, assign=assign
    ).select(
        F.lit("pair").alias("kind"),
        F.col("vec_a").cast("long").alias("a"),
        F.col("vec_b").cast("long").alias("b"),
        F.col("cos_micro").cast("long").alias("v"),
    )
    dropped = similarity.embedding_dropped_cells(
        emb, max_cell=GATE_EMB_MAX_CELL, assign=assign
    ).select(
        F.lit("dropped_cell").alias("kind"),
        F.col("cell").cast("long").alias("a"),
        F.col("cell_size").cast("long").alias("b"),
        F.lit(0).cast("long").alias("v"),
    )
    return pairs.unionByName(dropped)


def _ann_union(s: SparkSession, d: str) -> DataFrame:
    """Tagged union of all three ANN paths over one result shape
    (method, q_vec_id, rank, vec_id, cos_micro): 'brute' = exact
    partial-top-k baseline, 'ivf' = coarse-quantizer cell probing,
    'lsh' = hyperplane-band bucketing — each exact-ranked over its
    candidate set (same consolidation pattern as
    segments_decode_check's codec tags)."""
    from pisa_spark.gated.entries import tagged_union

    emb = _emb(s, d)
    return tagged_union(
        "method",
        [
            ("brute", similarity.ann_topk(emb)),
            ("ivf", similarity.ivf_topk(emb)),
            ("lsh", similarity.lsh_topk(emb)),
        ],
        ["q_vec_id", "rank", "vec_id", "cos_micro"],
    )


def _exact_dedup_union(s: SparkSession, d: str) -> DataFrame:
    """Tagged union of both page-identity dedup passes: 'content'
    (text md5) and 'url' (canonicalized URL over the deterministic
    raw-variant synthesis — see dedup.url_variants_sql), one
    (kind, group_key, keeper_doc_id, n_docs) shape."""
    from pyspark.sql import functions as F

    from pisa_spark.gated.entries import tagged_union

    docs = _docs(s, d)
    content = dedup.exact_dedup(docs).select(
        F.col("text_md5").alias("group_key"), "keeper_doc_id", "n_docs"
    )
    pages = docs.select(
        "doc_id", F.expr(dedup.url_variants_sql()).alias("url")
    )
    url = dedup.url_dedup(pages).select(
        F.col("canon_url").alias("group_key"), "keeper_doc_id", "n_docs"
    )
    return tagged_union(
        "kind",
        [("content", content), ("url", url)],
        ["group_key", "keeper_doc_id", "n_docs"],
    )


_SIGNAL_COLS = [
    "n_tokens", "n_types", "ttr_micro", "stop_ratio_micro",
    "mean_tok_len_micro", "quality_micro",
    "top_bigram_frac_micro", "dup_trigram_frac_micro",
    "max_term_frac_micro", "ws_tokens", "bpe_ish_tokens", "n_chars",
]


def _doc_signals(s: SparkSession, d: str) -> DataFrame:
    """The per-doc filter-signals table a training pipeline consumes:
    lexical quality + Gopher-style repetition + token counts, one wide
    row per doc — quality and repetition fused over a single tokenize
    scan (textstats.doc_signals), token_counts joined on doc_id."""
    return (
        textstats.doc_signals(_docs(s, d))
        .select("doc_id", *_SIGNAL_COLS)
    )


def _doc_signals_oracle() -> str:
    cols = ", ".join(_SIGNAL_COLS)
    return f"""SELECT doc_id, {cols}
FROM ({textstats.quality_score_oracle()}) q
JOIN ({textstats.repetition_stats_oracle()}) r USING (doc_id)
JOIN ({textstats.token_counts_oracle()}) t USING (doc_id)"""


def datapipe_queries():
    return {
        "dedup_exact": _exact_dedup_union,
        "dedup_ngram_jaccard": lambda s, d: dedup.ngram_jaccard_pairs(_docs(s, d)),
        "dedup_minhash_lsh": lambda s, d: dedup.minhash_lsh_pairs(_docs(s, d)),
        "dedup_clusters": lambda s, d: dedup.dedup_clusters(_docs(s, d)),
        "dedup_simhash": lambda s, d: dedup.simhash_pairs(_docs(s, d)),
        "dedup_embedding_cosine": _embedding_cosine_union,
        "ann_topk": _ann_union,
        "lang_id": lambda s, d: textstats.lang_id(_docs(s, d)),
        "quality_score": _doc_signals,
        "decontaminate": lambda s, d: dedup.decontaminate(_docs(s, d)),
        "doc_fingerprints": lambda s, d: textstats.doc_fingerprints(_docs(s, d)),
        "mm_blob_meta": lambda s, d: multimodal.blob_meta(_pages(s, d)),
        "mm_frame_sample": lambda s, d: multimodal.frame_sample(_pages(s, d)),
        "mm_decode_stub": lambda s, d: multimodal.decode_blobs(_pages(s, d)),
    }


def datapipe_oracle_sql():
    return {
        "dedup_exact": dedup.exact_dedup_union_oracle(),
        "dedup_ngram_jaccard": dedup.ngram_jaccard_oracle(),
        "dedup_minhash_lsh": dedup.minhash_lsh_oracle(),
        "dedup_clusters": dedup.dedup_clusters_oracle(),
        "dedup_simhash": dedup.simhash_oracle(),
        "dedup_embedding_cosine": similarity.embedding_dup_oracle(
            max_cell=GATE_EMB_MAX_CELL, audit=True
        ),
        "ann_topk": (
            "SELECT 'brute' AS method, q_vec_id, rank, vec_id, cos_micro FROM ("
            + similarity.ann_topk_oracle()
            + ") brute_q\nUNION ALL\n"
            "SELECT 'ivf' AS method, q_vec_id, rank, vec_id, cos_micro FROM ("
            + similarity.ivf_topk_oracle()
            + ") ivf_q\nUNION ALL\n"
            "SELECT 'lsh' AS method, q_vec_id, rank, vec_id, cos_micro FROM ("
            + similarity.lsh_topk_oracle()
            + ") lsh_q"
        ),
        "lang_id": textstats.lang_id_oracle(),
        "quality_score": _doc_signals_oracle(),
        "decontaminate": dedup.decontaminate_oracle(),
        "doc_fingerprints": textstats.doc_fingerprints_oracle(),
        "mm_blob_meta": multimodal.blob_meta_oracle(),
        "mm_frame_sample": multimodal.frame_sample_oracle(),
        # mm_decode_stub: the FAKE decoder's byte-level reduction IS
        # SQL-expressible (hex-dump byte math) — value-exact oracle
        # pinning the plumbing contract; a real pixel decoder would
        # revert this entry to rows-only.
        "mm_decode_stub": multimodal.decode_stub_oracle(),
    }


def bench_jobs():
    """Headline datapipe jobs timed by bench.py (count() forces)."""
    return {
        "dedup_minhash_lsh": lambda s, d: dedup.minhash_lsh_pairs(_docs(s, d)).count(),
        "dedup_simhash": lambda s, d: dedup.simhash_pairs(_docs(s, d)).count(),
        "ann_cosine_topk": lambda s, d: similarity.ann_topk(_emb(s, d)).count(),
        "quality_score": lambda s, d: textstats.quality_score(_docs(s, d)).count(),
    }
