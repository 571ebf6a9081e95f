"""Incremental indexing: append-only generations + Structured Streaming.

The reference has no streaming path (SURVEY §1.3: its
"compress_index_streaming" is out-of-core batch) — continuously
arriving crawl data means a full rebuild. This module adds the
Spark-native incremental story:

- ``IncrementalIndexer.add_generation(pages)``: append a batch of new
  pages as generation ``g``. Delta-proportional work:
  * new docs get docIDs AFTER all existing ones (url-ordered within
    the generation) — docID monotonicity keeps every existing block
    valid and makes new postings land in fresh tail salt buckets;
  * the lexicon grows stably: existing terms keep their term_id, new
    terms get ids after the previous max (sorted-order among
    themselves) — no remap of existing postings ever;
  * postings are appended for the new docs only;
  * segments are re-encoded ONLY for terms occurring in the new
    generation (their df and tails changed); untouched terms keep
    their encoded blocks as-is.
- Stale-bound repair: BM25 scores of untouched terms still shift
  because num_docs/avg_len moved (df is unchanged for them). Exact
  per-posting scores are always recomputed at query time from fresh
  stats, so only the block-max UPPER BOUNDS could go stale — and they
  can go stale UPWARD: idf = ln((N−df+.5)/(df+.5)) grows with N, and
  a larger avg_len shrinks the length norm. Kept blocks therefore get
  ``max_score`` multiplied by the sound inflation factor
  ``idf_ratio * max(1, avg_new/avg_old)``:
  * ``idf_ratio = idf(df, N_new)/idf(df, N_old)`` — exact per-term
    column op;
  * norm: score = idf·tf/(tf + k1(1−b) + k1·b·dl/avg); as avg grows
    the denominator shrinks, inflating scores by at most
    ``avg_new/avg_old`` (the dl→∞ limit); for shrinking avg the
    factor is 1. Bounds stay upper bounds; kernels stay exact.
- ``stream_pages``/``run_stream_indexing``: Structured Streaming
  wrapper — ``readStream`` on a pages directory, ``foreachBatch``
  feeding ``add_generation``, ``availableNow`` trigger for catch-up
  runs (a continuous trigger works identically on a cluster).

Query-side nothing changes: ``InvertedIndex`` artifacts come from the
stored union (same schemas as the batch build), so every kernel and
gate oracle applies to an incrementally-built index unchanged.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F

from pisa_spark.build import (
    build_doc_sizes, build_segments, build_term_meta, collection_stats,
    tokenize_pages,
)
from pisa_spark.build.ids import assign_global_ids
from pisa_spark.build.segments import scored_postings
from pisa_spark.config import EngineConfig
from pisa_spark.index import InvertedIndex


class IncrementalIndexer:
    def __init__(self, spark: SparkSession, out_dir: str,
                 config: EngineConfig | None = None):
        self.spark = spark
        self.out = Path(out_dir)
        self.config = config or EngineConfig()
        if self.config.index.compress_blockmax:
            # the stale-bound repair rescales kept blocks' f32 maxima;
            # u8-relative maxima would need the (changing) term max at
            # repair time — reject loudly rather than corrupt bounds
            raise ValueError(
                "IncrementalIndexer does not support "
                "compress_blockmax=True (kept-block bound repair needs "
                "f32 block maxima); build compressed indexes in batch"
            )
        self.out.mkdir(parents=True, exist_ok=True)

    # ------------------------------------------------------------ storage

    def _path(self, name: str) -> str:
        return str(self.out / name)

    def _exists(self, name: str) -> bool:
        p = self.out / name
        return p.exists() and any(p.glob("*.parquet"))

    def _read(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self._path(name))

    # ------------------------------------------------------------- update

    def add_generation(self, pages: DataFrame) -> int:
        """Index a new batch of pages; returns the generation number."""
        first = not self._exists("docs")
        if first:
            gen, doc_base, term_base, n_old, avg_old = 0, 0, 0, 0, 0.0
        else:
            old_docs = self._read("docs")
            gen = old_docs.agg(F.max("generation")).collect()[0][0] + 1
            doc_base = old_docs.agg(F.max("doc_id")).collect()[0][0] + 1
            old_lex = self._read("lexicon")
            term_base = old_lex.agg(F.max("term_id")).collect()[0][0] + 1
            st = collection_stats(
                old_docs.select("doc_id", F.col("doc_len"))
            ).collect()[0]
            n_old, avg_old = int(st["num_docs"]), float(st["avg_len"])

        toks = tokenize_pages(pages, self.config.analyzer, assign_doc_ids=False)
        new_docs = assign_global_ids(toks, "url", "doc_id").withColumn(
            "doc_id", F.col("doc_id") + F.lit(doc_base)
        ).withColumn("generation", F.lit(gen))
        new_docs.write.mode("append").parquet(self._path("docs"))

        # Stable lexicon growth: unseen terms get ids after term_base.
        new_terms = (
            self._read("docs").filter(F.col("generation") == gen)
            .select(F.explode("terms").alias("term")).distinct()
        )
        if not first:
            new_terms = new_terms.join(
                self._read("lexicon").select("term"), "term", "left_anti"
            )
        appended_lex = assign_global_ids(new_terms, "term", "term_id").withColumn(
            "term_id", F.col("term_id") + F.lit(term_base)
        )
        appended_lex.write.mode("append").parquet(self._path("lexicon_ids"))

        # Postings for the new generation only (df joins come later —
        # postings are (term_id, doc_id, tf), df-free by design).
        lex_ids = self._read("lexicon_ids")
        gen_docs = self._read("docs").filter(F.col("generation") == gen)
        exploded = gen_docs.select("doc_id", F.explode("terms").alias("term"))
        # No broadcast hint: lex_ids is the FULL vocabulary (grows with
        # the crawl); AQE picks broadcast vs sort-merge from the
        # parquet size statistics.
        new_postings = (
            exploded.join(lex_ids, "term")
            .groupBy("term_id", "doc_id")
            .agg(F.count("*").cast("int").alias("tf"))
            .withColumn("generation", F.lit(gen))
        )
        new_postings.write.mode("append").parquet(self._path("postings"))

        # Refresh df + stats, then re-encode ONLY affected terms.
        self._refresh(gen, first, n_old, avg_old)
        return gen

    def _refresh(self, gen: int, first: bool, n_old: int, avg_old: float) -> None:
        docs = self._read("docs")
        postings = self._read("postings")
        lex_ids = self._read("lexicon_ids")

        dfc = postings.groupBy("term_id").agg(
            F.countDistinct("doc_id").cast("long").alias("df")
        )
        lexicon = lex_ids.join(dfc, "term_id", "left").fillna(0, ["df"])
        lexicon.write.mode("overwrite").parquet(self._path("lexicon"))

        doc_sizes = build_doc_sizes(docs.select("doc_id", "terms", "doc_len"))
        st = collection_stats(doc_sizes).collect()[0]
        n_new, avg_new = int(st["num_docs"]), float(st["avg_len"] or 0.0)

        affected = postings.filter(F.col("generation") == gen).select(
            "term_id"
        ).distinct()
        scored = scored_postings(
            postings.join(affected, "term_id").select("term_id", "doc_id", "tf"),
            doc_sizes, self._read("lexicon"), n_new, avg_new,
        )
        new_segments = build_segments(
            scored, n_new, avg_new, self.config.index, self.config.bm25
        ).withColumn("segment_gen", F.lit(gen))

        if first or not self._exists("segments"):
            segments = new_segments
        else:
            # Keep untouched terms' blocks; repair their max_score
            # upper bounds for the stats shift (sound inflation).
            kept = self._read("segments").join(affected, "term_id", "left_anti")
            # per-term idf ratio: idf(df, n_new)/idf(df, n_old); join df
            # (vocabulary-sized side — no hard broadcast hint, AQE
            # decides from parquet stats)
            kept = kept.join(
                self._read("lexicon").select("term_id", "df"), "term_id"
            )
            half, floor_ = "0.5D", "1e-6D"
            idf = (
                f"GREATEST({floor_}, LN(({{n}}) - df + {half}) - LN(df + {half}))"
            )
            # ln((N-df+.5)/(df+.5)) = ln(N-df+.5) - ln(df+.5)
            ratio = (
                f"({idf.format(n=float(n_new))}) / ({idf.format(n=float(n_old))})"
            )
            norm_factor = max(1.0, (avg_new / avg_old) if avg_old else 1.0)
            # The f32 cast rounds to NEAREST and can land ~1 ulp below
            # the true inflated bound, eating the +1-micro kernel
            # margin. Multiplying the double by (1 + 2^-23) first
            # guarantees the rounded f32 is >= the exact product
            # (rel. rounding error <= 2^-24) — the repair-path twin of
            # segments._round_up_f32, keeping bounds one-sided.
            kept = kept.withColumn(
                "max_score",
                (
                    F.col("max_score")
                    * F.expr(ratio)
                    * F.lit(norm_factor)
                    * F.lit(1.0 + 2.0**-23)
                ).cast("float"),
            ).drop("df")
            segments = kept.unionByName(new_segments)

        segments.write.mode("overwrite").parquet(self._path("segments_tmp"))
        self.spark.read.parquet(self._path("segments_tmp")).write.mode(
            "overwrite"
        ).parquet(self._path("segments"))
        import shutil

        shutil.rmtree(self._path("segments_tmp"), ignore_errors=True)

        term_meta = build_term_meta(
            scored_postings(
                postings.select("term_id", "doc_id", "tf"), doc_sizes,
                self._read("lexicon"), n_new, avg_new,
            ),
            n_new, avg_new, self.config.bm25,
        )
        term_meta.write.mode("overwrite").parquet(self._path("term_meta"))
        doc_sizes.write.mode("overwrite").parquet(self._path("doc_sizes"))

    # -------------------------------------------------------------- query

    def index(self) -> InvertedIndex:
        docs = self._read("docs")
        st = collection_stats(self._read("doc_sizes")).collect()[0]
        return InvertedIndex(
            lexicon=self._read("lexicon"),
            docmap=docs.select("doc_id", "url"),
            doc_sizes=self._read("doc_sizes"),
            postings=self._read("postings").select("term_id", "doc_id", "tf"),
            segments=self._read("segments"),
            term_meta=self._read("term_meta"),
            num_docs=int(st["num_docs"]),
            avg_len=float(st["avg_len"] or 0.0),
            collection_len=int(st["collection_len"] or 0),
            config=self.config,
        )


# ------------------------------------------------------------- streaming

PAGES_DDL = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def stream_pages(spark: SparkSession, input_dir: str) -> DataFrame:
    """readStream over a directory of pages parquet files (a landing
    zone fed by the crawler)."""
    return (
        spark.readStream.schema(PAGES_DDL)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )


def run_stream_indexing(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    config: EngineConfig | None = None,
    available_now: bool = True,
):
    """Micro-batch incremental indexing: each foreachBatch becomes one
    index generation. availableNow=True drains what's there and stops
    (catch-up/cron mode); False runs continuously."""
    indexer = IncrementalIndexer(spark, index_dir, config)

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        indexer.add_generation(batch_df)

    writer = (
        stream_pages(spark, input_dir)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return indexer
    return writer.start(), indexer
