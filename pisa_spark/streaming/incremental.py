"""Incremental indexing: append-only generations + Structured Streaming.

The reference has no streaming path (SURVEY §1.3: its
"compress_index_streaming" is out-of-core batch) — continuously
arriving crawl data means a full rebuild. This module adds the
Spark-native incremental story, with DELTA-PROPORTIONAL WRITES per
generation (no stored artifact proportional to the corpus is ever
rewritten):

- ``IncrementalIndexer.add_generation(pages)``: append a batch of new
  pages as generation ``g``:
  * new docs get docIDs AFTER all existing ones (url-ordered within
    the generation) — docID monotonicity keeps every existing block
    valid and makes new postings land in fresh tail salt buckets;
  * the lexicon grows stably: existing terms keep their term_id, new
    terms get ids after the previous max — no remap of existing
    postings ever;
  * ``docs`` / ``postings`` / ``doc_sizes`` are APPENDED (new docs
    only);
  * ``segments`` is APPEND-ONLY, partitioned by ``segment_gen``:
    generation g re-encodes ONLY terms occurring in the new batch
    (their full lists, with fresh stats) into ``segment_gen=g``;
    prior generations' files are never touched. Which encoding is
    CURRENT per term is the ``seg_gen`` column of the lexicon
    (term's latest affected generation); ``index()`` exposes the
    deduplicated view ``segments ⨝ lexicon WHERE segment_gen =
    seg_gen``. Superseded generations are reclaimed by ``compact()``;
  * vocabulary-sized metadata (``lexicon``, ``term_meta``) is updated
    incrementally — df/occurrence_count are ADDED from the delta
    (docID monotonicity means a (term, doc) pair lives in exactly one
    generation), never recounted from all postings; global stats ride
    a single-row ``stats`` file (counts added, never rescanned).
- Stale-bound repair is QUERY-SIDE: BM25 scores of untouched terms
  still shift because num_docs/avg_len moved. Exact per-posting
  scores are always recomputed at query time from fresh stats, so
  only the max-score UPPER BOUNDS could go stale — and they can go
  stale UPWARD: idf = ln((N−df+.5)/(df+.5)) grows with N, and a
  larger avg_len shrinks the length norm. Instead of rewriting stored
  bounds, ``term_meta`` carries a per-term ``bound_factor`` that
  accumulates the sound inflation
  ``idf(df, N_new)/idf(df, N_old) * max(1, avg_new/avg_old)``
  per generation for untouched terms (re-encoded terms reset to 1).
  The executor multiplies both the term max and the block maxes by it
  on the query path (executor._query_segments, which already joins
  term_meta into every query) — bounds stay one-sided, kernels stay
  exact, stored segments stay immutable. The factor only compounds
  for terms never re-touched; ``compact()`` resets it to 1 exactly.
- ``stream_pages``/``run_stream_indexing``: Structured Streaming
  wrapper — ``readStream`` on a pages directory, ``foreachBatch``
  feeding ``add_generation``, ``availableNow`` trigger for catch-up
  runs (a continuous trigger works identically on a cluster).

Query-side nothing else changes: ``InvertedIndex`` artifacts come
from the stored union (same schemas as the batch build), so every
kernel and gate oracle applies to an incrementally-built index
unchanged (gate entry ``incremental_postings``).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F

from pisa_spark.build import (
    build_doc_sizes, build_segments, build_term_meta, tokenize_pages,
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
        # compress_blockmax IS supported: u8 block maxima are relative
        # to the term max AS STORED in term_meta at encode time, and
        # the query-side recovery multiplies term_max * bound_factor
        # (executor._query_segments) — so kept blocks' recovered
        # bounds inflate by exactly the same sound factor as f32
        # bounds, and re-encoded terms reset max+factor together.
        if self.config.index.quantize_bits:
            # impact quantization is relative to the GLOBAL index max
            # at build time; generations built at different maxima
            # would mix incompatible quanta in one index
            raise ValueError(
                "IncrementalIndexer does not support quantize_bits "
                "(impact quanta are relative to a build-time global "
                "max); build quantized indexes in batch"
            )
        self.out.mkdir(parents=True, exist_ok=True)

    # ------------------------------------------------------------ storage

    def _path(self, name: str) -> str:
        return str(self.out / name)

    def _exists(self, name: str) -> bool:
        p = self.out / name
        return p.exists() and any(p.rglob("*.parquet"))

    def _read(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self._path(name))

    def _stats_row(self) -> dict:
        return self._read("stats").collect()[0].asDict()

    # ------------------------------------------------------------- update

    def add_generation(self, pages: DataFrame) -> int:
        """Index a new batch of pages; returns the generation number.

        Per-generation write volume: O(|batch|) postings/docs/sizes +
        O(affected-term lists) segments + O(vocabulary) metadata —
        never O(corpus)."""
        first = not self._exists("stats")
        if first:
            gen, doc_base, term_base = 0, 0, 0
            n_old, len_old, avg_old = 0, 0, 0.0
        else:
            st = self._stats_row()
            gen = int(st["gen"]) + 1
            doc_base = int(st["next_doc_id"])
            term_base = int(st["next_term_id"])
            n_old = int(st["num_docs"])
            len_old = int(st["collection_len"])
            avg_old = (len_old / n_old) if n_old else 0.0

        toks = tokenize_pages(pages, self.config.analyzer, assign_doc_ids=False)
        new_docs = assign_global_ids(toks, "url", "doc_id").withColumn(
            "doc_id", F.col("doc_id") + F.lit(doc_base)
        ).withColumn("generation", F.lit(gen))
        new_docs.write.mode("append").parquet(self._path("docs"))

        # Stable lexicon growth: unseen terms get ids after term_base.
        gen_docs = self._read("docs").filter(F.col("generation") == gen)
        new_terms = gen_docs.select(F.explode("terms").alias("term")).distinct()
        if not first:
            new_terms = new_terms.join(
                self._read("lexicon_ids").select("term"), "term", "left_anti"
            )
        appended_lex = assign_global_ids(new_terms, "term", "term_id").withColumn(
            "term_id", F.col("term_id") + F.lit(term_base)
        )
        appended_lex.write.mode("append").parquet(self._path("lexicon_ids"))
        n_new_terms = self._read("lexicon_ids").filter(
            F.col("term_id") >= term_base
        ).count()

        # Postings for the new generation only (df joins come later —
        # postings are (term_id, doc_id, tf), df-free by design).
        lex_ids = self._read("lexicon_ids")
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

        # Per-doc sizes: append the new docs' rows only.
        gen_sizes = build_doc_sizes(gen_docs.select("doc_id", "terms", "doc_len"))
        gen_sizes.write.mode("append").parquet(self._path("doc_sizes"))

        # Incremental global stats (adds, never rescans).
        delta = gen_sizes.agg(
            F.count("*").alias("n"), F.sum("doc_len").alias("s")
        ).collect()[0]
        n_delta, len_delta = int(delta["n"]), int(delta["s"] or 0)
        n_new, len_new = n_old + n_delta, len_old + len_delta
        avg_new = (len_new / n_new) if n_new else 0.0

        self._refresh_metadata(gen, first, n_old, avg_old, n_new, avg_new)

        self.spark.createDataFrame(
            [(gen, n_new, len_new, doc_base + n_delta,
              term_base + n_new_terms)],
            schema="gen int, num_docs long, collection_len long, "
                   "next_doc_id long, next_term_id long",
        ).write.mode("overwrite").parquet(self._path("stats"))
        return gen

    def _refresh_metadata(self, gen: int, first: bool, n_old: int,
                          avg_old: float, n_new: int, avg_new: float) -> None:
        """Vocabulary-sized metadata refresh + delta-proportional
        segment append for generation ``gen``."""
        postings = self._read("postings")
        gen_postings = postings.filter(F.col("generation") == gen)

        # df/occurrence deltas from THIS generation only (docID
        # monotonicity: a (term, doc) pair exists in exactly one
        # generation, so df adds exactly).
        delta_meta = gen_postings.groupBy("term_id").agg(
            F.countDistinct("doc_id").cast("long").alias("ddf"),
            F.sum("tf").cast("long").alias("docc"),
        )

        # Lexicon: term ids are stable; df adds; seg_gen tracks each
        # term's CURRENT segment generation (affected terms -> gen).
        lex_ids = self._read("lexicon_ids")
        if first:
            lexicon = lex_ids.join(delta_meta, "term_id", "left").select(
                "term", "term_id",
                F.coalesce("ddf", F.lit(0)).alias("df"),
                F.lit(gen).alias("seg_gen"),
            )
        else:
            old_lex = self._read("lexicon").select(
                "term_id", F.col("df").alias("df_old"),
                F.col("seg_gen").alias("seg_gen_old"),
            )
            lexicon = (
                lex_ids.join(old_lex, "term_id", "left")
                .join(delta_meta, "term_id", "left")
                .select(
                    "term", "term_id",
                    (F.coalesce("df_old", F.lit(0))
                     + F.coalesce("ddf", F.lit(0))).alias("df"),
                    F.when(F.col("ddf").isNotNull(), F.lit(gen))
                    .otherwise(F.coalesce("seg_gen_old", F.lit(gen)))
                    .alias("seg_gen"),
                )
            )
        lexicon.write.mode("overwrite").parquet(self._path("lexicon_tmp"))
        self.spark.read.parquet(self._path("lexicon_tmp")).write.mode(
            "overwrite"
        ).parquet(self._path("lexicon"))

        # Re-encode ONLY affected terms (full lists, fresh stats) into
        # the new generation's partition — prior partitions untouched.
        affected = delta_meta.select("term_id")
        doc_sizes = self._read("doc_sizes")
        scored = scored_postings(
            postings.join(affected, "term_id").select("term_id", "doc_id", "tf"),
            doc_sizes, self._read("lexicon"), n_new, avg_new,
        )
        # term_meta: affected terms exactly from `scored` (already
        # needed for the re-encode); untouched terms keep their stored
        # values and accumulate the sound query-side bound inflation.
        affected_meta = build_term_meta(
            scored, n_new, avg_new, self.config.bm25
        ).withColumn("bound_factor", F.lit(1.0))

        gen_segments = build_segments(
            scored, n_new, avg_new, self.config.index, self.config.bm25
        )
        if self.config.index.compress_blockmax:
            # u8 maxima relative to the FRESH affected-term max — the
            # same max affected_meta stores, so query-side recovery
            # (q/255 * term_max * bound_factor) is exact-generation
            # sound; factor starts at 1 and inflates both together.
            from pisa_spark.build.segments import compress_block_maxes

            gen_segments = compress_block_maxes(gen_segments, affected_meta)
        # term_id-clustered files -> tight row-group stats for the
        # executor's workload IN(term_id) scan pruning (_pruned_segments)
        gen_segments.withColumn("segment_gen", F.lit(gen)).sortWithinPartitions(
            "term_id", "block_id"
        ).write.mode("append").partitionBy("segment_gen").parquet(
            self._path("segments")
        )
        if first:
            term_meta = affected_meta
        else:
            half = "0.5D"
            idf = f"GREATEST(1e-6D, LN(({{n}}) - df + {half}) - LN(df + {half}))"
            ratio = (
                f"({idf.format(n=float(n_new))})"
                f" / ({idf.format(n=float(n_old))})"
            )
            norm_factor = max(1.0, (avg_new / avg_old) if avg_old else 1.0)
            untouched = (
                self._read("term_meta")
                .join(affected, "term_id", "left_anti")
                .withColumn(
                    "bound_factor",
                    F.col("bound_factor") * F.expr(ratio) * F.lit(norm_factor),
                )
            )
            term_meta = untouched.unionByName(affected_meta)
        term_meta.write.mode("overwrite").parquet(self._path("term_meta_tmp"))
        self.spark.read.parquet(self._path("term_meta_tmp")).write.mode(
            "overwrite"
        ).parquet(self._path("term_meta"))

        import shutil

        shutil.rmtree(self._path("lexicon_tmp"), ignore_errors=True)
        shutil.rmtree(self._path("term_meta_tmp"), ignore_errors=True)

    # ------------------------------------------------------------ compact

    def compact(self) -> None:
        """Reclaim superseded segment generations and reset bound
        inflation: RE-ENCODE the whole index as generation ``gen``
        (one partition) with fresh global stats, recompute term_meta
        exactly, reset bound_factor to 1. Re-encoding (not just
        re-writing the current view) is what makes the factor reset
        SOUND: stored block maxima were computed under the stats of
        each term's last touch, so carrying them verbatim with
        factor=1 would under-bound any term whose scores inflated
        since — exactly the staleness the factor existed to cover.
        Corpus-proportional by design — run occasionally, not per
        batch (the reference's merge step, SURVEY §2.4)."""
        st = self._stats_row()
        gen = int(st["gen"])
        n, ln = int(st["num_docs"]), int(st["collection_len"])
        avg = (ln / n) if n else 0.0
        # Eager localCheckpoint: `scored` feeds the segment write AND
        # term_meta, and term_meta executes after the lexicon (one of
        # scored's parquet inputs) is overwritten — pin the rows now.
        scored = scored_postings(
            self._read("postings").select("term_id", "doc_id", "tf"),
            self._read("doc_sizes"), self._read("lexicon"), n, avg,
        ).localCheckpoint(eager=True)
        term_meta = build_term_meta(scored, n, avg, self.config.bm25)
        fresh = build_segments(
            scored, n, avg, self.config.index, self.config.bm25
        )
        if self.config.index.compress_blockmax:
            from pisa_spark.build.segments import compress_block_maxes

            fresh = compress_block_maxes(fresh, term_meta)
        fresh.withColumn("segment_gen", F.lit(gen)).sortWithinPartitions(
            "term_id", "block_id"
        ).write.mode("overwrite").partitionBy("segment_gen").parquet(
            self._path("segments_tmp")
        )
        self.spark.read.parquet(self._path("segments_tmp")).write.mode(
            "overwrite"
        ).partitionBy("segment_gen").parquet(self._path("segments"))
        lexicon = self._read("lexicon").withColumn("seg_gen", F.lit(gen))
        lexicon.write.mode("overwrite").parquet(self._path("lexicon_tmp"))
        self.spark.read.parquet(self._path("lexicon_tmp")).write.mode(
            "overwrite"
        ).parquet(self._path("lexicon"))
        term_meta = term_meta.withColumn("bound_factor", F.lit(1.0))
        term_meta.write.mode("overwrite").parquet(self._path("term_meta_tmp"))
        self.spark.read.parquet(self._path("term_meta_tmp")).write.mode(
            "overwrite"
        ).parquet(self._path("term_meta"))
        import shutil

        shutil.rmtree(self._path("segments_tmp"), ignore_errors=True)
        shutil.rmtree(self._path("lexicon_tmp"), ignore_errors=True)
        shutil.rmtree(self._path("term_meta_tmp"), ignore_errors=True)

    # -------------------------------------------------------------- query

    def _segments_current(self) -> DataFrame:
        """The deduplicated segment view: per term, only the blocks of
        its latest affected generation (lexicon.seg_gen) are current;
        older generations' rows for re-encoded terms are superseded
        (each re-encode covers the term's FULL list)."""
        seg = self._read("segments")
        cur = self._read("lexicon").select("term_id", "seg_gen")
        return seg.join(cur, "term_id").filter(
            F.col("segment_gen") == F.col("seg_gen")
        ).drop("seg_gen", "segment_gen")

    def index(self) -> InvertedIndex:
        docs = self._read("docs")
        st = self._stats_row()
        n = int(st["num_docs"])
        ln = int(st["collection_len"])
        return InvertedIndex(
            lexicon=self._read("lexicon"),
            docmap=docs.select("doc_id", "url"),
            doc_sizes=self._read("doc_sizes"),
            postings=self._read("postings").select("term_id", "doc_id", "tf"),
            segments=self._segments_current(),
            term_meta=self._read("term_meta"),
            num_docs=n,
            avg_len=(ln / n) if n else 0.0,
            collection_len=ln,
            config=self.config,
            segments_file_backed=True,
            # dense term ids start at 0, so next_term_id == vocab size
            num_terms=int(st["next_term_id"]),
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
