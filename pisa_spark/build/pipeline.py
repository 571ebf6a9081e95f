"""Checkpointed, resumable index-build pipeline with lineage + metrics.

North-rule requirement: the build must be "resumable from
per-partition checkpoints with lineage and row/byte metrics recorded
per partition". The reference's analogue is its batch-spill files
(`.batch.N.{docs,freqs,sizes}`, src/invert.cpp:139-165) which let a
crashed invert restart from finished batches; here each STAGE is a
parquet checkpoint directory and each written part-file is the
per-partition unit:

    out_dir/<stage>/part-*.parquet      stage output, partitioned
    out_dir/<stage>/_MANIFEST.json      lineage + per-partition metrics

A manifest records: the stage's config fingerprint, its parents'
manifest fingerprints (lineage chain), wall seconds, and per
part-file rows/bytes (read from parquet footers — no extra scan).
``run`` skips any stage whose manifest exists and whose fingerprint
(config + parents) is unchanged — so a killed build resumes from the
last finished stage, and a config change invalidates exactly the
stages downstream of it.

Stage DAG (each arrow is a shuffle boundary, SURVEY §3.1):

    pages -> docs -> term_ids -> postings -> lexicon -> segments
                  \\-> stats                     \\-> term_meta

(doc_sizes / docmap are column-pruned projections of the docs
checkpoint, not separate stages)
"""

from __future__ import annotations

import hashlib
import json
import time
from dataclasses import asdict
from pathlib import Path
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from pisa_spark.codecs import WIRE_VERSION
from pisa_spark.config import EngineConfig

MANIFEST = "_MANIFEST.json"

# Checkpoint parquet codec: zstd compresses the corpus-sized stage
# checkpoints ~2x tighter than snappy at a small CPU cost — fewer
# bytes through the page cache / disk on every write AND every
# downstream re-read (parquet is self-describing, so resuming across
# a codec change is safe).
CHECKPOINT_CODEC = "zstd"


def _fingerprint(payload: dict) -> str:
    return hashlib.sha256(
        json.dumps(payload, sort_keys=True).encode()
    ).hexdigest()[:16]


def _partition_metrics(stage_dir: Path) -> list[dict]:
    """Per part-file (rows, bytes) from parquet footers only.

    Recursive: a stage written with partition_by nests its part-files
    under key=value directories, so a top-level glob would record 0
    rows/bytes for it."""
    import pyarrow.parquet as pq

    out = []
    for f in sorted(stage_dir.rglob("*.parquet")):
        out.append(
            {
                "file": str(f.relative_to(stage_dir)),
                "rows": pq.ParquetFile(f).metadata.num_rows,
                "bytes": f.stat().st_size,
            }
        )
    return out


class BuildPipeline:
    """Drives the build DAG with per-stage checkpoints.

    >>> pipe = BuildPipeline(spark, out_dir, config)
    >>> index = pipe.run(pages)        # full build or resume
    >>> pipe.report()                  # lineage + metrics per stage
    """

    def __init__(self, spark: SparkSession, out_dir: str,
                 config: EngineConfig | None = None,
                 input_desc: dict | None = None):
        """``input_desc`` identifies the input corpus (e.g. source
        path / doc count / generator seed) and is part of every stage
        fingerprint — without it a checkpoint dir reused with a
        different input would wrongly resume."""
        self.spark = spark
        self.out = Path(out_dir)
        self.config = config or EngineConfig()
        self.cfg_fp = _fingerprint(
            {
                "analyzer": asdict(self.config.analyzer) | {"stopwords": sorted(self.config.analyzer.stopwords)},
                "bm25": asdict(self.config.bm25),
                "index": asdict(self.config.index),
                "input": input_desc or {},
                # encoded-segment byte layout: a checkpoint written
                # under a different wire version must re-encode, not
                # resume (a resumed pef stage would mis-decode)
                "codec_wire": WIRE_VERSION,
            }
        )
        self.executed: list[str] = []  # stages actually computed this run
        self.skipped: list[str] = []

    # ------------------------------------------------------------- stages

    def _manifest_path(self, stage: str) -> Path:
        return self.out / stage / MANIFEST

    def _load_manifest(self, stage: str) -> dict | None:
        p = self._manifest_path(stage)
        if p.exists():
            return json.loads(p.read_text())
        return None

    def _stage(self, stage: str, parents: list[str],
               compute: Callable[[], DataFrame],
               partition_by: list[str] | None = None) -> DataFrame:
        """Run-or-resume one stage; returns the checkpointed DataFrame."""
        parent_fps = {
            p: (self._load_manifest(p) or {}).get("fingerprint", "?")
            for p in parents
        }
        want_fp = _fingerprint({"config": self.cfg_fp, "parents": parent_fps})
        man = self._load_manifest(stage)
        stage_dir = self.out / stage
        if man and man.get("fingerprint") == want_fp:
            self.skipped.append(stage)
            return self.spark.read.parquet(str(stage_dir))

        t0 = time.perf_counter()
        df = compute()
        writer = df.write.mode("overwrite").option(
            "compression", CHECKPOINT_CODEC
        )
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(str(stage_dir))
        wall = time.perf_counter() - t0
        parts = _partition_metrics(stage_dir)
        manifest = {
            "stage": stage,
            "fingerprint": want_fp,
            "config": self.cfg_fp,
            "parents": parent_fps,
            "wall_s": round(wall, 3),
            "n_rows": sum(p["rows"] for p in parts),
            "n_bytes": sum(p["bytes"] for p in parts),
            "n_partitions": len(parts),
            "partitions": parts,
            "finished_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        self._manifest_path(stage).write_text(json.dumps(manifest, indent=1))
        self.executed.append(stage)
        return self.spark.read.parquet(str(stage_dir))

    # ---------------------------------------------------------------- run

    def run(self, pages: DataFrame):
        """Build (or resume) the full index; returns InvertedIndex
        backed by the checkpoint parquet (every artifact re-readable
        without recompute)."""
        from pisa_spark.build import (
            build_doc_sizes, build_postings, build_term_ids,
            lexicon_with_df,
            build_segments, build_term_meta, collection_stats, tokenize_pages,
        )
        from pisa_spark.build.segments import scored_postings
        from pisa_spark.index import InvertedIndex

        # ONE corpus-sized checkpoint: docIDs are a function of url
        # alone, so they are assigned over the column-pruned url
        # projection of the INPUT (tiny: one row per doc, no terms
        # arrays) and joined back into the tokenize scan — the join is
        # broadcast when the counted doc count is known small, else a
        # plain join for AQE. The previous shape (tokenize checkpoint,
        # then range-shuffle + localCheckpoint + window over the full
        # terms arrays just to number rows) wrote the corpus to disk
        # twice and moved it through a shuffle once more; at 100 TB
        # that is corpus-scale I/O spent on an id column.
        from pisa_spark.build.forward import ID_BROADCAST_ROWS

        cnt: dict = {}
        docs = self._stage(
            "docs", [],
            lambda: tokenize_pages(
                pages, self.config.analyzer, stats_out=cnt,
                id_broadcast_rows=min(
                    self.config.index.lexicon_broadcast_threshold,
                    ID_BROADCAST_ROWS,
                ),
            ),
        )
        # Duplicate-url guard (free: the docs manifest already counts
        # rows): the id join fans out on duplicate urls — a corrupted
        # index (doubled tf, inflated stats) must fail the build, not
        # ship. The corrupt checkpoint is DELETED before raising:
        # otherwise a rerun would resume it with ``cnt`` empty and the
        # guard skipped, shipping exactly the corruption this blocks.
        # (NULL urls are caught earlier, inside the id assignment's
        # offset collect — forward._with_assigned_ids forbid_null.)
        if cnt:
            docs_rows = (self._load_manifest("docs") or {}).get("n_rows")
            if docs_rows is not None and docs_rows != cnt["n_rows"]:
                import shutil

                shutil.rmtree(self.out / "docs", ignore_errors=True)
                raise ValueError(
                    f"duplicate urls in input: {cnt['n_rows']} distinct-"
                    f"numbered urls joined into {docs_rows} doc rows "
                    "(url is the corpus key and must be unique); the "
                    "docs checkpoint was removed"
                )
        # Ids-first invert (invert.build_lexicon docstring): the
        # term_ids stage shuffles only distinct terms (map-side partial
        # dedup -> per-task local vocabularies), build_postings is the
        # single corpus-pair shuffle, and the lexicon's df is a
        # vocabulary-sized aggregate off the postings checkpoint — the
        # old lexicon stage's second corpus-wide distinct(term, doc)
        # pass is gone, and the extra checkpoint (term_ids) is
        # vocabulary-sized, not corpus-sized.
        term_ids = self._stage(
            "term_ids", ["docs"], lambda: build_term_ids(docs)
        )
        # doc_sizes / docmap are pure projections of the docs
        # checkpoint: parquet column pruning makes reading them off
        # docs exactly as cheap as a dedicated copy, without the extra
        # stage write (two fewer corpus-keyed write jobs per build).
        doc_sizes = build_doc_sizes(docs)
        stats_df = self._stage(
            "stats", ["docs"], lambda: collection_stats(doc_sizes)
        )
        stats = stats_df.collect()[0]
        num_docs = int(stats["num_docs"])
        avg_len = float(stats["avg_len"] or 0.0)
        collection_len = int(stats["collection_len"] or 0)

        # Vocabulary size comes free from the term_ids stage manifest;
        # it gates the broadcast hints (invert.maybe_broadcast).
        lexicon_size = (self._load_manifest("term_ids") or {}).get("n_rows")
        bcast = self.config.index.lexicon_broadcast_threshold
        # carry_doc_len: the postings checkpoint stores doc_len too
        # (~1 varint-packed column), so the segment encode never
        # re-shuffles the pairs on doc_id for the doc_sizes join.
        postings = self._stage(
            "postings", ["docs", "term_ids"],
            lambda: build_postings(
                docs, term_ids,
                lexicon_size=lexicon_size, broadcast_threshold=bcast,
                carry_doc_len=True,
            ),
        )
        lexicon = self._stage(
            "lexicon", ["term_ids", "postings"],
            lambda: lexicon_with_df(term_ids, postings),
        )
        scored = scored_postings(
            postings, doc_sizes, lexicon, num_docs, avg_len,
            lexicon_size=lexicon_size, broadcast_threshold=bcast,
        )
        # Quantized configs need the index-wide max term weight BEFORE
        # segment encoding, and the final term_meta carries quantized
        # bounds — same routing as build_index (via quantized_rescale),
        # with the raw metadata checkpointed so resume works.
        index_max_score = None
        seg_parents = ["postings", "lexicon", "stats"]
        if self.config.index.quantize_bits:
            from pisa_spark.index import quantized_rescale

            term_meta_raw = self._stage(
                "term_meta_raw", ["postings", "lexicon", "stats"],
                lambda: build_term_meta(
                    scored, num_docs, avg_len, self.config.bm25
                ),
            )
            index_max_score, rescaled = quantized_rescale(
                term_meta_raw, self.config.index.quantize_bits
            )
            term_meta = self._stage(
                "term_meta", ["term_meta_raw"], lambda: rescaled
            )
            seg_parents = seg_parents + ["term_meta_raw"]
        else:
            term_meta = self._stage(
                "term_meta", ["postings", "lexicon", "stats"],
                lambda: build_term_meta(
                    scored, num_docs, avg_len, self.config.bm25
                ),
            )
        def _compute_segments():
            seg = build_segments(
                scored, num_docs, avg_len, self.config.index, self.config.bm25,
                index_max_score=index_max_score,
            )
            if self.config.index.compress_blockmax:
                from pisa_spark.build.segments import compress_block_maxes

                seg = compress_block_maxes(seg, term_meta)
            # Cluster the stored table by term_id so parquet row-group
            # min/max + dictionary stats are tight: the executor's
            # workload IN(term_id) pushdown (_pruned_segments) then
            # skips whole row groups instead of reading the corpus per
            # query batch. Per-partition sort only — no extra shuffle.
            return seg.sortWithinPartitions("term_id", "block_id")

        if self.config.index.compress_blockmax:
            seg_parents = seg_parents + ["term_meta"]
        segments = self._stage("segments", seg_parents, _compute_segments)
        docmap = docs.select("doc_id", "url")
        return InvertedIndex(
            lexicon=lexicon,
            docmap=docmap,
            doc_sizes=doc_sizes,
            # Public contract: (term_id, doc_id, tf); doc_len in the
            # checkpoint is a build-internal column (see build_postings).
            postings=postings.select("term_id", "doc_id", "tf"),
            segments=segments,
            term_meta=term_meta,
            num_docs=num_docs,
            avg_len=avg_len,
            collection_len=collection_len,
            config=self.config,
            segments_file_backed=True,
            num_terms=int(lexicon_size) if lexicon_size is not None else None,
        )

    # ------------------------------------------------------------- report

    def report(self) -> dict:
        """Lineage + metrics summary across all stage manifests."""
        stages = {}
        for p in sorted(self.out.glob(f"*/{MANIFEST}")):
            m = json.loads(p.read_text())
            stages[m["stage"]] = {
                "fingerprint": m["fingerprint"],
                "parents": m["parents"],
                "wall_s": m["wall_s"],
                "n_rows": m["n_rows"],
                "n_bytes": m["n_bytes"],
                "n_partitions": m["n_partitions"],
            }
        return {
            "config": self.cfg_fp,
            "executed": self.executed,
            "skipped": self.skipped,
            "stages": stages,
        }
