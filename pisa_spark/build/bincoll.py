"""PISA binary_collection wire format (import/export).

Reference parity: ``include/pisa/binary_collection.hpp`` — a file is
a concatenation of sequences, each ``u32 LE count`` followed by
``count`` u32 LE values. The reference's uncompressed index triple
uses it three ways (``invert.cpp``, ``forward_index.hpp``):

- ``.sizes``: ONE sequence, value i = document i's length;
- ``.docs``: a leading single-value sequence ``[num_docs]``, then one
  docID sequence per term (term id = position order);
- ``.freqs``: one tf sequence per term, aligned with ``.docs`` (no
  header sequence).

The format has no sync marks, so a single file is unsplittable —
parallelism is per FILE (the reference mmaps and scans single-node;
batch builds shard output across files, and so does our exporter).
Parsing runs on executors via ``binaryFile`` + ``mapInPandas``: the
driver never touches the payload. A >2 GB single file exceeds Spark's
one-row binary limit — re-shard legacy files first (documented limit;
the reference's own tooling writes multi-file batches too,
``invert.cpp`` batch outputs).
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F


def _parse_sequences(blob: bytes) -> Iterator[np.ndarray]:
    buf = np.frombuffer(blob, dtype="<u4")
    i = 0
    while i < len(buf):
        n = int(buf[i])
        yield buf[i + 1: i + 1 + n]
        i += 1 + n
    if i != len(buf):
        raise ValueError("truncated binary_collection sequence")


def read_binary_collection(spark: SparkSession, path: str) -> DataFrame:
    """path (file or glob of shards) -> (file, seq_id, values).

    ``seq_id`` numbers sequences within their file. Multi-file
    imports get per-file parallelism; callers that need a global
    sequence order combine ``file`` (sorted shard names) with
    ``seq_id`` exactly as the reference's merge does for its batch
    outputs."""
    raw = spark.read.format("binaryFile").load(path).select(
        F.col("path").alias("file"), "content"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for file, blob in zip(b["file"], b["content"]):
                seqs = list(_parse_sequences(bytes(blob)))
                yield pd.DataFrame(
                    {
                        "file": file,
                        "seq_id": np.arange(len(seqs), dtype=np.int64),
                        "values": [s.astype(np.int64) for s in seqs],
                    }
                )

    return raw.mapInPandas(
        kernel, "file string, seq_id long, values array<long>"
    )


def read_sizes(spark: SparkSession, path: str) -> DataFrame:
    """A ``.sizes`` file -> (doc_id, doc_len), the doc_sizes table
    shape (build/invert.py doc_sizes)."""
    seqs = read_binary_collection(spark, path)
    return seqs.where(F.col("seq_id") == 0).select(
        F.posexplode("values").alias("doc_id", "doc_len")
    ).select(F.col("doc_id").cast("long"), F.col("doc_len").cast("int"))


def postings_from_binary_collection(
    spark: SparkSession, docs_path: str, freqs_path: str
) -> DataFrame:
    """Import an uncompressed reference index pair -> (term_id,
    doc_id, tf) — the postings table every downstream build stage
    (segments, WAND metadata, reorder) consumes.

    ``.docs`` sequence 0 is the ``[num_docs]`` header, so term id =
    seq_id - 1 there and seq_id in ``.freqs``; the two align
    positionally (invert.cpp writes them in lockstep)."""
    docs = read_binary_collection(spark, docs_path).where(
        F.col("seq_id") > 0
    ).select(
        (F.col("seq_id") - 1).alias("term_id"),
        F.posexplode("values").alias("pos", "doc_id"),
    )
    freqs = read_binary_collection(spark, freqs_path).select(
        F.col("seq_id").alias("term_id"),
        F.posexplode("values").alias("pos", "tf"),
    )
    return docs.join(freqs, ["term_id", "pos"]).select(
        "term_id", "doc_id", F.col("tf").cast("int").alias("tf")
    )


def write_binary_collection(
    sequences: Sequence[np.ndarray | list[int]], path: str | Path
) -> None:
    """Export helper (format parity / test fixtures): write sequences
    in the reference's wire format. LOCAL, sequential — the format
    itself is; large exports should shard across files the way the
    reference's batch builds do."""
    with open(path, "wb") as f:
        for seq in sequences:
            arr = np.asarray(seq, dtype="<u4")
            f.write(np.uint32(len(arr)).tobytes())
            f.write(arr.tobytes())
