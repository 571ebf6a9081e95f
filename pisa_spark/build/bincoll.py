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

import re
from pathlib import Path
from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F


def _natural_key(path: str) -> tuple:
    """Digit-aware sort key: numeric runs compare as integers, so
    ``c.docs.2`` orders before ``c.docs.10`` (lexicographic order
    would scramble global seq/doc numbering for >=10 unpadded
    shards)."""
    return tuple(
        int(part) if part.isdigit() else part
        for part in re.split(r"(\d+)", path)
    )


def _with_offsets(pdf: pd.DataFrame) -> pd.DataFrame:
    """Sort per-file (file, n_seqs, n_vals) rows into natural shard
    order and attach cumulative seq/val offsets."""
    pdf = pdf.sort_values("file", key=lambda s: s.map(_natural_key))
    pdf = pdf.reset_index(drop=True)
    pdf["seq_off"] = pdf["n_seqs"].cumsum().shift(fill_value=0)
    pdf["val_off"] = pdf["n_vals"].cumsum().shift(fill_value=0)
    return pdf


def _parse_sequences(blob: bytes) -> Iterator[np.ndarray]:
    buf = np.frombuffer(blob, dtype="<u4")
    i = 0
    while i < len(buf):
        n = int(buf[i])
        yield buf[i + 1: i + 1 + n]
        i += 1 + n
    if i != len(buf):
        raise ValueError("truncated binary_collection sequence")


def file_layouts(spark: SparkSession, path: str) -> pd.DataFrame:
    """Per-file (n_seqs, n_vals) plus global offsets in natural shard
    order -> pandas (file, n_seqs, n_vals, seq_off, val_off).

    Standalone inspection utility: a header-hop pass (O(#seqs) CPU per
    file, values never copied) — note binaryFile still reads every
    byte off disk, so this costs one full I/O pass. The import paths
    below derive the same layout from their single parse pass instead.
    Driver holds one row per FILE — bounded by shard count, never by
    data."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for file, blob in zip(b["file"], b["content"]):
                buf = np.frombuffer(bytes(blob), dtype="<u4")
                i = ns = nv = 0
                while i < len(buf):
                    n = int(buf[i])
                    ns += 1
                    nv += n
                    i += 1 + n
                if i != len(buf):
                    raise ValueError(
                        f"truncated binary_collection sequence: {file}"
                    )
                rows.append((file, ns, nv))
            yield pd.DataFrame(rows, columns=["file", "n_seqs", "n_vals"])

    raw = spark.read.format("binaryFile").load(path).select(
        F.col("path").alias("file"), "content"
    )
    pdf = raw.mapInPandas(
        kernel, "file string, n_seqs long, n_vals long"
    ).toPandas()
    return _with_offsets(pdf)


def _layout_from_seqs(seqs: DataFrame) -> pd.DataFrame:
    """Layout table derived from an already-parsed (and checkpointed)
    (file, seq_id, values) DataFrame — no second read of the input."""
    pdf = (
        seqs.groupBy("file")
        .agg(
            F.count("*").alias("n_seqs"),
            F.sum(F.size("values")).alias("n_vals"),
        )
        .toPandas()
    )
    return _with_offsets(pdf)


def read_binary_collection(
    spark: SparkSession, path: str, global_seq: bool = False
) -> DataFrame:
    """path (file or glob of shards) -> (file, seq_id, values).

    ``seq_id`` numbers sequences within their file; with
    ``global_seq=True`` it numbers across ALL matched files in natural
    shard order — digit-aware, so ``c.docs.10`` follows ``c.docs.2``
    (shards as a straight split of one logical sequence stream — the
    layout the reference's merge of its batch outputs produces), via a
    broadcast per-file offset join. The parse is eagerly
    localCheckpointed first so the offset job and the downstream
    consumers share ONE read of the input (the assign_global_ids
    pattern, build/ids.py). Multi-file imports get per-file
    parallelism either way."""
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

    seqs = raw.mapInPandas(
        kernel, "file string, seq_id long, values array<long>"
    )
    if not global_seq:
        return seqs
    seqs = seqs.localCheckpoint(eager=True)
    offs = spark.createDataFrame(
        _layout_from_seqs(seqs)[["file", "seq_off"]]
    )
    return seqs.join(F.broadcast(offs), "file").select(
        "file",
        (F.col("seq_off") + F.col("seq_id")).alias("seq_id"),
        "values",
    )


def read_sizes(spark: SparkSession, path: str) -> DataFrame:
    """``.sizes`` (file or glob of shards) -> (doc_id, doc_len), the
    doc_sizes table shape (build/invert.py doc_sizes).

    Sharded input: each shard must be ONE sequence (a straight split
    of the doc stream); doc_ids continue across shards in natural
    shard order via the per-file value offsets. One read of the
    input: layout derives from the checkpointed parse."""
    seqs = read_binary_collection(spark, path).localCheckpoint(eager=True)
    layout = _layout_from_seqs(seqs)
    if (layout["n_seqs"] != 1).any():
        bad = layout[layout["n_seqs"] != 1]["file"].tolist()
        raise ValueError(
            f".sizes shards must hold exactly one sequence each: {bad}"
        )
    offs = spark.createDataFrame(layout[["file", "val_off"]])
    return seqs.join(F.broadcast(offs), "file").select(
        F.col("val_off"),
        F.posexplode("values").alias("pos", "doc_len"),
    ).select(
        (F.col("val_off") + F.col("pos")).alias("doc_id"),
        F.col("doc_len").cast("int"),
    )


def postings_from_binary_collection(
    spark: SparkSession, docs_path: str, freqs_path: str
) -> DataFrame:
    """Import an uncompressed reference index pair -> (term_id,
    doc_id, tf) — the postings table every downstream build stage
    (segments, WAND metadata, reorder) consumes.

    Sequence numbering is GLOBAL across shards (natural shard order),
    so sharded ``.docs``/``.freqs`` pairs import correctly: the
    single global sequence 0 of ``.docs`` is the ``[num_docs]``
    header, term id = global seq - 1 there and global seq in
    ``.freqs``, and the two align positionally (invert.cpp writes
    them in lockstep)."""
    docs = read_binary_collection(
        spark, docs_path, global_seq=True
    ).where(F.col("seq_id") > 0).select(
        (F.col("seq_id") - 1).alias("term_id"),
        F.posexplode("values").alias("pos", "doc_id"),
    )
    freqs = read_binary_collection(
        spark, freqs_path, global_seq=True
    ).select(
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
