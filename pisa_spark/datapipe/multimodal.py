"""Multimodal binary-column plumbing: opaque blobs + typed metadata.

The input-hint table carries ``html binary``; a 100 TB multimodal
pipeline treats image/audio/video exactly the same way — an opaque
``binary`` column plus typed metadata, decoded lazily inside
Arrow-batched kernels. This module implements the Spark-side
plumbing for that pattern:

- ``blob_meta``         native metadata extraction (size, sha256) —
                        whole-stage codegen, no Python
- ``frame_sample``      deterministic frame-sampling plan for a blob
                        (which frames to decode), native ``sequence``
                        + ``explode`` — the decode itself is the
                        stubbed step
- ``decode_blobs``      the real mapInPandas decode kernel: schema,
                        Arrow batch shape, and partitioning are real;
                        the pixel decode is stubbed (image/audio libs
                        are not in this container) behind
                        ``fake_decode`` / NotImplementedError

Real decoders plug in by replacing ``fake_decode`` — the Spark plan
(scan -> repartition by blob size -> mapInPandas -> struct column)
does not change.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from pisa_spark.datapipe.hashing import hash60_sql

FRAME_MOD = 4  # fake "video length": n_frames = n_bytes % FRAME_MOD + 1


def blob_meta(pages: DataFrame) -> DataFrame:
    """pages(doc_id, html binary) -> (doc_id, n_bytes, sha256)."""
    return pages.select(
        "doc_id",
        F.octet_length("html").cast("long").alias("n_bytes"),
        F.sha2("html", 256).alias("sha256"),
    )


def blob_meta_oracle() -> str:
    """DuckDB derives the identical html bytes from the documents
    view (same construction as corpus.pages_from_documents)."""
    return """SELECT doc_id,
       CAST(length('<html><body>' || text || '</body></html>') AS BIGINT)
         AS n_bytes,
       sha256('<html><body>' || text || '</body></html>') AS sha256
FROM documents"""


def frame_sample(pages: DataFrame) -> DataFrame:
    """(doc_id, frame_id, frame_hash): deterministic frame-sampling
    plan — n_frames keyed off blob size, per-frame hash derived from
    the blob digest (stands in for the decoded frame's content hash;
    a real pipeline computes it from pixels inside decode_blobs)."""
    meta = blob_meta(pages)
    frames = meta.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), (F.col("n_bytes") % FRAME_MOD).cast("int"))
        ).alias("frame_id"),
        "sha256",
    )
    fh = hash60_sql("concat(sha256, '#', CAST(frame_id AS STRING))", "spark")
    return frames.select(
        "doc_id", F.col("frame_id").cast("long"), F.expr(fh).alias("frame_hash")
    )


def frame_sample_oracle() -> str:
    fh = hash60_sql("(sha || '#' || CAST(f.frame_id AS VARCHAR))", "duckdb")
    return f"""WITH meta AS (
  SELECT doc_id,
         length('<html><body>' || text || '</body></html>') AS n_bytes,
         sha256('<html><body>' || text || '</body></html>') AS sha
  FROM documents
)
SELECT m.doc_id, CAST(f.frame_id AS BIGINT) AS frame_id,
       {fh} AS frame_hash
FROM meta m, LATERAL (
  SELECT unnest(generate_series(0, m.n_bytes % {FRAME_MOD})) AS frame_id
) f"""


# ------------------------------------------------------------- decode stubs

DECODED_SCHEMA = (
    "doc_id long, n_bytes long, format string, width int, height int, "
    "mean_byte double"
)


def fake_decode(blob: bytes) -> dict:
    """Deterministic stand-in for an image decoder: 'dimensions' are
    derived from the byte length, 'pixels' from the raw bytes. A real
    decoder (PIL/ffmpeg) replaces this function only."""
    n = len(blob)
    arr = np.frombuffer(blob, dtype=np.uint8)
    return {
        "format": "fake/html" if blob[:1] == b"<" else "fake/bin",
        "width": int(n % 640) + 1,
        "height": int(n % 480) + 1,
        "mean_byte": float(arr.mean()) if n else 0.0,
    }


def decode_stub_oracle() -> str:
    """DuckDB reproduction of the FAKE decoder's output, value-exact:
    the blob is reconstructed as UTF-8 of the html wrapper (same
    construction as corpus.pages_from_documents), and the byte mean
    is computed from its hex dump (16*hi + lo per byte) — integer
    sums, one IEEE division, identical doubles. A real pixel decoder
    has no SQL form; THIS oracle pins the plumbing contract (sizes,
    derived dims, byte-level reduction) the fake decoder defines."""
    html = "'<html><body>' || text || '</body></html>'"
    return f"""WITH b AS (
  SELECT doc_id,
         hex(encode({html})) AS hx,
         octet_length(encode({html})) AS n
  FROM documents
),
s AS (
  SELECT doc_id, n, hx,
         list_sum(list_transform(range(1, CAST(2 * n AS BIGINT) + 1),
           j -> (strpos('0123456789ABCDEF', substr(hx, CAST(j AS INT), 1)) - 1)
                * CASE WHEN j % 2 = 1 THEN 16 ELSE 1 END)) AS byte_sum
  FROM b
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_bytes,
       CASE WHEN substr(hx, 1, 2) = '3C' THEN 'fake/html'
            ELSE 'fake/bin' END AS format,
       CAST(n % 640 + 1 AS INT) AS width,
       CAST(n % 480 + 1 AS INT) AS height,
       CAST(byte_sum AS DOUBLE) / CAST(n AS DOUBLE) AS mean_byte
FROM s"""


def real_decode(blob: bytes) -> dict:  # pragma: no cover - stub
    """Plug-in point for an actual decoder; the container ships no
    image/audio libraries, so this is intentionally unimplemented."""
    raise NotImplementedError(
        "install an image/audio decoder and route decode_blobs(decoder=real_decode)"
    )


def decode_blobs(pages: DataFrame, decoder=fake_decode) -> DataFrame:
    """The real multimodal kernel plumbing: Arrow-batched
    ``mapInPandas`` over (doc_id, html) emitting a typed struct per
    blob. Batch shape, schema, and distribution are production-real;
    only ``decoder`` is fake in this container."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            metas = [decoder(bytes(b)) for b in pdf["html"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(np.int64),
                    "n_bytes": [len(bytes(b)) for b in pdf["html"]],
                    "format": [m["format"] for m in metas],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "mean_byte": [m["mean_byte"] for m in metas],
                }
            )

    return pages.select("doc_id", "html").mapInPandas(kernel, DECODED_SCHEMA)
