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
                        ``fake_decode`` / NotImplementedError. The
                        kernel also emits FEATURE EXTRACTION (f0..f3
                        byte-bucket histogram — real numpy math over
                        the payload, not stubbed) and the RESIZE plan
                        (``resize_dims``: aspect-preserving integer
                        fit into a 224x224 box, applied to the
                        decoded dims; a real decoder resamples pixels
                        to exactly these dims)

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
    view (same construction as corpus.pages_from_documents).
    n_bytes counts UTF-8 BYTES via octet_length(encode(...)) — plain
    length() on the VARCHAR is a CHARACTER count and diverges from
    Spark's octet_length on any non-ASCII text (decode_stub_oracle
    already counts bytes the same way)."""
    return """SELECT doc_id,
       CAST(octet_length(encode('<html><body>' || text || '</body></html>'))
            AS BIGINT) AS n_bytes,
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
         octet_length(encode('<html><body>' || text || '</body></html>'))
           AS n_bytes,
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
    "mean_byte double, out_w int, out_h int, "
    "f0 long, f1 long, f2 long, f3 long"
)

RESIZE_MAX = 224  # target box for the resize plan (out_w x out_h)


def resize_dims(w: int, h: int, box: int = RESIZE_MAX) -> tuple[int, int]:
    """Aspect-preserving fit of (w, h) into a box x box square, never
    upscaling — pure integer math (floor division) so Spark, numpy,
    and DuckDB agree exactly. The limiting side is the larger of w, h."""
    if w <= box and h <= box:
        return w, h
    if w >= h:
        return box, max(1, (h * box) // w)
    return max(1, (w * box) // h), box


def fake_decode(blob: bytes) -> dict:
    """Deterministic stand-in for an image decoder: 'dimensions' are
    derived from the byte length, 'pixels' from the raw bytes. A real
    decoder (PIL/ffmpeg) replaces this function only. The byte-bucket
    histogram (f0..f3 = counts of bytes in [0,64) [64,128) [128,192)
    [192,256)) and the resize plan are REAL computations over the raw
    payload — only the pixel interpretation of those bytes is fake."""
    n = len(blob)
    arr = np.frombuffer(blob, dtype=np.uint8)
    w, h = int(n % 640) + 1, int(n % 480) + 1
    out_w, out_h = resize_dims(w, h)
    hist = np.bincount(arr >> 6, minlength=4) if n else np.zeros(4, np.int64)
    return {
        "format": "fake/html" if blob[:1] == b"<" else "fake/bin",
        "width": w,
        "height": h,
        "mean_byte": float(arr.mean()) if n else 0.0,
        "out_w": out_w,
        "out_h": out_h,
        "f0": int(hist[0]),
        "f1": int(hist[1]),
        "f2": int(hist[2]),
        "f3": int(hist[3]),
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
    # byte bucket = byte >> 6 = hi_hex_digit // 4 (odd hex positions)
    bucket = (
        "(strpos('0123456789ABCDEF', substr(hx, CAST(2 * i - 1 AS INT), 1)) - 1)"
        " // 4"
    )
    fcols = ",\n         ".join(
        f"COALESCE(list_sum(list_transform(range(1, CAST(n AS BIGINT) + 1), "
        f"i -> CASE WHEN {bucket} = {b} THEN 1 ELSE 0 END)), 0) AS f{b}"
        for b in range(4)
    )
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
                * CASE WHEN j % 2 = 1 THEN 16 ELSE 1 END)) AS byte_sum,
         {fcols},
         n % 640 + 1 AS w,
         n % 480 + 1 AS h
  FROM b
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_bytes,
       CASE WHEN substr(hx, 1, 2) = '3C' THEN 'fake/html'
            ELSE 'fake/bin' END AS format,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(byte_sum AS DOUBLE) / CAST(n AS DOUBLE) AS mean_byte,
       CAST(CASE WHEN w <= {RESIZE_MAX} AND h <= {RESIZE_MAX} THEN w
                 WHEN w >= h THEN {RESIZE_MAX}
                 ELSE GREATEST(1, (w * {RESIZE_MAX}) // h) END AS INT) AS out_w,
       CAST(CASE WHEN w <= {RESIZE_MAX} AND h <= {RESIZE_MAX} THEN h
                 WHEN w >= h THEN GREATEST(1, (h * {RESIZE_MAX}) // w)
                 ELSE {RESIZE_MAX} END AS INT) AS out_h,
       CAST(f0 AS BIGINT) AS f0, CAST(f1 AS BIGINT) AS f1,
       CAST(f2 AS BIGINT) AS f2, CAST(f3 AS BIGINT) AS f3
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
            cols = {
                "doc_id": pdf["doc_id"].to_numpy(np.int64),
                "n_bytes": [len(bytes(b)) for b in pdf["html"]],
            }
            for key in (
                "format", "width", "height", "mean_byte",
                "out_w", "out_h", "f0", "f1", "f2", "f3",
            ):
                cols[key] = [m[key] for m in metas]
            yield pd.DataFrame(cols)

    return pages.select("doc_id", "html").mapInPandas(kernel, DECODED_SCHEMA)
