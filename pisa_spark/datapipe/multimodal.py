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
                        Arrow batch shape, and partitioning are real,
                        and so is the default pixel decode —
                        ``decode_bmp`` parses actual 24-bit BMP blobs
                        (magic, BITMAPINFOHEADER, BGR order, 4-byte
                        row padding, bottom-up/top-down rows; written
                        by the pure-stdlib ``encode_bmp``). The kernel
                        emits per-channel pixel sums, FEATURE
                        EXTRACTION (f0..f3 pixel-byte histogram) and
                        the RESIZE plan (``resize_dims``:
                        aspect-preserving integer fit into a 224x224
                        box applied to the decoded dims)

Formats needing external libraries (JPEG/PNG/audio/video) plug in by
passing ``decode_blobs(decoder=...)`` — the Spark plan (scan ->
mapInPandas -> typed columns) does not change. ``synth_image_blobs``
generates the deterministic BMP corpus the gate and tests decode.
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
    Spark's octet_length on any non-ASCII text."""
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


# ---------------------------------------------------------- pixel decoding

DECODED_SCHEMA = (
    "doc_id long, n_bytes long, format string, width int, height int, "
    "r_sum long, g_sum long, b_sum long, mean_byte double, "
    "out_w int, out_h int, f0 long, f1 long, f2 long, f3 long"
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


def encode_bmp(rgb: np.ndarray) -> bytes:
    """Pure-stdlib 24-bit BMP writer (the BMP wire format is public:
    BITMAPFILEHEADER + BITMAPINFOHEADER, BI_RGB uncompressed). Input
    is an (h, w, 3) uint8 array in RGB row-major top-down order; the
    file stores rows BOTTOM-UP with BGR channel order and each row
    padded to a 4-byte boundary — the three classic parser traps
    decode_bmp must undo exactly (pinned against the canonical 2x2
    public example in tests)."""
    import struct

    h, w, _ = rgb.shape
    stride = (3 * w + 3) // 4 * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : 3 * w] = rgb[::-1, :, ::-1].reshape(h, 3 * w)  # bottom-up, BGR
    pixel_bytes = rows.tobytes()
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(pixel_bytes), 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_bytes), 2835, 2835, 0, 0
    )
    return header + pixel_bytes


def decode_bmp(blob: bytes) -> dict:
    """Real 24-bit BMP pixel decoder (no external libraries): parses
    the actual wire format — magic, pixel-data offset,
    BITMAPINFOHEADER dims (negative height = top-down rows), 24 bpp
    BI_RGB only — strips per-row padding, restores top-down RGB order,
    and reduces the true pixel matrix: per-channel sums, pixel-byte
    mean, the f0..f3 intensity histogram (pixel byte >> 6), and the
    resize plan. Raises ValueError on anything that is not an
    uncompressed 24-bit BMP — unsupported formats fail loudly rather
    than returning fake numbers."""
    import struct

    if len(blob) < 54 or blob[:2] != b"BM":
        raise ValueError("not a BMP blob (missing 'BM' magic)")
    data_offset = struct.unpack_from("<I", blob, 10)[0]
    w, h_signed = struct.unpack_from("<ii", blob, 18)
    planes, bpp = struct.unpack_from("<HH", blob, 26)
    compression = struct.unpack_from("<I", blob, 30)[0]
    if bpp != 24 or compression != 0 or planes != 1 or w <= 0:
        raise ValueError(
            f"unsupported BMP: bpp={bpp} compression={compression}"
        )
    h = abs(h_signed)
    stride = (3 * w + 3) // 4 * 4
    if len(blob) < data_offset + stride * h:
        raise ValueError("truncated BMP pixel array")
    rows = np.frombuffer(
        blob, dtype=np.uint8, count=stride * h, offset=data_offset
    ).reshape(h, stride)[:, : 3 * w]
    bgr = rows.reshape(h, w, 3)
    if h_signed > 0:  # bottom-up storage -> top-down
        bgr = bgr[::-1]
    rgb = bgr[:, :, ::-1]
    flat = rgb.reshape(-1).astype(np.int64)
    n = flat.size
    ch = rgb.reshape(-1, 3).astype(np.int64)
    out_w, out_h = resize_dims(w, h)
    hist = np.bincount(flat >> 6, minlength=4)
    return {
        "format": "bmp",
        "width": w,
        "height": h,
        "r_sum": int(ch[:, 0].sum()),
        "g_sum": int(ch[:, 1].sum()),
        "b_sum": int(ch[:, 2].sum()),
        "mean_byte": float(int(flat.sum()) / n) if n else 0.0,
        "out_w": out_w,
        "out_h": out_h,
        "f0": int(hist[0]),
        "f1": int(hist[1]),
        "f2": int(hist[2]),
        "f3": int(hist[3]),
    }


# Deterministic synthetic image corpus: dims and pixels are pure
# integer functions of doc_id, so a DuckDB oracle can recompute every
# decoded value in closed form while the Spark path exercises the
# REAL bytes (encode_bmp -> decode_bmp round-trip through the actual
# wire format). Width crosses RESIZE_MAX so the resize plan's both
# branches run; h > 1 exercises bottom-up row recovery; w % 4 varies
# so every row-padding remainder occurs.
BLOB_W_MOD = 250
BLOB_H_MOD = 3
BLOB_PIX_A = 131  # pixel byte i of doc d = (d*A + i*B) % 256
BLOB_PIX_B = 17


def synth_blob_pixels(doc_id: int) -> np.ndarray:
    """(h, w, 3) uint8 RGB pixels for ``doc_id`` (see constants)."""
    w = doc_id % BLOB_W_MOD + 1
    h = doc_id % BLOB_H_MOD + 1
    i = np.arange(w * h * 3, dtype=np.int64)
    v = (doc_id * BLOB_PIX_A + i * BLOB_PIX_B) % 256
    return v.astype(np.uint8).reshape(h, w, 3)


def synth_image_blobs(docs: DataFrame) -> DataFrame:
    """(doc_id, blob binary): the deterministic BMP corpus, generated
    inside an Arrow-batched kernel (only doc_id crosses the wire in;
    blob bytes are born distributed, never driver-side)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["doc_id"].to_numpy(np.int64)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "blob": [
                        encode_bmp(synth_blob_pixels(int(d))) for d in ids
                    ],
                }
            )

    return docs.select("doc_id").mapInPandas(gen, "doc_id long, blob binary")


def decode_bmp_oracle() -> str:
    """DuckDB closed-form recomputation of every value decode_bmp
    produces over the synthetic corpus: dims, file size (header + the
    PADDED row stride — the writer's size math, verified in SQL),
    per-channel sums, pixel mean, intensity histogram, and resize
    plan, all from the doc_id pixel formula. The Spark side goes
    through the REAL bytes (encode_bmp -> decode_bmp), so any error
    in padding, BGR order, bottom-up rows, or header layout that is
    not perfectly self-cancelling breaks the hash; the symmetric-bug
    residue is pinned separately against the canonical public 2x2
    BMP example bytes in tests."""
    px = f"(doc_id * {BLOB_PIX_A} + i * {BLOB_PIX_B}) % 256"
    chan_sum = (
        "COALESCE(list_sum(list_transform(range(0, n), i -> "
        f"CASE WHEN i % 3 = {{c}} THEN {px} ELSE 0 END)), 0)"
    )
    fcol = (
        "COALESCE(list_sum(list_transform(range(0, n), i -> "
        f"CASE WHEN ({px}) // 64 = {{b}} THEN 1 ELSE 0 END)), 0)"
    )
    fcols = ",\n         ".join(f"{fcol.format(b=b)} AS f{b}" for b in range(4))
    return f"""WITH d AS (
  SELECT doc_id,
         doc_id % {BLOB_W_MOD} + 1 AS w,
         doc_id % {BLOB_H_MOD} + 1 AS h,
         CAST((doc_id % {BLOB_W_MOD} + 1) * (doc_id % {BLOB_H_MOD} + 1) * 3
              AS BIGINT) AS n
  FROM documents
),
s AS (
  SELECT doc_id, w, h, n,
         list_sum(list_transform(range(0, n), i -> {px})) AS byte_sum,
         {chan_sum.format(c=0)} AS r_sum,
         {chan_sum.format(c=1)} AS g_sum,
         {chan_sum.format(c=2)} AS b_sum,
         {fcols}
  FROM d
)
SELECT doc_id,
       CAST(54 + ((3 * w + 3) // 4) * 4 * h AS BIGINT) AS n_bytes,
       'bmp' AS format,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(r_sum AS BIGINT) AS r_sum,
       CAST(g_sum AS BIGINT) AS g_sum,
       CAST(b_sum AS BIGINT) AS b_sum,
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


def decode_blobs(
    blobs: DataFrame, decoder=decode_bmp, blob_col: str = "blob"
) -> DataFrame:
    """The multimodal decode kernel: Arrow-batched ``mapInPandas``
    over (doc_id, <blob_col> binary) emitting typed columns per blob.
    The default ``decoder`` is the real BMP pixel parser; other
    formats (JPEG/PNG via external libraries) plug in through the
    same signature without changing the Spark plan."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            raw = [bytes(b) for b in pdf[blob_col]]
            metas = [decoder(b) for b in raw]
            cols = {
                "doc_id": pdf["doc_id"].to_numpy(np.int64),
                "n_bytes": [len(b) for b in raw],
            }
            for key in (
                "format", "width", "height", "r_sum", "g_sum", "b_sum",
                "mean_byte", "out_w", "out_h", "f0", "f1", "f2", "f3",
            ):
                cols[key] = [m[key] for m in metas]
            yield pd.DataFrame(cols)

    return blobs.select("doc_id", blob_col).mapInPandas(kernel, DECODED_SCHEMA)
