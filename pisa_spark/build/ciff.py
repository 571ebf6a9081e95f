"""Common Index File Format (CIFF) import/export.

Reference parity: the reference consumes CIFF indexes through the
external ``ciff2pisa`` tool (docs/source/indexing_pipeline.md:24-28),
which converts a CIFF file into the uncompressed binary_collection
triple that ``bincoll.py`` already imports. This module removes that
external hop: it reads CIFF directly into the engine's postings /
doc-metadata tables.

Wire format (public spec, github.com/osirrc/ciff — CommonIndexFileFormat.proto):
a single file holding a DELIMITED protobuf stream — each message is
prefixed by a varint byte length — laid out as

    Header, PostingsList * header.num_postings_lists,
    DocRecord * header.num_docs

with messages

    Header       { 1:int32 version, 2:int32 num_postings_lists,
                   3:int32 num_docs, 4:int32 total_postings_lists,
                   5:int32 total_docs, 6:int64 total_terms_in_collection,
                   7:double average_doclength, 8:string description }
    Posting      { 1:int32 docid (GAP-encoded within its list), 2:int32 tf }
    PostingsList { 1:string term, 2:int64 df, 3:int64 cf,
                   4:repeated Posting postings }
    DocRecord    { 1:int32 docid, 2:string collection_docid, 3:int32 doclength }

The decoder below is a dependency-free protobuf *wire* walker for
exactly this schema: varints, length-delimited fields, 64-bit doubles,
unknown fields skipped by wire type (forward compatible). Like the
binary_collection format, a CIFF file has no sync marks, so one file
is unsplittable — parallelism is per FILE (shard large exports;
Spark's binaryFile row limit of 2 GB applies, same documented limit
as bincoll.py). Parsing runs executor-side via mapInPandas; the
driver never touches the payload.
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

_WT_VARINT, _WT_I64, _WT_LEN, _WT_I32 = 0, 1, 2, 5


def _read_varint(buf, pos: int) -> tuple[int, int]:
    out = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint overflows 64 bits")


def _fields(buf) -> Iterator[tuple[int, int, object]]:
    """Yield (field_no, wire_type, value) over one message's bytes.
    Varints come back as int, length-delimited as memoryview, i64 as
    raw 8 bytes; unknown wire types fail loudly."""
    pos, end = 0, len(buf)
    while pos < end:
        key, pos = _read_varint(buf, pos)
        fno, wt = key >> 3, key & 7
        if wt == _WT_VARINT:
            v, pos = _read_varint(buf, pos)
        elif wt == _WT_LEN:
            n, pos = _read_varint(buf, pos)
            v = buf[pos:pos + n]
            pos += n
        elif wt == _WT_I64:
            v = buf[pos:pos + 8]
            pos += 8
        elif wt == _WT_I32:
            v = buf[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported protobuf wire type {wt}")
        yield fno, wt, v


def _delimited(buf) -> Iterator[memoryview]:
    """Yield each length-prefixed message's bytes."""
    pos, end = 0, len(buf)
    while pos < end:
        n, pos = _read_varint(buf, pos)
        yield buf[pos:pos + n]
        pos += n


def parse_ciff_header(blob: bytes) -> dict:
    """File bytes -> Header dict from the first delimited message
    (local helper; headers are a handful of scalars)."""
    return _header_from_msg(next(_delimited(memoryview(blob))))


def _header_from_msg(msg) -> dict:
    out = {
        "version": 0, "num_postings_lists": 0, "num_docs": 0,
        "total_postings_lists": 0, "total_docs": 0,
        "total_terms_in_collection": 0, "average_doclength": 0.0,
        "description": "",
    }
    names = {1: "version", 2: "num_postings_lists", 3: "num_docs",
             4: "total_postings_lists", 5: "total_docs",
             6: "total_terms_in_collection"}
    for fno, wt, v in _fields(msg):
        if fno in names and wt == _WT_VARINT:
            out[names[fno]] = int(v)
        elif fno == 7 and wt == _WT_I64:
            out["average_doclength"] = float(np.frombuffer(v, "<f8")[0])
        elif fno == 8 and wt == _WT_LEN:
            out["description"] = bytes(v).decode("utf-8")
    return out


def _parse_postings_list(msg) -> tuple[str, int, int, np.ndarray, np.ndarray]:
    term, df, cf = "", 0, 0
    gaps: list[int] = []
    tfs: list[int] = []
    for fno, wt, v in _fields(msg):
        if fno == 1 and wt == _WT_LEN:
            term = bytes(v).decode("utf-8")
        elif fno == 2 and wt == _WT_VARINT:
            df = int(v)
        elif fno == 3 and wt == _WT_VARINT:
            cf = int(v)
        elif fno == 4 and wt == _WT_LEN:
            d = t = 0
            for pfno, pwt, pv in _fields(v):
                if pfno == 1 and pwt == _WT_VARINT:
                    d = int(pv)
                elif pfno == 2 and pwt == _WT_VARINT:
                    t = int(pv)
            gaps.append(d)
            tfs.append(t)
    # CIFF docids are gap-encoded within each list: first absolute,
    # rest deltas — decode to absolute ids.
    docids = np.cumsum(np.asarray(gaps, dtype=np.int64))
    return term, df, cf, docids, np.asarray(tfs, dtype=np.int64)


_ROW_SCHEMA = (
    "file string, kind int, list_no long, n_lists long, term string, "
    "doc_id long, tf long, collection_docid string, doc_len long"
)
_K_MARKER, _K_POSTING, _K_DOC = 0, 1, 2


def _ciff_rows(spark: SparkSession, path: str,
               postings: bool, docs: bool) -> DataFrame:
    """One binaryFile scan + one delimited walk per file, emitting a
    kind-tagged frame holding whichever of the two CIFF tables the
    caller wants (skipped sections cost only their length-prefix
    slices — the walker never parses message fields it won't emit).
    A full import reads every byte exactly once; ciff_postings /
    ciff_docs / ciff_import all derive from this kernel."""
    raw = spark.read.format("binaryFile").load(path).select(
        F.col("path").alias("file"), "content"
    )

    def _pad(cols: dict, n: int) -> pd.DataFrame:
        base = {
            "kind": np.zeros(n, dtype=np.int32),
            "list_no": np.full(n, -1, dtype=np.int64),
            "n_lists": np.zeros(n, dtype=np.int64),
            "term": "",
            "doc_id": np.full(n, -1, dtype=np.int64),
            "tf": np.zeros(n, dtype=np.int64),
            "collection_docid": "",
            "doc_len": np.zeros(n, dtype=np.int64),
        }
        base.update(cols)
        return pd.DataFrame(base)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for file, blob in zip(b["file"], b["content"]):
                buf = memoryview(bytes(blob))
                msgs = _delimited(buf)
                hdr = _header_from_msg(next(msgs))
                n_lists = hdr["num_postings_lists"]
                if postings:
                    # One marker row per file (list_no=-1): offsets
                    # derive from the HEADER's list count, so
                    # zero-posting lists (df=0) and even all-empty
                    # shard files keep the term_id =
                    # global-list-position contract intact — a
                    # rows-only count would undercount them and
                    # collide term_ids across shards.
                    yield _pad(
                        {
                            "file": [file],
                            "kind": np.asarray([_K_MARKER], np.int32),
                            "n_lists": np.asarray([n_lists], np.int64),
                        },
                        1,
                    )
                for li in range(n_lists):
                    msg = next(msgs)
                    if not postings:
                        continue  # length-prefix skip only
                    term, df, cf, docids, tfs = _parse_postings_list(msg)
                    if df and df != len(docids):
                        raise ValueError(
                            f"CIFF list {term!r} in {file}: df={df} "
                            f"but {len(docids)} postings"
                        )
                    yield _pad(
                        {
                            "file": file,
                            "kind": np.int32(_K_POSTING),
                            "list_no": np.int64(li),
                            "n_lists": np.int64(n_lists),
                            "term": term,
                            "doc_id": docids,
                            "tf": tfs,
                        },
                        len(docids),
                    )
                if not docs:
                    continue
                ids, exts, lens = [], [], []
                for _ in range(hdr["num_docs"]):
                    did, ext, dl = 0, "", 0
                    for fno, wt, v in _fields(next(msgs)):
                        if fno == 1 and wt == _WT_VARINT:
                            did = int(v)
                        elif fno == 2 and wt == _WT_LEN:
                            ext = bytes(v).decode("utf-8")
                        elif fno == 3 and wt == _WT_VARINT:
                            dl = int(v)
                    ids.append(did)
                    exts.append(ext)
                    lens.append(dl)
                yield _pad(
                    {
                        "file": file,
                        "kind": np.int32(_K_DOC),
                        "doc_id": np.asarray(ids, dtype=np.int64),
                        "collection_docid": exts,
                        "doc_len": np.asarray(lens, dtype=np.int64),
                    },
                    len(ids),
                )

    return raw.mapInPandas(kernel, _ROW_SCHEMA)


def _postings_from_rows(spark: SparkSession, rows: DataFrame) -> DataFrame:
    """Marker rows -> per-file term_id offsets (natural shard order,
    the bincoll pattern), applied to the posting rows."""
    from pisa_spark.build.bincoll import _natural_key

    counts = (
        rows.filter(F.col("kind") == _K_MARKER)
        .select("file", "n_lists")
        .toPandas()
    )
    counts = counts.sort_values(
        "file", key=lambda s: s.map(_natural_key)
    ).reset_index(drop=True)
    counts["off"] = counts["n_lists"].cumsum().shift(fill_value=0)
    offs = spark.createDataFrame(counts[["file", "off"]])
    return (
        rows.filter(F.col("kind") == _K_POSTING)
        .join(F.broadcast(offs), "file")
        .select(
            (F.col("off") + F.col("list_no")).alias("term_id"),
            "term",
            "doc_id",
            F.col("tf").cast("int").alias("tf"),
        )
    )


def _docs_from_rows(rows: DataFrame) -> DataFrame:
    return rows.filter(F.col("kind") == _K_DOC).select(
        "doc_id", "collection_docid", F.col("doc_len").cast("int")
    )


def ciff_import(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """Full import: (postings, docs) off ONE read + parse of every
    file — the parsed rows are eagerly checkpointed so neither derived
    table re-scans the CIFF bytes (binaryFile rows are unsplittable
    whole-file payloads; reading them twice doubles import I/O)."""
    rows = _ciff_rows(spark, path, postings=True, docs=True)
    rows = rows.localCheckpoint(eager=True)
    return _postings_from_rows(spark, rows), _docs_from_rows(rows)


def ciff_postings(spark: SparkSession, path: str) -> DataFrame:
    """CIFF file(s) -> (term_id, term, doc_id, tf) — the engine's
    postings table plus the term surface form (term_id = postings-list
    position, the same contract the lexicon/build stages use; sharded
    inputs number term_ids globally in natural shard order via the
    bincoll offset pattern). Use ciff_import for postings AND docs —
    it shares one scan.

    Per-row parity with ciff2pisa: identical (term, docid, tf)
    triples — the tool emits the lists in file order with gap-decoded
    docids, exactly this walk."""
    rows = _ciff_rows(spark, path, postings=True, docs=False)
    # Global term_id across shards needs the marker counts (a second
    # pass over the parsed rows) — checkpoint so the file bytes are
    # still read once.
    rows = rows.localCheckpoint(eager=True)
    return _postings_from_rows(spark, rows)


def ciff_docs(spark: SparkSession, path: str) -> DataFrame:
    """CIFF file(s) -> (doc_id, collection_docid, doc_len) — doc
    metadata (the doc_sizes shape plus the external docid map the
    reference keeps in its .documents lexicon). Use ciff_import for
    postings AND docs — it shares one scan."""
    return _docs_from_rows(_ciff_rows(spark, path, postings=False, docs=True))


# ------------------------------------------------------------------ export


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _len_field(fno: int, payload: bytes) -> bytes:
    return _varint((fno << 3) | _WT_LEN) + _varint(len(payload)) + payload


def _varint_field(fno: int, v: int) -> bytes:
    return _varint((fno << 3) | _WT_VARINT) + _varint(v)


def write_ciff(
    path: str | Path,
    postings: list[tuple[str, list[tuple[int, int]]]],
    docs: list[tuple[int, str, int]],
    description: str = "pisa_spark export",
    average_doclength: float | None = None,
) -> None:
    """Export helper (format parity / test fixtures): write a CIFF
    file from per-term absolute-docid postings and doc records.
    LOCAL, sequential — the format is; shard large exports across
    files like the bincoll exporter."""
    total_terms = sum(dl for _, _, dl in docs)
    if average_doclength is None:
        average_doclength = total_terms / len(docs) if docs else 0.0
    hdr = (
        _varint_field(1, 1)
        + _varint_field(2, len(postings))
        + _varint_field(3, len(docs))
        + _varint_field(4, len(postings))
        + _varint_field(5, len(docs))
        + _varint_field(6, total_terms)
        + _varint((7 << 3) | _WT_I64)
        + np.float64(average_doclength).tobytes()
        + _len_field(8, description.encode("utf-8"))
    )
    with open(path, "wb") as f:
        f.write(_varint(len(hdr)) + hdr)
        for term, plist in postings:
            body = _len_field(1, term.encode("utf-8"))
            body += _varint_field(2, len(plist))
            body += _varint_field(3, sum(tf for _, tf in plist))
            prev = 0
            for docid, tf in plist:
                p = _varint_field(1, docid - prev) + _varint_field(2, tf)
                prev = docid
                body += _len_field(4, p)
            f.write(_varint(len(body)) + body)
        for did, ext, dl in docs:
            body = (
                _varint_field(1, did)
                + _len_field(2, ext.encode("utf-8"))
                + _varint_field(3, dl)
            )
            f.write(_varint(len(body)) + body)
