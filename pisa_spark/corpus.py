"""Deterministic synthetic Common-Crawl-style corpus + query workload.

Generates the BASELINE.json ``input_hint`` table shape
``pages(url string, warc_ts timestamp, html binary, text string,
lang string)`` fully distributed (``spark.range`` + ``mapInPandas``)
and fully deterministic regardless of partitioning: every value is a
pure function of ``(seed, doc_index)`` via a vectorized splitmix64
hash — no RNG state crosses rows, so the same doc_index yields the
same page at any scale or parallelism.

Term draws follow a Zipf(s) distribution over a ``term%06d``
vocabulary (inverse-CDF via searchsorted) so head-term skew is
realistic (FIXTURES.md §1); a small fraction of docs carry
abbreviation/possessive surface forms to exercise the
EnglishTokenizer classes.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)

_EPOCH = np.datetime64("2024-01-01T00:00:00")


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constants)."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _hash_u(seed: int, stream: int, idx: np.ndarray) -> np.ndarray:
    """Deterministic uniform uint64 per (seed, stream, idx)."""
    base = np.uint64(seed) * np.uint64(0x100000001B3) + np.uint64(stream)
    return _splitmix64(idx.astype(np.uint64) ^ _splitmix64(np.full_like(idx, base, dtype=np.uint64)))


def zipf_cdf(vocab_size: int, s: float = 1.1) -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, vocab_size + 1, dtype=np.float64), s)
    c = np.cumsum(w)
    return c / c[-1]


def _gen_batch(
    idx: np.ndarray, seed: int, vocab_size: int, s: float,
    min_len: int, max_len: int,
) -> pd.DataFrame:
    cdf = zipf_cdf(vocab_size, s)
    span = max_len - min_len + 1
    lens = (min_len + (_hash_u(seed, 1, idx) % np.uint64(span))).astype(np.int64)
    total = int(lens.sum())
    doc_of_tok = np.repeat(idx, lens)
    tok_pos = np.concatenate([np.arange(n) for n in lens]) if total else np.empty(0, np.int64)
    # uint64 throughout: a mixed int64*uint64 product goes through
    # numpy's signed/unsigned promotion (float64 on numpy 1.x — keys
    # above 2^53 would collapse; wrapping int64 on 2.x) and the
    # any-scale determinism contract needs exact integer keys
    u = _hash_u(
        seed, 2,
        doc_of_tok.astype(np.uint64) * np.uint64(1 << 20)
        + tok_pos.astype(np.uint64),
    )
    uf = (u >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    ranks = np.searchsorted(cdf, uf, side="right")  # 0..V-1, Zipf-skewed
    tok_strs = np.char.add("term", np.char.zfill(ranks.astype("U7"), 6))
    # Rebuild per-doc texts.
    bounds = np.cumsum(lens)[:-1]
    texts = [" ".join(t) for t in np.split(tok_strs, bounds)]
    # ~2% of docs get tokenizer-exercising surface forms appended.
    special = _hash_u(seed, 3, idx) % np.uint64(100)
    for i in np.flatnonzero(special < 1):
        texts[i] += " U.S.A. research"
    for i in np.flatnonzero(special == 1):
        texts[i] += " crawler's archive"
    lang_h = _hash_u(seed, 4, idx) % np.uint64(100)
    langs = np.where(lang_h < 3, "de", np.where(lang_h < 5, "fr", "en"))
    urls = [f"https://site{int(i) // 10:05d}.example/page{int(i):010d}" for i in idx]
    ts = _EPOCH + idx.astype("timedelta64[s]")
    html = [f"<html><body>{t}</body></html>".encode() for t in texts]
    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": pd.Series(ts),
            "html": html,
            "text": texts,
            "lang": langs,
        }
    )


def synth_pages(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    vocab_size: int = 20_000,
    zipf_s: float = 1.1,
    min_len: int = 10,
    max_len: int = 500,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic pages table (input_hint shape)."""
    parts = partitions or max(4, spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            idx = b["id"].to_numpy(dtype=np.int64)
            yield _gen_batch(idx, seed, vocab_size, zipf_s, min_len, max_len)

    return spark.range(0, n_docs, numPartitions=parts).mapInPandas(gen, PAGES_SCHEMA)


def synth_queries(
    n_queries: int,
    seed: int = 42,
    vocab_size: int = 20_000,
    zipf_s: float = 1.1,
    max_terms: int = 7,
) -> pd.DataFrame:
    """Query workload mirroring the reference's 100-query fixture
    (1-7 terms each, mixed head/tail frequency, duplicates allowed —
    the weighted-query path, src/query/queries.cpp:107-120)."""
    cdf = zipf_cdf(vocab_size, zipf_s)
    idx = np.arange(n_queries, dtype=np.int64)
    n_terms = 1 + (_hash_u(seed, 10, idx) % np.uint64(max_terms)).astype(np.int64)
    rows = []
    for qi in range(n_queries):
        tpos = np.arange(n_terms[qi], dtype=np.int64)
        u = _hash_u(
            seed, 11,
            np.uint64(qi) * np.uint64(1 << 10) + tpos.astype(np.uint64),
        )
        uf = (u >> np.uint64(11)).astype(np.float64) / float(1 << 53)
        ranks = np.searchsorted(cdf, uf, side="right")
        terms = [f"term{r:06d}" for r in ranks]
        rows.append((f"q{qi:04d}", terms, 10))
    return pd.DataFrame(rows, columns=["query_id", "terms", "k"])


def pages_source(
    spark: SparkSession,
    source: str,
    fmt: str | None = None,
) -> DataFrame:
    """input_hint pages table from any Spark source.

    ``source`` is either a catalog table name (e.g. an ICEBERG table
    — ``spark.read.table`` goes through the configured catalog, so
    snapshot isolation, hidden partitioning, and partition/file
    pruning come for free on a real cluster; the north-star input is
    an Iceberg table of Common-Crawl-style pages) or a filesystem
    path read with ``fmt`` (default parquet). This sandbox ships no
    Iceberg runtime jar, so catalog reads are exercised on clusters;
    the path branch is tested here — the engine itself only depends
    on the input_hint SCHEMA, never on the storage format.

    Validates the required columns and prunes to exactly the
    input_hint shape (column pruning reaches the scan).

    Disambiguation: ``fmt="table"`` FORCES the catalog branch
    (cwd-independent — use it for bare table names that could
    collide with a local file); any other explicit ``fmt`` reads a
    path; with no ``fmt``, a string that exists on the local
    filesystem (relative file like ``pages.parquet``, ``./dir``) is
    read as a path, and only a non-path-looking name falls through
    to the catalog — a cwd-relative file is never misread as a table
    of the same name."""
    import os

    is_local = "://" not in source and os.path.exists(source)
    looks_like_path = "/" in source or is_local
    if fmt == "table" or (fmt is None and not looks_like_path):
        df = spark.read.table(source)
    else:
        # Spark resolves relative paths against ITS working dir, not
        # the caller's cwd — absolutize local paths so both agree.
        df = spark.read.format(fmt or "parquet").load(
            os.path.abspath(source) if is_local else source
        )
    required = ["url", "warc_ts", "html", "text", "lang"]
    missing = [c for c in required if c not in df.columns]
    if missing:
        raise ValueError(
            f"pages source {source!r} is missing input_hint columns: {missing}"
        )
    return df.select(*required)


def pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive an input_hint-shaped pages table from the driver's
    ``documents`` parquet (deterministic; used by the gated queries so
    the DuckDB oracle can derive the identical table from its view)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.concat(F.lit("https://example.com/doc/"), F.lpad(F.col("doc_id").cast("string"), 10, "0")).alias("url"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("warc_ts"),
        F.encode(F.concat(F.lit("<html><body>"), F.col("text"), F.lit("</body></html>")), "utf-8").alias("html"),
        F.col("text"),
        F.col("lang"),
        F.col("doc_id"),
    )

def to_trec_format(
    docs: "DataFrame", id_col: str = "url", text_col: str = "text"
) -> "DataFrame":
    """One TREC-formatted SGML block per document — the reference's
    script/files2trec.py (<DOC><DOCNO>id</DOCNO><TEXT>body</TEXT></DOC>,
    the document id playing the relative-path role). Returns a
    one-column (``trec`` string) DataFrame; write with
    ``df.write.text`` for the file the script produces."""
    from pyspark.sql import functions as F

    return docs.select(
        F.concat(
            F.lit("<DOC>\n<DOCNO>"), F.col(id_col).cast("string"),
            F.lit("</DOCNO>\n<TEXT>\n"), F.col(text_col),
            F.lit("</TEXT>\n</DOC>\n"),
        ).alias("trec")
    )
