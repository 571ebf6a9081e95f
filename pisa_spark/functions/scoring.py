"""Term scorers: BM25 (primary), QLD, PL2, DPH.

Each reference scorer is a per-(doc, freq) closure
(scorer/index_scorer.hpp:13-27). Here each exists twice:

- a numpy form for the query kernels and build-time block-max
  metadata (vectorized over posting arrays);
- a SQL-expression form usable both by Spark SQL and the DuckDB
  oracle (pure arithmetic on tf/df/doc_len columns + scalar stats),
  so the exhaustive ``ranked_or`` plan is the same text in both
  engines.

BM25 parity (scorer/bm25.hpp:16-52, defaults scorer/scorer.hpp:17-22):
  idf(df)  = max(1e-6, ln((N - df + 0.5) / (df + 0.5))) * (1 + k1)
  score    = idf * tf / (tf + k1 * (1 - b + b * dl / avg_dl))
  b = 0.4, k1 = 0.9.

The reference computes in float32; the kernels support both float32
(reference parity) and float64 (used for the cross-engine DuckDB
gate, where both sides evaluate the identical double expression).
"""

from __future__ import annotations

import numpy as np


def bm25_idf_np(df: np.ndarray, num_docs: float, k1: float = 0.9,
                dtype=np.float64) -> np.ndarray:
    df = np.asarray(df, dtype=dtype)
    idf = np.log((num_docs - df + 0.5) / (df + 0.5), dtype=dtype)
    return np.maximum(dtype(1e-6), idf) * dtype(1.0 + k1)


def bm25_score_np(
    tf: np.ndarray,
    df: np.ndarray,
    doc_len: np.ndarray,
    num_docs: float,
    avg_len: float,
    k1: float = 0.9,
    b: float = 0.4,
    dtype=np.float64,
) -> np.ndarray:
    tf = np.asarray(tf, dtype=dtype)
    dl = np.asarray(doc_len, dtype=dtype)
    idf = bm25_idf_np(df, num_docs, k1, dtype)
    norm = tf + dtype(k1) * (dtype(1.0 - b) + dtype(b) * dl / dtype(avg_len))
    return (idf * tf / norm).astype(dtype)


def dlit(x: float) -> str:
    """A SQL literal guaranteed to be DOUBLE in both Spark and DuckDB.

    Bare decimal literals (``0.5``) parse as DECIMAL in both engines,
    silently pulling surrounding arithmetic into fixed-point (Spark
    decimal division truncates at scale 6 — a 1e-9 relative error that
    breaks cross-engine score equality). CAST of the repr (<=17
    significant digits) recovers the exact IEEE double.
    """
    return f"CAST({float(x)!r} AS DOUBLE)"


def bm25_sql_expr(
    tf: str = "tf",
    df: str = "df",
    doc_len: str = "doc_len",
    num_docs: str = "num_docs",
    avg_len: str = "avg_len",
    k1: float = 0.9,
    b: float = 0.4,
) -> str:
    """ANSI-SQL BM25 — identical text runs on Spark SQL and DuckDB,
    and (with dlit-forced double arithmetic) produces bit-identical
    doubles in both plus numpy for the same (tf, df, dl) inputs."""
    half = dlit(0.5)
    idf = (
        f"(GREATEST({dlit(1e-6)}, LN(({num_docs} - {df} + {half}) / ({df} + {half})))"
        f" * {dlit(1.0 + k1)})"
    )
    norm = f"({tf} + {dlit(k1)} * ({dlit(1.0 - b)} + {dlit(b)} * {doc_len} / {avg_len}))"
    return f"({idf} * {tf} / {norm})"


# ---------------------------------------------------------------------------
# Cross-engine determinism: per-posting micro-unit quantization.
#
# Summing doubles is order-dependent, and SQL engines do not fix an
# order — so `round(SUM(score), 6)` can flip by one rounding step
# between Spark, DuckDB, and numpy (observed in practice). Instead we
# round each per-posting contribution to an int64 count of 1e-6
# "micro" units with FLOOR(x*1e6 + 0.5) — pure IEEE double ops that
# yield the identical integer in every engine — and sum integers,
# which is exact and order-independent. The reported double score is
# micro_sum / 1e6 (one division of an exactly-representable int).
# ---------------------------------------------------------------------------

MICRO = 1_000_000.0


def micro_sql(score_expr: str, weight: str | None = None) -> str:
    """SQL: per-posting (weight * score) quantized to int64 micros."""
    w = f"{weight} * " if weight else ""
    return (
        f"CAST(FLOOR({w}{score_expr} * {dlit(MICRO)} + {dlit(0.5)}) AS BIGINT)"
    )


def to_micro_np(scores: np.ndarray, weight: float = 1.0) -> np.ndarray:
    return np.floor(weight * np.asarray(scores, dtype=np.float64) * MICRO + 0.5).astype(
        np.int64
    )


def qld_sql_expr(
    tf: str = "tf",
    ctf: str = "ctf",
    doc_len: str = "doc_len",
    collection_len: str = "collection_len",
    mu: float = 1000.0,
) -> str:
    """ANSI-SQL Dirichlet LM (scorer/qld.hpp:19-41):
    max(0, ln(1 + tf/(mu*ctf/|C|)) + ln(mu/(dl+mu))) — dual-dialect
    double arithmetic like bm25_sql_expr."""
    m = dlit(mu)
    return (
        f"GREATEST({dlit(0.0)}, LN({dlit(1.0)} + {tf} /"
        f" ({m} * {ctf} / {collection_len}))"
        f" + LN({m} / ({doc_len} + {m})))"
    )


def pl2_sql_expr(
    tf: str = "tf",
    ctf: str = "ctf",
    doc_len: str = "doc_len",
    num_docs: str = "num_docs",
    avg_len: str = "avg_len",
    c: float = 1.0,
) -> str:
    """ANSI-SQL DFR PL2 (scorer/pl2.hpp:19-43, c=1).

    log2(x) is spelled LN(x) * (1/ln 2) in BOTH dialects so the only
    libm call is LN (whose cross-engine agreement the qld entry
    already pins); all constants go through dlit."""
    import math

    l2 = dlit(1.0 / math.log(2.0))
    tfn = f"({tf} * LN({dlit(1.0)} + {dlit(c)} * {avg_len} / {doc_len}) * {l2})"
    lam = f"({ctf} / {num_docs})"
    two_pi = dlit(2.0 * math.pi)
    inner = (
        f"({tfn} * LN({tfn} / {lam}) * {l2}"
        f" + ({lam} - {tfn}) * {dlit(math.log2(math.e))}"
        f" + {dlit(0.5)} * LN({two_pi} * {tfn}) * {l2})"
    )
    return f"GREATEST({dlit(0.0)}, {inner} / ({tfn} + {dlit(1.0)}))"


def dph_sql_expr(
    tf: str = "tf",
    ctf: str = "ctf",
    doc_len: str = "doc_len",
    num_docs: str = "num_docs",
    avg_len: str = "avg_len",
) -> str:
    """ANSI-SQL parameter-free DFR DPH (scorer/dph.hpp:20-39); same
    LN-only spelling as pl2_sql_expr. tf == doc_len (a document that
    is one repeated term) makes the reference's float math NaN
    (0 * -inf); both the numpy form and this SQL clamp that edge to
    0."""
    import math

    l2 = dlit(1.0 / math.log(2.0))
    f = f"(CAST({tf} AS DOUBLE) / {doc_len})"
    norm = f"(({dlit(1.0)} - {f}) * ({dlit(1.0)} - {f}) / ({tf} + {dlit(1.0)}))"
    two_pi = dlit(2.0 * math.pi)
    inner = (
        f"({tf} * LN({tf} * {avg_len} / {doc_len} * {num_docs} / {ctf}) * {l2}"
        f" + {dlit(0.5)} * LN({two_pi} * {tf} * ({dlit(1.0)} - {f})) * {l2})"
    )
    return (
        f"(CASE WHEN {tf} < {doc_len}"
        f" THEN GREATEST({dlit(0.0)}, {norm} * {inner})"
        f" ELSE {dlit(0.0)} END)"
    )


def qld_score_np(
    tf: np.ndarray, ctf: np.ndarray, doc_len: np.ndarray,
    collection_len: float, mu: float = 1000.0, dtype=np.float64,
) -> np.ndarray:
    """Dirichlet LM (scorer/qld.hpp:19-41):
    max(0, ln(1 + tf / (mu * ctf / |C|)) + ln(mu / (dl + mu)))."""
    tf = np.asarray(tf, dtype=dtype)
    ctf = np.asarray(ctf, dtype=dtype)
    dl = np.asarray(doc_len, dtype=dtype)
    s = np.log1p(tf / (dtype(mu) * ctf / dtype(collection_len))) + np.log(
        dtype(mu) / (dl + dtype(mu))
    )
    return np.maximum(dtype(0), s).astype(dtype)


def pl2_score_np(
    tf: np.ndarray, ctf: np.ndarray, doc_len: np.ndarray,
    num_docs: float, avg_len: float, collection_len: float,
    c: float = 1.0, dtype=np.float64,
) -> np.ndarray:
    """DFR PL2 (scorer/pl2.hpp:19-43), c=1 default."""
    tf = np.asarray(tf, dtype=dtype)
    ctf = np.asarray(ctf, dtype=dtype)
    dl = np.asarray(doc_len, dtype=dtype)
    tfn = tf * np.log2(dtype(1.0) + dtype(c) * dtype(avg_len) / dl)
    lam = ctf / dtype(num_docs)
    with np.errstate(divide="ignore", invalid="ignore"):
        s = (
            tfn * np.log2(tfn / lam)
            + (lam - tfn) * np.log2(np.e)
            + 0.5 * np.log2(2 * np.pi * tfn)
        ) / (tfn + dtype(1.0))
    return np.where(tfn > 0, np.maximum(dtype(0), s), dtype(0)).astype(dtype)


def dph_score_np(
    tf: np.ndarray, ctf: np.ndarray, doc_len: np.ndarray,
    num_docs: float, avg_len: float, collection_len: float,
    dtype=np.float64,
) -> np.ndarray:
    """Parameter-free DFR DPH (scorer/dph.hpp:20-39).

    The tf == doc_len edge (a document that is one repeated term) is
    clamped to 0 like dph_sql_expr: the raw float math there is
    0 * -inf = NaN, and np.maximum(0, NaN) PROPAGATES the NaN —
    which to_micro_np would then turn into a garbage int64."""
    tf = np.asarray(tf, dtype=dtype)
    ctf = np.asarray(ctf, dtype=dtype)
    dl = np.asarray(doc_len, dtype=dtype)
    f = tf / dl
    norm = (dtype(1.0) - f) * (dtype(1.0) - f) / (tf + dtype(1.0))
    with np.errstate(divide="ignore", invalid="ignore"):
        s = norm * (
            tf * np.log2(tf * dtype(avg_len) / dl * dtype(num_docs) / ctf)
            + 0.5 * np.log2(2 * np.pi * tf * (dtype(1.0) - f))
        )
    return np.where(
        (tf > 0) & (tf < dl), np.maximum(dtype(0), s), dtype(0)
    ).astype(dtype)
