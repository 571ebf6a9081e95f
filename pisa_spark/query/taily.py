"""Taily shard selection (Aly, Hiemstra & Demeester, CIKM 2013).

The reference wires per-term score moments (taily_stats.hpp:24-169)
into the external ``taily`` library's ``score_shards`` (used by
tools/taily_stats.cpp + tools/shards.cpp:60-66). This module
implements the published algorithm on top of our per-(shard, term)
moment tables (build.shards.shard_term_stats):

- per shard i and query Q: docs containing ALL terms estimated as
  ``n_i = |shard_i| * prod_t (df_{t,i} / |shard_i|)`` (independence);
  their score distribution is Gamma with moment-matched shape/scale
  from ``E_i = sum_t E_{t,i}``, ``Var_i = sum_t Var_{t,i}``;
- the global threshold ``s_c`` is the score whose expected global
  count of docs above it equals ``n_c`` (bisection on the mixture
  survival function);
- shard score = ``n_i * P(X_i > s_c)`` — the expected number of
  top-documents the shard contributes; shards are ranked by it.

The regularized incomplete gamma is implemented in numpy (series +
continued fraction, Numerical-Recipes style) since scipy is not
available.

Two entry points:
- ``rank_shards_for_queries`` — pandas/numpy, driver-side (unit
  tests, tiny fixtures);
- ``rank_shards_distributed`` — the scale path: the vocabulary-sized
  moment table is pruned by a broadcast join with the workload's
  terms, then each query's shard scoring runs inside an
  ``applyInPandas`` group. Nothing vocabulary- or corpus-sized ever
  reaches the driver.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _gammainc_lower_reg(k: float, x: float) -> float:
    """Regularized lower incomplete gamma P(k, x), k>0, x>=0."""
    if x <= 0:
        return 0.0
    lg = math.lgamma(k)
    if x < k + 1:
        # series expansion
        term = 1.0 / k
        total = term
        a = k
        for _ in range(500):
            a += 1.0
            term *= x / a
            total += term
            if abs(term) < abs(total) * 1e-14:
                break
        return total * math.exp(-x + k * math.log(x) - lg)
    # continued fraction for Q(k, x)
    tiny = 1e-300
    b = x + 1.0 - k
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, 500):
        an = -i * (i - k)
        b += 2.0
        d = an * d + b
        if abs(d) < tiny:
            d = tiny
        c = b + an / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 1e-14:
            break
    q = math.exp(-x + k * math.log(x) - lg) * h
    return 1.0 - q


def gamma_sf(e: float, var: float, s: float) -> float:
    """P(X > s) for a moment-matched Gamma(shape=e^2/var, scale=var/e);
    degenerate cases: no mass -> 0/1 step at e."""
    if e <= 0:
        return 0.0
    if var <= 0:
        return 1.0 if e > s else 0.0
    k = e * e / var
    theta = var / e
    return 1.0 - _gammainc_lower_reg(k, s / theta)


def score_shards(
    shard_any: np.ndarray,  # n_i: estimated all-terms doc count per shard
    shard_e: np.ndarray,  # E_i
    shard_var: np.ndarray,  # Var_i
    n_c: int = 100,
) -> np.ndarray:
    """taily::score_shards: expected contribution of each shard to the
    global top-n_c by score; bisection finds the global cutoff."""
    alive = shard_any > 0
    if not alive.any():
        return np.zeros(len(shard_any))

    def count_above(s: float) -> float:
        return float(
            sum(
                n * gamma_sf(e, v, s)
                for n, e, v in zip(shard_any[alive], shard_e[alive], shard_var[alive])
            )
        )

    total = count_above(0.0)
    if total <= n_c:
        s_c = 0.0
    else:
        lo, hi = 0.0, float((shard_e + 6 * np.sqrt(np.maximum(shard_var, 0))).max())
        for _ in range(80):
            mid = (lo + hi) / 2
            if count_above(mid) > n_c:
                lo = mid
            else:
                hi = mid
        s_c = (lo + hi) / 2
    return np.array(
        [
            n * gamma_sf(e, v, s_c) if n > 0 else 0.0
            for n, e, v in zip(shard_any, shard_e, shard_var)
        ]
    )


def rank_shards_distributed(
    parsed,  # DataFrame(query_id, term_id[, ...])
    moments,  # DataFrame(shard_id, term_id, df, sum_micro, sum_micro_sq)
    shard_docs: dict[int, int],  # shard_id -> num docs (n_shards entries)
    n_c: int = 100,
):
    """(query_id, shard_id, score, rank) as a DataFrame — the
    distributed form of rank_shards_for_queries: moments are pruned by
    a broadcast join with the (tiny) workload term set and each
    query's Gamma scoring runs in its own applyInPandas group. Only
    the n_shards-entry size dict rides the closure."""
    import pandas as pd
    from pyspark.sql import functions as F

    qterms = parsed.select("query_id", "term_id").distinct()
    nterms = qterms.groupBy("query_id").agg(F.count("*").alias("n_terms"))
    joined = (
        moments.join(F.broadcast(qterms), "term_id")
        .join(F.broadcast(nterms), "query_id")
    )
    shard_ids = sorted(shard_docs)
    sizes = {int(k): int(v) for k, v in shard_docs.items()}

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = pdf["query_id"].iloc[0]
        n_terms = int(pdf["n_terms"].iloc[0])
        pdf = pdf.sort_values(["shard_id", "term_id"])
        n_any = np.zeros(len(shard_ids))
        e = np.zeros(len(shard_ids))
        var = np.zeros(len(shard_ids))
        for si, sid in enumerate(shard_ids):
            g = pdf[pdf["shard_id"] == sid]
            if len(g) < n_terms:  # a missing term zeroes the product
                n_any[si] = 0.0
            else:
                n_any[si] = float(sizes[sid]) * math.prod(
                    float(df) / sizes[sid] for df in g["df"]
                )
            et = (g["sum_micro"] / g["df"]) / 1e6
            vt = np.maximum(
                0.0, (g["sum_micro_sq"] / g["df"]) / 1e12 - et * et
            )
            e[si] = float(et.sum())
            var[si] = float(vt.sum())
        scores = score_shards(n_any, e, var, n_c)
        order = np.argsort(-scores, kind="stable")
        rank = np.empty(len(shard_ids), dtype=np.int64)
        rank[order] = np.arange(1, len(shard_ids) + 1)
        return pd.DataFrame(
            {
                "query_id": qid,
                "shard_id": np.array(shard_ids, dtype=np.int64),
                "score": scores,
                "rank": rank,
            }
        )

    ranked = joined.groupBy("query_id").applyInPandas(
        run, "query_id string, shard_id long, score double, rank long"
    )
    # A query whose terms ALL miss the moments table (e.g. ids from
    # another index generation) has no applyInPandas group and would
    # silently vanish — emit every shard at score 0 ranked in shard
    # order instead, matching rank_shards_for_queries (which scores
    # such a query 0 everywhere). The missing set is workload-sized.
    spark = parsed.sparkSession
    zero_rows = spark.createDataFrame(
        [(int(s), 0.0, i + 1) for i, s in enumerate(shard_ids)],
        "shard_id long, score double, rank long",
    )
    missing = (
        parsed.select("query_id").distinct()
        .join(moments.join(F.broadcast(qterms), "term_id")
              .select("query_id").distinct(), "query_id", "left_anti")
    )
    return ranked.unionByName(
        missing.crossJoin(F.broadcast(zero_rows))
        .select("query_id", "shard_id", "score", "rank")
    )


def rank_shards_for_queries(
    queries: dict[str, list[int]],  # query_id -> term_ids
    moments: "pd.DataFrame",  # shard_id, term_id, df, sum_micro, sum_micro_sq
    shard_docs: dict[int, int],  # shard_id -> num docs
    n_c: int = 100,
) -> "pd.DataFrame":
    """(query_id, shard_id, score, rank) — rank shards per query by
    expected top-n_c contribution. Moments are micro-int sums from
    shard_term_stats; converted to E/Var in score units here."""
    import pandas as pd

    m = moments.set_index(["shard_id", "term_id"])
    shard_ids = sorted(shard_docs)
    rows = []
    for qid, term_ids in queries.items():
        n_any = np.array(
            [
                float(shard_docs[sid])
                * math.prod(
                    (m.loc[(sid, t), "df"] / shard_docs[sid])
                    if (sid, t) in m.index else 0.0
                    for t in term_ids
                )
                for sid in shard_ids
            ]
        )
        e = np.zeros(len(shard_ids))
        var = np.zeros(len(shard_ids))
        for si, sid in enumerate(shard_ids):
            for t in term_ids:
                if (sid, t) in m.index:
                    r = m.loc[(sid, t)]
                    et = (r["sum_micro"] / r["df"]) / 1e6
                    vt = max(
                        0.0,
                        (r["sum_micro_sq"] / r["df"]) / 1e12 - et * et,
                    )
                    e[si] += et
                    var[si] += vt
        scores = score_shards(n_any, e, var, n_c)
        order = np.argsort(-scores, kind="stable")
        rank = np.empty(len(shard_ids), dtype=np.int64)
        rank[order] = np.arange(1, len(shard_ids) + 1)
        for si, sid in enumerate(shard_ids):
            rows.append((qid, sid, float(scores[si]), int(rank[si])))
    return pd.DataFrame(rows, columns=["query_id", "shard_id", "score", "rank"])


def estimate_cutoff(n_any: float, e: float, var: float, k: int) -> float:
    """taily::estimate_cutoff (tools/taily_thresholds.cpp:24-26 via
    taily_thresholds.hpp estimate_taily_thresholds): the score s at
    which the EXPECTED number of documents scoring above s equals k
    under the moment-matched Gamma model — the single-collection case
    of score_shards' global-cutoff bisection.

    This is a statistical ESTIMATE of the k-th score (the reference
    prints it for threshold-prediction experiments), NOT a sound
    lower bound: never feed it to the executors' ``thresholds``
    input, which promises soundness (query/executor.py topk_*)."""
    if n_any <= 0 or e <= 0 or n_any <= k:
        return 0.0
    if var <= 0:
        # point mass at e: expected count above s jumps n_any -> 0
        return float(e)
    hi = e + 6.0 * math.sqrt(var)
    for _ in range(60):
        if n_any * gamma_sf(e, var, hi) <= k:
            break
        hi *= 2.0
    lo = 0.0
    for _ in range(80):
        mid = (lo + hi) / 2.0
        if n_any * gamma_sf(e, var, mid) > k:
            lo = mid
        else:
            hi = mid
    return (lo + hi) / 2.0


def estimate_taily_thresholds(parsed, moments, num_docs: int, k: int = 10):
    """(query_id, threshold) — the taily_thresholds tool, distributed.

    ``moments`` are the GLOBAL per-term score moments (term_id, df,
    sum_micro, sum_micro_sq — shard_term_stats with one shard). The
    per-query Gamma aggregates are pure Catalyst: E = Σ E_t, Var =
    Σ Var_t (per-term clamped at 0), and the all-terms doc estimate
    n_any = n·Π(df_t/n) computed as a log-sum (no underflow at web
    scale). Only the final scalar bisection runs in an Arrow batch —
    one row per QUERY, never per posting. Thresholds are estimates in
    score units (see estimate_cutoff's soundness caveat)."""
    from pyspark.sql import functions as F

    qterms = parsed.select("query_id", "term_id").distinct()
    n = float(num_docs)
    e_t = F.col("sum_micro") / F.col("df") / F.lit(1e6)
    var_t = F.greatest(
        F.lit(0.0),
        F.col("sum_micro_sq") / F.col("df") / F.lit(1e12) - e_t * e_t,
    )
    agg = (
        moments.join(F.broadcast(qterms), "term_id")
        .groupBy("query_id")
        .agg(
            F.sum(e_t).alias("e"),
            F.sum(var_t).alias("var"),
            (F.exp(F.sum(F.log(F.col("df") / F.lit(n)))) * F.lit(n))
            .alias("n_any"),
        )
    )

    @F.pandas_udf("double")
    def cut(n_any: pd.Series, e: pd.Series, var: pd.Series) -> pd.Series:
        return pd.Series(
            [
                estimate_cutoff(float(a), float(ee), float(v), k)
                for a, ee, v in zip(n_any, e, var)
            ]
        )

    return agg.select(
        "query_id", cut("n_any", "e", "var").alias("threshold")
    )
