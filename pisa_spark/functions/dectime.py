"""Decode-time prediction features + linear predictor.

Re-expresses ``include/pisa/dec_time_prediction.hpp`` (the reference's
per-posting-list decode-time model, ds2i lineage):

- ``values_statistics`` (:104-144): over a posting list's integer
  values (the header's consumer fed per-block count arrays; ``tf`` is
  the natural engine-side column), compute
  ``n`` (value count), ``nonzeros``, ``max_b`` (bit width of the
  largest value, broadword::msb + 1), ``sum_of_logs`` =
  sum c_v * log2(v + 1) and ``entropy`` = sum c_v * log2(n / c_v)
  over the distinct-value histogram.
- ``predictor`` (:72-102): predicted decode time = bias + the dot
  product of a weight vector with the feature vector; the reference's
  ``size``/``pfor_b``/``pfor_exceptions`` features are codec-supplied
  (set by the profiling harness, not by values_statistics) and ride
  through as extra weighted columns when present.

Cross-engine convention (CLAUDE.md): float features are
micro-quantized PER DISTINCT-VALUE GROUP before the integer sum
(the ``micro_sql`` pattern), so Spark and DuckDB aggregate identical
BIGINTs in any order — this is what lets the features live inside the
dual-dialect ``term_meta`` gate entry.

Scale shape: one groupBy(term, value) histogram shuffle; the window
that supplies n partitions by term over DISTINCT VALUES (bounded by
the max tf, not the posting-list length), so no head-term partition
ever spans a posting list. Pure Catalyst, no Python per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from pisa_spark.functions.scoring import dlit

#: feature columns produced by decode_time_features, in header order
#: (PISA_FEATURE_TYPES minus the codec-supplied size/pfor_b/
#: pfor_exceptions)
FEATURE_COLS = ["n", "nonzeros", "max_b", "sum_of_logs_micro", "entropy_micro"]


def decode_time_features(postings: DataFrame,
                         value_col: str = "tf") -> DataFrame:
    """(term_id, n, nonzeros, max_b, sum_of_logs_micro, entropy_micro):
    values_statistics over each term's ``value_col`` values."""
    vc = (
        postings.groupBy("term_id", F.col(value_col).alias("v"))
        .agg(F.count("*").alias("c"))
    )
    w = Window.partitionBy("term_id")
    vc = vc.withColumn("nt", F.sum("c").over(w))
    log_row = F.expr(
        f"CAST(FLOOR(c * LOG2(CAST(v AS DOUBLE) + {dlit(1.0)})"
        f" * {dlit(1e6)} + {dlit(0.5)}) AS BIGINT)"
    )
    ent_row = F.expr(
        f"CAST(FLOOR(c * LOG2(CAST(nt AS DOUBLE) / c)"
        f" * {dlit(1e6)} + {dlit(0.5)}) AS BIGINT)"
    )
    # +0.5 inside the log keeps the argument ~0.5/v away from exact
    # power-of-two boundaries, where FLOOR(LOG2(2^k)) is at the mercy
    # of each engine's libm ULP (Spark computes log2 as a log ratio);
    # the margin dwarfs the error for any 31-bit tf, so both engines
    # floor identically — integer broadword::msb semantics.
    bits = F.expr(
        f"CASE WHEN v <> 0 THEN"
        f" CAST(FLOOR(LOG2(CAST(v AS DOUBLE) + {dlit(0.5)})) + 1 AS BIGINT)"
        f" ELSE CAST(0 AS BIGINT) END"
    )
    return (
        vc.select(
            "term_id", "c", "v", "nt",
            log_row.alias("lr"), ent_row.alias("er"), bits.alias("b"),
        )
        .groupBy("term_id")
        .agg(
            F.sum("c").cast("long").alias("n"),
            F.sum(F.when(F.col("v") != 0, F.col("c")).otherwise(0))
            .cast("long").alias("nonzeros"),
            F.max("b").cast("long").alias("max_b"),
            F.sum("lr").cast("long").alias("sum_of_logs_micro"),
            F.sum("er").cast("long").alias("entropy_micro"),
        )
    )


def decode_time_predict(features: DataFrame,
                        weights: dict[str, float],
                        bias: float = 0.0) -> DataFrame:
    """(term_id, predicted_micro): the header's linear predictor —
    bias + sum over weighted features. Micro-suffixed feature columns
    are de-quantized back to doubles first; the result is
    micro-quantized once at the end (deterministic per row).
    ``weights`` keys name feature columns with or without the
    ``_micro`` suffix (``sum_of_logs`` matches ``sum_of_logs_micro``),
    matching the reference's name-keyed weight files (:76-88). Terms
    are accumulated in sorted key order so the double sum (and hence
    the micro rounding) is deterministic."""
    cols = set(features.columns)
    acc = F.lit(float(bias))
    resolved: dict[str, str] = {}
    for name, wt in sorted(weights.items()):
        if name in cols:
            col = name
        elif f"{name}_micro" in cols:
            col = f"{name}_micro"
        else:
            raise ValueError(f"unknown feature {name!r}")
        if col in resolved:
            # 'sum_of_logs' and 'sum_of_logs_micro' alias one column;
            # silently summing both weights would misweight it
            raise ValueError(
                f"weights {resolved[col]!r} and {name!r} both resolve "
                f"to feature column {col!r}"
            )
        resolved[col] = name
        val = F.col(col).cast("double")
        if col.endswith("_micro"):
            val = val / F.lit(1e6)
        acc = acc + F.lit(float(wt)) * val
    return features.select(
        "term_id",
        F.floor(acc * F.lit(1e6) + F.lit(0.5)).cast("long")
        .alias("predicted_micro"),
    )
