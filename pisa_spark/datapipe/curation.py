"""Corpus curation operators: PII redaction and stratified sampling.

Two more standard web-pipeline steps (C4/CCNet-style, public papers)
expressed as pure native column expressions — zero shuffles for
redaction, zero shuffles for the sample filter itself:

- ``redact_pii``: regexp-replace emails / IPv4 addresses / long digit
  runs with typed placeholder tokens, plus per-doc hit counts. The
  PATTERNS are dialect-neutral (no backslash escapes — Spark string
  literals eat backslashes, DuckDB's don't; see dedup._URL_CANON_RULES
  for the shared discipline) so the identical pattern text runs under
  Java regex and RE2; only the replace-all flag differs per dialect.
- ``stratified_sample``: deterministic per-stratum Bernoulli sampling
  via the shared md5 hash31 — keep a row iff
  ``hash31(stratum || '_' || doc_id || '_' || seed) % 1e6 <
  fraction_micro``. Both engines (and any rerun) select the exact
  same rows, which is what makes training mixes reproducible; sampling
  is a scan-local filter, and only the per-stratum audit aggregates.

Scale: redaction is per-row whole-stage-codegen work. The sample
filter is per-row too; ``stratified_sample_report`` adds one
stratum-keyed aggregation (strata counts are tiny).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pisa_spark.datapipe.hashing import hash31_sql

# (kind, pattern, placeholder) — order matters: emails contain digits
# and dots, so they redact before IPs; IPs before bare digit runs.
PII_RULES: list[tuple[str, str, str]] = [
    ("email", "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+[.][a-zA-Z]{2,}", "<EMAIL>"),
    ("ip", "([0-9]{1,3}[.]){3}[0-9]{1,3}", "<IP>"),
    ("idnum", "[0-9]{9,}", "<ID>"),
]


def redact_pii_sql(col: str, dialect: str = "spark") -> str:
    """SQL expression: ``col`` with every PII rule applied in order.
    DuckDB needs the 'g' flag for replace-all; Spark replaces all
    matches by default."""
    flag = ", 'g'" if dialect == "duckdb" else ""
    e = col
    for _kind, pat, rep in PII_RULES:
        e = f"regexp_replace({e}, '{pat}', '{rep}'{flag})"
    return e


def pii_count_sql(col: str, kind: str, dialect: str = "spark") -> str:
    """SQL expression: number of matches of one PII rule in ``col``.
    Counted on the text as seen by that rule — i.e. AFTER the earlier
    rules redacted their matches — so an email's digits are never
    double-counted as an id number."""
    size_fn = "size" if dialect == "spark" else "len"
    flag = ", 'g'" if dialect == "duckdb" else ""
    e = col
    for k, pat, rep in PII_RULES:
        if k == kind:
            if dialect == "spark":
                return f"CAST({size_fn}(regexp_extract_all({e}, '{pat}', 0)) AS BIGINT)"
            return f"CAST({size_fn}(regexp_extract_all({e}, '{pat}')) AS BIGINT)"
        e = f"regexp_replace({e}, '{pat}', '{rep}'{flag})"
    raise ValueError(f"unknown PII kind: {kind}")


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, text_redacted, n_email, n_ip, n_idnum)."""
    return docs.select(
        "doc_id",
        F.expr(redact_pii_sql(text_col)).alias("text_redacted"),
        *[
            F.expr(pii_count_sql(text_col, kind)).alias(f"n_{kind}")
            for kind, _p, _r in PII_RULES
        ],
    )


# ------------------------------------------------------------- sampling

def sample_keep_sql(strata_expr: str, fraction_micro: int, seed: int,
                    dialect: str = "spark") -> str:
    """Boolean SQL: deterministic Bernoulli keep-decision for one row,
    uniform WITHIN each stratum and independent across seeds."""
    key = (f"(CAST({strata_expr} AS STRING) || '_' || "
           f"CAST(doc_id AS STRING) || '_{seed}')")
    if dialect == "duckdb":
        key = (f"(CAST({strata_expr} AS VARCHAR) || '_' || "
               f"CAST(doc_id AS VARCHAR) || '_{seed}')")
    return f"({hash31_sql(key, dialect)} % 1000000) < {fraction_micro}"


def stratified_sample(docs: DataFrame, strata_col: str = "lang",
                      fractions: dict[str, float] | float = 0.25,
                      seed: int = 7) -> DataFrame:
    """Deterministic stratified sample of ``docs``.

    ``fractions`` is a single rate or a per-stratum dict (missing
    strata default to 0 — an explicit mix spec drops everything it
    doesn't mention, the training-mix contract)."""
    if isinstance(fractions, dict):
        keep = F.lit(False)
        for stratum, frac in sorted(fractions.items()):
            cond = (F.col(strata_col) == stratum) & F.expr(
                sample_keep_sql(strata_col, int(round(frac * 1e6)), seed)
            )
            keep = keep | cond
    else:
        keep = F.expr(
            sample_keep_sql(strata_col, int(round(fractions * 1e6)), seed)
        )
    return docs.filter(keep)


def mix_to_rates(docs: DataFrame, strata_col: str,
                 mix: dict[str, float]) -> dict[str, float]:
    """Convert target output PROPORTIONS into per-stratum keep RATES.

    ``stratified_sample`` thins each stratum independently, so passing
    proportions straight through does NOT change the corpus mix (a
    90/10 corpus sampled at {0.5, 0.5} stays 90/10). This computes the
    rates that make the expected output match ``mix`` while keeping as
    many rows as possible: with per-stratum counts ``n_s``, the
    largest feasible output has ``C = min_s(n_s / mix_s)`` docs per
    unit proportion, and ``rate_s = C * mix_s / n_s`` (the binding
    stratum keeps everything). Strata absent from ``mix`` get rate 0,
    matching the explicit-mix contract.

    Driver work is one collected aggregate of |strata| rows (language
    counts — dozens at web scale, never corpus-proportional)."""
    counts = {
        r["stratum"]: r["n"]
        for r in docs.groupBy(F.col(strata_col).alias("stratum"))
        .agg(F.count("*").alias("n")).collect()
    }
    feasible = {
        s: counts[s] / p for s, p in mix.items()
        if p > 0 and counts.get(s, 0) > 0
    }
    if not feasible:
        return {s: 0.0 for s in mix}
    c = min(feasible.values())
    return {
        s: (c * p / counts[s] if s in feasible else 0.0)
        for s, p in mix.items()
    }


def stratified_sample_report(docs: DataFrame, strata_col: str = "lang",
                             fractions: dict[str, float] | float = 0.25,
                             seed: int = 7) -> DataFrame:
    """(stratum, n_total, n_kept, kept_micro) — the audit a pipeline
    alerts on when a mix drifts from its spec."""
    kept = stratified_sample(docs, strata_col, fractions, seed)
    tot = docs.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.count("*").alias("n_total"))
    k = kept.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.count("*").alias("n_kept"))
    return (
        tot.join(k, "stratum", "left")
        .select(
            "stratum", "n_total",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.expr(
                "CAST(FLOOR(CAST(COALESCE(n_kept, 0) AS DOUBLE) * 1000000.0"
                " / n_total + 0.5) AS BIGINT)"
            ).alias("kept_micro"),
        )
    )
