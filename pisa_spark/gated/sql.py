"""Dual-dialect SQL for the driver's correctness gate.

Every PISA-core operator that is SQL-expressible is generated here
ONCE from a shared skeleton and rendered into two dialects:

- ``spark``  — executed by ``spark.sql`` over a temp view of
  ``documents.parquet`` (pure Catalyst plans: whole-stage codegen,
  no UDFs);
- ``duckdb`` — returned verbatim to the driver as ``oracle_sql()``.

The only dialect differences are array split/explode spellings; all
arithmetic goes through scoring.dlit/micro_sql so both engines (and
the numpy kernels) produce bit-identical integers and doubles.

The corpus for these entries is the driver's ``documents`` table
(doc_id, text, lang, source, n_chars) tokenized by the whitespace
analyzer (lowercase + split on whitespace runs — the reference's
WhitespaceTokenizer + LowercaseFilter, src/tokenizer.cpp:36-47,
src/token_filter.cpp:46-60).
"""

from __future__ import annotations

from pisa_spark.functions.scoring import bm25_sql_expr, dlit, micro_sql

K = 10

# Fixed literal query workload over the documents vocabulary
# (mirrors the reference's 100-query term-ID fixture; 1-5 terms,
# duplicates exercise the weighted-query path).
GATED_QUERIES: list[tuple[str, list[str]]] = [
    ("q01", ["scan"]),
    ("q02", ["join", "merge"]),
    ("q03", ["window", "sort", "hash"]),
    ("q04", ["the", "query"]),
    ("q05", ["vector", "vector"]),
    ("q06", ["stream", "batch", "slow", "fast"]),
    ("q07", ["a"]),
    ("q08", ["group", "value", "key", "line", "column"]),
    ("q09", ["customer", "part"]),
    ("q10", ["data", "table", "row"]),
    ("q11", ["spark", "filter"]),
    ("q12", ["order", "agg", "small", "big"]),
    ("q13", ["dup", "slow"]),
    ("q14", ["key", "key", "key"]),
    ("q15", ["scan", "column", "window", "order", "sort", "part", "agg"]),
]


class Dialect:
    def __init__(self, name: str, split_expr: str, explode_kw: str):
        self.name = name
        self.split_expr = split_expr  # fmt: {col}
        self.explode_kw = explode_kw  # explode|unnest


# Spark string literals honor backslash escapes -> '\\s+'; DuckDB does not.
DIALECT_SPARK = Dialect("spark", "split(lower({col}), '\\\\s+')", "explode")
DIALECT_DUCKDB = Dialect(
    "duckdb", "regexp_split_to_array(lower({col}), '\\s+')", "unnest"
)


def _queries_cte() -> str:
    """Inline weighted query table (query_id, term, weight)."""
    rows = []
    for qid, terms in GATED_QUERIES:
        seen: dict[str, int] = {}
        for t in terms:
            seen[t] = seen.get(t, 0) + 1
        for t, w in sorted(seen.items()):
            rows.append(
                f"SELECT '{qid}' AS query_id, '{t}' AS term, "
                f"{dlit(float(w))} AS weight"
            )
    return " UNION ALL ".join(rows)


def _base_ctes(d: Dialect) -> str:
    split = d.split_expr.format(col="text")
    bm25 = bm25_sql_expr(
        tf="p.tf", df="l.df", doc_len="s.doc_len",
        num_docs="st.num_docs", avg_len="st.avg_len",
    )
    return f"""
WITH tok0 AS (
  SELECT doc_id, {d.explode_kw}(toks) AS term
  FROM (SELECT doc_id, {split} AS toks FROM documents) t0
),
tok AS (SELECT doc_id, term FROM tok0 WHERE term <> ''),
lex0 AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
         FROM tok GROUP BY term),
lex AS (SELECT term,
               CAST(ROW_NUMBER() OVER (ORDER BY term) - 1 AS BIGINT) AS term_id,
               df
        FROM lex0),
postings AS (SELECT l.term_id, t.doc_id, CAST(COUNT(*) AS INT) AS tf
             FROM tok t JOIN lex l ON t.term = l.term
             GROUP BY l.term_id, t.doc_id),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS INT) AS doc_len
          FROM tok GROUP BY doc_id),
stats AS (SELECT CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) AS num_docs,
                 CAST((SELECT COUNT(*) FROM tok) AS DOUBLE)
                   / CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) AS avg_len,
                 CAST((SELECT COUNT(*) FROM tok) AS BIGINT) AS collection_len),
queries AS ({_queries_cte()}),
qterms AS (SELECT q.query_id, l.term_id, q.weight
           FROM queries q JOIN lex l ON q.term = l.term),
scored AS (
  SELECT qt.query_id, p.doc_id,
         CAST(SUM({micro_sql(bm25, weight="qt.weight")}) AS BIGINT) AS micro,
         CAST(COUNT(*) AS BIGINT) AS n_matched
  FROM qterms qt
  JOIN postings p ON p.term_id = qt.term_id
  JOIN sizes s ON s.doc_id = p.doc_id
  JOIN lex l ON l.term_id = p.term_id
  CROSS JOIN stats st
  GROUP BY qt.query_id, p.doc_id
),
qsize AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_terms
          FROM qterms GROUP BY query_id),
ranked AS (
  SELECT query_id, doc_id,
         micro / {dlit(1e6)} AS score,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY micro DESC, doc_id ASC) AS INT) AS rank
  FROM scored WHERE micro > 0
),
ranked_and AS (
  SELECT sc.query_id, sc.doc_id,
         sc.micro / {dlit(1e6)} AS score,
         CAST(ROW_NUMBER() OVER (PARTITION BY sc.query_id
                                 ORDER BY sc.micro DESC, sc.doc_id ASC) AS INT) AS rank
  FROM scored sc JOIN qsize qs ON sc.query_id = qs.query_id
  WHERE sc.n_matched = qs.n_terms AND sc.micro > 0
)
""".strip()


def core_sql_entries(d: Dialect) -> dict[str, str]:
    """name -> full SQL text for every SQL-expressible core operator."""
    base = _base_ctes(d)
    bm25_tm = bm25_sql_expr(
        tf="p.tf", df="l.df", doc_len="s.doc_len",
        num_docs="st.num_docs", avg_len="st.avg_len",
    )
    e: dict[str, str] = {}

    e["lexicon"] = f"{base}\nSELECT term, term_id, df FROM lex ORDER BY term_id"

    e["doc_sizes"] = (
        f"{base}\nSELECT d.doc_id, CAST(COALESCE(s.doc_len, 0) AS INT) AS doc_len"
        f"\nFROM documents d LEFT JOIN sizes s ON d.doc_id = s.doc_id"
    )

    e["collection_stats"] = (
        f"{base}\nSELECT CAST(num_docs AS BIGINT) AS num_docs, avg_len,"
        f" collection_len FROM stats"
    )

    e["postings"] = (
        f"{base}\nSELECT term_id, doc_id, tf FROM postings ORDER BY term_id, doc_id"
    )

    e["term_meta"] = f"""{base}
SELECT p.term_id,
       CAST(MAX(l.df) AS BIGINT) AS df,
       CAST(SUM(p.tf) AS BIGINT) AS occurrence_count,
       CAST(MAX({micro_sql(bm25_tm)}) AS BIGINT) AS max_score_micro
FROM postings p
JOIN sizes s ON s.doc_id = p.doc_id
JOIN lex l ON l.term_id = p.term_id
CROSS JOIN stats st
GROUP BY p.term_id"""

    e["query_parse"] = (
        f"{base}\nSELECT query_id, term_id, weight FROM qterms"
        f"\nORDER BY query_id, term_id"
    )

    e["ranked_or_topk"] = (
        f"{base}\nSELECT query_id, rank, doc_id, score FROM ranked"
        f"\nWHERE rank <= {K} ORDER BY query_id, rank"
    )

    e["ranked_and_topk"] = (
        f"{base}\nSELECT query_id, rank, doc_id, score FROM ranked_and"
        f"\nWHERE rank <= {K} ORDER BY query_id, rank"
    )

    e["boolean_and_count"] = f"""{base}
SELECT sc.query_id, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM scored sc JOIN qsize qs ON sc.query_id = qs.query_id
WHERE sc.n_matched = qs.n_terms
GROUP BY sc.query_id ORDER BY sc.query_id"""

    e["boolean_or_count"] = f"""{base}
SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM scored GROUP BY query_id ORDER BY query_id"""

    # k-th score per query (tools/thresholds.cpp:27-55): min score
    # within the top-k window.
    e["thresholds"] = f"""{base}
SELECT query_id, MIN(score) AS threshold
FROM ranked WHERE rank <= {K}
GROUP BY query_id ORDER BY query_id"""

    # Threshold estimation from single-term top-k caches
    # (tools/kth_threshold.cpp:52-154, the fork's research focus):
    # estimate = max over query terms of the term's cached k-th best
    # (weight-scaled) single-term score; a term with df < k
    # contributes 0. Sound lower bound on the true k-th final score,
    # so kernels can bootstrap their heap threshold with it safely.
    e["kth_threshold_estimate"] = f"""{base}
SELECT q.query_id,
       MAX(COALESCE(kth.kth_micro, 0)) AS threshold_micro
FROM qterms q
LEFT JOIN (
  SELECT query_id, term_id, micro AS kth_micro FROM (
    SELECT qt.query_id, p.term_id,
           {micro_sql(bm25_tm, weight="qt.weight")} AS micro,
           ROW_NUMBER() OVER (
             PARTITION BY qt.query_id, p.term_id
             ORDER BY {micro_sql(bm25_tm, weight="qt.weight")} DESC, p.doc_id ASC
           ) AS rn
    FROM qterms qt
    JOIN postings p ON p.term_id = qt.term_id
    JOIN sizes s ON s.doc_id = p.doc_id
    JOIN lex l ON l.term_id = p.term_id
    CROSS JOIN stats st
  ) r WHERE rn = {K}
) kth ON kth.query_id = q.query_id AND kth.term_id = q.term_id
GROUP BY q.query_id ORDER BY q.query_id"""

    # Posting-list lengths per query (tools/count_postings.cpp:10-40).
    e["count_postings"] = f"""{base}
SELECT qt.query_id,
       CAST(COUNT(*) AS BIGINT) AS n_terms,
       CAST(SUM(l.df) AS BIGINT) AS total_postings,
       CAST(MAX(l.df) AS BIGINT) AS max_postings
FROM qterms qt JOIN lex l ON l.term_id = qt.term_id
GROUP BY qt.query_id ORDER BY qt.query_id"""

    # AND/OR selectivity (tools/selective_queries.cpp:17-41), exact
    # ratios as micro-rounded doubles.
    e["selective_queries"] = f"""{base}
SELECT a.query_id,
       CAST(FLOOR(CAST(a.and_docs AS DOUBLE) / st.num_docs * {dlit(1e6)}
                  + {dlit(0.5)}) AS BIGINT) AS and_selectivity_micro,
       CAST(FLOOR(CAST(a.or_docs AS DOUBLE) / st.num_docs * {dlit(1e6)}
                  + {dlit(0.5)}) AS BIGINT) AS or_selectivity_micro
FROM (
  SELECT sc.query_id,
         SUM(CASE WHEN sc.n_matched = qs.n_terms THEN 1 ELSE 0 END) AS and_docs,
         COUNT(*) AS or_docs
  FROM scored sc JOIN qsize qs ON sc.query_id = qs.query_id
  GROUP BY sc.query_id
) a CROSS JOIN stats st
ORDER BY a.query_id"""

    # Intersection length + max combined score per query
    # (compute_intersection, intersection.hpp:46-78).
    e["compute_intersection"] = f"""{base}
SELECT sc.query_id,
       CAST(COUNT(*) AS BIGINT) AS length,
       CAST(MAX(sc.micro) AS BIGINT) AS max_score_micro
FROM scored sc JOIN qsize qs ON sc.query_id = qs.query_id
WHERE sc.n_matched = qs.n_terms
GROUP BY sc.query_id ORDER BY sc.query_id"""

    # Taily-style per-term score moments (taily_stats.hpp:24-169) as
    # exact integer sums (expectation/variance derivable).
    e["taily_stats"] = f"""{base}
SELECT p.term_id,
       CAST(MAX(l.df) AS BIGINT) AS df,
       CAST(SUM({micro_sql(bm25_tm)}) AS BIGINT) AS sum_micro,
       CAST(SUM({micro_sql(bm25_tm)} * {micro_sql(bm25_tm)}) AS BIGINT)
         AS sum_micro_sq
FROM postings p
JOIN sizes s ON s.doc_id = p.doc_id
JOIN lex l ON l.term_id = p.term_id
CROSS JOIN stats st
GROUP BY p.term_id"""

    # Deterministic posting down-sampling (sample_inverted_index,
    # util/inverted_index_utils.hpp:32-60; explicit modulus rule
    # instead of an RNG so both engines agree).
    e["sampled_postings"] = (
        f"{base}\nSELECT term_id, doc_id, tf FROM postings"
        f"\nWHERE doc_id % 10 = 0 ORDER BY term_id, doc_id"
    )

    # Log-gap cost of the docID ordering
    # (tools/evaluate_collection_ordering.cpp), micro-quantized per gap.
    e["log_gap_cost"] = f"""{base}
SELECT CAST(SUM(CAST(FLOOR(LOG2(CAST(gap AS DOUBLE)) * {dlit(1e6)}
                           + {dlit(0.5)}) AS BIGINT)) AS BIGINT) AS cost_micro,
       CAST(COUNT(*) AS BIGINT) AS n_gaps
FROM (
  SELECT doc_id - LAG(doc_id) OVER (PARTITION BY term_id ORDER BY doc_id)
           AS gap
  FROM postings
) g WHERE gap IS NOT NULL AND gap > 0"""

    return e
