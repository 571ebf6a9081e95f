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
# Cache budget for the kth_thresholds 'budget' tag: how many workload
# terms get a cached single-term k-th score (the budget fork's
# "exist terms" list, tools/kth_threshold_budget_origional.cpp:73-125
# — estimation sees cache HITS only). 8 of the ~30 workload terms so
# both hit and miss paths are exercised at sf0.01.
KTH_BUDGET = 8
# Sampling-fork parameters for the 'sampling' tag
# (kth_threshold_sampling_origional.cpp:104-124,277-320): doc sample
# doc_id % 10 = 0 (sample_inverted_index's convention, rate 0.1) and
# over-estimate target 0.05 -> k' = 4 at K = 10
# (thresholds.sampling_k_prime — pinned by pytest).
KTH_SAMPLE_MOD = 10
KTH_SAMPLING_TARGET_O = 0.05
# Combine-did fork prefix depth for the 'combine_did' tag
# (kth_threshold_intersection_new.cpp:211-232: per-gram top-d cached
# (did, score) prefixes, summed per did across the query's grams).
KTH_COMBINE_D = 16
# Lookup-pipeline fork candidate budget for the 'lookup' tag
# (kth_threshold_intersection_budget_lookup.cpp:744-790 /
# threshold_lookup_whole_pipeline.cpp): how many cached prefix
# entries the global drain may pop; candidates then get EXACT
# full-score lookups. 32 so some workload queries drain fewer
# candidates than they have matches.
KTH_LOOKUP_BUDGET = 32
# Intersection-fork gram cap for the 'intersection' tag
# (kth_threshold_intersection.cpp termConsidered): slicing combs of
# <= this many terms are cached; larger combs are cache misses. 2 so
# the 4- and 5-term workload queries exercise skipped triple/quad
# combs at sf0.01.
KTH_GRAM = 2
# The 'combine_did_new' and 'substructure' tags run at gram 2 —
# singles + pairs, HARDWIRED in the ncomb CTE's two union branches
# (the tools' "all pairs available" idealization of their
# single/duplet prefix files). The library forms
# (thresholds.combine_did_new_kth_thresholds / substructure_…)
# expose gram 1-4.
# Ranked-list depth for the 'estimated_k_single' quality tag (the
# simulator tools' reference heap: topk_queue(k * 50) in
# kth_threshold_sampling_simulator.cpp:317, k * 1000 in the
# combine/real_world tools). 100 at gate scale.
KTH_QUALITY_DEPTH = 100

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


def _slice_pos_values() -> str:
    """The intersection fork's slicing tables as inline-VALUES rows
    (n, slicing_id, comb_id, pos) — thresholds.INTERSECTION_SLICINGS
    flattened, identical spelling in both dialects (no array
    indexing, which Spark 0-bases and DuckDB 1-bases)."""
    from pisa_spark.query.thresholds import slicing_position_rows

    rows = slicing_position_rows()
    return ",\n".join(
        ",".join(f"({n},{s},{c},{p})" for (n, s, c, p) in chunk)
        for chunk in (rows[i:i + 12] for i in range(0, len(rows), 12))
    )


class Dialect:
    def __init__(self, name: str, split_expr: str, explode_kw: str,
                 english_toks: str, str_type: str):
        self.name = name
        self.split_expr = split_expr  # fmt: {col}
        self.explode_kw = explode_kw  # explode|unnest
        self.english_toks = english_toks  # fmt: {col} -> array of tokens
        self.str_type = str_type  # STRING | VARCHAR


# EnglishTokenizer as pure SQL in each dialect (same first-match-wins
# alternation as src/tokenizer.cpp:72-79 + shared post-rule: strip
# dots, cut at apostrophe, lowercase). Java regex (Spark) and RE2
# (DuckDB) agree on these constructs — pinned by the gate itself.
_EN_SPARK = (
    "transform(regexp_extract_all({col},"
    " '(?:[a-zA-Z]+\\\\.){{2,}}|[a-zA-Z0-9]+(?:\\'[a-zA-Z]+)?', 0),"
    " t -> lower(substring_index(replace(t, '.', ''), '\\'', 1)))"
)
_EN_DUCK = (
    "list_transform(regexp_extract_all({col},"
    " '(?:[a-zA-Z]+\\.){{2,}}|[a-zA-Z0-9]+(?:''[a-zA-Z]+)?'),"
    " t -> lower(split_part(replace(t, '.', ''), '''', 1)))"
)

# Spark string literals honor backslash escapes -> '\\s+'; DuckDB does not.
DIALECT_SPARK = Dialect(
    "spark", "split(lower({col}), '\\\\s+')", "explode", _EN_SPARK, "STRING"
)
DIALECT_DUCKDB = Dialect(
    "duckdb", "regexp_split_to_array(lower({col}), '\\s+')", "unnest",
    _EN_DUCK, "VARCHAR",
)

# Codecs exercised by the consolidated segments_decode_check entry —
# one full index build + round-trip decode per codec, union-tagged so
# a single driver CORRECTNESS row covers the whole registry.
# (maskedvbyte is wire-identical to varint by construction and is not
# re-run.)
# Term-id cap for the ciff tag of segments_decode_check (the CIFF
# export is a single sequential file; the gate bounds the driver-side
# write to this many lists — see gated/entries._ciff_roundtrip).
CIFF_TAG_TERMS = 200

DECODE_CHECK_CODECS = [
    "bitpack", "ef", "g8iu", "hybrid", "interpolative", "optpfor",
    "pef", "qmx", "rankedbv", "simple16", "simple8b", "streamvbyte",
    "varint", "varintgb",
]

# Tags for the consolidated BMW-variant and range-execution entries;
# shared between the Spark union builders (gated/entries.py) and the
# oracle SQL so both engines emit identical tag values.
BMW_VARIANT_TAGS = [
    "bootstrap", "cwand", "quantized", "sampling_safe", "varblock",
]
RANGE_MODE_TAGS = ["batch", "batch_live", "bmw", "bmw_live", "maxscore", "taat"]
STRATEGY_TAGS = ["adaptive", "batched"]
ANALYZER_TAGS = ["english", "whitespace"]


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
    en_toks = d.english_toks.format(col="text")
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

    # Batch postings keyed by term STRING — the oracle for the
    # incremental indexer (its lexicon appends new generations' terms
    # after existing ids, so ids differ from the global sort while
    # the (term, doc, tf) content must be identical).
    e["incremental_postings"] = f"""{base}
SELECT l.term, p.doc_id, p.tf
FROM postings p JOIN lex l ON l.term_id = p.term_id
ORDER BY l.term, p.doc_id"""

    # term stats + max score, widened with the decode-time prediction
    # features (dec_time_prediction.hpp values_statistics:104-144 over
    # each list's tf histogram; functions/dectime.py is the engine
    # form). Float features are micro-quantized per distinct-value
    # group BEFORE the integer sum so both engines aggregate identical
    # BIGINTs in any order.
    e["term_meta"] = f"""{base},
vstat AS (
  SELECT p.term_id, p.tf AS v, CAST(COUNT(*) AS BIGINT) AS c
  FROM postings p GROUP BY p.term_id, p.tf
),
vfeat AS (
  SELECT term_id,
         CAST(SUM(c) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN v <> 0 THEN c ELSE 0 END) AS BIGINT) AS nonzeros,
         CAST(MAX(CASE WHEN v <> 0
                  THEN FLOOR(LOG2(CAST(v AS DOUBLE) + {dlit(0.5)})) + 1
                  ELSE 0 END) AS BIGINT) AS max_b,
         CAST(SUM(CAST(FLOOR(c * LOG2(CAST(v AS DOUBLE) + {dlit(1.0)})
              * {dlit(1e6)} + {dlit(0.5)}) AS BIGINT)) AS BIGINT)
           AS sum_of_logs_micro,
         CAST(SUM(CAST(FLOOR(c * LOG2(CAST(nt AS DOUBLE) / c)
              * {dlit(1e6)} + {dlit(0.5)}) AS BIGINT)) AS BIGINT)
           AS entropy_micro
  FROM (SELECT term_id, v, c,
               SUM(c) OVER (PARTITION BY term_id) AS nt
        FROM vstat) x
  GROUP BY term_id
)
SELECT p.term_id,
       CAST(MAX(l.df) AS BIGINT) AS df,
       CAST(SUM(p.tf) AS BIGINT) AS occurrence_count,
       CAST(MAX({micro_sql(bm25_tm)}) AS BIGINT) AS max_score_micro,
       MAX(f.n) AS n,
       MAX(f.nonzeros) AS nonzeros,
       MAX(f.max_b) AS max_b,
       MAX(f.sum_of_logs_micro) AS sum_of_logs_micro,
       MAX(f.entropy_micro) AS entropy_micro
FROM postings p
JOIN sizes s ON s.doc_id = p.doc_id
JOIN lex l ON l.term_id = p.term_id
JOIN vfeat f ON f.term_id = p.term_id
CROSS JOIN stats st
GROUP BY p.term_id"""

    # EnglishTokenizer lexicon (src/tokenizer.cpp:72-79 classes as
    # dialect SQL — the analyzer itself goes through the gate).
    e["english_lexicon"] = f"""WITH etok AS (
  SELECT doc_id, {d.explode_kw}(toks) AS term
  FROM (SELECT doc_id, {en_toks} AS toks FROM documents) t0
),
etok2 AS (SELECT doc_id, term FROM etok WHERE term <> '')
SELECT term,
       CAST(ROW_NUMBER() OVER (ORDER BY term) - 1 AS BIGINT) AS term_id,
       df
FROM (
  SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
  FROM etok2 GROUP BY term
) x ORDER BY term_id"""

    # Consolidated analyzer lexicons (whitespace + EnglishTokenizer)
    # in one tagged union, so both analyzers share a single driver
    # CORRECTNESS row (50-entry window — see gated/entries.py).
    e["lexicon_analyzers"] = f"""{base},
etok AS (
  SELECT doc_id, {d.explode_kw}(toks) AS term
  FROM (SELECT doc_id, {en_toks} AS toks FROM documents) t0
),
elex AS (
  SELECT term,
         CAST(ROW_NUMBER() OVER (ORDER BY term) - 1 AS BIGINT) AS term_id,
         df
  FROM (
    SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
    FROM (SELECT doc_id, term FROM etok WHERE term <> '') e2
    GROUP BY term
  ) x
)
SELECT 'whitespace' AS analyzer, term, term_id, df FROM lex
UNION ALL
SELECT 'english' AS analyzer, term, term_id, df FROM elex
ORDER BY analyzer, term_id"""

    # TREC 6-column run output (evaluate_queries,
    # tools/evaluate_queries.cpp:152-161).
    e["trec_run"] = f"""{base}
SELECT query_id, 'Q0' AS q0,
       'doc' || CAST(doc_id AS {d.str_type}) AS doc_title,
       rank, score, 'pisa-spark' AS run_id
FROM ranked WHERE rank <= {K} ORDER BY query_id, rank"""

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

    # Dirichlet-LM (QLD, mu=1000) exhaustive disjunction
    # (scorer/qld.hpp:19-41): same ranked_or plan under the second
    # reference scorer; ctf = collection term frequency.
    from pisa_spark.functions.scoring import qld_sql_expr

    qld = qld_sql_expr(
        tf="p.tf", ctf="c.ctf", doc_len="s.doc_len",
        collection_len="CAST(st.collection_len AS DOUBLE)",
    )
    e["qld_ranked_or_topk"] = f"""{base},
ctfs AS (SELECT term_id, CAST(SUM(tf) AS DOUBLE) AS ctf
         FROM postings GROUP BY term_id),
qsc AS (
  SELECT qt.query_id, p.doc_id,
         CAST(SUM({micro_sql(qld, weight="qt.weight")}) AS BIGINT) AS micro
  FROM qterms qt
  JOIN postings p ON p.term_id = qt.term_id
  JOIN sizes s ON s.doc_id = p.doc_id
  JOIN ctfs c ON c.term_id = p.term_id
  CROSS JOIN stats st
  GROUP BY qt.query_id, p.doc_id
)
SELECT query_id, rank, doc_id, score FROM (
  SELECT query_id, doc_id, micro / {dlit(1e6)} AS score,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY micro DESC, doc_id ASC) AS INT) AS rank
  FROM qsc WHERE micro > 0
) r WHERE rank <= {K} ORDER BY query_id, rank"""

    # DFR scorers (pl2 c=1, parameter-free dph) exhaustive
    # disjunctions — same plan as qld_ranked_or_topk under the third
    # and fourth reference scorers (scorer/pl2.hpp:19-43,
    # scorer/dph.hpp:20-39). log2 is spelled LN * (1/ln 2) so LN is
    # the only libm call (cross-engine agreement pinned by qld).
    from pisa_spark.functions.scoring import dph_sql_expr, pl2_sql_expr

    for scorer_name, builder in (("pl2", pl2_sql_expr), ("dph", dph_sql_expr)):
        sc_expr = builder(
            tf="p.tf", ctf="c.ctf", doc_len="s.doc_len",
            num_docs="st.num_docs", avg_len="st.avg_len",
        )
        e[f"{scorer_name}_ranked_or_topk"] = f"""{base},
ctfs AS (SELECT term_id, CAST(SUM(tf) AS DOUBLE) AS ctf
         FROM postings GROUP BY term_id),
qsc AS (
  SELECT qt.query_id, p.doc_id,
         CAST(SUM({micro_sql(sc_expr, weight="qt.weight")}) AS BIGINT) AS micro
  FROM qterms qt
  JOIN postings p ON p.term_id = qt.term_id
  JOIN sizes s ON s.doc_id = p.doc_id
  JOIN ctfs c ON c.term_id = p.term_id
  CROSS JOIN stats st
  GROUP BY qt.query_id, p.doc_id
)
SELECT query_id, rank, doc_id, score FROM (
  SELECT query_id, doc_id, micro / {dlit(1e6)} AS score,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY micro DESC, doc_id ASC) AS INT) AS rank
  FROM qsc WHERE micro > 0
) r WHERE rank <= {K} ORDER BY query_id, rank"""

    # Boolean result SETS (doc lists, not counts) — the kernel-path
    # oracle for and_query/or_query (and_query.hpp:12-59,
    # or_query.hpp:8-44).
    e["boolean_and_docs"] = f"""{base}
SELECT sc.query_id, sc.doc_id
FROM scored sc JOIN qsize qs ON sc.query_id = qs.query_id
WHERE sc.n_matched = qs.n_terms
ORDER BY sc.query_id, sc.doc_id"""

    e["boolean_or_docs"] = (
        f"{base}\nSELECT query_id, doc_id FROM scored"
        f"\nORDER BY query_id, doc_id"
    )

    # Impact-quantized exhaustive disjunction (quantized build,
    # src/compress.cpp:72-91 + linear_quantizer.hpp:8-26 + identity
    # scorer scorer/quantized.hpp): q = ceil(score * 2^8 / index_max),
    # clamped to >= 1; ranking sums weight*q (exact integers).
    e["quantized_ranked_or_topk"] = f"""{base},
qmax AS (
  SELECT MAX({bm25_tm}) AS mx
  FROM postings p
  JOIN sizes s ON s.doc_id = p.doc_id
  JOIN lex l ON l.term_id = p.term_id
  CROSS JOIN stats st
),
qimp AS (
  SELECT p.term_id, p.doc_id,
         GREATEST(CAST(CEIL({bm25_tm} * {dlit(256.0)} / qm.mx) AS BIGINT),
                  CAST(1 AS BIGINT)) AS q
  FROM postings p
  JOIN sizes s ON s.doc_id = p.doc_id
  JOIN lex l ON l.term_id = p.term_id
  CROSS JOIN stats st
  CROSS JOIN qmax qm
),
qsc AS (
  SELECT qt.query_id, qi.doc_id,
         CAST(SUM(CAST(qt.weight * qi.q AS BIGINT)) AS BIGINT) AS units
  FROM qterms qt JOIN qimp qi ON qi.term_id = qt.term_id
  GROUP BY qt.query_id, qi.doc_id
)
SELECT query_id, rank, doc_id, score FROM (
  SELECT query_id, doc_id, CAST(units AS DOUBLE) AS score,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY units DESC, doc_id ASC) AS INT) AS rank
  FROM qsc WHERE units > 0
) r WHERE rank <= {K} ORDER BY query_id, rank"""

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
    SELECT query_id, term_id, micro,
           ROW_NUMBER() OVER (
             PARTITION BY query_id, term_id
             ORDER BY micro DESC, doc_id ASC
           ) AS rn
    FROM (
      SELECT qt.query_id, p.term_id, p.doc_id,
             {micro_sql(bm25_tm, weight="qt.weight")} AS micro
      FROM qterms qt
      JOIN postings p ON p.term_id = qt.term_id
      JOIN sizes s ON s.doc_id = p.doc_id
      JOIN lex l ON l.term_id = p.term_id
      CROSS JOIN stats st
    ) pm
  ) r WHERE rn = {K}
) kth ON kth.query_id = q.query_id AND kth.term_id = q.term_id
GROUP BY q.query_id ORDER BY q.query_id"""

    # Pair-augmented threshold estimation (tools/kth_threshold.cpp:
    # 126-138, the fork's pair cache): for every query, the estimate
    # is the max over (a) each term's k-th best single-term score and
    # (b) each term PAIR's k-th best DISJUNCTIVE score — both sound
    # lower bounds on the query's k-th final score, (b) tighter
    # whenever the pair co-occurs.
    e["kth_threshold_pairs"] = f"""{base},
pm AS (
  SELECT qt.query_id, p.term_id, p.doc_id,
         {micro_sql(bm25_tm, weight="qt.weight")} AS m
  FROM qterms qt
  JOIN postings p ON p.term_id = qt.term_id
  JOIN sizes s ON s.doc_id = p.doc_id
  JOIN lex l ON l.term_id = p.term_id
  CROSS JOIN stats st
),
skth AS (
  SELECT query_id, m AS kth FROM (
    SELECT query_id, term_id, doc_id, m,
           ROW_NUMBER() OVER (PARTITION BY query_id, term_id
                              ORDER BY m DESC, doc_id ASC) AS rn
    FROM pm
  ) x WHERE rn = {K}
),
qpairs AS (
  SELECT a.query_id, a.term_id AS ta, b.term_id AS tb
  FROM qterms a
  JOIN qterms b ON b.query_id = a.query_id AND a.term_id < b.term_id
),
pairdoc AS (
  SELECT u.query_id, u.ta, u.tb, u.doc_id, CAST(SUM(u.m) AS BIGINT) AS m2
  FROM (
    SELECT qp.query_id, qp.ta, qp.tb, p.doc_id, p.m
    FROM qpairs qp JOIN pm p ON p.query_id = qp.query_id AND p.term_id = qp.ta
    UNION ALL
    SELECT qp.query_id, qp.ta, qp.tb, p.doc_id, p.m
    FROM qpairs qp JOIN pm p ON p.query_id = qp.query_id AND p.term_id = qp.tb
  ) u
  GROUP BY u.query_id, u.ta, u.tb, u.doc_id
),
pkth AS (
  SELECT query_id, m2 AS kth FROM (
    SELECT query_id, ta, tb, doc_id, m2,
           ROW_NUMBER() OVER (PARTITION BY query_id, ta, tb
                              ORDER BY m2 DESC, doc_id ASC) AS rn
    FROM pairdoc
  ) y WHERE rn = {K}
),
allk AS (SELECT query_id, kth FROM skth
         UNION ALL SELECT query_id, kth FROM pkth)
SELECT q.query_id,
       CAST(MAX(COALESCE(a.kth, 0)) AS BIGINT) AS threshold_micro
FROM (SELECT DISTINCT query_id FROM qterms) q
LEFT JOIN allk a ON a.query_id = q.query_id
GROUP BY q.query_id ORDER BY q.query_id"""

    # Full singles + pairs + TRIPLES estimate (kth_threshold.cpp:
    # 139-152, the all_triples mode restricted to the workload's own
    # term triples — each triple's k-th best DISJUNCTIVE score is a
    # sound lower bound, tighter again than pairs where three terms
    # co-occur).
    _kth_common = e["kth_threshold_pairs"].rsplit("allk AS", 1)[0]
    e["kth_threshold_triples"] = f"""{_kth_common}qtriples AS (
  SELECT a.query_id, a.term_id AS ta, b.term_id AS tb, c.term_id AS tc
  FROM qterms a
  JOIN qterms b ON b.query_id = a.query_id AND a.term_id < b.term_id
  JOIN qterms c ON c.query_id = a.query_id AND b.term_id < c.term_id
),
tridoc AS (
  SELECT u.query_id, u.ta, u.tb, u.tc, u.doc_id,
         CAST(SUM(u.m) AS BIGINT) AS m3
  FROM (
    SELECT qt.query_id, qt.ta, qt.tb, qt.tc, p.doc_id, p.m
    FROM qtriples qt JOIN pm p ON p.query_id = qt.query_id AND p.term_id = qt.ta
    UNION ALL
    SELECT qt.query_id, qt.ta, qt.tb, qt.tc, p.doc_id, p.m
    FROM qtriples qt JOIN pm p ON p.query_id = qt.query_id AND p.term_id = qt.tb
    UNION ALL
    SELECT qt.query_id, qt.ta, qt.tb, qt.tc, p.doc_id, p.m
    FROM qtriples qt JOIN pm p ON p.query_id = qt.query_id AND p.term_id = qt.tc
  ) u
  GROUP BY u.query_id, u.ta, u.tb, u.tc, u.doc_id
),
trikth AS (
  SELECT query_id, m3 AS kth FROM (
    SELECT query_id, ta, tb, tc, doc_id, m3,
           ROW_NUMBER() OVER (PARTITION BY query_id, ta, tb, tc
                              ORDER BY m3 DESC, doc_id ASC) AS rn
    FROM tridoc
  ) z WHERE rn = {K}
),
allk AS (SELECT query_id, kth FROM skth
         UNION ALL SELECT query_id, kth FROM pkth
         UNION ALL SELECT query_id, kth FROM trikth)
SELECT q.query_id,
       CAST(MAX(COALESCE(a.kth, 0)) AS BIGINT) AS threshold_micro
FROM (SELECT DISTINCT query_id FROM qterms) q
LEFT JOIN allk a ON a.query_id = q.query_id
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

    # All 2-term-subset intersections per query (compute_intersection
    # --combinations, intersection.hpp:83-92 for_all_subsets with
    # max_term_count=2): length + max combined score per pair; empty
    # intersections are omitted (inner join) in both engines.
    e["intersection_pairs"] = f"""{base},
pm AS (
  SELECT qt.query_id, p.term_id, p.doc_id,
         {micro_sql(bm25_tm, weight="qt.weight")} AS m
  FROM qterms qt
  JOIN postings p ON p.term_id = qt.term_id
  JOIN sizes s ON s.doc_id = p.doc_id
  JOIN lex l ON l.term_id = p.term_id
  CROSS JOIN stats st
)
SELECT a.query_id, a.term_id AS term_a, b.term_id AS term_b,
       CAST(COUNT(*) AS BIGINT) AS length,
       CAST(MAX(a.m + b.m) AS BIGINT) AS max_score_micro
FROM pm a
JOIN pm b ON b.query_id = a.query_id AND b.doc_id = a.doc_id
         AND a.term_id < b.term_id
GROUP BY a.query_id, a.term_id, b.term_id
ORDER BY a.query_id, term_a, term_b"""

    # ALL term subsets of size <= 3 per query (compute_intersection
    # --combinations with --max-term-count 3: for_all_subsets bitmask,
    # intersection.hpp:83-92): intersection length + max combined
    # score per subset. Subsets are identified by their sorted term
    # ids with -1 sentinels for absent slots (the readable form of
    # the reference's position bitmask); empty intersections are
    # omitted in both engines.
    e["intersection_subsets"] = f"""{base},
pm AS (
  SELECT qt.query_id, p.term_id, p.doc_id,
         {micro_sql(bm25_tm, weight="qt.weight")} AS m
  FROM qterms qt
  JOIN postings p ON p.term_id = qt.term_id
  JOIN sizes s ON s.doc_id = p.doc_id
  JOIN lex l ON l.term_id = p.term_id
  CROSS JOIN stats st
),
s1 AS (
  SELECT query_id, term_id AS ta, CAST(-1 AS BIGINT) AS tb,
         CAST(-1 AS BIGINT) AS tc,
         CAST(COUNT(*) AS BIGINT) AS length,
         CAST(MAX(m) AS BIGINT) AS max_score_micro
  FROM pm GROUP BY query_id, term_id
),
s2 AS (
  SELECT a.query_id, a.term_id AS ta, b.term_id AS tb,
         CAST(-1 AS BIGINT) AS tc,
         CAST(COUNT(*) AS BIGINT) AS length,
         CAST(MAX(a.m + b.m) AS BIGINT) AS max_score_micro
  FROM pm a
  JOIN pm b ON b.query_id = a.query_id AND b.doc_id = a.doc_id
           AND a.term_id < b.term_id
  GROUP BY a.query_id, a.term_id, b.term_id
),
s3 AS (
  SELECT a.query_id, a.term_id AS ta, b.term_id AS tb, c.term_id AS tc,
         CAST(COUNT(*) AS BIGINT) AS length,
         CAST(MAX(a.m + b.m + c.m) AS BIGINT) AS max_score_micro
  FROM pm a
  JOIN pm b ON b.query_id = a.query_id AND b.doc_id = a.doc_id
           AND a.term_id < b.term_id
  JOIN pm c ON c.query_id = a.query_id AND c.doc_id = a.doc_id
           AND b.term_id < c.term_id
  GROUP BY a.query_id, a.term_id, b.term_id, c.term_id
)
SELECT query_id, ta, tb, tc, length, max_score_micro FROM s1
UNION ALL SELECT query_id, ta, tb, tc, length, max_score_micro FROM s2
UNION ALL SELECT query_id, ta, tb, tc, length, max_score_micro FROM s3
ORDER BY query_id, ta, tb, tc"""

    # Taily-style per-term score moments (taily_stats.hpp:24-169).
    # Sums accumulate in exact DECIMAL(38,0) then emit DOUBLE (one
    # deterministic rounding of the same exact integer in both
    # engines): SUM(micro^2) wraps a BIGINT accumulator at only ~25k
    # postings of a strong term (micro ~ 2e7 -> micro^2 ~ 4e14), and
    # DuckDB would raise where Spark wraps silently — see
    # build/shards.shard_term_stats for the width analysis.
    e["taily_stats"] = f"""{base}
SELECT p.term_id,
       CAST(MAX(l.df) AS BIGINT) AS df,
       CAST(SUM(CAST({micro_sql(bm25_tm)} AS DECIMAL(38,0))) AS DOUBLE)
         AS sum_micro,
       CAST(SUM(CAST({micro_sql(bm25_tm)} * {micro_sql(bm25_tm)}
                     AS DECIMAL(38,0))) AS DOUBLE)
         AS sum_micro_sq
FROM postings p
JOIN sizes s ON s.doc_id = p.doc_id
JOIN lex l ON l.term_id = p.term_id
CROSS JOIN stats st
GROUP BY p.term_id"""

    # Per-shard corpus stats (partition_fwd_index + shards meta-tool,
    # src/sharding.cpp:136-268, tools/shards.cpp:49-76): deterministic
    # doc_id%4 sharding; one aggregation replaces the shard loop.
    e["shard_stats"] = f"""{base}
SELECT CAST(s.doc_id % 4 AS INT) AS shard_id,
       CAST(COUNT(*) AS BIGINT) AS num_docs,
       CAST(SUM(s.doc_len) AS BIGINT) AS collection_len
FROM sizes s
GROUP BY s.doc_id % 4 ORDER BY shard_id"""

    e["shard_vocab"] = f"""{base}
SELECT shard_id, CAST(COUNT(*) AS BIGINT) AS vocab_size FROM (
  SELECT DISTINCT CAST(p.doc_id % 4 AS INT) AS shard_id, p.term_id
  FROM postings p
) sv GROUP BY shard_id ORDER BY shard_id"""

    # Taily per-(shard, term) score moments for shard ranking
    # (taily_stats.hpp:24-169, shards integration tools/shards.cpp:60-66).
    e["shard_taily_stats"] = f"""{base}
SELECT CAST(p.doc_id % 4 AS INT) AS shard_id,
       p.term_id,
       CAST(COUNT(*) AS BIGINT) AS df,
       CAST(SUM(CAST({micro_sql(bm25_tm)} AS DECIMAL(38,0))) AS DOUBLE)
         AS sum_micro,
       CAST(SUM(CAST({micro_sql(bm25_tm)} * {micro_sql(bm25_tm)}
                     AS DECIMAL(38,0))) AS DOUBLE)
         AS sum_micro_sq
FROM postings p
JOIN sizes s ON s.doc_id = p.doc_id
JOIN lex l ON l.term_id = p.term_id
CROSS JOIN stats st
GROUP BY p.doc_id % 4, p.term_id"""

    # Deterministic posting down-sampling (sample_inverted_index,
    # util/inverted_index_utils.hpp:32-60; explicit modulus rule
    # instead of an RNG so both engines agree).
    e["sampled_postings"] = (
        f"{base}\nSELECT term_id, doc_id, tf FROM postings"
        f"\nWHERE doc_id % 10 = 0 ORDER BY term_id, doc_id"
    )

    # Random docID permutation (reorder_random, reorder_docids.hpp:
    # 225-237) as a deterministic md5-rank mapping, plus the log-gap
    # cost of BOTH orderings side by side (evaluate_collection_
    # ordering) — shows reordering changes the compression objective.
    e["reorder_random_map"] = f"""{base}
SELECT d.doc_id,
       CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(d.doc_id AS {d.str_type})),
                               d.doc_id) - 1 AS BIGINT) AS new_doc_id
FROM documents d"""

    e["reorder_loggap_compare"] = f"""{base},
rmap AS (
  SELECT d.doc_id,
         ROW_NUMBER() OVER (ORDER BY md5(CAST(d.doc_id AS {d.str_type})),
                            d.doc_id) - 1 AS nd
  FROM documents d
),
gaps_url AS (
  SELECT doc_id - LAG(doc_id) OVER (PARTITION BY term_id ORDER BY doc_id)
           AS gap
  FROM postings
),
rp AS (SELECT p.term_id, r.nd AS doc_id
       FROM postings p JOIN rmap r ON r.doc_id = p.doc_id),
gaps_rnd AS (
  SELECT doc_id - LAG(doc_id) OVER (PARTITION BY term_id ORDER BY doc_id)
           AS gap
  FROM rp
)
SELECT 'a_url_order' AS ordering,
       CAST(SUM(CAST(FLOOR(LOG2(CAST(gap AS DOUBLE)) * {dlit(1e6)}
                           + {dlit(0.5)}) AS BIGINT)) AS BIGINT) AS cost_micro,
       CAST(COUNT(*) AS BIGINT) AS n_gaps
FROM gaps_url WHERE gap IS NOT NULL AND gap > 0
UNION ALL
SELECT 'b_random_order' AS ordering,
       CAST(SUM(CAST(FLOOR(LOG2(CAST(gap AS DOUBLE)) * {dlit(1e6)}
                           + {dlit(0.5)}) AS BIGINT)) AS BIGINT) AS cost_micro,
       CAST(COUNT(*) AS BIGINT) AS n_gaps
FROM gaps_rnd WHERE gap IS NOT NULL AND gap > 0"""

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

    # ----------------------------------------------------------------
    # Consolidated entries: the driver's CORRECTNESS file records a
    # bounded number of rows, so related operators are union-TAGGED
    # into one statement each — every component family lands a driver
    # row. The per-piece entries above are kept for targeted
    # debugging (scripts/selfcheck.py <name>) but only the
    # consolidated names are registered with the driver.

    # qld + pl2 + dph exhaustive disjunctions, tagged by scorer.
    pl2 = pl2_sql_expr(
        tf="p.tf", ctf="c.ctf", doc_len="s.doc_len",
        num_docs="st.num_docs", avg_len="st.avg_len",
    )
    dph = dph_sql_expr(
        tf="p.tf", ctf="c.ctf", doc_len="s.doc_len",
        num_docs="st.num_docs", avg_len="st.avg_len",
    )
    scorer_qscs = []
    for tag, expr in (("qld", qld), ("pl2", pl2), ("dph", dph)):
        scorer_qscs.append(f"""qsc_{tag} AS (
  SELECT qt.query_id, p.doc_id,
         CAST(SUM({micro_sql(expr, weight="qt.weight")}) AS BIGINT) AS micro
  FROM qterms qt
  JOIN postings p ON p.term_id = qt.term_id
  JOIN sizes s ON s.doc_id = p.doc_id
  JOIN ctfs c ON c.term_id = p.term_id
  CROSS JOIN stats st
  GROUP BY qt.query_id, p.doc_id
)""")
    scorer_qscs_sql = ",\n".join(scorer_qscs)
    scorer_union = "\n    UNION ALL\n    ".join(
        f"SELECT '{tag}' AS scorer, query_id, doc_id, micro"
        f" FROM qsc_{tag} WHERE micro > 0"
        for tag in ("qld", "pl2", "dph")
    )
    e["scorers_ranked_or_topk"] = f"""{base},
ctfs AS (SELECT term_id, CAST(SUM(tf) AS DOUBLE) AS ctf
         FROM postings GROUP BY term_id),
{scorer_qscs_sql}
SELECT scorer, query_id, rank, doc_id, score FROM (
  SELECT scorer, query_id, doc_id, micro / {dlit(1e6)} AS score,
         CAST(ROW_NUMBER() OVER (PARTITION BY scorer, query_id
                                 ORDER BY micro DESC, doc_id ASC) AS INT) AS rank
  FROM (
    {scorer_union}
  ) u
) r WHERE rank <= {K} ORDER BY scorer, query_id, rank"""

    # singles / singles+pairs / singles+pairs+triples threshold
    # estimates side by side, tagged by method. The 'single' branch is
    # value-identical to kth_threshold_estimate (max over terms of the
    # term's k-th single-term score, 0 when no term reaches rank k).
    from pisa_spark.query.thresholds import sampling_k_prime

    _KPRIME = sampling_k_prime(
        K, 1.0 / KTH_SAMPLE_MOD, KTH_SAMPLING_TARGET_O
    )
    _kth_all = e["kth_threshold_triples"].rsplit("allk AS", 1)[0]
    # 'budget' tag: the budget fork family
    # (tools/kth_threshold_budget_origional.cpp) estimates from a
    # CAPPED single-term cache — only the KTH_BUDGET most-queried
    # workload terms are cached (the fork's precomputed "exist terms"
    # gram list; qn DESC, term_id ASC is its query-log-frequency
    # selection made deterministic), uncached terms contribute 0, and
    # dup-term queries are skipped outright with -1 (ifDupTerm,
    # :31-41 — the fork's prefix caches assume distinct terms).
    # 'intersection' tag: the slicing fork
    # (tools/kth_threshold_intersection.cpp:114-251): enumerate the
    # fork's literal set-partition slicings of the query's sorted
    # distinct terms (thresholds.INTERSECTION_SLICINGS — its n=5 list
    # is incomplete and partially duplicated, transcribed verbatim;
    # duplicates are value-irrelevant under the MAX), cache the top-d
    # disjunctive prefix of every comb of <= KTH_GRAM terms, sum a
    # did's cached comb scores within each slicing, MAX across
    # slicings, take the k-th best; -2 under k cached dids (n=1 has
    # no slicings -> always -2), -1 for > 5 distinct terms.
    # 'lookup' tag: the lookup-pipeline fork
    # (kth_threshold_intersection_budget_lookup.cpp:690-835 /
    # threshold_lookup_whole_pipeline.cpp, gram=1 form): global
    # drain of the KTH_LOOKUP_BUDGET best cached single-term prefix
    # entries per query, EXACT full-score index lookup for every
    # drained did, k-th best; -2 under k candidates, -1 over 16
    # terms (MaxQueryLen).
    # 'combine_did_new' tag (kth_threshold_combine_did_new.cpp:
    # 211-232,340-432): every <= gram-2 comb of the query's
    # terms (ncomb: singles + pairs) caches the top-d dids
    # of its disjunctive sub-query; per did, cached comb scores
    # combine by MAX (not the original combine-did's per-term SUM);
    # k-th best, -2 under k cached dids.
    # 'substructure' tag
    # (kth_threshold_existance_substructure_test.cpp:211-232,
    # 380-432): same comb prefixes, unpacked to per-TERM components
    # deduplicated across overlapping combs (did_t_map[did][term]),
    # summed per did; k-th best, -2 under k cached dids.
    # Quality-harness tags — the simulator/real-world/score-generator
    # tools' shared evaluation protocol:
    # 'real_k10'/'real_k100' (kth_threshold_origional_score_generator
    # .cpp:144-179): the TRUE k-th final score at k in {10, 100}, 0
    # when the query has fewer results (the tool's 0 sentinel).
    # 'estimated_k_single' (kth_threshold_origional_real_world.cpp:
    # 330-343 and every *_simulator tool): the 1-based rank the
    # single-cache estimate lands at in the true ranked list —
    # 1 + the count of top-KTH_QUALITY_DEPTH scores strictly above
    # the estimate, clamped to the ranked-row count (the tools'
    # i+2 loop made tie- and tail-deterministic); -1 when the true
    # result set holds fewer than K docs (their skip sentinel).
    e["kth_thresholds"] = f"""{_kth_all}qids AS (SELECT DISTINCT query_id FROM qterms),
m_b AS (SELECT query_id, kth FROM skth UNION ALL SELECT query_id, kth FROM pkth),
m_c AS (SELECT query_id, kth FROM skth UNION ALL SELECT query_id, kth FROM pkth
        UNION ALL SELECT query_id, kth FROM trikth),
bsel AS (
  SELECT term_id FROM (
    SELECT term_id, CAST(COUNT(DISTINCT query_id) AS BIGINT) AS qn
    FROM qterms GROUP BY term_id
  ) t ORDER BY qn DESC, term_id ASC LIMIT {KTH_BUDGET}
),
bskth AS (
  SELECT s.query_id, s.term_id, s.m AS kth FROM (
    SELECT query_id, term_id, doc_id, m,
           ROW_NUMBER() OVER (PARTITION BY query_id, term_id
                              ORDER BY m DESC, doc_id ASC) AS rn
    FROM pm
  ) s JOIN bsel b ON b.term_id = s.term_id WHERE s.rn = {K}
),
smp AS (
  SELECT query_id, doc_id, CAST(SUM(m) AS BIGINT) AS ms
  FROM pm WHERE doc_id % {KTH_SAMPLE_MOD} = 0
  GROUP BY query_id, doc_id
),
skprime AS (
  SELECT query_id, ms FROM (
    SELECT query_id, doc_id, ms,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY ms DESC, doc_id ASC) AS rn
    FROM smp
  ) x WHERE rn = {_KPRIME}
),
cdsel AS (
  SELECT query_id, doc_id, m FROM (
    SELECT query_id, term_id, doc_id, m,
           ROW_NUMBER() OVER (PARTITION BY query_id, term_id
                              ORDER BY m DESC, doc_id ASC) AS rn
    FROM pm
  ) t WHERE rn <= {KTH_COMBINE_D}
),
cdsum AS (
  SELECT query_id, doc_id, CAST(SUM(m) AS BIGINT) AS ms
  FROM cdsel GROUP BY query_id, doc_id
),
cdkth AS (
  SELECT query_id, ms FROM (
    SELECT query_id, doc_id, ms,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY ms DESC, doc_id ASC) AS rn
    FROM cdsum
  ) y WHERE rn = {K}
),
slice_pos AS (SELECT * FROM (VALUES
{_slice_pos_values()}
) AS t(n, slicing_id, comb_id, pos)),
iqdist AS (SELECT DISTINCT query_id, term_id FROM qterms),
iqn AS (SELECT query_id, CAST(COUNT(*) AS INT) AS n
        FROM iqdist GROUP BY query_id),
iqrank AS (
  SELECT query_id, term_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY term_id ASC) - 1 AS INT) AS pos
  FROM iqdist
),
icomb AS (
  SELECT r.query_id, sp.slicing_id, sp.comb_id, r.term_id
  FROM iqrank r
  JOIN iqn ON iqn.query_id = r.query_id
  JOIN slice_pos sp ON sp.n = iqn.n AND sp.pos = r.pos
),
icsz AS (SELECT query_id, slicing_id, comb_id,
                CAST(COUNT(*) AS INT) AS csz
         FROM icomb GROUP BY query_id, slicing_id, comb_id),
icombdoc AS (
  SELECT c.query_id, c.slicing_id, c.comb_id, p.doc_id,
         CAST(SUM(p.m) AS BIGINT) AS ms
  FROM icomb c
  JOIN icsz z ON z.query_id = c.query_id AND z.slicing_id = c.slicing_id
             AND z.comb_id = c.comb_id
  JOIN pm p ON p.query_id = c.query_id AND p.term_id = c.term_id
  WHERE z.csz <= {KTH_GRAM}
  GROUP BY c.query_id, c.slicing_id, c.comb_id, p.doc_id
),
icombtop AS (
  SELECT query_id, slicing_id, comb_id, doc_id, ms FROM (
    SELECT query_id, slicing_id, comb_id, doc_id, ms,
           ROW_NUMBER() OVER (PARTITION BY query_id, slicing_id, comb_id
                              ORDER BY ms DESC, doc_id ASC) AS rn
    FROM icombdoc
  ) t WHERE rn <= {KTH_COMBINE_D}
),
islsum AS (SELECT query_id, slicing_id, doc_id,
                  CAST(SUM(ms) AS BIGINT) AS ms
           FROM icombtop GROUP BY query_id, slicing_id, doc_id),
ibest AS (SELECT query_id, doc_id, CAST(MAX(ms) AS BIGINT) AS ms
          FROM islsum GROUP BY query_id, doc_id),
ikth AS (
  SELECT query_id, ms FROM (
    SELECT query_id, doc_id, ms,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY ms DESC, doc_id ASC) AS rn
    FROM ibest
  ) t WHERE rn = {K}
),
lkcand AS (
  SELECT DISTINCT query_id, doc_id FROM (
    SELECT query_id, doc_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY m DESC, doc_id ASC, term_id ASC) AS rn
    FROM pm
  ) t WHERE rn <= {KTH_LOOKUP_BUDGET}
),
lkfull AS (
  SELECT p.query_id, p.doc_id, CAST(SUM(p.m) AS BIGINT) AS ms
  FROM pm p
  JOIN lkcand c ON c.query_id = p.query_id AND c.doc_id = p.doc_id
  GROUP BY p.query_id, p.doc_id
),
lkkth AS (
  SELECT query_id, ms FROM (
    SELECT query_id, doc_id, ms,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY ms DESC, doc_id ASC) AS rn
    FROM lkfull
  ) t WHERE rn = {K}
),
ncomb AS (
  SELECT query_id, CAST(term_id AS {d.str_type}) AS comb_key, term_id
  FROM iqdist
  UNION ALL
  SELECT a.query_id,
         CONCAT(CAST(a.term_id AS {d.str_type}), '-', CAST(b.term_id AS {d.str_type})),
         a.term_id
  FROM iqdist a JOIN iqdist b
    ON a.query_id = b.query_id AND a.term_id < b.term_id
  UNION ALL
  SELECT a.query_id,
         CONCAT(CAST(a.term_id AS {d.str_type}), '-', CAST(b.term_id AS {d.str_type})),
         b.term_id
  FROM iqdist a JOIN iqdist b
    ON a.query_id = b.query_id AND a.term_id < b.term_id
),
ncombdoc AS (
  SELECT c.query_id, c.comb_key, p.doc_id,
         CAST(SUM(p.m) AS BIGINT) AS ms
  FROM ncomb c
  JOIN pm p ON p.query_id = c.query_id AND p.term_id = c.term_id
  GROUP BY c.query_id, c.comb_key, p.doc_id
),
nprefix AS (
  SELECT query_id, comb_key, doc_id, ms FROM (
    SELECT query_id, comb_key, doc_id, ms,
           ROW_NUMBER() OVER (PARTITION BY query_id, comb_key
                              ORDER BY ms DESC, doc_id ASC) AS rn
    FROM ncombdoc
  ) t WHERE rn <= {KTH_COMBINE_D}
),
nkth AS (
  SELECT query_id, ms FROM (
    SELECT query_id, doc_id, ms,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY ms DESC, doc_id ASC) AS rn
    FROM (SELECT query_id, doc_id, CAST(MAX(ms) AS BIGINT) AS ms
          FROM nprefix GROUP BY query_id, doc_id) b
  ) t WHERE rn = {K}
),
sscomp AS (
  SELECT DISTINCT n.query_id, c.term_id, n.doc_id
  FROM nprefix n
  JOIN ncomb c ON c.query_id = n.query_id AND c.comb_key = n.comb_key
),
sskth AS (
  SELECT query_id, ms FROM (
    SELECT query_id, doc_id, ms,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY ms DESC, doc_id ASC) AS rn
    FROM (SELECT s.query_id, s.doc_id, CAST(SUM(p.m) AS BIGINT) AS ms
          FROM sscomp s
          JOIN pm p ON p.query_id = s.query_id
                   AND p.term_id = s.term_id AND p.doc_id = s.doc_id
          GROUP BY s.query_id, s.doc_id) u
  ) t WHERE rn = {K}
),
fullrk AS (
  SELECT query_id, doc_id, ms,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY ms DESC, doc_id ASC) AS rn
  FROM (SELECT query_id, doc_id, CAST(SUM(m) AS BIGINT) AS ms
        FROM pm GROUP BY query_id, doc_id) f
),
sest AS (
  SELECT q.query_id, CAST(MAX(COALESCE(a.kth, 0)) AS BIGINT) AS est
  FROM qids q LEFT JOIN skth a ON a.query_id = q.query_id
  GROUP BY q.query_id
),
estk AS (
  SELECT s.query_id,
         CAST(LEAST(
           CAST(COUNT(CASE WHEN f.ms > s.est THEN 1 END) + 1 AS BIGINT),
           CAST(COUNT(f.ms) AS BIGINT)
         ) AS BIGINT) AS ek
  FROM sest s
  LEFT JOIN fullrk f ON f.query_id = s.query_id
                    AND f.rn <= {KTH_QUALITY_DEPTH}
  GROUP BY s.query_id, s.est
)
SELECT method, query_id, threshold_micro FROM (
  SELECT 'single' AS method, q.query_id,
         CAST(MAX(COALESCE(a.kth, 0)) AS BIGINT) AS threshold_micro
  FROM qids q LEFT JOIN skth a ON a.query_id = q.query_id GROUP BY q.query_id
  UNION ALL
  SELECT 'pairs' AS method, q.query_id,
         CAST(MAX(COALESCE(b.kth, 0)) AS BIGINT) AS threshold_micro
  FROM qids q LEFT JOIN m_b b ON b.query_id = q.query_id GROUP BY q.query_id
  UNION ALL
  SELECT 'triples' AS method, q.query_id,
         CAST(MAX(COALESCE(c.kth, 0)) AS BIGINT) AS threshold_micro
  FROM qids q LEFT JOIN m_c c ON c.query_id = q.query_id GROUP BY q.query_id
  UNION ALL
  SELECT 'budget' AS method, q.query_id,
         CAST(CASE WHEN MAX(q.weight) > 1 THEN -1
              ELSE MAX(COALESCE(d.kth, 0)) END AS BIGINT) AS threshold_micro
  FROM qterms q
  LEFT JOIN bskth d ON d.query_id = q.query_id AND d.term_id = q.term_id
  GROUP BY q.query_id
  UNION ALL
  SELECT 'sampling' AS method, q.query_id,
         CAST(COALESCE(sp.ms, -1) AS BIGINT) AS threshold_micro
  FROM qids q LEFT JOIN skprime sp ON sp.query_id = q.query_id
  UNION ALL
  SELECT 'combine_did' AS method, q.query_id,
         CAST(COALESCE(cd.ms, -2) AS BIGINT) AS threshold_micro
  FROM qids q LEFT JOIN cdkth cd ON cd.query_id = q.query_id
  UNION ALL
  SELECT 'intersection' AS method, q.query_id,
         CAST(CASE WHEN n.n > 5 THEN -1 ELSE COALESCE(ik.ms, -2) END
              AS BIGINT) AS threshold_micro
  FROM qids q
  JOIN iqn n ON n.query_id = q.query_id
  LEFT JOIN ikth ik ON ik.query_id = q.query_id
  UNION ALL
  SELECT 'lookup' AS method, q.query_id,
         CAST(CASE WHEN n.n > 16 THEN -1 ELSE COALESCE(lk.ms, -2) END
              AS BIGINT) AS threshold_micro
  FROM qids q
  JOIN iqn n ON n.query_id = q.query_id
  LEFT JOIN lkkth lk ON lk.query_id = q.query_id
  UNION ALL
  SELECT 'combine_did_new' AS method, q.query_id,
         CAST(COALESCE(nk.ms, -2) AS BIGINT) AS threshold_micro
  FROM qids q LEFT JOIN nkth nk ON nk.query_id = q.query_id
  UNION ALL
  SELECT 'substructure' AS method, q.query_id,
         CAST(COALESCE(sk.ms, -2) AS BIGINT) AS threshold_micro
  FROM qids q LEFT JOIN sskth sk ON sk.query_id = q.query_id
  UNION ALL
  SELECT 'real_k10' AS method, q.query_id,
         CAST(COALESCE(r.ms, 0) AS BIGINT) AS threshold_micro
  FROM qids q LEFT JOIN fullrk r ON r.query_id = q.query_id AND r.rn = 10
  UNION ALL
  SELECT 'real_k100' AS method, q.query_id,
         CAST(COALESCE(r.ms, 0) AS BIGINT) AS threshold_micro
  FROM qids q LEFT JOIN fullrk r ON r.query_id = q.query_id AND r.rn = 100
  UNION ALL
  SELECT 'estimated_k_single' AS method, q.query_id,
         CAST(CASE WHEN r.ms IS NULL THEN -1 ELSE e.ek END
              AS BIGINT) AS threshold_micro
  FROM qids q
  LEFT JOIN fullrk r ON r.query_id = q.query_id AND r.rn = {K}
  LEFT JOIN estk e ON e.query_id = q.query_id
) u ORDER BY method, query_id"""

    # AND + OR result sets in one statement, tagged by op (oracle for
    # the kernel-side and_query/or_query union).
    e["boolean_docs"] = f"""{base}
SELECT op, query_id, doc_id FROM (
  SELECT 'and' AS op, sc.query_id, sc.doc_id
  FROM scored sc JOIN qsize qs ON sc.query_id = qs.query_id
  WHERE sc.n_matched = qs.n_terms
  UNION ALL
  SELECT 'or' AS op, query_id, doc_id FROM scored
) u ORDER BY op, query_id, doc_id"""

    # shard_stats + shard_vocab joined on shard_id (partition_fwd_index
    # + shards meta-tool in one row set).
    e["shard_summary"] = f"""{base},
ss AS (SELECT CAST(s.doc_id % 4 AS INT) AS shard_id,
              CAST(COUNT(*) AS BIGINT) AS num_docs,
              CAST(SUM(s.doc_len) AS BIGINT) AS collection_len
       FROM sizes s GROUP BY s.doc_id % 4),
sv AS (SELECT shard_id, CAST(COUNT(*) AS BIGINT) AS vocab_size FROM (
         SELECT DISTINCT CAST(p.doc_id % 4 AS INT) AS shard_id, p.term_id
         FROM postings p) x GROUP BY shard_id)
SELECT ss.shard_id, ss.num_docs, ss.collection_len, sv.vocab_size
FROM ss JOIN sv ON sv.shard_id = ss.shard_id ORDER BY ss.shard_id"""

    # Round-trip decode of EVERY registered codec's segments in one
    # entry: the engine side unions per-codec decodes tagged by codec;
    # the oracle is the postings table replicated per codec tag.
    codec_tags = " UNION ALL ".join(
        f"SELECT '{c}' AS codec" for c in DECODE_CHECK_CODECS
    )
    # the 'ciff' tag round-trips the interchange format over the
    # first CIFF_TAG_TERMS lists (gated/entries._ciff_roundtrip)
    e["segments_decode_check"] = f"""{base}
SELECT codec, term_id, doc_id, tf FROM (
  SELECT c.codec, p.term_id, p.doc_id, p.tf
  FROM postings p CROSS JOIN ({codec_tags}) c
  UNION ALL
  SELECT fmt AS codec, p.term_id, p.doc_id, p.tf
  FROM postings p CROSS JOIN (
    SELECT 'ciff' AS fmt UNION ALL SELECT 'bincoll' AS fmt
  ) f WHERE p.term_id < {CIFF_TAG_TERMS}
) u ORDER BY codec, term_id, doc_id"""

    # BMW under bootstrap/cwand/quantized/varblock configurations,
    # tagged by variant: non-quantized variants must equal ranked_or;
    # the quantized variant must equal the impact-quantized oracle.
    quant_common = e["quantized_ranked_or_topk"].rsplit(
        "SELECT query_id, rank", 1
    )[0]
    bmw_ranked_tags = " UNION ALL ".join(
        f"SELECT '{t}' AS variant" for t in BMW_VARIANT_TAGS
        if t != "quantized"
    )
    e["bmw_variants_topk"] = f"""{quant_common}
SELECT variant, query_id, rank, doc_id, score FROM (
  SELECT v.variant, r.query_id, r.rank, r.doc_id, r.score
  FROM ranked r CROSS JOIN ({bmw_ranked_tags}) v WHERE r.rank <= {K}
  UNION ALL
  SELECT 'quantized' AS variant, query_id, rank, doc_id, score FROM (
    SELECT query_id, doc_id, CAST(units AS DOUBLE) AS score,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY units DESC, doc_id ASC) AS INT) AS rank
    FROM qsc WHERE units > 0
  ) qq WHERE qq.rank <= {K}
) u ORDER BY variant, query_id, rank"""

    # Range execution (doc-range-partitioned) under maxscore / BMW /
    # BMW+live-block pruning, tagged by range_mode — all three must be
    # rank-identical to the exhaustive disjunction.
    range_tags = " UNION ALL ".join(
        f"SELECT '{m}' AS range_mode" for m in RANGE_MODE_TAGS
    )
    e["range_topk"] = f"""{base}
SELECT m.range_mode, r.query_id, r.rank, r.doc_id, r.score
FROM ranked r CROSS JOIN ({range_tags}) m
WHERE r.rank <= {K} ORDER BY m.range_mode, r.query_id, r.rank"""

    # Execution strategies over the same workload: adaptive per-query
    # kernel selection and batch-major execution with the shared
    # decoded-block cache — both must be rank-identical to the
    # exhaustive disjunction.
    strat_tags = " UNION ALL ".join(
        f"SELECT '{t}' AS strategy" for t in STRATEGY_TAGS
    )
    e["strategy_topk"] = f"""{base}
SELECT s.strategy, r.query_id, r.rank, r.doc_id, r.score
FROM ranked r CROSS JOIN ({strat_tags}) s
WHERE r.rank <= {K} ORDER BY s.strategy, r.query_id, r.rank"""

    return e
