"""Text-analysis operators: language ID, quality scoring, token
counting, winnowing document fingerprints.

All SQL-expressible (native Catalyst on the Spark side, DuckDB SQL
for the oracle) with integer/micro-quantized outputs. Regex patterns
restrict to classes Java-regex (Spark) and RE2 (DuckDB) treat
identically.

Scale: every operator is one scan + one doc_id-partitioned
aggregation/window — no cross-doc joins, so they pipeline over 100 TB
with pure map-side parallelism plus a doc-hash shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from pisa_spark.datapipe.hashing import hash31_sql
from pisa_spark.datapipe.tokens import TOK_CTE, tokens_df
from pisa_spark.functions.scoring import dlit

# Tiny per-language function-word profiles (the classic n-gram/
# stopword heuristic at word granularity — deterministic and
# explainable; a real system swaps in charset trigram profiles).
LANG_WORDS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "for", "on", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"],
    "fr": ["le", "la", "les", "et", "des", "un", "une", "du"],
}

EN_STOPWORDS = LANG_WORDS["en"]

BPE_ISH_RE = "[a-z]+|[0-9]|[^a-z0-9 ]"  # crude byte-pair-ish unit classes

FP_K = 3  # fingerprint shingle size (tokens)
FP_WINDOW = 4  # winnowing window (shingles)


def _lang_rows() -> list[tuple[str, str]]:
    return [(lang, w) for lang, words in LANG_WORDS.items() for w in words]


# ------------------------------------------------------------------ lang id

def lang_id(docs: DataFrame) -> DataFrame:
    """(doc_id, pred_lang, n_hits): argmax function-word votes;
    ties break to the alphabetically first language; no hits -> 'und'.
    Profile table is a broadcast join against exploded tokens."""
    spark = docs.sparkSession
    prof = spark.createDataFrame(_lang_rows(), schema="lang_cand string, term string")
    tok = tokens_df(docs)
    hits = (
        tok.join(F.broadcast(prof), "term")
        .groupBy("doc_id", "lang_cand")
        .agg(F.count("*").alias("n_hits"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("n_hits").desc(), F.col("lang_cand").asc()
    )
    best = (
        hits.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select("doc_id", F.col("lang_cand").alias("pred_lang"), "n_hits")
    )
    return (
        docs.select("doc_id")
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("pred_lang", F.lit("und")).alias("pred_lang"),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
        )
    )


def lang_id_oracle() -> str:
    values = ", ".join(f"('{lang}', '{w}')" for lang, w in _lang_rows())
    return f"""WITH {TOK_CTE},
prof(lang_cand, term) AS (VALUES {values}),
hits AS (
  SELECT t.doc_id, p.lang_cand, COUNT(*) AS n_hits
  FROM tok t JOIN prof p ON t.term = p.term
  GROUP BY t.doc_id, p.lang_cand
),
best AS (
  SELECT doc_id, lang_cand AS pred_lang, n_hits FROM (
    SELECT doc_id, lang_cand, n_hits,
           ROW_NUMBER() OVER (PARTITION BY doc_id
                              ORDER BY n_hits DESC, lang_cand ASC) AS r
    FROM hits
  ) WHERE r = 1
)
SELECT d.doc_id, COALESCE(b.pred_lang, 'und') AS pred_lang,
       CAST(COALESCE(b.n_hits, 0) AS BIGINT) AS n_hits
FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id"""


# ------------------------------------------------------------ quality score

def quality_score(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_types, ttr_micro, stop_ratio_micro,
    mean_tok_len_micro, quality_micro).

    quality = 0.4*stop_ratio + 0.3*min(1, n_tokens/100) + 0.3*ttr —
    a C4/Gopher-style lexical-quality composite, micro-quantized so
    both engines emit identical integers."""
    tok = tokens_df(docs)
    stop = F.when(F.col("term").isin(EN_STOPWORDS), 1).otherwise(0)
    agg = tok.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.countDistinct("term").alias("n_types"),
        F.sum(stop).alias("n_stop"),
        F.sum(F.length("term")).alias("tot_len"),
    )
    ttr = f"CAST(n_types AS DOUBLE) / n_tokens"
    stopr = f"CAST(n_stop AS DOUBLE) / n_tokens"
    mlen = f"CAST(tot_len AS DOUBLE) / n_tokens"
    lenf = f"LEAST({dlit(1.0)}, n_tokens / {dlit(100.0)})"
    quality = (
        f"{dlit(0.4)} * {stopr} + {dlit(0.3)} * {lenf} + {dlit(0.3)} * {ttr}"
    )

    def micro(e: str) -> str:
        return f"CAST(FLOOR(({e}) * {dlit(1e6)} + {dlit(0.5)}) AS BIGINT)"

    return agg.select(
        "doc_id",
        F.col("n_tokens").cast("long"),
        F.col("n_types").cast("long"),
        F.expr(micro(ttr)).alias("ttr_micro"),
        F.expr(micro(stopr)).alias("stop_ratio_micro"),
        F.expr(micro(mlen)).alias("mean_tok_len_micro"),
        F.expr(micro(quality)).alias("quality_micro"),
    )


def quality_score_oracle() -> str:
    stop_list = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    ttr = "CAST(n_types AS DOUBLE) / n_tokens"
    stopr = "CAST(n_stop AS DOUBLE) / n_tokens"
    mlen = "CAST(tot_len AS DOUBLE) / n_tokens"
    lenf = f"LEAST({dlit(1.0)}, n_tokens / {dlit(100.0)})"
    quality = f"{dlit(0.4)} * {stopr} + {dlit(0.3)} * {lenf} + {dlit(0.3)} * {ttr}"

    def micro(e: str) -> str:
        return f"CAST(FLOOR(({e}) * {dlit(1e6)} + {dlit(0.5)}) AS BIGINT)"

    return f"""WITH {TOK_CTE},
agg AS (
  SELECT doc_id, COUNT(*) AS n_tokens, COUNT(DISTINCT term) AS n_types,
         SUM(CASE WHEN term IN ({stop_list}) THEN 1 ELSE 0 END) AS n_stop,
         SUM(length(term)) AS tot_len
  FROM tok GROUP BY doc_id
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_types AS BIGINT) AS n_types,
       {micro(ttr)} AS ttr_micro,
       {micro(stopr)} AS stop_ratio_micro,
       {micro(mlen)} AS mean_tok_len_micro,
       {micro(quality)} AS quality_micro
FROM agg"""


# -------------------------------------------------------------- token count

def token_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, ws_tokens, bpe_ish_tokens, n_chars): whitespace token
    count + a BPE-ish regex unit count — both single-pass scalar
    expressions (whole-stage codegen, no shuffle at all)."""
    return docs.select(
        "doc_id",
        F.expr(
            "CAST(size(filter(split(lower(text), '\\\\s+'), t -> t <> '')) AS BIGINT)"
        ).alias("ws_tokens"),
        F.expr(
            f"CAST(size(regexp_extract_all(lower(text), '{BPE_ISH_RE}', 0)) AS BIGINT)"
        ).alias("bpe_ish_tokens"),
        F.length("text").cast("long").alias("n_chars"),
    )


def token_counts_oracle() -> str:
    return f"""SELECT doc_id,
       CAST(len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                            t -> t <> '')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(lower(text), '{BPE_ISH_RE}')) AS BIGINT)
         AS bpe_ish_tokens,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents"""


# -------------------------------------------------------------- fingerprint

def doc_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, fingerprint): winnowing — hash31 of each FP_K-token
    shingle, rolling MIN over FP_WINDOW shingles, distinct. The
    standard content-fingerprint for plagiarism/overlap detection
    (Schleimer+ SIGMOD'03), per-doc window only."""
    tok = tokens_df(docs)
    w = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("term")] + [F.lead("term", i).over(w) for i in range(1, FP_K)]
    sh = (
        tok.select(
            "doc_id", "pos", F.concat_ws(" ", *parts).alias("shingle"),
            F.lead("term", FP_K - 1).over(w).alias("_tail"),
        )
        .filter(F.col("_tail").isNotNull())
        .select("doc_id", "pos", F.expr(hash31_sql("shingle", "spark")).alias("sh"))
    )
    wmin = (
        Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, FP_WINDOW - 1)
    )
    return (
        sh.select("doc_id", F.min("sh").over(wmin).alias("fingerprint"))
        .distinct()
    )


def doc_fingerprints_oracle() -> str:
    parts = ["term"] + [f"LEAD(term, {i}) OVER w" for i in range(1, FP_K)]
    concat = " || ' ' || ".join(parts)
    return f"""WITH {TOK_CTE},
shp AS (
  SELECT doc_id, pos, {concat} AS shingle,
         LEAD(term, {FP_K - 1}) OVER w AS tail_tok
  FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
shh AS (
  SELECT doc_id, pos, {hash31_sql('shingle', 'duckdb')} AS sh
  FROM shp WHERE tail_tok IS NOT NULL
)
SELECT DISTINCT doc_id,
       MIN(sh) OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN CURRENT ROW AND {FP_WINDOW - 1} FOLLOWING)
         AS fingerprint
FROM shh"""
