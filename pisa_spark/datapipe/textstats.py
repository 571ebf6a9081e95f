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
    return agg.select(
        "doc_id",
        F.col("n_tokens").cast("long"),
        F.col("n_types").cast("long"),
        *_QUALITY_MICRO_COLS(),
    )


def _micro(e: str) -> str:
    return f"CAST(FLOOR(({e}) * {dlit(1e6)} + {dlit(0.5)}) AS BIGINT)"


def _QUALITY_MICRO_COLS():
    """Micro-quantized quality columns over (n_tokens, n_types,
    n_stop, tot_len) — shared by quality_score and doc_signals."""
    ttr = "CAST(n_types AS DOUBLE) / n_tokens"
    stopr = "CAST(n_stop AS DOUBLE) / n_tokens"
    mlen = "CAST(tot_len AS DOUBLE) / n_tokens"
    lenf = f"LEAST({dlit(1.0)}, n_tokens / {dlit(100.0)})"
    quality = (
        f"{dlit(0.4)} * {stopr} + {dlit(0.3)} * {lenf} + {dlit(0.3)} * {ttr}"
    )
    return [
        F.expr(_micro(ttr)).alias("ttr_micro"),
        F.expr(_micro(stopr)).alias("stop_ratio_micro"),
        F.expr(_micro(mlen)).alias("mean_tok_len_micro"),
        F.expr(_micro(quality)).alias("quality_micro"),
    ]


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


# ----------------------------------------------------------- repetition
#
# Token-level Gopher-style repetition signals (Rae+ '21 §A1.1, public
# paper): the fraction of the document covered by its most frequent
# bigram / unigram, and the fraction of token positions sitting inside
# a duplicated trigram. The paper's rules are character-level over
# lines; this corpus is a whitespace word stream, so the signals are
# token-level — same filtering intent (boilerplate and degenerate
# repetition score high), same thresholds shape.

REP_TOP_NGRAM = 2  # "most frequent n-gram" signal size
REP_DUP_NGRAM = 3  # "duplicated n-gram" signal size


def _per_gram(docs: DataFrame) -> DataFrame:
    """(doc_id, kind, gram, c) occurrence counts for kind in
    {'t' token, 'g2' bigram, 'g3' trigram} — ONE corpus scan: a single
    per-doc window pass emits the token, its bigram, and its trigram
    side by side, melted to (doc_id, kind, gram) rows. Everything
    downstream is aggregations whose keys contain doc_id (partial
    map-side combine, doc-hash partitioning, no cross-doc join).
    Scanning once instead of once per gram size is the difference
    between 1x and 3x input I/O at 100 TB."""
    tok = tokens_df(docs)
    w = Window.partitionBy("doc_id").orderBy("pos")
    l1, l2 = F.lead("term", 1).over(w), F.lead("term", 2).over(w)
    melted = (
        tok.select(
            "doc_id",
            F.array(
                F.struct(F.lit("t").alias("kind"), F.col("term").alias("gram")),
                F.struct(
                    F.lit("g2").alias("kind"),
                    F.when(l1.isNotNull(),
                           F.concat_ws(" ", "term", l1)).alias("gram"),
                ),
                F.struct(
                    F.lit("g3").alias("kind"),
                    F.when(l2.isNotNull(),
                           F.concat_ws(" ", "term", l1, l2)).alias("gram"),
                ),
            ).alias("kg"),
        )
        .select("doc_id", F.explode("kg").alias("kg"))
        .select("doc_id", "kg.kind", "kg.gram")
        .filter(F.col("gram").isNotNull())
    )
    return melted.groupBy("doc_id", "kind", "gram").agg(
        F.count("*").alias("c"))


def _micro_capped(num: str) -> str:
    frac = f"LEAST({dlit(1.0)}, CAST({num} AS DOUBLE) / n_tokens)"
    return f"CAST(FLOOR(({frac}) * {dlit(1e6)} + {dlit(0.5)}) AS BIGINT)"


def _REP_AGGS():
    """max1/max2/dup3 aggregates over the melted gram counts —
    shared by repetition_stats and doc_signals."""
    return [
        F.max(F.when(F.col("kind") == "t", F.col("c"))).alias("max1"),
        F.coalesce(
            F.max(F.when(F.col("kind") == "g2", F.col("c"))), F.lit(0)
        ).alias("max2"),
        F.coalesce(
            F.sum(F.when((F.col("kind") == "g3") & (F.col("c") >= 2),
                         F.col("c"))), F.lit(0)
        ).alias("dup3"),
    ]


def _REP_MICRO_COLS():
    return [
        F.expr(_micro_capped(f"{REP_TOP_NGRAM} * max2")).alias(
            "top_bigram_frac_micro"),
        F.expr(_micro_capped(f"{REP_DUP_NGRAM} * dup3")).alias(
            "dup_trigram_frac_micro"),
        F.expr(_micro_capped("max1")).alias("max_term_frac_micro"),
    ]


def repetition_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, top_bigram_frac_micro, dup_trigram_frac_micro,
    max_term_frac_micro).

    - top_bigram_frac: tokens covered by the most frequent bigram =
      2 * max(bigram count) / n_tokens, capped at 1 (overlaps can
      push the product past the token count on degenerate runs).
    - dup_trigram_frac: trigram occurrences whose trigram appears
      >= 2 times, scaled by 3/n_tokens, capped at 1.
    - max_term_frac: most frequent single token / n_tokens.

    One corpus scan (see _per_gram)."""
    j = _per_gram(docs).groupBy("doc_id").agg(
        F.sum(F.when(F.col("kind") == "t", F.col("c"))).alias("n_tokens"),
        *_REP_AGGS(),
    )
    return j.select("doc_id", *_REP_MICRO_COLS())


def doc_signals(docs: DataFrame) -> DataFrame:
    """The full per-doc filter-signals row: quality_score +
    repetition_stats + token_counts columns, from ONE tokenize scan.

    The lexical-quality aggregates all derive from the kind='t' slice
    of the melted gram counts (n_types = distinct-term row count,
    n_stop/tot_len weight each distinct term by its count), so quality
    and repetition share a single scan + two doc-keyed aggregations;
    only token_counts adds a second scan (its regexp units need the
    raw text), joined on doc_id."""
    t = F.col("kind") == "t"
    stop = t & F.col("gram").isin(EN_STOPWORDS)
    agg = _per_gram(docs).groupBy("doc_id").agg(
        F.sum(F.when(t, F.col("c"))).alias("n_tokens"),
        F.count(F.when(t, F.lit(1))).alias("n_types"),
        F.coalesce(F.sum(F.when(stop, F.col("c"))), F.lit(0)).alias("n_stop"),
        F.sum(F.when(t, F.length("gram") * F.col("c"))).alias("tot_len"),
        *_REP_AGGS(),
    )
    return (
        agg.select(
            "doc_id",
            F.col("n_tokens").cast("long"),
            F.col("n_types").cast("long"),
            *_QUALITY_MICRO_COLS(),
            *_REP_MICRO_COLS(),
        )
        .join(token_counts(docs), "doc_id")
    )


def repetition_stats_oracle() -> str:
    def gram_cte(name: str, n: int) -> str:
        parts = ["term"] + [f"LEAD(term, {i}) OVER w" for i in range(1, n)]
        concat = " || ' ' || ".join(parts)
        return f"""{name} AS (
  SELECT doc_id, gram FROM (
    SELECT doc_id, {concat} AS gram, LEAD(term, {n - 1}) OVER w AS tail_tok
    FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  ) WHERE tail_tok IS NOT NULL
)"""

    micro_capped = _micro_capped  # dialect-neutral (dlit literals only)

    return f"""WITH {TOK_CTE},
{gram_cte('g2', REP_TOP_NGRAM)},
{gram_cte('g3', REP_DUP_NGRAM)},
ntok AS (SELECT doc_id, COUNT(*) AS n_tokens FROM tok GROUP BY doc_id),
top1 AS (SELECT doc_id, MAX(c) AS max1 FROM (
  SELECT doc_id, term, COUNT(*) AS c FROM tok GROUP BY doc_id, term
) GROUP BY doc_id),
top2 AS (SELECT doc_id, MAX(c) AS max2 FROM (
  SELECT doc_id, gram, COUNT(*) AS c FROM g2 GROUP BY doc_id, gram
) GROUP BY doc_id),
dup3 AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS dup3 FROM (
  SELECT doc_id, gram, COUNT(*) AS c FROM g3 GROUP BY doc_id, gram
) WHERE c >= 2 GROUP BY doc_id),
j AS (
  SELECT n.doc_id, n.n_tokens, t1.max1,
         COALESCE(t2.max2, 0) AS max2, COALESCE(d3.dup3, 0) AS dup3
  FROM ntok n JOIN top1 t1 ON n.doc_id = t1.doc_id
  LEFT JOIN top2 t2 ON n.doc_id = t2.doc_id
  LEFT JOIN dup3 d3 ON n.doc_id = d3.doc_id
)
SELECT doc_id,
       {micro_capped(f'{REP_TOP_NGRAM} * max2')} AS top_bigram_frac_micro,
       {micro_capped(f'{REP_DUP_NGRAM} * dup3')} AS dup_trigram_frac_micro,
       {micro_capped('max1')} AS max_term_frac_micro
FROM j"""


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
