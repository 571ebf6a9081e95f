"""Tokenization + shingling shared by the datapipe operators.

Tokenization rule (identical in the DataFrame code and the DuckDB
oracle): lowercase, split on whitespace runs, drop empty tokens —
the same WhitespaceTokenizer+LowercaseFilter semantics as the index
gate (reference src/tokenizer.cpp:36-47, src/token_filter.cpp:46-60).

Shingles are k-token windows joined with single spaces, formed with
``LEAD`` over (doc, position) — a per-doc window, so at scale it
shuffles once on doc_id and never materializes a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from pisa_spark.datapipe.hashing import hash31_sql


def tokens_df(docs: DataFrame) -> DataFrame:
    """documents(doc_id, text, ...) -> (doc_id, pos, term)."""
    return (
        docs.select(
            "doc_id",
            F.posexplode(F.split(F.lower("text"), r"\s+")).alias("pos", "term"),
        )
        .filter(F.col("term") != "")
    )


def shingles_df(docs: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, sh) distinct hash31 shingle set per doc."""
    tok = tokens_df(docs)
    w = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("term")] + [F.lead("term", i).over(w) for i in range(1, k)]
    sh = tok.select(
        "doc_id", F.concat_ws(" ", *parts).alias("shingle"),
        *[F.lead("term", k - 1).over(w).alias("_tail")],
    ).filter(F.col("_tail").isNotNull())
    return sh.select(
        "doc_id", F.expr(hash31_sql("shingle", "spark")).alias("sh")
    ).distinct()


# --------------------------------------------------------------- DuckDB SQL

TOK_CTE = """
tok AS (
  SELECT doc_id, term, pos FROM (
    SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS pos
    FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS toks
          FROM documents) d
  ) t WHERE term <> ''
)
""".strip()


def shingle_cte(k: int = 3) -> str:
    """CTEs: tok -> shraw (k-token shingles) -> shd (distinct hash31)."""
    parts = ["term"] + [f"LEAD(term, {i}) OVER w" for i in range(1, k)]
    concat = " || ' ' || ".join(parts)
    return f"""{TOK_CTE},
shraw AS (
  SELECT doc_id, {concat} AS shingle,
         LEAD(term, {k - 1}) OVER w AS tail_tok
  FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
shd AS (
  SELECT DISTINCT doc_id, {hash31_sql('shingle', 'duckdb')} AS sh
  FROM shraw WHERE tail_tok IS NOT NULL
)"""
