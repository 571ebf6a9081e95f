"""Vectorized text analysis: tokenizers + token filters + HTML strip.

Parity targets (semantics only — implementation is pandas/numpy):

- EnglishTokenizer: a first-match-wins lexer with three token classes
  (reference src/tokenizer.cpp:72-79):
    1. abbreviation  ``([a-zA-Z]+\\.){2,}``  -> emit with dots stripped
    2. possessive    ``[a-zA-Z0-9]+('[a-zA-Z]+)`` -> emit stem before ``'``
    3. term          ``[a-zA-Z0-9]+``
  Anything else is a delimiter. We fuse classes 2+3 into one alternative
  (``[a-zA-Z0-9]+(?:'[a-zA-Z]+)?``) and post-strip at the apostrophe —
  identical output because a possessive's stem is exactly the term match.
- WhitespaceTokenizer: split on whitespace runs (src/tokenizer.cpp:36-47).
- LowercaseFilter: lowercase (src/token_filter.cpp:46-60).
- StopWordRemover: drop tokens in a set (src/token_filter.cpp:62-82).
- HTML strip: drop <script>/<style> subtrees and comments, strip tags,
  join text runs with single spaces (src/parsing/html.cpp:7-40).
  Regex-based equivalent — the engine's input table already carries
  extracted ``text`` (the per-url byte-identity invariant pins
  extraction to that column), so this path only runs when deriving
  text from raw ``html``.

Functions operate on ``pandas.Series`` so they drop straight into
``mapInPandas`` kernels. Token post-processing (lowercase, strip,
stopwords, rebuilding per-doc lists) is numpy-vectorized over the
flattened token axis; only the regex scan itself walks strings.
"""

from __future__ import annotations

import itertools
import re

import numpy as np
import pandas as pd

# Alternation order matters: abbreviation must win over plain term at
# the same start position (first-match-wins lexer semantics).
ENGLISH_TOKEN_RE = re.compile(r"(?:[a-zA-Z]+\.){2,}|[a-zA-Z0-9]+(?:'[a-zA-Z]+)?")
_WS_RE = re.compile(r"\s+")

_SCRIPT_STYLE_RE = re.compile(
    r"<\s*(script|style)\b[^>]*>.*?<\s*/\s*\1\s*>", re.IGNORECASE | re.DOTALL
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")


def _flatten(token_lists: list[list[str]]) -> tuple[np.ndarray, np.ndarray]:
    """list of token lists -> (flat object array, per-row counts)."""
    counts = np.fromiter((len(t) for t in token_lists), dtype=np.int64, count=len(token_lists))
    flat = np.array(list(itertools.chain.from_iterable(token_lists)), dtype=object)
    return flat, counts


def _rebuild(flat: np.ndarray, counts: np.ndarray) -> list[list[str]]:
    splits = np.split(flat, np.cumsum(counts)[:-1]) if len(counts) else []
    return [list(s) for s in splits]


def english_tokenize_series(texts: pd.Series) -> pd.Series:
    """Series[str] -> Series[list[str]] with EnglishTokenizer semantics."""
    raw = texts.fillna("").str.findall(ENGLISH_TOKEN_RE)
    flat, counts = _flatten(raw.tolist())
    if len(flat):
        s = pd.Series(flat)
        # abbreviation: strip dots; possessive: keep stem before apostrophe.
        flat = s.str.replace(".", "", regex=False).str.split("'").str[0].to_numpy(dtype=object)
    return pd.Series(_rebuild(flat, counts), index=texts.index, name=texts.name)


def whitespace_tokenize_series(texts: pd.Series) -> pd.Series:
    """Series[str] -> Series[list[str]], split on whitespace runs."""
    return texts.fillna("").apply(lambda t: [x for x in _WS_RE.split(t) if x])


def strip_html_series(html: pd.Series) -> pd.Series:
    """Series[str html] -> Series[str text]: drop script/style/comments,
    strip tags, collapse whitespace to single spaces.

    Script/style subtrees strip BEFORE comments (the reference's
    subtree-first order, src/parsing/html.cpp): a '<!--' inside a
    script body must not start a comment that swallows visible text
    up to some later real comment's '-->'."""
    s = html.fillna("")
    s = s.str.replace(_SCRIPT_STYLE_RE, " ", regex=True)
    s = s.str.replace(_COMMENT_RE, " ", regex=True)
    s = s.str.replace(_TAG_RE, " ", regex=True)
    s = s.str.replace(_WS_RE, " ", regex=True).str.strip()
    return s


def analyze_series(
    texts: pd.Series,
    tokenizer: str = "english",
    lowercase: bool = True,
    stopwords: frozenset[str] = frozenset(),
    stemmer: str | None = None,
    strip_html: bool = False,
) -> pd.Series:
    """Full analyzer chain on a Series[str] -> Series[list[str]].

    Mirrors TextAnalyzer composition (src/text_analyzer.cpp:10-58):
    text filters (html strip) -> tokenizer -> token filters
    (lowercase -> stemming -> stopword removal).
    """
    if strip_html:
        texts = strip_html_series(texts)
    if tokenizer == "english":
        toks = english_tokenize_series(texts)
    elif tokenizer == "whitespace":
        toks = whitespace_tokenize_series(texts)
    else:
        raise ValueError(f"unknown tokenizer: {tokenizer}")

    if not (lowercase or stopwords or stemmer):
        return toks

    flat, counts = _flatten(toks.tolist())
    if not len(flat):
        return toks
    vals = pd.Series(flat)
    if lowercase:
        vals = vals.str.lower()
    if stemmer is not None:
        # Stem the *distinct* token dictionary, then map occurrences
        # back — stem cost is per unique term, not per occurrence.
        if stemmer == "porter2":
            from pisa_spark.analysis.porter2 import stem
        elif stemmer == "krovetz":
            from pisa_spark.analysis.krovetz import stem
        else:
            raise ValueError(f"unknown stemmer: {stemmer}")
        uniq = pd.unique(vals)
        vals = vals.map({u: stem(u) for u in uniq})
    if stopwords:
        keep = ~vals.isin(stopwords).to_numpy()
        rows = np.repeat(np.arange(len(counts)), counts)[keep]
        flat = vals.to_numpy(dtype=object)[keep]
        counts = np.bincount(rows, minlength=len(counts))
    else:
        flat = vals.to_numpy(dtype=object)
    return pd.Series(_rebuild(flat, counts), index=texts.index, name=texts.name)
