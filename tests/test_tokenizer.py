"""Tokenizer parity tests — golden strings from SURVEY §5.3 / FIXTURES §4
(reference semantics: src/tokenizer.cpp:72-79, tokenizer.hpp:105-112)."""

import pandas as pd

from pisa_spark.analysis import (
    analyze_series,
    english_tokenize_series,
    strip_html_series,
    whitespace_tokenize_series,
)
from pisa_spark.analysis.porter2 import stem


def eng(text: str, **kw) -> list[str]:
    return analyze_series(pd.Series([text]), tokenizer="english", **kw).iloc[0]


def test_abbreviation_class():
    assert eng("U.S.A. rocks") == ["usa", "rocks"]


def test_possessive_class():
    assert eng("dog's bone") == ["dog", "bone"]


def test_mixed_punctuation():
    assert eng("state-of-the-art 2x faster!") == [
        "state", "of", "the", "art", "2x", "faster",
    ]


def test_case_preserved_without_lowercase():
    out = english_tokenize_series(pd.Series(["U.S.A. Dog's"])).iloc[0]
    assert out == ["USA", "Dog"]


def test_empty_and_null():
    s = pd.Series(["", None, "  ", "one"])
    out = english_tokenize_series(s).tolist()
    assert out == [[], [], [], ["one"]]


def test_whitespace_tokenizer():
    out = whitespace_tokenize_series(pd.Series(["a  b\tc\n d", ""])).tolist()
    assert out == [["a", "b", "c", "d"], []]


def test_stopwords():
    assert eng("the cat and the hat", stopwords=frozenset({"the", "and"})) == [
        "cat", "hat",
    ]


def test_strip_html():
    html = "<html><head><style>p{}</style></head><body><p>Hello <b>world</b></p>" \
           "<script>var x=1;</script><!-- c --></body></html>"
    assert strip_html_series(pd.Series([html])).iloc[0] == "Hello world"


def test_html_roundtrip_invariant():
    # The corpus generator wraps text as <html><body>{text}</body></html>;
    # extraction must return the byte-identical text (FIXTURES §1).
    text = "the quick brown fox 42"
    html = f"<html><body>{text}</body></html>"
    assert strip_html_series(pd.Series([html])).iloc[0] == text


def test_porter2_basics():
    assert stem("running") == "run"
    assert stem("cats") == "cat"
    assert stem("skies") == "sky"
    assert stem("dying") == "die"
    assert stem("ties") == "tie"
    assert stem("at") == "at"  # <=2 letters untouched
    assert stem("nationalization") == stem("nationalize")


def test_analyze_with_stemmer():
    assert eng("running dogs", stemmer="porter2") == ["run", "dog"]
