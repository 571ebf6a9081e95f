from pisa_spark.analysis.tokenizer import (
    ENGLISH_TOKEN_RE,
    analyze_series,
    english_tokenize_series,
    strip_html_series,
    whitespace_tokenize_series,
)

__all__ = [
    "ENGLISH_TOKEN_RE",
    "analyze_series",
    "english_tokenize_series",
    "strip_html_series",
    "whitespace_tokenize_series",
]
