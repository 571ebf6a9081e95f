"""Engine configuration dataclasses.

Mirrors the reference CLI surface (tokenizer in {english, whitespace};
token filters in {lowercase, stopwords, porter2, krovetz}; scorer params;
block/codec choices) — see reference ``tools/app.hpp:88-101`` and
``include/pisa/scorer/scorer.hpp:17-22`` for the knobs being modeled.
"""

from __future__ import annotations

from dataclasses import dataclass, field


# BM25 defaults match the reference: scorer/scorer.hpp:17-22 (b=0.4, k1=0.9).
@dataclass(frozen=True)
class BM25Params:
    k1: float = 0.9
    b: float = 0.4


@dataclass(frozen=True)
class AnalyzerConfig:
    """Text analysis pipeline: filters -> tokenizer -> token filters.

    Reference: src/text_analyzer.cpp:10-58 (composition),
    src/tokenizer.cpp:36-79 (tokenizers), src/token_filter.cpp (filters).
    """

    tokenizer: str = "english"  # "english" | "whitespace"
    lowercase: bool = True
    stopwords: frozenset[str] = field(default_factory=frozenset)
    stemmer: str | None = None  # None | "porter2" | "krovetz"
    strip_html: bool = False  # apply HTML text extraction before tokenizing


@dataclass(frozen=True)
class IndexConfig:
    """Physical layout of the inverted index segments.

    block_size mirrors the reference's 128-int codec blocks
    (codec/simdbp.hpp:13); salt_bucket_docs is the head-term-skew
    bucket width (docID range per salt bucket) — our addition, the
    reference is single-node and has no skew problem (SURVEY §4 row 11).
    """

    block_size: int = 128
    # "fixed": uniform block_size-posting blocks (FixedBlock);
    # "variable": score-optimal boundaries (VariableBlock, VSBMW DP in
    # build/varblock.py) with per-block cost block_lambda — tighter
    # block-max bounds on skewed lists, so BMW/BMM skip more.
    block_partition: str = "fixed"
    block_lambda: float = 4.0
    # "varint" (= maskedvbyte wire format) | "bitpack" | "ef" |
    # "streamvbyte" | "simple8b" | "hybrid" (per-block cheapest family
    # + all-ones case) — see codecs/__init__.py CODECS
    codec: str = "varint"
    salt_bucket_docs: int = 1 << 20  # docID range per salt bucket
    quantize_bits: int | None = None  # None, or 8 for impact quantization
    # wand_data_compressed parity: store per-block max scores as u8
    # quantized relative to the term max (term_meta) instead of f32.
    # Bounds stay one-sided (quantization rounds up), top-k identical.
    compress_blockmax: bool = False
    # Broadcast the lexicon into build-path joins only when its counted
    # size is under this; 0 disables broadcasting entirely (plain join,
    # AQE picks the strategy). Web-scale vocabularies must NOT be
    # force-broadcast. Default sized in BYTES like the url-side gate
    # (forward.ID_BROADCAST_ROWS): at ~60-100 B per (term, id, df)
    # hash-relation row, 1M rows is a ~60-100 MB broadcast — the hint
    # stays near the session's 64 MB autoBroadcastJoinThreshold
    # instead of force-shipping a multi-GB relation at 10M rows.
    lexicon_broadcast_threshold: int = 1_000_000


@dataclass(frozen=True)
class EngineConfig:
    analyzer: AnalyzerConfig = field(default_factory=AnalyzerConfig)
    bm25: BM25Params = field(default_factory=BM25Params)
    index: IndexConfig = field(default_factory=IndexConfig)
