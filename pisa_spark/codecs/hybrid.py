"""Hybrid per-block codec (indexed_sequence parity).

The reference's ``indexed_sequence.hpp:13-77`` picks, per sequence,
the cheapest of {Elias-Fano, ranked bitvector, all-ones} by a size
cost model; ``all_ones_sequence.hpp`` stores a run of consecutive
values in zero bits. This codec is the same idea over this engine's
block payloads: each payload is encoded with every registered family
and the smallest wins, prefixed by a 1-byte tag:

    tag 0  varint    (byte-aligned, TightVariableByte layout)
    tag 1  bitpack   (SIMD-BP128-style fixed-width)
    tag 2  elias-fano (prefix-sum EF)
    tag 3  all-zeros (NO payload bytes — the all_ones case: a gaps-1
           doc payload of zeros IS a run of consecutive docIDs, and a
           tf-1 payload of zeros IS a run of tf=1 postings)
    tag 4  ranked bitvector (compact_ranked_bitvector: bitvector +
           rank directory — the dense-sequence case the reference's
           indexed_sequence picks when it beats EF)

Cost model = actual encoded size (exact, not estimated), evaluated
per block at build time — blocks are <= block_size values, so trying
all families costs microseconds and the decision parallelizes with
the encode itself. The ranked-bitvector candidate's size is closed
form (universe/8 + directory), so it is only materialized when that
bound already beats the best-so-far — mirroring indexed_sequence's
cost comparison, and never allocating a sparse payload's universe.
"""

from __future__ import annotations

import numpy as np

from pisa_spark.codecs.bitpack import bitpack_decode, bitpack_encode
from pisa_spark.codecs.eliasfano import ef_decode, ef_encode
from pisa_spark.codecs.rankedbitvector import rbv_decode, rbv_encode, rbv_size
from pisa_spark.codecs.varint import varint_decode, varint_encode

_ENC = (varint_encode, bitpack_encode, ef_encode, None, rbv_encode)
_DEC = (varint_decode, bitpack_decode, ef_decode, None, rbv_decode)


def hybrid_encode(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    if not v.any():
        return bytes([3])  # all-ones sequence: tag only
    best_tag, best = 0, _ENC[0](v)
    for tag in (1, 2):
        cand = _ENC[tag](v)
        if len(cand) < len(best):
            best_tag, best = tag, cand
    if rbv_size(v) < len(best):  # closed-form size check first
        best_tag, best = 4, _ENC[4](v)
    return bytes([best_tag]) + best


def hybrid_decode(data: bytes, n: int) -> np.ndarray:
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    tag = data[0]
    if tag == 3:
        return np.zeros(n, dtype=np.uint64)
    return _DEC[tag](data[1:], n)
