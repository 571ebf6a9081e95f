"""Fixed-width bit-packing codec (SIMD-BP128-style layout).

The reference's ``simdbp_block`` (codec/simdbp.hpp:12-39) stores a
1-byte bit width ``b`` followed by 128 values bit-packed into ``b``
128-bit SSE words. The numpy equivalent: 1-byte width header + the
values' low ``b`` bits packed little-endian-bit-order via
``np.packbits``. Decode is ``np.unpackbits`` + a power-of-two dot
product — both whole-array vectorized.

Unlike the reference we also apply it to short tail blocks (the
reference falls back to binary interpolative coding below block_size,
simdbp.hpp:18-21); the storage format is ours to define — round-trip
equality of the decoded postings is the pinned invariant
(test_codecs.py mirrors test/test_block_codecs.cpp:18-57).
"""

from __future__ import annotations

import numpy as np


def bitpack_encode(values: np.ndarray) -> bytes:
    """uint array -> 1-byte width + packed bits (width up to 64)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    width = max(1, int(v.max()).bit_length())
    shifts = np.arange(width, dtype=np.uint64)
    bits = ((v[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.uint8)
    packed = np.packbits(bits.reshape(-1), bitorder="little")
    return bytes([width]) + packed.tobytes()


def bitpack_decode(data: bytes, n: int) -> np.ndarray:
    """1-byte width + packed bits -> uint64 array of length ``n``."""
    if n == 0 or not data:
        return np.empty(0, dtype=np.uint64)
    width = data[0]
    raw = np.frombuffer(data, dtype=np.uint8, offset=1)
    bits = np.unpackbits(raw, bitorder="little", count=n * width)
    bits = bits.reshape(n, width).astype(np.uint64)
    weights = (np.uint64(1) << np.arange(width, dtype=np.uint64))
    return (bits @ weights).astype(np.uint64)
