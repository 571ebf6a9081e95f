"""Binary interpolative coding (Moffat & Stuiver 2000; reference
``codec/block_codecs.hpp`` interpolative_block, also the reference's
fallback for partial SIMD blocks, simdbp.hpp:18-21).

Like the EF codec, payload gap values are turned into a strictly
increasing sequence (prefix sums + i) and the sequence is coded by
midpoint recursion: the middle element is written in exactly
ceil(log2(R+1)) bits where R is its feasible range given the already
known bounds, then the halves recurse. Runs of consecutive values
need ZERO bits (the feasible range collapses) — the property that
makes interpolative the strongest of the classic codecs on clustered
postings.

Layout: [8B m_last LE] [bitstream, MSB-first within the stream,
preorder traversal]. n is supplied by the caller (block ``count``).

Encode/decode walk one Python step per element with an explicit
stack (bit widths differ per node, so there is no whole-array form);
this codec is an option for storage parity, not the default hot
path.
"""

from __future__ import annotations

import numpy as np


def _to_strict(values: np.ndarray) -> np.ndarray:
    v = np.ascontiguousarray(values, dtype=np.uint64)
    return np.cumsum(v) + np.arange(1, v.size + 1, dtype=np.uint64)


class _BitWriter:
    __slots__ = ("bits",)

    def __init__(self):
        self.bits: list[int] = []

    def write(self, value: int, width: int):
        if width <= 0:
            return
        self.bits.extend(
            (value >> (width - 1 - i)) & 1 for i in range(width)
        )

    def payload(self) -> bytes:
        if not self.bits:
            return b""
        arr = np.array(self.bits, dtype=np.uint8)
        return np.packbits(arr).tobytes()  # MSB-first


class _BitReader:
    __slots__ = ("bits", "pos")

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def read(self, width: int) -> int:
        if width <= 0:
            return 0
        out = 0
        for _ in range(width):
            out = (out << 1) | int(self.bits[self.pos])
            self.pos += 1
        return out


def _width(r: int) -> int:
    return r.bit_length() if r > 0 else 0


def bic_encode(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return b""
    m = [int(x) for x in _to_strict(v)]
    out = _BitWriter()
    header = m[-1].to_bytes(8, "little")
    # encode m[0..n-2] within [1, m[-1]-1] (strictness gives the 1)
    stack = [(0, n - 2, 1, m[-1] - 1)]
    while stack:
        l, r, lo, hi = stack.pop()
        if l > r:
            continue
        mid = (l + r) // 2
        lo_mid = lo + (mid - l)  # mid-l smaller values must fit below
        hi_mid = hi - (r - mid)  # r-mid larger values must fit above
        out.write(m[mid] - lo_mid, _width(hi_mid - lo_mid))
        # preorder: left first -> push right, then left
        stack.append((mid + 1, r, m[mid] + 1, hi))
        stack.append((l, mid - 1, lo, m[mid] - 1))
    return header + out.payload()


def bic_decode(data: bytes, n: int) -> np.ndarray:
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    m_last = int.from_bytes(data[:8], "little")
    m = [0] * n
    m[-1] = m_last
    rd = _BitReader(data[8:])
    stack = [(0, n - 2, 1, m_last - 1)]
    while stack:
        l, r, lo, hi = stack.pop()
        if l > r:
            continue
        mid = (l + r) // 2
        lo_mid = lo + (mid - l)
        hi_mid = hi - (r - mid)
        m[mid] = lo_mid + rd.read(_width(hi_mid - lo_mid))
        stack.append((mid + 1, r, m[mid] + 1, hi))
        stack.append((l, mid - 1, lo, m[mid] - 1))
    arr = np.array(m, dtype=np.uint64)
    arr -= np.arange(1, n + 1, dtype=np.uint64)
    out = np.empty(n, dtype=np.uint64)
    out[0] = arr[0]
    out[1:] = arr[1:] - arr[:-1]
    return out
