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
    """MSB-first bitstream accumulated in a small Python int (the
    per-bit list/packbits form spent ~all its time in interpreter
    overhead — same flattening as the Simple family; byte output
    unchanged, pinned by the codec goldens + roundtrip tests). The
    accumulator FLUSHES its oldest whole bytes into a bytearray once
    it passes 4K bits, so encode stays O(n) — a single unbounded int
    would copy itself on every write (quadratic; with
    block_partition="variable" one block can span a whole salt
    bucket)."""

    __slots__ = ("acc", "nbits", "out")

    def __init__(self):
        self.acc = 0
        self.nbits = 0
        self.out = bytearray()

    def write(self, value: int, width: int):
        if width <= 0:
            return
        self.acc = (self.acc << width) | (value & ((1 << width) - 1))
        nbits = self.nbits + width
        if nbits >= 4096:
            keep = nbits & 7
            outb = nbits - keep
            self.out += (self.acc >> keep).to_bytes(outb // 8, "big")
            self.acc &= (1 << keep) - 1
            nbits = keep
        self.nbits = nbits

    def payload(self) -> bytes:
        if self.nbits:
            nbytes = (self.nbits + 7) // 8
            # trailing pad bits are zero, like np.packbits
            self.out += (self.acc << (nbytes * 8 - self.nbits)).to_bytes(
                nbytes, "big"
            )
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


class _BitReader:
    """Mirror of _BitWriter: a small sliding window refilled bytewise
    from the payload, each read a shift+mask instead of a per-bit
    numpy scalar loop (and never a whole-payload int — reads must
    stay O(n) on the query decode path)."""

    __slots__ = ("data", "byte_pos", "cur", "avail")

    def __init__(self, data: bytes):
        self.data = data
        self.byte_pos = 0
        self.cur = 0
        self.avail = 0

    def read(self, width: int) -> int:
        if width <= 0:
            return 0
        cur = self.cur
        avail = self.avail
        data = self.data
        bp = self.byte_pos
        while avail < width:
            cur = (cur << 8) | data[bp]
            bp += 1
            avail += 8
        avail -= width
        self.cur = cur & ((1 << avail) - 1)
        self.avail = avail
        self.byte_pos = bp
        return cur >> avail


def _width(r: int) -> int:
    return r.bit_length() if r > 0 else 0


def bic_encode(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return b""
    m = _to_strict(v).tolist()  # .tolist() yields Python ints
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
