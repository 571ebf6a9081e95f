"""Elias-Fano codec for block payloads (compact_elias_fano parity).

The reference's bitvector index family stores monotone docID
sequences as Elias-Fano (codec/compact_elias_fano.hpp: low `l` bits
packed contiguously, high bits as a unary-coded bit vector with
select-based access). Our block payloads are gap values (gaps-1 with
an absolute block head), so this codec EF-encodes their PREFIX SUMS —
a strictly monotone sequence — and returns the diffs on decode;
round-trip equality of the decoded payload is the pinned invariant,
same as the other codecs.

Layout (13-byte header): [1B l] [8B universe u LE] [4B high-byte
count LE] [high bytes] [ceil(n*l/8) low bytes], all bit-packing
little-endian-bit-order via np.packbits/unpackbits — whole-array
vectorized, no per-value loop. The stored universe is not needed by
``ef_decode`` (the high-byte count delimits the unary part); it is
kept on the wire for external readers/debugging tools that want to
size buffers without scanning.

l = max(0, floor(log2(u/n))) like the reference
(compact_elias_fano.hpp params); high bit i of value m_i sits at
position (m_i >> l) + i (classic EF).
"""

from __future__ import annotations

import numpy as np


def ef_encode(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    m = np.cumsum(v.astype(np.uint64)) + np.arange(1, v.size + 1, dtype=np.uint64)
    # +i makes m strictly increasing even with zero gaps; decode subtracts.
    n = m.size
    u = int(m[-1]) + 1
    l = max(0, int(np.floor(np.log2(u / n))) if u > n else 0)
    lmask = np.uint64((1 << l) - 1)
    lows = (m & lmask) if l else np.zeros(0, np.uint64)
    highs = (m >> np.uint64(l)) + np.arange(n, dtype=np.uint64)
    high_bits = np.zeros(int(highs[-1]) + 1, dtype=np.uint8)
    high_bits[highs.astype(np.int64)] = 1
    high_packed = np.packbits(high_bits, bitorder="little")
    if l:
        shifts = np.arange(l, dtype=np.uint64)
        low_bits = ((lows[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.uint8)
        low_packed = np.packbits(low_bits.reshape(-1), bitorder="little")
    else:
        low_packed = np.zeros(0, np.uint8)
    header = bytes([l]) + int(u).to_bytes(8, "little") + int(len(high_packed)).to_bytes(4, "little")
    return header + high_packed.tobytes() + low_packed.tobytes()


def ef_decode(data: bytes, n: int) -> np.ndarray:
    if n == 0 or not data:
        return np.empty(0, dtype=np.uint64)
    l = data[0]
    n_high = int.from_bytes(data[9:13], "little")
    off = 13
    high_raw = np.frombuffer(data, dtype=np.uint8, offset=off, count=n_high)
    high_bits = np.unpackbits(high_raw, bitorder="little")
    positions = np.flatnonzero(high_bits)[:n].astype(np.uint64)
    highs = positions - np.arange(n, dtype=np.uint64)
    if l:
        low_raw = np.frombuffer(data, dtype=np.uint8, offset=off + n_high)
        low_bits = np.unpackbits(low_raw, bitorder="little", count=n * l)
        weights = np.uint64(1) << np.arange(l, dtype=np.uint64)
        lows = (low_bits.reshape(n, l).astype(np.uint64) @ weights).astype(np.uint64)
        m = (highs << np.uint64(l)) | lows
    else:
        m = highs
    m = m - np.arange(1, n + 1, dtype=np.uint64)  # undo the +i strictifier
    vals = np.empty(n, dtype=np.uint64)
    vals[0] = m[0]
    vals[1:] = m[1:] - m[:-1]
    return vals
