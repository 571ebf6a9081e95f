"""varint-G8IU codec (Stepanov et al. 2011; reference
``codec/varint_g8iu.hpp`` wrapping the SIMD G8IU decoder).

Fixed NINE-byte groups: 1 descriptor byte + 8 data bytes. Each value
occupies 1-4 data bytes (u32 — like the reference, this format does
NOT extend to u64; values >= 2^32 raise, and the default engine
codecs remain the u64-capable ones); descriptor bit i set marks data
byte i as the LAST byte of a value. Values never split across
groups; unused trailing data bytes of a group are padding with their
descriptor bits clear.

The reference decodes a group with one PSHUFB against a 256-entry
shuffle table; the numpy analogue precomputes, per descriptor value,
the value count and per-value (start, length) layout, then gathers
every group's bytes in whole-array operations — the same
table-driven idea without per-value branching. Encode packs greedily
(one pass over values, numpy math per group boundary scan).
"""

from __future__ import annotations

import numpy as np

_LENTAB_COUNT = np.zeros(256, dtype=np.int64)
_LENTAB_START = np.zeros((256, 8), dtype=np.int64)
_LENTAB_LEN = np.zeros((256, 8), dtype=np.int64)
for _d in range(256):
    _start, _k = 0, 0
    for _i in range(8):
        if (_d >> _i) & 1:
            _LENTAB_START[_d, _k] = _start
            _LENTAB_LEN[_d, _k] = _i - _start + 1
            _start = _i + 1
            _k += 1
    _LENTAB_COUNT[_d] = _k


def g8iu_encode(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return b""
    if int(v.max()) >= (1 << 32):
        raise ValueError("varint-G8IU is a u32 format (reference parity)")
    lens = np.select(
        [v < (1 << 8), v < (1 << 16), v < (1 << 24)], [1, 2, 3], 4
    ).astype(np.int64)
    b4 = v.astype("<u4").view(np.uint8).reshape(n, 4)
    out = bytearray()
    i = 0
    while i < n:
        # greedy: take values while their bytes fit in the 8-byte slot
        used, j = 0, i
        while j < n and used + lens[j] <= 8:
            used += int(lens[j])
            j += 1
        desc = 0
        data = bytearray(8)
        pos = 0
        for k in range(i, j):
            L = int(lens[k])
            data[pos:pos + L] = b4[k, :L].tobytes()
            desc |= 1 << (pos + L - 1)
            pos += L
        out.append(desc)
        out += data
        i = j
    return bytes(out)


def g8iu_decode(data: bytes, n: int) -> np.ndarray:
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    buf = np.frombuffer(data, dtype=np.uint8)
    groups = buf.reshape(-1, 9)
    desc = groups[:, 0]
    payload = groups[:, 1:]
    counts = _LENTAB_COUNT[desc]
    g_idx = np.repeat(np.arange(len(desc)), counts)  # group of value j
    # slot of value j within its group: 0..count-1 per group
    off = np.zeros(counts.sum(), dtype=np.int64)
    cum = np.cumsum(counts)[:-1]
    off[cum] = counts[:-1]
    slot = np.arange(counts.sum()) - np.cumsum(off)
    starts = _LENTAB_START[desc[g_idx], slot]
    lens = _LENTAB_LEN[desc[g_idx], slot]
    out8 = np.zeros((counts.sum(), 4), dtype=np.uint8)
    mask = np.arange(4)[None, :] < lens[:, None]
    pos = starts[:, None] + np.arange(4)[None, :]
    out8[mask] = payload[g_idx[:, None].repeat(4, 1)[mask], pos[mask]]
    vals = out8.view("<u4").ravel().astype(np.uint64)
    if vals.size < n:
        raise ValueError("g8iu payload shorter than expected")
    return vals[:n]
