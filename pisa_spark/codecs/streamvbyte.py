"""StreamVByte codec (Lemire, Kurz & Rupp 2018; reference
``codec/streamvbyte.hpp`` wraps the streamvbyte C library).

Layout: ceil(n/4) control bytes first (2 bits per value, value i of a
group in bits 2i..2i+1), then each value's data bytes little-endian,
in order. The canonical format codes lengths {1,2,3,4} for u32
values; this engine's docID space is 2^64 (10^12-doc north rule), so
the 2-bit codes map to lengths {1,2,4,8} instead — the same
u64-widening the varint codec applies (varint.py). Control and data
streams are split, which is what makes the decode whole-array
vectorizable (one mask gather instead of per-value branching — the
numpy analogue of the SIMD shuffle tables).

Both directions are fully vectorized: no per-value Python.
"""

from __future__ import annotations

import numpy as np

_LENS = np.array([1, 2, 4, 8], dtype=np.int64)


def svb_encode(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return b""
    codes = np.select(
        [v < (1 << 8), v < (1 << 16), v < (1 << 32)], [0, 1, 2], 3
    ).astype(np.uint8)
    lens = _LENS[codes]
    # control bytes: 4 codes per byte, little-endian 2-bit fields
    pad = (-n) % 4
    cp = np.concatenate([codes, np.zeros(pad, np.uint8)])
    ctrl = (
        cp[0::4] | (cp[1::4] << 2) | (cp[2::4] << 4) | (cp[3::4] << 6)
    ).astype(np.uint8)
    # data: row-major masked gather of each value's low `len` bytes
    b8 = v.astype("<u8").view(np.uint8).reshape(n, 8)
    mask = np.arange(8)[None, :] < lens[:, None]
    return ctrl.tobytes() + b8[mask].tobytes()


def svb_decode(data: bytes, n: int) -> np.ndarray:
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    n_ctrl = (n + 3) // 4
    ctrl = np.frombuffer(data, dtype=np.uint8, count=n_ctrl)
    codes = np.empty(n_ctrl * 4, dtype=np.uint8)
    codes[0::4] = ctrl & 3
    codes[1::4] = (ctrl >> 2) & 3
    codes[2::4] = (ctrl >> 4) & 3
    codes[3::4] = (ctrl >> 6) & 3
    lens = _LENS[codes[:n]]
    total = int(lens.sum())
    payload = np.frombuffer(data, dtype=np.uint8, offset=n_ctrl, count=total)
    out8 = np.zeros((n, 8), dtype=np.uint8)
    mask = np.arange(8)[None, :] < lens[:, None]
    out8[mask] = payload
    return out8.view("<u8").ravel()
