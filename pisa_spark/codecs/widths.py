"""Exact vectorized minimal bit length — the Simple/PFor/QMX width
primitive.

The fast path is float ``log2``, whose result near powers of two can
be off by one in EITHER direction: the uint64 -> float64 conversion
rounds (a value in [2^k - ulp, 2^k) becomes exactly 2^k, so
``floor(log2)+1`` OVERSHOOTS by one — the old callers only repaired
undershoot and crashed on e.g. ``2^60 - 1`` under simple8b or any
value >= 2^63 under optpfor/qmx), and values >= 2^63 can also push
the raw result past 64. Both directions are repaired EXACTLY in the
integer domain here, so every caller gets ``int(v).bit_length()``
semantics (0 for value 0) at numpy speed for the full uint64 range.
"""

from __future__ import annotations

import numpy as np


def bit_widths(v: np.ndarray) -> np.ndarray:
    """Per-element minimal bit length of a uint64 array (0 -> 0),
    exact for every representable value; int64 output in [0, 64]."""
    v = np.ascontiguousarray(v, dtype=np.uint64)
    w = np.zeros(v.size, dtype=np.int64)
    nz = v > 0
    w[nz] = np.floor(np.log2(v[nz].astype(np.float64))).astype(np.int64) + 1
    w = np.minimum(w, 64)
    # overshoot repair: w-1 bits already hold v (w-1 <= 63, shift safe)
    idx = np.flatnonzero(nz & (w > 1))
    shrink = (v[idx] >> (w[idx] - 1).astype(np.uint64)) == 0
    w[idx[shrink]] -= 1
    # undershoot repair: v needs one more bit (w == 64 always fits and
    # a shift by 64 is undefined, so only w < 64 is probed)
    idx = np.flatnonzero(nz & (w < 64))
    grow = (v[idx] >> w[idx].astype(np.uint64)) != 0
    w[idx[grow]] += 1
    return w
