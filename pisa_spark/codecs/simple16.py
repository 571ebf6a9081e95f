"""Simple16 codec (Zhang, Long & Suel, WWW 2008; reference
``codec/simple16.hpp``): 32-bit words, 4-bit selector + 28 data bits.

Unlike simple8b's uniform lanes, each of the 16 modes is a fixed
SEQUENCE of lane widths summing to 28 bits — the mixed-width rows
(e.g. 7x2 then 14x1) absorb a single outlier without forcing the
whole word wide. Encode is greedy first-match over the table (ordered
densest-first); a final word may cover more lanes than values remain
— surplus lanes are zero-padded and the decoder trims to ``n``.

Values must fit 28 bits (docID gaps within a 128-posting block, tfs
and doc lens all qualify; a larger value raises, like g8iu's u32
guard). Words are little-endian u32.
"""

from __future__ import annotations

import numpy as np

# Lane-width sequences per selector (each sums to 28 bits).
S16_TABLE: list[list[int]] = [
    [1] * 28,
    [2] * 7 + [1] * 14,
    [1] * 7 + [2] * 7 + [1] * 7,
    [1] * 14 + [2] * 7,
    [2] * 14,
    [4] + [3] * 8,
    [3] + [4] * 4 + [3] * 3,
    [4] * 7,
    [5] * 4 + [4] * 2,
    [4] * 2 + [5] * 4,
    [6] * 3 + [5] * 2,
    [5] * 2 + [6] * 3,
    [7] * 4,
    [10] + [9] * 2,
    [14] * 2,
    [28],
]

# Precomputed per-selector numpy views: widths, shift offsets, masks.
_LANES = [np.array(ws, dtype=np.uint64) for ws in S16_TABLE]
_SHIFTS = [
    np.concatenate(([0], np.cumsum(ws[:-1]))).astype(np.uint64)
    for ws in (S16_TABLE)
]
_MASKS = [((np.uint64(1) << w) - np.uint64(1)) for w in _LANES]
# Python-int mirrors for the flat encode loop (a word packs <= 28
# values — numpy slice ops at that size are ~all interpreter
# overhead; same flattening as pef.optimal_partition_ends).
_LANES_PY = [list(ws) for ws in S16_TABLE]
_SHIFTS_PY = [[int(s) for s in sh] for sh in _SHIFTS]
_LANE_COUNT = np.array([len(ws) for ws in S16_TABLE], dtype=np.int64)


def s16_encode(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return b""
    if int(v.max()) >= (1 << 28):
        raise ValueError("simple16 value exceeds 28 bits")
    from pisa_spark.codecs.widths import bit_widths

    widths = bit_widths(v)
    wl = widths.tolist()
    vl = v.tolist()
    words = []
    i = 0
    while i < n:
        for sel in range(16):
            lanes = _LANES_PY[sel]
            take = min(len(lanes), n - i)
            ok = True
            for j in range(take):
                if wl[i + j] > lanes[j]:
                    ok = False
                    break
            if ok:
                word = sel << 28
                sh = _SHIFTS_PY[sel]
                for j in range(take):
                    word |= vl[i + j] << sh[j]
                words.append(word)
                i += take
                break
        else:  # pragma: no cover — selector 15 (1x28) always fits
            raise AssertionError("no simple16 selector fits")
    return np.array(words, dtype="<u4").tobytes()


def s16_decode(data: bytes, n: int) -> np.ndarray:
    """Selector-grouped vectorized unpack: every word except possibly
    the last covers its FULL lane count (the encoder only truncates
    at the tail), so per-word output offsets are exact from the lane
    table; each selector class unpacks as one broadcast shift+mask,
    then the zero-padded tail is trimmed to ``n``."""
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    words = np.frombuffer(data, dtype="<u4").astype(np.uint64)
    if words.size == 0:
        raise ValueError("simple16 payload shorter than expected")
    sels = (words >> np.uint64(28)).astype(np.int64)
    takes = _LANE_COUNT[sels]
    offs = np.concatenate(([0], np.cumsum(takes[:-1])))
    used = offs < n  # ignore words wholly beyond n (defensive parity)
    words, sels, takes, offs = words[used], sels[used], takes[used], offs[used]
    total = int(offs[-1] + takes[-1])
    if total < n:
        raise ValueError("simple16 payload shorter than expected")
    out = np.empty(total, dtype=np.uint64)
    for sel in np.unique(sels).tolist():
        idx = np.nonzero(sels == sel)[0]
        w = words[idx]
        vals = (w[:, None] >> _SHIFTS[sel][None, :]) & _MASKS[sel][None, :]
        pos = offs[idx][:, None] + np.arange(len(S16_TABLE[sel]))[None, :]
        out[pos] = vals
    return out[:n]
