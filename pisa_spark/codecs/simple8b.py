"""Simple8b codec (Anh & Moffat 2010; reference
``codec/simple8b.hpp``): 64-bit words, 4-bit selector + 60 data bits
packing as many equal-width values as fit.

Selector table (the widely-used variant: count x width, width*count
<= 60):

    sel  0: 240 x 0   sel  1: 120 x 0   sel  2: 60 x 1
    sel  3: 30 x 2    sel  4: 20 x 3    sel  5: 15 x 4
    sel  6: 12 x 5    sel  7: 10 x 6    sel  8:  8 x 7
    sel  9:  7 x 8    sel 10:  6 x 10   sel 11:  5 x 12
    sel 12:  4 x 15   sel 13:  3 x 20   sel 14:  2 x 30
    sel 15:  1 x 60

Encode is greedy (densest selector whose width fits the next `count`
values); a final word may cover more slots than remain — the surplus
slots are zero-padded and the decoder trims to ``n``. Values must fit
60 bits (docID gaps/tfs/doc lens at 10^12-doc scale are < 2^41).

Encode is a flat Python-int greedy loop (a word packs 1-240 values;
numpy slice math at that size is ~all interpreter overhead); decode
groups words BY SELECTOR and unpacks each class with one broadcast
shift+mask — per-word offsets are exact because only the last word
can be partial.
"""

from __future__ import annotations

import numpy as np

# (count, width) per selector
S8B_TABLE = [
    (240, 0), (120, 0), (60, 1), (30, 2), (20, 3), (15, 4), (12, 5),
    (10, 6), (8, 7), (7, 8), (6, 10), (5, 12), (4, 15), (3, 20),
    (2, 30), (1, 60),
]


def s8b_encode(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return b""
    if int(v.max()) >= (1 << 60):
        raise ValueError("simple8b value exceeds 60 bits")
    # bit width needed per value (0 for value 0) — exact for the full
    # range: the old float-log2 + undershoot-only repair crashed on
    # values in [2^60-128, 2^60) (overshoot to width 61, no selector)
    from pisa_spark.codecs.widths import bit_widths

    widths = bit_widths(v)
    # Flat Python-int greedy loop (same flattening rationale as
    # simple16/pef: a word packs 1-240 values and numpy slice ops at
    # that size are ~all interpreter overhead).
    wl = widths.tolist()
    vl = v.tolist()
    words = []
    i = 0
    while i < n:
        for sel, (cnt, w) in enumerate(S8B_TABLE):
            hi = min(i + cnt, n)
            if w == 0:
                ok = True
                for j in range(i, hi):
                    if vl[j]:
                        ok = False
                        break
                if ok:
                    words.append(sel << 60)
                    i = hi
                    break
                continue
            ok = True
            for j in range(i, hi):
                if wl[j] > w:
                    ok = False
                    break
            if ok:
                word = sel << 60
                shift = 0
                for j in range(i, hi):
                    word |= vl[j] << shift
                    shift += w
                words.append(word)
                i = hi
                break
        else:  # pragma: no cover — (1, 60) always fits
            raise AssertionError("no simple8b selector fits")
    return np.array(words, dtype="<u8").tobytes()


_S8B_COUNTS = np.array([c for c, _ in S8B_TABLE], dtype=np.int64)


def s8b_decode(data: bytes, n: int) -> np.ndarray:
    """Selector-grouped vectorized unpack (same shape as s16_decode):
    only the LAST word can be partial, so per-word output offsets are
    exact from the selector table; each selector class unpacks as one
    broadcast shift+mask and the zero-padded tail trims to ``n``."""
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    words = np.frombuffer(data, dtype="<u8")
    if words.size == 0:
        raise ValueError("simple8b payload shorter than expected")
    sels = (words >> np.uint64(60)).astype(np.int64)
    takes = _S8B_COUNTS[sels]
    offs = np.concatenate(([0], np.cumsum(takes[:-1])))
    used = offs < n  # ignore words wholly beyond n (defensive parity)
    words, sels, takes, offs = words[used], sels[used], takes[used], offs[used]
    total = int(offs[-1] + takes[-1])
    if total < n:
        raise ValueError("simple8b payload shorter than expected")
    out = np.empty(total, dtype=np.uint64)
    for sel in np.unique(sels).tolist():
        cnt, w = S8B_TABLE[sel]
        idx = np.nonzero(sels == sel)[0]
        pos = offs[idx][:, None] + np.arange(cnt)[None, :]
        if w == 0:
            out[pos] = 0
            continue
        shifts = (np.arange(cnt, dtype=np.uint64) * np.uint64(w))
        mask = np.uint64((1 << w) - 1)
        out[pos] = (words[idx][:, None] >> shifts[None, :]) & mask
    return out[:n]
