"""QMX codec (Trotman, ADCS 2014; reference ``codec/qmx.hpp`` wraps
the QMX library).

QMX's defining structure, kept here: VALUES are packed at a fixed bit
width into 128-bit payload words ("Quantities"), the width choice per
word comes from a 4-bit selector, and selectors are RUN-LENGTH
encoded in a separate stream ("Multipliers") so long stretches of
same-width words cost one byte per 16 words. The byte-level layout is
engine-defined (the reference's exact layout belongs to the external
QMX library); decoded-posting equality is the pinned invariant, as
with every codec here.

Layout:
    [4B n_words LE] [4B n_selector_bytes LE]
    [n_words x 16B payload words] [selector bytes]

Selector byte: high nibble = width index into _WIDTHS, low nibble =
run length - 1 (1..16 words per byte). Width index 0 means "a run of
256 zeros per word" and consumes NO payload word (QMX's zero
selector). Values must fit 64 bits; each w-bit word holds
floor(128/w) values, the final word zero-padded (decode trims to n).
"""

from __future__ import annotations

import numpy as np

_WIDTHS = [0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 12, 16, 21, 32, 64]
_ZERO_RUN = 256  # values per zero-width "word"


def _capacity(w: int) -> int:
    return _ZERO_RUN if w == 0 else 128 // w


def qmx_encode(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return b""
    # exact widths (codecs.widths): the old float-log2 + undershoot-
    # only repair gave width 65 for values >= 2^63 — no QMX lane fits
    from pisa_spark.codecs.widths import bit_widths

    blens = bit_widths(v)

    # Flat Python-int loop (same flattening as the Simple family: a
    # word packs <= 128 values, numpy slice math at that size is
    # interpreter overhead). Byte output unchanged — codec goldens +
    # roundtrip tests pin it.
    wl = blens.tolist()
    vl = v.tolist()
    sels: list[int] = []  # width index per word
    words: list[bytes] = []
    i = 0
    while i < n:
        # zero selector ONLY for a full 256-zero run or an all-zero
        # tail (decode emits capacity-or-remaining zeros per zero
        # word, so partial interior runs must go through bit packing)
        if wl[i] == 0:
            hi = min(i + _ZERO_RUN, n)
            allz = True
            for j in range(i, hi):
                if wl[j]:
                    allz = False
                    break
            if allz and (hi - i == _ZERO_RUN or hi == n):
                sels.append(0)
                i = hi
                continue
        # smallest width whose capacity-chunk max fits (early-abort
        # scan per candidate; windows shrink as the width grows)
        for wi in range(1, len(_WIDTHS)):
            w = _WIDTHS[wi]
            hi = min(i + 128 // w, n)
            ok = True
            for j in range(i, hi):
                if wl[j] > w:
                    ok = False
                    break
            if ok:
                word = 0
                shift = 0
                for j in range(i, hi):
                    word |= vl[j] << shift
                    shift += w
                words.append(word.to_bytes(16, "little"))
                sels.append(wi)
                i = hi
                break
        else:  # pragma: no cover — width 64 always fits
            raise AssertionError("no qmx width fits")

    # run-length encode selectors
    sel_bytes = bytearray()
    j = 0
    while j < len(sels):
        k = j
        while k < len(sels) and sels[k] == sels[j] and k - j < 16:
            k += 1
        sel_bytes.append((sels[j] << 4) | (k - j - 1))
        j = k
    header = len(words).to_bytes(4, "little") + len(sel_bytes).to_bytes(4, "little")
    return header + b"".join(words) + bytes(sel_bytes)


def qmx_decode(data: bytes, n: int) -> np.ndarray:
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    n_words = int.from_bytes(data[0:4], "little")
    n_sel = int.from_bytes(data[4:8], "little")
    payload = np.frombuffer(data, dtype=np.uint8, offset=8, count=n_words * 16)
    sel_raw = data[8 + n_words * 16: 8 + n_words * 16 + n_sel]
    out = np.empty(n, dtype=np.uint64)
    pos = 0
    word_i = 0
    for sb in sel_raw:
        wi = sb >> 4
        run = (sb & 0xF) + 1
        if wi == 0:
            take = min(run * _ZERO_RUN, n - pos)
            out[pos: pos + take] = 0
            pos += take
            if pos >= n:
                break
            continue
        w = _WIDTHS[wi]
        c = 128 // w
        # one vectorized unpack per RUN (1-16 words), not per word:
        # only the final word of the whole payload can be partial, so
        # each word's c lanes are contiguous in the output
        weights = np.uint64(1) << np.arange(w, dtype=np.uint64)
        raw = payload[word_i * 16: (word_i + run) * 16]
        bits = np.unpackbits(raw, bitorder="little").reshape(run, 128)
        vals = (
            bits[:, : c * w].reshape(run * c, w).astype(np.uint64) @ weights
        )
        take = min(run * c, n - pos)
        out[pos: pos + take] = vals[:take]
        pos += take
        word_i += run
        if pos >= n:
            break
    if pos < n:
        raise ValueError("qmx payload shorter than expected")
    return out
