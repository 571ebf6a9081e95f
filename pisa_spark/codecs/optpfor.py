"""OptPFor / OptPFD codec (Yan, Ding & Suel 2009; reference
``codec/block_codecs.hpp`` optpfor_block wrapping FastPFor's
OPTPFor).

Patched frame-of-reference with a per-block OPTIMAL bit width: every
value's low ``b`` bits are packed at fixed width; values needing more
than ``b`` bits become exceptions whose positions and high parts are
stored separately (here varint-coded, gap-encoded positions). The
width is chosen by exhaustively costing every candidate ``b`` —
exactly the "Opt" in OptPFor — which is a vectorized cumulative
count over the value bit-length histogram, not a loop over values.

Layout:
    [1B b] [1B reserved] [2B n_exceptions LE]
    [ceil(n*b/8) packed low bits]
    [varint exception position gaps] [varint exception high parts]

Whole-array vectorized in both directions (packing reuses the
bitpack machinery; exceptions are fancy-indexed patches).
"""

from __future__ import annotations

import numpy as np

from pisa_spark.codecs.varint import varint_decode, varint_encode, varint_sizes


def _pack(v: np.ndarray, width: int) -> bytes:
    if width == 0:
        return b""
    shifts = np.arange(width, dtype=np.uint64)
    bits = ((v[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.reshape(-1), bitorder="little").tobytes()


def _unpack(data: bytes, n: int, width: int, offset: int) -> np.ndarray:
    if width == 0:
        return np.zeros(n, dtype=np.uint64)
    raw = np.frombuffer(data, dtype=np.uint8, offset=offset)
    bits = np.unpackbits(raw, bitorder="little", count=n * width)
    bits = bits.reshape(n, width).astype(np.uint64)
    weights = np.uint64(1) << np.arange(width, dtype=np.uint64)
    return (bits @ weights).astype(np.uint64)


def optpfor_encode(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return b""
    # exact widths (codecs.widths): the old float-log2 + undershoot-
    # only repair produced width 65 for any value >= 2^63 (the >>63
    # probe fired on a correct 64) and crashed the mask construction
    from pisa_spark.codecs.widths import bit_widths

    blens = bit_widths(v)
    max_b = int(blens.max())
    # cost(b) = packed low bits + per-exception bytes (position gap +
    # high part, estimated as varints) — evaluated for every b at once
    hist = np.bincount(blens, minlength=max_b + 1)
    exc_counts = hist[::-1].cumsum()[::-1]  # how many values need > b bits
    # Exception HIGH-part bytes for every candidate b in one matrix
    # op: a value of bit length L > b keeps L-b high bits, i.e.
    # ceil((L-b)/7) varint bytes — a function of the histogram only.
    Ls = np.arange(max_b + 1)
    dmat = Ls[None, :] - Ls[:, None]
    high_bytes = np.where(dmat > 0, (dmat + 6) // 7, 0) @ hist
    best_b, best_cost = max_b, (n * max_b + 7) // 8
    for b in range(max_b + 1):
        n_exc = int(exc_counts[b + 1]) if b + 1 <= max_b else 0
        if n_exc > 0xFFFF:
            continue
        packed = (n * b + 7) // 8
        # exact-cost lower bound (each position gap is >= 1 varint
        # byte): when it can't beat the running best, the exact cost
        # can't either — same best_b/tie outcome as the exhaustive
        # ascending scan, minus the per-candidate exception re-derive
        if packed + n_exc + int(high_bytes[b]) >= best_cost:
            continue
        if n_exc:
            exc_idx = np.flatnonzero(blens > b)
            gaps = np.diff(exc_idx, prepend=-1).astype(np.uint64) - 1
            exc_bytes = int(varint_sizes(gaps).sum()) + int(high_bytes[b])
        else:
            exc_bytes = 0
        cost = packed + exc_bytes
        if cost < best_cost:
            best_b, best_cost = b, cost
    b = best_b
    mask = np.uint64((1 << b) - 1) if b else np.uint64(0)
    lows = v & mask
    exc_idx = np.flatnonzero(blens > b)
    n_exc = len(exc_idx)
    header = bytes([b, 0]) + int(n_exc).to_bytes(2, "little")
    body = _pack(lows, b)
    if n_exc:
        gaps = np.diff(exc_idx, prepend=-1).astype(np.uint64) - 1
        highs = v[exc_idx] >> np.uint64(b)
        body += varint_encode(gaps) + varint_encode(highs)
    return header + body


def optpfor_decode(data: bytes, n: int) -> np.ndarray:
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    b = data[0]
    n_exc = int.from_bytes(data[2:4], "little")
    out = _unpack(data, n, b, offset=4)
    if n_exc:
        off = 4 + (n * b + 7) // 8
        # gaps then highs, varint back to back: decode all 2*n_exc
        # values in one vectorized pass and split
        both = varint_decode(data[off:], 2 * n_exc)
        gaps, highs = both[:n_exc], both[n_exc:]
        idx = np.cumsum(gaps.astype(np.int64) + 1) - 1
        out[idx] |= highs << np.uint64(b)
    return out
