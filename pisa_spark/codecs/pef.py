"""Partitioned Elias-Fano sequences (Ottaviano & Venturini, SIGIR
2014; reference ``optimal_partition.hpp`` + the partitioned/uniform
sequence family).

A payload's strictly-increasing form (prefix sums + i, as in the EF
codec) is cut into chunks; each chunk is stored with whichever family
is cheapest for ITS local universe/density — the indexed_sequence
hybrid choice (EF / dense / all-ones, realized here by
``codecs.hybrid`` which picks by exact encoded size) — behind a chunk
table that doubles as skip pointers.

Two partitioners:
- ``pef_opt_*``:     chunk boundaries from the reference's windowed
  DP (optimal_partition.hpp:54-118, published PEF defaults eps1=0.03
  eps2=0.3) minimizing the closed-form cost model
  cost(universe, size) = min(EF bits, bitvector bits, 0 if dense)
  + fixed per-chunk overhead;
- ``pef_uniform_*``: fixed-size chunks (uniform_partitioned_sequence).

Layout: [4B n_chunks LE] [per chunk: 2B count LE + 4B bytes LE]
[chunk payloads (hybrid codec)]. n_chunks is 4 bytes because with
``block_partition="variable"`` a single encoded list can span a whole
salt bucket (up to ~2^20 postings) and the optimal DP may emit more
than 65535 chunks; per-chunk counts stay 2 bytes (chunks are capped
at 0xFFFF values by subdivision below).
"""

from __future__ import annotations

import math

import numpy as np

from pisa_spark.codecs.hybrid import hybrid_decode, hybrid_encode

EPS1 = 0.03
EPS2 = 0.3
_FIXED = 64  # per-chunk overhead bits (pointer + size), as in PEF
_UNIFORM_CHUNK = 64


def _chunk_cost_bits(universe: int, size: int) -> float:
    """indexed_sequence cost model (indexed_sequence.hpp:13-77):
    cheapest of all-ones (dense run), Elias-Fano, plain bitvector."""
    if universe <= 0 or size <= 0:
        return _FIXED
    if universe == size:
        return _FIXED  # all-ones: no payload bits
    l = max(0, int(math.floor(math.log2(universe / size))))
    ef_bits = size * (2 + l)
    bv_bits = universe
    return min(ef_bits, bv_bits) + _FIXED


def optimal_partition_ends(m: list[int], eps1: float = EPS1,
                           eps2: float = EPS2) -> np.ndarray:
    """Chunk END positions (exclusive, last == n) minimizing the sum
    of _chunk_cost_bits — the reference DP (optimal_partition.hpp)
    with its geometric cost-bound windows.

    The loop is deliberately flat (parallel window arrays, the cost
    model inlined into locals): this runs once per encoded block at
    build time, and the window-object form spent near half the total
    encode in attribute/call overhead (flattening it gained 1.7-2.1x
    on pef_opt_encode, byte-identical output — BENCH.md codec
    table). The residual cost is the model's own ~n x windows cost
    evaluations; pinned by
    test_codecs.test_pef_opt_flat_dp_matches_reference_form."""
    n = len(m)
    single = _chunk_cost_bits(m[-1], n)
    min_cost = [single] * (n + 1)
    min_cost[0] = 0.0
    path = [0] * (n + 1)
    cost_lb = _chunk_cost_bits(1, 1)
    bounds = []
    cb = float(cost_lb)
    while eps1 == 0 or cb < cost_lb / eps1:
        bounds.append(cb)
        if cb >= single:
            break
        cb *= 1 + eps2
    nw = len(bounds)
    w_start = [0] * nw
    w_end = [0] * nw
    w_min = [0] * nw
    w_max = [0] * nw
    _FIX = _FIXED
    _log2 = math.log2
    _floor = math.floor
    for i in range(n):
        last_end = i + 1
        mci = min_cost[i]
        for wi in range(nw):
            end = w_end[wi]
            maxp = w_max[wi]
            while end < last_end:
                maxp = m[end]
                end += 1
            minp = w_min[wi]
            start = w_start[wi]
            bound = bounds[wi]
            while True:
                # inlined _chunk_cost_bits(maxp - minp + 1, end - start)
                u = maxp - minp + 1
                s = end - start
                if u <= 0 or s <= 0 or u == s:
                    wc = _FIX
                else:
                    ef = s * (2 + (_floor(_log2(u / s)) if u > s else 0))
                    wc = (ef if ef < u else u) + _FIX
                if mci + wc < min_cost[end]:
                    min_cost[end] = mci + wc
                    path[end] = i
                last_end = end
                if end == n:
                    break
                if wc >= bound:
                    break
                maxp = m[end]
                end += 1
            w_min[wi] = m[start] + 1
            w_start[wi] = start + 1
            w_end[wi] = end
            w_max[wi] = maxp
    ends = []
    cur = n
    while cur != 0:
        ends.append(cur)
        cur = path[cur]
    return np.array(ends[::-1], dtype=np.int64)


def _encode(values: np.ndarray, opt: bool) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return b""
    if opt:
        # .tolist() already yields Python ints (uint64 -> int)
        m = (np.cumsum(v) + np.arange(1, n + 1, dtype=np.uint64)).tolist()
        ends = optimal_partition_ends(m)
    else:
        ends = np.arange(_UNIFORM_CHUNK, n, _UNIFORM_CHUNK, dtype=np.int64)
        ends = np.concatenate([ends, [n]]) if (len(ends) == 0 or ends[-1] != n) else ends
    # 2-byte chunk counts: subdivide any chunk beyond 65535 values
    capped, prev = [], 0
    for e in ends.tolist():
        while e - prev > 0xFFFF:
            prev += 0xFFFF
            capped.append(prev)
        capped.append(int(e))
        prev = int(e)
    ends = np.array(capped, dtype=np.int64)
    starts = np.concatenate(([0], ends[:-1]))
    chunks = [hybrid_encode(v[s:e]) for s, e in zip(starts, ends)]
    out = bytearray(len(chunks).to_bytes(4, "little"))
    for (s, e), c in zip(zip(starts, ends), chunks):
        out += int(e - s).to_bytes(2, "little")
        out += len(c).to_bytes(4, "little")
    for c in chunks:
        out += c
    return bytes(out)


def _decode(data: bytes, n: int) -> np.ndarray:
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    n_chunks = int.from_bytes(data[0:4], "little")
    pos = 4
    meta = []
    for _ in range(n_chunks):
        cnt = int.from_bytes(data[pos:pos + 2], "little")
        ln = int.from_bytes(data[pos + 2:pos + 6], "little")
        meta.append((cnt, ln))
        pos += 6
    parts = []
    for cnt, ln in meta:
        parts.append(hybrid_decode(data[pos:pos + ln], cnt))
        pos += ln
    out = np.concatenate(parts) if parts else np.empty(0, np.uint64)
    if out.size != n:
        raise ValueError("pef payload count mismatch")
    return out


def pef_opt_encode(values: np.ndarray) -> bytes:
    return _encode(values, opt=True)


def pef_uniform_encode(values: np.ndarray) -> bytes:
    return _encode(values, opt=False)


def pef_decode(data: bytes, n: int) -> np.ndarray:
    return _decode(data, n)
