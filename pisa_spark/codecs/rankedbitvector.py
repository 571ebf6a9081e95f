"""Ranked bitvector codec (compact_ranked_bitvector parity).

The reference's ``codec/compact_ranked_bitvector.hpp:1-326`` stores a
monotone sequence as a plain bitvector over its universe plus an
embedded rank directory (cumulative popcounts at fixed intervals) so
rank/select run in O(1) broadword steps (``util/broadword.hpp``).
``indexed_sequence.hpp:13-77`` picks it over Elias-Fano exactly when
the bitvector-plus-directory is smaller — the dense-sequence case.

As with the EF codec, block payloads here are gap values (gaps-1 with
an absolute block head), so encode takes PREFIX SUMS (+i strictifier,
shared idiom with ``eliasfano.py``) — a strictly monotone sequence
over universe u — and decode returns the diffs; round-trip equality
of the payload is the pinned invariant.

Layout: [8B universe u (bits) LE] [4B superblock count LE]
[superblocks x 4B u32 cumulative ones BEFORE each 512-bit superblock]
[ceil(u/8) bitvector bytes, little-endian bit order].

The rank directory is on the wire (that is what makes it a *ranked*
bitvector): ``rbv_rank``/``rbv_select`` answer point queries from one
directory sample plus at most 64 bytes of popcounts — the numpy
equivalent of the reference's broadword word-scan — without decoding
the sequence. Full-block decode (the kernels' access pattern; blocks
are <= block_size values) is a single vectorized
unpackbits+flatnonzero, i.e. select-all.

Universe guard: a sparse payload would allocate u bits; the encoder
raises above ``RBV_MAX_UNIVERSE`` (same loud-guard precedent as
g8iu's u32-only and simple16's 28-bit limits). Callers that want the
cost-model behavior of ``indexed_sequence`` use the hybrid codec,
which only selects this family when it is the smallest encoding.
"""

from __future__ import annotations

import numpy as np

# 2^26 bits = 8 MiB bitvector — far beyond any per-block payload this
# engine produces (universe = gap sum within one block, bounded by
# salt_bucket_docs for doc gaps), small enough to fail fast on misuse.
RBV_MAX_UNIVERSE = 1 << 26

_SUPER_BITS = 512  # rank sample interval (bits)
_SUPER_BYTES = _SUPER_BITS // 8

# byte popcount lookup — the broadword popcount step as a table scan
_POP8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(
    axis=1
).astype(np.uint8)

_HDR = 12


def _strictify(values: np.ndarray) -> np.ndarray:
    v = np.ascontiguousarray(values, dtype=np.uint64)
    return np.cumsum(v) + np.arange(1, v.size + 1, dtype=np.uint64)


def rbv_size(values: np.ndarray) -> int:
    """Exact encoded size in bytes, computed WITHOUT materializing the
    bitvector (sum + closed form) — the hybrid codec's cost-model
    probe, so sparse payloads never allocate their universe. Returns
    a sentinel above any real encoding when the universe exceeds the
    guard."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return 0
    u = int(v.sum()) + v.size + 1
    if u > RBV_MAX_UNIVERSE:
        return 1 << 62
    n_bytes = (u + 7) // 8
    n_super = (n_bytes + _SUPER_BYTES - 1) // _SUPER_BYTES
    return _HDR + 4 * n_super + n_bytes


def rbv_encode(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    m = _strictify(v)
    u = int(m[-1]) + 1
    if u > RBV_MAX_UNIVERSE:
        raise ValueError(
            f"rankedbv universe {u} bits exceeds {RBV_MAX_UNIVERSE}; "
            "payload too sparse for a bitvector — use 'hybrid' (cost-"
            "model choice) or 'ef'"
        )
    bits = np.zeros(u, dtype=np.uint8)
    bits[m.astype(np.int64)] = 1
    packed = np.packbits(bits, bitorder="little")
    n_super = (len(packed) + _SUPER_BYTES - 1) // _SUPER_BYTES
    byte_pop = _POP8[packed]
    padded = np.zeros(n_super * _SUPER_BYTES, dtype=np.uint32)
    padded[: len(packed)] = byte_pop
    per_super = padded.reshape(n_super, _SUPER_BYTES).sum(axis=1)
    samples = np.zeros(n_super, dtype=np.uint32)
    np.cumsum(per_super[:-1], out=samples[1:])
    header = int(u).to_bytes(8, "little") + int(n_super).to_bytes(4, "little")
    return header + samples.tobytes() + packed.tobytes()


def _parts(data: bytes) -> tuple[int, np.ndarray, np.ndarray]:
    u = int.from_bytes(data[:8], "little")
    n_super = int.from_bytes(data[8:_HDR], "little")
    samples = np.frombuffer(data, dtype=np.uint32, offset=_HDR, count=n_super)
    packed = np.frombuffer(data, dtype=np.uint8, offset=_HDR + 4 * n_super)
    return u, samples, packed


def rbv_decode(data: bytes, n: int) -> np.ndarray:
    if n == 0 or not data:
        return np.empty(0, dtype=np.uint64)
    u, _, packed = _parts(data)
    bits = np.unpackbits(packed, bitorder="little", count=u)
    m = np.flatnonzero(bits)[:n].astype(np.uint64)
    m = m - np.arange(1, n + 1, dtype=np.uint64)  # undo the +i strictifier
    vals = np.empty(n, dtype=np.uint64)
    vals[0] = m[0]
    vals[1:] = m[1:] - m[:-1]
    return vals


def rbv_rank(data: bytes, pos: int) -> int:
    """Ones in bit positions [0, pos): one directory sample + <= 64
    byte popcounts + one masked-byte popcount (broadword rank shape,
    util/broadword.hpp:70-90 parity)."""
    if not data:  # rbv_encode([]) == b"" — zero ones anywhere
        return 0
    u, samples, packed = _parts(data)
    pos = min(max(pos, 0), u)
    sb = min(pos // _SUPER_BITS, len(samples) - 1)
    byte_idx = pos // 8
    r = int(samples[sb])
    start = sb * _SUPER_BYTES
    if byte_idx > start:
        r += int(_POP8[packed[start:byte_idx]].sum())
    rem = pos & 7
    if rem and byte_idx < len(packed):
        r += int(_POP8[packed[byte_idx] & ((1 << rem) - 1)])
    return r


def rbv_select(data: bytes, k: int) -> int:
    """Position of the (k+1)-th one (0-based k): directory
    searchsorted for the superblock, then an in-superblock byte scan
    and an in-byte bit scan (broadword select shape)."""
    if not data:  # rbv_encode([]) == b"" — no ones to select
        raise IndexError(f"select({k}) beyond population")
    u, samples, packed = _parts(data)
    sb = int(np.searchsorted(samples, k, side="right")) - 1
    start = sb * _SUPER_BYTES
    chunk = packed[start : start + _SUPER_BYTES]
    cum = np.cumsum(_POP8[chunk].astype(np.int64))
    rel = k - int(samples[sb])
    byte_off = int(np.searchsorted(cum, rel, side="right"))
    if byte_off >= len(chunk):
        raise IndexError(f"select({k}) beyond population")
    before = int(cum[byte_off - 1]) if byte_off else 0
    bits = np.unpackbits(chunk[byte_off : byte_off + 1], bitorder="little")
    bit_off = int(np.flatnonzero(bits)[rel - before])
    return (start + byte_off) * 8 + bit_off
