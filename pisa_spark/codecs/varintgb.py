"""Group Varint (varint-GB) codec (reference ``codec/varint_gb.hpp``,
after Dean's Google group-varint).

Layout: groups of 4 values, each group = [1 control byte][data
bytes]; the control byte holds four 2-bit length codes (value i of
the group in bits 2i..2i+1). Canonical GB codes lengths {1,2,3,4}
for u32; as with the other byte codecs here the codes widen to
{1,2,4,8} for the 2^64 docID space.

Unlike StreamVByte the controls are INTERLEAVED with the data, so a
decoder cannot know where group g's control byte sits without the
lengths of groups 0..g-1. Encode is fully vectorized (offsets are
one cumsum); decode locates the control bytes with a tiny per-GROUP
scan (a 256-entry group-length lookup table, ~n/4 steps) and then
gathers all data bytes in one vectorized mask assignment.
"""

from __future__ import annotations

import numpy as np

_LENS = np.array([1, 2, 4, 8], dtype=np.int64)

# group data length for each possible control byte
_GLEN = np.zeros(256, dtype=np.int64)
for _c in range(256):
    _GLEN[_c] = sum(
        int(_LENS[(_c >> (2 * _i)) & 3]) for _i in range(4)
    )


def vgb_encode(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return b""
    codes = np.select(
        [v < (1 << 8), v < (1 << 16), v < (1 << 32)], [0, 1, 2], 3
    ).astype(np.uint8)
    lens = _LENS[codes]
    pad = (-n) % 4
    cp = np.concatenate([codes, np.zeros(pad, np.uint8)])
    lp = np.concatenate([lens, np.zeros(pad, np.int64)])
    ngroups = len(cp) // 4
    ctrl = (
        cp[0::4] | (cp[1::4] << 2) | (cp[2::4] << 4) | (cp[3::4] << 6)
    ).astype(np.uint8)
    glen = lp.reshape(ngroups, 4).sum(axis=1)
    # group start offsets: 1 control byte + data per preceding group
    goff = np.zeros(ngroups, dtype=np.int64)
    np.cumsum(glen[:-1] + 1, out=goff[1:])
    total = int(goff[-1] + 1 + glen[-1])
    out = np.zeros(total, dtype=np.uint8)
    out[goff] = ctrl
    # per-value start = group start + 1 + lengths of earlier values
    # in the group (vectorized per-group prefix sum)
    within = np.zeros(ngroups * 4, dtype=np.int64)
    lg = lp.reshape(ngroups, 4)
    within.reshape(ngroups, 4)[:, 1:] = np.cumsum(lg[:, :-1], axis=1)
    vstart = (np.repeat(goff, 4) + 1 + within)[:n]
    b8 = v.astype("<u8").view(np.uint8).reshape(n, 8)
    mask = np.arange(8)[None, :] < lens[:, None]
    pos = vstart[:, None] + np.arange(8)[None, :]
    out[pos[mask]] = b8[mask]
    return out.tobytes()


def vgb_decode(data: bytes, n: int) -> np.ndarray:
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    buf = np.frombuffer(data, dtype=np.uint8)
    ngroups = (n + 3) // 4
    ctrl = np.empty(ngroups, dtype=np.uint8)
    goff = np.empty(ngroups, dtype=np.int64)
    pos = 0
    for g in range(ngroups):  # tiny scan: table lookup per GROUP
        goff[g] = pos
        c = buf[pos]
        ctrl[g] = c
        pos += 1 + int(_GLEN[c])
    codes = np.empty(ngroups * 4, dtype=np.uint8)
    codes[0::4] = ctrl & 3
    codes[1::4] = (ctrl >> 2) & 3
    codes[2::4] = (ctrl >> 4) & 3
    codes[3::4] = (ctrl >> 6) & 3
    lens_all = _LENS[codes]
    within = np.zeros(ngroups * 4, dtype=np.int64)
    lg = lens_all.reshape(ngroups, 4)
    within.reshape(ngroups, 4)[:, 1:] = np.cumsum(lg[:, :-1], axis=1)
    vstart = (np.repeat(goff, 4) + 1 + within)[:n]
    lens = lens_all[:n]
    out8 = np.zeros((n, 8), dtype=np.uint8)
    mask = np.arange(8)[None, :] < lens[:, None]
    pos_m = vstart[:, None] + np.arange(8)[None, :]
    out8[mask] = buf[pos_m[mask]]
    return out8.view("<u8").ravel()
