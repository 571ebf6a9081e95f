#!/usr/bin/env python
"""Codec microbenchmark — the reference's benchmarks/ suite.

The reference ships sequence/codec perf harnesses
(benchmarks/scan_perftest.cpp: sequential decode of every posting
list; benchmarks/perftest_interpolative.cpp: one codec's
encode/decode loop; benchmarks/index_perftest.cpp). This is the same
experiment over the ENTIRE codec registry: deterministic synthetic
posting-list gaps + tfs in the engine's real block shape (128-value
blocks of docID gaps, the segment writer's layout), per codec:

- enc_mposts   encode throughput, million postings/sec (best-of-N)
- dec_mposts   decode throughput, million postings/sec (best-of-N)
- bytes_per_posting  wire size over the gap stream
- roundtrip    decoded == encoded input (hard assert)

No Spark session: these are the numpy kernels the Arrow encode/decode
stages call per block — the single-core numbers that bound one
executor task's throughput.

    python scripts/codec_perftest.py [--postings 2000000] [--repeats 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BLOCK = 128


def synth_gaps(n: int, seed: int = 7) -> np.ndarray:
    """Deterministic docID-gap stream with a realistic mix: mostly
    1-2-byte gaps, occasional large jumps (list starts / sparse
    tails) — the shape the segment writer feeds every codec."""
    rng = np.random.default_rng(seed)
    gaps = rng.zipf(1.3, size=n).astype(np.uint64)
    return np.minimum(gaps, np.uint64(1) << np.uint64(27))


def bench_codec(name: str, enc, dec, gaps: np.ndarray,
                repeats: int) -> dict:
    n = gaps.size
    blocks = [gaps[i:i + BLOCK] for i in range(0, n, BLOCK)]

    def enc_all():
        return [enc(b) for b in blocks]

    payloads = enc_all()  # warmup + artifact
    enc_best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        enc_all()
        enc_best = min(enc_best, time.perf_counter() - t0)

    def dec_all():
        return [dec(p, b.size) for p, b in zip(payloads, blocks)]

    decoded = dec_all()  # warmup + roundtrip check
    for d, b in zip(decoded, blocks):
        assert np.array_equal(np.asarray(d, dtype=np.uint64), b), name
    dec_best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        dec_all()
        dec_best = min(dec_best, time.perf_counter() - t0)

    total_bytes = sum(len(p) for p in payloads)
    return {
        "enc_mposts": round(n / enc_best / 1e6, 2),
        "dec_mposts": round(n / dec_best / 1e6, 2),
        "bytes_per_posting": round(total_bytes / n, 3),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--postings", type=int, default=2_000_000)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    from pisa_spark.codecs import CODECS

    gaps = synth_gaps(args.postings)
    out = {}
    for name, (enc, dec) in sorted(CODECS.items()):
        if name == "maskedvbyte":  # wire-format alias of varint
            continue
        use = gaps
        if name == "rankedbv":
            # dense-payload codec (tf-style): loud universe guard
            use = np.minimum(gaps, np.uint64(255))
        out[name] = bench_codec(name, enc, dec, use, args.repeats)
    print(json.dumps({
        "postings": args.postings, "block": BLOCK,
        "repeats": args.repeats, "codecs": out,
    }))


if __name__ == "__main__":
    main()
