"""Score-optimal variable block partitioning (VSBMW).

Reference parity: ``score_opt_partition.hpp:14-202`` +
``wand_utils.hpp variable_block_partition`` (Mallia, Ottaviano,
Porciani, Tonellotto, Venturini: "Faster BlockMax WAND with
Variable-sized Blocks", SIGIR 2017, defaults eps1=0.01 eps2=0.4).

A posting list is cut into blocks minimizing

    sum over blocks of  (|B| * max(B) - sum(B) + lambda)

i.e. the total slack between each block's max-score upper bound and
its actual scores, plus a fixed per-block cost ``lambda`` that trades
block count against bound tightness. Uniform 128-posting blocks give
loose bounds on skewed lists, which makes BMW/BMM decode blocks they
could have skipped; score-adaptive boundaries put block cuts where
the score distribution changes.

The DP is the reference's windowed approximation: exact O(n^2) DP
restricted to O(log_{1+eps2}(1/eps1)) sliding windows, each capped at
a geometrically growing cost bound — O(n * ~14) work per list,
(1+eps1)-approximate. This runs inside the Arrow-batched
``encode_group`` (segments.py) per (term, salt-bucket) group, so it
parallelizes exactly like fixed-block encoding.
"""

from __future__ import annotations

from collections import deque

import numpy as np

EPS1 = 0.01
EPS2 = 0.4


def score_opt_partition(
    scores: np.ndarray,
    fixed_cost: float,
    eps1: float = EPS1,
    eps2: float = EPS2,
) -> np.ndarray:
    """Block END positions (exclusive, ascending, last == n) minimizing
    sum(|B|*max(B) - sum(B) + fixed_cost) — the reference DP
    (score_opt_partition.hpp:104-182) with the same window schedule:
    cost caps fixed_cost*(1+eps2)^j while below fixed_cost/eps1,
    stopping early at the single-block cost."""
    n = len(scores)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    s = [float(x) for x in scores]
    total_max = max(s)
    total_sum = sum(s)
    single_block_cost = n * total_max - total_sum
    min_cost = [single_block_cost] * (n + 1)
    min_cost[0] = 0.0
    path = [0] * (n + 1)

    bounds = []
    cb = fixed_cost
    while eps1 == 0 or cb < fixed_cost / eps1:
        bounds.append(cb)
        if cb >= single_block_cost:
            break
        cb *= 1 + eps2

    # Hot loop: the relaxation is inherently sequential (min_cost[i]
    # feeds every later end — same O(n * n_windows) shape as the
    # reference C++), so the optimization here is constants: window
    # state lives in parallel local lists with the deque/cost math
    # inlined (no attribute hops, no method calls per posting).
    nw = len(bounds)
    w_start = [0] * nw
    w_end = [0] * nw
    w_sum = [0.0] * nw
    w_maxq = [deque() for _ in range(nw)]
    for i in range(n):
        last_end = i + 1
        mc_i = min_cost[i]
        for wi in range(nw):
            end = w_end[wi]
            start = w_start[wi]
            ssum = w_sum[wi]
            maxq = w_maxq[wi]
            while end < last_end:
                v = s[end]
                ssum += v
                while maxq and maxq[-1] < v:
                    maxq.pop()
                maxq.append(v)
                end += 1
            bound = bounds[wi]
            while True:
                width = end - start
                wc = (width * maxq[0] - ssum + fixed_cost
                      if width >= 2 else fixed_cost)
                cand = mc_i + wc
                if cand < min_cost[end]:
                    min_cost[end] = cand
                    path[end] = i
                last_end = end
                if end == n or wc >= bound:
                    break
                v = s[end]
                ssum += v
                while maxq and maxq[-1] < v:
                    maxq.pop()
                maxq.append(v)
                end += 1
            # advance_start
            v = s[start]
            if maxq and v == maxq[0]:
                maxq.popleft()
            w_sum[wi] = ssum - v
            w_start[wi] = start + 1
            w_end[wi] = end

    ends = []
    cur = n
    while cur != 0:
        ends.append(cur)
        cur = path[cur]
    return np.array(ends[::-1], dtype=np.int64)
