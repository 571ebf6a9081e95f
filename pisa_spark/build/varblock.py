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


class _Window:
    """Sliding window [start, end) with monotonic-deque max and a cost
    cap (score_opt_partition.hpp score_window)."""

    __slots__ = ("s", "start", "end", "sum", "maxq", "cost_bound", "fixed")

    def __init__(self, s: list, cost_bound: float, fixed_cost: float):
        self.s = s
        self.start = 0
        self.end = 0
        self.sum = 0.0
        self.maxq: deque = deque()
        self.cost_bound = cost_bound
        self.fixed = fixed_cost

    def advance_start(self):
        v = self.s[self.start]
        if self.maxq and v == self.maxq[0]:
            self.maxq.popleft()
        self.sum -= v
        self.start += 1

    def advance_end(self):
        v = self.s[self.end]
        self.sum += v
        while self.maxq and self.maxq[-1] < v:
            self.maxq.pop()
        self.maxq.append(v)
        self.end += 1

    def cost(self) -> float:
        if self.end - self.start < 2:
            return self.fixed
        return (self.end - self.start) * self.maxq[0] - self.sum + self.fixed


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
    windows = [_Window(s, b, fixed_cost) for b in bounds]

    for i in range(n):
        last_end = i + 1
        for w in windows:
            while w.end < last_end:
                w.advance_end()
            while True:
                wc = w.cost()
                if min_cost[i] + wc < min_cost[w.end]:
                    min_cost[w.end] = min_cost[i] + wc
                    path[w.end] = i
                last_end = w.end
                if w.end == n:
                    break
                if wc >= w.cost_bound:
                    break
                w.advance_end()
            w.advance_start()

    ends = []
    cur = n
    while cur != 0:
        ends.append(cur)
        cur = path[cur]
    return np.array(ends[::-1], dtype=np.int64)
