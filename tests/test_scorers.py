"""Scorer unit tests: BM25/QLD/PL2/DPH numpy forms vs hand-computed
values (reference formulas scorer/{bm25,qld,pl2,dph}.hpp)."""

from __future__ import annotations

import math

import numpy as np

from pisa_spark.functions.scoring import (
    bm25_score_np, dph_score_np, pl2_score_np, qld_score_np,
)


def test_bm25_hand_computed():
    # N=1000, df=10, tf=3, dl=100, avgdl=120, k1=0.9, b=0.4
    idf = max(1e-6, math.log((1000 - 10 + 0.5) / (10 + 0.5))) * 1.9
    norm = 3 + 0.9 * (0.6 + 0.4 * 100 / 120)
    want = idf * 3 / norm
    got = bm25_score_np(
        np.array([3.0]), np.array([10.0]), np.array([100.0]), 1000.0, 120.0
    )[0]
    assert abs(got - want) < 1e-12


def test_bm25_idf_floor():
    # df > N/2 -> raw idf negative -> clamped to 1e-6 * (1+k1)
    got = bm25_score_np(
        np.array([1.0]), np.array([900.0]), np.array([100.0]), 1000.0, 100.0
    )[0]
    assert got > 0
    assert got < 1e-5


def test_qld_hand_computed():
    # max(0, ln(1 + tf/(mu*ctf/|C|)) + ln(mu/(dl+mu)))
    tf, ctf, dl, C, mu = 4.0, 50.0, 200.0, 100_000.0, 1000.0
    want = max(0.0, math.log(1 + tf / (mu * ctf / C)) + math.log(mu / (dl + mu)))
    got = qld_score_np(np.array([tf]), np.array([ctf]), np.array([dl]), C)[0]
    assert abs(got - want) < 1e-12


def test_qld_clamps_to_zero():
    # tiny tf + long doc -> negative sum -> clamped to 0
    got = qld_score_np(
        np.array([1.0]), np.array([50_000.0]), np.array([10_000.0]), 100_000.0
    )[0]
    assert got == 0.0


def test_pl2_dph_positive_and_zero_tf():
    args = dict(num_docs=1000.0, avg_len=120.0, collection_len=120_000.0)
    p = pl2_score_np(np.array([3.0, 0.0]), np.array([30.0, 30.0]),
                     np.array([100.0, 100.0]), **args)
    d = dph_score_np(np.array([3.0, 0.0]), np.array([30.0, 30.0]),
                     np.array([100.0, 100.0]), **args)
    assert p[0] > 0 and p[1] == 0
    assert d[0] > 0 and d[1] == 0


def test_scorers_monotone_in_tf():
    tfs = np.array([1.0, 2.0, 4.0, 8.0])
    b = bm25_score_np(tfs, np.full(4, 20.0), np.full(4, 100.0), 1000.0, 120.0)
    q = qld_score_np(tfs, np.full(4, 100.0), np.full(4, 100.0), 100_000.0)
    assert (np.diff(b) > 0).all()
    assert (np.diff(q) > 0).all()
