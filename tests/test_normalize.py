"""Normalization parity vs the reference-semantics oracle."""

import numpy as np
import pytest

from mustache_tpu.normalize import normalize_sparse
from oracle import normalize_sparse_oracle
from synthetic import synthetic_hic


@pytest.mark.parametrize("exact", [False, True])
def test_local_regime_matches_oracle(exact):
    # (n - d_px) * res > 2Mb with res=5000, n=1200, d_px=100
    x, y, v, _ = synthetic_hic(1200, 100, seed=5)
    v1 = v.copy()
    v2 = v.copy()
    w1 = normalize_sparse(x, y, v1, 5000, 100, exact=exact)
    w2 = normalize_sparse_oracle(x, y, v2, 5000, 100)
    tol = 1e-12 if exact else 1e-8
    np.testing.assert_allclose(v1, v2, rtol=tol, atol=tol)
    np.testing.assert_allclose(w1, w2, rtol=1e-12)
    assert len(w1) == len(w2)


def test_global_regime_matches_oracle():
    # small map: (n - d_px) * res <= 2Mb
    x, y, v, _ = synthetic_hic(300, 60, seed=6)
    v1, v2 = v.copy(), v.copy()
    normalize_sparse(x, y, v1, 5000, 100)
    normalize_sparse_oracle(x, y, v2, 5000, 100)
    np.testing.assert_allclose(v1, v2, rtol=1e-10, atol=1e-12)


def test_local_regime_sparse_diagonals():
    # nearly-empty diagonals exercise the count<30 fallback and NaN guards
    rng = np.random.default_rng(7)
    n = 900
    x = rng.integers(0, n - 50, size=400)
    d = rng.integers(0, 50, size=400)
    y = x + d
    v = rng.random(400) * 10 + 0.5
    v1, v2 = v.copy(), v.copy()
    normalize_sparse(x, y, v1, 5000, 50)
    normalize_sparse_oracle(x, y, v2, 5000, 50)
    np.testing.assert_allclose(v1, v2, rtol=1e-8, atol=1e-10)


def test_mutates_in_place_and_returns_weights():
    x, y, v, _ = synthetic_hic(1200, 100, seed=8)
    before = v.copy()
    w = normalize_sparse(x, y, v, 5000, 100)
    assert not np.allclose(v, before)
    assert len(w) == 102  # one weight per diagonal 0..d_px+1
