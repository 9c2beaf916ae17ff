"""Kernel-level parity: blur ladder, max filter, BH FDR vs scipy oracles."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from mustache_tpu.scalespace import build_ladder, gaussian_kernel_1d, kernel_radius
from mustache_tpu.detect import _blur_ladder, _max3x3, _bh_logq
from oracle import bh_fdr, scipy_blur, max3


def test_gaussian_kernel_matches_scipy():
    from scipy.ndimage import gaussian_filter1d
    spec = build_ladder((1.6, 3.2))
    for sigma in spec.blur_sigmas:
        r = kernel_radius(sigma)
        k = gaussian_kernel_1d(sigma)
        assert len(k) == 2 * r + 1
        impulse = np.zeros(51)
        impulse[25] = 1.0
        w = 2 * math.ceil(2 * sigma) + 1
        t = ((w - 1) / 2 - 0.5) / sigma
        ref = gaussian_filter1d(impulse, sigma, truncate=t)
        # correlate1d's summation order differs by <=1 ULP on the impulse
        np.testing.assert_allclose(ref[25 - r:25 + r + 1], k, rtol=3e-16, atol=1e-17)
        # no mass outside the radius
        assert ref[25 + r + 1:].sum() == 0 and ref[:25 - r].sum() == 0


def test_blur_ladder_matches_scipy():
    rng = np.random.default_rng(1)
    c = rng.normal(size=(160, 160))
    spec = build_ladder((1.6, 3.2))
    G = np.asarray(_blur_ladder(jnp.asarray(c), jnp.asarray(spec.kernels)))
    for i, sigma in enumerate(spec.blur_sigmas):
        ref = scipy_blur(c, sigma)
        np.testing.assert_allclose(G[i], ref, rtol=1e-12, atol=1e-12)


def test_max3x3_matches_scipy():
    rng = np.random.default_rng(2)
    a = rng.normal(size=(64, 64))
    got = np.asarray(_max3x3(jnp.asarray(a)))
    np.testing.assert_array_equal(got, max3(a))
    # negative arrays: constant-0 padding must leak zeros at the border
    b = -np.abs(rng.normal(size=(8, 8))) - 1
    got = np.asarray(_max3x3(jnp.asarray(b)))
    assert (got[0, :] == 0).all() and (got[:, -1] == 0).all()


@pytest.mark.parametrize("n", [10, 1000])
def test_bh_logq_matches_statsmodels_formula(n):
    rng = np.random.default_rng(3)
    p = rng.random(n) ** 3
    ref_q = bh_fdr(p)
    # embed into a larger padded vector with +inf sentinels
    M = 2048
    logp = np.full(M, np.inf)
    logp[:n] = np.log(p)
    logq = np.asarray(_bh_logq(jnp.asarray(logp), jnp.asarray(n)))
    np.testing.assert_allclose(np.exp(logq[:n]), ref_q, rtol=1e-10)


def test_bh_logq_handles_ties_and_clipping():
    p = np.array([0.9, 0.9, 0.9, 0.95])
    ref_q = bh_fdr(p)
    logp = np.full(16, np.inf)
    logp[:4] = np.log(p)
    logq = np.asarray(_bh_logq(jnp.asarray(logp), jnp.asarray(4)))
    np.testing.assert_allclose(np.exp(logq[:4]), ref_q, rtol=1e-12)
    assert (np.exp(logq[:4]) <= 1.0).all()
