"""Parameter-sweep parity fuzz: block detection vs the scipy oracle in
f64 across non-default (sigma0, octaves, distance, thresholds, shape)
combinations, so parity claims don't rest on the default ladder only."""

import numpy as np
import pytest

from mustache_tpu.config import DetectionConfig
from mustache_tpu.detect import build_detector, finish_block
from mustache_tpu.normalize import normalize_sparse
from oracle import detect_block_oracle
from synthetic import synthetic_hic


@pytest.mark.parametrize("seed,n,d_px,sigma0,octaves,pt,st", [
    (101, 520, 90, 1.6, 3, 0.2, 0.88),    # third octave
    (102, 640, 150, 2.0, 2, 0.1, 0.80),   # wider base sigma
    (103, 450, 70, 1.2, 2, 0.3, 0.60),    # narrow sigma, loose thresholds
    (104, 800, 128, 1.6, 2, 0.05, 0.88),  # strict FDR, larger block
])
def test_fuzz_block_parity(seed, n, d_px, sigma0, octaves, pt, st):
    x, y, v, _ = synthetic_hic(n, d_px, seed=seed, n_loops=22)
    normalize_sparse(x, y, v, 5000, d_px, exact=True)
    c = np.zeros((n, n))
    c[x, y] = v

    octave_values = [sigma0 * (2 ** i) for i in range(octaves)]
    ref = detect_block_oracle(c.copy(), octave_values, d_px, st, pt)

    cfg = DetectionConfig(resolution=5000, distance_bp=d_px * 5000,
                          pt=pt, st=st, sigma0=sigma0, octaves=octaves,
                          precision="float64")
    assert cfg.distance_px == d_px
    det = build_detector(cfg, n)
    import jax
    out = jax.tree.map(np.asarray, det.fn_single(c))
    got = finish_block(out, block_index=0, start=0, cfg=cfg, spec=det.spec)

    assert [(r[0], r[1]) for r in got] == [(r[0], r[1]) for r in ref]
    ref_map = {(r[0], r[1]): (r[2], r[3]) for r in ref}
    for r in got:
        q_ref, s_ref = ref_map[(r[0], r[1])]
        np.testing.assert_allclose(r[2], q_ref, rtol=1e-5, atol=1e-11)
        assert r[3] == s_ref
