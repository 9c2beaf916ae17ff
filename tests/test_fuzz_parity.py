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


@pytest.mark.parametrize("seed,n,d_px,sigma0,octaves,pt,pt2,st", [
    (201, 520, 90, 1.6, 3, 0.2, 0.1, 0.88),   # third octave
    (202, 640, 150, 2.0, 2, 0.1, 0.2, 0.80),  # wider base sigma
    (203, 450, 70, 1.2, 2, 0.3, 0.3, 0.60),   # narrow sigma, loose gates
])
def test_fuzz_diff_block_parity(seed, n, d_px, sigma0, octaves, pt, pt2, st):
    """Differential core vs the diff oracle across non-default ladders
    (the frozen-difference-plane semantics must hold at every octave
    count, not just the default two)."""
    from mustache_tpu.diff import build_diff_detector, finish_diff_block
    from oracle import diff_detect_block_oracle

    x1, y1, v1, _ = synthetic_hic(n, d_px, seed=seed, n_loops=18)
    x2, y2, v2, _ = synthetic_hic(n, d_px, seed=seed + 1000, n_loops=18)
    normalize_sparse(x1, y1, v1, 5000, d_px, exact=True)
    normalize_sparse(x2, y2, v2, 5000, d_px, exact=True)
    c1 = np.zeros((n, n)); c1[x1, y1] = v1
    c2 = np.zeros((n, n)); c2[x2, y2] = v2

    octave_values = [sigma0 * (2 ** i) for i in range(octaves)]
    ref = diff_detect_block_oracle(
        c1.copy(), c2.copy(), octave_values, d_px, st, pt, pt2)
    assert any(len(g) for g in ref), "oracle found nothing; weak test data"

    cfg = DetectionConfig(resolution=5000, distance_bp=d_px * 5000,
                          pt=pt, pt2=pt2, st=st, sigma0=sigma0,
                          octaves=octaves, precision="float64")
    det = build_diff_detector(cfg, n)
    import jax
    out = jax.tree.map(np.asarray, det.fn_single(c1, c2))
    got = finish_diff_block(out, start=0, cfg=cfg, spec=det.spec)
    for gi, (g, r) in enumerate(zip(got, ref)):
        gset = [(int(a[0]), int(a[1])) for a in g]
        rset = [(int(a[0]), int(a[1])) for a in r]
        assert gset == rset, f"group {gi}: {gset} != {rset}"
    for g, r in ((got[0], ref[0]), (got[2], ref[2])):
        for grow, rrow in zip(g, r):
            np.testing.assert_allclose(grow[2], rrow[2], rtol=1e-5,
                                       atol=1e-11)
            assert grow[3] == rrow[3]
