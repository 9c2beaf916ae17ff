"""Differential detection parity vs the diff oracle."""

import numpy as np
import pytest

from mustache_tpu.config import DetectionConfig
from mustache_tpu.diff import (
    build_diff_detector, detect_diff_loops_coo, finish_diff_block,
)
from mustache_tpu.normalize import normalize_sparse
from oracle import diff_detect_block_oracle, normalize_sparse_oracle
from synthetic import synthetic_hic


def make_pair(n=700, d_px=120, seed=61):
    """Two correlated conditions: shared background, some condition-specific
    loops (so differential calls exist)."""
    x1, y1, v1, a1 = synthetic_hic(n, d_px, seed=seed, n_loops=20)
    x2, y2, v2, a2 = synthetic_hic(n, d_px, seed=seed + 1000, n_loops=20)
    normalize_sparse(x1, y1, v1, 5000, d_px, exact=True)
    normalize_sparse(x2, y2, v2, 5000, d_px, exact=True)
    c1 = np.zeros((n, n)); c1[x1, y1] = v1
    c2 = np.zeros((n, n)); c2[x2, y2] = v2
    return c1, c2


def test_diff_block_matches_oracle_f64():
    c1, c2 = make_pair()
    ref = diff_detect_block_oracle(
        c1.copy(), c2.copy(), [1.6, 3.2], 120, 0.88, 0.2, 0.1)
    cfg = DetectionConfig(resolution=5000, distance_bp=120 * 5000,
                          precision="float64")
    det = build_diff_detector(cfg, c1.shape[0])
    import jax
    out = jax.tree.map(np.asarray, det.fn_single(c1, c2))
    got = finish_diff_block(out, start=0, cfg=cfg, spec=det.spec)

    assert any(len(g) for g in ref), "oracle found nothing; weak test data"
    for gi, (g, r) in enumerate(zip(got, ref)):
        gset = [(int(a[0]), int(a[1])) for a in g]
        rset = [(int(a[0]), int(a[1])) for a in r]
        assert gset == rset, f"group {gi}: {gset} != {rset}"
    # q and sigma parity on the primary loop lists
    for g, r in ((got[0], ref[0]), (got[2], ref[2])):
        for grow, rrow in zip(g, r):
            np.testing.assert_allclose(grow[2], rrow[2], rtol=1e-5, atol=1e-11)
            assert grow[3] == rrow[3]
    # differential lists must be nonempty somewhere for a meaningful test
    assert len(ref[1]) + len(ref[3]) > 0


def test_diff_pipeline_multiblock():
    d_px = 150
    n = 2600
    x1, y1, v1, _ = synthetic_hic(n, d_px, seed=71, n_loops=40)
    x2, y2, v2, _ = synthetic_hic(n, d_px, seed=72, n_loops=40)
    cfg = DetectionConfig(resolution=5000, distance_bp=d_px * 5000,
                          precision="float64")
    rows = detect_diff_loops_coo(x1, y1, v1.copy(), x2, y2, v2.copy(), cfg,
                                 exact_normalize=True)
    tags = {t for *_, t in rows}
    assert 1 in tags and 3 in tags          # loops found in both conditions
    assert len(rows) > 10

    # oracle comparison for the full pipeline
    from mustache_tpu.config import block_mask_sizes, chunk_grid
    from mustache_tpu.pipeline import densify_block
    vv1, vv2 = v1.copy(), v2.copy()
    normalize_sparse_oracle(x1, y1, vv1, 5000, d_px)
    normalize_sparse_oracle(x2, y2, vv2, 5000, d_px)
    nmax = int(max(x1.max(), y1.max(), x2.max(), y2.max())) + 1
    start, end = chunk_grid(nmax, cfg.chunk_size, d_px)
    masks = block_mask_sizes(start, end, d_px)
    ref = []
    for i in range(len(start)):
        cc1 = densify_block(x1, y1, vv1, start[i], end[i], cfg.chunk_size)
        cc2 = densify_block(x2, y2, vv2, start[i], end[i], cfg.chunk_size)
        groups = diff_detect_block_oracle(
            cc1, cc2, [1.6, 3.2], d_px, 0.88, 0.2, 0.1, start=start[i])
        for tag, rws in zip((1, 2, 3, 4), groups):
            for r in rws:
                if r[0] >= start[i] + masks[i] or r[1] >= start[i] + masks[i]:
                    ref.append((int(r[0]), int(r[1]), tag))
    assert [(a, b, t) for a, b, _, _, t in rows] == ref


def test_diff_empty_inputs():
    cfg = DetectionConfig(resolution=5000, distance_bp=600_000)
    e = np.array([], np.int64)
    assert detect_diff_loops_coo(e, e, np.array([]), e, e, np.array([]), cfg) == []


def test_find_diff_loops_api():
    """Public one-call API mirrors detect_diff_loops_coo with clamping."""
    import mustache_tpu
    from synthetic import synthetic_hic

    x1, y1, v1, _ = synthetic_hic(900, 120, seed=91, n_loops=15)
    x2, y2, v2, _ = synthetic_hic(900, 120, seed=92, n_loops=15)
    rows = mustache_tpu.find_diff_loops(
        x1, y1, v1.copy(), x2, y2, v2.copy(),
        resolution=5000, distance_bp=600_000, pt=0.2, pt2=0.2, st=0.6)
    assert len(rows) > 0
    assert {r[4] for r in rows} <= {1, 2, 3, 4}
    assert all(len(r) == 5 for r in rows)
