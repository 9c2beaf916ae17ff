"""Whole-chromosome pipeline parity vs an oracle pipeline (grid + dedup)."""

import numpy as np

from mustache_tpu.config import DetectionConfig, chunk_grid, block_mask_sizes
from mustache_tpu.pipeline import detect_loops_coo, densify_block
from oracle import detect_block_oracle, normalize_sparse_oracle
from synthetic import synthetic_hic


def oracle_pipeline(x, y, v, cfg: DetectionConfig):
    x = np.asarray(x); y = np.asarray(y); v = np.asarray(v, dtype=np.float64).copy()
    d_px = cfg.distance_px
    n = int(max(x.max(), y.max())) + 1
    normalize_sparse_oracle(x, y, v, cfg.resolution, d_px)
    start, end = chunk_grid(n, cfg.chunk_size, d_px)
    masks = block_mask_sizes(start, end, d_px)
    loops = []
    for i in range(len(start)):
        cc = densify_block(x, y, v, start[i], end[i], cfg.chunk_size)
        rows = detect_block_oracle(
            cc, list(cfg.octave_values), d_px, cfg.st, cfg.pt, start=start[i])
        for r in rows:
            if r[0] >= start[i] + masks[i] or r[1] >= start[i] + masks[i]:
                loops.append(r)
    return loops


def test_multiblock_pipeline_matches_oracle():
    d_px = 200
    x, y, v, anchors = synthetic_hic(3000, d_px, seed=21, n_loops=60)
    cfg = DetectionConfig(
        resolution=5000, distance_bp=d_px * 5000, precision="float64")
    assert cfg.chunk_size == 2000

    ref = oracle_pipeline(x, y, v.copy(), cfg)
    got = detect_loops_coo(x, y, v.copy(), cfg, exact_normalize=True)

    assert len(ref) > 0
    ref_set = {(int(r[0]), int(r[1])) for r in ref}
    got_set = {(lp.bin1, lp.bin2) for lp in got}
    assert got_set == ref_set
    ref_map = {(int(r[0]), int(r[1])): (r[2], r[3]) for r in ref}
    for lp in got:
        q_ref, s_ref = ref_map[(lp.bin1, lp.bin2)]
        np.testing.assert_allclose(lp.q, q_ref, rtol=1e-5, atol=1e-11)
        assert lp.scale == s_ref


def test_single_block_map():
    d_px = 120
    x, y, v, _ = synthetic_hic(900, d_px, seed=22, n_loops=20)
    cfg = DetectionConfig(
        resolution=5000, distance_bp=d_px * 5000, precision="float64")
    ref = oracle_pipeline(x, y, v.copy(), cfg)
    got = detect_loops_coo(x, y, v.copy(), cfg, exact_normalize=True)
    assert {(lp.bin1, lp.bin2) for lp in got} == {(int(r[0]), int(r[1])) for r in ref}


def test_empty_input():
    cfg = DetectionConfig(resolution=5000, distance_bp=600_000)
    assert detect_loops_coo(
        np.array([], np.int64), np.array([], np.int64), np.array([]), cfg) == []
