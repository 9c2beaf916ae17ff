"""Candidate-table overflow: the pipeline must regrow and rerun a block
whose q<pt pixel count exceeds the configured capacity."""

import numpy as np

from mustache_tpu.config import DetectionConfig
from mustache_tpu.pipeline import detect_loops_coo
from synthetic import synthetic_hic


def test_overflow_regrows_and_matches():
    d_px = 120
    x, y, v, _ = synthetic_hic(900, d_px, seed=101, n_loops=40,
                               loop_strength=6.0)
    base_cfg = DetectionConfig(resolution=5000, distance_bp=d_px * 5000,
                               precision="float32", max_candidates=4096)
    ref = detect_loops_coo(x, y, v.copy(), base_cfg)
    assert len(ref) > 5

    tiny_cfg = base_cfg.with_(max_candidates=16)   # force overflow
    got = detect_loops_coo(x, y, v.copy(), tiny_cfg)
    assert [(l.bin1, l.bin2, l.scale) for l in got] == \
           [(l.bin1, l.bin2, l.scale) for l in ref]
    np.testing.assert_allclose([l.q for l in got], [l.q for l in ref],
                               rtol=1e-6)


def test_diff_overflow_regrows_and_matches():
    """The differential path must also regrow on sig_count overflow: the
    reference selects ALL pixels with q < pt (diff_mustache.py:458,473)."""
    from mustache_tpu.diff import detect_diff_loops_coo

    d_px = 120
    x1, y1, v1, _ = synthetic_hic(900, d_px, seed=103, n_loops=40,
                                  loop_strength=6.0)
    x2, y2, v2, _ = synthetic_hic(900, d_px, seed=104, n_loops=40,
                                  loop_strength=6.0)
    base_cfg = DetectionConfig(resolution=5000, distance_bp=d_px * 5000,
                               precision="float32", max_candidates=4096)
    ref = detect_diff_loops_coo(x1, y1, v1.copy(), x2, y2, v2.copy(), base_cfg)
    assert len(ref) > 5

    tiny_cfg = base_cfg.with_(max_candidates=16)   # force overflow
    got = detect_diff_loops_coo(x1, y1, v1.copy(), x2, y2, v2.copy(), tiny_cfg)
    assert [(a, b, s, t) for a, b, _, s, t in got] == \
           [(a, b, s, t) for a, b, _, s, t in ref]
    np.testing.assert_allclose([q for _, _, q, _, _ in got],
                               [q for _, _, q, _, _ in ref], rtol=1e-6)
