"""Real-TPU regression lane (``MTPU_TPU_TESTS=1 pytest tests -m tpu``).

The CPU suite exercises the Pallas kernel in interpret mode only; these
tests run the compiled kernel on the actual chip so TPU parity claims are
automated instead of resting on manual runs. Keep this lane SMALL — the
tunneled chip compiles slowly and serially.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module")
def tpu_backend():
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("no TPU backend available")
    return jax


def test_pallas_matches_xla_band_path(tpu_backend):
    """Compiled fused-kernel candidates == XLA band-path candidates."""
    import jax
    from mustache_tpu.config import DetectionConfig
    from mustache_tpu.detect import build_detector
    from synthetic import synthetic_hic

    n, d_px = 512, 128
    cfg_x = DetectionConfig(resolution=5000, distance_bp=d_px * 5000,
                            precision="float32", max_candidates=512,
                            use_pallas="off")
    cfg_p = cfg_x.with_(use_pallas="on")
    blocks = np.zeros((2, n, n), np.float32)
    for b in range(2):
        x, y, v, _ = synthetic_hic(n, d_px, seed=90 + b, n_loops=8)
        blocks[b][x, y] = v

    out_x = jax.tree.map(np.asarray, build_detector(cfg_x, n).fn(blocks))
    out_p = jax.tree.map(np.asarray, build_detector(cfg_p, n).fn(blocks))
    for b in range(2):
        want = {(int(x), int(y), int(s))
                for x, y, s, ok in zip(out_x["cand_x"][b], out_x["cand_y"][b],
                                       out_x["cand_sigidx"][b],
                                       out_x["cand_pass"][b]) if ok}
        got = {(int(x), int(y), int(s))
               for x, y, s, ok in zip(out_p["cand_x"][b], out_p["cand_y"][b],
                                      out_p["cand_sigidx"][b],
                                      out_p["cand_pass"][b]) if ok}
        assert got == want
        qx = {(int(x), int(y)): float(q)
              for x, y, q, ok in zip(out_x["cand_x"][b], out_x["cand_y"][b],
                                     out_x["cand_logq"][b],
                                     out_x["cand_valid"][b]) if ok}
        for x, y, q, ok in zip(out_p["cand_x"][b], out_p["cand_y"][b],
                               out_p["cand_logq"][b], out_p["cand_valid"][b]):
            if ok and (int(x), int(y)) in qx:
                np.testing.assert_allclose(float(q), qx[(int(x), int(y))],
                                           rtol=1e-3, atol=1e-4)


def test_pipeline_smoke_recovers_planted_anchors(tpu_backend):
    """End-to-end pipeline on the chip: planted loops are recovered."""
    from mustache_tpu.config import DetectionConfig
    from mustache_tpu.pipeline import detect_loops_coo
    from synthetic import synthetic_hic

    x, y, v, anchors = synthetic_hic(1200, 150, seed=91, n_loops=25)
    cfg = DetectionConfig(resolution=5000, distance_bp=150 * 5000,
                          pt=0.1, st=0.8, precision="float32")
    loops = detect_loops_coo(x, y, v, cfg)
    assert len(loops) >= 15
    A = np.array(anchors)
    for lp in loops:
        d = np.abs(A - np.array([lp.bin1, lp.bin2])).max(axis=1).min()
        assert d <= 2, (lp.bin1, lp.bin2)


def test_diff_smoke_on_tpu(tpu_backend):
    """Differential path runs end to end on the chip and calls loops."""
    from mustache_tpu.config import DetectionConfig
    from mustache_tpu.diff import detect_diff_loops_coo
    from synthetic import synthetic_hic

    x1, y1, v1, _ = synthetic_hic(1200, 150, seed=92, n_loops=20)
    x2, y2, v2, _ = synthetic_hic(1200, 150, seed=93, n_loops=20)
    cfg = DetectionConfig(resolution=5000, distance_bp=150 * 5000,
                          pt=0.2, st=0.8, precision="float32")
    rows = detect_diff_loops_coo(x1, y1, v1, x2, y2, v2, cfg)
    tags = {t for *_, t in rows}
    assert 1 in tags and 3 in tags


def test_diff_pallas_matches_xla_on_tpu(tpu_backend):
    """Compiled diff fused-kernel path == XLA scan path, full pipeline."""
    from mustache_tpu.config import DetectionConfig
    from mustache_tpu.diff import detect_diff_loops_coo
    from synthetic import synthetic_hic

    x1, y1, v1, _ = synthetic_hic(1200, 150, seed=94, n_loops=20)
    x2, y2, v2, _ = synthetic_hic(1200, 150, seed=95, n_loops=20)
    cfg_x = DetectionConfig(resolution=5000, distance_bp=150 * 5000,
                            pt=0.2, st=0.8, precision="float32",
                            use_pallas="off")
    ref = detect_diff_loops_coo(x1, y1, v1.copy(), x2, y2, v2.copy(), cfg_x)
    got = detect_diff_loops_coo(x1, y1, v1.copy(), x2, y2, v2.copy(),
                                cfg_x.with_(use_pallas="on"))
    assert [(a, b, s, t) for a, b, _, s, t in ref] == \
           [(a, b, s, t) for a, b, _, s, t in got]
    np.testing.assert_allclose([q for _, _, q, _, _ in ref],
                               [q for _, _, q, _, _ in got],
                               rtol=2e-3, atol=1e-6)
