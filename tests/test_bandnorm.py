"""On-device band normalization vs the host reference implementation.

The device path (mustache_tpu/bandnorm.py) must reproduce
normalize.normalize_sparse for ingested data (finite, v > 0, unique
pairs) in both regimes, and the pipeline wired on top of it must call the
same loops as the host-normalized pipeline.
"""

import numpy as np
import pytest

from mustache_tpu.bandnorm import normalize_band_device
from mustache_tpu.config import DetectionConfig
from mustache_tpu.detect import band_width
from mustache_tpu.normalize import normalize_sparse
from mustache_tpu.pipeline import detect_loops_coo
from synthetic import synthetic_hic


def _bands(x, y, v, n, d_px, resolution, width):
    """(device-normalized band, host-normalized band) as numpy f32."""
    Dl = band_width(width, d_px)
    rows = max(n, width)
    raw = np.zeros((rows, Dl), np.float32)
    d = y - x
    sel = d < Dl
    raw[x[sel], d[sel]] = v[sel]

    dev, _ = normalize_band_device(raw.copy(), n, resolution, d_px)
    dev = np.asarray(dev)

    host = np.zeros((rows, Dl), np.float32)
    vv = v.copy()
    normalize_sparse(x, y, vv, resolution, d_px, work_dtype=np.float32,
                     band_out=host, n=n)
    return dev, host


@pytest.mark.parametrize("n,d_px,res", [
    (900, 120, 5000),    # local regime (window F=400 < column lengths)
    (2000, 400, 5000),   # local regime, chr-scale shape
    (300, 200, 5000),    # global regime ((n-d)*res <= 2Mb)
])
def test_device_band_matches_host(n, d_px, res):
    x, y, v, _ = synthetic_hic(n, d_px, seed=3, n_loops=10)
    dev, host = _bands(x, y, v, n, d_px, res, width=max(n, 256))
    # f32 device cumsums vs f64 host accumulation: ~1e-5 relative
    np.testing.assert_allclose(dev, host, rtol=2e-4, atol=2e-4)
    # occupancy may differ only where z ~= 0 (value equals the local mean:
    # f32 cancels to exact 0 where f64 leaves ~1e-14 residue); anywhere
    # else a flipped support bit would be a real bug
    flip = (dev != 0) != (host != 0)
    assert (np.abs(host[flip]) < 1e-5).all()
    assert (np.abs(dev[flip]) < 1e-5).all()


def test_device_band_short_columns_regime():
    # chromosome barely longer than band + window: some diagonals shorter
    # than the window -> numpy's centering swap (gather path)
    n, d_px, res = 560, 120, 5000  # F=400, n - Dl + 1 < F
    assert (n - d_px) * res > 2_000_000
    x, y, v, _ = synthetic_hic(n, d_px, seed=11, n_loops=5)
    dev, host = _bands(x, y, v, n, d_px, res, width=n)
    np.testing.assert_allclose(dev, host, rtol=2e-4, atol=2e-4)


def test_pipeline_device_norm_same_calls():
    """detect_loops_coo f32 (device normalize) vs normalize=False fed with
    host-normalized values: identical loop calls."""
    cfg = DetectionConfig(resolution=5000, distance_bp=2_000_000,
                          pt=0.1, st=0.8, precision="float32")
    x, y, v, _ = synthetic_hic(2000, 400, seed=21, n_loops=40)

    loops_dev = detect_loops_coo(x, y, v.copy(), cfg)

    vv = v.copy()
    normalize_sparse(x, y, vv, cfg.resolution, cfg.distance_px,
                     work_dtype=np.float32, n=2000)
    loops_host = detect_loops_coo(x, y, vv, cfg, normalize=False)

    got = {(lp.bin1, lp.bin2) for lp in loops_dev}
    want = {(lp.bin1, lp.bin2) for lp in loops_host}
    assert got == want
    assert len(loops_dev) > 10


def test_pipeline_device_norm_regrow():
    """Overflow regrow must re-detect from the device band (host v stays
    raw under device normalize)."""
    cfg = DetectionConfig(resolution=5000, distance_bp=2_000_000,
                          pt=0.3, st=0.1, precision="float32",
                          max_candidates=64)
    x, y, v, _ = synthetic_hic(1200, 240, seed=5, n_loops=60,
                               loop_strength=8.0)
    big = DetectionConfig(resolution=5000, distance_bp=2_000_000,
                          pt=0.3, st=0.1, precision="float32",
                          max_candidates=8192)
    small_loops = detect_loops_coo(x, y, v.copy(), cfg)
    big_loops = detect_loops_coo(x, y, v.copy(), big)
    got = {(lp.bin1, lp.bin2) for lp in small_loops}
    want = {(lp.bin1, lp.bin2) for lp in big_loops}
    assert got == want and len(want) > 0


def test_bucket_rows_ladder():
    """Geometric ladder: monotone, 8-aligned, step ratio <= 9/8 (+align),
    idempotent on ladder values."""
    from mustache_tpu.bandnorm import bucket_rows

    assert bucket_rows(1) == 512 and bucket_rows(512) == 512
    b, steps = 512, 0
    while b <= 250_000:  # chr1 at 1kb
        nxt = bucket_rows(b + 1)
        assert nxt > b and nxt % 8 == 0
        assert nxt <= -(-b * 9 // 8 // 8) * 8
        assert bucket_rows(nxt) == nxt
        b = nxt
        steps += 1
    # the whole 1kb human genome fits in ~53 ladder rungs; any one run
    # touches far fewer (only the rungs its chromosomes land on)
    assert steps < 60


def test_pad_rows_invariance():
    """Normalizing a band padded to the row bucket must reproduce the
    exact-rows result on the real rows (pads are unoccupied and inert) —
    the correctness claim behind bucketed band shapes."""
    from mustache_tpu.bandnorm import bucket_rows

    n, d_px, res = 900, 120, 5000
    x, y, v, _ = synthetic_hic(n, d_px, seed=7, n_loops=8)
    Dl = band_width(max(n, 256), d_px)
    raw = np.zeros((n, Dl), np.float32)
    sel = (y - x) < Dl
    raw[x[sel], (y - x)[sel]] = v[sel]

    exact, _ = normalize_band_device(raw.copy(), n, res, d_px)
    padded = np.zeros((bucket_rows(n), Dl), np.float32)
    padded[:n] = raw
    bucketed, _ = normalize_band_device(padded, n, res, d_px)
    bucketed = np.asarray(bucketed)
    np.testing.assert_array_equal(bucketed[:n], np.asarray(exact))
    assert not bucketed[n:].any()


def test_norm_key_collapses_chromosome_length():
    """Two long-column chromosomes in the same row bucket must share one
    compile key; the short-column regime keeps the exact n."""
    from mustache_tpu.bandnorm import _norm_key

    assert (_norm_key(10056, 404, 9800, 5000, 400)
            == _norm_key(10056, 404, 10020, 5000, 400))
    # short-column regime (n - Dl + 1 < F): n is load-bearing
    assert (_norm_key(1024, 404, 700, 5000, 120)
            != _norm_key(1024, 404, 710, 5000, 120))


def test_diff_pipeline_device_norm_same_calls():
    """detect_diff_loops_coo f32 (device normalize) vs normalize=False fed
    with host-normalized values: identical rows (all four tags)."""
    from mustache_tpu.diff import detect_diff_loops_coo

    cfg = DetectionConfig(resolution=5000, distance_bp=2_000_000,
                          pt=0.2, st=0.6, pt2=0.2, precision="float32")
    x1, y1, v1, _ = synthetic_hic(1500, 300, seed=31, n_loops=25)
    x2, y2, v2, _ = synthetic_hic(1500, 300, seed=32, n_loops=25)

    rows_dev = detect_diff_loops_coo(x1, y1, v1.copy(), x2, y2, v2.copy(),
                                     cfg)

    vv1, vv2 = v1.copy(), v2.copy()
    normalize_sparse(x1, y1, vv1, cfg.resolution, cfg.distance_px,
                     work_dtype=np.float32, n=1500)
    normalize_sparse(x2, y2, vv2, cfg.resolution, cfg.distance_px,
                     work_dtype=np.float32, n=1500)
    rows_host = detect_diff_loops_coo(x1, y1, vv1, x2, y2, vv2, cfg,
                                      normalize=False)

    got = {(r[0], r[1], r[4]) for r in rows_dev}
    want = {(r[0], r[1], r[4]) for r in rows_host}
    assert got == want
    assert len(rows_dev) > 5
