"""Compact (uint8/uint16 + exception list) band transfer correctness.

The compact path (pipeline.fill_raw_band_compact + bandnorm exception
scatter) must be LOSSLESS relative to the f32 band transfer: widening the
narrow band and scattering the exception list reproduces the f32 band
bit-for-bit, so normalized loop calls are identical. Covers the native
fill, the numpy twin, dtype selection, padding semantics, and the
end-to-end device-normalize equivalence.
"""

import numpy as np
import pytest

from mustache_tpu.bandnorm import normalize_band_device, pad_exceptions
from mustache_tpu.config import DetectionConfig
from mustache_tpu.io import native
from mustache_tpu.pipeline import (detect_loops_coo, fill_raw_band,
                                   fill_raw_band_compact)
from synthetic import synthetic_hic


def _coo(rows, Dl, *, seed, frac_float=0.0, frac_big=0.0, lam=40.0):
    """Unique-pair COO triplets over a (rows, Dl) band with a controllable
    misfit tail."""
    rng = np.random.default_rng(seed)
    n = rows * Dl // 3
    flat = rng.choice(rows * Dl, size=n, replace=False)
    x = (flat // Dl).astype(np.int64)
    d = (flat % Dl).astype(np.int64)
    v = rng.poisson(lam, size=n).astype(np.float64)
    nf = int(n * frac_float)
    if nf:
        v[:nf] += rng.random(nf) * 0.5 + 0.25  # non-integers
    nb = int(n * frac_big)
    if nb:
        v[nf:nf + nb] = 70000.0 + rng.integers(0, 1000, nb)  # over u16
    return x, x + d, v


def _reconstruct(band, exc):
    """Host twin of the device widen+scatter."""
    out = band.astype(np.float32)
    if exc is not None:
        r, c, val = exc
        out[r, c] = val
    return out


@pytest.mark.parametrize("frac_float,frac_big,want_dtype", [
    (0.0, 0.0, np.uint8),      # lam=40 Poisson: all counts < 256
    (0.02, 0.0, np.uint8),     # thin float tail: u8 + exceptions wins
    (0.02, 0.01, np.uint8),    # plus an over-u16 tail
])
def test_compact_matches_f32_band(frac_float, frac_big, want_dtype):
    rows, Dl = 300, 96
    x, y, v = _coo(rows, Dl, seed=7, frac_float=frac_float,
                   frac_big=frac_big)
    band, exc, p4 = fill_raw_band_compact(x, y, v, (rows, Dl))
    assert band.dtype == want_dtype
    misfits = int(frac_float * len(v)) + int(frac_big * len(v))
    if misfits:
        assert exc is not None and len(exc[0]) == misfits
    else:
        assert exc is None

    ref = np.zeros((rows, Dl), np.float32)
    d = y - x
    ref[x, d] = v.astype(np.float32)
    np.testing.assert_array_equal(_reconstruct(band, exc), ref)


def test_compact_picks_u16_for_medium_counts():
    rows, Dl = 200, 64
    x, y, v = _coo(rows, Dl, seed=3, lam=500.0)  # counts straddle 256
    band, exc, p4 = fill_raw_band_compact(x, y, v, (rows, Dl))
    assert band.dtype == np.uint16
    ref = np.zeros((rows, Dl), np.float32)
    ref[x, y - x] = v.astype(np.float32)
    np.testing.assert_array_equal(_reconstruct(band, exc), ref)


def test_compact_falls_back_to_f32_for_float_heavy():
    """Fully bias-divided data: exception records would cost more than the
    f32 band, so the compact path must decline."""
    rows, Dl = 120, 48
    x, y, v = _coo(rows, Dl, seed=5, frac_float=1.0)
    band, exc, p4 = fill_raw_band_compact(x, y, v, (rows, Dl))
    assert band.dtype == np.float32 and exc is None
    np.testing.assert_array_equal(band, fill_raw_band(x, y, v, (rows, Dl)))


def test_numpy_twin_matches_native():
    """The no-native fallback census + fill must agree with the C++ path."""
    if native.classify_values(np.zeros(1)) is None:
        pytest.skip("native library unavailable")
    rows, Dl = 150, 80
    x, y, v = _coo(rows, Dl, seed=11, frac_float=0.03, frac_big=0.01)

    band_n, exc_n, _ = fill_raw_band_compact(x, y, v, (rows, Dl))

    orig_classify = native.classify_values
    orig_fill = native.fill_band_compact
    native.classify_values = lambda *a, **k: None
    native.fill_band_compact = lambda *a, **k: None
    try:
        band_p, exc_p, _ = fill_raw_band_compact(x, y, v, (rows, Dl))
    finally:
        native.classify_values = orig_classify
        native.fill_band_compact = orig_fill

    assert band_n.dtype == band_p.dtype
    np.testing.assert_array_equal(band_n, band_p)
    # exception ORDER may differ (threaded native fill); compare as sets
    assert exc_n is not None and exc_p is not None
    key = lambda e: sorted(zip(e[0].tolist(), e[1].tolist(), e[2].tolist()))
    assert key(exc_n) == key(exc_p)


def test_classify_values_counts():
    v = np.array([0.0, 1.0, 255.0, 256.0, 65535.0, 65536.0, 1.5, -1.0,
                  np.nan, np.inf], np.float64)
    got = native.classify_values(v)
    if got is None:
        pytest.skip("native library unavailable")
    # u8 misfits: 256, 65535, 65536, 1.5, -1, nan, inf -> 7
    # u16 misfits: 65536, 1.5, -1, nan, inf -> 5
    assert got == (7, 5)


def test_pad_exceptions_bucketing():
    rows = 50
    exc = (np.arange(5, dtype=np.int64), np.arange(5, dtype=np.int64),
           np.linspace(1.5, 5.5, 5))
    r, c, v = pad_exceptions(exc, rows)
    assert len(r) == 16 and r.dtype == np.int32 and v.dtype == np.float32
    np.testing.assert_array_equal(r[:5], np.arange(5))
    assert (r[5:] == rows).all()  # pad slots scatter out of bounds

    big = (np.zeros(300, np.int64), np.zeros(300, np.int64),
           np.ones(300))
    assert len(pad_exceptions(big, rows)[0]) == 512  # next power of two


def test_device_normalize_with_exceptions_matches_f32():
    """normalize_band_device(compact + exceptions) == normalize of the f32
    band — the end-to-end losslessness claim."""
    n, d_px, res = 400, 96, 5000
    rows, Dl = n, 96 + 2  # arbitrary small extra diag width
    x, y, v = _coo(rows, Dl, seed=13, frac_float=0.02, frac_big=0.005)
    y = np.minimum(y, rows - 1)  # keep pairs in-square for this check
    keep = y > x
    x, y, v = x[keep], y[keep], v[keep]
    # re-unique after the clamp
    flat = x * Dl + (y - x)
    _, idx = np.unique(flat, return_index=True)
    x, y, v = x[idx], y[idx], v[idx]

    band, exc, p4 = fill_raw_band_compact(x, y, v, (rows, Dl))
    assert band.dtype != np.float32 and exc is not None
    got, _ = normalize_band_device(
        band, n, res, d_px, exceptions=pad_exceptions(exc, rows))

    f32 = np.zeros((rows, Dl), np.float32)
    f32[x, y - x] = v.astype(np.float32)
    want, _ = normalize_band_device(f32, n, res, d_px)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pipeline_loops_identical_with_float_tail():
    """detect_loops_coo through the compact path (mixed int/float values)
    vs the same data routed through the f32 band: identical loop calls."""
    from mustache_tpu import pipeline

    cfg = DetectionConfig(resolution=5000, distance_bp=2_000_000,
                          pt=0.1, st=0.8, precision="float32")
    x, y, v, _ = synthetic_hic(1500, 300, seed=17, n_loops=30)
    rng = np.random.default_rng(17)
    tail = rng.choice(len(v), size=len(v) // 200, replace=False)
    v = v.copy()
    v[tail] += 0.5  # non-integer tail: compact path with exceptions

    band, exc, _ = fill_raw_band_compact(
        x, y, v, (1500, pipeline.band_width(1500, 400)))
    assert band.dtype == np.uint8 and exc is not None

    loops_compact = detect_loops_coo(x, y, v.copy(), cfg)

    orig = pipeline.fill_raw_band_compact
    pipeline.fill_raw_band_compact = (
        lambda xx, yy, vv, shape: (fill_raw_band(xx, yy, vv, shape)
                                   .astype(np.float32), None, False))
    try:
        loops_f32 = detect_loops_coo(x, y, v.copy(), cfg)
    finally:
        pipeline.fill_raw_band_compact = orig

    got = {(lp.bin1, lp.bin2) for lp in loops_compact}
    want = {(lp.bin1, lp.bin2) for lp in loops_f32}
    assert got == want and len(got) > 5


def _unpack4(packed):
    out = np.empty((packed.shape[0], packed.shape[1] * 2), np.float32)
    out[:, 0::2] = packed & 0x0F
    out[:, 1::2] = packed >> 4
    return out


def test_u4_packing_small_counts(monkeypatch):
    """Small-count data (the real Micro-C regime) nibble-packs: half the
    u8 bytes, 16..255 values move to the exception list, and the device
    unpack+scatter reproduces the f32 band bit-for-bit. (The size gate is
    lowered: production u4 applies only to >= 8 MB bands.)"""
    from mustache_tpu import pipeline
    monkeypatch.setattr(pipeline, "_U4_MIN_BYTES", 0)
    rows, Dl = 300, 96
    x, y, v = _coo(rows, Dl, seed=19, lam=2.0)
    v[:40] = 100.0      # a thin 16..255 tail -> u4 exceptions
    band, exc, p4 = fill_raw_band_compact(x, y, v, (rows, Dl))
    assert p4 and band.dtype == np.uint8 and band.shape == (rows, Dl // 2)
    assert exc is not None and len(exc[0]) == 40

    ref = np.zeros((rows, Dl), np.float32)
    ref[x, y - x] = v.astype(np.float32)
    np.testing.assert_array_equal(_reconstruct(_unpack4(band), exc), ref)


def test_u4_device_normalize_matches_f32(monkeypatch):
    from mustache_tpu import pipeline
    monkeypatch.setattr(pipeline, "_U4_MIN_BYTES", 0)
    n, d_px, res = 400, 96, 5000
    rows, Dl = n, 98
    x, y, v = _coo(rows, Dl, seed=23, lam=2.0)
    v[:25] += 0.5       # non-integer tail
    v[25:55] = 200.0    # 16..255 tail
    band, exc, p4 = fill_raw_band_compact(x, y, v, (rows, Dl))
    assert p4
    got, _ = normalize_band_device(
        band, n, res, d_px, exceptions=pad_exceptions(exc, rows),
        packed4=True)
    f32 = np.zeros((rows, Dl), np.float32)
    f32[x, y - x] = v.astype(np.float32)
    want, _ = normalize_band_device(f32, n, res, d_px)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_u4_pipeline_loops_identical(monkeypatch):
    """detect_loops_coo with the u4 band vs the f32 band: identical calls
    on small-count data."""
    from mustache_tpu import pipeline

    monkeypatch.setattr(pipeline, "_U4_MIN_BYTES", 0)

    cfg = DetectionConfig(resolution=5000, distance_bp=2_000_000,
                          pt=0.1, st=0.8, precision="float32")
    x, y, v, _ = synthetic_hic(1500, 300, seed=29, n_loops=30)
    v = np.minimum(v, 12.0)   # clamp into the nibble range
    shape = (1500, pipeline.band_width(1500, 400))
    band, exc, p4 = fill_raw_band_compact(x, y, v, shape)
    assert p4, "u4 should win on all-small counts"

    loops_u4 = detect_loops_coo(x, y, v.copy(), cfg)
    orig = pipeline.fill_raw_band_compact
    pipeline.fill_raw_band_compact = (
        lambda xx, yy, vv, sh: (fill_raw_band(xx, yy, vv, sh)
                                .astype(np.float32), None, False))
    try:
        loops_f32 = detect_loops_coo(x, y, v.copy(), cfg)
    finally:
        pipeline.fill_raw_band_compact = orig
    assert [(l.bin1, l.bin2, l.q, l.scale) for l in loops_u4] == \
           [(l.bin1, l.bin2, l.q, l.scale) for l in loops_f32]
    assert len(loops_u4) > 3
