"""Pallas fused ladder-NMS kernel vs the XLA path (interpret mode on CPU).

The fused kernel computes the separable convolution in-kernel, so its blur
values differ from the XLA convolution by float32 rounding; candidate
anchors/scales are still expected to match exactly on realistic data (DoG
value gaps are orders of magnitude above the epsilon), while log-q values
are compared with a small tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mustache_tpu.config import DetectionConfig
from mustache_tpu.detect import build_detector, _build_detector_cached
from mustache_tpu.kernels.fused_ladder import (
    build_fused_mats, fused_ladder_nms_batched,
)
from mustache_tpu.scalespace import build_ladder
from synthetic import synthetic_hic


def make_block(n, d_px, seed):
    x, y, v, _ = synthetic_hic(n, d_px, seed=seed, n_loops=8)
    from mustache_tpu.normalize import normalize_sparse
    normalize_sparse(x, y, v, 5000, d_px, work_dtype=np.float32)
    c = np.zeros((n, n), dtype=np.float32)
    c[x, y] = v
    return c


@pytest.mark.parametrize("n,d_px", [(256, 64), (200, 40)])
def test_pallas_matches_xla_path(n, d_px):
    cfg = DetectionConfig(resolution=5000, distance_bp=d_px * 5000,
                          precision="float32", max_candidates=256)
    c = make_block(n, d_px, seed=91)

    # XLA reference outputs
    det = build_detector(cfg, n)
    ref = jax.tree.map(np.asarray, det.fn_single(c))

    # pallas-path detector (interpret mode so it runs on CPU)
    parts = _build_detector_cached(
        cfg.octave_values, cfg.precision, cfg.distance_px, n,
        cfg.max_candidates, True, True)
    st = np.float32(cfg.st)
    lp = np.float32(np.log(cfg.pt))
    got = jax.tree.map(np.asarray, parts.fn_single(c, st, lp))

    assert int(got["nz_count"]) == int(ref["nz_count"])
    assert int(got["n_tested"]) == int(ref["n_tested"])
    assert int(got["sig_count"]) == int(ref["sig_count"])

    rset = {(int(x), int(y), int(s)) for x, y, s, ok in zip(
        ref["cand_x"], ref["cand_y"], ref["cand_sigidx"], ref["cand_valid"])
        if ok}
    gset = {(int(x), int(y), int(s)) for x, y, s, ok in zip(
        got["cand_x"], got["cand_y"], got["cand_sigidx"], got["cand_valid"])
        if ok}
    assert rset == gset and len(rset) > 0

    rq = {(int(x), int(y)): float(q) for x, y, q, ok in zip(
        ref["cand_x"], ref["cand_y"], ref["cand_logq"], ref["cand_valid"]) if ok}
    for x, y, q, ok in zip(got["cand_x"], got["cand_y"], got["cand_logq"],
                           got["cand_valid"]):
        if ok:
            np.testing.assert_allclose(float(q), rq[(int(x), int(y))],
                                       rtol=2e-4, atol=1e-4)

    rp = {(int(x), int(y)) for x, y, ok in zip(
        ref["cand_x"], ref["cand_y"], ref["cand_pass"]) if ok}
    gp = {(int(x), int(y)) for x, y, ok in zip(
        got["cand_x"], got["cand_y"], got["cand_pass"]) if ok}
    assert rp == gp


def test_raw_kernel_band_state(n=256, d_px=64):
    """Direct checks of the fused kernel's band state planes."""
    c = make_block(n, d_px, seed=92)
    spec = build_ladder((1.6, 3.2))

    rows = np.arange(n)
    diag = rows[None, :] - rows[:, None]
    nz = (c != 0) & (diag >= 4)
    cs = np.where(diag <= 4, 2.0, c)
    cs = np.where(diag >= d_px + 1, 2.0, cs).astype(np.float32)

    KR, WC, R, TOPPAD, WINROWS = build_fused_mats(spec.kernels)
    DB = -(-min(d_px + 4, n) // 128) * 128
    band_v, band_sig, locs, sums = jax.jit(
        lambda cc, z: fused_ladder_nms_batched(
            cc[None], z[None], KR, WC, R=R, TOPPAD=TOPPAD,
            WINROWS=WINROWS, n_octaves=2, planes_per_octave=9, DB=DB,
            interpret=True)
    )(cs, nz.astype(np.float32))
    band_v = np.asarray(band_v[0])
    band_sig = np.asarray(band_sig[0])
    locs = np.asarray(locs[0])
    sums = np.asarray(sums[0])

    # at least some detections, all on the support band, positive response
    det_cells = np.argwhere(band_sig >= 0)
    assert len(det_cells) > 10
    for i, d in det_cells[:50]:
        assert nz[i, i + d]
        assert band_v[i, d] > 0
    # per-plane stats: every plane of a dense-enough block has finite stats
    assert np.isfinite(locs).all() and (sums > 0).all()

    # the in-kernel convolution must match the XLA blur to f32 rounding:
    # reconstruct the best-plane DoG value at detected cells from scipy
    from oracle import scipy_blur
    det_sig = spec.blur_sigmas
    for i, d in det_cells[:5]:
        k = int(band_sig[i, d])
        o, j = divmod(k, 9)
        gk = scipy_blur(cs.astype(np.float64), det_sig[o * 12 + j + 1])
        gk1 = scipy_blur(cs.astype(np.float64), det_sig[o * 12 + j + 2])
        want = gk[i, i + d] - gk1[i, i + d]
        np.testing.assert_allclose(band_v[i, d], want, rtol=2e-4, atol=1e-5)


def test_pallas_matches_xla_path_three_octaves():
    """Non-default ladder (octaves=3, 27 tested planes): the kernel's
    lane-packed per-plane partials and per-octave loops must hold beyond
    the default 2-octave shape."""
    n, d_px = 256, 64
    cfg = DetectionConfig(resolution=5000, distance_bp=d_px * 5000,
                          precision="float32", max_candidates=256,
                          octaves=3)
    c = make_block(n, d_px, seed=93)
    det = build_detector(cfg, n)
    ref = jax.tree.map(np.asarray, det.fn_single(c))
    parts = _build_detector_cached(
        cfg.octave_values, cfg.precision, cfg.distance_px, n,
        cfg.max_candidates, True, True)
    got = jax.tree.map(np.asarray, parts.fn_single(
        c, np.float32(cfg.st), np.float32(np.log(cfg.pt))))
    rset = {(int(x), int(y), int(s)) for x, y, s, ok in zip(
        ref["cand_x"], ref["cand_y"], ref["cand_sigidx"], ref["cand_valid"])
        if ok}
    gset = {(int(x), int(y), int(s)) for x, y, s, ok in zip(
        got["cand_x"], got["cand_y"], got["cand_sigidx"], got["cand_valid"])
        if ok}
    assert rset == gset and len(rset) > 0


def test_resolve_pallas_radius_gate():
    """Ladders whose blur radius exceeds the kernel's column pad must fall
    back to the XLA path (not raise inside build_fused_mats)."""
    from mustache_tpu.detect import _resolve_pallas
    from mustache_tpu.kernels.fused_ladder import CPAD
    from mustache_tpu.scalespace import kernel_radius, octave_sigmas

    for sigma0, octaves in [(1.6, 6), (3.0, 5)]:
        cfg = DetectionConfig(resolution=5000, distance_bp=64 * 5000,
                              precision="float32", sigma0=sigma0,
                              octaves=octaves, use_pallas="on")
        assert kernel_radius(max(octave_sigmas(cfg.octave_values[-1]))) \
            > CPAD - 1
        assert _resolve_pallas(cfg) is False
        # and the detector builds + runs on the XLA path
        det = build_detector(cfg, 192)
        out = det.fn_single(np.zeros((192, 192), np.float32))
        assert int(out["nz_count"]) == 0
    # the default ladder still resolves per use_pallas
    cfg = DetectionConfig(resolution=5000, distance_bp=64 * 5000,
                          precision="float32", use_pallas="on")
    assert _resolve_pallas(cfg) is True


def test_diff_pallas_matches_xla_path():
    """Differential detector, fused-kernel path vs the XLA scan path:
    per-map candidates, q values, differential p, and the exported best
    responses must agree (interpret mode on CPU)."""
    from mustache_tpu.diff import _build_diff_detector_cached

    n, d_px = 256, 64
    cfg = DetectionConfig(resolution=5000, distance_bp=d_px * 5000,
                          precision="float32", max_candidates=256)
    c1 = make_block(n, d_px, seed=95)
    c2 = make_block(n, d_px, seed=96)
    st = np.float32(cfg.st)
    lp = np.float32(np.log(cfg.pt))

    ref_parts = _build_diff_detector_cached(
        cfg.octave_values, cfg.precision, cfg.distance_px, n,
        cfg.max_candidates, False, False)
    got_parts = _build_diff_detector_cached(
        cfg.octave_values, cfg.precision, cfg.distance_px, n,
        cfg.max_candidates, True, True)
    ref = jax.tree.map(np.asarray, ref_parts[2](c1, c2, st, lp))
    got = jax.tree.map(np.asarray, got_parts[2](c1, c2, st, lp))

    for tag in ("1", "2"):
        assert int(got[f"n_tested{tag}"]) == int(ref[f"n_tested{tag}"])
        assert int(got[f"sig_count{tag}"]) == int(ref[f"sig_count{tag}"])
        rset = {(int(x), int(y), int(s)) for x, y, s, ok in zip(
            ref[f"cand_x{tag}"], ref[f"cand_y{tag}"],
            ref[f"cand_sigidx{tag}"], ref[f"cand_valid{tag}"]) if ok}
        gset = {(int(x), int(y), int(s)) for x, y, s, ok in zip(
            got[f"cand_x{tag}"], got[f"cand_y{tag}"],
            got[f"cand_sigidx{tag}"], got[f"cand_valid{tag}"]) if ok}
        assert rset == gset and len(rset) > 0, f"map {tag}"

        rmap = {}
        for i, ok in enumerate(ref[f"cand_valid{tag}"]):
            if ok:
                key = (int(ref[f"cand_x{tag}"][i]),
                       int(ref[f"cand_y{tag}"][i]))
                rmap[key] = (float(ref[f"cand_logq{tag}"][i]),
                             ref[f"neigh_pair{tag}"][i],
                             ref[f"neigh_v1{tag}"][i],
                             ref[f"neigh_v2{tag}"][i],
                             bool(ref[f"cand_pass{tag}"][i]))
        for i, ok in enumerate(got[f"cand_valid{tag}"]):
            if not ok:
                continue
            key = (int(got[f"cand_x{tag}"][i]), int(got[f"cand_y{tag}"][i]))
            rq, rpair, rv1, rv2, rpass = rmap[key]
            np.testing.assert_allclose(float(got[f"cand_logq{tag}"][i]), rq,
                                       rtol=2e-4, atol=1e-4)
            np.testing.assert_allclose(got[f"neigh_pair{tag}"][i], rpair,
                                       rtol=2e-3, atol=1e-5)
            np.testing.assert_allclose(got[f"neigh_v1{tag}"][i], rv1,
                                       rtol=2e-4, atol=1e-5)
            np.testing.assert_allclose(got[f"neigh_v2{tag}"][i], rv2,
                                       rtol=2e-4, atol=1e-5)
            assert bool(got[f"cand_pass{tag}"][i]) == rpass


def test_pallas_pad_slots_skipped():
    """Batch slots with start -1 (pow2 padding) must be skipped in-kernel
    and produce empty state; valid slots must be bit-identical to an
    unpadded launch (interpret mode on CPU)."""
    n, d_px = 256, 64
    cfg = DetectionConfig(resolution=5000, distance_bp=d_px * 5000,
                          precision="float32", max_candidates=256)
    from mustache_tpu.bandnorm import bucket_rows
    from mustache_tpu.detect import band_width

    # a small chromosome band with 2 real blocks
    n_bins = 320
    x, y, v, _ = synthetic_hic(n_bins, d_px, seed=97, n_loops=8)
    from mustache_tpu.normalize import normalize_sparse
    normalize_sparse(x, y, v, 5000, d_px, work_dtype=np.float32)
    rows = bucket_rows(max(n_bins, n))
    band = np.zeros((rows, band_width(n, d_px)), np.float32)
    sel = (y - x) < band.shape[1]
    band[x[sel], (y - x)[sel]] = v[sel]

    parts = _build_detector_cached(
        cfg.octave_values, cfg.precision, cfg.distance_px, n,
        cfg.max_candidates, True, True)
    st = np.float32(cfg.st)
    lp = np.float32(np.log(cfg.pt))

    starts_real = np.asarray([0, 64], np.int32)
    starts_pad = np.asarray([0, 64, -1, -1], np.int32)
    ref = jax.tree.map(np.asarray, parts.fn_band(band, starts_real, st, lp))
    got = jax.tree.map(np.asarray, parts.fn_band(band, starts_pad, st, lp))

    for k in ref:
        np.testing.assert_array_equal(ref[k], got[k][:2], err_msg=k)
    # pad slots: no detections at all
    for b in (2, 3):
        assert int(got["n_tested"][b]) == 0
        assert not got["cand_valid"][b].any()
