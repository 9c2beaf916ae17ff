"""Count-fixed-point BH (default) vs the full-sort BH (MUSTACHE_TPU_BH=sort).

The count mode replaces the O(M log M) full-array sort with a few O(M)
count passes (detect._band_candidates). The two modes must agree on
everything emission can observe: sig_count, the valid candidate table
(positions, scales, q bit-for-bit), the pass filters, and the final loop
rows. Non-significant tested neighbors are the one DELIBERATE difference
(exact q >= pt in sort mode, the q=1 marker in count mode) — both lose
the host argmin to the component's significant center, so rows match.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import mustache_tpu.detect as detect
from mustache_tpu.config import DetectionConfig
from mustache_tpu.detect import _detect_one, build_detector, finish_block
from mustache_tpu.scalespace import build_ladder
from synthetic import synthetic_hic


def _run(c, cfg, mode, monkeypatch, K=None, pt=None, precision=None):
    monkeypatch.setattr(detect, "_BH_MODE", mode)
    spec = build_ladder(cfg.octave_values)
    dtype = np.float64 if (precision or cfg.precision) == "float64" \
        else np.float32
    out = _detect_one(
        jnp.asarray(c, dtype), dtype(cfg.st),
        dtype(np.log(pt if pt is not None else cfg.pt)),
        kernels=spec.kernels.astype(dtype), det_ceil=spec.det_ceil,
        planes_per_octave=spec.planes_per_octave,
        n_octaves=len(cfg.octave_values), d_px=cfg.distance_px,
        intra=True, K=K or cfg.max_candidates)
    return {k: np.asarray(v) for k, v in out.items()}, spec


def _block(n, d_px, seed, n_loops=8):
    x, y, v, _ = synthetic_hic(n, d_px, seed=seed, n_loops=n_loops)
    from mustache_tpu.normalize import normalize_sparse
    normalize_sparse(x, y, v, 5000, d_px, work_dtype=np.float32)
    c = np.zeros((n, n), dtype=np.float32)
    c[x, y] = v
    return c


@pytest.mark.parametrize("n,d_px,seed", [(256, 64, 7), (200, 40, 11),
                                         (320, 120, 23)])
def test_count_matches_sort_full_surface(n, d_px, seed, monkeypatch):
    cfg = DetectionConfig(resolution=5000, distance_bp=d_px * 5000,
                          precision="float32", max_candidates=256,
                          min_nz=50, min_tested=500)
    c = _block(n, d_px, seed)
    ref, spec = _run(c, cfg, "sort", monkeypatch)
    got, _ = _run(c, cfg, "count", monkeypatch)

    assert int(got["sig_count"]) == int(ref["sig_count"])
    assert int(got["n_tested"]) == int(ref["n_tested"])
    ok = ref["cand_valid"]
    assert np.array_equal(got["cand_valid"], ok)
    # identical valid-slot table, bit-for-bit q
    for k in ("cand_x", "cand_y", "cand_sigidx", "cand_logq",
              "pass_sparse", "pass_enrich", "cand_pass"):
        assert np.array_equal(got[k][ok], ref[k][ok]), k
    assert ok.any()

    # identical emitted rows (the only externally visible surface)
    rows_ref = finish_block(ref, block_index=0, start=0, cfg=cfg, spec=spec)
    rows_got = finish_block(got, block_index=0, start=0, cfg=cfg, spec=spec)
    assert rows_ref == rows_got and len(rows_ref) > 0

    # significant neighbors carry bit-identical q; non-significant painted
    # pixels must be >= log pt in BOTH modes (argmin losers)
    lpt = np.log(cfg.pt)
    sig_r = ref["neigh_logq"][ok] < lpt
    sig_g = got["neigh_logq"][ok] < lpt
    assert np.array_equal(sig_r, sig_g)
    assert np.array_equal(ref["neigh_logq"][ok][sig_r],
                          got["neigh_logq"][ok][sig_g])
    assert np.array_equal(got["neigh_sigidx"][ok], ref["neigh_sigidx"][ok])


def test_count_overflow_signals_regrow_like_sort(monkeypatch):
    """k* > K: both modes must signal overflow (sig_count > K) so the
    regrow contract fires (the launch's table is then discarded). Sort
    mode reports the exact k*; count mode reports the F(K+1) lower bound,
    which is >= K+1 exactly when k* > K — pipeline._maybe_regrow loops
    with geometric capacity growth until the table fits, and the
    pipeline-level equality tests (test_regrow, test_rowshard_regrow,
    test_diff_rowshard_regrow) pin the emitted rows."""
    cfg = DetectionConfig(resolution=5000, distance_bp=64 * 5000,
                          precision="float32", max_candidates=8)
    c = _block(256, 64, seed=31, n_loops=24)
    ref, _ = _run(c, cfg, "sort", monkeypatch, K=8)
    got, _ = _run(c, cfg, "count", monkeypatch, K=8)
    assert int(ref["sig_count"]) > 8
    assert 8 < int(got["sig_count"]) <= int(ref["sig_count"])

    # at a capacity that fits, count mode's sig_count is exact again
    K_fit = 1 << (int(ref["sig_count"]) - 1).bit_length()
    ref2, _ = _run(c, cfg, "sort", monkeypatch, K=K_fit)
    got2, _ = _run(c, cfg, "count", monkeypatch, K=K_fit)
    assert int(got2["sig_count"]) == int(ref2["sig_count"])


@pytest.mark.parametrize("pt", [1e-12, 0.9])
def test_count_matches_sort_extreme_thresholds(pt, monkeypatch):
    """Near-empty and near-everything significant sets."""
    cfg = DetectionConfig(resolution=5000, distance_bp=64 * 5000,
                          precision="float32", max_candidates=4096)
    c = _block(256, 64, seed=43)
    ref, spec = _run(c, cfg, "sort", monkeypatch, pt=pt)
    got, _ = _run(c, cfg, "count", monkeypatch, pt=pt)
    assert int(got["sig_count"]) == int(ref["sig_count"])
    ok = ref["cand_valid"]
    assert np.array_equal(got["cand_valid"], ok)
    for k in ("cand_x", "cand_y", "cand_logq", "cand_pass"):
        assert np.array_equal(got[k][ok], ref[k][ok]), k
    rows_ref = finish_block(ref, block_index=0, start=0, cfg=cfg, spec=spec)
    rows_got = finish_block(got, block_index=0, start=0, cfg=cfg, spec=spec)
    assert rows_ref == rows_got


def test_count_matches_sort_float64(monkeypatch):
    cfg = DetectionConfig(resolution=5000, distance_bp=40 * 5000,
                          precision="float64", max_candidates=256)
    c = _block(200, 40, seed=5)
    ref, spec = _run(c, cfg, "sort", monkeypatch, precision="float64")
    got, _ = _run(c, cfg, "count", monkeypatch, precision="float64")
    assert int(got["sig_count"]) == int(ref["sig_count"])
    ok = ref["cand_valid"]
    assert np.array_equal(got["cand_valid"], ok)
    assert np.array_equal(got["cand_logq"][ok], ref["cand_logq"][ok])
    rows_ref = finish_block(ref, block_index=0, start=0, cfg=cfg, spec=spec)
    rows_got = finish_block(got, block_index=0, start=0, cfg=cfg, spec=spec)
    assert rows_ref == rows_got


def test_count_empty_block(monkeypatch):
    """All-zero input: no tested pixels, k* fixed point lands at 0."""
    cfg = DetectionConfig(resolution=5000, distance_bp=64 * 5000,
                          precision="float32", max_candidates=64)
    c = np.zeros((256, 256), dtype=np.float32)
    got, _ = _run(c, cfg, "count", monkeypatch)
    assert int(got["sig_count"]) == 0
    assert not got["cand_valid"].any()
