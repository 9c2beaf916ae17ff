"""Seconds-fast shard_map typing smoke test.

The r04 regression (count-mode BH while_loop carrying a replicated int32
into a varying-typed body under shard_map, detect.py _band_candidates)
shipped because the only shard_map coverage was the 3-minute rowshard
pipeline tests. This file compiles the packed band detector under
shard_map at TINY shapes — both band placements, both BH modes — so any
vma/typing break is caught by a pre-commit run in seconds, not minutes.

Covers the reference's fork fan-out (mustache.py:913-934) as re-expressed
in sharding.MeshRunner; equality vs the unsharded launch is asserted
bit-for-bit (identical per-block statistics, zero collectives).
"""

import numpy as np
import pytest

import mustache_tpu.detect as detect
from mustache_tpu.config import DetectionConfig
from mustache_tpu.detect import band_width, build_detector
from mustache_tpu.sharding import RowShardPlan, make_mesh, make_runner

N, D_PX = 128, 32
STARTS = [0, 96]


def _tiny_band(rows: int) -> np.ndarray:
    rng = np.random.default_rng(3)
    Dl = band_width(N, D_PX)
    band = np.zeros((rows, Dl), np.float32)
    occ = rng.random((224, D_PX + 1)) < 0.6
    band[:224, : D_PX + 1][occ] = rng.standard_normal(int(occ.sum())) + 2.0
    return band


def _detector(mode, monkeypatch):
    monkeypatch.setattr(detect, "_BH_MODE", mode)
    # the build cache doesn't key on BH mode: drop it so each mode compiles
    detect._build_detector_cached.cache_clear()
    cfg = DetectionConfig(resolution=5000, distance_bp=D_PX * 5000,
                          precision="float32", max_candidates=64,
                          min_nz=10, min_tested=100)
    return build_detector(cfg, N)


@pytest.mark.smoke
@pytest.mark.parametrize("mode", ["count", "sort"])
def test_shardmap_compiles_and_matches_unsharded(mode, monkeypatch):
    det = _detector(mode, monkeypatch)
    plan = RowShardPlan(STARTS, chunk=N, nd=2)
    band = _tiny_band(plan.slab_rows)
    starts = np.asarray(STARTS, np.int32)

    ref_f, ref_i = (np.asarray(a)
                    for a in det.fn_band_packed(band, starts))

    mesh = make_mesh(n_block=2, n_row=1)

    # rowshard placement: per-chip slabs under shard_map (the r04 breakage)
    rs = make_runner(mesh, band_placement="rowshard")
    stack = rs.place_band_rowshard(band, plan)
    (idxs, sl), = plan.launches(1)
    assert idxs == [0, 1]
    got_f, got_i = (np.asarray(a)
                    for a in rs.run_rowshard(det, stack, sl))
    np.testing.assert_array_equal(got_f, ref_f)
    np.testing.assert_array_equal(got_i, ref_i)

    # replicated placement: same jitted fn, GSPMD-sharded starts
    rep = make_runner(mesh)
    got_f, got_i = (np.asarray(a) for a in det.fn_band_packed(
        rep.place_band(band), rep.place_starts(starts)))
    np.testing.assert_array_equal(got_f, ref_f)
    np.testing.assert_array_equal(got_i, ref_i)
