import pytest

from mustache_tpu.config import (
    DetectionConfig, block_mask_sizes, chunk_grid, clamp_distance_filter,
    parse_bp,
)


def test_parse_bp():
    assert parse_bp("5000") == 5000
    assert parse_bp("5kb") == 5000
    assert parse_bp("5Kb") == 5000
    assert parse_bp("2Mb") == 2_000_000
    assert parse_bp("2mb") == 2_000_000
    assert parse_bp("") is False
    assert parse_bp(None) is False
    assert parse_bp("x5kb") is False
    assert parse_bp("5.5kb") is False


def test_clamp_distance_filter_defaults():
    # res=5kb: default 2000*res=10Mb > 2Mb -> falls through to 2Mb rule
    assert clamp_distance_filter(False, 5000) == 2_000_000
    # res >= 10kb: 200*res >= 2Mb
    assert clamp_distance_filter(False, 10000) == 2_000_000
    assert clamp_distance_filter(False, 25000) == 5_000_000
    # tiny res: 2000*res <= 2Mb
    assert clamp_distance_filter(False, 500) == 1_000_000
    assert clamp_distance_filter(False, 1000) == 2_000_000


def test_clamp_distance_filter_explicit():
    assert clamp_distance_filter(100_000, 5000) == 1_000_000  # < 200*res
    assert clamp_distance_filter(60_000_000, 5000) == 50_000_000  # > 10000*res
    assert clamp_distance_filter(3_000_000, 5000) == 3_000_000
    # diff variant clamps at 2000*res
    assert clamp_distance_filter(60_000_000, 5000, diff=True) == 10_000_000


def test_chunk_grid_matches_reference_shape():
    # chr21 @5kb: n=9629, chunk=2000, overlap=400 -> 5 right-aligned blocks
    start, end = chunk_grid(9629, 2000, 400)
    assert len(start) == len(end) == 6 or len(start) == len(end)
    # reproduce the reference loop literally to cross-check
    def ref_grid(n, chunk, overlap):
        if n <= chunk:
            return [0], [n]
        s, e = [0], [chunk]
        while e[-1] < n:
            s.append(e[-1] - overlap)
            e.append(s[-1] + chunk)
        e[-1] = n
        s[-1] = e[-1] - chunk
        return s, e

    for n in (100, 2000, 2001, 5000, 9629, 100_000):
        assert chunk_grid(n, 2000, 400) == ref_grid(n, 2000, 400)


def test_block_masks():
    start, end = chunk_grid(9629, 2000, 400)
    masks = block_mask_sizes(start, end, 400)
    assert masks[0] == -1
    assert masks[-1] == end[-2] - start[-1]
    for m in masks[1:-1]:
        assert m == 400


def test_config_derived():
    cfg = DetectionConfig(resolution=5000, distance_bp=2_000_000)
    assert cfg.distance_px == 400
    assert cfg.chunk_size == 2000
    assert cfg.octave_values == (1.6, 3.2)
    cfg1k = DetectionConfig(resolution=1000, distance_bp=2_000_000)
    assert cfg1k.distance_px == 2000
    assert cfg1k.chunk_size == 4000
