"""Inter-chromosomal mode tests (beyond the reference: its -ch2 path
crashes, mustache.py:689-694). Semantics are this engine's own, documented
in mustache_tpu/inter.py."""

import numpy as np
import pytest

from mustache_tpu.config import DetectionConfig
from mustache_tpu.inter import detect_inter_loops_coo, normalize_inter
from synthetic import synthetic_inter


def _cfg(**kw):
    base = dict(resolution=5000, distance_bp=2_000_000, pt=0.1, st=0.5,
                precision="float32", min_tested=5000)
    base.update(kw)
    return DetectionConfig(**base)


def test_normalize_inter_semantics():
    v = np.array([1.0, 2.0, 3.0, np.nan, np.inf], np.float64)
    out = normalize_inter(v)
    # nan/inf zeroed first, then global z-score
    ref = np.array([1.0, 2.0, 3.0, 0.0, 0.0])
    z = (ref - ref.mean()) / ref.std()
    np.testing.assert_allclose(out, z, rtol=1e-12)
    # zero spread -> all zeros, no NaN
    v2 = np.full(5, 7.0)
    assert not np.isnan(normalize_inter(v2)).any()
    assert (v2 == 0).all()


def test_recovers_planted_inter_loops():
    x, y, v, anchors = synthetic_inter(900, 700, seed=5, n_loops=10)
    loops = detect_inter_loops_coo(x, y, v, _cfg(), chunk=1024)
    assert len(loops) >= 8
    hits = sum(
        any(abs(r[0] - a) <= 2 and abs(r[1] - b) <= 2 for a, b in anchors)
        for r in loops)
    assert hits >= 0.9 * len(loops), (hits, len(loops))


def test_tiled_run_has_no_duplicates_and_recovers():
    # 2x2 tile grid; each planted anchor reported exactly once
    x, y, v, anchors = synthetic_inter(900, 800, seed=7, n_loops=10)
    loops = detect_inter_loops_coo(x, y, v, _cfg(), chunk=512)
    coords = [(int(r[0]), int(r[1])) for r in loops]
    assert len(coords) == len(set(coords))
    hits = sum(
        any(abs(r[0] - a) <= 2 and abs(r[1] - b) <= 2 for a, b in anchors)
        for r in loops)
    assert hits >= 8
    # every call is in-bounds of the rectangle
    assert all(0 <= cx < 900 and 0 <= cy < 800 for cx, cy in coords)


def test_rectangle_orientation():
    # x must stay on the first chromosome's (rows) axis
    x, y, v, anchors = synthetic_inter(600, 300, seed=11, n_loops=6)
    loops = detect_inter_loops_coo(x, y, v, _cfg(), chunk=1024)
    assert any(r[0] >= 300 for r in loops)  # rows beyond the y-range exist


def test_empty_and_tiny_inputs():
    cfg = _cfg()
    assert detect_inter_loops_coo([], [], np.array([]), cfg) == []
    # too few nonzeros -> min_nz gate
    x = np.arange(10); y = np.arange(10); v = np.ones(10)
    assert detect_inter_loops_coo(x, y, v, cfg, chunk=512) == []


def test_cool_rect_roundtrip(tmp_path):
    from mustache_tpu.io.cool import CoolFile, read_cooler
    from test_cool import build_cool

    res = 5000
    xi, yi, vi, _ = synthetic_inter(100, 80, seed=3, n_loops=0)
    xa, ya, va, _ = __import__("synthetic").synthetic_hic(100, 20, seed=4)
    path = str(tmp_path / "inter.cool")
    build_cool(path, [("chr1", 100 * res), ("chr2", 80 * res)], res,
               {"chr1": (xa, ya, va), ("chr1", "chr2"): (xi, yi, vi)})

    clr = CoolFile(path)
    x, y, v = clr.fetch_rect("chr1", "chr2")
    got = {(int(a), int(b)): c for a, b, c in zip(x, y, v)}
    want = {(int(a), int(b)): c for a, b, c in zip(xi, yi, vi)}
    assert got == want
    # flipped order transposes
    x2, y2, v2 = clr.fetch_rect("chr2", "chr1")
    got2 = {(int(a), int(b)): c for a, b, c in zip(x2, y2, v2)}
    assert got2 == {(b, a): c for (a, b), c in want.items()}
    clr.close()

    # reference-shaped entry point routes inter to the rectangle
    x3, y3, v3, res3 = read_cooler(path, 2_000_000, "chr1", "chr2", False)
    assert res3 == res and len(v3) == len(vi)


@pytest.mark.parametrize("version", [8, 9])
def test_hic_pair_roundtrip(tmp_path, version):
    from mustache_tpu.io.hic import HicFile
    from hic_writer import write_hic

    res = 5000
    xi, yi, vi, _ = synthetic_inter(90, 60, seed=9, n_loops=0)
    path = str(tmp_path / f"inter_v{version}.hic")
    norms = {("KR", "c1"): np.full(90, 2.0), ("KR", "c2"): np.full(60, 4.0)}
    write_hic(path, [("c1", 90 * res), ("c2", 60 * res)], res,
              {("c1", "c2"): (xi, yi, vi)}, version=version, norms=norms)

    hic = HicFile(path)
    x, y, v = hic.fetch_pair("c1", "c2", res)
    got = {(int(a), int(b)): c for a, b, c in zip(x, y, v)}
    want = {(int(a), int(b)): c for a, b, c in zip(xi, yi, vi)}
    assert got == want
    # normalized: divided by 2 * 4
    xn, yn, vn = hic.fetch_pair("c1", "c2", res, norm="KR")
    np.testing.assert_allclose(
        sorted(vn), sorted(np.asarray(list(want.values())) / 8.0))
    # flipped order transposes
    xf, yf, vf = hic.fetch_pair("c2", "c1", res)
    gotf = {(int(a), int(b)): c for a, b, c in zip(xf, yf, vf)}
    assert gotf == {(b, a): c for (a, b), c in want.items()}
    hic.close()


def test_cli_inter_end_to_end(tmp_path):
    from mustache_tpu.cli import main
    from test_cool import build_cool

    res = 5000
    xi, yi, vi, anchors = synthetic_inter(700, 500, seed=21, n_loops=8)
    xa, ya, va, _ = __import__("synthetic").synthetic_hic(700, 60, seed=22)
    path = str(tmp_path / "inter_cli.cool")
    build_cool(path, [("chr1", 700 * res), ("chr2", 500 * res)], res,
               {"chr1": (xa, ya, va), ("chr1", "chr2"): (xi, yi, vi)})
    out = str(tmp_path / "out.tsv")
    rc = main(["-f", path, "-r", "5kb", "-o", out,
               "-ch", "chr1", "-ch2", "chr2", "-pt", "0.1", "-st", "0.5",
               "-norm", "weight"])
    assert rc == 0
    lines = open(out).read().strip().splitlines()
    assert lines[0].startswith("BIN1_CHR")
    rows = [ln.split("\t") for ln in lines[1:]]
    assert rows, "no inter loops called"
    assert all(r[0] == "chr1" and r[3] == "chr2" for r in rows)
    hits = 0
    for r in rows:
        bx, by = int(r[1]) // res, int(r[4]) // res
        hits += any(abs(bx - a) <= 2 and abs(by - b) <= 2 for a, b in anchors)
    assert hits >= len(rows) * 0.8
