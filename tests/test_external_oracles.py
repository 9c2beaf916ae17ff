"""Skip-gated parity tests against the reference's ACTUAL ingest stacks.

The reference reads .hic via hicstraw (mustache.py:300-396) and
.cool/.mcool via cooler (mustache.py:399-592). Neither package is
installed in the build image, so the repo's readers are validated by
synthetic round-trips plus a Python-vs-C++ differential fuzz
(test_hic_fuzz.py). These tests close the remaining gap: wherever
``hicstraw`` / ``cooler`` ARE importable (one pip install away), they
cross-check this repo's decoders against the reference's behavioral
oracles on the same files — skipped here, decisive there.
"""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from hic_writer import write_hic
from synthetic import synthetic_hic
from test_cool import build_cool


# ---------------------------------------------------------------------------
# cooler (the reference's .cool stack, mustache.py:399-493)
# ---------------------------------------------------------------------------

try:
    import cooler
except ImportError:
    cooler = None

needs_cooler = pytest.mark.skipif(cooler is None,
                                  reason="cooler not installed")


def _synthetic_pixels(n_bins=400, d_px=80, seed=7):
    x, y, v, _ = synthetic_hic(n_bins, d_px, seed=seed, n_loops=8)
    # unique (x, y): the cooler schema stores one row per pixel
    key = x * n_bins + y
    _, idx = np.unique(key, return_index=True)
    return x[idx], y[idx], v[idx].astype(np.int32)


@needs_cooler
def test_cooler_accepts_our_cool_schema(tmp_path):
    """cooler itself must read the files build_cool writes — proves the
    synthetic fixtures every other .cool test relies on are real
    cooler-schema files, not a private dialect."""
    res = 5000
    x, y, v = _synthetic_pixels()
    path = str(tmp_path / "ours.cool")
    build_cool(path, [("chr1", 400 * res)], res, {"chr1": (x, y, v)})
    clr = cooler.Cooler(path)
    assert clr.binsize == res
    assert list(clr.chromnames) == ["chr1"]
    df = clr.pixels()[:]
    got = {(int(a), int(b)): float(c) for a, b, c in
           zip(df["bin1_id"], df["bin2_id"], df["count"])}
    want = {(int(a), int(b)): float(c) for a, b, c in zip(x, y, v)}
    assert got == want


@needs_cooler
def test_our_reader_matches_cooler_matrix_fetch(tmp_path):
    """Same file, both decoders: our CoolFile.fetch_band vs the
    reference's cooler.matrix(balance=True).fetch path
    (mustache.py:421-428), triplet for triplet."""
    import scipy.sparse as sp

    from mustache_tpu.io.cool import CoolFile

    res = 5000
    n_bins, d_px = 400, 80
    x, y, v = _synthetic_pixels(n_bins, d_px)
    rng = np.random.default_rng(5)
    w = rng.uniform(0.5, 2.0, n_bins)
    w[rng.choice(n_bins, 20, replace=False)] = np.nan  # masked bins
    path = str(tmp_path / "par.cool")
    build_cool(path, [("chr1", n_bins * res)], res, {"chr1": (x, y, v)},
               weights=w)

    X, Y, V = CoolFile(path).fetch_band("chr1", d_px * res, balance=True)

    clr = cooler.Cooler(path)
    m = clr.matrix(balance=True, sparse=True).fetch(
        ("chr1", 0, n_bins * res))
    m = sp.triu(m).tocoo()
    keep = (np.abs(m.col - m.row) <= d_px) & np.isfinite(m.data) \
        & (m.data > 0)
    want = {(int(a), int(b)): float(c) for a, b, c in
            zip(m.row[keep], m.col[keep], m.data[keep])}
    got = {(int(a), int(b)): float(c) for a, b, c in zip(X, Y, V)}
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)


@needs_cooler
def test_our_reader_reads_cooler_written_file(tmp_path):
    """A file written by cooler's own writer (not build_cool) read by our
    decoder — catches schema assumptions build_cool happens to share."""
    import pandas as pd

    from mustache_tpu.io.cool import read_cooler

    res = 5000
    n_bins, d_px = 300, 60
    x, y, v = _synthetic_pixels(n_bins, d_px, seed=11)
    bins = pd.DataFrame({
        "chrom": ["chr1"] * n_bins,
        "start": np.arange(n_bins) * res,
        "end": (np.arange(n_bins) + 1) * res,
    })
    pixels = pd.DataFrame({"bin1_id": x, "bin2_id": y, "count": v})
    pixels = pixels.sort_values(["bin1_id", "bin2_id"])
    path = str(tmp_path / "coolerwrit.cool")
    cooler.create_cooler(path, bins, pixels)
    with h5py.File(path, "a") as f:   # cooler.balance needs a weight column
        f["bins"].create_dataset("weight", data=np.ones(n_bins))

    X, Y, V, got_res = read_cooler(path, d_px * res, "chr1", "chr1", False)
    assert got_res == res
    got = {(int(a), int(b)): float(c) for a, b, c in zip(X, Y, V)}
    want = {(int(a), int(b)): float(c) for a, b, c in zip(x, y, v)
            if b - a <= d_px and c > 0}
    assert got == want


# ---------------------------------------------------------------------------
# hicstraw (the reference's .hic stack, mustache.py:300-396)
# ---------------------------------------------------------------------------

try:
    import hicstraw
except ImportError:
    hicstraw = None

needs_hicstraw = pytest.mark.skipif(hicstraw is None,
                                    reason="hicstraw not installed")


@pytest.mark.parametrize("version", [8, 9])
@needs_hicstraw
def test_hicstraw_parity_raw(tmp_path, version):
    """Same .hic file, both decoders: our HicFile vs hicstraw.straw
    ("observed", "NONE") — validates that our writer+reader pair speaks
    real .hic, not a private dialect fuzzed against itself."""
    from mustache_tpu.io.hic import HicFile

    res = 5000
    n_bins, d_px = 300, 60
    x, y, v = _synthetic_pixels(n_bins, d_px, seed=3)
    path = str(tmp_path / f"par_v{version}.hic")
    write_hic(path, [("chr1", n_bins * res)], res, {"chr1": (x, y, v)},
              version=version)

    hic = HicFile(path)
    X, Y, V = hic.fetch_chromosome("chr1", res, norm="NONE",
                                   distance_bins=d_px)
    hic.close()
    ours = {(int(a), int(b)): float(c) for a, b, c in zip(X, Y, V)}

    recs = hicstraw.straw("observed", "NONE", path,
                          "chr1", "chr1", "BP", res)
    theirs = {}
    for r in recs:
        a, b = r.binX // res, r.binY // res
        a, b = min(a, b), max(a, b)
        if b - a <= d_px:
            theirs[(a, b)] = float(r.counts)
    assert ours == theirs


@needs_hicstraw
def test_hicstraw_parity_kr_norm(tmp_path):
    """KR-normalized fetch parity (the reference's default norm,
    mustache.py:328)."""
    from mustache_tpu.io.hic import read_hic_file

    res = 5000
    n_bins, d_px = 300, 60
    x, y, v = _synthetic_pixels(n_bins, d_px, seed=13)
    rng = np.random.default_rng(17)
    kr = rng.uniform(0.5, 2.0, n_bins)
    path = str(tmp_path / "kr.hic")
    write_hic(path, [("chr1", n_bins * res)], res, {"chr1": (x, y, v)},
              version=8, norms={("KR", "chr1"): kr})

    X, Y, V = read_hic_file(path, "KR", False, d_px * res,
                            "chr1", "chr1", res)
    ours = {(int(a), int(b)): float(c) for a, b, c in zip(X, Y, V)}

    recs = hicstraw.straw("observed", "KR", path, "chr1", "chr1", "BP", res)
    theirs = {}
    for r in recs:
        a, b = r.binX // res, r.binY // res
        a, b = min(a, b), max(a, b)
        if b - a <= d_px and np.isfinite(r.counts) and r.counts > 0:
            theirs[(a, b)] = float(r.counts)
    assert set(ours) == set(theirs)
    for k in theirs:
        assert ours[k] == pytest.approx(theirs[k], rel=1e-6)
