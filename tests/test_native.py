"""Native (C++) vs pure-Python path equivalence for ingest + normalize."""

import numpy as np
import pytest

from mustache_tpu.io import native
from mustache_tpu.io.hic import HicFile
from mustache_tpu.normalize import normalize_sparse
from hic_writer import write_hic
from oracle import normalize_sparse_oracle
from synthetic import synthetic_hic

needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native library not built")


@needs_native
def test_normalize_native_matches_numpy_fallback(monkeypatch):
    x, y, v, _ = synthetic_hic(1500, 150, seed=111)
    v_native = v.copy()
    normalize_sparse(x, y, v_native, 5000, 150)

    # force the numpy band fallback
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)
    v_numpy = v.copy()
    normalize_sparse(x, y, v_numpy, 5000, 150)
    monkeypatch.setattr(native, "_tried", False)

    np.testing.assert_allclose(v_native, v_numpy, rtol=1e-9, atol=1e-10)


@needs_native
def test_normalize_native_matches_oracle():
    x, y, v, _ = synthetic_hic(1500, 150, seed=112)
    v1, v2 = v.copy(), v.copy()
    normalize_sparse(x, y, v1, 5000, 150)
    normalize_sparse_oracle(x, y, v2, 5000, 150)
    np.testing.assert_allclose(v1, v2, rtol=1e-8, atol=1e-8)


@needs_native
@pytest.mark.parametrize("version", [8, 9])
def test_hic_native_decoder_matches_python(tmp_path, monkeypatch, version):
    x, y, v, _ = synthetic_hic(500, 80, seed=113, n_loops=5)
    v = np.round(v) + 1
    path = str(tmp_path / "t.hic")
    write_hic(path, [("chr1", 500 * 5000)], 5000, {"chr1": (x, y, v)},
              version=version)

    Xn, Yn, Vn = HicFile(path).fetch_chromosome("chr1", 5000)

    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)
    Xp, Yp, Vp = HicFile(path).fetch_chromosome("chr1", 5000)
    monkeypatch.setattr(native, "_tried", False)

    got = sorted(zip(Xn.tolist(), Yn.tolist(), Vn.tolist()))
    want = sorted(zip(Xp.tolist(), Yp.tolist(), Vp.tolist()))
    assert got == want and len(got) == len(v)


@needs_native
@pytest.mark.parametrize("idt,vdt", [(np.int64, np.float64),
                                     (np.int32, np.float32)])
def test_fill_band_matches_numpy(idt, vdt):
    rng = np.random.default_rng(114)
    n, Dl, m = 800, 256, 50_000
    x = rng.integers(0, n, m).astype(idt)
    d = rng.integers(0, Dl + 32, m).astype(idt)  # some entries off the band
    y = (x + d).astype(idt)
    # unique pairs, like ingest guarantees
    _, keep = np.unique(x.astype(np.int64) * (n + Dl + 32)
                        + d.astype(np.int64), return_index=True)
    x, y, d = x[keep], y[keep], d[keep]
    v = rng.random(len(x)).astype(vdt)

    want = np.zeros((n, Dl), np.float32)
    sel = d < Dl
    want[x[sel], d[sel]] = v[sel]

    got = np.zeros((n, Dl), np.float32)
    assert native.fill_band(x, y, v, got)
    np.testing.assert_array_equal(got, want)


@needs_native
def test_normalize_coo_lower_triangle_safe():
    """Lower-triangle / out-of-range entries must not corrupt memory:
    (x, y) swapped input normalizes identically to upper-tri input
    (mirror semantics), and out-of-square entries are counted skipped."""
    x, y, v, _ = synthetic_hic(800, 100, seed=7)
    n = 800

    v_up = np.ascontiguousarray(v, np.float64)
    w_up, sk_up = native.normalize_coo(x, y, v_up, n, 100, 400)

    v_sw = np.ascontiguousarray(v, np.float64)
    w_sw, sk_sw = native.normalize_coo(
        np.ascontiguousarray(y), np.ascontiguousarray(x), v_sw, n, 100, 400)
    np.testing.assert_allclose(v_sw, v_up, rtol=1e-12)
    assert sk_up == sk_sw == np.count_nonzero(np.abs(y - x) >= 100)

    # entries outside the [0, n) square: skipped, values untouched
    xb = np.array([-5, 790], np.int64)
    yb = np.array([2, 805], np.int64)
    vb = np.array([3.0, 4.0])
    vv = np.ascontiguousarray(vb, np.float64)
    _, sk = native.normalize_coo(xb, yb, vv, n, 100, 400)
    assert sk == 2
    np.testing.assert_array_equal(vv, vb)


def test_fill_band_duplicate_triplets_deterministic():
    """Duplicate (x, y) triplets — legal in text/HiC-Pro input — must
    resolve last-write-wins deterministically across threads (the native
    scatter partitions by row ownership, not entry ranges)."""
    if not native.available():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(0)
    n, Dl = 5000, 132
    m = 300_000  # above the 1<<16 single-thread cutoff
    x = rng.integers(0, n, m).astype(np.int64)
    d = rng.integers(0, Dl, m).astype(np.int64)
    y = x + d
    v = rng.random(m).astype(np.float64)
    # repeat half the entries at the tail with new values: the tail copy
    # must win everywhere, every run
    x = np.concatenate([x, x[: m // 2]])
    y = np.concatenate([y, y[: m // 2]])
    v = np.concatenate([v, rng.random(m // 2)])

    ref = np.zeros((n, Dl), np.float32)
    ref[x, y - x] = v  # numpy fancy assignment scatters in input order
    for _ in range(3):
        band = np.zeros((n, Dl), np.float32)
        assert native.fill_band(x, y, v, band)
        np.testing.assert_array_equal(band, ref)
