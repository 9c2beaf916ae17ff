"""Schema-robustness fuzz for the native .cool reader.

The .hic reader has a truncation/corruption contract (test_hic_fuzz.py);
this is the .cool equivalent: real cooler files vary in integer widths,
chunking/compression, optional columns, and empty chromosomes
(reference consumer: mustache.py:399-493 via the cooler package, which
tolerates all of these). Every variant here is either read identically
to the canonical layout or rejected with a clear error — never silently
misread.
"""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from mustache_tpu.io.cool import CoolFile, cool_chrom_list, read_cooler
from synthetic import synthetic_hic


def _pixels(n_bins, d_px, seed):
    x, y, v, _ = synthetic_hic(n_bins, d_px, seed=seed, n_loops=5)
    key = x * n_bins + y
    _, idx = np.unique(key, return_index=True)
    # integer counts: the variants store int32/float32 and must agree
    return x[idx], y[idx], np.maximum(np.round(v[idx]), 1.0)


def build_cool_variant(path, chroms, res, pixels, *, weights=None,
                       id_dtype=np.int64, count_dtype=np.int32,
                       offset_dtype=np.int64, chunks=None, compression=None,
                       weight_column=True, extra_bins_cols=()):
    """build_cool with schema knobs real cooler files exercise."""
    f = h5py.File(path, "w")
    f.attrs["bin-size"] = res
    names = [c[0] for c in chroms]
    lengths = [c[1] for c in chroms]
    f.create_dataset("chroms/name", data=np.array(names, dtype="S16"))
    f.create_dataset("chroms/length", data=np.array(lengths, dtype=np.int64))

    nbins_per = [int(np.ceil(l / res)) for l in lengths]
    chrom_offset = np.concatenate([[0], np.cumsum(nbins_per)])
    nbins = int(chrom_offset[-1])
    bin_chrom = np.concatenate(
        [np.full(nb, i, np.int32) for i, nb in enumerate(nbins_per)]) \
        if nbins else np.zeros(0, np.int32)
    bin_start = np.concatenate(
        [np.arange(nb, dtype=np.int64) * res for nb in nbins_per]) \
        if nbins else np.zeros(0, np.int64)
    f.create_dataset("bins/chrom", data=bin_chrom)
    f.create_dataset("bins/start", data=bin_start)
    f.create_dataset("bins/end", data=bin_start + res)
    if weight_column:
        w = np.ones(nbins) if weights is None else weights
        f.create_dataset("bins/weight", data=w)
    for col in extra_bins_cols:
        f.create_dataset(f"bins/{col}", data=np.ones(nbins))

    b1_all, b2_all, v_all = [], [], []
    for key, (x, y, v) in pixels.items():
        ci = names.index(key)
        b1_all.append(np.asarray(x) + chrom_offset[ci])
        b2_all.append(np.asarray(y) + chrom_offset[ci])
        v_all.append(np.asarray(v))
    if b1_all:
        b1 = np.concatenate(b1_all).astype(id_dtype)
        b2 = np.concatenate(b2_all).astype(id_dtype)
        v = np.concatenate(v_all).astype(count_dtype)
        order = np.lexsort((b2, b1))
        b1, b2, v = b1[order], b2[order], v[order]
    else:
        b1 = np.zeros(0, id_dtype)
        b2 = np.zeros(0, id_dtype)
        v = np.zeros(0, count_dtype)
    kw = {}
    if chunks:
        kw["chunks"] = (min(chunks, max(len(b1), 1)),)
    if compression:
        kw["compression"] = compression
    f.create_dataset("pixels/bin1_id", data=b1, **kw)
    f.create_dataset("pixels/bin2_id", data=b2, **kw)
    f.create_dataset("pixels/count", data=v, **kw)

    f.create_dataset("indexes/chrom_offset",
                     data=chrom_offset.astype(offset_dtype))
    bin1_offset = np.searchsorted(b1, np.arange(nbins + 1))
    f.create_dataset("indexes/bin1_offset",
                     data=bin1_offset.astype(offset_dtype))
    f.close()


RES = 5000
N_BINS, D_PX = 300, 60


def _canonical_triplets():
    x, y, v = _pixels(N_BINS, D_PX, seed=41)
    return {(int(a), int(b)): float(c) for a, b, c in zip(x, y, v)
            if b - a <= D_PX and c > 0}


@pytest.mark.parametrize("variant", [
    dict(id_dtype=np.int32),
    dict(id_dtype=np.uint32),
    dict(offset_dtype=np.int32),
    dict(count_dtype=np.float64),
    dict(count_dtype=np.float32),
    dict(chunks=64),
    dict(chunks=64, compression="gzip"),
    dict(extra_bins_cols=("KR", "VC")),
])
def test_schema_variants_read_identically(tmp_path, variant):
    x, y, v = _pixels(N_BINS, D_PX, seed=41)
    path = str(tmp_path / "v.cool")
    build_cool_variant(path, [("chr1", N_BINS * RES)], RES,
                       {"chr1": (x, y, v)}, **variant)
    X, Y, V, res = read_cooler(path, D_PX * RES, "chr1", "chr1", False)
    assert res == RES
    got = {(int(a), int(b)): float(c) for a, b, c in zip(X, Y, V)}
    assert got == _canonical_triplets()


def test_named_balance_column(tmp_path):
    """-norm <col> routes to that bins column (mustache.py:424-426)."""
    x, y, v = _pixels(N_BINS, D_PX, seed=41)
    path = str(tmp_path / "kr.cool")
    build_cool_variant(path, [("chr1", N_BINS * RES)], RES,
                       {"chr1": (x, y, v)}, extra_bins_cols=("KR",))
    with h5py.File(path, "a") as f:
        del f["bins/KR"]
        f.create_dataset("bins/KR", data=np.full(N_BINS, 0.5))
    X, Y, V, _ = read_cooler(path, D_PX * RES, "chr1", "chr1", "KR")
    want = {k: c * 0.25 for k, c in _canonical_triplets().items()}
    got = {(int(a), int(b)): float(c) for a, b, c in zip(X, Y, V)}
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)


def test_missing_weight_column_clear_error(tmp_path):
    x, y, v = _pixels(N_BINS, D_PX, seed=41)
    path = str(tmp_path / "now.cool")
    build_cool_variant(path, [("chr1", N_BINS * RES)], RES,
                       {"chr1": (x, y, v)}, weight_column=False)
    with pytest.raises(ValueError, match="balance column"):
        read_cooler(path, D_PX * RES, "chr1", "chr1", False)


def test_missing_named_column_clear_error(tmp_path):
    x, y, v = _pixels(N_BINS, D_PX, seed=41)
    path = str(tmp_path / "noc.cool")
    build_cool_variant(path, [("chr1", N_BINS * RES)], RES,
                       {"chr1": (x, y, v)})
    with pytest.raises(ValueError, match="balance column"):
        read_cooler(path, D_PX * RES, "chr1", "chr1", "SCALE")


def test_empty_chromosome(tmp_path):
    """A chromosome with zero pixels reads as empty triplets, and its
    neighbors are unaffected."""
    x, y, v = _pixels(N_BINS, D_PX, seed=41)
    path = str(tmp_path / "empty.cool")
    build_cool_variant(
        path, [("chr1", N_BINS * RES), ("chr2", 200 * RES),
               ("chr3", N_BINS * RES)],
        RES, {"chr1": (x, y, v), "chr3": (x, y, v)})
    X, Y, V, _ = read_cooler(path, D_PX * RES, "chr2", "chr2", False)
    assert len(V) == 0
    X, Y, V, _ = read_cooler(path, D_PX * RES, "chr3", "chr3", False)
    got = {(int(a), int(b)): float(c) for a, b, c in zip(X, Y, V)}
    assert got == _canonical_triplets()


def test_empty_file(tmp_path):
    path = str(tmp_path / "barren.cool")
    build_cool_variant(path, [("chr1", N_BINS * RES)], RES, {})
    X, Y, V, _ = read_cooler(path, D_PX * RES, "chr1", "chr1", False)
    assert len(V) == 0
    assert cool_chrom_list(path) == ["chr1"]


def test_truncated_pixels_clear_error(tmp_path):
    """bin1_offset pointing past the pixels table (truncated copy) must
    raise, not fabricate data."""
    x, y, v = _pixels(N_BINS, D_PX, seed=41)
    path = str(tmp_path / "trunc.cool")
    build_cool_variant(path, [("chr1", N_BINS * RES)], RES,
                       {"chr1": (x, y, v)})
    with h5py.File(path, "a") as f:
        n = f["pixels/bin1_id"].shape[0]
        for ds in ("bin1_id", "bin2_id", "count"):
            data = f[f"pixels/{ds}"][: n // 2]
            del f[f"pixels/{ds}"]
            f.create_dataset(f"pixels/{ds}", data=data)
    with pytest.raises(Exception):
        X, Y, V, _ = read_cooler(path, D_PX * RES, "chr1", "chr1", False)
        # if h5py returns short reads instead of raising, the reader must
        # not return mismatched-length triplets
        assert len(X) == len(Y) == len(V)
        raise RuntimeError("short read tolerated")


def test_random_fuzz_roundtrip(tmp_path):
    """Random small maps x random schema knobs: written then read back
    must equal the in-memory expectation exactly."""
    rng = np.random.default_rng(2024)
    for trial in range(6):
        n_bins = int(rng.integers(50, 400))
        d_px = int(rng.integers(10, max(11, n_bins // 3)))
        npix = int(rng.integers(1, 500))
        x = rng.integers(0, n_bins, npix)
        d = rng.integers(0, d_px + 1, npix)
        y = np.minimum(x + d, n_bins - 1)
        v = rng.integers(1, 1000, npix)
        key = x * n_bins + y
        _, idx = np.unique(key, return_index=True)
        x, y, v = x[idx], y[idx], v[idx]
        kw = {}
        if rng.random() < 0.5:
            kw["id_dtype"] = np.int32
        if rng.random() < 0.5:
            kw["chunks"] = int(rng.integers(16, 128))
        if rng.random() < 0.3:
            kw["compression"] = "gzip"
        path = str(tmp_path / f"f{trial}.cool")
        build_cool_variant(path, [("chr1", n_bins * RES)], RES,
                           {"chr1": (x, y, v)}, **kw)
        X, Y, V = CoolFile(path).fetch_band("chr1", d_px * RES,
                                            balance=False)
        got = {(int(a), int(b)): float(c) for a, b, c in zip(X, Y, V)}
        want = {(int(a), int(b)): float(c)
                for a, b, c in zip(x, y, v) if b - a <= d_px}
        assert got == want, f"trial {trial}"
