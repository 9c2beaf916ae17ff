"""Native .cool/.mcool reader tests against files we synthesize with h5py."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from mustache_tpu.io.cool import CoolFile, cool_chrom_list, read_cooler, read_mcooler
from synthetic import synthetic_hic


def build_cool(path, chroms, res, pixels, weights=None, group=None):
    """Write a minimal cooler-schema HDF5 file.

    chroms: [(name, length_bp)], pixels: dict chrom -> (x, y, count) local bins.
    """
    import h5py as h5

    f = h5.File(path, "a")
    g = f.create_group(group) if group else f
    g.attrs["bin-size"] = res
    names = [c[0] for c in chroms]
    lengths = [c[1] for c in chroms]
    g.create_dataset("chroms/name", data=np.array(names, dtype="S16"))
    g.create_dataset("chroms/length", data=np.array(lengths, dtype=np.int64))

    nbins_per = [int(np.ceil(l / res)) for l in lengths]
    chrom_offset = np.concatenate([[0], np.cumsum(nbins_per)])
    nbins = int(chrom_offset[-1])
    bin_chrom = np.concatenate(
        [np.full(nb, i, np.int32) for i, nb in enumerate(nbins_per)])
    bin_start = np.concatenate(
        [np.arange(nb, dtype=np.int64) * res for nb in nbins_per])
    g.create_dataset("bins/chrom", data=bin_chrom)
    g.create_dataset("bins/start", data=bin_start)
    g.create_dataset("bins/end", data=bin_start + res)
    w = np.ones(nbins) if weights is None else weights
    g.create_dataset("bins/weight", data=w)

    b1_all, b2_all, v_all = [], [], []
    for key, (x, y, v) in pixels.items():
        if isinstance(key, tuple):  # inter rectangle (x on key[0], y on key[1])
            i1, i2 = names.index(key[0]), names.index(key[1])
            assert i1 < i2, "write inter pairs in chromosome order"
        else:
            i1 = i2 = names.index(key)
        b1_all.append(np.asarray(x) + chrom_offset[i1])
        b2_all.append(np.asarray(y) + chrom_offset[i2])
        v_all.append(np.asarray(v))
    b1 = np.concatenate(b1_all).astype(np.int64)
    b2 = np.concatenate(b2_all).astype(np.int64)
    v = np.concatenate(v_all)
    order = np.lexsort((b2, b1))
    b1, b2, v = b1[order], b2[order], v[order]
    g.create_dataset("pixels/bin1_id", data=b1)
    g.create_dataset("pixels/bin2_id", data=b2)
    g.create_dataset("pixels/count", data=v.astype(np.int32))

    g.create_dataset("indexes/chrom_offset", data=chrom_offset.astype(np.int64))
    bin1_offset = np.searchsorted(b1, np.arange(nbins + 1))
    g.create_dataset("indexes/bin1_offset", data=bin1_offset.astype(np.int64))
    f.close()


@pytest.fixture
def cool_file(tmp_path):
    res = 5000
    x1, y1, v1, _ = synthetic_hic(300, 60, seed=31, n_loops=6)
    x2, y2, v2, _ = synthetic_hic(500, 60, seed=32, n_loops=8)
    path = str(tmp_path / "test.cool")
    build_cool(
        path,
        [("chr1", 500 * res), ("chr2", 300 * res), ("chrM", 16_000)],
        res,
        {"chr1": (x2, y2, v2), "chr2": (x1, y1, v1)},
    )
    return path


def test_metadata(cool_file):
    clr = CoolFile(cool_file)
    assert clr.binsize == 5000
    assert clr.chromnames == ["chr1", "chr2", "chrM"]
    assert list(clr.chromsizes) == [2_500_000, 1_500_000, 16_000]


def test_chrom_list_filters_small(cool_file):
    assert cool_chrom_list(cool_file) == ["chr1", "chr2"]


def test_fetch_band_roundtrip(cool_file):
    x0, y0, v0, _ = synthetic_hic(300, 60, seed=31, n_loops=6)
    x, y, v, res = read_cooler(cool_file, 60 * 5000, "chr2", "chr2", False)
    assert res == 5000
    got = {(a, b): c for a, b, c in zip(x, y, v)}
    want = {}
    for a, b, c in zip(x0, y0, v0):
        if b - a <= 60 and c > 0:
            want[(a, b)] = want.get((a, b), 0) + 0  # dedupe: last wins below
            want[(a, b)] = c
    # synthetic may contain duplicate keys; compare on the summed file content
    assert set(got) == set(want)


def test_distance_filter(cool_file):
    x, y, v, _ = read_cooler(cool_file, 20 * 5000, "chr2", "chr2", False)
    assert (y - x).max() <= 20


def test_balanced_weights_nan_drops(tmp_path):
    res = 5000
    x = np.array([0, 1, 2, 10])
    y = np.array([10, 11, 12, 20])
    v = np.array([4.0, 8.0, 6.0, 2.0])
    w = np.ones(100)
    w[1] = np.nan     # kills pixel (1, 11)
    w[10] = 0.5
    path = str(tmp_path / "w.cool")
    build_cool(path, [("chr1", 100 * res)], res, {"chr1": (x, y, v)}, weights=w)
    X, Y, V = CoolFile(path).fetch_band("chr1", 100 * res)
    got = {(a, b): c for a, b, c in zip(X, Y, V)}
    assert (1, 11) not in got
    assert got[(0, 10)] == 4.0 * 0.5
    assert got[(10, 20)] == 2.0 * 0.5


def test_mcool(tmp_path):
    res = 5000
    x, y, v, _ = synthetic_hic(300, 40, seed=33, n_loops=3)
    path = str(tmp_path / "multi.mcool")
    build_cool(path, [("chr1", 300 * res)], res, {"chr1": (x, y, v)},
               group="resolutions/5000")
    clr = CoolFile(path, resolution=5000)
    assert clr.binsize == 5000
    X, Y, V = read_mcooler(path, 40 * res, "chr1", "chr1", 5000, False)
    assert len(V) > 0
    with pytest.raises(ValueError):
        CoolFile(path, resolution=1000)


def test_wrong_chrom_raises(cool_file):
    with pytest.raises(NameError):
        read_cooler(cool_file, 100000, "chr9", "chr9", False)
