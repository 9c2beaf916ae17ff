"""Native .hic reader round-trip tests (v8 and v9 writers)."""

import numpy as np
import pytest

from mustache_tpu.io.hic import HicFile, read_hic_file
from hic_writer import write_hic
from synthetic import synthetic_hic


def make_pixels(n=400, d_px=80, seed=81):
    x, y, v, _ = synthetic_hic(n, d_px, seed=seed, n_loops=5)
    v = np.round(v)  # integral counts as in raw .hic observed matrices
    keep = v > 0
    return x[keep], y[keep], v[keep]


@pytest.mark.parametrize("version", [8, 9])
def test_header_roundtrip(tmp_path, version):
    x, y, v = make_pixels()
    path = str(tmp_path / f"t{version}.hic")
    write_hic(path, [("chr1", 400 * 5000), ("chr2", 250 * 5000)], 5000,
              {"chr1": (x, y, v)}, version=version)
    hic = HicFile(path)
    assert hic.version == version
    assert [c.name for c in hic.chromosomes] == ["All", "chr1", "chr2"]
    assert hic.chromosomes[1].length == 400 * 5000
    assert hic.resolutions == [5000]
    assert hic.genome == "testgenome"


@pytest.mark.parametrize("version", [6, 7, 8, 9])
@pytest.mark.parametrize("short_counts", [False, True])
def test_fetch_roundtrip(tmp_path, version, short_counts):
    x, y, v = make_pixels()
    path = str(tmp_path / "t.hic")
    write_hic(path, [("chr1", 400 * 5000)], 5000, {"chr1": (x, y, v)},
              version=version, use_short_counts=short_counts)
    hic = HicFile(path)
    assert hic.version == version
    X, Y, V = hic.fetch_chromosome("chr1", 5000)
    got = {(a, b): c for a, b, c in zip(X, Y, V)}
    want = {(a, b): c for a, b, c in zip(x, y, v)}
    assert got == want


def test_fetch_with_norm_vector(tmp_path):
    x = np.array([10, 11, 40]); y = np.array([20, 30, 90])
    v = np.array([10.0, 20.0, 30.0])
    w = np.ones(400); w[10] = 2.0; w[20] = 4.0; w[40] = np.nan
    path = str(tmp_path / "n.hic")
    write_hic(path, [("chr1", 400 * 5000)], 5000, {"chr1": (x, y, v)},
              norms={("KR", "chr1"): w})
    hic = HicFile(path)
    X, Y, V = hic.fetch_chromosome("chr1", 5000, norm="KR")
    got = {(a, b): c for a, b, c in zip(X, Y, V)}
    assert got[(10, 20)] == 10.0 / (2.0 * 4.0)
    assert got[(11, 30)] == 20.0
    assert np.isnan(got[(40, 90)])          # NaN factor propagates


def test_read_hic_file_reference_shape(tmp_path):
    x, y, v = make_pixels()
    w = np.ones(400)
    path = str(tmp_path / "r.hic")
    write_hic(path, [("chr21", 400 * 5000)], 5000, {"chr21": (x, y, v)},
              norms={("KR", "chr21"): w})
    X, Y, V = read_hic_file(path, False, False, 50 * 5000, "21", "21", 5000)
    assert len(V) > 0
    assert (np.abs(X - Y) <= 50).all()       # band filter applied
    assert (V > 0).all()
    # default norm is KR (mustache.py:328); missing norm must raise
    with pytest.raises(ValueError):
        read_hic_file(path, "VC", False, 50 * 5000, "21", "21", 5000)


def test_missing_chromosome_raises(tmp_path):
    x, y, v = make_pixels()
    path = str(tmp_path / "m.hic")
    write_hic(path, [("chr1", 400 * 5000)], 5000, {"chr1": (x, y, v)})
    with pytest.raises(NameError):
        HicFile(path).fetch_chromosome("chr9", 5000)


def test_bad_magic(tmp_path):
    p = tmp_path / "x.hic"
    p.write_bytes(b"NOPE" + b"\0" * 100)
    with pytest.raises(ValueError):
        HicFile(str(p))


@pytest.mark.parametrize("version", [7, 8])
@pytest.mark.parametrize("float_counts", [False, True])
def test_v8_count_flag_polarity(tmp_path, version, float_counts):
    """Byte-level spec test, independent of the test writer: the v7/v8
    count-type byte uses the straw polarity (useShort = byte == 0, i.e.
    byte 1 means float32 counts)."""
    import struct
    import types
    import zlib
    from mustache_tpu.io.hic import _BlockEntry

    payload = bytearray()
    payload += struct.pack("<i", 2)          # record count
    payload += struct.pack("<ii", 100, 200)  # binX/binY offsets
    payload += struct.pack("<b", 1 if float_counts else 0)
    payload += struct.pack("<b", 1)          # matrix type: row list
    payload += struct.pack("<h", 1)          # one row
    payload += struct.pack("<h", 7)          # row y = 207
    payload += struct.pack("<h", 2)          # two cols
    cfmt = "<f" if float_counts else "<h"
    payload += struct.pack("<h", 3) + struct.pack(cfmt, 5)   # x=103, v=5
    payload += struct.pack("<h", 9) + struct.pack(cfmt, 11)  # x=109, v=11
    comp = zlib.compress(bytes(payload))
    p = tmp_path / "block.bin"
    p.write_bytes(comp)

    fake = types.SimpleNamespace(f=open(p, "rb"), version=version)
    bx, by, bv = HicFile._decode_block(fake, _BlockEntry(0, 0, len(comp)))
    fake.f.close()
    assert list(bx) == [103, 109]
    assert list(by) == [207, 207]
    assert list(bv) == [5.0, 11.0]

    # the native decoder must agree byte for byte
    from mustache_tpu.io import native
    if native.available():
        nx, ny, nv = native.decode_hic_blocks(
            str(p), np.array([0], np.int64),
            np.array([len(comp)], np.int32), version)
        assert list(nx) == [103, 109]
        assert list(ny) == [207, 207]
        assert list(nv) == [5.0, 11.0]


@pytest.mark.parametrize("version", [6, 8, 9])
def test_band_culling_equivalence(tmp_path, version):
    """Band-culled fetch must contain every in-band record of the full
    fetch, while decoding strictly fewer blocks (mustache.py:319-363 only
    ever touches near-band data)."""
    from mustache_tpu.io.hic import cull_band_blocks

    n, d_full = 400, 300
    x, y, v = make_pixels(n=n, d_px=d_full, seed=87)
    path = str(tmp_path / "c.hic")
    write_hic(path, [("chr1", n * 5000)], 5000, {"chr1": (x, y, v)},
              version=version, block_bins=32)
    hic = HicFile(path)
    d_band = 50
    Xf, Yf, Vf = hic.fetch_chromosome("chr1", 5000)
    Xc, Yc, Vc = hic.fetch_chromosome("chr1", 5000, distance_bins=d_band)
    keep = np.abs(Xf - Yf) <= d_band
    want = {(a, b): c for a, b, c in zip(Xf[keep], Yf[keep], Vf[keep])}
    got = {(a, b): c for a, b, c in
           zip(Xc, Yc, Vc) if abs(a - b) <= d_band}
    assert got == want
    # culling must actually drop far blocks
    zoom = hic._matrix_zoom(1, 1, "BP", 5000)
    culled = cull_band_blocks(zoom.blocks, zoom, version, d_band)
    assert 0 < len(culled) < len(zoom.blocks)


def test_read_hic_file_band_culled_matches_full(tmp_path):
    """The reference-shaped entry point returns identical triplets whether
    or not far blocks were decoded (the band filter is authoritative)."""
    n = 400
    x, y, v = make_pixels(n=n, d_px=300, seed=88)
    w = np.ones(n)
    path = str(tmp_path / "rc.hic")
    write_hic(path, [("chr21", n * 5000)], 5000, {"chr21": (x, y, v)},
              norms={("KR", "chr21"): w}, block_bins=32)
    X, Y, V = read_hic_file(path, False, False, 40 * 5000, "21", "21", 5000)
    hic = HicFile(path)
    Xf, Yf, Vf = hic.fetch_chromosome("chr21", 5000, norm="KR")
    keep = (np.abs(Xf - Yf) <= 40) & (Vf > 0) & ~np.isnan(Vf)
    assert {(a, b, c) for a, b, c in zip(X, Y, V)} == \
           {(a, b, c) for a, b, c in zip(Xf[keep], Yf[keep], Vf[keep])}


def test_truncated_header(tmp_path):
    x, y, v = make_pixels()
    path = str(tmp_path / "th.hic")
    write_hic(path, [("chr1", 400 * 5000)], 5000, {"chr1": (x, y, v)})
    blob = open(path, "rb").read()
    p = tmp_path / "trunc.hic"
    p.write_bytes(blob[:30])                 # cut inside the header
    with pytest.raises(ValueError):
        HicFile(str(p))


def test_truncated_footer(tmp_path):
    x, y, v = make_pixels()
    path = str(tmp_path / "tf.hic")
    write_hic(path, [("chr1", 400 * 5000)], 5000, {"chr1": (x, y, v)})
    blob = open(path, "rb").read()
    p = tmp_path / "trunc.hic"
    p.write_bytes(blob[:-20])                # cut inside the footer
    hic = HicFile(str(p))
    with pytest.raises(IOError):
        hic.fetch_chromosome("chr1", 5000)


def test_corrupt_block_stream(tmp_path):
    """Flipping bytes inside a compressed block must raise a clean IOError
    from both the pure-Python and native decode paths, not emit garbage."""
    x, y, v = make_pixels()
    path = str(tmp_path / "cb.hic")
    write_hic(path, [("chr1", 400 * 5000)], 5000, {"chr1": (x, y, v)})
    hic = HicFile(path)
    zoom = hic._matrix_zoom(1, 1, "BP", 5000)
    entry = zoom.blocks[0]
    blob = bytearray(open(path, "rb").read())
    for i in range(entry.position + 4, entry.position + entry.size):
        blob[i] ^= 0xFF
    p = tmp_path / "corrupt.hic"
    p.write_bytes(bytes(blob))
    with pytest.raises(IOError):
        HicFile(str(p)).fetch_chromosome("chr1", 5000)
    from mustache_tpu.io import native
    if native.available():
        with pytest.raises(IOError):
            native.decode_hic_blocks(
                str(p), np.array([entry.position], np.int64),
                np.array([entry.size], np.int32), 8)


@pytest.mark.parametrize("short_counts", [False, True])
@pytest.mark.parametrize("big_bins", [False, True])
def test_v9_dense_block_roundtrip(tmp_path, short_counts, big_bins):
    """Dense (type 2) blocks: per straw the width field is int16 even when
    useIntXPos widens the bin offsets — a wider read desynchronizes the
    whole record stream."""
    rng = np.random.default_rng(5)
    base = 30500 if big_bins else 100   # >30000 triggers useIntXPos
    x = base + rng.integers(0, 60, 300).astype(np.int64)
    y = x + rng.integers(0, 40, 300).astype(np.int64)
    v = rng.integers(1, 200, 300).astype(np.float64)
    keep = np.unique(x * 100000 + y, return_index=True)[1]
    x, y, v = x[keep], y[keep], v[keep]
    path = str(tmp_path / "dense.hic")
    write_hic(path, [("chr1", int(y.max() + 10) * 1000)], 1000,
              {"chr1": (x, y, v)}, version=9,
              use_short_counts=short_counts, dense_blocks=True)
    hic = HicFile(path)
    X, Y, V = hic.fetch_chromosome("chr1", 1000)
    got = {(a, b): c for a, b, c in zip(X, Y, V)}
    want = {(a, b): c for a, b, c in zip(x, y, v)}
    assert got == want
