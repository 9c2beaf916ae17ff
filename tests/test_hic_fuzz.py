"""Differential fuzz: pure-Python vs native C++ .hic block decoders.

The two decoders share no code (``io/hic.py HicFile._decode_block`` vs
``io/native/hic_decode.cpp``), so randomized agreement across
version x layout x count-type is a cross-implementation check that can
catch symmetric format misunderstandings the same-writer round-trip
tests cannot (reference decode oracle: mustache.py:300-396 via
hicstraw). Truncation fuzz additionally pins the robustness contract:
at EVERY payload byte boundary both decoders either fail cleanly
(IOError/ValueError) or succeed with identical triplets — never
garbage, never a crash.
"""

import struct
import zlib

import numpy as np
import pytest

from mustache_tpu.io import native
from mustache_tpu.io.hic import HicFile
from hic_writer import write_hic


def _rand_pixels(rng, *, big_bins, short_counts, float_counts):
    n = int(rng.integers(40, 400))
    d = int(rng.integers(5, max(6, n // 2)))
    base = 30500 if big_bins else int(rng.integers(0, 50))
    x = base + rng.integers(0, n, n * 3).astype(np.int64)
    y = x + rng.integers(0, d, n * 3).astype(np.int64)
    keep = np.unique(x * (1 << 22) + y, return_index=True)[1]
    x, y = x[keep], y[keep]
    if short_counts:
        v = rng.integers(1, 30000, len(x)).astype(np.float64)
    else:
        v = rng.integers(1, 1 << 20, len(x)).astype(np.float64)
        if float_counts:
            v += np.round(rng.random(len(x)), 3)  # f32-exact fractions
    return x, y, v


def _decode_both(hic, path):
    """(python triplets, native triplets) over every block of the only
    matrix, order-insensitive."""
    zoom = hic._matrix_zoom(1, 1, "BP", hic.resolutions[0])
    px, py, pv = [], [], []
    for entry in zoom.blocks:
        bx, by, bv = HicFile._decode_block(hic, entry)
        px.append(bx); py.append(by); pv.append(bv)
    p = (np.concatenate(px), np.concatenate(py), np.concatenate(pv))
    nat = native.decode_hic_blocks(
        path, np.array([e.position for e in zoom.blocks], np.int64),
        np.array([e.size for e in zoom.blocks], np.int32), hic.version)
    return p, nat


def _as_set(t):
    return {(int(a), int(b), float(c)) for a, b, c in zip(*t)}


@pytest.mark.parametrize("trial", range(16))
def test_decoder_differential_fuzz(tmp_path, trial):
    """Random writer output: the Python and C++ decoders must agree with
    each other AND with the written pixels, across every combination of
    version, block layout, count encoding, and bin magnitude."""
    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(1000 + trial)
    version = int(rng.choice([6, 7, 8, 9]))
    dense = version >= 9 and bool(rng.integers(0, 2))
    short_counts = bool(rng.integers(0, 2))
    float_counts = not short_counts and bool(rng.integers(0, 2))
    big_bins = bool(rng.integers(0, 2))
    block_bins = int(rng.choice([16, 64, 512]))

    x, y, v = _rand_pixels(rng, big_bins=big_bins,
                           short_counts=short_counts,
                           float_counts=float_counts)
    res = 1000
    path = str(tmp_path / f"f{trial}.hic")
    write_hic(path, [("chr1", int(y.max() + 10) * res)], res,
              {"chr1": (x, y, v)}, version=version,
              use_short_counts=short_counts, block_bins=block_bins,
              dense_blocks=dense)

    hic = HicFile(path)
    try:
        p, nat = _decode_both(hic, path)
    finally:
        hic.close()
    assert nat is not None
    want = {(int(a), int(b), float(np.float32(c)) if float_counts else
             float(c)) for a, b, c in zip(x, y, v)}
    assert _as_set(p) == want, f"python decoder disagrees (trial {trial})"
    assert _as_set(nat) == want, f"native decoder disagrees (trial {trial})"


def _payload_cases():
    """Small handcrafted-ish payload cases spanning the decode grammar:
    (version, dense, short_counts, big_bins)."""
    return [
        (6, False, False, False),
        (7, False, True, False),
        (8, False, False, False),
        (8, False, True, False),
        (9, False, True, False),
        (9, False, False, True),
        (9, True, True, False),
        (9, True, False, True),
    ]


@pytest.mark.parametrize("version,dense,short,big", _payload_cases())
def test_block_truncation_fuzz(tmp_path, version, dense, short, big):
    """Cut the decompressed record stream at EVERY byte boundary,
    recompress, and feed both decoders: each cut must either fail cleanly
    in both or succeed in both with identical triplets."""
    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(version * 7 + dense * 3 + short)
    x, y, v = _rand_pixels(rng, big_bins=big, short_counts=short,
                           float_counts=not short)
    x, y, v = x[:25], y[:25], v[:25]  # small payload: every-byte scan
    res = 1000
    path = str(tmp_path / "t.hic")
    write_hic(path, [("chr1", int(y.max() + 10) * res)], res,
              {"chr1": (x, y, v)}, version=version, use_short_counts=short,
              dense_blocks=dense)
    hic = HicFile(path)
    zoom = hic._matrix_zoom(1, 1, "BP", res)
    entry = zoom.blocks[0]
    hic.f.seek(entry.position)
    payload = zlib.decompress(hic.f.read(entry.size))
    hic.close()

    import types
    blob = tmp_path / "cut.bin"
    disagreements = []
    for cut in range(len(payload) + 1):
        comp = zlib.compress(payload[:cut])
        blob.write_bytes(comp)

        fake = types.SimpleNamespace(f=open(blob, "rb"), version=version)
        p_res, p_err = None, None
        try:
            from mustache_tpu.io.hic import _BlockEntry
            p_res = HicFile._decode_block(fake, _BlockEntry(0, 0, len(comp)))
        except (IOError, ValueError) as e:
            p_err = e
        finally:
            fake.f.close()

        n_res, n_err = None, None
        try:
            n_res = native.decode_hic_blocks(
                str(blob), np.array([0], np.int64),
                np.array([len(comp)], np.int32), version)
        except (IOError, ValueError) as e:
            n_err = e

        if (p_err is None) != (n_err is None):
            disagreements.append(
                (cut, "py" if p_err else "native", str(p_err or n_err)))
        elif p_err is None and _as_set(p_res) != _as_set(n_res):
            disagreements.append((cut, "values", None))
    assert not disagreements, disagreements[:10]


def test_index_position_fuzz(tmp_path):
    """Corrupt block-index positions/sizes (pointing past EOF, negative,
    zero-length) must raise cleanly from both decoders."""
    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(9)
    x, y, v = _rand_pixels(rng, big_bins=False, short_counts=True,
                           float_counts=False)
    path = str(tmp_path / "i.hic")
    write_hic(path, [("chr1", int(y.max() + 10) * 1000)], 1000,
              {"chr1": (x, y, v)})
    size = len(open(path, "rb").read())
    for pos, sz in [(size + 100, 64), (size - 4, 4096), (0, 0)]:
        from mustache_tpu.io.hic import _BlockEntry
        hic = HicFile(path)
        with pytest.raises((IOError, ValueError)):
            HicFile._decode_block(hic, _BlockEntry(0, pos, sz))
        hic.close()
        with pytest.raises((IOError, ValueError)):
            native.decode_hic_blocks(path, np.array([pos], np.int64),
                                     np.array([sz], np.int32), 8)
