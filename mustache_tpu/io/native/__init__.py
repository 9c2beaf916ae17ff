"""ctypes bindings for the native ingest components.

Loads ``libmtpu_hic.so`` (built by the Makefile in this directory); if the
library is missing, attempts a one-shot ``make`` with the system compiler,
and otherwise reports unavailability so callers fall back to the pure
Python decoders.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(__file__)
_LIB_PATH = os.path.join(_DIR, "libmtpu_hic.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    stale = not os.path.exists(_LIB_PATH)
    if not stale:
        # rebuild when any source is newer than the library (cheap stats;
        # keeps an old .so from shadowing newly added entry points); a file
        # vanishing mid-scan (concurrent rebuild/clean) counts as not-stale
        try:
            lib_mtime = os.path.getmtime(_LIB_PATH)
            stale = any(
                f.endswith((".cpp", ".h")) and
                os.path.getmtime(os.path.join(_DIR, f)) > lib_mtime
                for f in os.listdir(_DIR))
        except OSError:
            stale = False
    if stale:
        try:
            subprocess.run(["make", "-C", _DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            if not os.path.exists(_LIB_PATH):
                return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.mtpu_decode_hic_blocks.restype = ctypes.c_int
    lib.mtpu_decode_hic_blocks.argtypes = [
        ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_int32,
        ctypes.c_int32,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.mtpu_normalize_coo.restype = ctypes.c_int
    lib.mtpu_normalize_coo.argtypes = [
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.c_int32,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_void_p,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int32,
    ]
    lib.mtpu_fill_band.restype = ctypes.c_int
    lib.mtpu_fill_band.argtypes = [
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.c_int32,
        ctypes.c_void_p,
        ctypes.c_int32,
        ctypes.c_int64,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int32,
    ]
    try:
        lib.mtpu_fill_band_u16.restype = ctypes.c_int
        lib.mtpu_fill_band_u16.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int32,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int32,
        ]
        lib.mtpu_values_fit_u16.restype = ctypes.c_int
        lib.mtpu_values_fit_u16.argtypes = [
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            ctypes.c_int32,
        ]
    except AttributeError:
        # stale .so from before the u16 path existed: trigger a rebuild
        # next interpreter, keep the f32 path this run
        lib._mtpu_no_u16 = True
    try:
        lib.mtpu_classify_values.restype = ctypes.c_int
        lib.mtpu_classify_values.argtypes = [
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            ctypes.c_int32,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        ]
        lib.mtpu_fill_band_compact.restype = ctypes.c_int
        lib.mtpu_fill_band_compact.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int32,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            ctypes.c_void_p,
            ctypes.c_int32,
            ctypes.c_int64,
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            ctypes.c_int32,
        ]
    except AttributeError:
        # stale .so from before the compact path existed
        lib._mtpu_no_compact = True
    try:
        lib.mtpu_classify_values4.restype = ctypes.c_int
        lib.mtpu_classify_values4.argtypes = [
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            ctypes.c_int32,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        ]
        lib.mtpu_pack_band4.restype = ctypes.c_int
        lib.mtpu_pack_band4.argtypes = [
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            ctypes.c_int32,
        ]
        lib.mtpu_fill_band_compact_range.restype = ctypes.c_int
        lib.mtpu_fill_band_compact_range.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int32,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            ctypes.c_void_p,
            ctypes.c_int32,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            ctypes.c_int32,
        ]
    except AttributeError:
        # stale .so from before the nibble-packed path existed
        lib._mtpu_no_pack4 = True
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def decode_hic_blocks(path: str, positions: np.ndarray, sizes: np.ndarray,
                      version: int):
    """Decode .hic blocks natively; returns (x, y, v) or None if the native
    library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    positions = np.ascontiguousarray(positions, np.int64)
    sizes = np.ascontiguousarray(sizes, np.int32)
    capacity = max(int(sizes.sum()) * 2, 1 << 16)
    for _ in range(4):
        x = np.empty(capacity, np.int64)
        y = np.empty(capacity, np.int64)
        v = np.empty(capacity, np.float64)
        count = ctypes.c_int64(0)
        rc = lib.mtpu_decode_hic_blocks(
            path.encode(), positions, sizes, len(sizes), version,
            x, y, v, capacity, ctypes.byref(count))
        if rc == 0:
            n = count.value
            return x[:n], y[:n], v[:n]
        if rc == -4:
            capacity = int(count.value * 1.2) + 1024
            continue
        raise IOError(f"native .hic decode failed (rc={rc}) for {path}")
    raise IOError(f"native .hic decode: capacity retry exhausted for {path}")


def normalize_coo(x, y, v, n_bins, Dv, F, band_out=None, n_threads=8):
    """One-call local-regime normalize: mutates ``v`` (float64, C-contiguous)
    in place, optionally fills a zeroed f32 band buffer
    ``band_out[x, y-x] = z``, and returns ``(weights, n_skipped)`` — or
    None when the native library is unavailable. ``n_skipped`` counts
    entries with ``y-x >= Dv``, which are left untouched (and not written
    to the band)."""
    lib = _load()
    if lib is None:
        return None
    assert v.dtype == np.float64 and v.flags.c_contiguous
    weights = np.empty(Dv, np.float64)
    if band_out is None:
        bptr, ldb = None, 0
    else:
        assert band_out.dtype == np.float32 and band_out.flags.c_contiguous
        bptr = band_out.ctypes.data_as(ctypes.c_void_p)
        ldb = band_out.shape[1]
    skipped = ctypes.c_int64(0)
    rc = lib.mtpu_normalize_coo(
        np.ascontiguousarray(x, np.int64),
        np.ascontiguousarray(y, np.int64),
        v, len(v), int(n_bins), int(Dv), int(F), weights, bptr, ldb,
        ctypes.byref(skipped), int(n_threads))
    if rc != 0:
        raise RuntimeError(f"native normalize_coo failed (rc={rc})")
    return weights, skipped.value


def fill_band(x, y, v, band_out, n_threads=8) -> bool:
    """Scatter-fill ``band_out[x, y-x] = v`` (entries outside the band or
    row range skipped) in one threaded native pass. Returns False when the
    native library is unavailable (caller falls back to numpy). ``x``/``y``
    must share an int32 or int64 dtype, ``v`` float32 or float64; all
    C-contiguous (the hot callers already satisfy this — no copies here)."""
    lib = _load()
    if lib is None:
        return False
    if (x.dtype != y.dtype or x.dtype not in (np.int32, np.int64)
            or v.dtype not in (np.float32, np.float64)
            or band_out.dtype != np.float32
            or not (x.flags.c_contiguous and y.flags.c_contiguous
                    and v.flags.c_contiguous and band_out.flags.c_contiguous)):
        return False
    rc = lib.mtpu_fill_band(
        x.ctypes.data_as(ctypes.c_void_p), y.ctypes.data_as(ctypes.c_void_p),
        1 if x.dtype == np.int64 else 0,
        v.ctypes.data_as(ctypes.c_void_p),
        1 if v.dtype == np.float64 else 0,
        len(v), band_out, band_out.shape[0], band_out.shape[1],
        int(n_threads))
    if rc != 0:
        raise RuntimeError(f"native fill_band failed (rc={rc})")
    return True


def values_fit_u16(v, n_threads=8):
    """True when every value is a non-negative integer < 65536 (raw count
    data) — the gate for the half-width uint16 band transfer. Returns None
    when the native library is unavailable (caller decides via numpy)."""
    lib = _load()
    if lib is None or getattr(lib, "_mtpu_no_u16", False):
        return None
    if v.dtype != np.float64 or not v.flags.c_contiguous:
        return None
    return bool(lib.mtpu_values_fit_u16(v, len(v), int(n_threads)))


def fill_band_u16(x, y, v, band_out, n_threads=8) -> bool:
    """uint16 twin of :func:`fill_band` (band_out dtype uint16); the caller
    must have established eligibility with :func:`values_fit_u16`."""
    lib = _load()
    if lib is None or getattr(lib, "_mtpu_no_u16", False):
        return False
    if (x.dtype != y.dtype or x.dtype not in (np.int32, np.int64)
            or v.dtype != np.float64 or band_out.dtype != np.uint16
            or not (x.flags.c_contiguous and y.flags.c_contiguous
                    and v.flags.c_contiguous and band_out.flags.c_contiguous)):
        return False
    rc = lib.mtpu_fill_band_u16(
        x.ctypes.data_as(ctypes.c_void_p), y.ctypes.data_as(ctypes.c_void_p),
        1 if x.dtype == np.int64 else 0,
        v, len(v), band_out, band_out.shape[0], band_out.shape[1],
        int(n_threads))
    if rc != 0:
        raise RuntimeError(f"native fill_band_u16 failed (rc={rc})")
    return True


def classify_values(v, n_threads=8):
    """Exception census for the compact band transfer: (misfit_u8,
    misfit_u16) counts of values that are not non-negative integers below
    256 / 65536. None when the native library (or this entry point) is
    unavailable."""
    lib = _load()
    if lib is None or getattr(lib, "_mtpu_no_compact", False):
        return None
    if v.dtype != np.float64 or not v.flags.c_contiguous:
        return None
    out = np.zeros(2, np.int64)
    if lib.mtpu_classify_values(v, len(v), int(n_threads), out) != 0:
        return None
    return int(out[0]), int(out[1])


def classify_values4(v, n_threads=8):
    """4-bit census: count of values not exactly representable as a 4-bit
    count (non-negative integers below 16). None when the native library
    (or this entry point) is unavailable."""
    lib = _load()
    if lib is None or getattr(lib, "_mtpu_no_pack4", False):
        return None
    if v.dtype != np.float64 or not v.flags.c_contiguous:
        return None
    out = np.zeros(1, np.int64)
    if lib.mtpu_classify_values4(v, len(v), int(n_threads), out) != 0:
        return None
    return int(out[0])


def fill_band_compact_range(x, y, v, slab, g0, g1, exc_cap, n_threads=8):
    """Row-windowed compact fill for slab-streamed H2D overlap: fill ONLY
    global rows [g0, g1) into ``slab`` (whose row 0 is global row g0).
    Exception rows come back as GLOBAL indices. Returns the exception
    triple or None when unavailable / overflowing."""
    lib = _load()
    if lib is None or getattr(lib, "_mtpu_no_pack4", False):
        return None
    if (x.dtype != y.dtype or x.dtype not in (np.int32, np.int64)
            or v.dtype != np.float64
            or slab.dtype not in (np.uint8, np.uint16)
            or not (x.flags.c_contiguous and y.flags.c_contiguous
                    and v.flags.c_contiguous and slab.flags.c_contiguous)):
        return None
    cap = max(int(exc_cap), 1)
    er = np.empty(cap, np.int32)
    ec = np.empty(cap, np.int32)
    ev = np.empty(cap, np.float32)
    n = lib.mtpu_fill_band_compact_range(
        x.ctypes.data_as(ctypes.c_void_p), y.ctypes.data_as(ctypes.c_void_p),
        1 if x.dtype == np.int64 else 0,
        v, len(v), slab.ctypes.data_as(ctypes.c_void_p),
        1 if slab.dtype == np.uint16 else 0,
        int(g0), int(g1), slab.shape[1], er, ec, ev, cap, int(n_threads))
    if n < 0:
        return None
    return er[:n], ec[:n], ev[:n]


def pack_band4(band, exc_cap, n_threads=8):
    """Nibble-pack a filled uint8 band (two counts per byte, even column in
    the low nibble). In-band values >= 16 come back as an exception triple
    (packed as 0 in the output). Returns ``(packed, (rows, cols, values))``
    or None when the native path is unavailable or exc_cap overflows."""
    lib = _load()
    if lib is None or getattr(lib, "_mtpu_no_pack4", False):
        return None
    if (band.dtype != np.uint8 or band.ndim != 2 or band.shape[1] % 2
            or not band.flags.c_contiguous):
        return None
    rows, ldb = band.shape
    packed = np.empty((rows, ldb // 2), np.uint8)
    cap = max(int(exc_cap), 1)
    er = np.empty(cap, np.int32)
    ec = np.empty(cap, np.int32)
    ev = np.empty(cap, np.float32)
    n = lib.mtpu_pack_band4(band, rows, ldb, packed, er, ec, ev, cap,
                            int(n_threads))
    if n < 0:
        return None
    return packed, (er[:n], ec[:n], ev[:n])


def fill_band_compact(x, y, v, band_out, exc_cap, n_threads=8):
    """Narrow-band fill with an exception list: integer-fitting values land
    in ``band_out`` (uint8 or uint16), misfits come back as
    ``(rows, cols, f32 values)`` for a device-side scatter over the widened
    band. Returns the exception arrays (trimmed to the actual count) or
    None when the native path is unavailable or ``exc_cap`` overflows.
    Requires unique (x, y) pairs (the ingest-path invariant)."""
    lib = _load()
    if lib is None or getattr(lib, "_mtpu_no_compact", False):
        return None
    if (x.dtype != y.dtype or x.dtype not in (np.int32, np.int64)
            or v.dtype != np.float64
            or band_out.dtype not in (np.uint8, np.uint16)
            or not (x.flags.c_contiguous and y.flags.c_contiguous
                    and v.flags.c_contiguous and band_out.flags.c_contiguous)):
        return None
    exc_cap = max(int(exc_cap), 1)
    exc_r = np.empty(exc_cap, np.int32)
    exc_c = np.empty(exc_cap, np.int32)
    exc_v = np.empty(exc_cap, np.float32)
    n_exc = lib.mtpu_fill_band_compact(
        x.ctypes.data_as(ctypes.c_void_p), y.ctypes.data_as(ctypes.c_void_p),
        1 if x.dtype == np.int64 else 0,
        v, len(v),
        band_out.ctypes.data_as(ctypes.c_void_p),
        1 if band_out.dtype == np.uint16 else 0,
        band_out.shape[0], band_out.shape[1],
        exc_r, exc_c, exc_v, exc_cap, int(n_threads))
    if n_exc < 0:
        return None
    return exc_r[:n_exc], exc_c[:n_exc], exc_v[:n_exc]
