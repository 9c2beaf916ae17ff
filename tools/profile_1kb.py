#!/usr/bin/env python3
"""One-off phase profiler for the 1kb Micro-C shape (bench workload 2).

Times each phase of detect_loops_coo separately on the real backend:
  host band fill / H2D / device normalize / per-launch detect /
  D2H / host finish.  Not part of the test suite.
"""
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_mustache"))

import numpy as np

from bench import build_workload_1kb, _setup_jax_cache, BINS_1KB

jax = _setup_jax_cache()

from mustache_tpu.config import DetectionConfig, chunk_grid, block_mask_sizes
from mustache_tpu.detect import band_width, build_detector, finish_block, unpack_block
from mustache_tpu.pipeline import fill_raw_band_compact, _auto_batch
from mustache_tpu.bandnorm import (bucket_rows, normalize_band_device,
                                   pad_exceptions)

x, y, v = build_workload_1kb()
v = v.copy()
cfg = DetectionConfig(resolution=1000, distance_bp=2_000_000,
                      pt=0.1, st=0.8, precision="float32")
d_px = cfg.distance_px
n = BINS_1KB
width = cfg.chunk_size
print(f"n={n} d_px={d_px} chunk={width} nnz={len(v)}", file=sys.stderr)


def t(label, fn, *a, **kw):
    t0 = time.time()
    out = fn(*a, **kw)
    dt = time.time() - t0
    print(f"{label:34s} {dt*1000:9.1f} ms", file=sys.stderr)
    return out, dt


REPS = 3
for rep in range(REPS):
    print(f"--- rep {rep} ---", file=sys.stderr)
    total0 = time.time()
    band_shape = (bucket_rows(max(n, width)), band_width(width, d_px))
    (band, exc, p4), _ = t("host fill_raw_band_compact",
                           fill_raw_band_compact, x, y, v, band_shape)
    print(f"  band {band.shape} {band.dtype} "
          f"{band.nbytes/1e6:.1f} MB exc={0 if exc is None else len(exc[0])}",
          file=sys.stderr)
    if exc is not None:
        exc = pad_exceptions(exc, band.shape[0])

    def normf():
        bd, _ = normalize_band_device(band, n, cfg.resolution, d_px,
                                      exceptions=exc, packed4=p4)
        bd.block_until_ready()
        return bd
    band_dev, _ = t("H2D + device normalize", normf)

    start, end = chunk_grid(n, width, d_px)
    masks = block_mask_sizes(start, end, d_px)
    nblocks = len(start)
    B = _auto_batch(width, cfg, jax.default_backend(), nblocks)
    print(f"  nblocks={nblocks} B={B}", file=sys.stderr)
    detector, _ = t("build_detector", build_detector, cfg, width)

    cap = B
    def pack_starts(idxs):
        # pad slots carry -1 like the pipeline: the fused kernel skips
        # their compute (pipeline.pack_starts)
        return np.asarray([start[i] for i in idxs] + [-1] * (cap - len(idxs)),
                          np.int32)

    launches = []
    det_total = d2h_total = fin_total = 0.0
    for b0 in range(0, nblocks, B):
        idxs = list(range(b0, min(b0 + B, nblocks)))
        t0 = time.time()
        out = detector.fn_band_packed(band_dev, pack_starts(idxs))
        jax.block_until_ready(out)
        det_total += time.time() - t0
        t0 = time.time()
        fh, ih = np.asarray(out[0]), np.asarray(out[1])
        d2h_total += time.time() - t0
        t0 = time.time()
        nloops = 0
        for bi, i in enumerate(idxs):
            block_out = unpack_block(detector.out_spec, fh[bi], ih[bi])
            rows = finish_block(block_out, block_index=i, start=start[i],
                                cfg=cfg, spec=detector.spec)
            mask = masks[i]
            nloops += sum(1 for r in rows
                          if r[0] >= start[i] + mask or r[1] >= start[i] + mask)
        fin_total += time.time() - t0
    print(f"{'device detect (all launches)':34s} {det_total*1000:9.1f} ms",
          file=sys.stderr)
    print(f"{'D2H (all launches)':34s} {d2h_total*1000:9.1f} ms",
          file=sys.stderr)
    print(f"{'host finish (all launches)':34s} {fin_total*1000:9.1f} ms",
          file=sys.stderr)
    total = time.time() - total0
    mb = BINS_1KB * cfg.resolution / 1e6
    print(f"{'TOTAL':34s} {total*1000:9.1f} ms  -> "
          f"{mb/total:.2f} Mb/s (sequential-phase bound)", file=sys.stderr)
