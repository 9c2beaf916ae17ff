#!/usr/bin/env python3
"""Batch-size experiment for the 1kb shape: B=4 (2 launches, 8 computes)
vs B=8 (1 launch, 8 computes) vs B=2/B=1. Measures detect-only time from
a device-resident normalized band. Not part of the test suite."""
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_mustache"))

import numpy as np

from bench import build_workload_1kb, _setup_jax_cache, BINS_1KB, D_PX_1KB

jax = _setup_jax_cache()

from mustache_tpu.config import DetectionConfig, chunk_grid
from mustache_tpu.detect import band_width, build_detector
from mustache_tpu.pipeline import fill_raw_band_compact
from mustache_tpu.bandnorm import (bucket_rows, normalize_band_device,
                                   pad_exceptions)

x, y, v = build_workload_1kb()
v = v.copy()
cfg = DetectionConfig(resolution=1000, distance_bp=2_000_000,
                      pt=0.1, st=0.8, precision="float32")
d_px = cfg.distance_px
n = BINS_1KB
width = cfg.chunk_size

band_shape = (bucket_rows(max(n, width)), band_width(width, d_px))
band, exc, p4 = fill_raw_band_compact(x, y, v, band_shape)
if exc is not None:
    exc = pad_exceptions(exc, band.shape[0])
band_dev, _ = normalize_band_device(band, n, cfg.resolution, d_px,
                                    exceptions=exc, packed4=p4)
band_dev.block_until_ready()

start, end = chunk_grid(n, width, d_px)
nblocks = len(start)
detector = build_detector(cfg, width)

for B in (1, 2, 4, 8):
    def run():
        outs = []
        for b0 in range(0, nblocks, B):
            idxs = list(range(b0, min(b0 + B, nblocks)))
            starts = np.asarray(
                [start[i] for i in idxs] + [-1] * (B - len(idxs)), np.int32)
            outs.append(detector.fn_band_packed(band_dev, starts))
        # force a real sync: pull one scalar from every launch's outputs
        return [float(np.asarray(o[0][0, 0])) + float(np.asarray(o[1][0, 0]))
                for o in outs]

    t0 = time.time(); s = run(); cold = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time(); s2 = run(); times.append(time.time() - t0)
        assert s2 == s
    nl = -(-nblocks // B)
    print(f"B={B}: launches={nl} computes={nl*B} cold={cold:.1f}s "
          f"warm={'/'.join(f'{t*1000:.0f}' for t in times)} ms",
          file=sys.stderr)
