#!/usr/bin/env python3
"""Benchmark: chr21-scale 5kb loop calling, end to end.

Prints ONE JSON line:
  {"metric": "chr21_5kb_Mb_per_s", "value": <float>, "unit": "Mb/s",
   "vs_baseline": <float>}

The workload is a deterministic synthetic chr21 (9,629 bins at 5kb, 2Mb
band, ~3.4M contacts — the shape of the reference's bundled golden data,
whose raw blob is stripped from this mount). "value" is genome megabases
processed per second by the full pipeline (normalize + densify + device
detection + host clustering), excluding compile time. The baseline is the
same algorithm run through the scipy oracle pipeline (the reference's
compute path: C gaussian_filter/maximum_filter + BH), measured once on this
machine and cached in BENCH_BASELINE.json; vs_baseline = value / baseline.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))

import numpy as np


CHR21_BINS = 9629          # data/chr21_5kb.KRnorm: 48.145 Mb at 5kb
CHR21_MB = 48.145
D_PX = 400                 # 2 Mb band at 5kb
BASELINE_FILE = os.path.join(os.path.dirname(__file__), "BENCH_BASELINE.json")


def build_workload():
    from synthetic import synthetic_hic

    x, y, v, _ = synthetic_hic(CHR21_BINS, D_PX, seed=2021, n_loops=300,
                               loop_strength=3.0)
    return x, y, v


def run_engine(x, y, v, cfg):
    from mustache_tpu.pipeline import detect_loops_coo

    return detect_loops_coo(x.copy(), y.copy(), v.copy(), cfg)


def measure_engine():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/jax_mustache"))
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass

    from mustache_tpu.config import DetectionConfig

    cfg = DetectionConfig(resolution=5000, distance_bp=2_000_000,
                          pt=0.1, st=0.8, precision="float32")
    x, y, v = build_workload()

    t0 = time.time()
    loops = run_engine(x, y, v, cfg)        # includes compile
    cold = time.time() - t0
    warms = []
    for _ in range(3):                       # tunneled-TPU latency is noisy
        t0 = time.time()
        loops = run_engine(x, y, v, cfg)
        warms.append(time.time() - t0)
    warm = min(warms)
    print(f"# engine: {len(loops)} loops; cold {cold:.1f}s "
          f"warm {'/'.join(f'{w:.2f}' for w in warms)}s "
          f"backend={jax.default_backend()}", file=sys.stderr)
    return CHR21_MB / warm, loops


def measure_baseline(x, y, v):
    """Oracle (scipy) pipeline — the reference's compute path, 1 process."""
    from oracle import detect_block_oracle, normalize_sparse_oracle
    from mustache_tpu.config import DetectionConfig, chunk_grid, block_mask_sizes
    from mustache_tpu.pipeline import densify_block

    cfg = DetectionConfig(resolution=5000, distance_bp=2_000_000,
                          pt=0.1, st=0.8)
    t0 = time.time()
    vv = v.copy()
    normalize_sparse_oracle(x, y, vv, 5000, D_PX)
    n = int(max(x.max(), y.max())) + 1
    start, end = chunk_grid(n, cfg.chunk_size, D_PX)
    masks = block_mask_sizes(start, end, D_PX)
    loops = []
    for i in range(len(start)):
        cc = densify_block(x, y, vv, start[i], end[i], cfg.chunk_size)
        rows = detect_block_oracle(cc, [1.6, 3.2], D_PX, 0.8, 0.1,
                                   start=start[i])
        for r in rows:
            if r[0] >= start[i] + masks[i] or r[1] >= start[i] + masks[i]:
                loops.append(r)
    elapsed = time.time() - t0
    print(f"# baseline(scipy oracle, 1 proc): {len(loops)} loops "
          f"in {elapsed:.1f}s", file=sys.stderr)
    return CHR21_MB / elapsed


def main():
    value, _ = measure_engine()

    if os.path.exists(BASELINE_FILE):
        base = json.load(open(BASELINE_FILE))["mb_per_s"]
    else:
        x, y, v = build_workload()
        base = measure_baseline(x, y, v)
        with open(BASELINE_FILE, "w") as fh:
            json.dump({"mb_per_s": base,
                       "workload": "synthetic chr21 5kb, see bench.py",
                       "note": "scipy oracle pipeline, single process"}, fh)

    print(json.dumps({
        "metric": "chr21_5kb_Mb_per_s",
        "value": round(value, 3),
        "unit": "Mb/s",
        "vs_baseline": round(value / base, 2),
    }))


if __name__ == "__main__":
    main()
