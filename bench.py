#!/usr/bin/env python3
"""Benchmark: chr21-scale 5kb loop calling + a 1kb Micro-C-shaped slice.

Prints one JSON line per metric; the LAST line is the headline metric:
  {"metric": "chr21_5kb_Mb_per_s", "value": <float>, "unit": "Mb/s",
   "vs_baseline": <float>}

Workload 1 (headline) is a deterministic synthetic chr21 (9,629 bins at
5kb, 2Mb band, ~3.4M contacts — the shape of the reference's bundled
golden data, whose raw blob is stripped from this mount). Workload 2 is a
12Mb slice at 1kb resolution (12,000 bins, 2Mb band = 2,000-bin-wide band,
4000^2 blocks — the BASELINE.json config-3 Micro-C shape). "value" is
genome megabases processed per second by the full pipeline (normalize +
densify + device detection + host clustering), excluding compile time. The
baseline is the same algorithm run through the scipy oracle pipeline (the
reference's compute path: C gaussian_filter/maximum_filter + BH), measured
once per workload on this machine and cached in BENCH_BASELINE.json;
vs_baseline = value / baseline.
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
BINS_1KB = 12000           # 12 Mb slice at 1kb
MB_1KB = 12.0
D_PX_1KB = 2000            # 2 Mb band at 1kb
BASELINE_FILE = os.path.join(os.path.dirname(__file__), "BENCH_BASELINE.json")


def _cached_workload(n_bins, d_px, **kw):
    """Deterministic synthetic workload with an on-disk cache.

    This VM throttles the whole guest (CPU and the TPU tunnel) on a
    token-bucket: ~2 minutes of host-side RNG/sorts before the measurement
    starves the measured runs of transfer bandwidth. The generator is
    seeded and pure, so cache the triplets and load them back with mmap
    (near-zero host CPU) on every run after the first."""
    cache_dir = os.path.expanduser("~/.cache/mustache_tpu/bench_v1")
    os.makedirs(cache_dir, exist_ok=True)
    tag = f"hic_{n_bins}_{d_px}_" + "_".join(
        f"{k}{kw[k]}" for k in sorted(kw))
    path = os.path.join(cache_dir, tag + ".npz")
    if os.path.exists(path):
        z = np.load(path, allow_pickle=False)
        return z["x"], z["y"], z["v"]
    from synthetic import synthetic_hic

    x, y, v, _ = synthetic_hic(n_bins, d_px, **kw)
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        np.savez(fh, x=x, y=y, v=v)
    os.replace(tmp, path)
    return x, y, v


def build_workload():
    return _cached_workload(CHR21_BINS, D_PX, seed=2021, n_loops=300,
                            loop_strength=3.0)


def build_workload_1kb():
    return _cached_workload(BINS_1KB, D_PX_1KB, seed=1011, n_loops=150,
                            loop_strength=3.0, density=0.95)


CHR12_BINS = 26671         # chr12: 133.35 Mb at 5kb (BASELINE config 2)
CHR12_MB = 133.35


def _cool_workload():
    """Synthetic chr12-scale .cool file (BASELINE config 2 shape): the
    metric includes the HDF5 ingest, measuring the end-to-end path a
    cooler user sees."""
    cache_dir = os.path.expanduser("~/.cache/mustache_tpu/bench_v1")
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"cool_{CHR12_BINS}_{D_PX}.cool")
    if not os.path.exists(path):
        from test_cool import build_cool

        x, y, v = _cached_workload(CHR12_BINS, D_PX, seed=1203, n_loops=600,
                                   loop_strength=3.0)
        tmp = path + ".tmp"
        build_cool(tmp, [("chr12", CHR12_BINS * 5000)], 5000,
                   {"chr12": (x, y, v)})
        os.replace(tmp, path)
    return path


def _measure_cool(cfg, warm_runs):
    """End-to-end .cool metric: HDF5 band fetch + full detection."""
    import jax
    from mustache_tpu.io.cool import read_cooler
    from mustache_tpu.pipeline import detect_loops_coo

    path = _cool_workload()

    def run():
        x, y, v, res = read_cooler(path, 2_000_000, "chr12", "chr12", False)
        return detect_loops_coo(x, y, v, cfg)

    t0 = time.time()
    loops = run()
    cold = time.time() - t0
    warms = []
    for _ in range(warm_runs):
        t0 = time.time()
        loops = run()
        warms.append(time.time() - t0)
    print(f"# engine .cool chr12 5kb: {len(loops)} loops; cold {cold:.1f}s "
          f"warm {'/'.join(f'{w:.2f}' for w in warms)}s "
          f"backend={jax.default_backend()}", file=sys.stderr)
    return CHR12_MB / min(warms)


def _setup_jax_cache():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/jax_mustache"))
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass
    return jax


def _backend_alive(timeout=240) -> bool:
    """Probe the default backend in a subprocess. A dead TPU tunnel hangs
    device init forever; bench must always print its JSON lines, so an
    unreachable backend downgrades the run to CPU instead of hanging."""
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _measure(tag, x, y, v, cfg, mb, warm_runs):
    import jax
    from mustache_tpu.pipeline import detect_loops_coo

    def run():
        # x/y are never mutated by the pipeline; v is (normalize in place)
        return detect_loops_coo(x, y, v.copy(), cfg)

    t0 = time.time()
    loops = run()                           # includes compile
    cold = time.time() - t0
    warms = []
    for _ in range(warm_runs):              # tunneled-TPU latency is noisy
        t0 = time.time()
        loops = run()
        warms.append(time.time() - t0)
    warm = min(warms)
    print(f"# {tag}: {len(loops)} loops; cold {cold:.1f}s "
          f"warm {'/'.join(f'{w:.2f}' for w in warms)}s "
          f"backend={jax.default_backend()}", file=sys.stderr)
    return mb / warm


def _measure_baseline(tag, x, y, v, cfg, mb, d_px):
    """Oracle (scipy) pipeline — the reference's compute path, 1 process."""
    from oracle import detect_block_oracle, normalize_sparse_oracle
    from mustache_tpu.config import chunk_grid, block_mask_sizes
    from mustache_tpu.pipeline import densify_block

    t0 = time.time()
    vv = v.copy()
    normalize_sparse_oracle(x, y, vv, cfg.resolution, d_px)
    n = int(max(x.max(), y.max())) + 1
    start, end = chunk_grid(n, cfg.chunk_size, d_px)
    masks = block_mask_sizes(start, end, d_px)
    loops = []
    for i in range(len(start)):
        cc = densify_block(x, y, vv, start[i], end[i], cfg.chunk_size)
        rows = detect_block_oracle(cc, [1.6, 3.2], d_px, cfg.st, cfg.pt,
                                   start=start[i])
        for r in rows:
            if r[0] >= start[i] + masks[i] or r[1] >= start[i] + masks[i]:
                loops.append(r)
    elapsed = time.time() - t0
    print(f"# baseline(scipy oracle, 1 proc) {tag}: {len(loops)} loops "
          f"in {elapsed:.1f}s", file=sys.stderr)
    return mb / elapsed


def _oracle_block_worker(payload):
    """Child-process worker for the 4-process baseline: receives the DENSE
    block exactly as the reference forks it (mustache.py:919-930)."""
    from oracle import detect_block_oracle

    cc, octaves, d_px, st, pt, start, mask = payload
    rows = detect_block_oracle(cc, octaves, d_px, st, pt, start=start)
    return [r for r in rows if r[0] >= start + mask or r[1] >= start + mask]


def _measure_baseline_4proc(tag, x, y, v, cfg, mb, d_px):
    """Reference default-parallelism baseline: the scipy oracle pipeline
    with 4 worker processes fed parent-densified blocks, mirroring
    mustache.py:146-148 (default -p 4) and :919-934 (fork + pickle)."""
    import multiprocessing as mp

    from oracle import normalize_sparse_oracle
    from mustache_tpu.config import chunk_grid, block_mask_sizes
    from mustache_tpu.pipeline import densify_block

    t0 = time.time()
    vv = v.copy()
    normalize_sparse_oracle(x, y, vv, cfg.resolution, d_px)
    n = int(max(x.max(), y.max())) + 1
    start, end = chunk_grid(n, cfg.chunk_size, d_px)
    masks = block_mask_sizes(start, end, d_px)
    payloads = [
        (densify_block(x, y, vv, start[i], end[i], cfg.chunk_size),
         [1.6, 3.2], d_px, cfg.st, cfg.pt, start[i], masks[i])
        for i in range(len(start))
    ]
    with mp.Pool(4) as pool:
        outs = pool.map(_oracle_block_worker, payloads)
    loops = [r for rows in outs for r in rows]
    elapsed = time.time() - t0
    print(f"# baseline(scipy oracle, 4 proc) {tag}: {len(loops)} loops "
          f"in {elapsed:.1f}s", file=sys.stderr)
    return mb / elapsed


def _measure_diff(x1, y1, v1, x2, y2, v2, cfg, mb, warm_runs):
    import jax
    from mustache_tpu.diff import detect_diff_loops_coo

    def run():
        return detect_diff_loops_coo(x1, y1, v1.copy(),
                                     x2, y2, v2.copy(), cfg)

    t0 = time.time()
    rows = run()
    cold = time.time() - t0
    warms = []
    for _ in range(warm_runs):
        t0 = time.time()
        rows = run()
        warms.append(time.time() - t0)
    print(f"# diff 5kb: {len(rows)} rows; cold {cold:.1f}s "
          f"warm {'/'.join(f'{w:.2f}' for w in warms)}s "
          f"backend={jax.default_backend()}", file=sys.stderr)
    # both conditions are ingested+normalized+scanned: count the Mb twice
    return 2 * mb / min(warms)


def _measure_diff_baseline(x1, y1, v1, x2, y2, v2, cfg, mb, d_px):
    from oracle import diff_detect_block_oracle, normalize_sparse_oracle
    from mustache_tpu.config import chunk_grid
    from mustache_tpu.pipeline import densify_block

    t0 = time.time()
    vv1, vv2 = v1.copy(), v2.copy()
    normalize_sparse_oracle(x1, y1, vv1, cfg.resolution, d_px)
    normalize_sparse_oracle(x2, y2, vv2, cfg.resolution, d_px)
    n = int(max(x1.max(), y1.max(), x2.max(), y2.max())) + 1
    start, end = chunk_grid(n, cfg.chunk_size, d_px)
    total = 0
    for i in range(len(start)):
        cc1 = densify_block(x1, y1, vv1, start[i], end[i], cfg.chunk_size)
        cc2 = densify_block(x2, y2, vv2, start[i], end[i], cfg.chunk_size)
        out = diff_detect_block_oracle(cc1, cc2, [1.6, 3.2], d_px, cfg.st,
                                       cfg.pt, cfg.pt2, start=start[i])
        total += sum(len(g) for g in out)
    elapsed = time.time() - t0
    print(f"# baseline(scipy oracle, 1 proc) diff 5kb: {total} rows "
          f"in {elapsed:.1f}s", file=sys.stderr)
    return 2 * mb / elapsed


def _measure_fresh_process(tag, cfg_args):
    """Fresh-PROCESS end-to-end wall clock (the VERDICT r03 'warmed cold'):
    what a user pays for a chr21-scale run in a brand-new process after the
    one-time `mustache_tpu.warmup` pass — backend init + persistent-cache
    hits + dispatch + the full pipeline. The in-process 'cold' above it
    conflates first-compile cost; this isolates the steady-state UX.

    Two fresh processes run back to back: a driver VM whose persistent
    cache misses any shape pays the compile in run 1 and WRITES the cache,
    so run 2 is the genuinely warmed-cold number (the r04 8.5s-vs-32.2s
    discrepancy was exactly this — the driver's first bench of the round
    compiled into a cache the builder's session had kept warm). The metric
    is min(run1, run2); the stderr line prints both plus the child's phase
    breakdown and the number of new persistent-cache entries per run, so
    a recompile is visible, not inferred."""
    import subprocess

    code = f"""
import os, sys, time
sys.path.insert(0, {os.path.dirname(os.path.abspath(__file__))!r})
sys.path.insert(0, {os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests")!r})
t0 = time.time()
from bench import build_workload, _setup_jax_cache
_setup_jax_cache()
from mustache_tpu.config import DetectionConfig
from mustache_tpu.pipeline import detect_loops_coo
t_imp = time.time() - t0
import jax; jax.devices()
t_dev = time.time() - t0
x, y, v = build_workload()
t_wl = time.time() - t0
cfg = DetectionConfig({cfg_args})
loops = detect_loops_coo(x, y, v.copy(), cfg)
t_p1 = time.time() - t0
loops = detect_loops_coo(x, y, v.copy(), cfg)
t_p2 = time.time() - t0
print(f"FRESH {{t_p1:.2f}} {{len(loops)}} imp={{t_imp:.1f}} "
      f"dev={{t_dev - t_imp:.1f}} wl={{t_wl - t_dev:.1f}} "
      f"pipe1={{t_p1 - t_wl:.1f}} pipe2={{t_p2 - t_p1:.1f}}")
"""
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/jax_mustache"))

    def _n_cache():
        try:
            return len(os.listdir(cache_dir))
        except OSError:
            return 0

    walls, inners = [], []
    for rep in range(2):
        n0 = _n_cache()
        t0 = time.time()
        r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                           text=True, timeout=900)
        walls.append(time.time() - t0)
        line = [l for l in r.stdout.splitlines() if l.startswith("FRESH")]
        inners.append(float(line[0].split()[1]) if line else float("nan"))
        detail = line[0].split(None, 3)[3] if line else "(no output)"
        print(f"# fresh-process {tag} run{rep + 1}: wall {walls[-1]:.1f}s "
              f"inner {inners[-1]:.1f}s new_cache_entries={_n_cache() - n0} "
              f"{detail}", file=sys.stderr)
        if walls[-1] < 10 and rep == 0:
            break      # already warmed-cold; skip the confirmation run
        if rep == 0 and walls[-1] > 60:
            # a compile marathon (or tunnel churn) drains this VM's
            # token-bucket throttle; measuring run 2 into the drained
            # bucket produced 6x-slower "warm" numbers (docs/PERF.md
            # tunnel notes). Let it refill first.
            print("# fresh-process: resting 90s (throttle refill) before "
                  "run 2", file=sys.stderr)
            time.sleep(90)
    if max(walls) > 60:
        print("# fresh-process: resting 90s before throughput legs",
              file=sys.stderr)
        time.sleep(90)
    return min(walls)


def main():
    jax = _setup_jax_cache()
    if os.environ.get("JAX_PLATFORMS", "") not in ("", "cpu") \
            and not _backend_alive():
        print("# WARNING: default backend unreachable (tunnel down?); "
              "falling back to CPU — numbers below are NOT chip numbers",
              file=sys.stderr)
        jax.config.update("jax_platforms", "cpu")
    # warmed fresh-process end-to-end (VERDICT r03 item 6): what a user
    # pays in a brand-new process AFTER the one-time warmup (here: the
    # persistent cache populated by any prior bench/warmup run on this
    # machine). Measured FIRST, before this process initializes the
    # device — a fresh process sharing the chip with a live parent
    # crawls (415 s observed vs ~7 s solo).
    fresh = _measure_fresh_process(
        "chr21 5kb",
        "resolution=5000, distance_bp=2_000_000, pt=0.1, st=0.8, "
        "precision='float32'")
    print(json.dumps({
        "metric": "chr21_5kb_fresh_process_s",
        "value": round(fresh, 2),
        "unit": "s",
        "vs_baseline": 0.0,
    }))

    backend = jax.default_backend()
    from mustache_tpu.config import DetectionConfig

    base = json.load(open(BASELINE_FILE)) if os.path.exists(BASELINE_FILE) \
        else {}
    updated = False

    # ---- differential two-condition 5kb (config-5 shape) -----------------
    cfg_diff = DetectionConfig(resolution=5000, distance_bp=2_000_000,
                               pt=0.1, st=0.8, pt2=0.1, precision="float32")
    x1, y1, v1 = _cached_workload(CHR21_BINS, D_PX, seed=2021, n_loops=300,
                                  loop_strength=3.0)
    x2, y2, v2 = _cached_workload(CHR21_BINS, D_PX, seed=2022, n_loops=300,
                                  loop_strength=3.0)
    value_diff = _measure_diff(x1, y1, v1, x2, y2, v2, cfg_diff,
                               CHR21_MB, warm_runs=3)
    if "mb_per_s_diff" not in base:
        base["mb_per_s_diff"] = _measure_diff_baseline(
            x1, y1, v1, x2, y2, v2, cfg_diff, CHR21_MB, D_PX)
        updated = True
    print(json.dumps({
        "metric": "diff_5kb_Mb_per_s",
        "value": round(value_diff, 3),
        "unit": "Mb/s",
        "vs_baseline": round(value_diff / base["mb_per_s_diff"], 2),
        "backend": backend,
    }))

    # ---- 1kb Micro-C-shaped slice (secondary metric, printed first) ------
    cfg_1kb = DetectionConfig(resolution=1000, distance_bp=2_000_000,
                              pt=0.1, st=0.8, precision="float32")
    x, y, v = build_workload_1kb()
    value_1kb = _measure("engine 1kb", x, y, v, cfg_1kb, MB_1KB, warm_runs=3)
    if "mb_per_s_1kb" not in base:
        base["mb_per_s_1kb"] = _measure_baseline(
            "1kb", x, y, v, cfg_1kb, MB_1KB, D_PX_1KB)
        updated = True
    print(json.dumps({
        "metric": "micro_c_1kb_Mb_per_s",
        "value": round(value_1kb, 3),
        "unit": "Mb/s",
        "vs_baseline": round(value_1kb / base["mb_per_s_1kb"], 2),
        "backend": backend,
    }))

    # ---- .cool chr12 5kb, ingest-inclusive (config-2 shape) --------------
    cfg_cool = DetectionConfig(resolution=5000, distance_bp=2_000_000,
                               pt=0.1, st=0.8, precision="float32")
    # 3 warm reps: read_cooler alone varies 0.7-5.5s with page cache/VM
    # throttle (docs/PERF.md); min-of-3 reports steady state, the stderr
    # line records the spread
    value_cool = _measure_cool(cfg_cool, warm_runs=3)
    if "mb_per_s_cool" not in base:
        from mustache_tpu.io.cool import read_cooler

        xg, yg, vg, _ = read_cooler(_cool_workload(), 2_000_000,
                                    "chr12", "chr12", False)
        base["mb_per_s_cool"] = _measure_baseline(
            ".cool chr12", xg, yg, vg, cfg_cool, CHR12_MB, D_PX)
        updated = True
    print(json.dumps({
        "metric": "cool_chr12_5kb_Mb_per_s",
        "value": round(value_cool, 3),
        "unit": "Mb/s",
        "vs_baseline": round(value_cool / base["mb_per_s_cool"], 2),
        "backend": backend,
    }))

    # ---- chr21 5kb (headline metric, LAST line) --------------------------
    cfg = DetectionConfig(resolution=5000, distance_bp=2_000_000,
                          pt=0.1, st=0.8, precision="float32")
    x, y, v = build_workload()
    value = _measure("engine 5kb", x, y, v, cfg, CHR21_MB, warm_runs=5)
    if "mb_per_s" not in base:
        base["mb_per_s"] = _measure_baseline("5kb", x, y, v, cfg, CHR21_MB,
                                             D_PX)
        updated = True
    if "mb_per_s_4proc" not in base:
        base["mb_per_s_4proc"] = _measure_baseline_4proc(
            "5kb", x, y, v, cfg, CHR21_MB, D_PX)
        updated = True

    # honest default-vs-default margin: the reference runs 4 worker
    # processes by default (mustache.py:146-148)
    print(json.dumps({
        "metric": "chr21_5kb_vs_ref_4proc",
        "value": round(value, 3),
        "unit": "Mb/s",
        "vs_baseline": round(value / base["mb_per_s_4proc"], 2),
        "backend": backend,
    }))

    if updated:
        base.setdefault("workload", "synthetic chr21 5kb + 12Mb 1kb slice, "
                                    "see bench.py")
        base.setdefault("note", "scipy oracle pipeline, single process")
        with open(BASELINE_FILE, "w") as fh:
            json.dump(base, fh)

    print(json.dumps({
        "metric": "chr21_5kb_Mb_per_s",
        "value": round(value, 3),
        "unit": "Mb/s",
        "vs_baseline": round(value / base["mb_per_s"], 2),
        "backend": backend,
    }))


if __name__ == "__main__":
    main()
