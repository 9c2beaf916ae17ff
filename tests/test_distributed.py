"""Multi-host smoke test: 2 localhost processes under jax.distributed.

Each process takes its chromosome partition (the config-4 benchmark
sharding), runs the detector on its share, and writes results; the union
must equal the single-process run. Runs on the CPU backend.
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

WORKER = textwrap.dedent("""
    import json, os, sys
    os.environ["JAX_ENABLE_X64"] = "true"
    import jax
    jax.config.update("jax_platforms", "cpu")
    coord, nproc, pid, outdir = sys.argv[1:5]
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=int(nproc), process_id=int(pid))
    from synthetic import synthetic_hic
    from mustache_tpu.config import DetectionConfig
    from mustache_tpu.pipeline import detect_loops_coo
    from mustache_tpu.sharding import shard_chromosomes

    chroms = ["c0", "c1", "c2"]
    mine = shard_chromosomes(chroms, int(pid), int(nproc))
    out = {}
    for ch in mine:
        seed = 300 + chroms.index(ch)
        x, y, v, _ = synthetic_hic(800, 100, seed=seed, n_loops=12)
        cfg = DetectionConfig(resolution=5000, distance_bp=100 * 5000,
                              precision="float32")
        loops = detect_loops_coo(x, y, v, cfg)
        out[ch] = [[l.bin1, l.bin2, round(l.q, 10), l.scale] for l in loops]
    with open(os.path.join(outdir, f"part{pid}.json"), "w") as fh:
        json.dump(out, fh)
""")


@pytest.mark.skipif(os.environ.get("MTPU_SKIP_DISTRIBUTED") == "1",
                    reason="distributed smoke test disabled")
def test_two_process_distributed(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    here = os.path.dirname(__file__)
    repo = os.path.dirname(here)
    env["PYTHONPATH"] = os.pathsep.join(
        [repo, here, env.get("PYTHONPATH", "")])
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coord, "2", str(pid), str(tmp_path)],
            env=env, cwd=here, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT)
        for pid in range(2)
    ]
    for p in procs:
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, out.decode()[-2000:]

    merged = {}
    for pid in range(2):
        merged.update(json.load(open(tmp_path / f"part{pid}.json")))
    assert set(merged) == {"c0", "c1", "c2"}

    # single-process reference
    from mustache_tpu.config import DetectionConfig
    from mustache_tpu.pipeline import detect_loops_coo
    from synthetic import synthetic_hic
    for i, ch in enumerate(["c0", "c1", "c2"]):
        x, y, v, _ = synthetic_hic(800, 100, seed=300 + i, n_loops=12)
        cfg = DetectionConfig(resolution=5000, distance_bp=100 * 5000,
                              precision="float32")
        loops = detect_loops_coo(x, y, v, cfg)
        want = [[l.bin1, l.bin2, round(l.q, 10), l.scale] for l in loops]
        assert merged[ch] == want, ch


@pytest.mark.skipif(os.environ.get("MTPU_SKIP_DISTRIBUTED") == "1",
                    reason="distributed smoke test disabled")
def test_two_process_cli(tmp_path):
    """End-to-end: the CLI itself runs distributed (--engine-nprocs /
    --engine-procid / --engine-coordinator), shards chromosomes across
    processes, and process 0 assembles the reference-format TSV. The result
    must equal a single-process CLI run."""
    from synthetic import synthetic_hic

    res = 5000
    contacts = tmp_path / "contacts.txt"
    with open(contacts, "w") as fh:
        for ci, ch in enumerate(["c0", "c1", "c2"]):
            x, y, v, _ = synthetic_hic(800, 100, seed=310 + ci, n_loops=12)
            for a, b, c in zip(x, y, v):
                fh.write(f"{ch}\t{a*res}\t{ch}\t{b*res}\t{c}\n")

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    here = os.path.dirname(__file__)
    repo = os.path.dirname(here)
    env["PYTHONPATH"] = os.pathsep.join(
        [repo, here, env.get("PYTHONPATH", "")])

    base = [sys.executable, "-m", "mustache_tpu", "-f", str(contacts),
            "-ch", "c0", "c1", "c2", "-r", "5kb", "-pt", "0.1", "-st", "0.8",
            "-d", str(100 * res), "--engine-platform", "cpu"]

    single = tmp_path / "single.tsv"
    p = subprocess.run(base + ["-o", str(single)], env=env, cwd=here,
                       stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                       timeout=600)
    assert p.returncode == 0, p.stdout.decode()[-2000:]

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    multi = tmp_path / "multi.tsv"
    procs = [
        subprocess.Popen(
            base + ["-o", str(multi), "--engine-coordinator", coord,
                    "--engine-nprocs", "2", "--engine-procid", str(pid)],
            env=env, cwd=here, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT)
        for pid in range(2)
    ]
    for p in procs:
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, out.decode()[-2000:]

    assert multi.read_text() == single.read_text()
    assert len(multi.read_text().splitlines()) > 3   # header + loops


@pytest.mark.skipif(os.environ.get("MTPU_SKIP_DISTRIBUTED") == "1",
                    reason="distributed smoke test disabled")
def test_two_process_cli_unit_failure_no_hang(tmp_path):
    """A chromosome failing on one process must not hang the other at the
    parts-complete barrier: both processes exit, the failing one with
    code 1, and process 0 assembles the successful chromosomes."""
    from synthetic import synthetic_hic

    res = 5000
    contacts = tmp_path / "contacts.txt"
    with open(contacts, "w") as fh:
        for ci, ch in enumerate(["c0", "c1", "c2"]):
            x, y, v, _ = synthetic_hic(800, 100, seed=320 + ci, n_loops=12)
            for a, b, c in zip(x, y, v):
                fh.write(f"{ch}\t{a*res}\t{ch}\t{b*res}\t{c}\n")

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["MTPU_FAULT_INJECT"] = "ingest:100:c1"   # c1 always fails
    here = os.path.dirname(__file__)
    repo = os.path.dirname(here)
    env["PYTHONPATH"] = os.pathsep.join(
        [repo, here, env.get("PYTHONPATH", "")])

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    out = tmp_path / "multi.tsv"
    base = [sys.executable, "-m", "mustache_tpu", "-f", str(contacts),
            "-ch", "c0", "c1", "c2", "-r", "5kb", "-pt", "0.1", "-st", "0.8",
            "-d", str(100 * res), "--engine-platform", "cpu",
            "--engine-ingest-retries", "0",
            "-o", str(out), "--engine-coordinator", coord,
            "--engine-nprocs", "2"]
    procs = [
        subprocess.Popen(base + ["--engine-procid", str(pid)],
                         env=env, cwd=here, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT)
        for pid in range(2)
    ]
    rcs, outs = [], []
    for p in procs:
        o, _ = p.communicate(timeout=600)   # a barrier hang trips this
        rcs.append(p.returncode)
        outs.append(o.decode()[-2000:])
    assert sorted(rcs) == [0, 1], outs
    chroms = {l.split("\t")[0] for l in out.read_text().splitlines()[1:]}
    assert chroms == {"c0", "c2"}


@pytest.mark.skipif(os.environ.get("MTPU_SKIP_DISTRIBUTED") == "1",
                    reason="distributed smoke test disabled")
def test_two_process_diff_cli(tmp_path):
    """The differential CLI runs distributed: chromosome shard per
    process, process 0 assembles all four output files; result equals a
    single-process run."""
    from synthetic import synthetic_hic

    res = 5000
    paths = []
    for cond, base_seed in (("c1", 330), ("c2", 340)):
        path = tmp_path / f"{cond}.txt"
        with open(path, "w") as fh:
            for ci, ch in enumerate(["c0", "c1", "c2"]):
                x, y, v, _ = synthetic_hic(800, 100, seed=base_seed + ci,
                                           n_loops=12)
                for a, b, c in zip(x, y, v):
                    fh.write(f"{ch}\t{a*res}\t{ch}\t{b*res}\t{c}\n")
        paths.append(str(path))

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    here = os.path.dirname(__file__)
    repo = os.path.dirname(here)
    env["PYTHONPATH"] = os.pathsep.join(
        [repo, here, env.get("PYTHONPATH", "")])

    base = [sys.executable, "-c",
            "import sys; from mustache_tpu.diff_cli import main; "
            "sys.exit(main(sys.argv[1:]))",
            "-f1", paths[0], "-f2", paths[1],
            "-ch", "c0", "c1", "c2", "-r", "5kb", "-pt", "0.2", "-st", "0.6",
            "-pt2", "0.2", "-d", str(100 * res), "--engine-platform", "cpu"]

    single = str(tmp_path / "single")
    p = subprocess.run(base + ["-o", single], env=env, cwd=here,
                       stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                       timeout=600)
    assert p.returncode == 0, p.stdout.decode()[-2000:]

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    multi = str(tmp_path / "multi")
    procs = [
        subprocess.Popen(
            base + ["-o", multi, "--engine-coordinator", coord,
                    "--engine-nprocs", "2", "--engine-procid", str(pid)],
            env=env, cwd=here, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT)
        for pid in range(2)
    ]
    for p in procs:
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, out.decode()[-2000:]

    total = 0
    for sfx in (".loop1", ".diffloop1", ".loop2", ".diffloop2"):
        assert open(multi + sfx).read() == open(single + sfx).read(), sfx
        total += len(open(multi + sfx).read().splitlines()) - 1
    assert total > 3
