"""diff-mustache CLI surface: 4 output files, prefetch parity, failure
isolation (reference driver: diff_mustache.py:720-906)."""

import pytest

from mustache_tpu import faults
from mustache_tpu.diff_cli import main
from synthetic import synthetic_hic

RES = 5000


@pytest.fixture(autouse=True)
def _reset_faults():
    faults.reset()
    yield
    faults.reset()


@pytest.fixture(scope="module")
def cond_files(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("diffcli")
    paths = []
    for cond, base_seed in (("c1", 60), ("c2", 80)):
        path = tmp / f"{cond}.txt"
        with open(path, "w") as fh:
            for chrom, off in (("chr20", 0), ("chr21", 1)):
                x, y, v, _ = synthetic_hic(1100, 140, seed=base_seed + off,
                                           n_loops=18)
                for a, b, c in zip(x, y, v):
                    fh.write(f"{chrom}\t{a*RES}\t{chrom}\t{b*RES}\t{c}\n")
        paths.append(str(path))
    return paths


def _run(paths, out, extra=()):
    return main(["-f1", paths[0], "-f2", paths[1], "-ch", "20", "21",
                 "-r", "5kb", "-o", out, "-d", "700kb", "-pt", "0.2",
                 "-st", "0.6", "-pt2", "0.2"] + list(extra))


SUFFIXES = (".loop1", ".diffloop1", ".loop2", ".diffloop2")


def test_diff_cli_end_to_end(cond_files, tmp_path):
    out = str(tmp_path / "d")
    assert _run(cond_files, out) == 0
    total = 0
    for sfx in SUFFIXES:
        lines = open(out + sfx).read().splitlines()
        assert lines[0].startswith("BIN1_CHR\tBIN1_START")
        total += len(lines) - 1
    assert total > 5
    # loop files carry rows from both chromosomes
    chroms = {l.split("\t")[0] for l in
              open(out + ".loop1").read().splitlines()[1:]}
    assert chroms == {"20", "21"}


def test_diff_cli_prefetch_matches_sequential(cond_files, tmp_path):
    out_a = str(tmp_path / "a")
    out_b = str(tmp_path / "b")
    assert _run(cond_files, out_a) == 0
    assert _run(cond_files, out_b, ["--engine-no-prefetch"]) == 0
    for sfx in SUFFIXES:
        assert open(out_a + sfx).read() == open(out_b + sfx).read()


def test_diff_cli_unit_failure_isolated(cond_files, tmp_path, capsys):
    faults.arm("ingest", count=100, match="20")
    out = str(tmp_path / "f")
    assert _run(cond_files, out) == 1
    chroms = {l.split("\t")[0] for l in
              open(out + ".loop1").read().splitlines()[1:]}
    assert chroms == {"21"}
    assert "failed after retries: 20" in capsys.readouterr().out


def test_diff_cli_resolution_mismatch_raises(cond_files, tmp_path):
    """f2 .cool with a binsize different from the effective resolution must
    raise, even when f1 is text (reference: diff_mustache.py:614-616)."""
    pytest.importorskip("h5py")
    from test_cool import build_cool
    from synthetic import synthetic_hic as syn

    x, y, v, _ = syn(300, 60, seed=5, n_loops=4)
    cool10kb = str(tmp_path / "c2_10kb.cool")
    # cooler chrom lookup is exact-name (reference mustache.py:437), so the
    # file's names must match the -ch arguments verbatim
    build_cool(cool10kb, [("20", 300 * 10000), ("21", 300 * 10000)],
               10000, {"20": (x, y, v), "21": (x, y, v)})
    with pytest.raises(ValueError, match="same resolution"):
        _run([cond_files[0], cool10kb], str(tmp_path / "mx"))


def test_diff_cli_resume_retries_failed_units(cond_files, tmp_path):
    """--engine-resume: a failed chromosome is retried by the rerun and
    only it (completed units are skipped); the final four files equal a
    clean run's."""
    clean = str(tmp_path / "clean")
    assert _run(cond_files, clean) == 0

    out = str(tmp_path / "r")
    faults.arm("ingest", count=100, match="21")
    assert _run(cond_files, out, ["--engine-resume",
                                  "--engine-ingest-retries", "0"]) == 1
    # chr20 completed; chr21 missing from every file
    for sfx in SUFFIXES:
        chroms = {l.split("\t")[0]
                  for l in open(out + sfx).read().splitlines()[1:]}
        assert "21" not in chroms
    faults.reset()
    assert _run(cond_files, out, ["--engine-resume"]) == 0
    for sfx in SUFFIXES:
        assert open(out + sfx).read() == open(clean + sfx).read(), sfx


def test_diff_cli_engine_mesh_matches(cond_files, tmp_path):
    """--engine-mesh block on the differential CLI: identical four files
    to the single-device run (rowshard maps to block for diff)."""
    out_a = str(tmp_path / "m_off")
    out_b = str(tmp_path / "m_blk")
    assert _run(cond_files, out_a, ["--engine-mesh", "off"]) == 0
    assert _run(cond_files, out_b, ["--engine-mesh", "block"]) == 0
    for sfx in SUFFIXES:
        assert open(out_a + sfx).read() == open(out_b + sfx).read(), sfx
