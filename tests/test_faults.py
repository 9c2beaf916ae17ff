"""Fault injection, ingest retries, per-chromosome elastic recovery.

The reference loses a crashed worker's block silently (mustache.py:931-934
never checks exit codes). Here the chromosome is the unit of restart:
transient ingest errors are retried, a persistently failing chromosome is
recorded and skipped while the run completes, and an ``--engine-resume``
rerun retries exactly the failed units via the manifest.
"""

import pytest

from mustache_tpu import faults
from mustache_tpu.cli import main
from synthetic import synthetic_hic

RES = 5000


@pytest.fixture(autouse=True)
def _reset_faults():
    faults.reset()
    yield
    faults.reset()


@pytest.fixture()
def two_chrom_file(tmp_path):
    path = tmp_path / "two.txt"
    with open(path, "w") as fh:
        for chrom, seed in (("chr20", 7), ("chr21", 8)):
            x, y, v, _ = synthetic_hic(1200, 150, seed=seed, n_loops=20)
            for a, b, c in zip(x, y, v):
                fh.write(f"{chrom}\t{a*RES}\t{chrom}\t{b*RES}\t{c}\n")
    return str(path)


def _run(path, out, extra=()):
    return main(["-f", path, "-ch", "20", "21", "-r", "5kb", "-o", out,
                 "-d", "750kb", "-pt", "0.2", "-st", "0.6"] + list(extra))


def _chroms_in(out):
    return {line.split("\t")[0] for line in open(out).read().splitlines()[1:]}


def test_maybe_fail_match_and_exhaustion():
    faults.arm("ingest", count=2, match="21")
    faults.maybe_fail("ingest", chromosome="20")  # no match: silent
    with pytest.raises(faults.InjectedFault):
        faults.maybe_fail("ingest", chromosome="21")
    with pytest.raises(faults.InjectedFault):
        faults.maybe_fail("ingest", chromosome="21")
    faults.maybe_fail("ingest", chromosome="21")  # exhausted: silent


def test_env_armed_fault(monkeypatch):
    monkeypatch.setenv("MTPU_FAULT_INJECT", "ingest:1")
    faults.reset()
    with pytest.raises(faults.InjectedFault):
        faults.maybe_fail("ingest", chromosome="5")
    faults.maybe_fail("ingest", chromosome="5")


def test_ingest_retry_recovers(two_chrom_file, tmp_path):
    """One transient fault: retried inside ingest, run fully succeeds."""
    faults.arm("ingest", count=1)
    out = str(tmp_path / "o.tsv")
    assert _run(two_chrom_file, out) == 0
    assert _chroms_in(out) == {"20", "21"}


def test_unit_failure_isolated(two_chrom_file, tmp_path, capsys):
    """A persistently failing chromosome is skipped; the rest of the run
    completes and its loops are written; exit code flags the failure."""
    faults.arm("ingest", count=100, match="20")
    out = str(tmp_path / "o.tsv")
    assert _run(two_chrom_file, out) == 1
    assert _chroms_in(out) == {"21"}
    assert "failed after retries: 20" in capsys.readouterr().out


def test_resume_retries_failed_unit(two_chrom_file, tmp_path):
    """--engine-resume rerun retries exactly the failed unit and assembles
    the complete output."""
    faults.arm("ingest", count=100, match="20")
    out = str(tmp_path / "o.tsv")
    assert _run(two_chrom_file, out, ["--engine-resume"]) == 1
    assert _chroms_in(out) == {"21"}
    faults.reset()
    assert _run(two_chrom_file, out, ["--engine-resume"]) == 0
    assert _chroms_in(out) == {"20", "21"}
