"""Checkpoint/resume manifest tests."""

import json
import os

from mustache_tpu.config import DetectionConfig
from mustache_tpu.manifest import RunManifest, config_fingerprint
from mustache_tpu.runlog import RunLog


def test_fingerprint_changes_with_config():
    a = config_fingerprint(DetectionConfig(pt=0.2))
    b = config_fingerprint(DetectionConfig(pt=0.1))
    assert a != b
    assert a == config_fingerprint(DetectionConfig(pt=0.2))


def test_manifest_roundtrip(tmp_path):
    out = str(tmp_path / "loops.tsv")
    m = RunManifest(out, "abc")
    assert m.completed_chromosomes() == set()
    m.mark_complete("chr1", 3, 1.5, "row1\nrow2\nrow3\n")
    m.mark_complete("chr2", 0, 0.5, "")
    assert m.completed_chromosomes() == {"chr1", "chr2"}
    # a different fingerprint invalidates the manifest
    assert RunManifest(out, "other").completed_chromosomes() == set()

    m.assemble(["chr1", "chr2"], "HDR\n")
    assert open(out).read() == "HDR\nrow1\nrow2\nrow3\n"
    m.cleanup(["chr1", "chr2"])
    assert not os.path.exists(m.manifest_path)


def test_manifest_atomic_and_resumable(tmp_path):
    out = str(tmp_path / "loops.tsv")
    m = RunManifest(out, "f1")
    m.mark_complete("chr1", 1, 0.1, "a\n")
    # simulate crash: new instance with same fingerprint resumes
    m2 = RunManifest(out, "f1")
    assert m2.completed_chromosomes() == {"chr1"}
    data = json.load(open(m2.part_path("chr1") + ".done"))
    assert data["n_loops"] == 1 and data["fingerprint"] == "f1"


def test_manifest_stale_part_excluded(tmp_path):
    """A part file without a matching-fingerprint done marker (older run,
    different config) must not leak into assembly or resume."""
    out = str(tmp_path / "loops.tsv")
    old = RunManifest(out, "old-config")
    old.mark_complete("chr1", 1, 0.1, "stale-row\n")

    m = RunManifest(out, "new-config")
    assert m.completed_chromosomes() == set()
    m.mark_complete("chr2", 1, 0.1, "fresh-row\n")
    m.assemble(["chr1", "chr2"], "HDR\n")
    assert open(out).read() == "HDR\nfresh-row\n"

    # invalidate drops a unit's part + marker
    m.invalidate(["chr2"])
    assert m.completed_chromosomes() == set()
    assert not os.path.exists(m.part_path("chr2"))


def test_manifest_concurrent_markers_no_loss(tmp_path):
    """Per-unit markers: two 'processes' completing different units never
    clobber each other's records (the old shared-JSON design lost one)."""
    out = str(tmp_path / "loops.tsv")
    a = RunManifest(out, "f1")
    b = RunManifest(out, "f1")
    a.mark_complete("chr1", 1, 0.1, "a\n")
    b.mark_complete("chr2", 2, 0.2, "b\n")
    assert RunManifest(out, "f1").completed_chromosomes() == {"chr1", "chr2"}


def test_runlog_events_and_phases(capsys):
    import io
    buf = io.StringIO()
    log = RunLog(json_mode=True, stream=buf)
    log.event("hello", n=3)
    with log.phase("work"):
        pass
    lines = [json.loads(l) for l in buf.getvalue().splitlines()]
    assert lines[0]["event"] == "hello" and lines[0]["n"] == 3
    assert lines[1]["event"] == "work" and "seconds" in lines[1]
    assert "work" in log.summary()
