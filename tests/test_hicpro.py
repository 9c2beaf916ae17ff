"""HiC-Pro bed+matrix ingest: triplet parity with the text path and CLI
end-to-end (beyond-reference: the reference's -bed/-m misparses bin ids
as midpoints, mustache.py:969-970 + :282-288)."""

import numpy as np
import pytest

from mustache_tpu.cli import main
from mustache_tpu.io.hicpro import read_hicpro
from mustache_tpu.io.text import read_text_contacts
from synthetic import synthetic_hic

RES = 5000


@pytest.fixture()
def workload(tmp_path):
    """Same contacts as text (midpoints) and HiC-Pro (bed + bin-id matrix),
    with a genome-wide id offset (chr20 occupies ids 0..99 first)."""
    x, y, v, anchors = synthetic_hic(1500, 200, seed=11, n_loops=25)
    text = tmp_path / "contacts.txt"
    with open(text, "w") as fh:
        for a, b, c in zip(x, y, v):
            fh.write(f"chr21\t{a*RES}\tchr21\t{b*RES}\t{c}\n")

    offset = 100  # ids 0..99 belong to another chromosome
    bed = tmp_path / "abs.bed"
    with open(bed, "w") as fh:
        for i in range(offset):
            fh.write(f"chr20\t{i*RES}\t{(i+1)*RES}\t{i}\n")
        for i in range(1500):
            fh.write(f"chr21\t{i*RES}\t{(i+1)*RES}\t{offset+i}\n")
    mat = tmp_path / "raw.matrix"
    with open(mat, "w") as fh:
        fh.write(f"0\t1\t9.0\n")  # chr20 contact: must be filtered out
        for a, b, c in zip(x, y, v):
            fh.write(f"{offset+a}\t{offset+b}\t{c}\n")
    return str(text), str(bed), str(mat), anchors


def test_hicpro_matches_text_triplets(workload):
    text, bed, mat, _ = workload
    xt, yt, vt = read_text_contacts(text, 1_000_000, False, "21", RES)
    xh, yh, vh = read_hicpro(mat, bed, 1_000_000, False, "21", RES)
    order_t = np.lexsort((yt, xt))
    order_h = np.lexsort((yh, xh))
    np.testing.assert_array_equal(xt[order_t], xh[order_h])
    np.testing.assert_array_equal(yt[order_t], yh[order_h])
    np.testing.assert_allclose(vt[order_t], vh[order_h])


def test_hicpro_bias_applied(workload, tmp_path):
    _, bed, mat, _ = workload
    biasfile = tmp_path / "bias.txt"
    with open(biasfile, "w") as fh:
        for i in range(1500):
            fh.write(f"chr21\t{i*RES + RES//2}\t2.0\n")
    from mustache_tpu.io.bias import read_bias

    bias = read_bias(str(biasfile), "21", RES)
    x0, y0, v0 = read_hicpro(mat, bed, 1_000_000, False, "21", RES)
    x1, y1, v1 = read_hicpro(mat, bed, 1_000_000, bias, "21", RES)
    np.testing.assert_array_equal(x0, x1)
    np.testing.assert_allclose(v1, v0 / 4.0)


def test_hicpro_cli_end_to_end(workload, tmp_path):
    text, bed, mat, _ = workload
    out_txt = str(tmp_path / "text.tsv")
    out_pro = str(tmp_path / "pro.tsv")
    common = ["-ch", "21", "-r", "5kb", "-d", "1Mb", "-pt", "0.2",
              "-st", "0.6"]
    assert main(["-f", text, "-o", out_txt] + common) == 0
    assert main(["-bed", bed, "-m", mat, "-o", out_pro] + common) == 0
    assert open(out_pro).read() == open(out_txt).read()
    assert len(open(out_pro).read().splitlines()) > 3


def test_hicpro_one_column_bias_keyed_by_bed_row(workload, tmp_path):
    """HiC-Pro ICE bias (1-column, one factor per genome-wide bed row):
    factors must map through the bed's row order, not the in-chromosome
    bin index — chr21's ids start at row 100 in this bed."""
    _, bed, mat, _ = workload
    n_rows = sum(1 for _ in open(bed))
    biasfile = tmp_path / "ice.bias"
    with open(biasfile, "w") as fh:
        for i in range(n_rows):
            # chr20 rows (0..99) get factor 10, chr21 rows factor 2
            fh.write(f"{10.0 if i < 100 else 2.0}\n")
    from mustache_tpu.io.bias import read_bias

    bias = read_bias(str(biasfile), "21", RES)
    assert bias.by_line
    x0, y0, v0 = read_hicpro(mat, bed, 1_000_000, False, "21", RES)
    x1, y1, v1 = read_hicpro(mat, bed, 1_000_000, bias, "21", RES)
    np.testing.assert_array_equal(x0, x1)
    # every chr21 factor is 2.0 at both anchors: v / 4 exactly — if the
    # lookup used in-chromosome bins, the first 100 bins would get chr20's
    # factor 10 instead
    np.testing.assert_allclose(v1, v0 / 4.0)
