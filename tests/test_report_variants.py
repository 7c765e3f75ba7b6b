"""Strand-aware report variants: --hd-finder two-column and --by-strand
single-column ccs_report.txt, plus the DS/SS summary block
(mode-heteroduplex-filtering.md:85-117, mode-by-strand.md:58-89)."""

import re

import pytest

from ccs_tpu.cli import run
from ccs_tpu.sim.simulator import simulate_zmw, write_subreads_bam


@pytest.fixture(scope="module")
def cell(tmp_path_factory):
    d = tmp_path_factory.mktemp("cell")
    inp = str(d / "in.subreads.bam")
    zmws = [simulate_zmw(hole=h, insert_len=150, n_passes=8, snr=9.0)
            for h in range(3)]
    zmws.append(simulate_zmw(hole=3, insert_len=150, n_passes=2, snr=9.0))
    write_subreads_bam(inp, zmws)
    return d, inp


def test_by_strand_report_single_column(cell, capfd):
    d, inp = cell
    out = str(d / "bs.bam")
    rc = run([inp, out, "--by-strand", "--min-passes", "2",
              "--min-rq", "0.9", "--log-level", "INFO"])
    assert rc == 0
    _, err = capfd.readouterr()
    rep = open(str(d / "bs.ccs_report.txt")).read()
    lines = rep.splitlines()
    assert lines[0].strip() == "Single-Strand Reads"
    m = re.match(r"Inputs\s*:\s*(\d+) \(([\d.]+)%\)", lines[1])
    assert m, lines[1]
    assert int(m.group(1)) == 8            # 4 ZMWs x 2 strands
    assert "Double-Strand" not in rep
    assert "Exclusive failed counts" in rep
    assert "Shortcut filters" in rep
    # summary block has DS/SS sub-rows and the strand abbreviations
    assert "SS-ZMW" in err
    assert err.count(" - DS / SS") >= 3


def test_hd_finder_report_two_columns(cell, capfd):
    d, inp = cell
    out = str(d / "hd.bam")
    rc = run([inp, out, "--hd-finder", "--min-passes", "2",
              "--min-rq", "0.9", "--log-level", "INFO"])
    assert rc == 0
    capfd.readouterr()
    rep = open(str(d / "hd.ccs_report.txt")).read()
    lines = rep.splitlines()
    assert "Double-Strand Reads" in lines[0]
    assert "Single-Strand Reads" in lines[0]
    # every count row has two (count, pct) cells
    m = re.match(r"Passed\s*:\s*\d+ \([\d.]+%\)\s+\d+ \([\d.]+%\)", lines[3])
    assert m, lines[3]
    assert "Exclusive failed counts" in rep


def test_default_report_unchanged(cell):
    d, inp = cell
    out = str(d / "def.bam")
    rc = run([inp, out, "--min-passes", "2", "--min-rq", "0.9"])
    assert rc == 0
    rep = open(str(d / "def.ccs_report.txt")).read()
    assert rep.startswith("ZMWs input")
    assert "ZMWs pass filters" in rep
