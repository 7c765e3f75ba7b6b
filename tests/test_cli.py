"""End-to-end CLI test: synthetic subreads.bam -> HiFi bam + reports."""

import gzip
import json
import os

import numpy as np
import pytest

from ccs_tpu.cli import run
from ccs_tpu.io.bam import BamReader
from ccs_tpu.io.bgzf import BgzfReader
from ccs_tpu.io.pbi import read_pbi
from ccs_tpu.ops import dna
from ccs_tpu.sim.simulator import simulate_zmw, write_subreads_bam


@pytest.fixture(scope="module")
def subreads_bam(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("data") / "in.subreads.bam")
    zmws = []
    rng = np.random.default_rng(0)
    for h in range(6):
        n_passes = [10, 9, 2, 8, 12, 7][h]  # hole 2 fails min-passes
        snr = 8.5 if h != 4 else 1.5        # hole 4 fails SNR
        zmws.append(simulate_zmw(hole=h, insert_len=250, n_passes=n_passes,
                                 snr=snr))
    write_subreads_bam(path, zmws)
    return path, zmws


class TestCli:
    def test_end_to_end_bam(self, subreads_bam, tmp_path):
        in_bam, zmws = subreads_bam
        out_bam = str(tmp_path / "out.bam")
        rc = run([in_bam, out_bam, "--batch-size", "8"])
        assert rc == 0
        with BamReader(out_bam) as r:
            recs = list(r)
            assert "READTYPE=CCS" in r.header.text
        # holes 0,1,3,5 should pass; 2 (passes) and 4 (snr) fail
        names = [rec.name for rec in recs]
        holes = sorted(int(n.split("/")[1]) for n in names)
        assert holes == [0, 1, 3, 5]
        for rec in recs:
            assert rec.name.endswith("/ccs")
            assert rec.tag("rq") > 0.99
            assert rec.tag("np") >= 6
            assert rec.tag("ec") > 5
            assert rec.tag("zm") is not None
            assert len(rec.seq) > 200
            # QVs are binned to the 7 documented values
            assert set(np.unique(rec.qual)) <= {3, 10, 17, 22, 27, 35, 40}
        # pbi exists and matches
        idx = read_pbi(out_bam + ".pbi")
        assert idx.n_reads == len(recs)

        # reports
        report = open(str(tmp_path / "out.ccs_report.txt")).read()
        assert "ZMWs input                    : 6" in report
        assert "ZMWs pass filters             : 4" in report
        assert "Below SNR threshold           : 1" in report
        assert "Lacking full passes           : 1" in report
        with gzip.open(str(tmp_path / "out.zmw_metrics.json.gz")) as fh:
            metrics = json.load(fh)
        assert len(metrics["zmws"]) == 6
        statuses = {m["zmw"]: m["status"] for m in metrics["zmws"]}
        assert statuses["m00001_260817_000000/4"] == "POOR_SNR"
        assert statuses["m00001_260817_000000/2"] == "TOO_FEW_PASSES"

    def test_chunking_equivalence(self, subreads_bam, tmp_path):
        """--chunk i/N runs merge to the same set of reads (parallelize.md)."""
        in_bam, _ = subreads_bam
        all_names = set()
        for i in (1, 2):
            out = str(tmp_path / f"chunk{i}.bam")
            rc = run([in_bam, out, "--chunk", f"{i}/2", "--suppress-reports"])
            assert rc == 0
            with BamReader(out) as r:
                for rec in r:
                    all_names.add(rec.name)
        out_full = str(tmp_path / "full.bam")
        run([in_bam, out_full, "--suppress-reports"])
        with BamReader(out_full) as r:
            full_names = {rec.name for rec in r}
        assert all_names == full_names

    def test_mode_all(self, subreads_bam, tmp_path):
        """--all: one representative read per productive ZMW (mode-all.md)."""
        in_bam, zmws = subreads_bam
        out_bam = str(tmp_path / "all.bam")
        rc = run([in_bam, out_bam, "--all", "--suppress-reports"])
        assert rc == 0
        with BamReader(out_bam) as r:
            recs = {int(rec.name.split("/")[1]): rec for rec in r}
        # every ZMW except the SNR-failed one (hole 4) gets a read
        assert sorted(recs) == [0, 1, 2, 3, 5]
        # hole 2 (2 full passes -> <2 FL after alignment or low-pass path)
        # must be present; unpolished paths carry rq == -1 and QV10 bases
        for hole, rec in recs.items():
            rq = rec.tag("rq")
            assert rq is not None
            if rq < 0:
                assert set(np.unique(rec.qual)) == {10}

    def test_fastq_output(self, subreads_bam, tmp_path):
        in_bam, _ = subreads_bam
        out_fq = str(tmp_path / "out.fastq.gz")
        rc = run([in_bam, out_fq, "--suppress-reports"])
        assert rc == 0
        data = gzip.decompress(open(out_fq, "rb").read()).decode()
        lines = data.strip().split("\n")
        assert len(lines) % 4 == 0
        assert lines[0].startswith("@m00001_260817_000000/")
        assert set(lines[1]) <= set("ACGT")
