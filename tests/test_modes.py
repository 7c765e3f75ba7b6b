"""Mode tests: --by-strand and --hifi-kinetics end-to-end."""

import numpy as np
import pytest

from ccs_tpu.cli import run
from ccs_tpu.config import CcsConfig
from ccs_tpu.io.bam import BamReader
from ccs_tpu.ops import dna
from ccs_tpu.pipeline.engine import CcsEngine
from ccs_tpu.pipeline.kinetics import codec_v1_decode, codec_v1_encode
from ccs_tpu.sim.simulator import simulate_zmw, write_subreads_bam
from ccs_tpu.statuses import ZmwStatus
from tests.test_engine import zmw_input_from_sim


class TestCodecV1:
    def test_roundtrip_exact_below_64(self):
        f = np.arange(64)
        np.testing.assert_array_equal(codec_v1_decode(codec_v1_encode(f)), f)

    def test_lossy_ranges(self):
        # step 2 in [64, 192)
        assert codec_v1_decode(codec_v1_encode(np.array([65])))[0] in (64, 65, 66)
        # step 4 in [192, 448)
        assert abs(int(codec_v1_decode(codec_v1_encode(np.array([200])))[0]) - 200) <= 4
        # step 8 beyond
        assert abs(int(codec_v1_decode(codec_v1_encode(np.array([500])))[0]) - 500) <= 8
        # saturation
        assert codec_v1_encode(np.array([100000]))[0] == 255


class TestByStrand:
    def test_two_reads_per_zmw(self):
        # per-strand coverage is half the ZMW's passes, so a 10-pass ZMW
        # gives ~5 per strand -> rq just below Q20; relax the gate
        z = simulate_zmw(hole=7, insert_len=250, n_passes=16, snr=9.0)
        engine = CcsEngine(CcsConfig(by_strand=True, min_passes=3,
                                     min_rq=0.95))
        results = engine.process_batch([zmw_input_from_sim(z)])
        assert len(results) == 2
        strands = {r.strand for r in results}
        assert strands == {"fwd", "rev"}
        ok = [r for r in results if r.status == ZmwStatus.SUCCESS]
        assert len(ok) == 2, [r.status.name for r in results]
        # the two strand consensi must be near reverse complements (each
        # strand polishes at ~half the ZMW coverage, so a few residual
        # errors per strand are expected)
        a, b = ok
        from ccs_tpu.ops.align import align_with_retry
        d1 = align_with_retry(a.seq, dna.revcomp(b.seq)).score
        d2 = align_with_retry(a.seq, b.seq).score
        assert min(d1, d2) <= 6, (d1, d2)

    def test_cli_by_strand_names(self, tmp_path):
        in_bam = str(tmp_path / "in.bam")
        write_subreads_bam(in_bam, [simulate_zmw(hole=3, insert_len=200,
                                                 n_passes=16, snr=9.0)])
        out_bam = str(tmp_path / "out.bam")
        rc = run([in_bam, out_bam, "--by-strand", "--min-rq", "0.9",
                  "--suppress-reports"])
        assert rc == 0
        with BamReader(out_bam) as r:
            names = [rec.name for rec in r]
        assert any(n.endswith("/ccs/fwd") for n in names)
        assert any(n.endswith("/ccs/rev") for n in names)


class TestHdFinder:
    def test_heteroduplex_fails_by_default(self):
        from ccs_tpu.sim.simulator import simulate_heteroduplex_zmw
        z = simulate_heteroduplex_zmw(hole=11, insert_len=400, n_passes=12,
                                      ins_len=40, snr=9.0)
        engine = CcsEngine(CcsConfig())
        res = engine.process_batch([zmw_input_from_sim(z)])
        assert res[0].status == ZmwStatus.HETERODUPLEXES

    def test_hd_finder_splits_to_single_strand(self):
        from ccs_tpu.sim.simulator import simulate_heteroduplex_zmw
        z = simulate_heteroduplex_zmw(hole=11, insert_len=400, n_passes=12,
                                      ins_len=40, snr=9.0)
        engine = CcsEngine(CcsConfig(hd_finder=True, min_rq=0.9))
        results = engine.process_batch([zmw_input_from_sim(z)])
        assert len(results) == 2
        assert {r.strand for r in results} == {"fwd", "rev"}
        ok = [r for r in results if r.status == ZmwStatus.SUCCESS]
        assert len(ok) == 2, [r.status.name for r in results]
        # the strand reads should differ in length by ~the heteroduplex insert
        la, lb = sorted(len(r.seq) for r in ok)
        assert 25 <= lb - la <= 55, (la, lb)

    def test_normal_zmw_not_split(self):
        z = simulate_zmw(hole=5, insert_len=300, n_passes=10, snr=9.0)
        engine = CcsEngine(CcsConfig(hd_finder=True))
        results = engine.process_batch([zmw_input_from_sim(z)])
        assert len(results) == 1
        assert results[0].status == ZmwStatus.SUCCESS
        assert results[0].strand == ""


class TestKinetics:
    def test_hifi_kinetics_tags(self, tmp_path):
        in_bam = str(tmp_path / "in.bam")
        write_subreads_bam(in_bam, [simulate_zmw(hole=1, insert_len=200,
                                                 n_passes=8, snr=9.0)],
                           with_kinetics=True)
        out_bam = str(tmp_path / "out.bam")
        rc = run([in_bam, out_bam, "--hifi-kinetics", "--suppress-reports"])
        assert rc == 0
        with BamReader(out_bam) as r:
            recs = list(r)
        assert len(recs) == 1
        rec = recs[0]
        L = len(rec.seq)
        for tag in ("fi", "fp", "ri", "rp"):
            arr = rec.tag(tag)
            assert arr is not None and len(arr) == L, tag
        assert rec.tag("fn") >= 3
        assert rec.tag("rn") >= 3
        # averaged IPD should be within the simulated input range
        ipd = codec_v1_decode(rec.tag("fi"))
        assert 0 < ipd.mean() < 80
