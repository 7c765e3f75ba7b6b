"""End-to-end engine integration: simulated ZMWs -> consensus == truth.

SURVEY.md §4.2(3): polishing subreads simulated from the same Arrow HMM must
recover the template with calibrated QVs.
"""

import numpy as np
import pytest

from ccs_tpu.config import CcsConfig
from ccs_tpu.ops import dna
from ccs_tpu.pipeline.engine import CcsEngine
from ccs_tpu.pipeline.zmw import Subread, ZmwInput
from ccs_tpu.sim.simulator import simulate_zmw
from ccs_tpu.statuses import ZmwStatus


def zmw_input_from_sim(z, movie="m_test"):
    subs = []
    qpos = 0
    for read, cx in zip(z.subreads, z.cx):
        subs.append(Subread(seq=read, cx=cx, qs=qpos, qe=qpos + len(read)))
        qpos += len(read) + 40
    return ZmwInput(hole=z.hole, movie=movie, subreads=subs, snr=z.snr)


@pytest.fixture(scope="module")
def engine():
    cfg = CcsConfig(batch_size=8, min_length=10)
    return CcsEngine(cfg)


class TestEngine:
    def test_recovers_insert_exactly(self, engine):
        zmws = [simulate_zmw(hole=h, insert_len=300, n_passes=10, snr=9.0)
                for h in range(3)]
        results = engine.process_batch([zmw_input_from_sim(z) for z in zmws])
        assert len(results) == 3
        n_exact = 0
        total_dist = 0
        from ccs_tpu.ops.align import align_with_retry
        for z, r in zip(zmws, results):
            assert r.status == ZmwStatus.SUCCESS, r.status.name
            got = r.seq
            want = z.insert
            if np.array_equal(got, want) or np.array_equal(got, dna.revcomp(want)):
                n_exact += 1
            else:
                a1 = align_with_retry(got, want)
                a2 = align_with_retry(got, dna.revcomp(want))
                total_dist += min(a1.score, a2.score)
            assert r.rq > 0.99
            assert r.num_passes >= 8
        assert n_exact >= 2, f"only {n_exact}/3 exact (total dist {total_dist})"
        assert total_dist <= 3, f"total consensus error {total_dist}"

    def test_failure_statuses(self, engine):
        # ZMW with low SNR
        z = simulate_zmw(hole=100, insert_len=200, n_passes=5, snr=1.0)
        res = engine.process_batch([zmw_input_from_sim(z)])
        assert res[0].status == ZmwStatus.POOR_SNR
        # ZMW with too few passes
        z = simulate_zmw(hole=101, insert_len=200, n_passes=2, snr=9.0)
        res = engine.process_batch([zmw_input_from_sim(z)])
        assert res[0].status == ZmwStatus.TOO_FEW_PASSES
        # no subreads
        res = engine.process_batch([
            ZmwInput(hole=102, movie="m", subreads=[],
                     snr=np.array([9.0] * 4, np.float32))])
        assert res[0].status == ZmwStatus.NO_SUBREADS

    def test_mixed_batch(self, engine):
        """Failed ZMWs never poison the batch; order is preserved."""
        good = simulate_zmw(hole=1, insert_len=250, n_passes=9, snr=9.0)
        bad = simulate_zmw(hole=2, insert_len=250, n_passes=2, snr=9.0)
        good2 = simulate_zmw(hole=3, insert_len=200, n_passes=8, snr=8.0)
        results = engine.process_batch(
            [zmw_input_from_sim(z) for z in (good, bad, good2)])
        assert [r.hole for r in results] == [1, 2, 3]
        assert results[0].status == ZmwStatus.SUCCESS
        assert results[1].status == ZmwStatus.TOO_FEW_PASSES
        assert results[2].status == ZmwStatus.SUCCESS

    def test_qv_calibration(self, engine):
        """SURVEY §4.2(3): predicted vs empirical error across pass counts.

        Subreads are sampled from the SAME Arrow HMM the polisher scores
        with, so the QVs must be statistically calibrated: the summed
        per-base error probability (expected errors) must match the observed
        edit distance to the true insert, aggregated over enough bases to
        beat Poisson noise. Bound: within 3 QV (2x) two-sided, with a count
        floor so a lucky zero doesn't fail the lower side."""
        from ccs_tpu.ops.align import align_with_retry
        zmws = []
        hole = 200
        for n_passes in (5, 8, 12):
            for _ in range(4):
                zmws.append(simulate_zmw(hole=hole, insert_len=300,
                                         n_passes=n_passes, snr=8.5))
                hole += 1
        results = engine.process_batch([zmw_input_from_sim(z) for z in zmws])
        tot_pred = 0.0
        tot_emp = 0
        tot_bases = 0
        emp_high = 0      # residual errors on >=10-pass ZMWs
        pred_high = 0.0   # their own predicted error mass
        n_high = 0
        for z, r in zip(zmws, results):
            # low-pass ZMWs may legitimately fall under the Q20 gate (the
            # reference's pass-accuracy curve crosses Q20 around 7-9
            # passes); their consensus+QVs still exist and still count
            # toward calibration
            assert r.status in (ZmwStatus.SUCCESS, ZmwStatus.POOR_QUALITY), \
                (z.hole, r.status.name)
            if len(z.subreads) >= 10:
                assert r.status == ZmwStatus.SUCCESS, (z.hole, r.status.name)
            want = z.insert
            got = r.seq
            a1 = align_with_retry(got, want)
            a2 = align_with_retry(got, dna.revcomp(want))
            dist = min(a1.score, a2.score)
            tot_emp += dist
            tot_bases += len(got)
            tot_pred += float(np.power(10.0, -r.qv / 10.0).sum())
            if len(z.subreads) >= 10:
                emp_high += dist
                pred_high += float(np.power(10.0, -r.qv / 10.0).sum())
                n_high += 1
        assert tot_bases > 0
        # two-sided calibration: predicted expected errors within 2x of
        # observed (3 QV), with floors against small-count noise
        assert tot_emp <= max(2.0 * tot_pred, 6.0), (tot_pred, tot_emp)
        assert tot_pred <= max(2.0 * tot_emp, 6.0), (tot_pred, tot_emp)
        # high-pass residual errors must track their own predicted error
        # mass (the reference accuracy curve sits near Q30 at ~12 passes,
        # i.e. ~0.3 expected errors per 300 bp read — "near zero absolute"
        # would be stricter than the documented curve itself,
        # accuracy-vs-passes.md). pred_high is accumulated below.
        assert n_high >= 4
        assert emp_high <= max(2.0 * pred_high, 3.0), (emp_high, pred_high)
