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
        """Predicted error rate should match empirical error rate within ~3x."""
        zmws = [simulate_zmw(hole=h, insert_len=400, n_passes=7, snr=8.0)
                for h in range(10, 14)]
        results = engine.process_batch([zmw_input_from_sim(z) for z in zmws])
        tot_pred_err = 0.0
        tot_emp_err = 0
        tot_bases = 0
        for z, r in zip(zmws, results):
            if r.status != ZmwStatus.SUCCESS:
                continue
            want = z.insert
            got = r.seq
            if not np.array_equal(got[:5], want[:5]):
                want = dna.revcomp(want)
            from ccs_tpu.ops.align import align_with_retry
            aln = align_with_retry(got, want)
            tot_emp_err += aln.score
            tot_bases += len(got)
            tot_pred_err += float(np.power(10.0, -r.qv / 10.0).sum())
        assert tot_bases > 0
        pred_rate = tot_pred_err / tot_bases
        emp_rate = tot_emp_err / tot_bases
        # loose calibration bound (proper fitting comes later)
        assert emp_rate < max(5 * pred_rate, 0.01), (pred_rate, emp_rate)
