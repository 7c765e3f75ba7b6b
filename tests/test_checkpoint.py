"""Checkpoint/resume (SURVEY §5): a run killed mid-way and resumed with
--tpu-resume-dir produces byte-identical outputs to an uninterrupted run."""

import json
import os

import numpy as np
import pytest

from ccs_tpu.cli import run
from ccs_tpu.io.bam import BamReader
from ccs_tpu.sim.simulator import simulate_zmw, write_subreads_bam


@pytest.fixture(scope="module")
def cell(tmp_path_factory):
    d = tmp_path_factory.mktemp("ckpt")
    inp = str(d / "in.subreads.bam")
    zmws = [simulate_zmw(hole=h, insert_len=140, n_passes=8, snr=9.0)
            for h in range(6)]
    write_subreads_bam(inp, zmws)
    return d, inp


def _read_all(path):
    return [(r.name, r.seq.tobytes(), r.qual.tobytes() if r.qual is not None
             else b"", r.tag("rq")) for r in BamReader(path)]


def test_resume_matches_uninterrupted(cell, monkeypatch):
    d, inp = cell
    ref_out = str(d / "ref.bam")
    assert run([inp, ref_out, "--min-rq", "0.9", "--batch-size", "2",
                "--suppress-reports"]) == 0
    ref = _read_all(ref_out)
    assert len(ref) == 6

    # run 1: crash after the second flushed batch
    ck = str(d / "ck")
    out = str(d / "res.bam")
    import ccs_tpu.pipeline.checkpoint as cp
    orig = cp.Checkpointer.write_batch
    calls = {"n": 0}

    def bomb(self, *a, **k):
        orig(self, *a, **k)
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("simulated crash")

    monkeypatch.setattr(cp.Checkpointer, "write_batch", bomb)
    with pytest.raises(RuntimeError, match="simulated crash"):
        run([inp, out, "--min-rq", "0.9", "--batch-size", "2",
             "--suppress-reports", "--tpu-resume-dir", ck])
    monkeypatch.setattr(cp.Checkpointer, "write_batch", orig)
    wm = json.load(open(os.path.join(ck, "watermark.json")))
    assert wm["n_batches"] == 2 and wm["last_hole"] == 3

    # run 2: resume; only the remaining ZMWs are processed. Spy on the
    # pipeline's input stream in the MAIN process (prepare itself fans out
    # over worker processes, which a monkeypatch cannot see).
    seen_holes = []
    import ccs_tpu.pipeline.orchestrator as orch
    orig_rp = orch.run_pipeline

    def spy_rp(engine, zmw_iter, emit, **kw):
        def watched():
            for z in zmw_iter:
                seen_holes.append(z.hole)
                yield z
        return orig_rp(engine, watched(), emit, **kw)

    monkeypatch.setattr(orch, "run_pipeline", spy_rp)
    assert run([inp, out, "--min-rq", "0.9", "--batch-size", "2",
                "--suppress-reports", "--tpu-resume-dir", ck]) == 0
    assert min(seen_holes) >= 4, seen_holes  # holes 0..3 were not reprocessed

    got = _read_all(out)
    assert got == ref
    # temp files cleaned up after successful merge
    assert not os.path.exists(os.path.join(ck, "watermark.json"))


def test_stats_roundtrip():
    from ccs_tpu.pipeline.checkpoint import stats_delta_dict, stats_from_delta
    from ccs_tpu.report.stats import RunStats
    from ccs_tpu.pipeline.zmw import ConsensusResult
    from ccs_tpu.statuses import ZmwStatus
    st = RunStats()
    st.add_zmws(2)
    st.add(ConsensusResult(hole=1, movie="m", status=ZmwStatus.SUCCESS,
                           seq=np.zeros(5, np.int8),
                           qv=np.full(5, 31.0, np.float32), rq=0.999))
    st.add(ConsensusResult(hole=2, movie="m", status=ZmwStatus.POOR_SNR))
    rt = stats_from_delta(json.loads(json.dumps(stats_delta_dict(st))))
    assert rt.n_input == 2 and rt.n_zmws == 2
    assert rt.status_counts[ZmwStatus.SUCCESS] == 1
    assert rt.read_lengths == [5]
