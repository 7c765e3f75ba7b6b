"""Fail-read path (C15/statuses): ff bitmask, fail_reads.bam, control
classification, CLR subsampling, --stderr-json-log.

Reference contracts: fail-reads.md:7-21 (ff bits), revio.md:61-76 (file
split), changelog.md:28,37 (CLR subsampling), sqiie.md:46 (json log).
"""

import json
import os

import numpy as np
import pytest

from ccs_tpu.config import CcsConfig
from ccs_tpu.ops import dna
from ccs_tpu.pipeline.adapters import (FF_BELOW_Q20, FF_CONTROL,
                                       FF_MEDIAN_SUBREAD)
from ccs_tpu.pipeline.engine import CcsEngine
from ccs_tpu.pipeline.zmw import Subread, ZmwInput
from ccs_tpu.sim.simulator import simulate_zmw, write_subreads_bam
from ccs_tpu.statuses import ZmwStatus


def _zin(z, movie="m_fail"):
    subs, qpos = [], 0
    for read, cx in zip(z.subreads, z.cx):
        subs.append(Subread(seq=read, cx=cx, qs=qpos, qe=qpos + len(read)))
        qpos += len(read) + 40
    return ZmwInput(hole=z.hole, movie=movie, subreads=subs, snr=z.snr)


def test_median_subread_representative_on_failure():
    eng = CcsEngine(CcsConfig())
    # 2 full passes < min-passes 3 -> TOO_FEW_PASSES, but a FL subread exists
    z = simulate_zmw(hole=5, insert_len=150, n_passes=2, snr=9.0)
    res = eng.process_batch([_zin(z)])[0]
    assert res.status == ZmwStatus.TOO_FEW_PASSES
    assert res.fail_rep is not None and len(res.fail_rep) > 50
    assert res.ff & FF_MEDIAN_SUBREAD


def test_below_q20_sets_ff_and_poor_quality():
    eng = CcsEngine(CcsConfig(min_rq=0.999999))
    z = simulate_zmw(hole=6, insert_len=150, n_passes=5, snr=6.0)
    res = eng.process_batch([_zin(z)])[0]
    assert res.status == ZmwStatus.POOR_QUALITY
    assert res.seq is not None  # the consensus IS the fail representative


def test_full_length_subread_status_in_all_mode(monkeypatch):
    import ccs_tpu.pipeline.zmw as zmw_mod

    class _NoDraft:
        draft = None
        strands = []
        mapped = []
        n_mapped = 0

    monkeypatch.setattr(zmw_mod, "generate_draft",
                        lambda *a, **k: _NoDraft())
    eng = CcsEngine(CcsConfig(mode_all=True))
    z = simulate_zmw(hole=7, insert_len=150, n_passes=6, snr=9.0)
    res = eng.process_batch([_zin(z)])[0]
    assert res.status == ZmwStatus.FULL_LENGTH_SUBREAD
    assert res.ff & FF_MEDIAN_SUBREAD
    assert res.fail_rep is not None


def test_too_many_unusable_when_lanes_dropped(monkeypatch):
    # thin the window batch so most subread lanes were dropped (the C6
    # large-insertion trim dropping lanes per window at scale)
    import ccs_tpu.pipeline.zmw as zmw_mod
    orig = zmw_mod.build_window_batch

    def thinned(*a, **k):
        b = orig(*a, **k)
        b.rlens[:, 2:] = -1
        b.reads[:, 2:] = -1
        return b

    monkeypatch.setattr(zmw_mod, "build_window_batch", thinned)
    eng = CcsEngine(CcsConfig())
    z = simulate_zmw(hole=8, insert_len=300, n_passes=10, snr=9.0)
    res = eng.process_batch([_zin(z)])[0]
    assert res.status == ZmwStatus.TOO_MANY_UNUSABLE, res.status.name
    assert res.ff & FF_MEDIAN_SUBREAD


def test_control_classification(tmp_path):
    rng = np.random.default_rng(1)
    control = rng.integers(0, 4, 800).astype(np.int8)
    fasta = tmp_path / "controls.fasta"
    fasta.write_text(">ctrl\n" + dna.decode(control).decode() + "\n")

    eng = CcsEngine(CcsConfig(tpu_control_fasta=str(fasta)))
    # a ZMW whose insert IS (a slice of) the control
    from ccs_tpu.sim.simulator import simulate_read
    from ccs_tpu.models.chemistry import default_params
    params = default_params()
    subs, qpos = [], 0
    for p in range(8):
        tpl = control[100:400] if p % 2 == 0 else dna.revcomp(control[100:400])
        read = simulate_read(tpl, params, 5, rng)
        subs.append(Subread(seq=read, cx=3, qs=qpos, qe=qpos + len(read)))
        qpos += len(read) + 40
    ctrl_zmw = ZmwInput(hole=1, movie="m_fail", subreads=subs,
                        snr=np.full(4, 9.0, np.float32))
    normal = _zin(simulate_zmw(hole=2, insert_len=300, n_passes=8, snr=9.0))
    res_c, res_n = eng.process_batch([ctrl_zmw, normal])
    assert res_c.status in (ZmwStatus.CONTROL_SUCCESS,
                            ZmwStatus.CONTROL_FAILURE), res_c.status.name
    assert res_c.ff & FF_CONTROL
    assert res_n.status == ZmwStatus.SUCCESS
    assert not res_n.ff & FF_CONTROL


def test_cli_fail_reads_bam_and_clr_and_jsonlog(tmp_path, capfd):
    from ccs_tpu.cli import run
    from ccs_tpu.io.bam import BamReader
    from ccs_tpu.io.pbi import read_pbi

    inp = str(tmp_path / "in.subreads.bam")
    zmws = [simulate_zmw(hole=h, insert_len=150,
                         n_passes=[9, 2, 8][h], snr=[8.5, 8.5, 1.0][h])
            for h in range(3)]
    write_subreads_bam(inp, zmws)
    out = str(tmp_path / "out.bam")
    rc = run([inp, out, "--subsample-clr-perc", "100",
              "--stderr-json-log", "--log-level", "INFO"])
    assert rc == 0
    _, err = capfd.readouterr()

    # fail_reads.bam: hole 1 (TOO_FEW_PASSES, has FL subread) must appear
    fail_path = str(tmp_path / "out.fail_reads.bam")
    assert os.path.exists(fail_path)
    fails = {rec.tag("zm"): rec for rec in BamReader(fail_path)}
    assert 1 in fails
    assert fails[1].tag("ff") & FF_MEDIAN_SUBREAD

    # CLR subsample: hole 0 is the only productive ZMW; perc=100 keeps it
    clr_xml = str(tmp_path / "out.subsampled.subreadset.xml")
    assert os.path.exists(clr_xml)
    txt = open(clr_xml).read()
    assert "SubreadSet" in txt and 'Value="[0]"' in txt
    idx = read_pbi(clr_xml + ".pbi")
    assert set(idx.hole_number.tolist()) == {0}

    # --stderr-json-log: INFO lines are JSON objects
    json_lines = [ln for ln in err.splitlines() if ln.startswith("{")]
    assert json_lines, err
    parsed = json.loads(json_lines[0])
    assert {"timestamp", "level", "message"} <= set(parsed)
