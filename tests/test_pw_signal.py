"""Pulse-width conditioning carries real signal end to end (VERDICT r3
missing 6 / next-round 9).

The documented model keys emissions on PW (how-does-ccs-work.md:88-95)
because branch/stick artifacts ride on short pulses while true
incorporations hold the polymerase longer. The simulator now samples pw per
event class (sim.simulator.sample_pw_frames); these tests close the loop:
fitting recovers pw factors that depart from 1, and pw-conditioned
consensus beats pw-blind consensus under chemistry mismatch.
"""

import dataclasses

import numpy as np
import pytest

from ccs_tpu.config import CcsConfig
from ccs_tpu.models.chemistry import default_params
from ccs_tpu.models.fit import fit_from_zmws
from ccs_tpu.pipeline.engine import CcsEngine
from ccs_tpu.pipeline.zmw import Subread, ZmwInput
from ccs_tpu.sim.simulator import simulate_zmw
from ccs_tpu.statuses import ZmwStatus


def _zin(z):
    subs, qpos = [], 0
    pws = z.pws if z.pws is not None else [None] * len(z.subreads)
    for read, cx, pw in zip(z.subreads, z.cx, pws):
        subs.append(Subread(seq=read, cx=cx, qs=qpos, qe=qpos + len(read),
                            pw=pw))
        qpos += len(read) + 40
    return ZmwInput(hole=z.hole, movie="m_pw", subreads=subs, snr=z.snr)


def perturbed():
    p = default_params()
    trans = p.trans.copy()
    trans[..., 1] *= 1.7
    trans[..., 2] *= 1.7
    trans[..., 3] *= 1.7
    trans /= trans.sum(-1, keepdims=True)
    return dataclasses.replace(p, trans=trans)


def test_fit_recovers_pw_signal():
    """pw_ins/pw_match ratios must depart measurably from 1 when the
    generating process correlates pulse width with event class."""
    rng = np.random.default_rng(3)
    zmws = [_zin(simulate_zmw(h, 400, 8, rng=rng, snr=9.0, with_pw=True))
            for h in range(10)]
    fitted = fit_from_zmws(zmws, name="pw-fit")
    s = int(fitted.snr_bin(9.0))
    # short pulses (bin 1) are evidence FOR an insertion artifact, long
    # pulses (bin 3) against it
    assert fitted.pw_ins[s, 1] > 1.3 * fitted.pw_match[s, 1], (
        fitted.pw_ins[s], fitted.pw_match[s])
    assert fitted.pw_ins[s, 3] < 0.8 * fitted.pw_match[s, 3], (
        fitted.pw_ins[s], fitted.pw_match[s])


@pytest.mark.slow
def test_pw_on_beats_pw_off_under_mismatch():
    """With a misspecified chemistry, the pw likelihood factors must reduce
    consensus errors: insertions the base-only scorer keeps are rejected by
    their short pulses."""
    from ccs_tpu.ops.align import guided_align
    from ccs_tpu.ops import dna

    chem = perturbed()
    rng = np.random.default_rng(17)
    sims = [simulate_zmw(h, 300, 6, params=chem, rng=rng, snr=9.0,
                         with_pw=True) for h in range(12)]
    zmws = [_zin(z) for z in sims]
    fitted = fit_from_zmws(zmws, name="pw-fit-mm")
    blind = dataclasses.replace(
        fitted, pw_match=np.ones_like(fitted.pw_match),
        pw_ins=np.ones_like(fitted.pw_ins))

    def errors(eng):
        res = eng.process_batch(zmws)
        tot = 0
        for r, z in zip(res, sims):
            if r.status != ZmwStatus.SUCCESS or r.seq is None:
                tot += len(z.insert)
                continue
            best = None
            for t in (z.insert, dna.revcomp(z.insert)):
                aln = guided_align(np.asarray(r.seq), t, band=48)
                if aln is None:
                    continue
                i = j = d = 0
                for ln, op in aln.cigar:
                    if op == "M":
                        d += int((np.asarray(r.seq[i:i + ln]) !=
                                  t[j:j + ln]).sum())
                        i += ln
                        j += ln
                    elif op == "I":
                        d += ln
                        i += ln
                    else:
                        d += ln
                        j += ln
                best = d if best is None else min(best, d)
            tot += best if best is not None else len(z.insert)
        return tot

    cfg = CcsConfig(batch_size=16, tpu_mesh_shape=(1,))
    e_on = errors(CcsEngine(cfg, params=fitted))
    e_off = errors(CcsEngine(cfg, params=blind))
    assert e_on <= e_off, (e_on, e_off)
