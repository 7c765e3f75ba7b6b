"""Batch engine: concatenate windows from many ZMWs into one device polish.

This is the L5→L3 coupling (SURVEY.md §1 TPU re-layering): the host prepares
ZMWs (filters/draft/windows), all windows across the batch are flattened into
one [W_total, ...] device call (window-level data parallelism — the TPU
analog of the reference's thread pool), and results scatter back per ZMW for
stitching. Shapes are bucketed (pow2 window count, multiple-of-8 coverage)
to bound XLA recompilation.
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ccs_tpu.config import CcsConfig
from ccs_tpu.models.chemistry import ArrowParams, default_params
from ccs_tpu.ops import hmm_jax
from ccs_tpu.pipeline.polish import polish_windows
from ccs_tpu.pipeline.zmw import (ConsensusResult, ZmwInput, ZmwWorkItem,
                                  finalize_zmw, prepare_zmw)
from ccs_tpu.statuses import ZmwStatus

logger = logging.getLogger("ccs_tpu")


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


class CcsEngine:
    """Stateless-per-batch CCS engine over one set of Arrow parameters."""

    def __init__(self, cfg: Optional[CcsConfig] = None,
                 params: Optional[ArrowParams] = None):
        self.cfg = (cfg or CcsConfig()).resolve_mode_all()
        self.params = params or default_params()
        self.tables = hmm_jax.params_to_device(self.params)

    def process_batch(self, zmws: Sequence[ZmwInput]) -> list[ConsensusResult]:
        """Process a batch of ZMWs end to end. Order-preserving. In
        --by-strand mode each input ZMW yields up to two results
        (/fwd and /rev; mode-by-strand.md:7-23)."""
        work: list[tuple[ZmwInput, str]] = []
        for z in zmws:
            if self.cfg.by_strand:
                from ccs_tpu.pipeline.zmw import split_by_strand
                f, r = split_by_strand(z)
                work.append((f, "fwd"))
                work.append((r, "rev"))
            else:
                work.append((z, ""))

        items: list[ZmwWorkItem] = []
        for z, strand in work:
            try:
                item = prepare_zmw(z, self.cfg, self.params.snr_edges)
            except Exception:  # noqa: BLE001 — failures are data (SURVEY §5)
                logger.exception("prepare failed for ZMW %s", z.hole)
                res = ConsensusResult(hole=z.hole, movie=z.movie,
                                      status=ZmwStatus.EXCEPTION_THROWN)
                item = ZmwWorkItem(z, res, None)
            if (self.cfg.hd_finder and not strand
                    and item.result.status == ZmwStatus.HETERODUPLEXES):
                # --hd-finder: split the heteroduplex ZMW on the fly into
                # single-strand runs (mode-heteroduplex-filtering.md:25-39)
                from ccs_tpu.pipeline.zmw import split_by_strand
                import dataclasses as _dc
                ss_cfg = _dc.replace(self.cfg, by_strand=True, hd_finder=False)
                for zz, ss in zip(split_by_strand(z), ("fwd", "rev")):
                    try:
                        ss_item = prepare_zmw(zz, ss_cfg, self.params.snr_edges)
                    except Exception:  # noqa: BLE001
                        logger.exception("ss prepare failed for ZMW %s", z.hole)
                        ss_res = ConsensusResult(
                            hole=z.hole, movie=z.movie,
                            status=ZmwStatus.EXCEPTION_THROWN)
                        ss_item = ZmwWorkItem(zz, ss_res, None)
                    ss_item.result.strand = ss
                    items.append(ss_item)
                continue
            item.result.strand = strand
            items.append(item)

        live = [it for it in items if not it.terminal]
        if live:
            # C7 candidate filtering is a speed heuristic; tandem-repeat ZMWs
            # implicitly disable it (low-complexity.md:15-17), --disable-
            # heuristics globally. Those windows run the exhaustive scan.
            fast = [it for it in live if not (
                self.cfg.disable_heuristics or it.result.has_tandem_repeat)]
            full = [it for it in live if (
                self.cfg.disable_heuristics or it.result.has_tandem_repeat)]
            if fast:
                self._polish_live(fast, heuristics=True)
            if full:
                self._polish_live(full, heuristics=False)
        return [it.result for it in items]

    # -- device phase --
    def _polish_live(self, live: list[ZmwWorkItem],
                     heuristics: bool = True) -> None:
        cfg = self.cfg
        t_cap = cfg.tpu_window_tpl_cap
        r_cap = cfg.tpu_window_read_cap
        counts = [len(it.batch.windows) for it in live]
        W_total = sum(counts)
        W_pad = _next_pow2(max(W_total, 8))
        C_max = max(int(it.batch.reads.shape[1]) for it in live)
        C_pad = ((max(C_max, 1) + 7) // 8) * 8

        tpl = np.full((W_pad, t_cap), -1, np.int8)
        tlen = np.ones(W_pad, np.int32)
        cs = np.zeros(W_pad, np.int32)
        ce = np.zeros(W_pad, np.int32)
        snr_bin = np.zeros(W_pad, np.int32)
        reads = np.full((W_pad, C_pad, r_cap), -1, np.int8)
        rlens = np.full((W_pad, C_pad), -1, np.int32)
        is_first = np.zeros(W_pad, dtype=bool)
        priority = np.zeros((W_pad, t_cap), np.float32)

        off = 0
        for it in live:
            b = it.batch
            n = len(b.windows)
            c = b.reads.shape[1]
            is_first[off] = True
            tpl[off:off + n] = b.tpl
            tlen[off:off + n] = b.tlen
            cs[off:off + n] = b.core_start
            ce[off:off + n] = b.core_end
            snr_bin[off:off + n] = it.snr_bin
            reads[off:off + n, :c] = b.reads
            rlens[off:off + n, :c] = b.rlens
            priority[off:off + n] = b.priority
            off += n

        state, qv, _p_err = polish_windows(
            jnp.asarray(tpl), jnp.asarray(tlen), jnp.asarray(cs),
            jnp.asarray(ce), jnp.asarray(snr_bin), jnp.asarray(reads),
            jnp.asarray(rlens), self.tables,
            max_iters=cfg.max_polish_iterations,
            is_first=jnp.asarray(is_first),
            heuristics=heuristics, k_cand=cfg.tpu_polish_k,
            priority=jnp.asarray(priority) if heuristics else None)
        out_tpl = np.asarray(state.tpl)
        out_tlen = np.asarray(state.tlen)
        out_cs = np.asarray(state.core_start)
        out_ce = np.asarray(state.core_end)
        out_qv = np.asarray(qv)
        # a window is non-convergent if it was still active at the iter cap
        nonconv = np.asarray(state.active)

        off = 0
        for it, n in zip(live, counts):
            sl = slice(off, off + n)
            try:
                it.result = finalize_zmw(
                    it, out_tpl[sl], out_tlen[sl], out_cs[sl], out_ce[sl],
                    out_qv[sl], ~nonconv[sl], self.cfg)
            except Exception:  # noqa: BLE001
                logger.exception("finalize failed for ZMW %s", it.zmw.hole)
                it.result.status = ZmwStatus.EXCEPTION_THROWN
            off += n
