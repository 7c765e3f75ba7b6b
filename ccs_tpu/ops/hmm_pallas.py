"""Pallas TPU kernel for the batched Arrow pair-HMM forward pass (C8).

Same contract as :func:`ccs_tpu.ops.hmm_jax.forward_batch`, fused into one
TPU kernel. Motivation (SURVEY.md §7 hard-part 1 + pallas guide): the
``lax.scan`` formulation re-reads the per-position emission tables from HBM
on every read step (~tables × R traffic); here the tables live in VMEM for
the whole DP, so HBM traffic is one read of each operand.

Layout (guide: lane axis = 128-wide last dim, sublane = second-to-last):

- one *lane* = one template row (a window, or a mutant during mutation
  scoring). Template positions 0..T live on the sublane axis.
- the C subread slots of a row are a static Python loop inside the kernel,
  so the emission tables — which depend on the template, not the subread —
  are fetched once per row instead of once per (row, subread) pair.
- read positions are a ``fori_loop``; each step is pure VPU work on
  [T+1, LANE_BLOCK] f32 tiles.

The delete chain ``x[j] = a[j]·x[j-1] + b[j]`` is solved with 3 doubling
steps (covers runs ≤ 7; deletion probabilities are ≲0.1 so the truncation
error is <1e-7 relative, same regime as hmm_jax.DELETE_CHAIN_DEPTH).

Reference behavior: /root/reference/docs/how-does-ccs-work.md:87-101 (the
Arrow likelihood is what PacBio ported to GPUs on Revio, revio.md:14-27).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ccs_tpu.ops.hmm_jax import position_tables

TINY = 1e-30
DEFAULT_LANE_BLOCK = 512


def _shift_down(v: jnp.ndarray, d: int) -> jnp.ndarray:
    """Shift rows down by d along the sublane axis, zero-filling the top."""
    rolled = pltpu.roll(v, d, axis=0)
    row = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
    return jnp.where(row < d, 0.0, rolled)


def _fwd_kernel(me_ref, ie_ref, a_ref, a0_ref, reads_ref, tl_ref, rl_ref,
                out_ref, *, n_lanes_c: int, n_reads: int):
    """One lane-block of the forward DP.

    me_ref, ie_ref : [4, T, LB] f32   emission prob for read base b at tpl pos
    a_ref          : [T+1, LB] f32    delete-chain coefficient (0 at row 0)
    a0_ref         : [T+1, LB] f32    alpha row for the empty read prefix
    reads_ref      : [R, C, LB] i32   read base codes (-1 pad); read-step
                                       index on the leading (untiled) dim so
                                       the per-step load is a plain row fetch
    tl_ref         : [1, LB] int32    template length (alpha index of the end)
    rl_ref         : [C, LB] int32    read lengths (<0 = absent lane)
    out_ref        : [C, LB] f32      log P(read | template)
    """
    a = a_ref[:]
    a0 = a0_ref[:]
    tl = tl_ref[:]                                        # [1, LB]
    row_id = jax.lax.broadcasted_iota(jnp.int32, a0.shape, 0)
    end_mask = (row_id == tl).astype(jnp.float32)         # [T+1, LB]
    me = me_ref[:]                                        # [4, T, LB]
    ie = ie_ref[:]
    rl_all = rl_ref[:]                                    # [C, LB]

    rows = []
    for c in range(n_lanes_c):
        rl = rl_all[c:c + 1]                              # [1, LB]

        def step(i, carry):
            alpha, ls = carry
            bc = reads_ref[i][c:c + 1]                    # [1, LB] int32
            me_i = jnp.zeros_like(me[0])
            ie_i = jnp.zeros_like(ie[0])
            for b in range(4):
                sel = (bc == b).astype(jnp.float32)       # [1, LB] -> bcast
                me_i = me_i + me[b] * sel
                ie_i = ie_i + ie[b] * sel
            prev = alpha[:-1]                             # [T, LB]
            diag = prev * me_i                            # lands at j+1
            vert = prev * ie_i                            # stays at j
            zero = jnp.zeros((1, prev.shape[1]), jnp.float32)
            base = (jnp.concatenate([zero, diag], axis=0)
                    + jnp.concatenate([vert, zero], axis=0))
            # delete chain: 3 doubling steps == runs up to length 7
            x, coef = base, a
            for d in (1, 2, 4):
                x = x + coef * _shift_down(x, d)
                coef = coef * _shift_down(coef, d)
            scale = jnp.maximum(jnp.max(x, axis=0, keepdims=True), TINY)
            active = i < rl                               # [1, LB]
            alpha = jnp.where(active, x * (1.0 / scale), alpha)
            ls = jnp.where(active, ls + jnp.log(scale), ls)
            return alpha, ls

        init = (a0, jnp.zeros((1, a0.shape[1]), jnp.float32))
        alpha, ls = jax.lax.fori_loop(0, n_reads, step, init)
        final = jnp.sum(alpha * end_mask, axis=0, keepdims=True)
        ll = jnp.log(jnp.maximum(final, TINY)) + ls
        rows.append(jnp.where(rl < 0, 0.0, ll))
    out_ref[:] = jnp.concatenate(rows, axis=0)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("interpret", "lane_block"))
def forward_batch_pallas(tpl: jnp.ndarray, tlen: jnp.ndarray,
                         snr_bin: jnp.ndarray, reads: jnp.ndarray,
                         rlens: jnp.ndarray, tables: dict,
                         interpret: bool = False,
                         lane_block: int = DEFAULT_LANE_BLOCK) -> jnp.ndarray:
    """Drop-in replacement for hmm_jax.forward_batch on TPU.

    tpl [B,T] int8, tlen [B], snr_bin [B], reads [B,C,R] int8,
    rlens [B,C] -> ll [B,C] f32.
    """
    B, T = tpl.shape
    _, C, R = reads.shape

    match_emit, ins_emit, del_p = position_tables(tpl, snr_bin, tables)
    jpos = jnp.arange(T)[None, :]
    in_tpl = jpos < tlen[:, None]
    ins_emit = jnp.where(in_tpl[..., None], ins_emit, 0.0)
    del_p = jnp.where(in_tpl, del_p, 0.0)

    # lane-last layouts
    me = jnp.transpose(match_emit, (2, 1, 0))             # [4, T, B]
    ie = jnp.transpose(ins_emit, (2, 1, 0))
    dp_t = del_p.T                                        # [T, B]
    a = jnp.concatenate([jnp.zeros((1, B), jnp.float32), dp_t], axis=0)
    a0 = jnp.concatenate([jnp.ones((1, B), jnp.float32),
                          jnp.cumprod(dp_t, axis=0)], axis=0)  # [T+1, B]
    rd = jnp.transpose(reads, (2, 1, 0)).astype(jnp.int32)  # [R, C, B]
    tl = tlen.astype(jnp.int32)[None, :]                   # [1, B]
    rl = rlens.astype(jnp.int32).T                         # [C, B]

    LB = min(lane_block, _round_up(B, 128))
    Bp = _round_up(B, LB)
    if Bp != B:
        pad = Bp - B
        me = jnp.pad(me, ((0, 0), (0, 0), (0, pad)))
        ie = jnp.pad(ie, ((0, 0), (0, 0), (0, pad)))
        a = jnp.pad(a, ((0, 0), (0, pad)))
        a0 = jnp.pad(a0, ((0, 0), (0, pad)), constant_values=1.0)
        rd = jnp.pad(rd, ((0, 0), (0, 0), (0, pad)), constant_values=-1)
        tl = jnp.pad(tl, ((0, 0), (0, pad)), constant_values=1)
        rl = jnp.pad(rl, ((0, 0), (0, pad)), constant_values=-1)

    grid = (Bp // LB,)
    lane_spec = lambda ndim: pl.BlockSpec(  # noqa: E731
        (*ndim, LB), lambda i: (*(0,) * len(ndim), i),
        memory_space=pltpu.VMEM)

    kernel = functools.partial(_fwd_kernel, n_lanes_c=C, n_reads=R)
    ll = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            lane_spec((4, T)),       # me
            lane_spec((4, T)),       # ie
            lane_spec((T + 1,)),     # a
            lane_spec((T + 1,)),     # a0
            lane_spec((R, C)),       # reads
            lane_spec((1,)),         # tl
            lane_spec((C,)),         # rl
        ],
        out_specs=lane_spec((C,)),
        out_shape=jax.ShapeDtypeStruct((C, Bp), jnp.float32),
        interpret=interpret,
    )(me, ie, a, a0, rd, tl, rl)
    return ll[:, :B].T                                     # [B, C]
