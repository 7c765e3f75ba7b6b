"""Fused Pallas TPU kernel: exhaustive pair-HMM mutation scoring (C8).

One kernel invocation computes, for a block of 128 windows (lane axis):

- the forward and backward column matrices of the Arrow pair-HMM for every
  subread lane (kept entirely in VMEM — the round-1 XLA formulation
  round-tripped ~100 MB of columns through HBM per polish iteration and
  gathered them with per-lane indices),
- the log-likelihood of EVERY single-point mutation of the 9-kind
  enumeration (pipeline.polish_fused) via alpha/beta column bridging with
  beta-pairing: LL(mut) = y3 . beta_q where y3 is the pre-insertion-solve
  bridge vector, so each mutant costs two insertion-chain solves instead of
  three,
- the exact current-template log-likelihood ll0.

This is the component PacBio moved to GPUs on Revio
(/root/reference/docs/faq/revio.md:14-27); the mutation-testing algebra
matches ops.hmm_cols (the tested XLA oracle).

Layout (pallas guide): lane = window (128-wide), sublane = read-boundary
axis S = R+1 (padded to a multiple of 8). Subreads iterate in a fori_loop;
template positions iterate in fori_loops; the static mutation grid means no
data-dependent gathers anywhere. Insertion/deletion chains are solved by
3 doubling steps (runs <= 7; rates <~0.2 make the truncation error <1e-5
relative — same regime as hmm_jax.DELETE_CHAIN_DEPTH).

Param-plane indexing convention (matches ops.hmm_cols.build_columns):
forward boundary j uses dp[j-1], me[j-1], ie[j]; the extended planes
mex/iex/dpx are therefore indexed mex[j] = me[j-1] (mex[0]=0),
iex[j] = ie[j] (iex[T]=0), dpx[j] = dp[j-1] (dpx[0]=1), all with identity
padding beyond tlen (dp=1, me=ie=0) so template-end edge cases vanish.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TINY = 1e-30
LANE_BLOCK = 128
N_SETS = 12  # mutated-context param sets: A_alt(3) + C_alt(4) + D(1) + B_alt(4)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _shift_down(v, d: int, axis: int = 0):
    """v[i-d] along ``axis`` (a sublane-tiled axis), zero-filled top rows."""
    rolled = pltpu.roll(v, d, axis=axis)
    row = jax.lax.broadcasted_iota(jnp.int32, v.shape, axis)
    return jnp.where(row < d, 0.0, rolled)


def _shift_up(v, d: int, axis: int = 0):
    n = v.shape[axis]
    rolled = pltpu.roll(v, n - d, axis=axis)           # == roll by -d
    row = jax.lax.broadcasted_iota(jnp.int32, v.shape, axis)
    return jnp.where(row >= n - d, 0.0, rolled)


def _solve_fwd(y, a, axis: int = 0):
    """w[i] = y[i] + a[i]*w[i-1], runs truncated at depth 8 (3 doublings).
    The final carry update is skipped — it never feeds the result."""
    x, c = y, a
    for d in (1, 2, 4):
        x = x + c * _shift_down(x, d, axis)
        if d != 4:
            c = c * _shift_down(c, d, axis)
    return x


def _solve_bwd(y, a, axis: int = 0):
    """w[i] = y[i] + a[i]*w[i+1], truncated at depth 8."""
    x, c = y, a
    for d in (1, 2, 4):
        x = x + c * _shift_up(x, d, axis)
        if d != 4:
            c = c * _shift_up(c, d, axis)
    return x


def _solve_fwd_T(u, a, axis: int = 0):
    """EXACT transpose of ``_solve_fwd(., a)``: returns M^T u where
    M y = _solve_fwd(y, a). With M = (I + C4 S4)(I + C2 S2)(I + C1 S1)
    (S_d = shift-down-by-d, C_d = the doubled carries), the transpose
    applies the adjoint stages in reverse: x += shift_up(c_d * x, d) for
    d = 4, 2, 1. Lets the sparse bridge share one B-stage backward solve
    across the sub/ins mutation pair of each alt base (y3 . beta ==
    y2 . M_B^T u_B), replacing two forward solves per mutation with one."""
    c1 = a
    c2 = c1 * _shift_down(c1, 1, axis)
    c4 = c2 * _shift_down(c2, 2, axis)
    x = u + _shift_up(c4 * u, 4, axis)
    x = x + _shift_up(c2 * x, 2, axis)
    return x + _shift_up(c1 * x, 1, axis)


# ---- read-pair (segmented) variants: two subreads stacked on the sublane
# axis as [2S, LB] (rows 0..S-1 = read A, S..2S-1 = read B). The serial
# column sweeps are issue-bound on [S, LB] shapes (measured: fwd+bwd are
# ~52% of the dense kernel wall vs ~12% of its flops), so interleaving two
# independent recurrence chains per instruction stream roughly halves the
# sweep wall. The segment-aware shifts zero-fill each segment's boundary
# rows, making every per-segment value BIT-IDENTICAL to the unpaired
# kernel's ([S, LB]) computation.

def _shift_down2(v, d: int, rowm):
    """v[i-d] within each segment (rowm = row index modulo S)."""
    rolled = pltpu.roll(v, d, axis=0)
    return jnp.where(rowm < d, 0.0, rolled)


def _shift_up2(v, d: int, rowm, S: int):
    n = v.shape[0]
    rolled = pltpu.roll(v, n - d, axis=0)
    return jnp.where(rowm >= S - d, 0.0, rolled)


def _solve_fwd2(y, a, rowm):
    x, c = y, a
    for d in (1, 2, 4):
        x = x + c * _shift_down2(x, d, rowm)
        if d != 4:
            c = c * _shift_down2(c, d, rowm)
    return x


def _solve_bwd2(y, a, rowm, S: int):
    x, c = y, a
    for d in (1, 2, 4):
        x = x + c * _shift_up2(x, d, rowm, S)
        if d != 4:
            c = c * _shift_up2(c, d, rowm, S)
    return x


def _solve_fwd_T2(u, a, rowm, S: int):
    c1 = a
    c2 = c1 * _shift_down2(c1, 1, rowm)
    c4 = c2 * _shift_down2(c2, 2, rowm)
    x = u + _shift_up2(c4 * u, 4, rowm, S)
    x = x + _shift_up2(c2 * x, 2, rowm, S)
    return x + _shift_up2(c1 * x, 1, rowm, S)


def _score_kernel(bounds_ref, tpl_ref, tlen_ref, ME_ref, IE_ref, DP_ref,
                  PWM_ref, PWI_ref, reads_ref,
                  rl_ref, lls_ref, ll0_ref,
                  mex_ref, iex_ref, dpx_ref, meM_ref, ieM_ref, dpM_ref,
                  fcols_ref, lsf_ref, betas_ref, lsb_ref,
                  ohdm_ref, ohdi_ref, ohum_ref, ohui_ref,
                  *, T: int, C: int, R: int, S: int):
    """One 128-window block. See module docstring for the layout.

    tpl [T,LB] i32 (clipped), tlen [1,LB], ME/IE [16,4,LB], DP [16,LB],
    PWM/PWI [4,LB] pulse-width factors per pw bin (how-does-ccs-work.md:
    88-95), reads [C,R,LB] i32 PACKED codes base + 4*pw (chemistry.
    pack_read_pw; plain 0..3 codes are pw bin 0, factor 1),
    rl [C,LB] -> lls [8,T+1,LB] (RELATIVE slots: [0:3,p] sub to
    (cur+1..3)%4, [3,p] del, [4:8,p] ins (cur+0..3)%4 after p;
    [0:4,T] = prepends, absolute), ll0 [8,LB] (row 0).
    """
    LB = tpl_ref.shape[-1]
    # per-block dynamic trip counts (SMEM scalars): Tm = max tlen in the
    # block, Cm = max live-lane count. Live subread lanes are a prefix
    # (engine fill order), and ops beyond a lane's tlen are identity-padded,
    # so looping to the block maxima is exact — the kernel simply stops
    # computing pad positions (tlen ~30 vs T=40 at production shapes).
    blk = pl.program_id(0)
    Tm = bounds_ref[blk, 0]
    Cm = bounds_ref[blk, 1]
    # ---- init outputs ----
    lls_ref[:] = jnp.zeros_like(lls_ref)
    ll0_ref[:] = jnp.zeros_like(ll0_ref)

    # Empty blocks (no live lanes — the compacted-tail iterations of the
    # polish loop route converged rows here) skip the param-plane prologue
    # and the subread loop entirely: an inactive 128-lane block costs only
    # its output zeroing + block DMA.
    @pl.when(Cm > 0)
    def _block_body():
        tpl = tpl_ref[:]                                   # [T, LB]
        tl = tlen_ref[:]                                   # [1, LB]
        jrow = jax.lax.broadcasted_iota(jnp.int32, (T, LB), 0)
        in_tpl = (jrow < tl).astype(jnp.float32)
        prev = jnp.where(jrow == 0, tpl, pltpu.roll(tpl, 1, axis=0))
        nxt = pltpu.roll(tpl, T - 1, axis=0)               # == roll -1; T-1 masked
        has_next = ((jrow + 1) < tl).astype(jnp.float32)

        # ---- original positional params (identity-padded) ----
        ctx0 = 4 * prev + tpl                              # [T, LB]
        pme = [jnp.zeros((T, LB), jnp.float32) for _ in range(4)]
        pie = [jnp.zeros((T, LB), jnp.float32) for _ in range(4)]
        pdp = jnp.zeros((T, LB), jnp.float32)
        for k in range(16):
            mk = (ctx0 == k).astype(jnp.float32) * in_tpl
            for x in range(4):
                pme[x] = pme[x] + mk * ME_ref[k, x:x + 1]
                pie[x] = pie[x] + mk * IE_ref[k, x:x + 1]
            pdp = pdp + mk * DP_ref[k:k + 1]
        pdp = pdp + (1.0 - in_tpl)                         # dp=1 beyond tlen
        z1 = jnp.zeros((1, LB), jnp.float32)
        for x in range(4):
            mex_ref[x] = jnp.concatenate([z1, pme[x]], axis=0)   # mex[j]=me[j-1]
            iex_ref[x] = jnp.concatenate([pie[x], z1], axis=0)   # iex[j]=ie[j]
        dpx_ref[:] = jnp.concatenate([jnp.ones((1, LB), jnp.float32), pdp],
                                     axis=0)

        # ---- mutated-context param planes (12 sets x {me4, ie4, dp}) ----
        # RELATIVE-base enumeration: the substitution "to the current base"
        # is a no-op, so the kernel scores only alt_i = (cur + i) % 4.
        # Pairing sub_i with ins_i shares each second-stage B set.
        # g-ordering: 0..2: A_i = P(prev_eff, alt_i), i=1..3 (sub first
        # stage); 3..6: C_i = P(cur, alt_i), i=0..3 (ins first stage);
        # 7: D = P(prev_eff_del, next) (del); 8..11: B_i = P(alt_i, next)
        # (shared second stage).
        ctxs = []
        alts = [(tpl + i) % 4 for i in range(4)]
        for i in range(1, 4):
            pa = jnp.where(jrow == 0, alts[i], prev)
            ctxs.append(4 * pa + alts[i])
        for i in range(4):
            ctxs.append(4 * tpl + alts[i])
        pd = jnp.where(jrow == 0, jnp.clip(nxt, 0, 3), prev)
        ctxs.append(4 * pd + jnp.clip(nxt, 0, 3))
        for i in range(4):
            ctxs.append(4 * alts[i] + jnp.clip(nxt, 0, 3))
        for s in range(N_SETS):
            # sets 7 (D) and 8..11 (B_i) are identity when there is no next
            masked = s >= 7
            mes = [jnp.zeros((T, LB), jnp.float32) for _ in range(4)]
            ies = [jnp.zeros((T, LB), jnp.float32) for _ in range(4)]
            dps = jnp.zeros((T, LB), jnp.float32)
            for k in range(16):
                mk = (ctxs[s] == k).astype(jnp.float32)
                if masked:
                    mk = mk * has_next
                for x in range(4):
                    mes[x] = mes[x] + mk * ME_ref[k, x:x + 1]
                    ies[x] = ies[x] + mk * IE_ref[k, x:x + 1]
                dps = dps + mk * DP_ref[k:k + 1]
            if masked:
                dps = dps + (1.0 - has_next)
            for x in range(4):
                meM_ref[s, x] = mes[x]
                ieM_ref[s, x] = ies[x]
            dpM_ref[s] = dps


        irow = jax.lax.broadcasted_iota(jnp.int32, (S, LB), 0)
        e0 = (irow == 0).astype(jnp.float32)
        t0 = tpl[0:1]                                      # [1, LB]

        def emis(oh_ref, vec4):
            """Emission row [S,LB] from a per-lane 4-vector [4,1,LB]-ish."""
            r = oh_ref[0] * vec4[0]
            for x in range(1, 4):
                r = r + oh_ref[x] * vec4[x]
            return r

        def c_body(c, _):
            rc = reads_ref[c]                              # [R, LB] i32 codes
            rl_c = rl_ref[pl.ds(c, 1)]                     # [1, LB]
            live = (rl_c >= 0).astype(jnp.float32)
            zpad = jnp.zeros((S - R - 1, LB), jnp.float32) if S - R - 1 else None
            ok = (rc >= 0)
            code = jnp.clip(rc, 0, 15)
            base = code % 4
            w = code // 4
            fm = jnp.zeros((R, LB), jnp.float32)
            fi = jnp.zeros((R, LB), jnp.float32)
            for k in range(4):
                wk = (w == k).astype(jnp.float32)
                fm = fm + wk * PWM_ref[k:k + 1]
                fi = fi + wk * PWI_ref[k:k + 1]
            def cat(*parts):
                return jnp.concatenate([p for p in parts if p is not None],
                                       axis=0)

            for x in range(4):
                hx = ((base == x) & ok).astype(jnp.float32)
                ohdm_ref[x] = cat(z1, hx * fm, zpad)
                ohdi_ref[x] = cat(z1, hx * fi, zpad)
                ohum_ref[x] = cat(hx * fm, zpad, z1)
                ohui_ref[x] = cat(hx * fi, zpad, z1)

            # ---- forward columns ----
            fcols_ref[0] = e0
            lsf_ref[0:1] = z1

            def fwd(j, carry):
                col, ls = carry
                me4 = mex_ref[:, pl.ds(j, 1)]              # [4, 1, LB]
                ie4 = iex_ref[:, pl.ds(j, 1)]
                dpj = dpx_ref[pl.ds(j, 1)]                 # [1, LB]
                me_r = emis(ohdm_ref, me4)
                ie_r = emis(ohdi_ref, ie4)
                y = dpj * col + me_r * _shift_down(col, 1)
                w = _solve_fwd(y, ie_r)
                sc = jnp.maximum(jnp.max(w, axis=0, keepdims=True), TINY)
                col = w / sc
                ls = ls + jnp.log(sc)
                fcols_ref[j + 1] = col
                lsf_ref[pl.ds(j + 1, 1)] = ls
                return col, ls

            colT, lsT = jax.lax.fori_loop(0, Tm + 1, fwd, (e0, z1))
            endm = (irow == rl_c).astype(jnp.float32)
            final = jnp.sum(colT * endm, axis=0, keepdims=True)
            ll0_ref[0:1] += live * (jnp.log(jnp.maximum(final, TINY)) + lsT)

            # ---- backward sensitivities (full beta, post-solve) ----
            betas_ref[Tm] = endm
            lsb_ref[pl.ds(Tm, 1)] = z1

            def bwd(it, carry):
                beta, ls = carry
                j = Tm - 1 - it
                me4 = mex_ref[:, pl.ds(j + 1, 1)]          # me[j]
                ie4 = iex_ref[:, pl.ds(j, 1)]              # ie[j]
                dpj = dpx_ref[pl.ds(j + 1, 1)]             # dp[j]
                me_rs = emis(ohum_ref, me4)
                ie_rs = emis(ohui_ref, ie4)
                u = dpj * beta + me_rs * _shift_up(beta, 1)
                w = _solve_bwd(u, ie_rs)
                sc = jnp.maximum(jnp.max(w, axis=0, keepdims=True), TINY)
                beta = w / sc
                ls = ls + jnp.log(sc)
                betas_ref[j] = beta
                lsb_ref[pl.ds(j, 1)] = ls
                return beta, ls

            jax.lax.fori_loop(0, Tm, bwd, (endm, z1))

            # ---- bridge every mutation ----
            # Measured on-chip: this per-mutation [S, LB] formulation runs
            # at ~94% of the VPU issue-rate roofline; a [9, S, LB] stacked
            # variant lowered ~1.4x SLOWER in Mosaic (strided [9,1,LB]
            # param slices + 3-D rolls), so the per-mutation shape is kept
            # deliberately. Set g-order: A=0..2, C=3..6, D=7, B=8..11.
            def bridge(p, _):
                colm1 = fcols_ref[p]                       # col_{p-1}
                col0 = fcols_ref[p + 1]                    # col_p
                q = jnp.minimum(p + 2, Tm)
                betaq = betas_ref[q]
                lsc_p = lsf_ref[pl.ds(p, 1)]
                lsc_p1 = lsf_ref[pl.ds(p + 1, 1)]
                lsb_q = lsb_ref[pl.ds(q, 1)]
                me_r_pm1 = emis(ohdm_ref, mex_ref[:, pl.ds(p, 1)])
                me_r_p = emis(ohdm_ref, mex_ref[:, pl.ds(p + 1, 1)])
                dp_pm1 = dpx_ref[pl.ds(p, 1)]
                dp_p = dpx_ref[pl.ds(p + 1, 1)]
                y_p = dp_pm1 * colm1 + me_r_pm1 * _shift_down(colm1, 1)
                y_p1 = dp_p * col0 + me_r_p * _shift_down(col0, 1)

                def two_ops(y1, ie1, me1, dp1, ieB, meB, dpB):
                    v1 = _solve_fwd(y1, ie1)
                    y2 = dp1 * v1 + me1 * _shift_down(v1, 1)
                    v2 = _solve_fwd(y2, ieB)
                    y3 = dpB * v2 + meB * _shift_down(v2, 1)
                    return jnp.sum(y3 * betaq, axis=0, keepdims=True)

                subs, inss = [], []
                for i in range(4):
                    meB = meM_ref[8 + i, :, pl.ds(p, 1)]   # [4, 1, LB]
                    ieB = ieM_ref[8 + i, :, pl.ds(p, 1)]
                    dpB = dpM_ref[8 + i, pl.ds(p, 1)]
                    Bie_r = emis(ohdi_ref, ieB)
                    Bme_r = emis(ohdm_ref, meB)
                    if i >= 1:                             # sub to alt_i
                        meA = meM_ref[i - 1, :, pl.ds(p, 1)]
                        ieA = ieM_ref[i - 1, :, pl.ds(p, 1)]
                        dpA = dpM_ref[i - 1, pl.ds(p, 1)]
                        subs.append(two_ops(y_p, emis(ohdi_ref, ieA),
                                            emis(ohdm_ref, meA), dpA,
                                            Bie_r, Bme_r, dpB))
                    meC = meM_ref[3 + i, :, pl.ds(p, 1)]   # ins alt_i
                    ieC = ieM_ref[3 + i, :, pl.ds(p, 1)]
                    dpC = dpM_ref[3 + i, pl.ds(p, 1)]
                    inss.append(two_ops(y_p1, emis(ohdi_ref, ieC),
                                        emis(ohdm_ref, meC), dpC,
                                        Bie_r, Bme_r, dpB))
                meD = meM_ref[7, :, pl.ds(p, 1)]
                ieD = ieM_ref[7, :, pl.ds(p, 1)]
                dpD = dpM_ref[7, pl.ds(p, 1)]
                v1d = _solve_fwd(y_p, emis(ohdi_ref, ieD))
                y2d = dpD * v1d + emis(ohdm_ref, meD) * _shift_down(v1d, 1)
                dot_del = jnp.sum(y2d * betaq, axis=0, keepdims=True)

                # relative slot order: sub alt_1..3, del, ins alt_0..3
                block = jnp.concatenate(subs + [dot_del] + inss, axis=0)
                ls4a = jnp.broadcast_to(lsc_p + lsb_q, (4, LB))
                ls4b = jnp.broadcast_to(lsc_p1 + lsb_q, (4, LB))
                lsrow = jnp.concatenate([ls4a, ls4b], axis=0)
                contrib = live * (jnp.log(jnp.maximum(block, TINY)) + lsrow)
                lls_ref[0:8, pl.ds(p, 1)] = (lls_ref[0:8, pl.ds(p, 1)]
                                             + contrib[:, None, :])
                return 0

            jax.lax.fori_loop(0, Tm, bridge, 0)

            # ---- prepends: base x before position 0, bridged from e_0 ----
            beta1 = betas_ref[1]
            lsb_1 = lsb_ref[pl.ds(1, 1)]
            pres = []
            for x in range(4):
                kxx = 5 * x                                # ctx (x, x)
                me_xx = ME_ref[kxx]                        # [4, LB]
                ie_xx = IE_ref[kxx]
                dp_xx = DP_ref[kxx:kxx + 1]
                # ctx (x, t0): per-lane select over t0
                me_x0 = jnp.zeros((4, LB), jnp.float32)
                ie_x0 = jnp.zeros((4, LB), jnp.float32)
                dp_x0 = jnp.zeros((1, LB), jnp.float32)
                for b in range(4):
                    mb = (t0 == b).astype(jnp.float32)     # [1, LB]
                    me_x0 = me_x0 + mb * ME_ref[4 * x + b]
                    ie_x0 = ie_x0 + mb * IE_ref[4 * x + b]
                    dp_x0 = dp_x0 + mb * DP_ref[4 * x + b:4 * x + b + 1]
                v1 = _solve_fwd(e0, emis(ohdi_ref, ie_xx[:, None]))
                y2 = dp_xx * v1 + emis(ohdm_ref, me_xx[:, None]) * _shift_down(v1, 1)
                v2 = _solve_fwd(y2, emis(ohdi_ref, ie_x0[:, None]))
                y3 = dp_x0 * v2 + emis(ohdm_ref, me_x0[:, None]) * _shift_down(v2, 1)
                pres.append(jnp.sum(y3 * beta1, axis=0, keepdims=True))
            pre_block = jnp.concatenate(pres, axis=0)               # [4, LB]
            pre_ls = jnp.broadcast_to(lsb_1, (4, LB))
            pre_c = live * (jnp.log(jnp.maximum(pre_block, TINY)) + pre_ls)
            lls_ref[0:4, pl.ds(T, 1)] = (lls_ref[0:4, pl.ds(T, 1)]
                                         + pre_c[:, None, :])
            return 0

        jax.lax.fori_loop(0, Cm, c_body, 0)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "lane_block"))
def score_all_pallas(tpl, tlen, snr_bin, reads, rlens, tables,
                     interpret: bool = False,
                     lane_block: int = LANE_BLOCK):
    """Exhaustive mutation scores + exact ll0 for every window.

    tpl [B,T] int8, tlen [B], snr_bin [B], reads [B,C,R] int8, rlens [B,C]
    -> (lls [B, 9T+4] f32 — UNMASKED (caller applies the validity mask),
        ll0 [B] f32).
    """
    B, T = tpl.shape
    _, C, R = reads.shape
    S = _round_up(R + 1, 8)

    # per-window per-ctx parameter tables (ctx fully determines me4/ie4/dp)
    trans = tables["trans"][snr_bin]                   # [B, 16, 4]
    em = tables["emit_match"][snr_bin]
    es = tables["emit_stick"][snr_bin]
    ME = trans[..., 0:1] * em                          # [B, 16, 4]
    cur = jnp.arange(16) % 4
    onehot = jax.nn.one_hot(cur, 4, dtype=jnp.float32)  # [16, 4]
    IE = trans[..., 1:2] * onehot[None] + trans[..., 2:3] * es
    DP = trans[..., 3]                                 # [B, 16]

    ME_t = jnp.transpose(ME, (1, 2, 0))                # [16, 4, B]
    IE_t = jnp.transpose(IE, (1, 2, 0))
    DP_t = DP.T                                        # [16, B]
    PWM_t = tables["pw_match"][snr_bin].T              # [4, B]
    PWI_t = tables["pw_ins"][snr_bin].T
    tpl_t = jnp.clip(tpl, 0, 3).astype(jnp.int32).T    # [T, B]
    tlen_t = tlen.astype(jnp.int32)[None]              # [1, B]
    reads_t = jnp.transpose(reads, (1, 2, 0)).astype(jnp.int32)  # [C, R, B]
    rl_t = rlens.astype(jnp.int32).T                   # [C, B]

    LB = min(lane_block, _round_up(B, 128))
    Bp = _round_up(B, LB)
    if Bp != B:
        pad = Bp - B
        ME_t = jnp.pad(ME_t, ((0, 0), (0, 0), (0, pad)))
        IE_t = jnp.pad(IE_t, ((0, 0), (0, 0), (0, pad)))
        DP_t = jnp.pad(DP_t, ((0, 0), (0, pad)))
        PWM_t = jnp.pad(PWM_t, ((0, 0), (0, pad)), constant_values=1.0)
        PWI_t = jnp.pad(PWI_t, ((0, 0), (0, pad)), constant_values=1.0)
        tpl_t = jnp.pad(tpl_t, ((0, 0), (0, pad)))
        tlen_t = jnp.pad(tlen_t, ((0, 0), (0, pad)), constant_values=1)
        reads_t = jnp.pad(reads_t, ((0, 0), (0, 0), (0, pad)),
                          constant_values=-1)
        rl_t = jnp.pad(rl_t, ((0, 0), (0, pad)), constant_values=-1)

    grid = (Bp // LB,)

    # per-block dynamic trip counts: max tlen and max live-lane count of
    # each 128-lane block (SMEM scalars; the kernel loops to these instead
    # of the static caps, skipping pad positions and dead lanes)
    tmax_blk = tlen_t[0].reshape(grid[0], LB).max(axis=1)
    cov_blk = (rl_t >= 0).sum(axis=0).reshape(grid[0], LB).max(axis=1)
    bounds = jnp.stack(
        [jnp.maximum(tmax_blk, 1), cov_blk], axis=1).astype(jnp.int32)

    def lane_spec(leading):
        n = len(leading)
        return pl.BlockSpec((*leading, LB),
                            lambda i, _n=n: (*(0,) * _n, i),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_score_kernel, T=T, C=C, R=R, S=S)
    lls3, ll0 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # bounds [grid, 2]
            lane_spec((T,)),          # tpl
            lane_spec((1,)),          # tlen
            lane_spec((16, 4)),       # ME
            lane_spec((16, 4)),       # IE
            lane_spec((16,)),         # DP
            lane_spec((4,)),          # PWM
            lane_spec((4,)),          # PWI
            lane_spec((C, R)),        # reads
            lane_spec((C,)),          # rl
        ],
        out_specs=(lane_spec((8, T + 1)), lane_spec((8,))),
        out_shape=(jax.ShapeDtypeStruct((8, T + 1, Bp), jnp.float32),
                   jax.ShapeDtypeStruct((8, Bp), jnp.float32)),
        scratch_shapes=[
            pltpu.VMEM((4, T + 1, LB), jnp.float32),       # mex
            pltpu.VMEM((4, T + 1, LB), jnp.float32),       # iex
            pltpu.VMEM((T + 1, LB), jnp.float32),          # dpx
            pltpu.VMEM((N_SETS, 4, T, LB), jnp.float32),   # meM
            pltpu.VMEM((N_SETS, 4, T, LB), jnp.float32),   # ieM
            pltpu.VMEM((N_SETS, T, LB), jnp.float32),      # dpM
            pltpu.VMEM((T + 2, S, LB), jnp.float32),       # fcols
            pltpu.VMEM((T + 2, LB), jnp.float32),          # lsf
            pltpu.VMEM((T + 1, S, LB), jnp.float32),       # betas
            pltpu.VMEM((T + 1, LB), jnp.float32),          # lsb
            pltpu.VMEM((4, S, LB), jnp.float32),           # ohdm
            pltpu.VMEM((4, S, LB), jnp.float32),           # ohdi
            pltpu.VMEM((4, S, LB), jnp.float32),           # ohum
            pltpu.VMEM((4, S, LB), jnp.float32),           # ohui
        ],
        interpret=interpret,
    )(bounds, tpl_t, tlen_t, ME_t, IE_t, DP_t, PWM_t, PWI_t, reads_t, rl_t)

    # reassemble [B, 9T+4]: kernel rows are RELATIVE (sub alt_1..3, del,
    # ins alt_0..3 with alt_i = (cur + i) % 4); remap to the absolute-base
    # slot convention m = 9p + k via one-hot selects (elementwise — no
    # gathers). The self-substitution slot stays 0 and is masked invalid
    # by the caller. [0:4, T] = prepends (absolute).
    lls3 = jnp.transpose(lls3, (2, 1, 0))[:B]          # [B, T+1, 8]
    reg = _rel_to_abs(lls3, tpl, T)
    pre = lls3[:, T, :4]
    ll0 = ll0[0, :B]
    return jnp.concatenate([reg, pre], axis=1), ll0


# ---------------------------------------------------------------------------
# candidate-sparse scorer (C7 in-kernel): bridge only flagged positions
# ---------------------------------------------------------------------------

SLOT_SENTINEL = 127  # > any valid template position (T <= 64 in production)


def _rel_to_abs(lls3, tpl, T: int):
    """Remap kernel-relative mutation rows (sub alt_1..3, del, ins alt_0..3)
    to the absolute-base m = 9p + k slot convention via one-hot selects.
    lls3 [B, T, 8] -> [B, 9T]."""
    B = lls3.shape[0]
    rel = lls3[:, :T, :8]
    cur = jnp.clip(tpl, 0, 3).astype(jnp.int32)
    k4 = jnp.arange(4)[None, None, :]
    d = (k4 - cur[..., None]) % 4
    subs_abs = jnp.zeros((B, T, 4), jnp.float32)
    ins_abs = jnp.zeros((B, T, 4), jnp.float32)
    for i in range(1, 4):
        subs_abs = subs_abs + jnp.where(d == i, rel[:, :, i - 1:i], 0.0)
    for i in range(4):
        ins_abs = ins_abs + jnp.where(d == i, rel[:, :, 4 + i:5 + i], 0.0)
    return jnp.concatenate([subs_abs, rel[:, :, 3:4], ins_abs],
                           axis=-1).reshape(B, 9 * T)


def _sparse_kernel(bounds_ref, tpl_ref, tlen_ref, pri_ref,
                   ME_ref, IE_ref, DP_ref, PWM_ref, PWI_ref, reads_ref,
                   rl_ref, lls_ref, ll0_ref,
                   mex_ref, iex_ref, dpx_ref, meM_ref, ieM_ref, dpM_ref,
                   slot_ref, llsC_ref, tplC_ref, prevC_ref, nxtC_ref,
                   ycols_ref, lsf_ref, betas_ref, lsb_ref,
                   ohdm_ref, ohdi_ref, ohum_ref, ohui_ref,
                   *, T: int, C: int, R: int, S: int, KP: int):
    """Candidate-sparse variant of ``_score_kernel`` (C7 — the documented
    >=2x from skipping unambiguous positions, performance.md:90-93, now IN
    the kernel rather than a post-hoc selection mask).

    ``pri_ref`` [T, LB] f32 is the candidate priority (>0 = flagged). The
    whole sparse bookkeeping lives in-kernel — slot compaction in the
    prologue, a dense-layout scatter in the epilogue — because every
    [B, T, K]-shaped XLA-side formulation of the same bookkeeping
    (one-hot einsum remap, sort-based slot maps, take_along_axis) measured
    3-12 ms per call at production shapes, more than the bridge work it
    was saving. Subreads are processed in PAIRS stacked on the sublane
    axis ([2S, LB]; the _*2 segmented helpers) — the serial column sweeps
    and the per-slot gather scans are issue-bound, not flop-bound, so two
    independent recurrence chains per instruction stream halve their trip
    counts at identical per-read arithmetic (per-segment scales keep each
    read's values bit-identical to the unpaired form). The sweeps still
    cover the whole template (ll0/QV need them exact); only the
    per-position mutation BRIDGE — 88% of the dense kernel's flops —
    runs per candidate slot:

    - the fwd loop stores its intermediate y_j (the bridge's y_p is
      exactly the fwd recurrence's pre-solve vector, so nothing is
      rebuilt);
    - per slot, y_p / y_{p+1} / beta_q and the three log-scales are
      gathered with [1,LB]-mask selects over a fori sweep (~130 [S,LB]
      vector ops vs ~580 for one bridged position);
    - mutated-context parameter planes are built COMPACTED ([sets, KP]
      instead of [sets, T]) from slot-gathered tpl/prev/next codes;
    - each alt base's B-stage (shared by its sub/ins pair) is solved ONCE
      backward via the exact transpose (_solve_fwd_T), replacing two
      forward solves per mutation with one.

    Per-block trip bound Km (bounds col 2) = max candidate count, so
    (cov, n_cand, tlen)-sorted chunks pay for the candidates they have.
    Output layout is IDENTICAL to the dense kernel ([8, T+1, LB],
    relative-base rows, prepends at column T): bridged slots accumulate in
    compacted scratch and a cheap per-position one-hot reduction writes
    them back, so the caller needs no remap at all.
    """
    LB = tpl_ref.shape[-1]
    blk = pl.program_id(0)
    Tm = bounds_ref[blk, 0]
    Cm = bounds_ref[blk, 1]
    Km = bounds_ref[blk, 2]
    lls_ref[:] = jnp.zeros_like(lls_ref)
    ll0_ref[:] = jnp.zeros_like(ll0_ref)

    @pl.when(Cm > 0)
    def _block_body():
        tpl = tpl_ref[:]                                   # [T, LB]
        tl = tlen_ref[:]                                   # [1, LB]
        jrow = jax.lax.broadcasted_iota(jnp.int32, (T, LB), 0)
        in_tpl = (jrow < tl).astype(jnp.float32)
        prev = jnp.where(jrow == 0, tpl, pltpu.roll(tpl, 1, axis=0))

        # ---- slot compaction: k-th candidate position per lane ----
        llsC_ref[:] = jnp.zeros_like(llsC_ref)
        slot_ref[:] = jnp.full_like(slot_ref, SLOT_SENTINEL)
        krow = jax.lax.broadcasted_iota(jnp.int32, (KP, LB), 0)

        def build_slots(p, kcount):
            candp = (pri_ref[pl.ds(p, 1)] > 0.0) & (p < tl)    # [1, LB]
            m = (krow == kcount) & candp                       # [KP, LB]
            slot_ref[:] = jnp.where(m, p, slot_ref[:])
            return kcount + candp.astype(jnp.int32)

        jax.lax.fori_loop(0, Tm, build_slots,
                          jnp.zeros((1, LB), jnp.int32))

        # ---- original positional params (identity-padded; fwd/bwd) ----
        ctx0 = 4 * prev + tpl
        pme = [jnp.zeros((T, LB), jnp.float32) for _ in range(4)]
        pie = [jnp.zeros((T, LB), jnp.float32) for _ in range(4)]
        pdp = jnp.zeros((T, LB), jnp.float32)
        for k in range(16):
            mk = (ctx0 == k).astype(jnp.float32) * in_tpl
            for x in range(4):
                pme[x] = pme[x] + mk * ME_ref[k, x:x + 1]
                pie[x] = pie[x] + mk * IE_ref[k, x:x + 1]
            pdp = pdp + mk * DP_ref[k:k + 1]
        pdp = pdp + (1.0 - in_tpl)
        z1 = jnp.zeros((1, LB), jnp.float32)
        for x in range(4):
            mex_ref[x] = jnp.concatenate([z1, pme[x]], axis=0)
            iex_ref[x] = jnp.concatenate([pie[x], z1], axis=0)
        dpx_ref[:] = jnp.concatenate([jnp.ones((1, LB), jnp.float32), pdp],
                                     axis=0)

        # ---- slot-gather the template codes the mutated contexts need ----
        # prev/next come from clipped-index reads of tpl itself: at p=0 the
        # clipped p-1 read returns tpl[0], which IS the dense prev rule
        # (prev = tpl at row 0); the p+1 read at the template end is masked
        # by has_next exactly as the dense kernel masks its rolled row.
        slot = slot_ref[:]                                 # [KP, LB] i32
        tplC_ref[:] = jnp.zeros_like(tplC_ref)
        prevC_ref[:] = jnp.zeros_like(prevC_ref)
        nxtC_ref[:] = jnp.zeros_like(nxtC_ref)

        def gslot(p, _):
            mp = slot == p                                 # [KP, LB]
            tplC_ref[:] = jnp.where(mp, tpl_ref[pl.ds(p, 1)], tplC_ref[:])
            pm1 = jnp.maximum(p - 1, 0)
            prevC_ref[:] = jnp.where(mp, tpl_ref[pl.ds(pm1, 1)],
                                     prevC_ref[:])
            pp1 = jnp.minimum(p + 1, T - 1)
            nxtC_ref[:] = jnp.where(mp, tpl_ref[pl.ds(pp1, 1)], nxtC_ref[:])
            return 0

        jax.lax.fori_loop(0, Tm, gslot, 0)

        # ---- mutated-context param planes, COMPACTED [sets, ., KP, LB] ----
        tplc = tplC_ref[:]
        prevc = prevC_ref[:]
        nxtc = jnp.clip(nxtC_ref[:], 0, 3)
        hnc = ((slot + 1) < tl).astype(jnp.float32)        # [KP, LB]
        p0C = slot == 0                                    # per-slot "pos 0"
        ctxs = []
        alts = [(tplc + i) % 4 for i in range(4)]
        for i in range(1, 4):
            pa = jnp.where(p0C, alts[i], prevc)
            ctxs.append(4 * pa + alts[i])
        for i in range(4):
            ctxs.append(4 * tplc + alts[i])
        pd = jnp.where(p0C, nxtc, prevc)
        ctxs.append(4 * pd + nxtc)
        for i in range(4):
            ctxs.append(4 * alts[i] + nxtc)
        for s in range(N_SETS):
            masked = s >= 7
            mes = [jnp.zeros((KP, LB), jnp.float32) for _ in range(4)]
            ies = [jnp.zeros((KP, LB), jnp.float32) for _ in range(4)]
            dps = jnp.zeros((KP, LB), jnp.float32)
            for k in range(16):
                mk = (ctxs[s] == k).astype(jnp.float32)
                if masked:
                    mk = mk * hnc
                for x in range(4):
                    mes[x] = mes[x] + mk * ME_ref[k, x:x + 1]
                    ies[x] = ies[x] + mk * IE_ref[k, x:x + 1]
                dps = dps + mk * DP_ref[k:k + 1]
            if masked:
                dps = dps + (1.0 - hnc)
            for x in range(4):
                meM_ref[s, x] = mes[x]
                ieM_ref[s, x] = ies[x]
            dpM_ref[s] = dps

        # read-PAIR layout: rows 0..S-1 = read 2c ("A"), S..2S-1 = read 2c+1
        # ("B"); template-side params are shared, emissions/scales/dots are
        # per segment. Bit-identical per read to the unpaired formulation.
        S2 = 2 * S
        irow2 = jax.lax.broadcasted_iota(jnp.int32, (S2, LB), 0)
        segB = irow2 >= S
        rowm = irow2 - jnp.where(segB, S, 0)           # row within segment
        e0 = (rowm == 0).astype(jnp.float32)
        t0 = tpl[0:1]
        z2 = jnp.zeros((2, LB), jnp.float32)

        def emis(oh_ref, vec4):
            r = oh_ref[0] * vec4[0]
            for x in range(1, 4):
                r = r + oh_ref[x] * vec4[x]
            return r

        def seg_scales(w):
            sA = jnp.max(jnp.where(segB, 0.0, w), axis=0, keepdims=True)
            sB = jnp.max(jnp.where(segB, w, 0.0), axis=0, keepdims=True)
            return jnp.maximum(sA, TINY), jnp.maximum(sB, TINY)

        def seg_dots(v):
            dA = jnp.sum(jnp.where(segB, 0.0, v), axis=0, keepdims=True)
            dB = jnp.sum(jnp.where(segB, v, 0.0), axis=0, keepdims=True)
            return dA, dB

        def c_body(c2, _):
            ca = 2 * c2
            cb = jnp.minimum(ca + 1, C - 1)
            rc_a = reads_ref[ca]
            rc_b = reads_ref[cb]
            rl_a = rl_ref[pl.ds(ca, 1)]
            rl_b = jnp.where(ca + 1 < C, rl_ref[pl.ds(cb, 1)], -1)
            live_a = (rl_a >= 0).astype(jnp.float32)
            live_b = (rl_b >= 0).astype(jnp.float32)
            zpad = jnp.zeros((S - R - 1, LB), jnp.float32) if S - R - 1 else None

            def prep(rc):
                ok = (rc >= 0)
                code = jnp.clip(rc, 0, 15)
                base = code % 4
                w = code // 4
                fm = jnp.zeros((R, LB), jnp.float32)
                fi = jnp.zeros((R, LB), jnp.float32)
                for k in range(4):
                    wk = (w == k).astype(jnp.float32)
                    fm = fm + wk * PWM_ref[k:k + 1]
                    fi = fi + wk * PWI_ref[k:k + 1]
                return ok, base, fm, fi

            ok_a, base_a, fm_a, fi_a = prep(rc_a)
            ok_b, base_b, fm_b, fi_b = prep(rc_b)

            def cat(*parts):
                return jnp.concatenate([p for p in parts if p is not None],
                                       axis=0)

            for x in range(4):
                hxa = ((base_a == x) & ok_a).astype(jnp.float32)
                hxb = ((base_b == x) & ok_b).astype(jnp.float32)
                ohdm_ref[x] = cat(z1, hxa * fm_a, zpad, z1, hxb * fm_b, zpad)
                ohdi_ref[x] = cat(z1, hxa * fi_a, zpad, z1, hxb * fi_b, zpad)
                ohum_ref[x] = cat(hxa * fm_a, zpad, z1, hxb * fm_b, zpad, z1)
                ohui_ref[x] = cat(hxa * fi_a, zpad, z1, hxb * fi_b, zpad, z1)

            # ---- forward columns; store the pre-solve y_j per step ----
            lsf_ref[0] = z2

            def fwd(j, carry):
                col, lsA, lsB = carry
                me4 = mex_ref[:, pl.ds(j, 1)]
                ie4 = iex_ref[:, pl.ds(j, 1)]
                dpj = dpx_ref[pl.ds(j, 1)]
                me_r = emis(ohdm_ref, me4)
                ie_r = emis(ohdi_ref, ie4)
                y = dpj * col + me_r * _shift_down2(col, 1, rowm)
                ycols_ref[j] = y                     # the bridge's y_p
                w = _solve_fwd2(y, ie_r, rowm)
                scA, scB = seg_scales(w)
                col = w / jnp.where(segB, scB, scA)
                lsA = lsA + jnp.log(scA)
                lsB = lsB + jnp.log(scB)
                lsf_ref[j + 1] = jnp.concatenate([lsA, lsB], axis=0)
                return col, lsA, lsB

            colT, lsTA, lsTB = jax.lax.fori_loop(0, Tm + 1, fwd,
                                                 (e0, z1, z1))
            rl_row = jnp.where(segB, jnp.where(rl_b >= 0, rl_b + S, -1),
                               rl_a)
            endm = (irow2 == rl_row).astype(jnp.float32)
            fA, fB = seg_dots(colT * endm)
            ll0_ref[0:1] += (live_a * (jnp.log(jnp.maximum(fA, TINY)) + lsTA)
                             + live_b * (jnp.log(jnp.maximum(fB, TINY))
                                         + lsTB))

            # ---- backward sensitivities ----
            betas_ref[Tm] = endm
            lsb_ref[Tm] = z2

            def bwd(it, carry):
                beta, lsA, lsB = carry
                j = Tm - 1 - it
                me4 = mex_ref[:, pl.ds(j + 1, 1)]
                ie4 = iex_ref[:, pl.ds(j, 1)]
                dpj = dpx_ref[pl.ds(j + 1, 1)]
                me_rs = emis(ohum_ref, me4)
                ie_rs = emis(ohui_ref, ie4)
                u = dpj * beta + me_rs * _shift_up2(beta, 1, rowm, S)
                w = _solve_bwd2(u, ie_rs, rowm, S)
                scA, scB = seg_scales(w)
                beta = w / jnp.where(segB, scB, scA)
                lsA = lsA + jnp.log(scA)
                lsB = lsB + jnp.log(scB)
                betas_ref[j] = beta
                lsb_ref[j] = jnp.concatenate([lsA, lsB], axis=0)
                return beta, lsA, lsB

            jax.lax.fori_loop(0, Tm, bwd, (endm, z1, z1))

            # ---- bridge candidate slots only ----
            def bridge(kk, _):
                p_row = slot_ref[pl.ds(kk, 1)]             # [1, LB] i32
                q_row = jnp.minimum(p_row + 2, Tm)
                zS = jnp.zeros((S2, LB), jnp.float32)
                init = (zS, zS, zS, z2, z2, z2)

                def gth(p, carry):
                    yp, yp1, bq, lsp, lsp1, lsq = carry
                    mp = p_row == p                        # [1, LB]
                    mq = q_row == p
                    yp = jnp.where(mp, ycols_ref[p], yp)
                    yp1 = jnp.where(mp, ycols_ref[p + 1], yp1)
                    bq = jnp.where(mq, betas_ref[p], bq)
                    lsp = jnp.where(mp, lsf_ref[p], lsp)
                    lsp1 = jnp.where(mp, lsf_ref[p + 1], lsp1)
                    lsq = jnp.where(mq, lsb_ref[p], lsq)
                    return yp, yp1, bq, lsp, lsp1, lsq

                # slot positions are strictly increasing per lane, so the
                # kk-th candidate sits at p >= kk — start the scan there
                yp, yp1, bq, lsp, lsp1, lsq = jax.lax.fori_loop(
                    kk, Tm + 1, gth, init)

                subsA, subsB, inssA, inssB = [], [], [], []
                for i in range(4):
                    meB = meM_ref[8 + i, :, pl.ds(kk, 1)]  # [4, 1, LB]
                    ieB = ieM_ref[8 + i, :, pl.ds(kk, 1)]
                    dpB = dpM_ref[8 + i, pl.ds(kk, 1)]
                    Bie_r = emis(ohdi_ref, ieB)
                    Bme_r = emis(ohdm_ref, meB)
                    # one backward B-stage shared by the sub/ins pair:
                    # y3 . beta_q == y2 . M_B^T (dpB*beta + shift_up(meB*beta))
                    uB = dpB * bq + _shift_up2(Bme_r * bq, 1, rowm, S)
                    wB = _solve_fwd_T2(uB, Bie_r, rowm, S)
                    if i >= 1:                             # sub to alt_i
                        meA = meM_ref[i - 1, :, pl.ds(kk, 1)]
                        ieA = ieM_ref[i - 1, :, pl.ds(kk, 1)]
                        dpA = dpM_ref[i - 1, pl.ds(kk, 1)]
                        v1 = _solve_fwd2(yp, emis(ohdi_ref, ieA), rowm)
                        y2 = dpA * v1 + emis(ohdm_ref, meA) * \
                            _shift_down2(v1, 1, rowm)
                        dA, dB = seg_dots(y2 * wB)
                        subsA.append(dA)
                        subsB.append(dB)
                    meC = meM_ref[3 + i, :, pl.ds(kk, 1)]  # ins alt_i
                    ieC = ieM_ref[3 + i, :, pl.ds(kk, 1)]
                    dpC = dpM_ref[3 + i, pl.ds(kk, 1)]
                    v1c = _solve_fwd2(yp1, emis(ohdi_ref, ieC), rowm)
                    y2c = dpC * v1c + emis(ohdm_ref, meC) * \
                        _shift_down2(v1c, 1, rowm)
                    dA, dB = seg_dots(y2c * wB)
                    inssA.append(dA)
                    inssB.append(dB)
                meD = meM_ref[7, :, pl.ds(kk, 1)]
                ieD = ieM_ref[7, :, pl.ds(kk, 1)]
                dpD = dpM_ref[7, pl.ds(kk, 1)]
                v1d = _solve_fwd2(yp, emis(ohdi_ref, ieD), rowm)
                y2d = dpD * v1d + emis(ohdm_ref, meD) * \
                    _shift_down2(v1d, 1, rowm)
                delA, delB = seg_dots(y2d * bq)

                blockA = jnp.concatenate(subsA + [delA] + inssA, axis=0)
                blockB = jnp.concatenate(subsB + [delB] + inssB, axis=0)
                lspA, lspB = lsp[0:1], lsp[1:2]
                lsp1A, lsp1B = lsp1[0:1], lsp1[1:2]
                lsqA, lsqB = lsq[0:1], lsq[1:2]
                lsrowA = jnp.concatenate(
                    [jnp.broadcast_to(lspA + lsqA, (4, LB)),
                     jnp.broadcast_to(lsp1A + lsqA, (4, LB))], axis=0)
                lsrowB = jnp.concatenate(
                    [jnp.broadcast_to(lspB + lsqB, (4, LB)),
                     jnp.broadcast_to(lsp1B + lsqB, (4, LB))], axis=0)
                contrib = (live_a * (jnp.log(jnp.maximum(blockA, TINY))
                                     + lsrowA)
                           + live_b * (jnp.log(jnp.maximum(blockB, TINY))
                                       + lsrowB))
                llsC_ref[0:8, pl.ds(kk, 1)] = (llsC_ref[0:8, pl.ds(kk, 1)]
                                               + contrib[:, None, :])
                return 0

            jax.lax.fori_loop(0, Km, bridge, 0)

            # ---- prepends (always scored; selection needs them) ----
            beta1 = betas_ref[1]
            lsb_1 = lsb_ref[1]                             # [2, LB]
            presA, presB = [], []
            for x in range(4):
                kxx = 5 * x
                me_xx = ME_ref[kxx]
                ie_xx = IE_ref[kxx]
                dp_xx = DP_ref[kxx:kxx + 1]
                me_x0 = jnp.zeros((4, LB), jnp.float32)
                ie_x0 = jnp.zeros((4, LB), jnp.float32)
                dp_x0 = jnp.zeros((1, LB), jnp.float32)
                for b in range(4):
                    mb = (t0 == b).astype(jnp.float32)
                    me_x0 = me_x0 + mb * ME_ref[4 * x + b]
                    ie_x0 = ie_x0 + mb * IE_ref[4 * x + b]
                    dp_x0 = dp_x0 + mb * DP_ref[4 * x + b:4 * x + b + 1]
                v1 = _solve_fwd2(e0, emis(ohdi_ref, ie_xx[:, None]), rowm)
                y2 = dp_xx * v1 + emis(ohdm_ref, me_xx[:, None]) * \
                    _shift_down2(v1, 1, rowm)
                v2 = _solve_fwd2(y2, emis(ohdi_ref, ie_x0[:, None]), rowm)
                y3 = dp_x0 * v2 + emis(ohdm_ref, me_x0[:, None]) * \
                    _shift_down2(v2, 1, rowm)
                dA, dB = seg_dots(y3 * beta1)
                presA.append(dA)
                presB.append(dB)
            pre_blockA = jnp.concatenate(presA, axis=0)
            pre_blockB = jnp.concatenate(presB, axis=0)
            pre_c = (live_a * (jnp.log(jnp.maximum(pre_blockA, TINY))
                               + jnp.broadcast_to(lsb_1[0:1], (4, LB)))
                     + live_b * (jnp.log(jnp.maximum(pre_blockB, TINY))
                                 + jnp.broadcast_to(lsb_1[1:2], (4, LB))))
            lls_ref[0:4, pl.ds(T, 1)] = (lls_ref[0:4, pl.ds(T, 1)]
                                         + pre_c[:, None, :])
            return 0

        jax.lax.fori_loop(0, (Cm + 1) // 2, c_body, 0)

        # ---- epilogue: scatter compacted slot scores to the dense layout
        # (one-hot reduction over KP per position; per block this is
        # ~2*8*KP*LB*Tm elements — microseconds, vs milliseconds for any
        # XLA-side remap of the same data)
        slot_all = slot_ref[:]                             # [KP, LB]

        def scat(p, _):
            m = (slot_all == p)[None]                      # [1, KP, LB]
            contrib = jnp.sum(jnp.where(m, llsC_ref[:], 0.0), axis=1)
            lls_ref[0:8, pl.ds(p, 1)] = contrib[:, None, :]
            return 0

        jax.lax.fori_loop(0, Tm, scat, 0)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "lane_block"))
def score_sparse_pallas(tpl, tlen, snr_bin, reads, rlens, cand, tables,
                        interpret: bool = False,
                        lane_block: int = LANE_BLOCK):
    """Candidate-sparse mutation scores: exact ll0 + mutation LLs at the
    flagged positions only (C7; performance.md:90-93).

    cand [B, T] bool — positions to bridge. Returns (lls [B, 9T+4] with 0
    at unbridged slots — caller masks them invalid, ll0 [B]). Bridged
    values equal the dense kernel's up to fp reassociation (the B-stage
    is solved via its exact transpose). All sparse bookkeeping (slot
    compaction, dense-layout writeback) happens in-kernel; the output
    layout matches the dense kernel exactly."""
    B, T = tpl.shape
    _, C, R = reads.shape
    S = _round_up(R + 1, 8)
    KP = T

    trans = tables["trans"][snr_bin]
    em = tables["emit_match"][snr_bin]
    es = tables["emit_stick"][snr_bin]
    ME = trans[..., 0:1] * em
    cur16 = jnp.arange(16) % 4
    onehot = jax.nn.one_hot(cur16, 4, dtype=jnp.float32)
    IE = trans[..., 1:2] * onehot[None] + trans[..., 2:3] * es
    DP = trans[..., 3]

    cand = cand & (jnp.arange(T)[None, :] < tlen[:, None])
    nc = cand.sum(1).astype(jnp.int32)                          # [B]

    ME_t = jnp.transpose(ME, (1, 2, 0))
    IE_t = jnp.transpose(IE, (1, 2, 0))
    DP_t = DP.T
    PWM_t = tables["pw_match"][snr_bin].T
    PWI_t = tables["pw_ins"][snr_bin].T
    tpl_t = jnp.clip(tpl, 0, 3).astype(jnp.int32).T
    tlen_t = tlen.astype(jnp.int32)[None]
    reads_t = jnp.transpose(reads, (1, 2, 0)).astype(jnp.int32)
    rl_t = rlens.astype(jnp.int32).T
    pri_t = cand.astype(jnp.float32).T                          # [T, B]

    LB = min(lane_block, _round_up(B, 128))
    Bp = _round_up(B, LB)
    if Bp != B:
        pad = Bp - B
        ME_t = jnp.pad(ME_t, ((0, 0), (0, 0), (0, pad)))
        IE_t = jnp.pad(IE_t, ((0, 0), (0, 0), (0, pad)))
        DP_t = jnp.pad(DP_t, ((0, 0), (0, pad)))
        PWM_t = jnp.pad(PWM_t, ((0, 0), (0, pad)), constant_values=1.0)
        PWI_t = jnp.pad(PWI_t, ((0, 0), (0, pad)), constant_values=1.0)
        tpl_t = jnp.pad(tpl_t, ((0, 0), (0, pad)))
        tlen_t = jnp.pad(tlen_t, ((0, 0), (0, pad)), constant_values=1)
        reads_t = jnp.pad(reads_t, ((0, 0), (0, 0), (0, pad)),
                          constant_values=-1)
        rl_t = jnp.pad(rl_t, ((0, 0), (0, pad)), constant_values=-1)
        pri_t = jnp.pad(pri_t, ((0, 0), (0, pad)))
        nc = jnp.pad(nc, (0, pad))

    grid = (Bp // LB,)
    tmax_blk = tlen_t[0].reshape(grid[0], LB).max(axis=1)
    cov_blk = (rl_t >= 0).sum(axis=0).reshape(grid[0], LB).max(axis=1)
    km_blk = nc.reshape(grid[0], LB).max(axis=1)
    bounds = jnp.stack([jnp.maximum(tmax_blk, 1), cov_blk, km_blk],
                       axis=1).astype(jnp.int32)

    def lane_spec(leading):
        n = len(leading)
        return pl.BlockSpec((*leading, LB),
                            lambda i, _n=n: (*(0,) * _n, i),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_sparse_kernel, T=T, C=C, R=R, S=S, KP=KP)
    lls3, ll0 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # bounds [grid, 3]
            lane_spec((T,)),          # tpl
            lane_spec((1,)),          # tlen
            lane_spec((T,)),          # priority (>0 = candidate)
            lane_spec((16, 4)),       # ME
            lane_spec((16, 4)),       # IE
            lane_spec((16,)),         # DP
            lane_spec((4,)),          # PWM
            lane_spec((4,)),          # PWI
            lane_spec((C, R)),        # reads
            lane_spec((C,)),          # rl
        ],
        out_specs=(lane_spec((8, T + 1)), lane_spec((8,))),
        out_shape=(jax.ShapeDtypeStruct((8, T + 1, Bp), jnp.float32),
                   jax.ShapeDtypeStruct((8, Bp), jnp.float32)),
        scratch_shapes=[
            pltpu.VMEM((4, T + 1, LB), jnp.float32),       # mex
            pltpu.VMEM((4, T + 1, LB), jnp.float32),       # iex
            pltpu.VMEM((T + 1, LB), jnp.float32),          # dpx
            pltpu.VMEM((N_SETS, 4, KP, LB), jnp.float32),  # meM (compacted)
            pltpu.VMEM((N_SETS, 4, KP, LB), jnp.float32),  # ieM
            pltpu.VMEM((N_SETS, KP, LB), jnp.float32),     # dpM
            pltpu.VMEM((KP, LB), jnp.int32),               # slot map
            pltpu.VMEM((8, KP, LB), jnp.float32),          # llsC (compacted)
            pltpu.VMEM((KP, LB), jnp.int32),               # tplC
            pltpu.VMEM((KP, LB), jnp.int32),               # prevC
            pltpu.VMEM((KP, LB), jnp.int32),               # nxtC
            pltpu.VMEM((T + 2, 2 * S, LB), jnp.float32),   # ycols (read pair)
            pltpu.VMEM((T + 2, 2, LB), jnp.float32),       # lsf (per segment)
            pltpu.VMEM((T + 1, 2 * S, LB), jnp.float32),   # betas (read pair)
            pltpu.VMEM((T + 1, 2, LB), jnp.float32),       # lsb (per segment)
            pltpu.VMEM((4, 2 * S, LB), jnp.float32),       # ohdm
            pltpu.VMEM((4, 2 * S, LB), jnp.float32),       # ohdi
            pltpu.VMEM((4, 2 * S, LB), jnp.float32),       # ohum
            pltpu.VMEM((4, 2 * S, LB), jnp.float32),       # ohui
        ],
        interpret=interpret,
    )(bounds, tpl_t, tlen_t, pri_t, ME_t, IE_t, DP_t, PWM_t, PWI_t,
      reads_t, rl_t)

    # identical epilogue to the dense kernel: relative->absolute remap
    lls3 = jnp.transpose(lls3, (2, 1, 0))[:B]          # [B, T+1, 8]
    reg = _rel_to_abs(lls3, tpl, T)
    pre = lls3[:, T, :4]
    ll0 = ll0[0, :B]
    return jnp.concatenate([reg, pre], axis=1), ll0
