"""Benchmark: Arrow polish throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: consensus throughput of the device polish phase (the compute that is
>95% of the reference's CPU time and the part PacBio moved to GPUs on Revio;
/root/reference/docs/faq/revio.md:14-27), expressed as 1kb-insert ZMWs/sec/chip.

Baseline: ccs v6.2.0 HG002 15kb = 2,832,543 HiFi reads in 4h49m on 256
threads (docs/faq/performance.md:48-54) ≈ 163 ZMWs/s ≈ 2.45 Mbases
consensus/s per *node*. vs_baseline = our consensus bases/s per chip over
the reference's bases/s per node.

Design notes: one fixed compiled shape (remote compile over the axon tunnel
is slow and variance-heavy), steady-state timing over several dispatches.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

# steady-state shape: 512 windows x 16 subread lanes ≈ 11 concurrent
# 1kb-inserts' worth of windows per dispatch
B, C, T_CAP, R_CAP = 512, 16, 48, 56
MAX_ITERS = 8
WINDOW_CORE = 22  # consensus bases emitted per window
BASELINE_BASES_PER_S = 2_832_543 * 15_000 / (4 * 3600 + 49 * 60)  # ≈2.45e6


def make_batch(seed: int, params, jnp):
    from ccs_tpu.sim.simulator import simulate_read
    rng = np.random.default_rng(seed)
    tpl = np.full((B, T_CAP), -1, np.int8)
    tlen = np.zeros(B, np.int32)
    reads = np.full((B, C, R_CAP), -1, np.int8)
    rlens = np.full((B, C), -1, np.int32)
    snr_bin = np.full(B, 4, np.int32)
    for b in range(B):
        tl = int(rng.integers(24, 31))
        t = rng.integers(0, 4, tl).astype(np.int8)
        corrupt = t.copy()
        p = int(rng.integers(0, tl))
        corrupt[p] = (corrupt[p] + 1) % 4  # ~1 error/window: realistic work
        tpl[b, :tl] = corrupt
        tlen[b] = tl
        for c in range(C):
            r = simulate_read(t, params, 4, rng)[:R_CAP]
            reads[b, c, :len(r)] = r
            rlens[b, c] = len(r)
    cs = np.full(B, 4, np.int32)
    ce = tlen - 4
    return [jnp.asarray(x) for x in
            (tpl, tlen, cs, ce, snr_bin, reads, rlens)]


def main() -> None:
    import jax
    import jax.numpy as jnp
    from ccs_tpu.models.chemistry import default_params
    from ccs_tpu.ops.hmm_jax import params_to_device
    from ccs_tpu.pipeline.polish import polish_windows

    params = default_params()
    tables = params_to_device(params)
    batches = [make_batch(s, params, jnp) for s in range(4)]

    t0 = time.time()
    state, qv, _ = polish_windows(*batches[0], tables, max_iters=MAX_ITERS)
    _ = np.asarray(state.tpl)
    warm = time.time() - t0
    print(f"# warmup (compile + first run): {warm:.1f}s on "
          f"{jax.devices()[0]}", file=sys.stderr)

    times = []
    for a in batches[1:]:
        t0 = time.time()
        state, qv, _ = polish_windows(*a, tables, max_iters=MAX_ITERS)
        _ = np.asarray(state.tpl)
        _ = np.asarray(qv)
        times.append(time.time() - t0)
    dt = min(times)
    windows_per_s = B / dt
    bases_per_s = windows_per_s * WINDOW_CORE
    zmw1kb_per_s = bases_per_s / 1000.0
    vs_baseline = bases_per_s / BASELINE_BASES_PER_S
    print(f"# steady-state: {dt*1000:.0f} ms/batch, "
          f"{windows_per_s:.0f} windows/s, {bases_per_s/1e6:.2f} Mbase/s",
          file=sys.stderr)
    print(json.dumps({
        "metric": "ZMWs/sec/chip (polish phase, 1kb-insert equivalent)",
        "value": round(zmw1kb_per_s, 2),
        "unit": "zmw/s",
        "vs_baseline": round(vs_baseline, 4),
    }))


if __name__ == "__main__":
    main()
