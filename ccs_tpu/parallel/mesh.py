"""Device mesh + sharded polish step (components P1/P2/P5, SURVEY.md §2.2).

The reference's only parallelism is data parallelism over ZMWs (thread pool
in-node, ``--chunk`` across nodes; /root/reference/docs/faq/parallelize.md:7-29).
The TPU-native equivalent is a 1-D ``('zmw',)`` mesh: window batches shard
over it, Arrow parameter tables replicate, and the only collectives are the
summary-stat reductions at the end (psum over ICI/DCN). ZMWs never
communicate, so no point-to-point is needed.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P



def make_zmw_mesh(n_devices: Optional[int] = None,
                  devices=None) -> Mesh:
    """1-D data-parallel mesh over ZMWs/windows."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return jax.make_mesh((len(devices),), ("zmw",), devices=np.asarray(devices))


def shard_fused_polish(mesh: Mesh, tables: dict, max_iters: int = 40,
                       use_pallas: bool = False, thresh: float = 0.02,
                       tail_bucket: int = 0, use_psum: bool = True,
                       sparse: bool = False):
    """Sharded fused polish step over the ('zmw',) mesh — the PRODUCT path.

    Window batches shard on their leading axis across all mesh devices
    (P1/P2); parameter tables replicate (L1). Each shard iterates until its
    own windows converge — no cross-device lock-step; the only collective is
    the psum over the per-shard summary counters (P5 — the report
    all-reduce, the TPU analog of merging chunked ccs_report counts;
    parallelize.md:15-29). Returns a jitted
    fn(tpl, tlen, cs, ce, snr_bin, reads, rlens, is_first, priority) ->
    (state, qv, stats) with stats = [n_converged, total_iters, yield_bases]
    reduced across the mesh. Leading axes must be divisible by the mesh
    size.
    """
    from ccs_tpu.pipeline.polish_fused import polish_windows_fused_impl

    n_dev = int(np.prod(list(mesh.shape.values())))

    def step(tables_arg, tpl, tlen, cs, ce, snr_bin, reads, rlens, is_first,
             priority):
        state, qv, _p_err = polish_windows_fused_impl(
            tpl, tlen, cs, ce, snr_bin, reads, rlens, tables_arg,
            max_iters=max_iters, is_first=is_first, priority=priority,
            use_pallas=use_pallas, thresh=thresh, tail_bucket=tail_bucket,
            sparse=sparse)
        live = (rlens >= 0).any(-1)
        n_conv = jnp.sum((~state.active & live).astype(jnp.int32))
        total_iters = jnp.sum(state.n_iter)
        yield_bases = jnp.sum(jnp.where(
            live, jnp.maximum(state.core_end - state.core_start, 0), 0))
        stats = jnp.stack([n_conv, total_iters, yield_bases])
        if n_dev > 1 and use_psum:
            stats = jax.lax.psum(stats, "zmw")
        return state, qv, stats

    if n_dev == 1:
        # single device: plain jit — shard_map adds nothing but compile time
        jfn = jax.jit(step)
        tables_repl = tables
    else:
        # without psum (CPU virtual meshes — see engine), stats come back
        # per-shard and the caller sums on the host: XLA:CPU hard-aborts
        # the whole process when collective participants skew >40 s
        # (rendezvous.cc termination timeout), which long polish programs
        # on oversubscribed host cores can always hit
        smapped = jax.shard_map(
            step, mesh=mesh,
            in_specs=(P(),) + (P("zmw"),) * 9,
            out_specs=(P("zmw"), P("zmw"),
                       P() if use_psum else P("zmw")),
            check_vma=False)
        repl = NamedSharding(mesh, P())
        tables_repl = jax.device_put(
            tables, jax.tree.map(lambda _: repl, tables))
        jfn = jax.jit(smapped)

    data_sharding = (None if n_dev == 1
                     else NamedSharding(mesh, P("zmw")))

    def fn(*args):
        # explicit async device_put of host arrays: passing numpy straight
        # into jit forces a synchronous per-call transfer that breaks the
        # dispatch pipeline (measured +30 ms/call at production shapes over
        # the remote-chip tunnel); device_put overlaps the upload with the
        # previous call's execution
        args = tuple(a if isinstance(a, jax.Array)
                     else jax.device_put(a, data_sharding) for a in args)
        return jfn(tables_repl, *args)

    fn._jitted = jfn  # exposed for compile-cache assertions in tests
    fn.stats_sharded = bool(n_dev > 1 and not use_psum)
    return fn


def device_put_sharded_batch(mesh: Mesh, arrays: tuple):
    """Place host window arrays onto the mesh, sharded over axis 0."""
    data = NamedSharding(mesh, P("zmw"))
    return tuple(jax.device_put(a, data) for a in arrays)
