"""Target-sharded global hypothesis selection with explicit collectives.

BASELINE config 5's pattern: the target axis partitions across chips
("cluster" mesh axis); each shard decodes its own targets against shared
dual prices, and the only cross-chip traffic is an all-reduce of the
slot-usage counts (the Lagrangian subgradient) over ICI — the
"dual-variable allreduce" of the north star.  The dual update is then
replicated deterministically on every shard, so prices never need a
broadcast.

Built on shard_map + lax.psum rather than hand-written RDMA: the
collective pattern is explicit, the transport is XLA's.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import TrackerShapes, TrackerParams
from ..core.select import _slot_index, leaf_scores


def _local_tables(state, shapes):
    slots, n_slots = _slot_index(state, shapes)
    T, L, W, _ = slots.shape
    return slots.reshape(T, L, W * 2), n_slots


def distributed_lagrangian(state, shapes: TrackerShapes,
                           params: TrackerParams, axis_name: str,
                           iters: int = 60, theta: float = 1.0):
    """Runs INSIDE shard_map: ``state`` holds this shard's targets.

    Returns (sel [T_local], obj_global, lb_global, feasible_global).
    """
    slots_flat, n_slots = _local_tables(state, shapes)
    T, L = state.leaf_mask.shape
    f = leaf_scores(state, params)

    def reduced_cost(lam):
        lam_pad = jnp.concatenate([lam, jnp.zeros((1,), jnp.float32)])
        return f + lam_pad[slots_flat].sum(axis=2)

    def usage_of(sel):
        s = slots_flat[jnp.arange(T), sel]
        s = jnp.where(state.tgt_mask[:, None], s, n_slots)
        cnt = jnp.zeros((n_slots + 1,), jnp.float32)
        cnt = cnt.at[s.reshape(-1)].add(1.0)
        # THE collective: global usage = sum of shard usages (ICI ring).
        return jax.lax.psum(cnt[:n_slots], axis_name)

    def obj_of(sel):
        local = jnp.where(state.tgt_mask, f[jnp.arange(T), sel], 0.0).sum()
        return jax.lax.psum(local, axis_name)

    def body(i, carry):
        lam, best_sel, best_obj, best_feas, best_lb = carry
        rc = reduced_cost(lam)
        sel = jnp.argmin(rc, axis=1)
        local_min = jnp.where(state.tgt_mask, jnp.min(rc, axis=1), 0.0).sum()
        lb = jax.lax.psum(local_min, axis_name) - lam.sum()
        best_lb = jnp.maximum(best_lb, lb)
        cnt = usage_of(sel)
        # used rows raise prices; slack-but-priced rows decay (see
        # core/select.py — without decay the dual diverges).
        g = jnp.where((cnt > 0) | (lam > 0), cnt - 1.0, 0.0)
        feas = ~jnp.any(cnt > 1.5)
        obj = obj_of(sel)
        better = feas & ((obj < best_obj) | ~best_feas)
        best_sel = jnp.where(better, sel, best_sel)
        best_obj = jnp.where(better, obj, best_obj)
        best_feas = best_feas | feas
        gnorm2 = jnp.maximum(jnp.dot(g, g), 1e-6)
        gap_est = jnp.where(best_feas, jnp.maximum(best_obj - lb, 1e-3), 1.0)
        # identical on every shard (g and totals are psum'd) -> lam stays
        # replicated without a broadcast.
        lam = jnp.maximum(0.0, lam + theta * gap_est / gnorm2 * g)
        return lam, best_sel, best_obj, best_feas, best_lb

    # best_sel is shard-varying (depends on local targets); mark the
    # initial carry accordingly for shard_map's varying-axes typing.
    init = (jnp.zeros((n_slots,), jnp.float32),
            jax.lax.pvary(jnp.zeros((T,), jnp.int32), (axis_name,)),
            jnp.asarray(jnp.inf, jnp.float32), jnp.asarray(False),
            jnp.asarray(-jnp.inf, jnp.float32))
    lam, best_sel, best_obj, best_feas, best_lb = jax.lax.fori_loop(
        0, iters, body, init)
    return best_sel, best_obj, best_lb, best_feas


def make_distributed_select(mesh: Mesh, shapes: TrackerShapes,
                            params: TrackerParams, axis_name: str = 'cluster',
                            iters: int = 60):
    """jitted shard_map wrapper: TrackerState sharded on the target axis."""
    from jax.experimental.shard_map import shard_map

    def spec_of(x):
        if x.ndim >= 1 and x.shape[0] == shapes.max_targets:
            return P(axis_name)
        return P()

    def fn(state):
        return distributed_lagrangian(state, shapes, params, axis_name,
                                      iters=iters)

    in_specs = None  # filled per-state below

    def run(state):
        specs = jax.tree_util.tree_map(spec_of, state)
        sm = shard_map(fn, mesh=mesh, in_specs=(specs,),
                       out_specs=(P(axis_name), P(), P(), P()))
        return jax.jit(sm)(state)

    return run
