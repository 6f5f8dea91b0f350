#!/usr/bin/env python
"""Quality/effort sweep of the Lagrangian selection exits on the bench
scenario (CPU).

Replays the bench pipeline scan by scan, captures each post-grow forest,
and for each select_kw variant reports: per-scan oracle gap (exact MILP
via HiGHS), subgradient iteration count, and whether the fast path would
have fired.  Drives the choice of convergence tolerance / patience that
keeps the <=0.1% contract at minimum iterations.

Run:  env PYTHONPATH= PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
      python tools/tune_select.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pymht_tpu.core.config import TrackerShapes, TrackerParams
from pymht_tpu.core.grow import Scan, grow
from pymht_tpu.core import select as sel_mod
from pymht_tpu.core.lifecycle import n_scan_prune, terminate
from pymht_tpu.core import initiator as initiator_mod
from pymht_tpu.core.state import empty_state, insert_targets
from pymht_tpu.core.tracker import _merge_new_targets
from pymht_tpu.models import pv
from pymht_tpu.utils import simulator as sim

N_TARGETS = int(os.environ.get("BENCH_TARGETS", "100"))
N_SCANS = int(os.environ.get("BENCH_SCANS", "12"))
BENCH_MEAS = int(os.environ.get("BENCH_MEAS", "512"))


def build():
    period = 2.5
    radar_range = 2000.0
    shapes = TrackerShapes(
        max_targets=128, max_leaves=32, max_meas=BENCH_MEAS, max_ais=8,
        window=7, max_prelim=64, max_initiators=BENCH_MEAS)
    params = TrackerParams(radar_period=period, P_d=0.9,
                           lambda_phi=2e-5, lambda_nu=1e-5, N=5,
                           radar_range=radar_range)
    rng = np.random.default_rng(1234)
    targets = sim.generate_initial_targets(
        rng, N_TARGETS, (0.0, 0.0), radar_range, 0.9, 0.1)
    sim_list = sim.simulate_targets(rng, targets,
                                    sim_time=N_SCANS * period, dt=period)
    scans = sim.simulate_scans(rng, sim_list, period, sigma_R=2.5,
                               lambda_phi=2e-5, radar_range=radar_range,
                               p0=(0.0, 0.0), lambda_local=0.5)
    return shapes, params, targets, scans, period


def instrumented_lagrangian(state, shapes, params, **kw):
    """select_lagrangian + iteration count (mirrors the production loop
    by calling it, then re-running the while condition trace host-side
    is impractical — instead we re-enter the module function with a
    wrapped while_loop to count trips)."""
    counts = {}
    orig = jax.lax.while_loop

    def counting(cond, body, init):
        # count outer-loop trips only (init tuple length 8 is the outer)
        if isinstance(init, tuple) and len(init) == 8:
            it = [0]

            def body2(c):
                it[0] += 1
                return body(c)
            # run eagerly (CPU, no jit): python while
            c = init
            while bool(cond(c)):
                c = body(c)
                it[0] += 1
            counts['outer'] = it[0]
            return c
        return orig(cond, body, init)

    jax.lax.while_loop = counting
    try:
        res = sel_mod.select_lagrangian(state, shapes, params, **kw)
    finally:
        jax.lax.while_loop = orig
    return res, counts.get('outer', 0)


def main():
    shapes, params, targets, scans, period = build()
    state = empty_state(shapes, params)
    init_state = initiator_mod.empty_initiator(shapes)
    F_inv = np.eye(4)
    F_inv[0, 2] = F_inv[1, 3] = -period
    seeds = np.stack([F_inv @ t.state for t in targets]).astype(np.float32)
    T = shapes.max_targets
    t0 = scans[0].time - period
    P0 = np.broadcast_to(np.asarray(pv.P0), (len(seeds), 4, 4))
    state = insert_targets(state, jnp.asarray(seeds), jnp.asarray(np.array(P0)),
                           jnp.ones((len(seeds),), bool),
                           jnp.zeros((len(seeds),), jnp.int32),
                           jnp.asarray(0.0, jnp.float32), params)

    from pymht_tpu.utils.oracle import milp_select_oracle

    variants = {
        'tight(tol=1e-4,pat=6)': dict(),
        'seed-only(iters=0)': dict(iters=0),
        'iters=3': dict(iters=3),
        'iters=8': dict(iters=8),
    }
    M = shapes.max_meas
    for i, s in enumerate(scans[:N_SCANS]):
        n = min(len(s.measurements), M)
        z = np.zeros((M, 2), np.float32)
        z[:n] = s.measurements[:n]
        mask = np.zeros((M,), bool)
        mask[:n] = True
        scan = Scan(z=jnp.asarray(z), mask=jnp.asarray(mask),
                    time=jnp.asarray(s.time - t0, jnp.float32))
        g = grow(state, scan, None, shapes, params)
        st2 = g.state

        sel0, obj0, feas0 = sel_mod._independent_best(st2, shapes, params)
        line = f"scan {i:2d} fast={bool(feas0)!s:5s}"
        if not bool(feas0):
            sel_o, obj_o, opt = milp_select_oracle(st2, shapes, params)
            for name, kw in variants.items():
                res, iters = instrumented_lagrangian(st2, shapes, params, **kw)
                obj_dev = float(res.obj)
                gap = (obj_dev - obj_o) / max(1.0, abs(obj_o))
                line += (f" | {name}: it={iters:2d} gap={gap:+.2e}"
                         f" feas={bool(res.feasible)!s:5s}")
        print(line, flush=True)

        # continue the pipeline with the production default
        res = sel_mod.select(st2, shapes, params, method='lagrangian',
                             compute_clusters=False)
        st2 = st2.replace(sel_leaf=res.sel, lam=res.lam)
        term = terminate(st2, shapes, params)
        st2 = term.state
        pr = n_scan_prune(st2, shapes, params)
        st2 = pr.state
        unused_z = scan.mask & ~g.used_meas
        from pymht_tpu.core.grow import empty_ais
        init_out = initiator_mod.step(init_state, scan.z, unused_z,
                                      scan.time, empty_ais(shapes),
                                      shapes, params)
        init_state = init_out.state
        new_x, new_mask, new_mmsi = _merge_new_targets(
            init_out.new_x, init_out.new_mask, init_out.new_mmsi,
            params.merge_threshold)
        leaf_pos = st2.leaf_x[..., :2].reshape(-1, 2)
        leaf_ok = st2.leaf_mask.reshape(-1)
        d = jnp.linalg.norm(new_x[:, None, :2] - leaf_pos[None, :, :],
                            axis=2)
        near = (d < params.merge_threshold) & leaf_ok[None, :]
        new_mask = new_mask & ~near.any(axis=1)
        state = insert_targets(st2, new_x, init_out.new_P, new_mask,
                               new_mmsi, scan.time, params)


if __name__ == "__main__":
    main()
