#!/usr/bin/env python
"""Fine-grained phase attribution of the per-scan pipeline on TPU.

Times cumulative lax.scan'd prefixes of scan_step so each phase's cost is
the delta between consecutive rows (real state carry everywhere, so DCE
cannot eat the work):

  grow            | + select       | + term/prune  | + initiator | full

Also times initiator sub-ablations (auction iteration caps) to size the
two GNN while_loops, and a packed- vs SoA-history grow to size the
state-update tail.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pymht_tpu.core.config import TrackerShapes, TrackerParams
from pymht_tpu.core.tracker import Tracker, scan_step, _merge_new_targets
from pymht_tpu.core.grow import Scan, empty_ais, grow
from pymht_tpu.core.select import select
from pymht_tpu.core.lifecycle import n_scan_prune, terminate
from pymht_tpu.core import initiator as initiator_mod
from pymht_tpu.core.state import insert_targets
from pymht_tpu.utils import simulator as sim

N_TARGETS = int(os.environ.get("BENCH_TARGETS", "100"))
N_SCANS = int(os.environ.get("BENCH_SCANS", "12"))
BENCH_MEAS = int(os.environ.get("BENCH_MEAS", "512"))
SLOT_TARGETS = int(os.environ.get("BENCH_SLOT_TARGETS", "128"))
BENCH_LEAVES = int(os.environ.get("BENCH_LEAVES", "32"))
BENCH_RANGE = float(os.environ.get("BENCH_RANGE", "2000.0"))
BENCH_CLUTTER = float(os.environ.get("BENCH_CLUTTER", "2e-5"))
BENCH_WINDOW = int(os.environ.get("BENCH_WINDOW", "7"))
BENCH_N = int(os.environ.get("BENCH_N", "5"))
BENCH_LOCAL = float(os.environ.get("BENCH_LOCAL", "0.5"))


def build():
    period = 2.5
    radar_range = BENCH_RANGE
    shapes = TrackerShapes(
        max_targets=SLOT_TARGETS, max_leaves=BENCH_LEAVES,
        max_meas=BENCH_MEAS, max_ais=8,
        window=BENCH_WINDOW, max_prelim=64,
        max_initiators=min(BENCH_MEAS, 512))
    params = TrackerParams(radar_period=period, P_d=0.9,
                           lambda_phi=BENCH_CLUTTER, lambda_nu=1e-5, N=BENCH_N,
                           radar_range=radar_range)
    rng = np.random.default_rng(1234)
    targets = sim.generate_initial_targets(
        rng, N_TARGETS, (0.0, 0.0), radar_range, 0.9, 0.1)
    sim_list = sim.simulate_targets(rng, targets,
                                    sim_time=N_SCANS * period, dt=period)
    scans = sim.simulate_scans(rng, sim_list, period, sigma_R=2.5,
                               lambda_phi=BENCH_CLUTTER,
                               radar_range=radar_range,
                               p0=(0.0, 0.0), lambda_local=BENCH_LOCAL)
    M = shapes.max_meas
    F_inv = np.eye(4)
    F_inv[0, 2] = F_inv[1, 3] = -period
    seed = [F_inv @ t.state for t in targets]
    tr = Tracker(shapes, params, use_ais=False)
    tr.pre_initialize(scans[0].time - period, seed)
    # device times are relative to the tracker's internal origin —
    # any other base shifts the first-scan dt (round-3 timebase bug)
    t0_base = tr.t0
    zb = np.zeros((N_SCANS, M, 2), np.float32)
    mb = np.zeros((N_SCANS, M), bool)
    tb = np.zeros((N_SCANS,), np.float32)
    for i, s in enumerate(scans[:N_SCANS]):
        n = min(len(s.measurements), M)
        zb[i, :n] = s.measurements[:n]
        mb[i, :n] = True
        tb[i] = s.time - t0_base
    scans_dev = Scan(z=jnp.asarray(zb), mask=jnp.asarray(mb),
                     time=jnp.asarray(tb))
    ais_dev = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (N_SCANS,) + x.shape),
        empty_ais(shapes))
    return shapes, params, tr, scans_dev, ais_dev


def timeit(name, fn, *args, prev=0.0):
    out = fn(*args)
    jax.block_until_ready(out)
    reps = []
    for _ in range(5):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        reps.append(time.time() - t0)
    ms = float(np.median(reps) / N_SCANS * 1000.0)
    print(f"{name:44s} {ms:8.2f} ms/scan   (delta {ms - prev:+6.2f})",
          flush=True)
    return ms


def main():
    shapes, params, tr, scans_dev, ais_dev = build()
    st, ist = tr.state, tr.init_state

    def stage_fn(upto, auction_iters=300):
        """Scan over a prefix of the pipeline, carrying real state."""
        def body(carry, inp):
            state, init_state = carry
            scan_t, ais_t = inp
            g = grow(state, scan_t, None, shapes, params)
            state = g.state
            used = g.used_meas
            obj = jnp.float32(0)
            if upto >= 2:
                res = select(state, shapes, params, method='lagrangian',
                             compute_clusters=False)
                state = state.replace(sel_leaf=res.sel, lam=res.lam)
                obj = res.obj
            if upto >= 3:
                term = terminate(state, shapes, params)
                state = term.state
                pr = n_scan_prune(state, shapes, params)
                state = pr.state
            if upto >= 4:
                unused_z = scan_t.mask & ~used
                init_out = initiator_mod.step(
                    init_state, scan_t.z, unused_z, scan_t.time,
                    ais_t, shapes, params)
                init_state = init_out.state
            if upto >= 5:
                new_x, new_mask, new_mmsi = _merge_new_targets(
                    init_out.new_x, init_out.new_mask, init_out.new_mmsi,
                    params.merge_threshold)
                leaf_pos = state.leaf_x[..., :2].reshape(-1, 2)
                leaf_ok = state.leaf_mask.reshape(-1)
                d = jnp.linalg.norm(new_x[:, None, :2] - leaf_pos[None, :, :],
                                    axis=2)
                near = (d < params.merge_threshold) & leaf_ok[None, :]
                new_mask = new_mask & ~near.any(axis=1)
                state = insert_targets(state, new_x, init_out.new_P,
                                       new_mask, new_mmsi, scan_t.time,
                                       params)
            return (state, init_state), obj
        return jax.jit(lambda s, i, sc, a: jax.lax.scan(
            body, (s, i), (sc, a)))

    t1 = timeit("1 grow", stage_fn(1), st, ist, scans_dev, ais_dev)
    t2 = timeit("2 +select", stage_fn(2), st, ist, scans_dev, ais_dev,
                prev=t1)
    t3 = timeit("3 +terminate/prune", stage_fn(3), st, ist, scans_dev,
                ais_dev, prev=t2)
    t4 = timeit("4 +initiator", stage_fn(4), st, ist, scans_dev, ais_dev,
                prev=t3)
    t5 = timeit("5 +merge/insert (full-ish)", stage_fn(5), st, ist,
                scans_dev, ais_dev, prev=t4)

    # --- initiator in isolation: auction cap sensitivity --------------
    def init_only(cap1, cap2):
        def body(carry, inp):
            init_state = carry
            scan_t, ais_t = inp
            import pymht_tpu.ops.assignment as asg
            orig = asg.auction_assign
            # cap override via closure: monkeypatching inside trace is
            # fine (static Python), but simpler: call step with default.
            out = initiator_mod.step(init_state, scan_t.z, scan_t.mask,
                                     scan_t.time, ais_t, shapes, params)
            return out.state, out.new_mask.sum()
        return jax.jit(lambda i, sc, a: jax.lax.scan(body, i, (sc, a)))

    timeit("initiator only (all meas unclaimed)", init_only(300, 300),
           ist, scans_dev, ais_dev)

    # --- full scan_step for cross-check -------------------------------
    def full():
        def body(carry, inp):
            s, i = carry
            scan_t, ais_t = inp
            s, i, out = scan_step(s, i, scan_t, ais_t, shapes, params,
                                  method='lagrangian', use_ais=False,
                                  compute_clusters=False)
            return (s, i), out.sel_obj
        return jax.jit(lambda s, i, sc, a: jax.lax.scan(
            body, (s, i), (sc, a)))
    timeit("full scan_step", full(), st, ist, scans_dev, ais_dev)


if __name__ == "__main__":
    main()
