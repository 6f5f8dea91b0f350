#!/usr/bin/env python
"""Diagnose the conflict structure of the bench workload on CPU.

Per scan (post-grow): fast-path feasibility, cluster-size histogram,
number of Lagrangian iterations the current solver would burn, and the
seed-repair quality.  Drives the selection redesign: if conflicted
clusters are small (2-4 targets), batched exact enumeration replaces the
subgradient loop.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pymht_tpu.core.config import TrackerShapes, TrackerParams
from pymht_tpu.core.tracker import Tracker
from pymht_tpu.core.grow import Scan, empty_ais, grow
from pymht_tpu.core import select as sel_mod
from pymht_tpu.utils import simulator as sim

N_TARGETS = int(os.environ.get("BENCH_TARGETS", "100"))
N_SCANS = int(os.environ.get("BENCH_SCANS", "12"))
BENCH_MEAS = int(os.environ.get("BENCH_MEAS", "512"))


def main():
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
    F_inv = np.eye(4)
    F_inv[0, 2] = F_inv[1, 3] = -period
    seed = [F_inv @ t.state for t in targets]
    tr = Tracker(shapes, params, method='lagrangian', use_ais=False)
    tr.pre_initialize(scans[0].time - period, seed)

    state = tr.state
    init_state = tr.init_state
    t0_base = scans[0].time - period

    from pymht_tpu.core.tracker import scan_step
    step = jax.jit(lambda s, i, sc, a: scan_step(
        s, i, sc, a, shapes, params, method='lagrangian', use_ais=False))

    M = shapes.max_meas
    for k, s in enumerate(scans[:N_SCANS]):
        n = min(len(s.measurements), M)
        z = np.zeros((M, 2), np.float32)
        z[:n] = s.measurements[:n]
        mask = np.zeros((M,), bool)
        mask[:n] = True
        scan = Scan(z=jnp.asarray(z), mask=jnp.asarray(mask),
                    time=jnp.asarray(s.time - t0_base, jnp.float32))
        ais = empty_ais(shapes)

        # post-grow snapshot for analysis
        g = grow(state, scan, None, shapes, params)
        gs = g.state

        sel0, obj0, feas0 = sel_mod._independent_best(gs, shapes, params)
        labels, n_clusters = sel_mod.cluster(gs, shapes)
        labels = np.asarray(labels)
        tgt_mask = np.asarray(gs.tgt_mask)
        sizes = {}
        for t in np.nonzero(tgt_mask)[0]:
            sizes[labels[t]] = sizes.get(labels[t], 0) + 1
        hist = {}
        for v in sizes.values():
            hist[v] = hist.get(v, 0) + 1
        res = sel_mod.select_lagrangian(gs, shapes, params)
        # iteration count: re-run pieces to estimate? expose via quick hack
        print(f"scan {k:2d}: n_meas={n:4d} n_tgt={tgt_mask.sum():3d} "
              f"fast={bool(feas0)!s:5s} n_clusters={int(n_clusters):3d} "
              f"size_hist={dict(sorted(hist.items()))} "
              f"lag_obj={float(res.obj):9.3f} bound={float(res.bound):9.3f} "
              f"feas={bool(res.feasible)}")
        # advance with the real step
        state, init_state, out = step(state, init_state, scan, ais)
    # final forest: measure seed-repair-only quality vs lagrangian
    print("done")


if __name__ == "__main__":
    main()
