#!/usr/bin/env python
"""Quality check of the tiered hybrid selection vs the exact MILP oracle
on every scan of the bench workload (CPU)."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pymht_tpu.core.config import TrackerShapes, TrackerParams
from pymht_tpu.core.tracker import Tracker, scan_step
from pymht_tpu.core.grow import Scan, empty_ais, grow
from pymht_tpu.core import select as sel_mod
from pymht_tpu.utils import simulator as sim
from pymht_tpu.utils.oracle import milp_select_oracle

N_TARGETS = int(os.environ.get("BENCH_TARGETS", "100"))
N_SCANS = int(os.environ.get("BENCH_SCANS", "12"))
BENCH_MEAS = int(os.environ.get("BENCH_MEAS", "512"))
METHOD = os.environ.get("METHOD", "lagrangian")


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
    tr = Tracker(shapes, params, method=METHOD, use_ais=False)
    tr.pre_initialize(scans[0].time - period, seed)

    state, init_state = tr.state, tr.init_state
    t0_base = scans[0].time - period
    step = jax.jit(lambda s, i, sc, a: scan_step(
        s, i, sc, a, shapes, params, method=METHOD, use_ais=False))

    M = shapes.max_meas
    gaps = []
    for k, s in enumerate(scans[:N_SCANS]):
        n = min(len(s.measurements), M)
        z = np.zeros((M, 2), np.float32)
        z[:n] = s.measurements[:n]
        mask = np.zeros((M,), bool)
        mask[:n] = True
        scan = Scan(z=jnp.asarray(z), mask=jnp.asarray(mask),
                    time=jnp.asarray(s.time - t0_base, jnp.float32))
        ais = empty_ais(shapes)

        g = grow(state, scan, None, shapes, params)
        gs = g.state
        res = sel_mod.select(gs, shapes, params, method=METHOD,
                             compute_clusters=False)
        # device objective of the hybrid's selection
        f = np.asarray(sel_mod.leaf_scores(gs, params)).astype(np.float64)
        tgt = np.asarray(gs.tgt_mask)
        sel_dev = np.asarray(res.sel)
        obj_dev = float(sum(f[t, sel_dev[t]] for t in range(f.shape[0])
                            if tgt[t]))
        # feasibility check of the combined selection
        slots, n_slots = sel_mod._slot_index(gs, shapes)
        sf = np.asarray(slots).reshape(f.shape[0], f.shape[1], -1)
        used = {}
        conflict = False
        for t in np.nonzero(tgt)[0]:
            for sl in sf[t, sel_dev[t]]:
                if sl < n_slots:
                    if sl in used:
                        conflict = True
                    used[sl] = t
        sel_o, obj_o, optimal = milp_select_oracle(gs, shapes, params)
        gap = (obj_dev - obj_o) / max(1.0, abs(obj_o))
        gaps.append(gap)
        print(f"scan {k:2d}: dev_obj={obj_dev:10.4f} oracle={obj_o:10.4f} "
              f"gap={gap * 100:7.4f}% feas_dev={bool(res.feasible)!s:5s} "
              f"conflict={conflict} optimal={optimal} "
              f"rep_obj={float(res.obj):10.4f} bound={float(res.bound):10.4f}")
        state, init_state, out = step(state, init_state, scan, ais)
    print(f"median gap {np.median(gaps) * 100:.4f}%  "
          f"max gap {np.max(gaps) * 100:.4f}%")


if __name__ == "__main__":
    main()
