#!/usr/bin/env python
"""Count sequential while_loop iterations per scan in the hybrid
selection by monkeypatching lax.while_loop with an eager Python loop
(CPU, outside jit).  Attribution: cluster label-prop, repair rounds,
subgradient iterations."""
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pymht_tpu.core.config import TrackerShapes, TrackerParams
from pymht_tpu.core.tracker import Tracker, scan_step
from pymht_tpu.core.grow import Scan, empty_ais, grow
from pymht_tpu.core import select as sel_mod
from pymht_tpu.utils import simulator as sim

N_TARGETS = int(os.environ.get("BENCH_TARGETS", "100"))
N_SCANS = int(os.environ.get("BENCH_SCANS", "12"))
BENCH_MEAS = int(os.environ.get("BENCH_MEAS", "512"))

counts = defaultdict(int)
_real_while = jax.lax.while_loop


def counting_while(cond, body, init):
    import traceback
    # attribute by caller function name
    stack = traceback.extract_stack()
    caller = None
    for fr in reversed(stack[:-1]):
        if fr.filename.endswith('select.py'):
            caller = fr.name
            break
    c = init
    n = 0
    while bool(cond(c)):
        c = body(c)
        n += 1
    counts[caller or 'other'] += n
    return c


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

    state, ist = tr.state, tr.init_state
    t0 = scans[0].time - period
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
                    time=jnp.asarray(s.time - t0, jnp.float32))
        g = grow(state, scan, None, shapes, params)
        gs = g.state
        import json
        select_kw = json.loads(os.environ.get("SELECT_KW", "{}"))
        counts.clear()
        jax.lax.while_loop = counting_while
        sel_mod.EAGER_DEBUG = True
        try:
            res = sel_mod.select(gs, shapes, params, method='lagrangian',
                                 compute_clusters=False, **select_kw)
            res = jax.tree_util.tree_map(np.asarray, res)
        finally:
            jax.lax.while_loop = _real_while
            sel_mod.EAGER_DEBUG = False
        ogap = float('nan')
        if os.environ.get("ORACLE", "1") == "1":
            from pymht_tpu.utils.oracle import milp_select_oracle
            f = np.asarray(sel_mod.leaf_scores(gs, params)).astype(np.float64)
            tgt = np.asarray(gs.tgt_mask)
            sd = np.asarray(res.sel)
            obj_dev = float(sum(f[t, sd[t]] for t in range(f.shape[0])
                                if tgt[t]))
            _, obj_o, opt = milp_select_oracle(gs, shapes, params)
            ogap = (obj_dev - obj_o) / max(1.0, abs(obj_o))
        print(f"scan {k:2d}: {dict(counts)} obj={float(res.obj):9.3f} "
              f"dualgap={(float(res.obj) - float(res.bound)):8.4f} "
              f"oracle_gap={ogap * 100:7.4f}%")
        state, ist, out = step(state, ist, scan, empty_ais(shapes))


if __name__ == "__main__":
    main()
