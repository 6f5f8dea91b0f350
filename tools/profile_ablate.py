#!/usr/bin/env python
"""Ablation timing of the per-scan pipeline at bench shapes on TPU.

Times lax.scan'd variants of the step to attribute ms/scan between
grow, selection (fast path / subgradient loop), and lifecycle+initiate.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pymht_tpu.core.config import TrackerShapes, TrackerParams
from pymht_tpu.core.tracker import Tracker, scan_many
from pymht_tpu.core.grow import Scan, empty_ais, grow
from pymht_tpu.core.select import select
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
    M = shapes.max_meas
    t0_base = scans[0].time - period
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
    F_inv = np.eye(4)
    F_inv[0, 2] = F_inv[1, 3] = -period
    seed = [F_inv @ t.state for t in targets]
    tr = Tracker(shapes, params, use_ais=False)
    tr.pre_initialize(scans[0].time - period, seed)
    return shapes, params, tr, scans_dev, ais_dev


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    reps = []
    for _ in range(5):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        reps.append(time.time() - t0)
    ms = float(np.median(reps) / N_SCANS * 1000.0)
    print(f"{name:42s} {ms:8.2f} ms/scan")
    return ms


def main():
    shapes, params, tr, scans_dev, ais_dev = build()
    st, ist = tr.state, tr.init_state

    def run_full(method, select_kw=None, compute_clusters=False):
        return jax.jit(lambda s, i, sc, a: scan_many(
            s, i, sc, a, shapes, params, method=method, use_ais=False,
            compute_clusters=compute_clusters, select_kw=select_kw))

    # grow-only loop
    def grow_only(s, sc, a):
        def body(st_, inp):
            scan_t, _ = inp
            g = grow(st_, scan_t, None, shapes, params)
            return g.state, g.used_meas
        return jax.lax.scan(body, s, (sc, a))
    grow_j = jax.jit(grow_only)

    # grow + select loop (no lifecycle / initiate)
    def grow_select(method, select_kw=None):
        def f(s, sc, a):
            def body(st_, inp):
                scan_t, _ = inp
                g = grow(st_, scan_t, None, shapes, params)
                st2 = g.state
                res = select(st2, shapes, params, method=method,
                             compute_clusters=False, **(select_kw or {}))
                st2 = st2.replace(sel_leaf=res.sel, lam=res.lam)
                return st2, res.obj
            return jax.lax.scan(body, s, (sc, a))
        return jax.jit(f)

    timeit("grow only", grow_j, st, scans_dev, ais_dev)
    timeit("grow+select greedy", grow_select('greedy'), st, scans_dev, ais_dev)
    timeit("grow+select lagr (default)", grow_select('lagrangian'),
           st, scans_dev, ais_dev)
    timeit("grow+select lagr iters=1", grow_select('lagrangian',
           {'iters': 1}), st, scans_dev, ais_dev)
    timeit("full greedy", run_full('greedy'), st, ist, scans_dev, ais_dev)
    timeit("full lagr (default)", run_full('lagrangian'),
           st, ist, scans_dev, ais_dev)
    timeit("full lagr iters=1", run_full('lagrangian', {'iters': 1}),
           st, ist, scans_dev, ais_dev)
    timeit("full lagr + clusters", run_full('lagrangian',
           compute_clusters=True), st, ist, scans_dev, ais_dev)


if __name__ == "__main__":
    main()
