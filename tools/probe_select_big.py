#!/usr/bin/env python
"""Attribute the select cost at the T=8192 saturation point (round 5).

Builds the same scenario as bench_saturation.py run_point(T), streams
N-1 scans, grows the last, then times SELECT ALONE on the captured
post-grow forest under variants:

  default          — select_hybrid as the pipeline runs it
  iters8           — Lagrangian budget capped at 8 (iteration-bound?)
  cap512           — contested_cap 512 (overflow-bound?)
  fastpath_only    — method='greedy' (argmin decode; everything else
                     is the hybrid's overhead: usage builds, cluster,
                     tier-2, Uc compaction)
  cluster_only     — just _hist_usage + cluster()

Also reports host-side diagnostics: live targets, contested-slot count
vs contested_cap, independent-decode feasibility (fast path taken?).

Run: env PYTHONPATH=/root/.axon_site:/root/repo \
     PROBE_T=8192 python tools/probe_select_big.py
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T_CAP = int(os.environ.get("PROBE_T", "8192"))
PREGATE = int(os.environ.get("PROBE_PREGATE", "64"))
N_SCANS = 3
REPS = int(os.environ.get("PROBE_REPS", "3"))


def main():
    import jax
    import jax.numpy as jnp
    from pymht_tpu.core.config import TrackerShapes, TrackerParams
    from pymht_tpu.core.tracker import Tracker, scan_many
    from pymht_tpu.core.grow import grow
    from pymht_tpu.core import select as sel_mod
    from pymht_tpu.utils import simulator as sim

    period = 2.5
    radar_range = 12000.0 * float(np.sqrt(T_CAP / 1024.0))
    shapes = TrackerShapes(
        max_targets=T_CAP, max_leaves=16, max_meas=2 * T_CAP,
        max_ais=16, window=6, max_prelim=64, max_initiators=512,
        ais_per_leaf=2, radar_cand_width=PREGATE)
    params = TrackerParams(radar_period=period, P_d=0.9,
                           lambda_phi=1.5e-6, lambda_nu=1e-6, N=4,
                           radar_range=radar_range)
    n_tgt = T_CAP - 16
    rng = np.random.default_rng(7)
    targets = sim.generate_initial_targets(
        rng, n_tgt, (0.0, 0.0), radar_range * 0.85, 0.9, 0.1)
    sim_list = sim.simulate_targets(rng, targets,
                                    sim_time=N_SCANS * period, dt=period)
    scans = sim.simulate_scans(rng, sim_list, period, sigma_R=2.5,
                               lambda_phi=1.5e-6, radar_range=radar_range,
                               p0=(0.0, 0.0), lambda_local=0.2)
    F_inv = np.eye(4)
    F_inv[0, 2] = F_inv[1, 3] = -period
    tracker = Tracker(shapes, params, method='lagrangian', use_ais=False)
    tracker.pre_initialize(scans[0].time - period,
                           [F_inv @ t.state for t in targets])
    scan_b, _ = tracker.make_stream_inputs(scans[:N_SCANS])
    per = lambda tree, i: jax.tree_util.tree_map(lambda x: x[i], tree)
    part = lambda tree, lo, hi: jax.tree_util.tree_map(
        lambda x: x[lo:hi], tree)

    st, ist, _ = jax.block_until_ready(jax.jit(
        lambda s, i, sc: scan_many(s, i, sc,
                                   jax.tree_util.tree_map(
                                       lambda x: jnp.zeros(
                                           (N_SCANS - 1,) + x.shape,
                                           x.dtype),
                                       tracker._empty_ais),
                                   shapes, params, method='lagrangian',
                                   use_ais=False))(
        tracker.state, tracker.init_state, part(scan_b, 0, N_SCANS - 1)))
    g = jax.block_until_ready(jax.jit(
        lambda s, sc: grow(s, sc, None, shapes, params))(
        st, per(scan_b, N_SCANS - 1)))
    state = g.state

    # ---- diagnostics (jitted: _hist_usage's [T,L,W,M] intermediate
    # only stays virtual when XLA fuses it into the reductions) --------
    from pymht_tpu.core.select import _independent_best

    @jax.jit
    def _diag(s):
        use = sel_mod._hist_usage(s, shapes)
        n_cont = (use.sum(axis=0) >= 2).sum()
        _, _, feas0 = _independent_best(s, shapes, params)
        return n_cont, feas0

    n_cont_d, feas0 = jax.block_until_ready(_diag(state))
    n_cont = int(n_cont_d)
    diag = {'T': T_CAP, 'live_targets': int(np.asarray(
                state.tgt_mask).sum()),
            'live_leaves': int(np.asarray(state.leaf_mask).sum()),
            'n_contested_slots': n_cont,
            'contested_cap_default': 256,
            'independent_decode_feasible': bool(feas0)}
    print(json.dumps({'diag': diag}), flush=True)

    def timeit(fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        ts = []
        for _ in range(REPS):
            t0 = time.time()
            out = fn(*args)
            jax.block_until_ready(out)
            ts.append(time.time() - t0)
        return round(float(np.median(ts)) * 1000.0, 2)

    res = {}
    res['default'] = timeit(jax.jit(
        lambda s: sel_mod.select(s, shapes, params, method='lagrangian',
                                 compute_clusters=False)), state)
    res['iters8'] = timeit(jax.jit(
        lambda s: sel_mod.select(s, shapes, params, method='lagrangian',
                                 compute_clusters=False, iters=8)), state)
    res['cap512'] = timeit(jax.jit(
        lambda s: sel_mod.select(s, shapes, params, method='lagrangian',
                                 compute_clusters=False,
                                 contested_cap=512)), state)
    res['fastpath_only_greedy'] = timeit(jax.jit(
        lambda s: sel_mod.select(s, shapes, params, method='greedy',
                                 compute_clusters=False)), state)
    res['cluster_only'] = timeit(jax.jit(
        lambda s: sel_mod.cluster(s, shapes)), state)
    print(json.dumps({'metric': 'select_probe', 'T': T_CAP,
                      'pregate': PREGATE, **res}), flush=True)


if __name__ == '__main__':
    main()
