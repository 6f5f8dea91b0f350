#!/usr/bin/env python
"""Bisect the pre-gated grow at large T (round-5: grow is 74 of 155 ms
at the T=8192 saturation point).  Cumulative lax.scan'd variants with a
real dependency chain (bisect_grow.py discipline):

  dist      — [T,M] squared distances to the selected-leaf predictions
  +topk     — + the per-target nearest-Km top_k (prime suspect: a
              [8192, 16384] row top_k) + z gather
  +approx   — same but jax.lax.approx_min_k (TPU-optimized partial
              reduce) instead of lax.top_k
  cands     — + the pre-gated candidate planes [T,L,Km]
  full      — grow() as shipped

Run: env PYTHONPATH=/root/.axon_site:/root/repo BG_T=8192 \
     python tools/bisect_grow_pregate.py
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

T_CAP = int(os.environ.get("BG_T", "8192"))
KM = int(os.environ.get("BG_KM", "64"))
N_SCANS = 4
REPS = int(os.environ.get("BG_REPS", "3"))


def main():
    from pymht_tpu.core.config import TrackerShapes, TrackerParams
    from pymht_tpu.core.tracker import Tracker
    from pymht_tpu.core.grow import grow
    from pymht_tpu.ops.ais_fused import radar_candidates_planes
    from pymht_tpu.utils import simulator as sim

    period = 2.5
    radar_range = 12000.0 * float(np.sqrt(T_CAP / 1024.0))
    shapes = TrackerShapes(
        max_targets=T_CAP, max_leaves=16, max_meas=2 * T_CAP,
        max_ais=16, window=6, max_prelim=64, max_initiators=512,
        ais_per_leaf=2, radar_cand_width=KM)
    params = TrackerParams(radar_period=period, P_d=0.9,
                           lambda_phi=1.5e-6, lambda_nu=1e-6, N=4,
                           radar_range=radar_range)
    rng = np.random.default_rng(7)
    n_tgt = T_CAP - 16
    targets = sim.generate_initial_targets(
        rng, n_tgt, (0.0, 0.0), radar_range * 0.85, 0.9, 0.1)
    sim_list = sim.simulate_targets(rng, targets,
                                    sim_time=N_SCANS * period, dt=period)
    scans = sim.simulate_scans(rng, sim_list, period, sigma_R=2.5,
                               lambda_phi=1.5e-6, radar_range=radar_range,
                               p0=(0.0, 0.0), lambda_local=0.2)
    F_inv = np.eye(4)
    F_inv[0, 2] = F_inv[1, 3] = -period
    tr = Tracker(shapes, params, use_ais=False)
    tr.pre_initialize(scans[0].time - period,
                      [F_inv @ t.state for t in targets])
    scan_b, ais_b = tr.make_stream_inputs(scans[:N_SCANS])
    st = tr.state
    T, L, M = T_CAP, shapes.max_leaves, shapes.max_meas

    def fold(state, val):
        return state.replace(leaf_cnllr=state.leaf_cnllr + 0.0 * val)

    def dist_of(st_, scan_t):
        tb0 = jnp.arange(T)
        sel0 = jnp.clip(st_.sel_leaf, 0, L - 1)
        xr = st_.leaf_x[tb0, sel0]
        dt0 = scan_t.time - st_.time
        px = xr[:, 0] + dt0 * xr[:, 2]
        py = xr[:, 1] + dt0 * xr[:, 3]
        d2 = ((scan_t.z[None, :, 0] - px[:, None]) ** 2
              + (scan_t.z[None, :, 1] - py[:, None]) ** 2)
        return jnp.where(scan_t.mask[None, :], d2, jnp.inf)

    def v_dist(s, sc, a):
        def body(st_, inp):
            scan_t, _ = inp
            d2 = dist_of(st_, scan_t)
            val = d2.min(axis=1).sum()
            return fold(st_, val), val
        return jax.lax.scan(body, s, (sc, a))

    def v_topk(s, sc, a):
        def body(st_, inp):
            scan_t, _ = inp
            d2 = dist_of(st_, scan_t)
            negd, zidx = jax.lax.top_k(-d2, KM)
            z_sub = scan_t.z[zidx]
            val = z_sub.sum() - negd.sum()
            return fold(st_, val), val
        return jax.lax.scan(body, s, (sc, a))

    def v_approx(s, sc, a):
        def body(st_, inp):
            scan_t, _ = inp
            d2 = dist_of(st_, scan_t)
            vals, zidx = jax.lax.approx_min_k(d2, KM)
            z_sub = scan_t.z[zidx]
            val = z_sub.sum() + vals.sum()
            return fold(st_, val), val
        return jax.lax.scan(body, s, (sc, a))

    def v_cands(s, sc, a):
        def body(st_, inp):
            scan_t, _ = inp
            d2 = dist_of(st_, scan_t)
            negd, zidx = jax.lax.top_k(-d2, KM)
            z_sub = scan_t.z[zidx]
            zmask_sub = scan_t.mask[zidx] & jnp.isfinite(negd)
            (x_bar, P_bar, K, P_hat, gate, nllr_m) = \
                radar_candidates_planes(st_, scan_t, params,
                                        z_sub=z_sub, zmask_sub=zmask_sub)
            val = (nllr_m.sum() + x_bar.sum() + P_hat.sum()
                   + gate.sum().astype(jnp.float32))
            return fold(st_, val), val
        return jax.lax.scan(body, s, (sc, a))

    def v_full(s, sc, a):
        def body(st_, inp):
            scan_t, _ = inp
            g = grow(st_, scan_t, None, shapes, params)
            return g.state, g.used_meas.sum()
        return jax.lax.scan(body, s, (sc, a))

    def timeit(fn):
        f = jax.jit(fn)
        out = f(st, scan_b, ais_b)
        jax.block_until_ready(out)
        ts = []
        for _ in range(REPS):
            t0 = time.time()
            out = f(st, scan_b, ais_b)
            jax.block_until_ready(out)
            ts.append(time.time() - t0)
        return round(float(np.median(ts)) / N_SCANS * 1000.0, 2)

    res = {'metric': 'grow_pregate_bisect', 'T': T_CAP, 'Km': KM}
    for name, fn in (('dist', v_dist), ('topk', v_topk),
                     ('approx', v_approx), ('cands', v_cands),
                     ('full', v_full)):
        res[name] = timeit(fn)
        print(json.dumps({name: res[name]}), flush=True)
    print(json.dumps(res), flush=True)


if __name__ == '__main__':
    main()
