#!/usr/bin/env python
"""Bisect the radar-only swarm anomaly (round-3 OPEN PERF LEAD).

At swarm shapes (T=1024, L=16, M=2048) the radar-only grow program runs
~2.5x slower than the AIS-on program even though its work is a strict
subset.  This harness times grow-only lax.scan loops in several
compile-isolated variants to find which structural difference flips the
XLA schedule:

  r_full     radar-only grow() exactly as shipped
  a_full     AIS-on grow() (the fast program, for reference)
  r_merge    radar-only but with the AIS-style two-stage beam merge
             (big top_k -> values re-derived via a second tiny top_k)
  r_noused   radar-only without the used/gated_counts reductions
  r_nospine  radar-only without the spine-forcing block
  r_nohist   radar-only with history channels dropped from the payload

Run CPU-only:   env PYTHONPATH= PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
                  python tools/bisect_swarm.py
Run on TPU:     env PYTHONPATH=/root/.axon_site:/root/repo \
                  python tools/bisect_swarm.py

Shape/scenario knobs: SWARM_TARGETS/SWARM_MEAS/SWARM_AIS/SWARM_SCANS.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pymht_tpu.core.config import TrackerShapes, TrackerParams
from pymht_tpu.core.tracker import Tracker
from pymht_tpu.core.grow import Scan, AisBatch, grow
from pymht_tpu.utils import simulator as sim

N_TARGETS = int(os.environ.get("SWARM_TARGETS", "1000"))
N_SCANS = int(os.environ.get("SWARM_SCANS", "4"))
M_CAP = int(os.environ.get("SWARM_MEAS", "2048"))
A_CAP = int(os.environ.get("SWARM_AIS", "128"))
REPS = int(os.environ.get("BISECT_REPS", "3"))
ONLY = os.environ.get("BISECT_ONLY", "")


def build():
    period = 2.5
    radar_range = 12000.0
    shapes = TrackerShapes(
        max_targets=1024, max_leaves=16, max_meas=M_CAP, max_ais=A_CAP,
        window=6, max_prelim=64, max_initiators=512, ais_per_leaf=2,
        ais_prefilter_width=int(os.environ.get("BISECT_PREFILTER", "0")))
    params = TrackerParams(radar_period=period, P_d=0.9,
                           lambda_phi=1.5e-6, lambda_nu=1e-6, N=4,
                           radar_range=radar_range)
    n_tgt = min(N_TARGETS, shapes.max_targets - 16)
    rng = np.random.default_rng(77)
    targets = sim.generate_initial_targets(
        rng, n_tgt, (0.0, 0.0), radar_range * 0.85, 0.9, 0.1,
        assign_mmsi=True, P_r=0.5)
    sim_list = sim.simulate_targets(rng, targets,
                                    sim_time=N_SCANS * period, dt=period)
    scans = sim.simulate_scans(rng, sim_list, period, sigma_R=2.5,
                               lambda_phi=1.5e-6, radar_range=radar_range,
                               p0=(0.0, 0.0), lambda_local=0.2)
    ais_groups = sim.simulate_ais(rng, sim_list, period,
                                  init_time=sim_list[0][0].time)
    M = shapes.max_meas
    F_inv = np.eye(4)
    F_inv[0, 2] = F_inv[1, 3] = -period
    tracker = Tracker(shapes, params, use_ais=True)
    tracker.pre_initialize(scans[0].time - period,
                           [F_inv @ t.state for t in targets],
                           mmsi=[t.mmsi for t in targets])
    scans_dev, ais_dev = tracker.make_stream_inputs(
        scans[:N_SCANS], ais_groups[:N_SCANS])
    return shapes, params, tracker, scans_dev, ais_dev


def timeit(name, fn, *args):
    try:
        out = fn(*args)
        jax.block_until_ready(out)
    except Exception as e:  # noqa: BLE001
        print(f"{name:24s} FAILED: {e}", flush=True)
        return float('nan')
    reps = []
    for _ in range(REPS):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        reps.append(time.time() - t0)
    ms = float(np.median(reps) / N_SCANS * 1000.0)
    print(f"{name:24s} {ms:9.2f} ms/scan", flush=True)
    return ms


def grow_variant(shapes, params, use_ais, **kw):
    def f(s, sc, a):
        def body(st_, inp):
            scan_t, ais_t = inp
            g = grow(st_, scan_t, ais_t if use_ais else None,
                     shapes, params, **kw)
            return g.state, g.used_meas.sum()
        return jax.lax.scan(body, s, (sc, a))
    return jax.jit(f)


def main():
    shapes, params, tr, scans_dev, ais_dev = build()
    st = tr.state
    jax.block_until_ready(st)
    print(f"platform={jax.devices()[0].platform} T={shapes.max_targets} "
          f"L={shapes.max_leaves} M={shapes.max_meas} A={shapes.max_ais} "
          f"scans={N_SCANS}", flush=True)

    from pymht_tpu.core.grow import _ais_candidates
    from pymht_tpu.ops.ais_fused import (_pred_cov_planes, _schur4, _quad4)
    from pymht_tpu.models import ais as ais_model
    from pymht_tpu.models.constants import sigmaQ_tracker

    G = min(shapes.ais_fuse_width, shapes.max_ais)

    def a_cands(s, sc, a):
        # AIS candidate math live, but the beam stays radar-only:
        # isolates the fusion DAG from the wider beam/merge tail.
        def body(st_, inp):
            scan_t, ais_t = inp
            outs = _ais_candidates(st_, scan_t, ais_t, params, G=G)
            keep = outs[4].sum() + outs[3].sum()
            g = grow(st_, scan_t, None, shapes, params)
            return g.state, keep
        return jax.lax.scan(body, s, (sc, a))

    def a_stage1(s, sc, a):
        # stage-1 [T,L,A] sweep + top-G compression only (the part that
        # scales with A=128)
        q = float(sigmaQ_tracker)
        r_hi = ais_model.sigmaR_AIS_true_highAccuracy ** 2
        r_lo = ais_model.sigmaR_AIS_true_lowAccuracy ** 2

        def body(st_, inp):
            scan_t, ais_t = inp
            T, L = st_.leaf_mask.shape
            A = ais_t.mask.shape[0]
            P, x = st_.leaf_P, st_.leaf_x
            dT1 = ais_t.time - st_.time
            ra = jnp.where(ais_t.high_accuracy, r_hi, r_lo)[None, None, :]
            g1 = lambda i, j: P[:, :, i, j][:, :, None]
            pb1 = _pred_cov_planes(g1, dT1[None, None, :], q)
            s1 = dict(pb1)
            for i in range(4):
                s1[(i, i)] = pb1[(i, i)] + ra
            inv1, det1 = _schur4(s1)
            xb1 = [x[:, :, 0][:, :, None] + dT1[None, None, :]
                   * x[:, :, 2][:, :, None],
                   x[:, :, 1][:, :, None] + dT1[None, None, :]
                   * x[:, :, 3][:, :, None],
                   jnp.broadcast_to(x[:, :, 2][:, :, None], (T, L, A)),
                   jnp.broadcast_to(x[:, :, 3][:, :, None], (T, L, A))]
            zt1 = [ais_t.state[None, None, :, k] - xb1[k] for k in range(4)]
            nis1 = _quad4(inv1, zt1)
            gate1 = ((nis1 <= params.eta2_ais)
                     & ais_t.mask[None, None, :]
                     & st_.leaf_mask[:, :, None])
            key = jnp.where(gate1, nis1, jnp.inf)
            negk, ais_idx = jax.lax.top_k(-key, G)
            g = grow(st_, scan_t, None, shapes, params)
            return g.state, negk.sum() + ais_idx.sum() + det1.sum()
        return jax.lax.scan(body, s, (sc, a))

    def _stage1_planes(st_, ais_t):
        q = float(sigmaQ_tracker)
        r_hi = ais_model.sigmaR_AIS_true_highAccuracy ** 2
        r_lo = ais_model.sigmaR_AIS_true_lowAccuracy ** 2
        T, L = st_.leaf_mask.shape
        A = ais_t.mask.shape[0]
        P, x = st_.leaf_P, st_.leaf_x
        dT1 = ais_t.time - st_.time
        ra = jnp.where(ais_t.high_accuracy, r_hi, r_lo)[None, None, :]
        g1 = lambda i, j: P[:, :, i, j][:, :, None]
        pb1 = _pred_cov_planes(g1, dT1[None, None, :], q)
        s1 = dict(pb1)
        for i in range(4):
            s1[(i, i)] = pb1[(i, i)] + ra
        inv1, det1 = _schur4(s1)
        xb1 = [x[:, :, 0][:, :, None] + dT1[None, None, :]
               * x[:, :, 2][:, :, None],
               x[:, :, 1][:, :, None] + dT1[None, None, :]
               * x[:, :, 3][:, :, None],
               jnp.broadcast_to(x[:, :, 2][:, :, None], (T, L, A)),
               jnp.broadcast_to(x[:, :, 3][:, :, None], (T, L, A))]
        zt1 = [ais_t.state[None, None, :, k] - xb1[k] for k in range(4)]
        nis1 = _quad4(inv1, zt1)
        gate1 = ((nis1 <= params.eta2_ais)
                 & ais_t.mask[None, None, :]
                 & st_.leaf_mask[:, :, None])
        return nis1, gate1, det1

    def a_s1_dag(s, sc, a):
        # stage-1 NIS DAG + cheap reductions, NO top_k: is the cost the
        # planes DAG or the [T,L,A] top_k?
        def body(st_, inp):
            scan_t, ais_t = inp
            nis1, gate1, det1 = _stage1_planes(st_, ais_t)
            val = (nis1.sum() + det1.sum()
                   + gate1.sum().astype(jnp.float32))
            g = grow(st_, scan_t, None, shapes, params)
            return g.state, val
        return jax.lax.scan(body, s, (sc, a))

    def a_s1_argmax(s, sc, a):
        # stage-1 + G-pass iterated-argmax compression (no lax.top_k):
        # pure masked reductions, fusable with the NIS producer.
        def body(st_, inp):
            scan_t, ais_t = inp
            nis1, gate1, det1 = _stage1_planes(st_, ais_t)
            key = jnp.where(gate1, nis1, jnp.inf)
            idxs, vals = [], []
            for _ in range(G):
                i = jnp.argmin(key, axis=2)
                v = jnp.min(key, axis=2)
                idxs.append(i)
                vals.append(v)
                key = jnp.where(jax.nn.one_hot(i, key.shape[2],
                                               dtype=bool), jnp.inf, key)
            val = (sum(jnp.where(jnp.isfinite(v), v, 0.0).sum()
                       for v in vals)
                   + sum(i.sum() for i in idxs).astype(jnp.float32)
                   + det1.sum())
            g = grow(st_, scan_t, None, shapes, params)
            return g.state, val
        return jax.lax.scan(body, s, (sc, a))

    cases = {
        'r_full': lambda: grow_variant(shapes, params, False),
        'a_s1_dag': lambda: jax.jit(a_s1_dag),
        'a_s1_argmax': lambda: jax.jit(a_s1_argmax),
        'a_stage1': lambda: jax.jit(a_stage1),
        'a_cands': lambda: jax.jit(a_cands),
        'a_full': lambda: grow_variant(shapes, params, True),
    }
    for name, mk in cases.items():
        if ONLY and name not in ONLY.split(','):
            continue
        timeit(name, mk(), st, scans_dev, ais_dev)


if __name__ == "__main__":
    main()
