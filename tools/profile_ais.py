#!/usr/bin/env python
"""AIS-path attribution at bench shapes (A=32, G=2) on TPU.

Stages (deltas between rows attribute the AIS cost):
  grow radar-only        | baseline
  grow +ais-cands        | _ais_candidates computed, beam stays radar
  grow ais (full)        | wider top_k + AIS label/state tail
  full step ais          | + select/initiator/lifecycle with AIS
"""
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pymht_tpu.core.config import TrackerShapes, TrackerParams
from pymht_tpu.core.tracker import Tracker, scan_step
from pymht_tpu.core.grow import Scan, AisBatch, grow, _ais_candidates
from pymht_tpu.utils import simulator as sim

N_TARGETS = int(os.environ.get("BENCH_TARGETS", "100"))
N_SCANS = int(os.environ.get("BENCH_SCANS", "12"))
BENCH_MEAS = int(os.environ.get("BENCH_MEAS", "512"))
A_CAP = int(os.environ.get("BENCH_AIS", "32"))


def build():
    period = 2.5
    radar_range = 2000.0
    shapes = TrackerShapes(
        max_targets=128, max_leaves=32, max_meas=BENCH_MEAS, max_ais=A_CAP,
        window=7, max_prelim=64, max_initiators=BENCH_MEAS, ais_per_leaf=2)
    params = TrackerParams(radar_period=period, P_d=0.9,
                           lambda_phi=2e-5, lambda_nu=1e-5, N=5,
                           radar_range=radar_range)
    rng = np.random.default_rng(4321)
    targets = sim.generate_initial_targets(
        rng, N_TARGETS, (0.0, 0.0), radar_range, 0.9, 0.1,
        assign_mmsi=True, P_r=0.9)
    sim_list = sim.simulate_targets(rng, targets,
                                    sim_time=N_SCANS * period, dt=period)
    scans = sim.simulate_scans(rng, sim_list, period, sigma_R=2.5,
                               lambda_phi=2e-5, radar_range=radar_range,
                               p0=(0.0, 0.0), lambda_local=0.5)
    ais_groups = sim.simulate_ais(rng, sim_list, period,
                                  init_time=sim_list[0][0].time)
    M = shapes.max_meas
    F_inv = np.eye(4)
    F_inv[0, 2] = F_inv[1, 3] = -period
    seed = [F_inv @ t.state for t in targets]
    tr = Tracker(shapes, params, use_ais=True)
    tr.pre_initialize(scans[0].time - period, seed,
                      mmsi=[t.mmsi for t in targets])
    # device times are relative to the tracker's internal origin —
    # any other base shifts the first-scan dt (round-3 timebase bug)
    t0_base = tr.t0
    zb = np.zeros((N_SCANS, M, 2), np.float32)
    mb = np.zeros((N_SCANS, M), bool)
    tb = np.zeros((N_SCANS,), np.float32)
    ais_st = np.zeros((N_SCANS, A_CAP, 4), np.float32)
    ais_tm = np.zeros((N_SCANS, A_CAP), np.float32)
    ais_mm = np.zeros((N_SCANS, A_CAP), np.int32)
    ais_hi = np.zeros((N_SCANS, A_CAP), bool)
    ais_mk = np.zeros((N_SCANS, A_CAP), bool)
    for i, s in enumerate(scans[:N_SCANS]):
        n = min(len(s.measurements), M)
        zb[i, :n] = s.measurements[:n]
        mb[i, :n] = True
        tb[i] = s.time - t0_base
        group = ais_groups[i] if i < len(ais_groups) else []
        for j, msg in enumerate(group[:A_CAP]):
            ais_st[i, j] = msg.state
            ais_tm[i, j] = msg.time - t0_base
            ais_mm[i, j] = msg.mmsi
            ais_hi[i, j] = msg.highAccuracy
            ais_mk[i, j] = True
    scans_dev = Scan(z=jnp.asarray(zb), mask=jnp.asarray(mb),
                     time=jnp.asarray(tb))
    ais_dev = AisBatch(state=jnp.asarray(ais_st), time=jnp.asarray(ais_tm),
                       mmsi=jnp.asarray(ais_mm),
                       high_accuracy=jnp.asarray(ais_hi),
                       mask=jnp.asarray(ais_mk))
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

    def grow_radar(s, sc, a):
        def body(st_, inp):
            scan_t, _ = inp
            g = grow(st_, scan_t, None, shapes, params)
            return g.state, g.used_meas
        return jax.lax.scan(body, s, (sc, a))

    def grow_cands(s, sc, a):
        # AIS candidates computed (kept live via a returned reduction)
        # but the beam remains radar-only: isolates candidate math from
        # the wider top_k + AIS tail.
        G = min(shapes.ais_fuse_width, shapes.max_ais)
        def body(st_, inp):
            scan_t, ais_t = inp
            outs = _ais_candidates(st_, scan_t, ais_t, params, G=G)
            keep = outs[4].sum() + outs[3].sum()
            g = grow(st_, scan_t, None, shapes, params)
            return g.state, keep
        return jax.lax.scan(body, s, (sc, a))

    def grow_ais(s, sc, a):
        def body(st_, inp):
            scan_t, ais_t = inp
            g = grow(st_, scan_t, ais_t, shapes, params)
            return g.state, g.used_meas
        return jax.lax.scan(body, s, (sc, a))

    def full_ais(s, i, sc, a):
        def body(carry, inp):
            s_, i_ = carry
            scan_t, ais_t = inp
            s_, i_, out = scan_step(s_, i_, scan_t, ais_t, shapes, params,
                                    method='lagrangian', use_ais=True,
                                    compute_clusters=False)
            return (s_, i_), out.sel_obj
        return jax.lax.scan(body, (s, i), (sc, a))

    t1 = timeit("grow radar-only", jax.jit(grow_radar), st, scans_dev,
                ais_dev)
    t2 = timeit("grow +ais-cands (radar beam)", jax.jit(grow_cands), st,
                scans_dev, ais_dev, prev=t1)
    t3 = timeit("grow ais (full)", jax.jit(grow_ais), st, scans_dev,
                ais_dev, prev=t2)
    timeit("full step ais", jax.jit(full_ais), st, ist, scans_dev,
           ais_dev, prev=t3)


if __name__ == "__main__":
    main()
