#!/usr/bin/env python
"""Replicate the Lagrangian selection loop in numpy on real bench-scale
forest states to see why/when the exits fire (CPU)."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from pymht_tpu.core.config import TrackerShapes, TrackerParams  # noqa: E402
from pymht_tpu.core.tracker import Tracker  # noqa: E402
from pymht_tpu.core.select import _slot_index, leaf_scores  # noqa: E402
from pymht_tpu.core import grow as grow_mod  # noqa: E402
from pymht_tpu.utils import simulator as sim  # noqa: E402

N_TARGETS = 100
N_SCANS = 12
M = 512

period = 2.5
radar_range = 2000.0
shapes = TrackerShapes(max_targets=128, max_leaves=32, max_meas=M, max_ais=8,
                       window=7, max_prelim=64, max_initiators=M)
params = TrackerParams(radar_period=period, P_d=0.9, lambda_phi=2e-5,
                       lambda_nu=1e-5, N=5, radar_range=radar_range)
rng = np.random.default_rng(1234)
targets = sim.generate_initial_targets(rng, N_TARGETS, (0.0, 0.0),
                                       radar_range, 0.9, 0.1)
sim_list = sim.simulate_targets(rng, targets, sim_time=N_SCANS * period,
                                dt=period)
scans = sim.simulate_scans(rng, sim_list, period, sigma_R=2.5,
                           lambda_phi=2e-5, radar_range=radar_range,
                           p0=(0.0, 0.0), lambda_local=0.5)

F_inv = np.eye(4)
F_inv[0, 2] = F_inv[1, 3] = -period
tr = Tracker(shapes, params, method='lagrangian', use_ais=False)
tr.pre_initialize(scans[0].time - period,
                  [F_inv @ t.state for t in targets])


def milp_oracle(f, slots_flat, n_slots, tgt, lmask):
    from scipy import sparse
    from scipy.optimize import milp, LinearConstraint, Bounds
    T, L, WW = slots_flat.shape
    n = T * L
    fo = np.where(lmask, f, 1e7).reshape(-1)
    for t in range(T):
        if not tgt[t]:
            fo[t * L] = 0.0
    rows, cols = [], []
    for j in range(n):
        t, l = divmod(j, L)
        if not tgt[t] or not lmask[t, l]:
            continue
        for s in set(int(x) for x in slots_flat[t, l] if x < n_slots):
            rows.append(s)
            cols.append(j)
    A_in = sparse.csr_matrix((np.ones(len(rows)), (rows, cols)),
                             shape=(n_slots, n))
    A_eq = sparse.csr_matrix(
        (np.ones(n), (np.arange(n) // L, np.arange(n))), shape=(T, n))
    cons = [LinearConstraint(A_eq, 1, 1),
            LinearConstraint(A_in, -np.inf, 1)]
    res = milp(fo, constraints=cons, integrality=np.ones(n),
               bounds=Bounds(0, 1), options={'time_limit': 120})
    if res.x is None:
        return float('nan'), False
    sel = res.x.reshape(T, L).argmax(axis=1)
    obj = sum(fo[t * L + sel[t]] for t in range(T) if tgt[t])
    return float(obj), bool(res.status == 0)


def analyze(state, label):
    slots, n_slots = _slot_index(state, shapes)
    slots_flat = np.asarray(slots).reshape(*state.hist_meas.shape[:2], -1)
    T, L, WW = slots_flat.shape
    f = np.asarray(leaf_scores(state, params)).astype(np.float64)
    tgt = np.asarray(state.tgt_mask)
    lam = np.asarray(state.lam).astype(np.float64)

    def decode(lam):
        lam_pad = np.concatenate([lam, [0.0]])
        rc = f + lam_pad[slots_flat].sum(axis=2)
        sel = np.argmin(rc, axis=1)
        lb = np.where(tgt, rc.min(axis=1), 0.0).sum() - lam.sum()
        return sel, lb, rc

    def usage(sel):
        s = slots_flat[np.arange(T), sel]
        s = np.where(tgt[:, None], s, n_slots)
        cnt = np.zeros(n_slots + 1)
        np.add.at(cnt, s.reshape(-1), 1.0)
        return cnt[:n_slots]

    def obj_of(sel):
        return np.where(tgt, f[np.arange(T), sel], 0.0).sum()

    # unavoidable slots per target (every live leaf uses them)
    lmask = np.asarray(state.leaf_mask)
    s_all = np.where(lmask[..., None], slots_flat, n_slots)
    cnt_ts = np.zeros((T, n_slots + 1))
    for t in range(T):
        np.add.at(cnt_ts[t], s_all[t].reshape(-1), 1.0)
    n_live = lmask.sum(axis=1)
    unavoid = (cnt_ts >= n_live[:, None] - 0.5) & (n_live[:, None] > 0.5)

    spine = np.asarray(state.spine_leaf)

    def repair(sel, lam, max_rounds=24):
        lam_pad = np.concatenate([lam, [0.0]])
        rc = f + lam_pad[slots_flat].sum(axis=2)
        banned = np.zeros((T, L), bool)
        tie = np.arange(T) * 1e-6
        rounds = 0
        for it in range(max_rounds):
            cnt = usage(sel)
            over = cnt > 1.5
            over_pad = np.concatenate([over, [False]])
            own = np.where(tgt[:, None], slots_flat[np.arange(T), sel],
                           n_slots)
            fsel = f[np.arange(T), sel] + tie
            unav_own = np.take_along_axis(unavoid, own, axis=1)
            on_spine = (sel == spine).astype(float)
            key = (fsel[:, None] - 1e8 * unav_own
                   - 5e7 * on_spine[:, None])
            claim = np.where(over_pad[own], key, np.inf)
            slot_min = np.full(n_slots + 1, np.inf)
            np.minimum.at(slot_min, own.reshape(-1), claim.reshape(-1))
            in_conf = over_pad[own].any(axis=1) & tgt
            tol = 1e-5 * (1.0 + np.abs(slot_min[own]))
            is_min = over_pad[own] & (key <= slot_min[own] + tol)
            cand_idx = np.where(is_min, np.arange(T)[:, None], T)
            slot_owner = np.full(n_slots + 1, T)
            np.minimum.at(slot_owner, own.reshape(-1), cand_idx.reshape(-1))
            keeper = np.all(~over_pad[own]
                            | (slot_owner[own] == np.arange(T)[:, None]),
                            axis=1)
            loser = in_conf & ~keeper
            rounds = it + 1
            if not in_conf.any():
                break
            banned |= loser[:, None] & (np.arange(L)[None] == sel[:, None])
            occ_pad = np.concatenate([cnt > 0.5, [False]])
            pen_occ = occ_pad[slots_flat].sum(axis=2)
            pen_over = over_pad[slots_flat].sum(axis=2)
            w_over = float(os.environ.get("W_OVER", "1e3"))
            w_occ = float(os.environ.get("W_OCC", "2.0"))
            rcb = np.where(banned, np.inf,
                           rc + w_over * pen_over + w_occ * pen_occ)
            sel = np.where(loser, np.argmin(rcb, axis=1), sel)
        cnt = usage(sel)
        return sel, not (cnt > 1.5).any(), rounds

    # fast path?
    sel0 = np.argmin(f, axis=1)
    feas0 = not (usage(sel0) > 1.5).any()
    if feas0:
        print(f"{label}: fast path (no conflicts)")
        return

    sel_seed, lb0, _ = decode(lam)
    sel_seed, feas_seed, seed_rounds = repair(sel_seed, lam)
    best_obj = obj_of(sel_seed) if feas_seed else np.inf
    best_feas = feas_seed
    best_lb = lb0
    stale = 0
    last_sel = np.full(T, -1)
    theta = 1.0
    n_mat = n_feas = 0
    exit_at, exit_why = 60, "budget"
    for it in range(60):
        sel, lb, rc = decode(lam)
        best_lb = max(best_lb, lb)
        cnt = usage(sel)
        g = np.where((cnt > 0) | (lam > 0), cnt - 1.0, 0.0)
        feas = not (cnt > 1.5).any()
        obj = obj_of(sel)
        material = feas and ((obj < best_obj - 1e-4 * (1 + abs(best_obj)))
                             or not best_feas)
        if feas:
            n_feas += 1
            if obj < best_obj - 1e-6 or not best_feas:
                best_obj = obj
        if material:
            n_mat += 1
        best_feas = best_feas or feas
        # Lagrangian heuristic: repair this decode into a feasible
        # incumbent every iteration (bounded rounds).
        if not feas and os.environ.get("REPAIR_EVERY") == "1":
            sel_h, feas_h, _ = repair(sel, lam, max_rounds=4)
            if feas_h:
                obj_h = obj_of(sel_h)
                if obj_h < best_obj - 1e-4 * (1 + abs(best_obj)) \
                        or not best_feas:
                    material = True
                    n_mat += 1
                if obj_h < best_obj - 1e-6 or not best_feas:
                    best_obj = obj_h
                best_feas = True
        same = (sel == last_sel).all()
        stale = 0 if material else stale + 1
        if feas and same:
            stale += 3
        gn2 = max((g * g).sum(), 1e-6)
        gap_est = (min(max(best_obj - lb, 1e-3), 1.0 + 0.25 * abs(best_obj))
                   if best_feas else 1.0)
        lam = np.maximum(0.0, lam + theta * gap_est / gn2 * g)
        last_sel = sel
        gap = best_obj - best_lb
        if best_feas and gap <= 1e-4 * (1 + abs(best_obj)):
            exit_at, exit_why = it + 1, "converged"
            break
        if best_feas and stale >= int(os.environ.get("PATIENCE", "6")):
            exit_at, exit_why = it + 1, "patience"
            break
    # always-post-repair of the final decode
    sel_r, feas_r, _ = repair(last_sel, lam)
    if feas_r and obj_of(sel_r) < best_obj:
        best_obj = obj_of(sel_r)
        best_feas = True
    # true optimality gap vs a MILP oracle (HiGHS via scipy)
    obj_o_active, opt = milp_oracle(f, slots_flat, n_slots, tgt,
                                    np.asarray(state.leaf_mask))
    true_gap = ((best_obj - obj_o_active) / max(1.0, abs(obj_o_active))
                if opt else float('nan'))
    print(f"{label}: slow. seed_feas={feas_seed} seed_rounds={seed_rounds} "
          f"exit={exit_at}({exit_why}) feas_decodes={n_feas} "
          f"material={n_mat} obj={best_obj:.4f} lb={best_lb:.4f} "
          f"oracle={obj_o_active:.4f} true_gap={true_gap:.5f} opt={opt}")


state = tr.state
for i, s in enumerate(scans[:N_SCANS]):
    t_rel = s.time - (scans[0].time - period)
    z = np.zeros((M, 2), np.float32)
    n = min(len(s.measurements), M)
    z[:n] = s.measurements[:n]
    scan = grow_mod.Scan(z=jnp.asarray(z),
                         mask=jnp.asarray(np.arange(M) < n),
                         time=jnp.asarray(np.float32(t_rel)))
    g = grow_mod.grow(tr.state, scan, None, shapes, params)
    analyze(g.state, f"scan {i}")
    # advance the real tracker
    tr.add_measurement_list(s.time, s.measurements)
