"""Scenario-level parity: the device tracker's selected global
hypothesis must match the reference decision logic (full trees, exact
per-cluster ILP — utils/ref_oracle.py port of
/root/reference/pymht/tracker.py:162-307,979-1217) within the solver
optimality gap, scan by scan.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pymht_tpu.core.config import TrackerShapes, TrackerParams
from pymht_tpu.core.tracker import Tracker
from pymht_tpu.utils.ref_oracle import RefOracle
from pymht_tpu.utils import simulator as sim


def _run_parity(targets_xy, scans, period, params, shapes, t0):
    """Run device tracker + oracle on the same scans; return per-scan
    (device labels, oracle labels, device obj, oracle obj)."""
    K = len(targets_xy)
    tracker = Tracker(shapes, params, method='lagrangian', use_ais=False)
    tracker.pre_initialize(t0, targets_xy)
    oracle = RefOracle(params)
    oracle.pre_initialize(t0, targets_xy)

    out_rows = []
    for t, z in scans:
        out = tracker.add_measurement_list(t, z)
        ref = oracle.step(t, z)
        W = shapes.window
        dev_labels = [int(out.sel_hist_meas[k, W - 1]) for k in range(K)]
        dev_hist = [[(int(out.sel_hist_meas[k, w]),
                      int(out.sel_hist_mmsi[k, w]))
                     for w in range(W) if out.sel_hist_valid[k, w]]
                    for k in range(K)]
        dev_obj = float(sum(out.track_cnllr[k] for k in range(K)))
        ref_labels = [m for m, _x, _c in ref]
        ref_obj = oracle.objective()
        # Tie verification must happen NOW (the oracle trees mutate next
        # scan): cost of the device's labels inside the oracle's trees.
        if dev_labels != ref_labels:
            tie_total = 0.0
            for k in range(K):
                c = oracle.leaf_cost_by_history(k, dev_hist[k])
                tie_total = (tie_total + c) if c is not None else None
                if tie_total is None:
                    break
        else:
            tie_total = ref_obj
        out_rows.append((dev_labels, ref_labels, dev_obj, ref_obj,
                         tie_total))
    return out_rows


def _crossing_scenario(n_scans=8, period=2.5, sigma_R=1.0, seed=0):
    """Two targets crossing paths (BASELINE config 1 shape)."""
    rng = np.random.default_rng(seed)
    x0 = [np.array([-100.0, 0.0, 8.0, 0.5]),
          np.array([100.0, 4.0, -8.0, -0.5])]
    scans = []
    xs = [x.copy() for x in x0]
    F = np.eye(4)
    F[0, 2] = F[1, 3] = period
    for i in range(n_scans):
        xs = [F @ x for x in xs]
        t = (i + 1) * period
        z = np.stack([x[:2] + rng.normal(0, sigma_R, 2) for x in xs])
        scans.append((t, z.astype(np.float32)))
    return x0, scans


def test_parity_crossing_targets():
    period = 2.5
    shapes = TrackerShapes(max_targets=8, max_leaves=64, max_meas=8,
                           max_ais=2, window=7, max_prelim=8,
                           max_initiators=8)
    params = TrackerParams(radar_period=period, P_d=0.95,
                           lambda_phi=1e-6, lambda_nu=1e-6, N=5,
                           cnllr_upper_limit=1e9,
                           score_upper_limit_scale=1e6)
    x0, scans = _crossing_scenario(period=period)
    rows = _run_parity(x0, scans, period, params, shapes, t0=0.0)
    for i, (dev, ref, dev_obj, ref_obj, _tie) in enumerate(rows):
        # objective parity within fp32 drift + solver gap
        assert dev_obj <= ref_obj + max(1e-3, 1e-3 * abs(ref_obj)), \
            f"scan {i}: device obj {dev_obj} worse than oracle {ref_obj}"
        assert dev == ref, f"scan {i}: labels {dev} != oracle {ref}"


def test_parity_cluttered_scenario():
    """Seeded simulator scenario with clutter + missed detections
    (BASELINE configs 2-3 shape): device selection matches the oracle's
    objective every scan; associations match except where the optimum is
    degenerate (equal-cost ties under fp32)."""
    period = 2.5
    radar_range = 500.0
    shapes = TrackerShapes(max_targets=16, max_leaves=64, max_meas=32,
                           max_ais=2, window=7, max_prelim=16,
                           max_initiators=32)
    # radar_range=inf disables range termination (the oracle models no
    # lifecycle); the simulator still clips measurements to 500 m.
    params = TrackerParams(radar_period=period, P_d=0.85,
                           lambda_phi=2e-5, lambda_nu=1e-6, N=5,
                           radar_range=float('inf'),
                           cnllr_upper_limit=1e9,
                           score_upper_limit_scale=1e6)
    rng = np.random.default_rng(7)
    targets = sim.generate_initial_targets(rng, 6, (0.0, 0.0),
                                           radar_range, 0.85, 0.1)
    sim_list = sim.simulate_targets(rng, targets, sim_time=8 * period,
                                    dt=period)
    raw = sim.simulate_scans(rng, sim_list, period, sigma_R=2.5,
                             lambda_phi=2e-5, radar_range=radar_range,
                             p0=(0.0, 0.0), lambda_local=0.0)
    F_inv = np.eye(4)
    F_inv[0, 2] = F_inv[1, 3] = -period
    x0 = [F_inv @ t.state for t in targets]
    t0 = raw[0].time - period
    scans = [(s.time - t0, s.measurements) for s in raw[:8]]

    rows = _run_parity(x0, scans, period, params, shapes, t0=0.0)
    for i, (dev, ref, dev_obj, ref_obj, tie_total) in enumerate(rows):
        tol = max(5e-3, 1e-3 * abs(ref_obj))
        assert dev_obj <= ref_obj + tol, \
            f"scan {i}: device obj {dev_obj} vs oracle {ref_obj}"
        if dev == ref:
            continue
        # Every label mismatch must be a PROVEN tie: the device's
        # selection evaluated in the oracle's fp64 trees must reach the
        # oracle's optimum (round-2 verdict: tie-verify, don't waive).
        assert tie_total is not None, \
            f"scan {i}: device labels {dev} not found in oracle trees"
        assert tie_total <= ref_obj + tol, \
            (f"scan {i}: device labels {dev} cost {tie_total} vs oracle "
             f"optimum {ref_obj} — real divergence")
