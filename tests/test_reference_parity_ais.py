"""Scenario-level AIS-fusion parity (VERDICT round-2 item 1).

The device tracker's AIS-fused decisions — which leaf each target
selects, including fused (radar+AIS) and pure-AIS associations — must
match the reference decision logic ported in utils/ref_oracle.py
(/root/reference/pymht/tracker.py:417-552: two-stage KF update, score
0.5*nllr1 + 0.5*nllr2, pure-AIS children; pyTarget.py:260-302: MMSI
consistency), scan by scan.  Divergent scans are tie-verified through
the oracle (equal-cost optima under fp32 are accepted; anything else
fails).
"""
import numpy as np
import pytest

from pymht_tpu.core.config import TrackerShapes, TrackerParams
from pymht_tpu.core.tracker import Tracker
from pymht_tpu.utils.ref_oracle import RefOracle, AisMsg


PERIOD = 2.5
SHAPES = TrackerShapes(max_targets=8, max_leaves=64, max_meas=8,
                       max_ais=4, window=7, max_prelim=8,
                       max_initiators=8)
PARAMS = TrackerParams(radar_period=PERIOD, P_d=0.9,
                       lambda_phi=1e-6, lambda_nu=1e-6, N=5,
                       radar_range=1e4,
                       cnllr_upper_limit=1e9,
                       score_upper_limit_scale=1e6)


def _ais_scenario(n_scans=7, seed=3, id_scrambling=False):
    """Three targets with MMSI, one without AIS coverage.  Per scan:
    radar measurements (P_d thinning), clutter near target 0, and AIS
    messages at mid-period timestamps with mixed accuracy classes."""
    rng = np.random.default_rng(seed)
    x0 = [np.array([-80.0, 0.0, 6.0, 0.0]),
          np.array([60.0, 40.0, -5.0, 1.0]),
          np.array([0.0, -60.0, 0.0, 4.0])]
    mmsi = [200000001, 200000002, 0]     # target 2 has no transponder
    F = np.eye(4)
    F[0, 2] = F[1, 3] = PERIOD
    xs = [x.copy() for x in x0]
    scans = []
    for i in range(n_scans):
        t_prev = i * PERIOD
        t = (i + 1) * PERIOD
        ais = []
        for k in range(2):
            # one class-A style report per period, ~60% reception
            if rng.random() < 0.6:
                ta = t_prev + PERIOD * rng.uniform(0.2, 0.8)
                dt_a = ta - t_prev
                Fa = np.eye(4)
                Fa[0, 2] = Fa[1, 3] = dt_a
                high = bool(rng.random() < 0.5)
                sig = 1.0 if high else 3.0
                state = Fa @ xs[k] + rng.normal(0, sig, 4) * [1, 1, 0.1, 0.1]
                m = (int(rng.integers(2e8, 9e8)) if id_scrambling
                     else mmsi[k])
                ais.append(AisMsg(state=state.astype(np.float64),
                                  time=float(ta), mmsi=m,
                                  high_accuracy=high))
        xs = [F @ x for x in xs]
        zs = []
        for k, x in enumerate(xs):
            if rng.random() < PARAMS.P_d:
                zs.append(x[:2] + rng.normal(0, 1.0, 2))
        # clutter point near target 0 (forces association ambiguity)
        zs.append(xs[0][:2] + np.array([3.0, -2.0]) + rng.normal(0, 1.0, 2))
        scans.append((t, np.stack(zs).astype(np.float32), ais))
    return x0, mmsi, scans


def _run(x0, mmsi, scans):
    K = len(x0)
    W = SHAPES.window
    tracker = Tracker(SHAPES, PARAMS, method='lagrangian', use_ais=True,
                      ais_initialization=False)
    tracker.pre_initialize(0.0, x0, mmsi=mmsi)
    oracle = RefOracle(PARAMS)
    oracle.pre_initialize(0.0, x0, mmsi=mmsi)
    rows = []
    for t, z, ais in scans:
        out = tracker.add_measurement_list(t, z, ais_messages=ais)
        oracle.step(t, z, ais_msgs=ais)
        dev = [(int(out.sel_hist_meas[k, W - 1]),
                int(out.sel_hist_mmsi[k, W - 1])) for k in range(K)]
        dev_hist = [[(int(out.sel_hist_meas[k, w]),
                      int(out.sel_hist_mmsi[k, w]))
                     for w in range(W) if out.sel_hist_valid[k, w]]
                    for k in range(K)]
        dev_obj = float(sum(out.track_cnllr[k] for k in range(K)))
        ref = [(m, mm) for _tid, m, mm, _x, _c in oracle.selected()]
        rows.append((dev, dev_hist, dev_obj, ref, oracle.objective(),
                     oracle))
    return rows


def test_ais_fusion_parity():
    x0, mmsi, scans = _ais_scenario()
    rows = _run(x0, mmsi, scans)
    used_ais_somewhere = False
    for i, (dev, dev_hist, dev_obj, ref, ref_obj, oracle) in \
            enumerate(rows):
        tol = max(5e-3, 2e-3 * abs(ref_obj))
        assert dev_obj <= ref_obj + tol, \
            f"scan {i}: device obj {dev_obj} worse than oracle {ref_obj}"
        used_ais_somewhere |= any(mm != 0 for _m, mm in ref)
        if dev == ref:
            continue
        # tie-verify: the device labels must correspond to an oracle
        # leaf combination with the same (optimal) total cost.
        # NOTE: called after step() => trees are N-scan pruned, matching
        # the device's own pruned window.
        total = 0.0
        for k in range(len(dev)):
            c = oracle.leaf_cost_by_history(k, dev_hist[k])
            assert c is not None, \
                (f"scan {i}: device history for target {k} "
                 f"{dev_hist[k]} has no oracle counterpart")
            total += c
        assert total <= ref_obj + tol, \
            (f"scan {i}: device labels {dev} cost {total} in the oracle "
             f"vs optimum {ref_obj} — real divergence, not a tie")
    # the scenario must actually exercise fusion, or this test is vacuous
    assert used_ais_somewhere


def test_ais_parity_id_scrambling():
    """With scrambled MMSIs the device and oracle must still agree —
    fused hypotheses carry unknown identities, MMSI-consistency blocks
    cross-track AIS reuse (simulator.py:156-158 robustness case)."""
    x0, mmsi, scans = _ais_scenario(n_scans=5, seed=9, id_scrambling=True)
    # scrambled ids: tracks have no confirmed identity -> every message
    # is admissible until one is absorbed into a track's history
    rows = _run(x0, [0, 0, 0], scans)
    for i, (dev, dev_hist, dev_obj, ref, ref_obj, oracle) in \
            enumerate(rows):
        tol = max(5e-3, 2e-3 * abs(ref_obj))
        assert dev_obj <= ref_obj + tol, \
            f"scan {i}: device obj {dev_obj} vs oracle {ref_obj}"
        if dev != ref:
            total = 0.0
            for k in range(len(dev)):
                c = oracle.leaf_cost_by_history(k, dev_hist[k])
                assert c is not None, f"scan {i} target {k}: no match"
                total += c
            assert total <= ref_obj + tol, \
                f"scan {i}: real divergence ({total} vs {ref_obj})"


def test_ais_fuse_width_compression_preserves_decisions():
    """shapes.ais_per_leaf = 2 (compressed stage-2 fusion) must make
    the same selections as the exhaustive G = A path when the stage-1
    gate admits few messages per leaf (the production regime)."""
    import dataclasses
    x0, mmsi, scans = _ais_scenario(n_scans=6, seed=17)
    shapes_c = dataclasses.replace(SHAPES, ais_per_leaf=2)

    def run_with(shapes):
        W = shapes.window
        tracker = Tracker(shapes, PARAMS, method='lagrangian',
                          use_ais=True, ais_initialization=False)
        tracker.pre_initialize(0.0, x0, mmsi=mmsi)
        sel = []
        for t, z, ais in scans:
            out = tracker.add_measurement_list(t, z, ais_messages=ais)
            sel.append([(int(out.sel_hist_meas[k, W - 1]),
                         int(out.sel_hist_mmsi[k, W - 1]))
                        for k in range(len(x0))])
        return sel

    assert run_with(SHAPES) == run_with(shapes_c)
