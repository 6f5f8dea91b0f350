"""Selection quality on conflict-heavy scenarios: the device selection
must be FEASIBLE every scan (guaranteed by the zero-hypothesis spine the
beam preserves, mirroring the reference's always-present zero-hyp child,
pyTarget.py:319-328) and within 0.1% of the exact MILP oracle."""
import numpy as np
import jax.numpy as jnp
import pytest

from pymht_tpu.core.config import TrackerShapes, TrackerParams
from pymht_tpu.core.tracker import Tracker
from pymht_tpu.core.select import _slot_index, leaf_scores
from pymht_tpu.utils.oracle import milp_select_oracle, selection_gap


SHAPES = TrackerShapes(max_targets=16, max_leaves=16, max_meas=32,
                       max_ais=2, window=6, max_prelim=8, max_initiators=32)
PARAMS = TrackerParams(radar_period=1.0, P_d=0.9, lambda_phi=1e-5,
                       lambda_nu=1e-5, radar_range=500.0)


def _run_dense_scenario(method, n_scans=10, seed=7):
    """Five closely spaced parallel targets + local clutter: shared
    gates every scan, so the slow selection path engages constantly."""
    tracker = Tracker(SHAPES, PARAMS, method=method, use_ais=False)
    rng = np.random.default_rng(seed)
    base = np.array([[0.0, 6.0 * i, 3.0, 0.0] for i in range(5)])
    tracker.pre_initialize(0.0, base)
    feas = []
    for k in range(n_scans):
        t = (k + 1) * 1.0
        zs = [b[:2] + b[2:] * t + rng.normal(0, 1.2, 2) for b in base]
        # clutter between the targets (inside several gates at once)
        for i in range(4):
            zs.append(base[i][:2] + base[i][2:] * t
                      + np.array([0.0, 3.0]) + rng.normal(0, 1.0, 2))
        tracker.add_measurement_list(t, np.stack(zs))
        feas.append(_selection_feasible(tracker.state))
    return tracker, feas


def _selection_feasible(state):
    slots, n_slots = _slot_index(state, SHAPES)
    slots = np.asarray(slots).reshape(SHAPES.max_targets,
                                      SHAPES.max_leaves, -1)
    sel = np.asarray(state.sel_leaf)
    tgt = np.asarray(state.tgt_mask)
    used = {}
    for t in range(SHAPES.max_targets):
        if not tgt[t]:
            continue
        for s in slots[t, sel[t]]:
            if s >= n_slots:
                continue
            if int(s) in used:
                return False
            used[int(s)] = t
    return True


@pytest.mark.parametrize("method", ["lagrangian", "ipm"])
def test_selection_always_feasible(method):
    _, feas = _run_dense_scenario(method)
    assert all(feas), feas


def test_zero_spine_forced_into_beam():
    """grow must force the zero-hyp child of the previously selected
    leaf into the beam (the repair fallback): after growth, each active
    target has a leaf whose current column is association-free and whose
    earlier columns match the previously selected leaf's history."""
    from pymht_tpu.core.grow import Scan, grow

    tracker, _ = _run_dense_scenario("lagrangian", n_scans=6)
    state = tracker.state
    W = SHAPES.window
    prev_sel = np.asarray(state.sel_leaf)
    prev_meas = np.asarray(state.hist_meas)
    prev_ais = np.asarray(state.hist_ais)
    # a dense fake scan near the tracks so gates overflow the beam
    rng = np.random.default_rng(3)
    t_next = float(np.asarray(state.time)) + 1.0
    pts = np.asarray(state.leaf_x)[:, 0, :2][np.asarray(state.tgt_mask)]
    zs = np.concatenate([pts + rng.normal(0, 1.0, pts.shape)
                         for _ in range(4)])
    M = SHAPES.max_meas
    z = np.zeros((M, 2), np.float32)
    n = min(len(zs), M)
    z[:n] = zs[:n]
    scan = Scan(z=jnp.asarray(z), mask=jnp.asarray(np.arange(M) < n),
                time=jnp.asarray(np.float32(t_next)))
    g = grow(state, scan, None, SHAPES, PARAMS)
    hist_meas = np.asarray(g.state.hist_meas)
    hist_ais = np.asarray(g.state.hist_ais)
    lmask = np.asarray(g.state.leaf_mask)
    for t in np.nonzero(np.asarray(state.tgt_mask))[0]:
        want_meas = np.concatenate([prev_meas[t, prev_sel[t], 1:], [0]])
        want_ais = np.concatenate([prev_ais[t, prev_sel[t], 1:], [0]])
        found = False
        for l in np.nonzero(lmask[t])[0]:
            if (hist_meas[t, l, -1] <= 0 and hist_ais[t, l, -1] == 0
                    and (hist_meas[t, l, :W - 1] == want_meas[:W - 1]).all()
                    and (hist_ais[t, l, :W - 1] == want_ais[:W - 1]).all()):
                found = True
                break
        assert found, f"target {t}: zero-child of selected leaf not in beam"


def test_lagrangian_gap_vs_milp_oracle():
    tracker, _ = _run_dense_scenario("lagrangian")
    gap = selection_gap(tracker.state, SHAPES, PARAMS)
    assert gap is not None
    assert gap < 1e-3, f"selection gap vs MILP oracle: {gap}"


def test_milp_oracle_self_consistent():
    tracker, _ = _run_dense_scenario("lagrangian")
    sel, obj, optimal = milp_select_oracle(tracker.state, SHAPES, PARAMS)
    assert optimal
    f = np.asarray(leaf_scores(tracker.state, PARAMS))
    tgt = np.asarray(tracker.state.tgt_mask)
    recomputed = sum(f[t, sel[t]] for t in range(f.shape[0]) if tgt[t])
    assert np.isclose(recomputed, obj, rtol=1e-6)
