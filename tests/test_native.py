"""Native C++ oracle tests: exact B&B vs scipy.milp, JV vs scipy LAP,
and the on-device solver's gap on REAL tracker-generated instances."""
import numpy as np
import jax.numpy as jnp
import pytest
from scipy.optimize import milp, LinearConstraint, Bounds, linear_sum_assignment

from pymht_tpu import native


def _random_instance(seed):
    rng = np.random.default_rng(seed)
    T, L, R = int(rng.integers(2, 8)), 6, int(rng.integers(3, 12))
    f = rng.normal(0, 2, (T, L))
    leaf_rows = []
    for t in range(T):
        for l in range(L):
            if l == 0:
                leaf_rows.append([])
            else:
                leaf_rows.append(sorted(rng.choice(
                    R, rng.integers(0, 3), replace=False).tolist()))
    return f, leaf_rows, R


def _milp_oracle(f, leaf_rows, R):
    T, L = f.shape
    n = T * L
    A_eq = np.zeros((T, n))
    for t in range(T):
        A_eq[t, t * L:(t + 1) * L] = 1
    A_in = np.zeros((R, n))
    for j, rr in enumerate(leaf_rows):
        for r in rr:
            A_in[r, j] = 1
    c = LinearConstraint(np.vstack([A_eq, A_in]),
                         np.concatenate([np.ones(T), -np.inf * np.ones(R)]),
                         np.concatenate([np.ones(T), np.ones(R)]))
    m = milp(f.reshape(-1), constraints=c, integrality=np.ones(n),
             bounds=Bounds(0, 1))
    return m.fun


@pytest.mark.parametrize("seed", range(8))
def test_exact_bnb_matches_milp(seed):
    f, leaf_rows, R = _random_instance(seed)
    sel, obj, optimal = native.solve_ilp_exact(f, leaf_rows, R)
    assert optimal
    ref = _milp_oracle(f, leaf_rows, R)
    assert abs(obj - ref) < 1e-6, (obj, ref)
    # selection achieves the reported objective and is feasible
    used = set()
    tot = 0.0
    for t, l in enumerate(sel):
        tot += f[t, l]
        for r in leaf_rows[t * f.shape[1] + l]:
            assert r not in used
            used.add(r)
    assert abs(tot - obj) < 1e-6


@pytest.mark.parametrize("seed", range(5))
def test_jv_matches_scipy(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(2, 20))
    cost = rng.uniform(0, 100, (n, n))
    col, total = native.solve_lap_jv(cost)
    r, c = linear_sum_assignment(cost)
    assert abs(total - cost[r, c].sum()) < 1e-9
    assert sorted(col.tolist()) == list(range(n))


def test_tracker_instance_gap():
    """Run the tracker on a conflict-heavy scenario and compare the
    on-device selection objective against the exact C++ oracle on the
    same forest — the BASELINE gap check on a real instance."""
    from pymht_tpu.core.config import TrackerShapes, TrackerParams
    from pymht_tpu.core.tracker import Tracker
    from pymht_tpu.core.select import leaf_scores, _slot_index

    shapes = TrackerShapes(max_targets=8, max_leaves=16, max_meas=16,
                           max_ais=2, window=6, max_prelim=8,
                           max_initiators=16)
    params = TrackerParams(radar_period=1.0, P_d=0.9, lambda_phi=1e-6,
                           lambda_nu=1e-5, radar_range=500.0)
    tracker = Tracker(shapes, params, method='ipm', use_ais=False)
    rng = np.random.default_rng(11)
    # two closely spaced targets with crossing clutter -> shared gates
    base = np.array([[0.0, 0.0, 2.0, 0.0], [0.0, 8.0, 2.0, 0.0]])
    for k in range(10):
        t = (k + 1) * 1.0
        zs = [b[:2] + b[2:] * t + rng.normal(0, 1.0, 2) for b in base]
        if k % 2 == 0:
            zs.append(base[0][:2] + base[0][2:] * t
                      + np.array([0.0, 4.0]) + rng.normal(0, 1.0, 2))
        tracker.add_measurement_list(t, np.stack(zs))

    state = tracker.state
    f = np.asarray(leaf_scores(state, params))
    f = np.where(np.asarray(state.leaf_mask), f, np.inf)
    slots, n_slots = _slot_index(state, shapes)
    slots = np.asarray(slots)
    T, L = f.shape
    leaf_rows = []
    for t in range(T):
        for l in range(L):
            rr = [int(s) for s in slots[t, l].reshape(-1) if s < n_slots]
            leaf_rows.append(sorted(set(rr)))
    # mask inactive targets: give them a free dummy leaf
    tmask = np.asarray(state.tgt_mask)
    for t in range(T):
        if not tmask[t]:
            f[t, 0] = 0.0
            leaf_rows[t * L] = []

    sel_oracle, obj_oracle, optimal = native.solve_ilp_exact(
        f, leaf_rows, n_slots)
    assert optimal

    sel_dev = np.asarray(state.sel_leaf)
    obj_dev = sum(f[t, sel_dev[t]] for t in range(T) if tmask[t])
    obj_oracle_active = sum(f[t, sel_oracle[t]] for t in range(T) if tmask[t])
    gap = (obj_dev - obj_oracle_active) / max(1.0, abs(obj_oracle_active))
    assert gap < 1e-3, f"device selection gap vs exact oracle: {gap}"
