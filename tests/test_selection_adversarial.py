"""Adversarial selection instances (VERDICT round-2 item 7).

Hand-built forests that hit the corners the scenario tests miss:

* depth == W (window == N+1, a documented-legal config): the compact
  contested-slot build must not turn empty padding columns into phantom
  'missed-detection at window column 0' constraints (hist_meas == 0 is
  the zero-hypothesis encoding; advisor round-2 high finding).
* tier-2 candidate truncation: when a small cluster's true optimum
  needs a leaf outside a member's top-C set, the reported objective may
  be suboptimal but the gap certificate (bound) must remain SOUND
  (bound <= true optimum) and must flag the gap.
* 5-8-target clusters engaging tier 3: certified gap vs the HiGHS
  oracle <= 0.1% (reference per-cluster ILP, tracker.py:979-1217).
* contested-slot overflow (> contested_cap) exercising the spine
  retreat path in select_hybrid.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pymht_tpu.core.config import TrackerShapes, TrackerParams
from pymht_tpu.core.select import select_hybrid, leaf_scores, K_ENUM
from pymht_tpu.core.state import empty_state
from pymht_tpu.core.tracker import Tracker
from pymht_tpu.utils.oracle import milp_select_oracle, selection_gap


def _forest(shapes, params, hist_meas, cnllr, spine):
    """Build a TrackerState whose forest is given explicitly.

    hist_meas: [T_active, L_active, W] int (-1 pad / 0 zero-hyp / m>=1),
    cnllr: [T_active, L_active] float (BIG-masked leaves = np.inf),
    spine: [T_active] spine leaf index per target.
    """
    st = empty_state(shapes, params)
    Ta, La, W = np.asarray(hist_meas).shape
    T, L = shapes.max_targets, shapes.max_leaves
    assert W == shapes.window
    hm = np.full((T, L, W), -1, np.int32)
    hm[:Ta, :La] = hist_meas
    cn = np.asarray(cnllr, np.float32)
    lm = np.zeros((T, L), bool)
    lm[:Ta, :La] = np.isfinite(cn)
    cnp = np.zeros((T, L), np.float32)
    cnp[:Ta, :La] = np.where(np.isfinite(cn), cn, 0.0)
    tm = np.zeros((T,), bool)
    tm[:Ta] = True
    sp = np.zeros((T,), np.int32)
    sp[:Ta] = spine
    depth = np.count_nonzero(hm[:, 0] >= 0, axis=1).astype(np.int32)
    return st.replace(
        hist_meas=jnp.asarray(hm), leaf_cnllr=jnp.asarray(cnp),
        leaf_mask=jnp.asarray(lm), tgt_mask=jnp.asarray(tm),
        spine_leaf=jnp.asarray(sp), tgt_depth=jnp.asarray(depth),
        sel_leaf=jnp.asarray(sp))


def test_depth_equals_window_no_phantom_conflicts():
    """window == N+1 so live history depth reaches W: column-0 missed
    detections (hist_meas == 0) must NOT conflict through empty compact
    columns.  5 targets = one big cluster (> K_ENUM) -> tier 3."""
    shapes = TrackerShapes(max_targets=8, max_leaves=4, max_meas=16,
                           max_ais=2, window=6, max_prelim=4,
                           max_initiators=8)
    params = TrackerParams(radar_period=1.0, N=5)
    n = 5
    N = params.N
    hist, cnllr = [], []
    for t in range(n):
        d = t + 2                      # distinct private measurement id
        leaf0 = [d] * 5 + [1]          # contested: meas 1 at current col
        leaf1 = [0] + [d] * 4 + [0]    # missed at col 0 AND current col
        hist.append([leaf0, leaf1, [-1] * 6, [-1] * 6])
        cnllr.append([1.0 * N, 2.0 * N, np.inf, np.inf])
    st = _forest(shapes, params, np.asarray(hist), np.asarray(cnllr),
                 spine=np.ones(n, np.int32))

    res = select_hybrid(st, shapes, params)
    sel_o, obj_o, optimal = milp_select_oracle(st, shapes, params)
    assert optimal
    # exact optimum: one target wins the contested leaf0 (score 1.0),
    # the others take their conflict-free leaf1 (score 2.0) -> 9.0
    assert np.isclose(obj_o, 9.0, atol=1e-5)
    assert bool(res.feasible)
    assert np.isclose(float(res.obj), obj_o, atol=1e-3), \
        f"device obj {float(res.obj)} vs exact {obj_o}"
    assert float(res.bound) <= obj_o + 1e-3
    # selected leaves must all be live
    lm = np.asarray(st.leaf_mask)
    for t in range(n):
        assert lm[t, int(res.sel[t])]


def test_tier2_truncation_bound_stays_sound():
    """2-target cluster whose optimum needs a leaf outside the top-C
    candidate set (C=2): the enumerated objective is allowed to be
    suboptimal, but bound <= true optimum and bound < obj (gap is
    flagged, not silently certified as 0)."""
    shapes = TrackerShapes(max_targets=4, max_leaves=4, max_meas=16,
                           max_ais=2, window=6, max_prelim=4,
                           max_initiators=8)
    params = TrackerParams(radar_period=1.0, N=5)
    N = params.N
    pad = [-1] * 4
    hist = [
        [pad + [2, 1],                 # A0: contested meas1, score 1.0
         pad + [3, 1],                 # A1: contested meas1, score 1.1
         pad + [4, 2],                 # A2: conflict-free,   score 3.0
         pad + [5, 0]],                # A3: spine,           score 5.0
        [pad + [6, 1],                 # B0: contested meas1, score 1.0
         pad + [7, 0],                 # B1: spine,           score 4.0
         [-1] * 6, [-1] * 6],
    ]
    cnllr = [[1.0 * N, 1.1 * N, 3.0 * N, 5.0 * N],
             [1.0 * N, 4.0 * N, np.inf, np.inf]]
    st = _forest(shapes, params, np.asarray(hist), np.asarray(cnllr),
                 spine=np.asarray([3, 1], np.int32))

    res = select_hybrid(st, shapes, params, enum_cands=2)
    sel_o, obj_o, optimal = milp_select_oracle(st, shapes, params)
    assert optimal
    assert np.isclose(obj_o, 4.0, atol=1e-5)       # A2 + B0
    # candidate sets C=2 (+forced spine) exclude A2 -> enum best is
    # (A0,B1) = 5.0
    assert np.isclose(float(res.obj), 5.0, atol=1e-4)
    assert bool(res.feasible)
    # the certificate must be sound AND must flag the gap
    assert float(res.bound) <= obj_o + 1e-5, \
        f"bound {float(res.bound)} exceeds true optimum {obj_o}"
    assert float(res.obj) - float(res.bound) > 0.5
    # with the full candidate set the optimum is found exactly
    res_full = select_hybrid(st, shapes, params)
    assert np.isclose(float(res_full.obj), obj_o, atol=1e-4)


SHAPES_BIG = TrackerShapes(max_targets=16, max_leaves=16, max_meas=32,
                           max_ais=2, window=6, max_prelim=8,
                           max_initiators=32)
PARAMS_BIG = TrackerParams(radar_period=1.0, P_d=0.9, lambda_phi=1e-5,
                           lambda_nu=1e-5, radar_range=500.0)


def _dense_cluster_scenario(n_targets, n_scans=8, seed=11, spacing=6.0):
    """n closely spaced parallel targets + inter-target clutter: one
    connected cluster of n targets every scan."""
    tracker = Tracker(SHAPES_BIG, PARAMS_BIG, method="lagrangian",
                      use_ais=False)
    rng = np.random.default_rng(seed)
    base = np.array([[0.0, spacing * i, 3.0, 0.0] for i in range(n_targets)])
    tracker.pre_initialize(0.0, base)
    for k in range(n_scans):
        t = (k + 1) * 1.0
        zs = [b[:2] + b[2:] * t + rng.normal(0, 1.2, 2) for b in base]
        for i in range(n_targets - 1):
            zs.append(base[i][:2] + base[i][2:] * t
                      + np.array([0.0, spacing / 2]) + rng.normal(0, 1.0, 2))
        tracker.add_measurement_list(t, np.stack(zs))
    return tracker


@pytest.mark.parametrize("n_targets", [5, 6, 8])
def test_tier3_cluster_gap_vs_oracle(n_targets):
    """5-8-target clusters engage tier 3 (csize > K_ENUM=4); the
    realized selection must stay within 0.1% of the HiGHS oracle."""
    assert n_targets > K_ENUM
    tracker = _dense_cluster_scenario(n_targets)
    st = tracker.state
    # the scenario really produced a big cluster at least once: check
    # final-scan cluster sizes
    from pymht_tpu.core.select import cluster, cluster_sizes
    labels, _ = cluster(st, SHAPES_BIG)
    csize = np.asarray(cluster_sizes(labels, st.tgt_mask))
    tgt = np.asarray(st.tgt_mask)
    assert csize[tgt].max() > K_ENUM, \
        f"scenario failed to build a big cluster: sizes {csize[tgt]}"
    gap = selection_gap(st, SHAPES_BIG, PARAMS_BIG)
    assert gap is not None
    assert gap < 1e-3, f"tier-3 gap vs oracle: {gap}"


def test_contested_overflow_spine_retreat():
    """With contested_cap far below the real contested-slot count the
    compact solver cannot see every conflict; select_hybrid must detect
    infeasibility in the full slot space and retreat big-cluster targets
    to their spines, returning a feasible selection."""
    tracker = _dense_cluster_scenario(8, n_scans=6)
    st = tracker.state
    res_small = select_hybrid(st, SHAPES_BIG, PARAMS_BIG, contested_cap=2)
    assert bool(res_small.feasible)
    # the full-cap result is feasible too and at least as good
    res_full = select_hybrid(st, SHAPES_BIG, PARAMS_BIG)
    assert bool(res_full.feasible)
    assert float(res_full.obj) <= float(res_small.obj) + 1e-4
    # retreat result must be a valid (live-leaf) selection
    lm = np.asarray(st.leaf_mask)
    for t in np.nonzero(np.asarray(st.tgt_mask))[0]:
        assert lm[t, int(res_small.sel[t])]
