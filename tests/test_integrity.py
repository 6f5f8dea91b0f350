"""Structural invariant property tests (checker lives in
pymht_tpu.utils.integrity; exercised here every scan)."""
import numpy as np
import jax.numpy as jnp

from pymht_tpu.core.config import TrackerShapes, TrackerParams
from pymht_tpu.core.tracker import Tracker
from pymht_tpu.utils import simulator as sim
from pymht_tpu.utils.integrity import check_state_integrity


def test_integrity_through_cluttered_run():
    shapes = TrackerShapes(max_targets=8, max_leaves=16, max_meas=32,
                           max_ais=2, window=6, max_prelim=8,
                           max_initiators=32)
    params = TrackerParams(radar_period=2.5, P_d=0.9, lambda_phi=1e-6,
                           lambda_nu=1e-5, N=4, radar_range=500.0)
    rng = np.random.default_rng(21)
    targets = sim.generate_initial_targets(rng, 4, (0., 0.), 300.0, 0.9, 0.1)
    sim_list = sim.simulate_targets(rng, targets, sim_time=12 * 2.5, dt=2.5)
    scans = sim.simulate_scans(rng, sim_list, 2.5, sigma_R=2.5,
                               lambda_phi=1e-6, radar_range=500.0,
                               p0=(0., 0.), lambda_local=0.5)
    tracker = Tracker(shapes, params, method='ipm', use_ais=False)
    for s in scans:
        tracker.add_measurement_list(s.time, s.measurements)
        check_state_integrity(tracker)


def test_integrity_with_ais():
    shapes = TrackerShapes(max_targets=8, max_leaves=16, max_meas=16,
                           max_ais=4, window=6, max_prelim=8,
                           max_initiators=16)
    params = TrackerParams(radar_period=2.5, P_d=0.9, lambda_phi=1e-8,
                           lambda_nu=1e-6, N=4, radar_range=800.0)
    rng = np.random.default_rng(5)
    targets = sim.generate_initial_targets(rng, 3, (0., 0.), 300.0, 0.9,
                                           0.1, assign_mmsi=True)
    sim_list = sim.simulate_targets(rng, targets, sim_time=12 * 2.5, dt=2.5)
    scans = sim.simulate_scans(rng, sim_list, 2.5, sigma_R=2.5,
                               lambda_phi=0.0, radar_range=800.0,
                               p0=(0., 0.), local_clutter=False,
                               global_clutter=False)
    ais_groups = sim.simulate_ais(rng, sim_list, 2.5, sim_list[0][0].time)
    ais_by_scan = {}
    for g in ais_groups:
        # deliver each group at the first scan at/after its last message
        tmax = max(m.time for m in g)
        for s in scans:
            if s.time > tmax:
                ais_by_scan.setdefault(s.time, []).extend(g)
                break
    tracker = Tracker(shapes, params, method='ipm', use_ais=True)
    for s in scans:
        msgs = ais_by_scan.get(s.time, [])
        # AIS messages must be within one radar period of the scan
        msgs = [m for m in msgs if s.time - 2.5 < m.time < s.time]
        tracker.add_measurement_list(s.time, s.measurements, msgs)
        check_state_integrity(tracker)
    # at least one track should have locked an MMSI identity
    st = tracker.state
    mmsis = np.asarray(st.tgt_mmsi)[np.asarray(st.tgt_mask)]
    hist_mmsi = np.asarray(st.hist_mmsi)
    assert (mmsis > 0).any() or (hist_mmsi > 0).any()


def test_cluster_compact_adjacency_matches_full():
    """cluster() compacts the adjacency matmul to contested slots
    (round-5, the T=8192 select bottleneck); labels must equal the
    full-slot adjacency both on the compact path and via the overflow
    fallback (CLUSTER_COMPACT_CAP forced tiny)."""
    import numpy as np
    import jax.numpy as jnp
    from pymht_tpu.core import select as sel_mod
    from pymht_tpu.core.config import TrackerShapes, TrackerParams
    from pymht_tpu.core.state import empty_state, insert_targets
    from pymht_tpu.core.grow import Scan, grow
    from pymht_tpu.models import pv

    shapes = TrackerShapes(max_targets=8, max_leaves=8, max_meas=16,
                           max_ais=2, window=5)
    params = TrackerParams(radar_period=2.5, P_d=0.85, lambda_phi=1e-5,
                           lambda_nu=1e-5, N=3)
    rng = np.random.default_rng(2)
    st = empty_state(shapes, params)
    xs = np.zeros((8, 4), np.float32)
    for i in range(8):
        xs[i, :2] = [25 * (i // 2), 5 * (i % 2)]   # 4 close pairs
        xs[i, 2:] = [1.0, 0.0]
    st = insert_targets(st, jnp.asarray(xs),
                        jnp.broadcast_to(pv.P0, (8, 4, 4)),
                        jnp.ones(8, bool), jnp.zeros(8, jnp.int32),
                        jnp.asarray(0.0), params)
    z = np.concatenate([
        xs[:, :2] + xs[:, 2:] * 2.5 + rng.normal(0, 1.0, (8, 2)),
        xs[::2, :2] + xs[::2, 2:] * 2.5 + rng.normal(0, 1.5, (4, 2)),
        rng.normal(0, 300, (4, 2))]).astype(np.float32)
    scan = Scan(z=jnp.asarray(z), mask=jnp.ones(16, bool),
                time=jnp.asarray(2.5, jnp.float32))
    st = grow(st, scan, None, shapes, params).state

    labels_c, n_c = sel_mod.cluster(st, shapes)        # compact path
    orig = sel_mod.CLUSTER_COMPACT_CAP
    try:
        sel_mod.CLUSTER_COMPACT_CAP = 1               # force fallback
        labels_f, n_f = sel_mod.cluster(st, shapes)
    finally:
        sel_mod.CLUSTER_COMPACT_CAP = orig
    np.testing.assert_array_equal(np.asarray(labels_c),
                                  np.asarray(labels_f))
    assert int(n_c) == int(n_f)
    # sanity: the scene actually has multi-target clusters
    from pymht_tpu.core.select import cluster_sizes
    cs = np.asarray(cluster_sizes(labels_c, st.tgt_mask))
    assert cs.max() >= 2


def test_usage_and_feasibility_scatter_path_parity():
    """_hist_usage / _selection_feasible switch to scatter builds above
    _USAGE_DENSE_LIMIT (round-5 T=8192 select fix); forced small, the
    scatter formulation must equal the dense one exactly."""
    import numpy as np
    import jax.numpy as jnp
    from pymht_tpu.core import select as sel_mod
    from pymht_tpu.core.config import TrackerShapes, TrackerParams
    from pymht_tpu.core.state import empty_state, insert_targets
    from pymht_tpu.core.grow import Scan, grow
    from pymht_tpu.models import pv

    shapes = TrackerShapes(max_targets=8, max_leaves=8, max_meas=16,
                           max_ais=2, window=5)
    params = TrackerParams(radar_period=2.5, P_d=0.85, lambda_phi=1e-5,
                           lambda_nu=1e-5, N=3)
    rng = np.random.default_rng(6)
    st = empty_state(shapes, params)
    xs = np.zeros((8, 4), np.float32)
    for i in range(8):
        xs[i, :2] = [22 * (i // 2), 4 * (i % 2)]
        xs[i, 2:] = [1.0, 0.2]
    st = insert_targets(st, jnp.asarray(xs),
                        jnp.broadcast_to(pv.P0, (8, 4, 4)),
                        jnp.ones(8, bool), jnp.zeros(8, jnp.int32),
                        jnp.asarray(0.0), params)
    z = np.concatenate([
        xs[:, :2] + xs[:, 2:] * 2.5 + rng.normal(0, 1.0, (8, 2)),
        rng.normal(0, 200, (8, 2))]).astype(np.float32)
    scan = Scan(z=jnp.asarray(z), mask=jnp.ones(16, bool),
                time=jnp.asarray(2.5, jnp.float32))
    st = grow(st, scan, None, shapes, params).state

    dense_u = np.asarray(sel_mod._hist_usage(st, shapes))
    sel0 = jnp.argmin(sel_mod.leaf_scores(st, params), axis=1)
    dense_f = bool(sel_mod._selection_feasible(st, shapes, sel0))
    orig = sel_mod._USAGE_DENSE_LIMIT
    try:
        sel_mod._USAGE_DENSE_LIMIT = 0      # force scatter builds
        scat_u = np.asarray(sel_mod._hist_usage(st, shapes))
        scat_f = bool(sel_mod._selection_feasible(st, shapes, sel0))
        # and the whole hybrid must still select identically
        res_s = sel_mod.select(st, shapes, params, method='lagrangian')
    finally:
        sel_mod._USAGE_DENSE_LIMIT = orig
    res_d = sel_mod.select(st, shapes, params, method='lagrangian')
    np.testing.assert_array_equal(dense_u, scat_u)
    assert dense_f == scat_f
    np.testing.assert_array_equal(np.asarray(res_d.sel),
                                  np.asarray(res_s.sel))
