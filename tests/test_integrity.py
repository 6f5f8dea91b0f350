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
