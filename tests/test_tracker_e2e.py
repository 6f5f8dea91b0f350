"""End-to-end tracker tests on small scenarios (BASELINE config 1 style)."""
import numpy as np
import pytest

from pymht_tpu.core.config import TrackerShapes, TrackerParams
from pymht_tpu.core.tracker import Tracker
from pymht_tpu.utils import simulator as sim


SHAPES = TrackerShapes(max_targets=8, max_leaves=32, max_meas=16,
                       max_ais=4, window=7, max_prelim=8, max_initiators=16)


def _run_two_target_crossing(method):
    """Two targets crossing paths, P_d=1, no clutter: tracks must follow
    truth and not swap or die."""
    period = 2.5
    params = TrackerParams(radar_period=period, P_d=0.9,
                           lambda_phi=1e-8, lambda_nu=1e-6, N=5,
                           radar_range=1000.0)
    t0 = 0.0
    # Crossing geometry: approach from left/right, cross at origin.
    tgt = [
        sim.SimTarget(state=np.array([-100.0, 10.0, 5.0, -0.5]),
                      time=t0, P_d=1.0, sigma_Q=0.1),
        sim.SimTarget(state=np.array([100.0, -10.0, -5.0, 0.5]),
                      time=t0, P_d=1.0, sigma_Q=0.1),
    ]
    rng = np.random.default_rng(7)
    sim_list = sim.simulate_targets(rng, tgt, sim_time=20 * period, dt=period)
    scans = sim.simulate_scans(rng, sim_list, period, sigma_R=1.0,
                               lambda_phi=0.0, radar_range=1000.0,
                               p0=(0.0, 0.0), P_d=1.0, local_clutter=False,
                               global_clutter=False)

    tracker = Tracker(SHAPES, params, method=method, use_ais=False)
    for scan in scans:
        tracker.add_measurement_list(scan.time, scan.measurements)

    ids, states = tracker.get_track_states()
    assert len(ids) == 2, f"expected 2 tracks, got {len(ids)}"

    truth = np.array([t.state for t in sim_list[-1]])
    # each track matches exactly one truth target within a few sigma
    err = np.linalg.norm(states[:, None, :2] - truth[None, :, :2], axis=2)
    best = err.min(axis=1)
    assert (best < 10.0).all(), f"track errors too large: {best}"
    # and they match different truths (no duplicate locks)
    assert set(err.argmin(axis=1)) == {0, 1}
    # velocity direction should match too (tracks did not swap at the cross)
    vel_err = np.linalg.norm(
        states[:, None, 2:] - truth[None, :, 2:], axis=2)
    assert (vel_err[np.arange(2), err.argmin(axis=1)] < 3.0).all()


@pytest.mark.parametrize("method", ["ipm", "lagrangian"])
def test_two_target_crossing(method):
    _run_two_target_crossing(method)


def test_track_initiation_confirms_quickly():
    """A clean target must be confirmed after M=2 detections in N=3."""
    period = 1.0
    params = TrackerParams(radar_period=period, P_d=0.9, lambda_phi=1e-8,
                           lambda_nu=1e-6, radar_range=1000.0)
    tracker = Tracker(SHAPES, params, method='ipm', use_ais=False)
    truth = np.array([50.0, 20.0, 3.0, 1.0])
    rng = np.random.default_rng(0)
    for k in range(6):
        t = (k + 1) * period
        pos = truth[:2] + truth[2:] * t + rng.normal(0, 0.5, 2)
        tracker.add_measurement_list(t, pos[None, :])
    ids, states = tracker.get_track_states()
    assert len(ids) == 1
    expect = truth[:2] + truth[2:] * 6.0
    assert np.linalg.norm(states[0, :2] - expect) < 5.0


def test_empty_scans_no_tracks():
    params = TrackerParams(radar_period=1.0)
    tracker = Tracker(SHAPES, params, use_ais=False)
    for k in range(4):
        tracker.add_measurement_list((k + 1) * 1.0, np.zeros((0, 2)))
    ids, states = tracker.get_track_states()
    assert len(ids) == 0
