"""Dynamic-window graceful degradation (reference tracker.py:918-950)."""
import numpy as np

from pymht_tpu import Tracker, TrackerShapes, TrackerParams


def test_saturated_beam_shrinks_window():
    shapes = TrackerShapes(max_targets=4, max_leaves=4, max_meas=16,
                           max_ais=2, window=6, max_prelim=4,
                           max_initiators=16)
    params = TrackerParams(radar_period=2.5, P_d=0.9, lambda_phi=1e-4,
                           lambda_nu=1e-4, N=5, radar_range=200.0)
    tracker = Tracker(shapes, params, use_ais=False, dynamic_window=True)
    tracker.pre_initialize(0.0, [np.array([0.0, 0.0, 1.0, 0.0])])
    rng = np.random.default_rng(0)
    # dense clutter around the target saturates the tiny beam (L=4)
    for k in range(6):
        t = (k + 1) * 2.5
        z = np.array([[t, 0.0]]) + rng.normal(0, 1.5, (8, 2))
        tracker.add_measurement_list(t, z)
    tw = np.asarray(tracker.state.tgt_window)
    mask = np.asarray(tracker.state.tgt_mask)
    assert (tw[mask] < params.N).all(), tw[mask]
    assert (tw[mask] >= 1).all()


def test_per_target_time_budget_shrinks_only_overloaded():
    """Reference tracker.py:918-928: a target whose (estimated) grow
    time exceeds maxTargetGrowTime shrinks individually; cheap targets
    keep their full window."""
    shapes = TrackerShapes(max_targets=4, max_leaves=32, max_meas=16,
                           max_ais=2, window=6, max_prelim=4,
                           max_initiators=16)
    params = TrackerParams(radar_period=2.5, P_d=0.9, lambda_phi=1e-6,
                           lambda_nu=1e-6, N=5, radar_range=200.0,
                           max_target_time=0.2)
    tracker = Tracker(shapes, params, use_ais=False, dynamic_window=True)
    tracker.pre_initialize(0.0, [np.array([0.0, 0.0, 1.0, 0.0]),
                                 np.array([50.0, 50.0, -1.0, 0.0])])
    tracker.scan_times = [0.0, 2.5, 5.0]   # past the warm-up guard
    # target 0: 20 leaves x 400 gated pairs -> ~99% of the 1 s scan;
    # target 1: 2 leaves x 3 gated pairs -> well under 200 ms.
    leaf_counts = np.array([20, 2, 0, 0], np.int32)
    gated_counts = np.array([400, 3, 0, 0], np.int32)
    tracker._dynamic_window(1.0, leaf_counts, gated_counts)
    tw = np.asarray(tracker.state.tgt_window)
    assert tw[0] == params.N - 1, tw
    assert tw[1] == params.N, tw


def test_no_shrink_when_unsaturated():
    shapes = TrackerShapes(max_targets=4, max_leaves=64, max_meas=8,
                           max_ais=2, window=6, max_prelim=4,
                           max_initiators=8)
    params = TrackerParams(radar_period=2.5, P_d=0.9, lambda_phi=1e-8,
                           lambda_nu=1e-6, N=5, radar_range=200.0)
    tracker = Tracker(shapes, params, use_ais=False, dynamic_window=True)
    tracker.pre_initialize(0.0, [np.array([0.0, 0.0, 1.0, 0.0])])
    rng = np.random.default_rng(0)
    for k in range(5):
        t = (k + 1) * 2.5
        z = np.array([[t, 0.0]]) + rng.normal(0, 1.0, (1, 2))
        tracker.add_measurement_list(t, z)
    tw = np.asarray(tracker.state.tgt_window)
    mask = np.asarray(tracker.state.tgt_mask)
    assert (tw[mask] == params.N).all()
