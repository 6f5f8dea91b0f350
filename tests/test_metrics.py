"""Track-quality metrics on a clean scenario."""
import numpy as np

from pymht_tpu import Tracker, TrackerShapes, TrackerParams
from pymht_tpu.utils import simulator as sim
from pymht_tpu.utils.metrics import evaluate


def test_metrics_clean_run():
    shapes = TrackerShapes(max_targets=8, max_leaves=16, max_meas=16,
                           max_ais=2, window=6, max_prelim=8,
                           max_initiators=16)
    params = TrackerParams(radar_period=2.5, P_d=0.9, lambda_phi=1e-8,
                           lambda_nu=1e-6, radar_range=800.0)
    rng = np.random.default_rng(13)
    targets = sim.generate_initial_targets(rng, 3, (0., 0.), 400.0, 0.9, 0.1)
    sim_list = sim.simulate_targets(rng, targets, sim_time=14 * 2.5, dt=2.5)
    scans = sim.simulate_scans(rng, sim_list, 2.5, sigma_R=2.0,
                               lambda_phi=0.0, radar_range=800.0,
                               p0=(0., 0.), local_clutter=False,
                               global_clutter=False)
    tracker = Tracker(shapes, params, use_ais=False)
    for s in scans:
        tracker.add_measurement_list(s.time, s.measurements)

    m = evaluate(tracker, sim_list, 2.5, p0=(0., 0.), radar_range=800.0)
    assert m['n_tracked'] == 3
    assert m['rms'] < 10.0
    assert m['track_percent'] > 0.5   # initiation takes a few scans
    assert m['track_loss'] == 0.0
    assert m['n_false_tracks'] <= 1
