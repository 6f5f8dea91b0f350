"""Plotting smoke tests (headless Agg backend)."""
import numpy as np
import matplotlib
matplotlib.use('Agg')
import matplotlib.pyplot as plt

from pymht_tpu import Tracker, TrackerShapes, TrackerParams
from pymht_tpu.utils import simulator as sim
from pymht_tpu.utils import plotting


def test_plot_full_scene(tmp_path):
    shapes = TrackerShapes(max_targets=8, max_leaves=16, max_meas=16,
                           max_ais=2, window=6, max_prelim=8,
                           max_initiators=16)
    params = TrackerParams(radar_period=2.5, P_d=0.9, lambda_phi=1e-8,
                           lambda_nu=1e-6, radar_range=500.0)
    rng = np.random.default_rng(4)
    targets = sim.generate_initial_targets(rng, 3, (0., 0.), 300.0, 0.9, 0.1)
    sim_list = sim.simulate_targets(rng, targets, sim_time=10 * 2.5, dt=2.5)
    scans = sim.simulate_scans(rng, sim_list, 2.5, sigma_R=2.0,
                               lambda_phi=0.0, radar_range=500.0,
                               p0=(0., 0.), local_clutter=False,
                               global_clutter=False)
    tracker = Tracker(shapes, params, use_ais=False)
    for s in scans:
        tracker.add_measurement_list(s.time, s.measurements)

    fig, ax = plt.subplots()
    plotting.plot_ground_truth(ax, sim_list)
    plotting.plot_measurements(ax, scans)
    plotting.plot_tracks(ax, tracker, smooth=True)
    plotting.plot_validation_regions(ax, tracker)
    plotting.plot_velocity_arrows(ax, tracker)
    plotting.plot_terminated_tracks(ax, tracker)
    plotting.plot_ais_updates(ax, tracker.ais_history)
    plotting.plot_initial_targets(ax, [t.state for t in targets])
    out = tmp_path / "scene.png"
    fig.savefig(out)
    assert out.exists() and out.stat().st_size > 1000
    plt.close(fig)


def test_polar_sim_target():
    rng = np.random.default_rng(0)
    t = sim.SimTargetPolar(state=np.array([0.0, 0.0, 90.0, 5.0]),
                           time=0.0, P_d=1.0, sigma_Q=0.0)
    sim_list = sim.simulate_targets(rng, [t], sim_time=10.0, dt=1.0)
    # heading 90 deg = east
    final = sim_list[-1][0]
    assert final.state[0] > 5.0
    assert final.cartesian_state().shape == (4,)
    scans = sim.simulate_scans(rng, sim_list, 1.0, sigma_R=0.5,
                               lambda_phi=0.0, radar_range=100.0,
                               p0=(0., 0.), local_clutter=False,
                               global_clutter=False)
    assert all(len(s.measurements) == 1 for s in scans)
