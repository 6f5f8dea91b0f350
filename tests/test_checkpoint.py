"""Checkpoint/resume: a resumed tracker must continue bit-identically."""
import numpy as np

from pymht_tpu.core.config import TrackerShapes, TrackerParams
from pymht_tpu.core.tracker import Tracker
from pymht_tpu.utils import simulator as sim
from pymht_tpu.utils import checkpoint


def test_checkpoint_resume_identical(tmp_path):
    shapes = TrackerShapes(max_targets=8, max_leaves=16, max_meas=16,
                           max_ais=2, window=6, max_prelim=8,
                           max_initiators=16)
    params = TrackerParams(radar_period=2.5, P_d=0.9, lambda_phi=1e-7,
                           lambda_nu=1e-6, radar_range=500.0)
    rng = np.random.default_rng(9)
    targets = sim.generate_initial_targets(rng, 3, (0., 0.), 300.0, 0.9, 0.1)
    sim_list = sim.simulate_targets(rng, targets, sim_time=12 * 2.5, dt=2.5)
    scans = sim.simulate_scans(rng, sim_list, 2.5, sigma_R=2.0,
                               lambda_phi=0.0, radar_range=500.0,
                               p0=(0., 0.), local_clutter=False,
                               global_clutter=False)

    # Run A: all scans in one go.
    tr_a = Tracker(shapes, params, method='ipm', use_ais=False)
    for s in scans:
        tr_a.add_measurement_list(s.time, s.measurements)

    # Run B: first half, checkpoint, resume, second half.
    tr_b = Tracker(shapes, params, method='ipm', use_ais=False)
    half = len(scans) // 2
    for s in scans[:half]:
        tr_b.add_measurement_list(s.time, s.measurements)
    ckpt = str(tmp_path / "ck")
    checkpoint.save(tr_b, ckpt)
    tr_c = checkpoint.load(ckpt)
    for s in scans[half:]:
        tr_c.add_measurement_list(s.time, s.measurements)

    ids_a, st_a = tr_a.get_track_states()
    ids_c, st_c = tr_c.get_track_states()
    np.testing.assert_array_equal(ids_a, ids_c)
    np.testing.assert_allclose(st_a, st_c, rtol=1e-6)
    # archives agree
    assert set(tr_a.archives) == set(tr_c.archives)
    for tid in tr_a.archives:
        np.testing.assert_allclose(
            np.asarray(tr_a.archives[tid].states),
            np.asarray(tr_c.archives[tid].states), rtol=1e-6)
