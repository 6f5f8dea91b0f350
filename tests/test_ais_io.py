"""AIS stream helper + MMSI-scrambling robustness."""
import numpy as np

from pymht_tpu import Tracker, TrackerShapes, TrackerParams
from pymht_tpu.utils import simulator as sim
from pymht_tpu.utils.ais_io import AisMessageStream, dedup_latest_per_mmsi


def test_dedup_latest_per_mmsi():
    mk = lambda t, mmsi: sim.AisMessage(time=t, state=np.zeros(4), mmsi=mmsi)
    msgs = [mk(1.0, 111111111), mk(2.0, 111111111), mk(1.5, 222222222)]
    out = dedup_latest_per_mmsi(msgs)
    assert len(out) == 2
    assert {m.mmsi: m.time for m in out} == {111111111: 2.0,
                                             222222222: 1.5}


def test_stream_releases_groups_in_order():
    mk = lambda t, mmsi: sim.AisMessage(time=t, state=np.zeros(4), mmsi=mmsi)
    groups = [[mk(1.0, 1e8 + 1)], [mk(3.5, 1e8 + 1), mk(4.0, 1e8 + 2)]]
    stream = AisMessageStream(groups)
    assert len(stream.get_measurements(2.5)) == 1
    assert stream.get_measurements(2.5) == []   # next group not ready
    assert len(stream.get_measurements(5.0)) == 2
    assert stream.get_measurements(7.5) == []   # exhausted


def test_tracker_survives_mmsi_scrambling():
    """idScrambling flips MMSIs mid-flight; the MMSI-consistency gate
    must keep tracks single-identity (integrity) and alive."""
    shapes = TrackerShapes(max_targets=8, max_leaves=16, max_meas=16,
                           max_ais=4, window=6, max_prelim=8,
                           max_initiators=16)
    params = TrackerParams(radar_period=2.5, P_d=0.9, lambda_phi=1e-8,
                           lambda_nu=1e-6, N=4, radar_range=800.0)
    rng = np.random.default_rng(8)
    targets = sim.generate_initial_targets(rng, 2, (0., 0.), 300.0, 0.9,
                                           0.1, assign_mmsi=True)
    sim_list = sim.simulate_targets(rng, targets, sim_time=12 * 2.5, dt=2.5)
    scans = sim.simulate_scans(rng, sim_list, 2.5, sigma_R=2.5,
                               lambda_phi=0.0, radar_range=800.0,
                               p0=(0., 0.), local_clutter=False,
                               global_clutter=False)
    groups = sim.simulate_ais(rng, sim_list, 2.5, sim_list[0][0].time,
                              id_scrambling=True)
    stream = AisMessageStream(groups)
    tracker = Tracker(shapes, params, method='ipm', use_ais=True)
    for s in scans:
        msgs = [m for m in stream.get_measurements(s.time)
                if s.time - 2.5 < m.time < s.time]
        tracker.add_measurement_list(s.time, s.measurements, msgs)
        tracker.check_integrity()
    ids, states = tracker.get_track_states()
    assert len(ids) == 2
