"""XML export round-trip tests (format compatibility with the reference)."""
import os
import xml.etree.ElementTree as ET

import numpy as np

from pymht_tpu.core.config import TrackerShapes, TrackerParams
from pymht_tpu.core.tracker import Tracker
from pymht_tpu.utils import simulator as sim
from pymht_tpu.utils import xml_io


def _small_run(tmp_path):
    period = 1.0
    shapes = TrackerShapes(max_targets=8, max_leaves=16, max_meas=16,
                           max_ais=2, window=6, max_prelim=8,
                           max_initiators=16)
    params = TrackerParams(radar_period=period, P_d=0.9, lambda_phi=1e-8,
                           lambda_nu=1e-6, radar_range=500.0)
    rng = np.random.default_rng(5)
    targets = sim.generate_initial_targets(rng, 2, (0., 0.), 300.0, 0.9, 0.1)
    sim_list = sim.simulate_targets(rng, targets, sim_time=8 * period,
                                    dt=period)
    scans = sim.simulate_scans(rng, sim_list, period, sigma_R=1.0,
                               lambda_phi=0.0, radar_range=500.0,
                               p0=(0., 0.), local_clutter=False,
                               global_clutter=False)
    tracker = Tracker(shapes, params, use_ais=False)
    for s in scans:
        tracker.add_measurement_list(s.time, s.measurements)
    return tracker, sim_list, shapes, params


def test_store_run_and_ground_truth(tmp_path):
    tracker, sim_list, shapes, params = _small_run(tmp_path)
    scenario = ET.Element(xml_io.SCENARIO)
    xml_io.store_ground_truth(scenario, sim_list, (0., 0.), 500.0, 1.0, 0.0)
    xml_io.store_tracker_settings(scenario, shapes, params, seed=5)
    xml_io.store_run(scenario, tracker, smooth=True, i=0)
    path = os.path.join(str(tmp_path), "out", "run.xml")
    xml_io.write_element_to_file(path, scenario)
    assert os.path.exists(path)

    tree = ET.parse(path)
    root = tree.getroot()
    assert root.tag == xml_io.SCENARIO
    gt = root.find(xml_io.GROUNDTRUTH)
    assert gt is not None and len(gt.findall(xml_io.TRACK)) == 2
    run = root.find(xml_io.RUN)
    assert run is not None
    tracks = run.findall(xml_io.TRACK)
    assert len(tracks) >= 1
    # states carry position/velocity with N/E children
    st = tracks[0].find(xml_io.STATES).find(xml_io.STATE)
    assert st.find(xml_io.POSITION).find(xml_io.NORTH) is not None
    assert run.find(xml_io.RUNTIME) is not None


def test_smooth_tracks_output_shapes(tmp_path):
    tracker, sim_list, shapes, params = _small_run(tmp_path)
    sm = tracker.get_smooth_tracks()
    assert len(sm) >= 1
    for tid, (pos, vel, ok) in sm.items():
        assert pos.shape[1] == 2
        assert vel.shape == pos.shape


def test_sinv_seeded_from_initiator_covariance():
    """Confirmed (non-preinitialized) tracks must seed the serialized
    S_inv recursion from the initiator's two-point covariance, not
    pv.P0 (advisor round-2 finding on _sinv_sequence)."""
    import numpy as np
    from pymht_tpu.core.config import TrackerShapes, TrackerParams
    from pymht_tpu.core.tracker import Tracker
    from pymht_tpu.models import pv

    shapes = TrackerShapes(max_targets=4, max_leaves=16, max_meas=8,
                           max_ais=2, window=7, max_prelim=4,
                           max_initiators=8)
    params = TrackerParams(radar_period=1.0, P_d=0.9, lambda_phi=1e-6,
                           lambda_nu=1e-6, radar_range=1e4,
                           cnllr_upper_limit=1e9,
                           score_upper_limit_scale=1e6)
    tracker = Tracker(shapes, params, method='lagrangian', use_ais=False)
    rng = np.random.default_rng(2)
    x = np.array([0.0, 0.0, 4.0, 1.0])
    for i in range(5):
        t = (i + 1) * 1.0
        z = np.array([x[:2] + x[2:] * t + rng.normal(0, 0.5, 2)],
                     np.float32)
        tracker.add_measurement_list(t, z)
    assert tracker.init_P, "no track confirmed"
    tid, P0_rec = next(iter(tracker.init_P.items()))
    # the recorded covariance is the initiator's confirmed covariance —
    # it must differ from the preinitialization default pv.P0
    assert not np.allclose(P0_rec, np.asarray(pv.P0), atol=1e-6)
    # and the serialized S_inv changes accordingly
    from pymht_tpu.utils.xml_io import _sinv_sequence
    times = [3.0, 4.0, 5.0]
    labels = [1, 1, 1]
    s_default = _sinv_sequence(times, labels, params)
    s_seeded = _sinv_sequence(times, labels, params, P0=P0_rec)
    assert not np.allclose(s_default[0], s_seeded[0], atol=1e-6)


def test_per_phase_runtime_export(tmp_path):
    """store_run must export one sub-element per recorded phase with
    mean/min/max attribs and the raw series as text (reference
    _storeRun, tracker.py:1512-1533)."""
    tracker, sim_list, shapes, params = _small_run(tmp_path)
    # record a de-fused per-phase profile into the runtime log
    s_last = sim_list[-1]
    phases = tracker.profile_phases(
        s_last[0].time, np.zeros((0, 2), np.float32))
    assert set(phases) >= {'Process', 'Optim', 'Terminate', 'N-Prune',
                           'Init', 'Total'}
    scenario = ET.Element(xml_io.SCENARIO)
    xml_io.store_run(scenario, tracker, smooth=False, i=0)
    rt = scenario.find(xml_io.RUN).find(xml_io.RUNTIME)
    assert rt is not None
    assert rt.attrib[xml_io.DESCRIPTION] == "Per iteration"
    assert rt.attrib[xml_io.PRECISION] == str(xml_io.TIME_LOG_PRECISION)
    tags = {e.tag for e in rt}
    assert {'Total', 'Process', 'Optim'} <= tags
    for e in rt:
        assert xml_io.MEAN in e.attrib
        assert xml_io.MIN in e.attrib
        assert xml_io.MAX in e.attrib
        assert e.text and '[' in e.text      # raw series serialized


def test_store_evaluation_tags(tmp_path):
    """Analysis-side vocabulary (xmlDefinitions.py:43-60) written from
    utils/metrics.evaluate output."""
    from pymht_tpu.utils.metrics import evaluate
    tracker, sim_list, shapes, params = _small_run(tmp_path)
    m = evaluate(tracker, sim_list, 1.0, p0=(0., 0.), radar_range=500.0)
    scenario = ET.Element(xml_io.SCENARIO)
    run = xml_io.store_run(scenario, tracker, smooth=False, i=0)
    xml_io.store_evaluation(run, m)
    assert xml_io.RMS_ERROR in run.attrib
    assert xml_io.TRACK_PERCENT in run.attrib
    assert xml_io.TRACK_LOSS in run.attrib
    assert xml_io.TIME_MATCH_LENGTH in run.attrib
    il = run.find(xml_io.INITIALIZATION_LOG)
    assert il is not None
    assert xml_io.CORRECT_TARGETS in il.attrib
    assert xml_io.FALSE_TARGETS in il.attrib


def test_batched_smooth_matches_per_track(tmp_path):
    """get_smooth_tracks (ONE batched device call) must agree with the
    per-track rts_smooth host loop it replaced."""
    from pymht_tpu.ops.smoother import rts_smooth
    from pymht_tpu.models import pv
    import jax.numpy as jnp
    tracker, sim_list, shapes, params = _small_run(tmp_path)
    batched = tracker.get_smooth_tracks(include_terminated=True)
    time_to_idx = {t: i for i, t in enumerate(tracker.scan_times)}
    seqs = tracker._track_measurement_sequences(include_terminated=True)
    n_checked = 0
    for tid, (times, labels, states, _mmsi) in seqs.items():
        zs, mask = [], []
        for t, lab in zip(times, labels):
            idx = time_to_idx.get(t)
            if idx is None or lab is None or lab < 1 \
                    or lab - 1 >= len(tracker.scan_history[idx]):
                zs.append(np.zeros(2, np.float32)); mask.append(False)
            else:
                zs.append(tracker.scan_history[idx][lab - 1])
                mask.append(True)
        if sum(mask) < 2:
            continue
        xs, _ = rts_smooth(jnp.asarray(np.asarray(states[0], np.float32)),
                           pv.P0, jnp.asarray(np.array(zs, np.float32)),
                           jnp.asarray(np.array(mask)),
                           params.radar_period)
        pos, vel, ok = batched[tid]
        assert ok
        np.testing.assert_allclose(pos, np.asarray(xs)[:, :2],
                                   rtol=1e-5, atol=1e-3)
        n_checked += 1
    assert n_checked >= 1
