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


def test_streaming_timebase_keeps_fast_preinit_targets():
    """Round-3 regression: device-resident streaming (scan_many) with
    scan times based on tracker.t0 must predict pre-initialized targets
    correctly on the FIRST scan.  A wrong timebase (e.g. scans[0].time -
    period) makes the first grow run with dt=0, so every moving target
    misses its gate and fast ones die by the cnllr limit within two
    scans — exactly what happened to the streaming benches."""
    import jax
    import jax.numpy as jnp
    from pymht_tpu.core.tracker import Tracker, scan_many
    from pymht_tpu.core.grow import Scan, empty_ais

    shapes = TrackerShapes(max_targets=8, max_leaves=8, max_meas=8,
                           max_ais=2, window=5, max_prelim=4,
                           max_initiators=8)
    params = TrackerParams(radar_period=2.5, P_d=0.99, lambda_phi=1e-6,
                           lambda_nu=1e-6, N=3, radar_range=1e5)
    # fast targets: offset v*period = 50 m >> gate if dt is wrong
    xs = np.array([[0.0, 0.0, 20.0, 0.0],
                   [500.0, 500.0, 0.0, -20.0],
                   [-800.0, 200.0, 14.0, 14.0]], np.float32)
    period = 2.5
    t_abs0 = 100.0                      # first scan at an arbitrary time
    F_inv = np.eye(4, dtype=np.float32)
    F_inv[0, 2] = F_inv[1, 3] = -period
    tracker = Tracker(shapes, params, method='lagrangian', use_ais=False)
    tracker.pre_initialize(t_abs0 - period, [F_inv @ x for x in xs])

    n_scans = 4
    zb = np.zeros((n_scans, 8, 2), np.float32)
    mb = np.zeros((n_scans, 8), bool)
    tb = np.zeros((n_scans,), np.float32)
    for k in range(n_scans):
        t = t_abs0 + k * period
        zb[k, :3] = xs[:, :2] + xs[:, 2:] * (k * period)
        mb[k, :3] = True
        tb[k] = t - tracker.t0           # THE contract under test
    scans_dev = Scan(z=jnp.asarray(zb), mask=jnp.asarray(mb),
                     time=jnp.asarray(tb))
    ais_dev = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n_scans,) + x.shape),
        empty_ais(shapes))
    _, _, outs = scan_many(tracker.state, tracker.init_state, scans_dev,
                           ais_dev, shapes, params, method='lagrangian',
                           use_ais=False)
    alive = np.asarray(outs.track_mask)[:, :3]
    assert alive.all(), f"pre-initialized targets died: {alive}"
    # every scan associates a real measurement (label > 0), no misses
    labels = np.asarray(outs.sel_hist_meas)[:, :3, -1]
    assert (labels > 0).all(), labels


def test_make_stream_inputs_matches_manual_timebase():
    """Tracker.make_stream_inputs builds scan_many inputs with the
    correct tracker.t0-relative times (and pads/masks correctly)."""
    from types import SimpleNamespace
    from pymht_tpu.core.tracker import Tracker

    shapes = TrackerShapes(max_targets=4, max_leaves=4, max_meas=4,
                           max_ais=2, window=4, max_prelim=4,
                           max_initiators=4)
    params = TrackerParams(radar_period=2.0, P_d=0.9)
    tracker = Tracker(shapes, params, use_ais=True)
    tracker.pre_initialize(48.0, [np.zeros(4, np.float32)])
    scans = [SimpleNamespace(time=50.0 + 2.0 * k,
                             measurements=np.full((k + 1, 2), k,
                                                  np.float32))
             for k in range(3)]
    msgs = [[SimpleNamespace(state=np.ones(4, np.float32),
                             time=49.5 + 2.0 * k, mmsi=7,
                             highAccuracy=True)] for k in range(3)]
    sc, ab = tracker.make_stream_inputs(scans, msgs)
    np.testing.assert_allclose(np.asarray(sc.time),
                               [50.0 - tracker.t0, 52.0 - tracker.t0,
                                54.0 - tracker.t0])
    assert np.asarray(sc.mask).sum(axis=1).tolist() == [1, 2, 3]
    np.testing.assert_allclose(np.asarray(ab.time)[:, 0],
                               [49.5 - tracker.t0, 51.5 - tracker.t0,
                                53.5 - tracker.t0])
    assert np.asarray(ab.mask)[:, 0].all()
    assert int(np.asarray(ab.mmsi)[0, 0]) == 7


def test_mid_stream_empty_scan_coast_and_reacquire():
    """A dropout scan (zero measurements) mid-run must not kill healthy
    tracks: they coast on zero-hypotheses and re-acquire on the next
    scan (reference zero-hypothesis guarantee, pyTarget.py:319-328)."""
    import numpy as np
    from pymht_tpu import Tracker, TrackerShapes, TrackerParams

    shapes = TrackerShapes(max_targets=8, max_leaves=16, max_meas=16,
                           max_ais=2, window=6, max_prelim=8,
                           max_initiators=16)
    params = TrackerParams(radar_period=2.5, P_d=0.9, lambda_phi=1e-7,
                           lambda_nu=1e-6, N=4, radar_range=1000.0)
    tracker = Tracker(shapes, params, use_ais=False)
    x0 = np.array([[0.0, 0.0, 2.0, 0.0], [100.0, 50.0, -2.0, 1.0]])
    tracker.pre_initialize(0.0, list(x0))
    rng = np.random.default_rng(3)
    for k in range(6):
        t = 2.5 * (k + 1)
        if k == 2:
            z = np.zeros((0, 2), np.float32)      # dropout scan
        else:
            z = x0[:, :2] + x0[:, 2:] * t + rng.normal(0, 1.0, (2, 2))
        tracker.add_measurement_list(t, z)
    ids, states = tracker.get_track_states()
    assert len(ids) == 2, f"track lost across dropout: {ids}"
    for i, s in enumerate(states[np.argsort(ids)]):
        expect = x0[i, :2] + x0[i, 2:] * 15.0
        assert np.linalg.norm(s[:2] - expect) < 10.0, (i, s, expect)


def test_zero_clutter_density_stays_finite():
    """lambda_phi = lambda_nu = 0 must not produce NaN/inf scores (the
    reference has a latent NameError in its nllr at lambda_ex=0,
    kalman.py:17 — ours must degrade gracefully via the density
    floor)."""
    import numpy as np
    from pymht_tpu import Tracker, TrackerShapes, TrackerParams

    shapes = TrackerShapes(max_targets=4, max_leaves=8, max_meas=8,
                           max_ais=2, window=5, max_prelim=4,
                           max_initiators=8)
    params = TrackerParams(radar_period=2.5, P_d=0.9, lambda_phi=0.0,
                           lambda_nu=0.0, N=3, radar_range=1000.0)
    tracker = Tracker(shapes, params, use_ais=False)
    tracker.pre_initialize(0.0, [np.array([0.0, 0.0, 1.0, 0.0])])
    rng = np.random.default_rng(0)
    for k in range(4):
        t = 2.5 * (k + 1)
        z = np.array([[t, 0.0]]) + rng.normal(0, 1.0, (1, 2))
        out = tracker.add_measurement_list(t, z)
        assert np.isfinite(float(out.sel_obj)), out.sel_obj
    ids, states = tracker.get_track_states()
    assert len(ids) == 1
    assert np.all(np.isfinite(states))
    cn = np.asarray(tracker.state.leaf_cnllr)
    ok = np.asarray(tracker.state.leaf_mask)
    assert np.all(np.isfinite(cn[ok]))


def test_stream_matches_stepped_tracker():
    """Tracker.stream (chunked scan_many + archive absorption) must
    produce the same tracks/archives as per-scan add_measurement_list
    (round-5 streaming supervision API)."""
    import numpy as np
    from pymht_tpu.core.config import TrackerShapes, TrackerParams
    from pymht_tpu.core.tracker import Tracker
    from pymht_tpu.utils import simulator as sim

    period = 2.5
    shapes = TrackerShapes(max_targets=8, max_leaves=16, max_meas=16,
                           max_ais=2, window=6, max_prelim=8,
                           max_initiators=16)
    params = TrackerParams(radar_period=period, P_d=0.9, lambda_phi=1e-7,
                           lambda_nu=1e-6, radar_range=600.0)
    rng = np.random.default_rng(11)
    targets = sim.generate_initial_targets(rng, 3, (0., 0.), 300.0,
                                           0.9, 0.1)
    sim_list = sim.simulate_targets(rng, targets, sim_time=10 * period,
                                    dt=period)
    scans = sim.simulate_scans(rng, sim_list, period, sigma_R=1.5,
                               lambda_phi=1e-7, radar_range=600.0,
                               p0=(0., 0.), lambda_local=0.05)

    t1 = Tracker(shapes, params, method='lagrangian', use_ais=False)
    for s in scans:
        t1.add_measurement_list(s.time, s.measurements)

    t2 = Tracker(shapes, params, method='lagrangian', use_ais=False)
    outs = t2.stream(scans, chunk=3)
    assert len(outs) == (len(scans) + 2) // 3
    assert len(t2.scan_times) == len(scans)

    tr1, tr2 = t1.get_tracks(), t2.get_tracks()
    assert set(tr1) == set(tr2), (sorted(tr1), sorted(tr2))
    for tid in tr1:
        a, b = tr1[tid], tr2[tid]
        assert a['confirmed_times'] == b['confirmed_times'], tid
        np.testing.assert_allclose(
            np.array(a['confirmed_states'], np.float32),
            np.array(b['confirmed_states'], np.float32),
            atol=1e-5, err_msg=str(tid))
        assert a['confirmed_meas'] == b['confirmed_meas'], tid
        assert a['window_meas'] == b['window_meas'], tid
    # terminated archives agree too
    assert set(t1.terminated) == set(t2.terminated)
