"""Simulator determinism contract (mirrors the reference
tests/test_simulator.py: identical seeds => identical scenarios)."""
import numpy as np

from pymht_tpu.utils import simulator as sim


def _make(seed):
    rng = np.random.default_rng(seed)
    targets = sim.generate_initial_targets(rng, 10, (100., 200.), 1000.0,
                                           0.9, 0.1, assign_mmsi=True)
    sim_list = sim.simulate_targets(rng, targets, sim_time=10.0, dt=2.5)
    scans = sim.simulate_scans(rng, sim_list, 2.5, sigma_R=2.5,
                               lambda_phi=1e-6, radar_range=1000.0,
                               p0=(100., 200.))
    ais = sim.simulate_ais(rng, sim_list, 2.5, 0.0)
    return targets, sim_list, scans, ais


def test_deterministic_under_seed():
    for _ in range(3):
        t1, s1, sc1, a1 = _make(1337)
        t2, s2, sc2, a2 = _make(1337)
        for x, y in zip(t1, t2):
            np.testing.assert_array_equal(x.state, y.state)
            assert x.mmsi == y.mmsi
        for lx, ly in zip(s1, s2):
            for x, y in zip(lx, ly):
                np.testing.assert_array_equal(x.state, y.state)
        for x, y in zip(sc1, sc2):
            assert x.time == y.time
            np.testing.assert_array_equal(x.measurements, y.measurements)
        assert len(a1) == len(a2)
        for gx, gy in zip(a1, a2):
            for x, y in zip(gx, gy):
                np.testing.assert_array_equal(x.state, y.state)
                assert x.mmsi == y.mmsi


def test_different_seeds_differ():
    _, _, sc1, _ = _make(1)
    _, _, sc2, _ = _make(2)
    assert not all(np.array_equal(x.measurements, y.measurements)
                   for x, y in zip(sc1, sc2))


def test_pd_thinning():
    rng = np.random.default_rng(0)
    targets = sim.generate_initial_targets(rng, 50, (0., 0.), 500.0, 0.5, 0.1)
    sim_list = sim.simulate_targets(rng, targets, sim_time=25.0, dt=2.5)
    scans = sim.simulate_scans(rng, sim_list, 2.5, sigma_R=1.0,
                               lambda_phi=0.0, radar_range=500.0,
                               p0=(0., 0.), local_clutter=False,
                               global_clutter=False)
    counts = [len(s.measurements) for s in scans]
    # with P_d=0.5 roughly half the in-range targets appear
    assert 0.2 * 50 < np.mean(counts) < 0.8 * 50


def test_clutter_rates():
    rng = np.random.default_rng(0)
    targets = sim.generate_initial_targets(rng, 1, (0., 0.), 100.0, 1.0, 0.0)
    sim_list = sim.simulate_targets(rng, targets, sim_time=250.0, dt=2.5)
    lam = 1e-4
    scans = sim.simulate_scans(rng, sim_list, 2.5, sigma_R=1.0,
                               lambda_phi=lam, radar_range=1000.0,
                               p0=(0., 0.), P_d=1.0, local_clutter=False)
    # expected global clutter per scan = lam * pi * R^2 ~ 314
    clutter = np.mean([len(s.measurements) - 1 for s in scans])
    assert 250 < clutter < 380


def test_ais_reporting_intervals():
    assert sim._ais_report_interval(30 * sim.KNOT, 'A') == 2
    assert sim._ais_report_interval(20 * sim.KNOT, 'A') == 4
    assert sim._ais_report_interval(1 * sim.KNOT, 'A') == 6
    assert sim._ais_report_interval(0.0, 'A') == 60
    assert sim._ais_report_interval(30 * sim.KNOT, 'B') == 10
    assert sim._ais_report_interval(1 * sim.KNOT, 'B') == 180


def test_find_center_and_range():
    rng = np.random.default_rng(3)
    targets = sim.generate_initial_targets(rng, 5, (50., -20.), 300.0,
                                           1.0, 0.1)
    sim_list = sim.simulate_targets(rng, targets, sim_time=10.0, dt=2.5)
    p0, r = sim.find_center_and_range(sim_list)
    states = np.array([t.state[:2] for s in sim_list for t in s])
    assert (np.linalg.norm(states - p0, axis=1) <= r * 1.5 + 1e-6).all()
