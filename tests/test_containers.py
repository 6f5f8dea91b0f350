"""Host-side parity helpers: Position/Velocity containers, helpers,
print/plot methods."""
import numpy as np

from pymht_tpu.utils.containers import Position, Velocity
from pymht_tpu.utils.helpers import binomial, backtrack_measurement_numbers


def test_position_arithmetic():
    p = Position(3.0, 4.0)
    assert p.x == 3.0 and p.y == 4.0
    assert p.norm() == 5.0
    q = p + Position(1, 1)
    assert q == Position(4, 5)
    assert (q - p) == Position(1, 1)
    assert (2 * p) == Position(6, 8)
    assert p.distance_to((0, 0)) == 5.0
    assert p.in_range_of((0, 0), 5.0)
    assert not p.in_range_of((0, 0), 4.9)
    assert Position([1, 2]) == Position(1, 2)


def test_velocity():
    v = Velocity(3.0, 4.0)
    assert v.speed() == 5.0
    assert abs(Velocity(1, 0).heading_deg() - 90.0) < 1e-9
    assert abs(Velocity(0, 1).heading_deg() - 0.0) < 1e-9


def test_binomial():
    assert binomial(5, 2) == 10
    assert binomial(5, 0) == 1
    assert binomial(5, -1) == 0


def _tiny_tracker():
    from pymht_tpu.core.config import TrackerShapes, TrackerParams
    from pymht_tpu.core.tracker import Tracker
    shapes = TrackerShapes(max_targets=4, max_leaves=8, max_meas=8,
                           max_ais=2, window=4, max_prelim=4,
                           max_initiators=8)
    params = TrackerParams(radar_period=1.0, P_d=0.9, lambda_phi=1e-6,
                           lambda_nu=1e-5, radar_range=500.0)
    tr = Tracker(shapes, params, method='lagrangian', use_ais=False)
    tr.pre_initialize(0.0, [[0.0, 0.0, 2.0, 0.0]])
    rng = np.random.default_rng(0)
    for k in range(5):
        t = float(k + 1)
        tr.add_measurement_list(t, np.array([[2.0 * t, 0.0]])
                                + rng.normal(0, 0.5, (1, 2)))
    return tr


def test_backtrack_measurement_numbers():
    tr = _tiny_tracker()
    seqs = backtrack_measurement_numbers(tr)
    assert seqs
    tid, (times, labels) = next(iter(seqs.items()))
    assert len(times) == len(labels)
    assert all(lab >= 0 for lab in labels)


def test_print_methods(capsys):
    tr = _tiny_tracker()
    tr.print_target_list()
    tr.print_cluster_list()
    out = capsys.readouterr().out
    assert "Target list" in out and "Cluster list" in out


def test_plot_hypotheses_smoke(tmp_path):
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    from pymht_tpu.utils.plotting import plot_hypotheses
    tr = _tiny_tracker()
    fig, ax = plt.subplots()
    plot_hypotheses(ax, tr)
    fig.savefig(tmp_path / "hyp.png")
    plt.close(fig)
