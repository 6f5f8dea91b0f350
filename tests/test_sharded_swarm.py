"""Swarm-shape multi-chip correctness (round-3 verdict item 2a).

The round-3 sharded-vs-single equality tests ran at toy shapes (T=8);
nothing demonstrated the cluster-sharded step is correct where the
collective volume actually matters.  This test runs the full sharded
pipeline at swarm-scale target count — T=1024 slots over an 8-device
mesh, 600 live targets, AIS fusion + AIS-aided initiation on — and
requires the selected measurement labels, AIS labels and track states
to match the single-device step scan by scan.

M is kept at 512 (vs the bench's 2048) to hold CPU suite time down;
the sharded axis (targets) and the psum'd dual vector (n_slots =
W*(M+A)) are at production scale.
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from pymht_tpu.core.config import TrackerShapes, TrackerParams
from pymht_tpu.core.tracker import Tracker, scan_step
from pymht_tpu.core import initiator as initiator_mod
from pymht_tpu.parallel.sharded_tracker import make_sharded_tracker_step
from pymht_tpu.utils import simulator as sim


def test_sharded_swarm_shape_equality():
    period = 2.5
    radar_range = 12000.0
    n_scans = 3
    shapes = TrackerShapes(
        max_targets=1024, max_leaves=8, max_meas=512, max_ais=32,
        window=5, max_prelim=32, max_initiators=64, ais_per_leaf=2)
    params = TrackerParams(radar_period=period, P_d=0.9,
                           lambda_phi=1.5e-6, lambda_nu=1e-6, N=3,
                           radar_range=radar_range)
    n_tgt = 600
    rng = np.random.default_rng(42)
    targets = sim.generate_initial_targets(
        rng, n_tgt, (0.0, 0.0), radar_range * 0.5, 0.9, 0.1,
        assign_mmsi=True, P_r=0.5)
    sim_list = sim.simulate_targets(rng, targets,
                                    sim_time=n_scans * period, dt=period)
    scans = sim.simulate_scans(rng, sim_list, period, sigma_R=2.5,
                               lambda_phi=1.5e-6, radar_range=radar_range,
                               p0=(0.0, 0.0), lambda_local=0.1)
    ais_groups = sim.simulate_ais(rng, sim_list, period,
                                  init_time=sim_list[0][0].time)

    F_inv = np.eye(4)
    F_inv[0, 2] = F_inv[1, 3] = -period
    seed = [F_inv @ t.state for t in targets]
    mmsi = [t.mmsi for t in targets]

    def build_tracker():
        tr = Tracker(shapes, params, use_ais=True)
        tr.pre_initialize(scans[0].time - period, seed, mmsi=mmsi)
        return tr

    tr = build_tracker()
    scan_b, ais_b = tr.make_stream_inputs(scans[:n_scans],
                                          ais_groups[:n_scans])
    per_scan = lambda tree, i: jax.tree_util.tree_map(
        lambda x: x[i], tree)

    # single device
    st1 = tr.state
    ist1 = tr.init_state
    labels1, states1, ais1, objs1 = [], [], [], []
    for i in range(n_scans):
        st1, ist1, out = scan_step(
            st1, ist1, per_scan(scan_b, i), per_scan(ais_b, i),
            shapes, params, method='lagrangian', use_ais=True)
        labels1.append(np.asarray(out.sel_hist_meas)[:n_tgt, -1])
        states1.append(np.asarray(out.track_x)[:n_tgt])
        objs1.append(float(out.sel_obj))
        ais1.append(np.asarray(st1.hist_ais)[
            np.arange(shapes.max_targets), np.asarray(st1.sel_leaf),
            -1][:n_tgt])

    # 8-way target-sharded
    mesh = Mesh(np.array(jax.devices()[:8]), ('cluster',))
    step = make_sharded_tracker_step(mesh, shapes, params, use_ais=True)
    tr2 = build_tracker()
    st2, ist2 = tr2.state, tr2.init_state
    labels2, states2, ais2, objs2, feas2 = [], [], [], [], []
    for i in range(n_scans):
        st2, ist2, out = step(st2, ist2, per_scan(scan_b, i),
                              per_scan(ais_b, i))
        labels2.append(np.asarray(out['sel_hist_meas'])[:n_tgt, -1])
        states2.append(np.asarray(out['track_x'])[:n_tgt])
        objs2.append(float(out['sel_obj']))
        feas2.append(bool(out['sel_feasible']))
        ais2.append(np.asarray(st2.hist_ais)[
            np.arange(shapes.max_targets), np.asarray(st2.sel_leaf),
            -1][:n_tgt])

    # psum tree order != single-device reduction order, so the duals
    # differ in the last float bits and near-tied leaves can resolve
    # differently; the contract at this scale is: feasible, same
    # objective to float tolerance, and >=99.5% identical decisions
    # with matching states where decisions match.
    fused_any = False
    for k in range(n_scans):
        assert feas2[k], f"scan {k}: sharded selection infeasible"
        assert abs(objs1[k] - objs2[k]) <= 1e-3 * (1 + abs(objs1[k])), \
            f"scan {k}: obj {objs1[k]} vs {objs2[k]}"
        same = labels1[k] == labels2[k]
        frac = same.mean()
        assert frac >= 0.995, \
            f"scan {k}: only {frac:.4f} of labels agree"
        np.testing.assert_array_equal(
            ais1[k][same], ais2[k][same], err_msg=f"scan {k} ais labels")
        np.testing.assert_allclose(states1[k][same], states2[k][same],
                                   atol=1e-3, err_msg=f"scan {k} states")
        fused_any |= bool((ais1[k] > 0).any())
    assert fused_any, "swarm scenario never exercised AIS fusion"
