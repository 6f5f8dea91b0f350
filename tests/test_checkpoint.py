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


def _stream_scene(shapes, params, n_scans=6, seed=3):
    rng = np.random.default_rng(seed)
    targets = sim.generate_initial_targets(rng, 3, (0., 0.), 300.0,
                                           0.9, 0.1)
    sim_list = sim.simulate_targets(rng, targets,
                                    sim_time=n_scans * 2.5, dt=2.5)
    scans = sim.simulate_scans(rng, sim_list, 2.5, sigma_R=2.0,
                               lambda_phi=2e-5, radar_range=500.0,
                               p0=(0., 0.))
    F_inv = np.eye(4)
    F_inv[0, 2] = F_inv[1, 3] = -2.5
    tr = Tracker(shapes, params, use_ais=False)
    tr.pre_initialize(scans[0].time - 2.5,
                      [F_inv @ t.state for t in targets])
    scan_b, ais_b = tr.make_stream_inputs(scans[:n_scans])
    return tr, scan_b, ais_b


def test_streaming_checkpoint_resume_bitwise(tmp_path):
    """Round-3 verdict item 7: snapshot/restore of the device-resident
    streaming mode.  Running scan_many over the first half, saving the
    bare (TrackerState, InitiatorState), restoring, and streaming the
    second half must be BITWISE equal to the uninterrupted run."""
    import jax
    from pymht_tpu.core.tracker import scan_many

    shapes = TrackerShapes(max_targets=8, max_leaves=8, max_meas=16,
                           max_ais=2, window=6, max_prelim=8,
                           max_initiators=16)
    params = TrackerParams(radar_period=2.5, P_d=0.9, lambda_phi=2e-5,
                           lambda_nu=1e-6, radar_range=500.0, N=3)
    tr, scan_b, ais_b = _stream_scene(shapes, params)
    part = lambda tree, lo, hi: jax.tree_util.tree_map(
        lambda x: x[lo:hi], tree)
    run = jax.jit(lambda st, ist, sc, a: scan_many(
        st, ist, sc, a, shapes, params, method='lagrangian',
        use_ais=False), static_argnames=())

    # uninterrupted: two half dispatches (same program as the resumed
    # run — half-vs-full dispatch equality is covered separately below)
    st, ist = tr.state, tr.init_state
    st1, ist1, _ = run(st, ist, part(scan_b, 0, 3), part(ais_b, 0, 3))
    st_a, ist_a, outs_a = run(st1, ist1, part(scan_b, 3, 6),
                              part(ais_b, 3, 6))

    # checkpointed: save after the first dispatch, restore, continue
    from pymht_tpu.utils import checkpoint as ck
    ckpt = str(tmp_path / "stream_ck")
    ck.save_state(ckpt, st1, ist1)
    st_r, ist_r = ck.load_state(ckpt)
    st_b, ist_b, outs_b = run(st_r, ist_r, part(scan_b, 3, 6),
                              part(ais_b, 3, 6))

    for a, b in zip(jax.tree_util.tree_leaves((st_a, ist_a, outs_a)),
                    jax.tree_util.tree_leaves((st_b, ist_b, outs_b))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # and the split run must agree with the single full dispatch
    st_f, ist_f, _ = run(tr.state, tr.init_state, scan_b, ais_b)
    for a, b in zip(jax.tree_util.tree_leaves((st_a, ist_a)),
                    jax.tree_util.tree_leaves((st_f, ist_f))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_checkpoint_resume(tmp_path):
    """Sharded-state snapshot: save gathers the target-sharded state to
    host; load re-places it on the mesh; the continued sharded run must
    match the uninterrupted sharded run bitwise."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from pymht_tpu.parallel.sharded_tracker import make_sharded_tracker_step
    from pymht_tpu.utils import checkpoint as ck

    shapes = TrackerShapes(max_targets=8, max_leaves=8, max_meas=16,
                           max_ais=2, window=6, max_prelim=8,
                           max_initiators=16)
    params = TrackerParams(radar_period=2.5, P_d=0.9, lambda_phi=2e-5,
                           lambda_nu=1e-6, radar_range=500.0, N=3)
    tr, scan_b, ais_b = _stream_scene(shapes, params)
    per = lambda tree, i: jax.tree_util.tree_map(lambda x: x[i], tree)

    mesh = Mesh(np.array(jax.devices()[:4]), ('cluster',))
    step = make_sharded_tracker_step(mesh, shapes, params)

    st, ist = tr.state, tr.init_state
    for i in range(2):
        st, ist, _ = step(st, ist, per(scan_b, i), per(ais_b, i))
    ckpt = str(tmp_path / "shard_ck")
    ck.save_state(ckpt, st, ist)

    # uninterrupted continuation
    st_a, ist_a = st, ist
    for i in range(2, 4):
        st_a, ist_a, _ = step(st_a, ist_a, per(scan_b, i), per(ais_b, i))

    # restored continuation, re-placed on the mesh
    T_g = shapes.max_targets
    sspec = jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, P('cluster')
                                if (x.ndim >= 1 and x.shape[0] == T_g)
                                else P()), st)
    ispec = jax.tree_util.tree_map(lambda x: NamedSharding(mesh, P()), ist)
    st_r, ist_r = ck.load_state(ckpt, shardings=(sspec, ispec))
    st_b, ist_b = st_r, ist_r
    for i in range(2, 4):
        st_b, ist_b, _ = step(st_b, ist_b, per(scan_b, i), per(ais_b, i))

    for a, b in zip(jax.tree_util.tree_leaves((st_a, ist_a)),
                    jax.tree_util.tree_leaves((st_b, ist_b))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
