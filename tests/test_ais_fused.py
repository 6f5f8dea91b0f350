"""Scalar-plane AIS fusion (ops.ais_fused) vs the einsum parity oracle.

The production AIS candidate path is the fusion-friendly plane
formulation; grow keeps the original einsum chains as
``_ais_candidates_einsum``.  Both implement the same math
(reference tracker.py:417-552), so on shared random forests every
output — gates, compression choice, scores, and the selected-candidate
Kalman ingredients — must agree to fp32 reassociation tolerance.
"""
import numpy as np
import jax.numpy as jnp

from pymht_tpu.core.config import TrackerShapes, TrackerParams
from pymht_tpu.core.grow import (Scan, AisBatch, _ais_candidates,
                                 _ais_candidates_einsum)
from pymht_tpu.core.state import empty_state, insert_targets
from pymht_tpu.models import pv


def _setup(seed=0, T=6, L=4, M=24, A=5, with_mmsi=True):
    shapes = TrackerShapes(max_targets=T, max_leaves=L, max_meas=M,
                           max_ais=A, window=4, max_prelim=8,
                           max_initiators=M, ais_per_leaf=2)
    params = TrackerParams(radar_period=2.5, P_d=0.9, lambda_phi=2e-6,
                           lambda_nu=1e-5, N=3, radar_range=500.0)
    rng = np.random.default_rng(seed)
    xs = np.zeros((T, 4), np.float32)
    xs[:, :2] = rng.uniform(-200, 200, (T, 2))
    xs[:, 2:] = rng.normal(0, 4, (T, 2))
    st = empty_state(shapes, params)
    st = insert_targets(st, jnp.asarray(xs),
                        jnp.broadcast_to(jnp.asarray(np.asarray(pv.P0)),
                                         (T, 4, 4)),
                        jnp.ones((T,), bool), jnp.zeros((T,), jnp.int32),
                        jnp.asarray(0.0), params)
    # densify leaves with perturbed copies of the root
    lx = np.repeat(np.asarray(st.leaf_x)[:, :1], L, axis=1)
    lx += rng.normal(0, 1.5, lx.shape).astype(np.float32)
    lP = np.repeat(np.asarray(st.leaf_P)[:, :1], L, axis=1)
    lP += np.eye(4, dtype=np.float32) * rng.uniform(0, .5, (T, L, 1, 1))
    st = st.replace(
        leaf_x=jnp.asarray(lx), leaf_P=jnp.asarray(lP),
        leaf_mask=jnp.asarray(rng.random((T, L)) < 0.9),
        leaf_cnllr=jnp.asarray(rng.normal(0, 1, (T, L)).astype(np.float32)),
    )
    z = rng.uniform(-220, 220, (M, 2)).astype(np.float32)
    # put some measurements near targets so stage-2 gates fire
    z[:T] = xs[:, :2] + 2.5 * xs[:, 2:] + rng.normal(0, 2, (T, 2))
    scan = Scan(z=jnp.asarray(z), mask=jnp.asarray(rng.random(M) < 0.95),
                time=jnp.asarray(2.5, jnp.float32))
    ast = np.zeros((A, 4), np.float32)
    ast[:, :2] = xs[:A, :2] + rng.normal(0, 1.0, (A, 2))
    ast[:, 2:] = xs[:A, 2:] + rng.normal(0, .5, (A, 2))
    ais = AisBatch(
        state=jnp.asarray(ast),
        time=jnp.asarray(rng.uniform(0.3, 2.2, A).astype(np.float32)),
        mmsi=jnp.asarray((100000000 + np.arange(A)).astype(np.int32)
                         * (1 if with_mmsi else 0)),
        high_accuracy=jnp.asarray(rng.random(A) < 0.5),
        mask=jnp.asarray(rng.random(A) < 0.9),
    )
    return shapes, params, st, scan, ais


def _compare(seed):
    shapes, params, st, scan, ais = _setup(seed)
    G = shapes.ais_fuse_width
    a = _ais_candidates(st, scan, ais, params, G=G)
    b = _ais_candidates_einsum(st, scan, ais, params, G=G)
    names = ["g_ok", "gate2", "pure_gate", "nllr1g", "fused_score",
             "x_bar2", "z_hat2", "K2", "P_hat2", "ais_idx"]
    ga, gb = np.asarray(a[0]), np.asarray(b[0])
    np.testing.assert_array_equal(ga, gb, err_msg="g_ok")
    # compression choice must agree wherever a message was selected
    ia, ib = np.asarray(a[9]), np.asarray(b[9])
    np.testing.assert_array_equal(ia[ga], ib[gb], err_msg="ais_idx")
    for k, name in enumerate(names):
        if name in ("g_ok", "ais_idx"):
            continue
        va, vb = np.asarray(a[k]), np.asarray(b[k])
        if va.dtype == bool:
            np.testing.assert_array_equal(va & ga[..., None] if
                                          va.ndim == ga.ndim + 1 else
                                          va & ga,
                                          vb & gb[..., None] if
                                          vb.ndim == gb.ndim + 1 else
                                          vb & gb, err_msg=name)
            continue
        # compare only where the message is selected/gated (unselected
        # slots carry arbitrary ingredients in both implementations)
        sel = ga
        while sel.ndim < va.ndim:
            sel = sel[..., None]
        sel = np.broadcast_to(sel, va.shape)
        fa, fb = va[sel], vb[sel]
        fin = np.isfinite(fa) & np.isfinite(fb)
        np.testing.assert_allclose(fa[fin], fb[fin], rtol=2e-3, atol=2e-3,
                                   err_msg=name)


def test_plane_vs_einsum_parity_multi_seed():
    for seed in range(6):
        _compare(seed)


def test_plane_path_no_messages():
    shapes, params, st, scan, ais = _setup(1)
    ais = ais._replace(mask=jnp.zeros_like(ais.mask))
    G = shapes.ais_fuse_width
    out = _ais_candidates(st, scan, ais, params, G=G)
    assert not bool(np.asarray(out[0]).any())
    assert not bool(np.asarray(out[1]).any())
    assert not bool(np.asarray(out[2]).any())


def test_radar_plane_vs_einsum_parity():
    from pymht_tpu.core.grow import _radar_candidates_einsum
    from pymht_tpu.ops.ais_fused import radar_candidates_planes

    for seed in range(4):
        shapes, params, st, scan, ais = _setup(seed)
        A_mat = pv.Phi(scan.time - st.time)
        Q_mat = pv.Q(scan.time - st.time)
        C = pv.C_RADAR
        R = pv.R_RADAR()
        (x_bar_e, P_bar_e, _zh, _S, K_e, P_hat_e,
         _zt, _nis, gate_e, nllr_e) = _radar_candidates_einsum(
            st, scan, params, A_mat, Q_mat, C, R)
        (x_bar_p, P_bar_p, K_p, P_hat_p, gate_p,
         nllr_p) = radar_candidates_planes(st, scan, params)
        np.testing.assert_array_equal(np.asarray(gate_e),
                                      np.asarray(gate_p))
        for a, b, name in ((x_bar_e, x_bar_p, "x_bar"),
                           (P_bar_e, P_bar_p, "P_bar"),
                           (K_e, K_p, "K"), (P_hat_e, P_hat_p, "P_hat")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-4, err_msg=name)
        ge = np.asarray(gate_e)
        np.testing.assert_allclose(np.asarray(nllr_e)[ge],
                                   np.asarray(nllr_p)[ge],
                                   rtol=2e-3, atol=2e-3)


def test_prefilter_matches_exact_sweep():
    """The bound-prefilter stage-1 path (ais_prefilter_width > 0) must
    select the same compressed messages and scores as the exact full-A
    sweep on a realistic dense scene: the |z|^2/trace(S) bound only
    excludes provably-ungated pairs, and Gp=8 leaves room for every
    plausibly-gated message here."""
    import numpy as np
    import jax
    from pymht_tpu.core.config import TrackerShapes, TrackerParams
    from pymht_tpu.core.tracker import Tracker
    from pymht_tpu.core.grow import grow
    from pymht_tpu.utils import simulator as sim

    period = 2.5
    rr = 6000.0
    mk = lambda pf: TrackerShapes(
        max_targets=128, max_leaves=8, max_meas=256, max_ais=64,
        window=5, max_prelim=16, max_initiators=64, ais_per_leaf=2,
        ais_prefilter_width=pf)
    params = TrackerParams(radar_period=period, P_d=0.9,
                           lambda_phi=1.5e-6, lambda_nu=1e-6, N=3,
                           radar_range=rr)
    rng = np.random.default_rng(5)
    targets = sim.generate_initial_targets(
        rng, 100, (0.0, 0.0), rr * 0.7, 0.9, 0.1,
        assign_mmsi=True, P_r=0.8)
    sim_list = sim.simulate_targets(rng, targets, sim_time=2 * period,
                                    dt=period)
    scans = sim.simulate_scans(rng, sim_list, period, sigma_R=2.5,
                               lambda_phi=1.5e-6, radar_range=rr,
                               p0=(0.0, 0.0), lambda_local=0.3)
    ais_groups = sim.simulate_ais(rng, sim_list, period,
                                  init_time=sim_list[0][0].time)
    F_inv = np.eye(4)
    F_inv[0, 2] = F_inv[1, 3] = -period

    from pymht_tpu.core.grow import _ais_candidates
    shapes = mk(0)
    tr = Tracker(shapes, params, use_ais=True)
    tr.pre_initialize(scans[0].time - period,
                      [F_inv @ t.state for t in targets],
                      mmsi=[t.mmsi for t in targets])
    # this seed emits one AIS batch at t=2.0, which belongs to the
    # scan at t=2.5 (messages in (t-period, t]) — scans here start at 0
    scan_b, ais_b = tr.make_stream_inputs(scans[:2], [[], ais_groups[0]])
    per = lambda tree, i: jax.tree_util.tree_map(lambda x: x[i], tree)
    # advance one scan so the state is realistic, then compare the AIS
    # candidate stage directly on the second scan (which carries the
    # bulk of the AIS traffic in this seed)
    g0 = jax.jit(lambda st, sc, ab: grow(st, sc, ab, shapes, params))(
        tr.state, per(scan_b, 0), per(ais_b, 0))
    st1 = g0.state
    sc1, ab1 = per(scan_b, 1), per(ais_b, 1)
    G = shapes.ais_fuse_width
    run = jax.jit(lambda st, pf: _ais_candidates(
        st, sc1, ab1, params, G=G, prefilter=pf),
        static_argnames=('pf',))
    exact = run(st1, pf=0)
    fast = run(st1, pf=8)
    names = ('g_ok', 'gate2', 'pure_gate', 'nllr1g', 'fused_score',
             'x_bar2', 'z_hat2', 'K2', 'P_hat2', 'ais_idx')
    g_ok = np.asarray(exact[0])
    assert g_ok.any(), "scene produced no stage-1-gated AIS candidates"
    for name, a, b in zip(names, exact, fast):
        a, b = np.asarray(a), np.asarray(b)
        if name == 'ais_idx':
            # only meaningful where a candidate survives
            np.testing.assert_array_equal(a[g_ok], b[g_ok], err_msg=name)
        elif a.dtype == bool:
            np.testing.assert_array_equal(a, b, err_msg=name)
        else:
            # score/ingredient planes only matter on surviving slots
            mask = g_ok if a.shape[:3] == g_ok.shape else g_ok
            np.testing.assert_allclose(
                np.where(mask.reshape(mask.shape + (1,) * (a.ndim - 3)),
                         a, 0.0),
                np.where(mask.reshape(mask.shape + (1,) * (b.ndim - 3)),
                         b, 0.0),
                rtol=1e-5, atol=1e-5, err_msg=name)
