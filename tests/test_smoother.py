"""RTS smoother tests: consistency with a straight-line truth and
robustness to missed detections."""
import numpy as np
import jax.numpy as jnp

from pymht_tpu.models import pv
from pymht_tpu.ops.smoother import rts_smooth, smooth_tracks


def _track(seed=0, n=30, period=2.5, miss=()):
    rng = np.random.default_rng(seed)
    truth = np.array([0.0, 0.0, 3.0, -1.0])
    F = np.asarray(pv.Phi(period))
    zs, mask, truths = [], [], []
    x = truth.copy()
    for k in range(n):
        x = F @ x
        truths.append(x.copy())
        zs.append(x[:2] + rng.normal(0, 2.5, 2))
        mask.append(k not in miss)
    return (np.array(zs, np.float32), np.array(mask),
            np.array(truths, np.float32))


def test_smoother_beats_raw_measurements():
    zs, mask, truths = _track()
    xs, Ps = rts_smooth(jnp.asarray(truths[0]), pv.P0,
                        jnp.asarray(zs), jnp.asarray(mask), 2.5)
    xs = np.asarray(xs)
    raw_err = np.linalg.norm(zs - truths[:, :2], axis=1).mean()
    smooth_err = np.linalg.norm(xs[:, :2] - truths[:, :2], axis=1).mean()
    assert smooth_err < raw_err, (smooth_err, raw_err)
    # velocities recovered
    assert np.abs(xs[5:, 2:] - truths[5:, 2:]).mean() < 1.0


def test_smoother_handles_missed_detections():
    zs, mask, truths = _track(miss=(5, 6, 12))
    xs, _ = rts_smooth(jnp.asarray(truths[0]), pv.P0,
                       jnp.asarray(zs), jnp.asarray(mask), 2.5)
    xs = np.asarray(xs)
    err = np.linalg.norm(xs[:, :2] - truths[:, :2], axis=1)
    assert err.max() < 10.0
    assert np.isfinite(xs).all()


def test_smooth_tracks_batched():
    zs1, m1, t1 = _track(seed=1)
    zs2, m2, t2 = _track(seed=2, miss=(3,))
    xs, Ps = smooth_tracks(
        jnp.asarray(np.stack([t1[0], t2[0]])),
        jnp.broadcast_to(pv.P0, (2, 4, 4)),
        jnp.asarray(np.stack([zs1, zs2])),
        jnp.asarray(np.stack([m1, m2])), 2.5)
    assert np.asarray(xs).shape == (2, 30, 4)
    assert np.isfinite(np.asarray(xs)).all()


def _numpy_em_oracle(x0, P0, zs, mask, period, n_iter):
    """Host float64 oracle for full-matrix EM, implementing the same
    equations pykalman's em() applies with transition/observation
    matrices pinned (its default em_vars: transition_covariance Q,
    observation_covariance R, initial_state_mean, initial_state_cov;
    Ghahramani & Hinton 1996; reference usage pyTarget.py:598-602).
    Masked steps skip the measurement update and are excluded from the
    R statistic (pykalman masked-array handling)."""
    A = np.asarray(pv.Phi(period), np.float64)
    C = np.asarray(pv.C_RADAR, np.float64)
    Q = np.asarray(pv.Q(period), np.float64)
    R = np.asarray(pv.R_RADAR(), np.float64)
    x0 = np.asarray(x0, np.float64)
    P0 = np.asarray(P0, np.float64)
    N = len(zs)

    def smooth_pass(x0, P0, Q, R):
        xf = np.zeros((N, 4)); Pf = np.zeros((N, 4, 4))
        xp = np.zeros((N, 4)); Pp = np.zeros((N, 4, 4))
        x, P = x0, P0
        for t in range(N):
            xb = A @ x
            Pb = A @ P @ A.T + Q
            xp[t], Pp[t] = xb, Pb
            if mask[t]:
                S = C @ Pb @ C.T + R
                K = Pb @ C.T @ np.linalg.inv(S)
                x = xb + K @ (zs[t] - C @ xb)
                P = Pb - K @ C @ Pb
            else:
                x, P = xb, Pb
            xf[t], Pf[t] = x, P
        xs = np.zeros((N, 4)); Ps = np.zeros((N, 4, 4))
        G = np.zeros((N - 1, 4, 4))
        xs[-1], Ps[-1] = xf[-1], Pf[-1]
        for t in range(N - 2, -1, -1):
            G[t] = Pf[t] @ A.T @ np.linalg.inv(Pp[t + 1])
            xs[t] = xf[t] + G[t] @ (xs[t + 1] - xp[t + 1])
            Ps[t] = Pf[t] + G[t] @ (Ps[t + 1] - Pp[t + 1]) @ G[t].T
        M = np.zeros((N, 4, 4))
        for t in range(N - 1):
            M[t + 1] = Ps[t + 1] @ G[t].T     # Cov(x_{t+1}, x_t)
        return xs, Ps, M

    for _ in range(n_iter):
        xs, Ps, M = smooth_pass(x0, P0, Q, R)
        Qn = np.zeros((4, 4))
        for t in range(N - 1):
            err = xs[t + 1] - A @ xs[t]
            Qn += (np.outer(err, err) + Ps[t + 1]
                   - M[t + 1] @ A.T - A @ M[t + 1].T
                   + A @ Ps[t] @ A.T)
        Q = Qn / (N - 1)
        Q = 0.5 * (Q + Q.T)
        Rn = np.zeros((2, 2))
        n_obs = 0
        for t in range(N):
            if mask[t]:
                v = zs[t] - C @ xs[t]
                Rn += np.outer(v, v) + C @ Ps[t] @ C.T
                n_obs += 1
        R = 0.5 * (Rn / max(n_obs, 1) + (Rn / max(n_obs, 1)).T)
        x0, P0 = xs[0], 0.5 * (Ps[0] + Ps[0].T)
    xs, Ps, _ = smooth_pass(x0, P0, Q, R)
    return xs, Ps


def test_full_em_matches_numpy_oracle():
    """em_mode='full' must reproduce the pykalman-style EM (Q, R, x0,
    P0 refit) to float32 tolerance on a masked track."""
    zs, mask, truths = _track(seed=7, n=20, miss=(4, 11))
    ref_xs, _ = _numpy_em_oracle(truths[0], np.asarray(pv.P0),
                                 zs.astype(np.float64), mask, 2.5,
                                 n_iter=3)
    xs, _ = rts_smooth(jnp.asarray(truths[0]), pv.P0, jnp.asarray(zs),
                       jnp.asarray(mask), 2.5, em_iters=3,
                       em_mode='full')
    np.testing.assert_allclose(np.asarray(xs), ref_xs, rtol=2e-3,
                               atol=2e-2)


def test_full_em_improves_on_misspecified_noise():
    """When the true measurement noise differs from the pv default, the
    full-EM refit must reduce smoothing error vs the fixed-model RTS."""
    rng = np.random.default_rng(17)
    period = 2.5
    F = np.asarray(pv.Phi(period))
    x = np.array([0.0, 0.0, 3.0, -1.0])
    zs, mask, truths = [], [], []
    for k in range(40):
        x = F @ x
        truths.append(x.copy())
        zs.append(x[:2] + rng.normal(0, 8.0, 2))   # sigma 8 vs default 2.5
        mask.append(True)
    zs = np.array(zs, np.float32)
    truths = np.array(truths, np.float32)
    mask = np.array(mask)
    xs0, _ = rts_smooth(jnp.asarray(truths[0]), pv.P0, jnp.asarray(zs),
                        jnp.asarray(mask), period)
    xs1, _ = rts_smooth(jnp.asarray(truths[0]), pv.P0, jnp.asarray(zs),
                        jnp.asarray(mask), period, em_iters=5,
                        em_mode='full')
    e0 = np.linalg.norm(np.asarray(xs0)[:, :2] - truths[:, :2],
                        axis=1).mean()
    e1 = np.linalg.norm(np.asarray(xs1)[:, :2] - truths[:, :2],
                        axis=1).mean()
    assert e1 < e0, (e1, e0)


def test_trailing_padding_does_not_perturb_smoothing():
    """Batched get_smooth_tracks pads tracks with trailing masked steps;
    the smoothed interior must be identical to the unpadded solve (the
    filter coasts, the backward correction through coasted steps is 0)."""
    zs, mask, truths = _track(seed=5, n=24, miss=(3,))
    xs_a, _ = rts_smooth(jnp.asarray(truths[0]), pv.P0, jnp.asarray(zs),
                         jnp.asarray(mask), 2.5)
    pad = 8
    zs_p = np.concatenate([zs, np.zeros((pad, 2), np.float32)])
    mask_p = np.concatenate([mask, np.zeros(pad, bool)])
    xs_b, _ = rts_smooth(jnp.asarray(truths[0]), pv.P0,
                         jnp.asarray(zs_p), jnp.asarray(mask_p), 2.5)
    np.testing.assert_allclose(np.asarray(xs_b)[:24], np.asarray(xs_a),
                               rtol=1e-5, atol=1e-4)


def test_smoother_em_improves_or_holds():
    zs, mask, truths = _track(seed=3)
    xs0, _ = rts_smooth(jnp.asarray(truths[0]), pv.P0,
                        jnp.asarray(zs), jnp.asarray(mask), 2.5)
    xs1, _ = rts_smooth(jnp.asarray(truths[0]), pv.P0,
                        jnp.asarray(zs), jnp.asarray(mask), 2.5, em_iters=3)
    e0 = np.linalg.norm(np.asarray(xs0)[:, :2] - truths[:, :2], axis=1).mean()
    e1 = np.linalg.norm(np.asarray(xs1)[:, :2] - truths[:, :2], axis=1).mean()
    assert e1 < e0 * 1.5  # EM must not blow up
    assert np.isfinite(np.asarray(xs1)).all()
