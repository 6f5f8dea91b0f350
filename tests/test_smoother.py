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
