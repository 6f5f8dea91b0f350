"""Batched fixed-interval RTS smoothing with EM refinement.

Replaces the reference's pykalman dependency
(/root/reference/pymht/pyTarget.py:580-609: KalmanFilter(...).em(
measurements, n_iter=5).smooth(...)) with a lax.scan forward filter +
backward RTS pass, batched over tracks via vmap.  Missing measurements
(missed detections) are masked, exactly like pykalman's masked arrays.
EM refits the process/measurement noise scales for a few iterations.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models import pv
from . import kalman as k


def _forward(xs0, P0, zs, mask, A, Q, C, R):
    """Masked Kalman filter over time. zs: [N, 2], mask: [N]."""
    def step(carry, inp):
        x, P = carry
        z, m = inp
        x_bar, P_bar = k.predict(A, Q, x, P)
        z_hat, S, S_inv, K, P_hat = k.precalc(C, R, x_bar, P_bar)
        x_upd = x_bar + K @ (z - z_hat)
        x_new = jnp.where(m, x_upd, x_bar)
        P_new = jnp.where(m, P_hat, P_bar)
        return (x_new, P_new), (x_new, P_new, x_bar, P_bar)

    (_, _), (xf, Pf, xp, Pp) = jax.lax.scan(step, (xs0, P0), (zs, mask))
    return xf, Pf, xp, Pp


def rts_smooth(x0, P0, zs, mask, radar_period, em_iters: int = 0,
               sigma_q: float = None, sigma_r: float = None):
    """Smooth one track. zs: [N, 2] measurements (garbage where ~mask).

    Returns (xs [N, 4], Ps [N, 4, 4]) smoothed states/covariances.
    With em_iters > 0, alternates smoothing with scalar noise-scale
    refits (a lightweight version of pykalman's EM).
    """
    A = pv.Phi(radar_period)
    C = pv.C_RADAR
    q = jnp.asarray(1.0 if sigma_q is None else sigma_q, jnp.float32)
    r = jnp.asarray(1.0 if sigma_r is None else sigma_r, jnp.float32)

    def smooth_once(q, r):
        Q = pv.Q(radar_period) * q
        R = pv.R_RADAR() * r
        xf, Pf, xp, Pp = _forward(x0, P0, zs, mask, A, Q, C, R)

        def back(carry, inp):
            x_next, P_next = carry
            xf_t, Pf_t, xp_t1, Pp_t1 = inp
            # G = Pf A^T Pp^{-1}
            G = Pf_t @ A.T @ k.inv_psd(Pp_t1)
            x_s = xf_t + G @ (x_next - xp_t1)
            P_s = Pf_t + G @ (P_next - Pp_t1) @ G.T
            return (x_s, P_s), (x_s, P_s)

        # inputs at t use prediction into t+1: shift xp/Pp left
        xp1 = jnp.concatenate([xp[1:], xp[-1:]], axis=0)
        Pp1 = jnp.concatenate([Pp[1:], Pp[-1:]], axis=0)
        (_, _), (xs, Ps) = jax.lax.scan(
            back, (xf[-1], Pf[-1]),
            (xf[:-1], Pf[:-1], xp1[:-1], Pp1[:-1]), reverse=True)
        xs = jnp.concatenate([xs, xf[-1:]], axis=0)
        Ps = jnp.concatenate([Ps, Pf[-1:]], axis=0)
        return xs, Ps

    xs, Ps = smooth_once(q, r)
    for _ in range(em_iters):
        # Scalar refit: match innovation magnitudes (lightweight EM).
        resid = jnp.where(mask[:, None], zs - xs[:, :2], 0.0)
        n_obs = jnp.maximum(mask.sum(), 1)
        r = jnp.maximum(jnp.sum(resid ** 2) / (2 * n_obs)
                        / (pv.R_RADAR()[0, 0]), 1e-3)
        step_res = xs[1:] - jnp.einsum('ij,nj->ni', pv.Phi(radar_period),
                                       xs[:-1])
        q = jnp.maximum(jnp.mean(step_res[:, :2] ** 2)
                        / jnp.maximum(pv.Q(radar_period)[0, 0], 1e-6), 1e-3)
        xs, Ps = smooth_once(q, r)
    return xs, Ps


def smooth_tracks(x0s, P0s, zs, masks, radar_period, em_iters: int = 0):
    """vmapped multi-track smoothing: x0s [B,4], zs [B,N,2], masks [B,N]."""
    fn = lambda x0, P0, z, m: rts_smooth(x0, P0, z, m, radar_period,
                                         em_iters=em_iters)
    return jax.vmap(fn)(x0s, P0s, zs, masks)
