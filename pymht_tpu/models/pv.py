"""2D constant-velocity (PV) state-space model.

State x = [east, north, v_east, v_north].

Behavioural contract matches the reference PV model
(/root/reference/pymht/models/pv.py:7-34): position-only radar observation,
white-acceleration-style process noise kernel scaled linearly by ``sigmaQ``
(the reference's exact formula, pv.py:17-23, including its T^3/3 off-diagonal
convention), and CV transition matrix.  All matrices are jnp float32 and
usable inside jit.
"""
import jax.numpy as jnp

from .constants import (
    default_dtype,
    N_STATE,
    sigmaQ_tracker,
    sigmaR_RADAR_tracker,
)

# Radar observation matrix (a.k.a. H): observes position only.
C_RADAR = jnp.array([[1.0, 0.0, 0.0, 0.0],
                     [0.0, 1.0, 0.0, 0.0]], dtype=default_dtype)
H_radar = C_RADAR

# Initial state covariance: position var p, velocity var 0.3 p
# (reference pv.py:12-13).
_p = 2.5 ** 2
P0 = jnp.diag(jnp.array([_p, _p, 0.3 * _p, 0.3 * _p], dtype=default_dtype))

GPS_COVARIANCE_PRECISE = P0 * 0.5


def Q(T, sigmaQ=sigmaQ_tracker):
    """Process-noise covariance for time step T (reference pv.py:17-23)."""
    T = jnp.asarray(T, dtype=default_dtype)
    T2 = T * T
    T3 = T2 * T / 3.0
    T4 = T2 * T2 / 4.0
    z = jnp.zeros_like(T)
    return jnp.stack([
        jnp.stack([T4, z, T3, z], axis=-1),
        jnp.stack([z, T4, z, T3], axis=-1),
        jnp.stack([T3, z, T2, z], axis=-1),
        jnp.stack([z, T3, z, T2], axis=-1),
    ], axis=-2).astype(default_dtype) * sigmaQ


def R_RADAR(sigmaR=sigmaR_RADAR_tracker):
    """Radar measurement-noise covariance (reference pv.py:26-27)."""
    return (jnp.eye(2, dtype=default_dtype) * (sigmaR ** 2)).astype(default_dtype)


def Phi(T):
    """Constant-velocity transition matrix (reference pv.py:29-34).

    Supports scalar or batched T: for T of shape (...,) returns (..., 4, 4).
    """
    T = jnp.asarray(T, dtype=default_dtype)
    eye = jnp.eye(N_STATE, dtype=default_dtype)
    out = jnp.broadcast_to(eye, T.shape + (N_STATE, N_STATE)).copy()
    out = out.at[..., 0, 2].set(T)
    out = out.at[..., 1, 3].set(T)
    return out
