"""AIS (ship transponder) observation model.

Contract matches the reference (/root/reference/pymht/models/ais.py:4-20):
AIS observes the full 4D state; measurement noise depends on the
high/low-accuracy flag; transition is the same CV model.
"""
import jax.numpy as jnp

from .constants import default_dtype, N_OBS_AIS, N_STATE
from .pv import Phi  # noqa: F401  (same CV transition, re-exported)

C = jnp.eye(N_OBS_AIS, N_STATE, dtype=default_dtype)

sigmaR_AIS_true_highAccuracy = 1.0
sigmaR_AIS_true_lowAccuracy = 3.0


def R(highAccuracy):
    """AIS measurement covariance, selected by accuracy flag (ais.py:9-13).

    Accepts a python bool or a traced boolean array (branchless select).
    """
    hi = jnp.eye(N_OBS_AIS, dtype=default_dtype) * sigmaR_AIS_true_highAccuracy ** 2
    lo = jnp.eye(N_OBS_AIS, dtype=default_dtype) * sigmaR_AIS_true_lowAccuracy ** 2
    return jnp.where(jnp.asarray(highAccuracy), hi, lo)
