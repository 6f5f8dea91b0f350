"""Polar ground-truth simulation model (heading/speed random walk).

Contract matches the reference (/root/reference/pymht/models/polar.py):
same radar observation and CV transition as the PV model, plus
heading/speed random-walk noise parameters used by the polar simulator
targets.
"""
from .constants import default_dtype, sigmaR_RADAR_tracker  # noqa: F401
from .pv import C_RADAR, H_radar, P0, Phi, R_RADAR  # noqa: F401

sigma_hdg = 3.0    # deg/s heading random-walk std-dev (polar.py:14)
sigma_speed = 0.8  # m/s^2 speed random-walk std-dev (polar.py:15)
