"""pymht_tpu — TPU-native track-oriented multi-hypothesis tracking.

Public API:

    from pymht_tpu import Tracker, TrackerShapes, TrackerParams
"""
from .core.config import TrackerShapes, TrackerParams  # noqa: F401
from .core.tracker import Tracker, scan_step, scan_many  # noqa: F401

__version__ = "0.1.0"
