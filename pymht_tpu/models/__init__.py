from . import ais, constants, polar, pv  # noqa: F401
