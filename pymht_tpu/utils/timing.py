"""Per-phase runtime observability.

The reference hand-rolls tic/toc dicts around its 7 pipeline phases and
prints a coloured table (tracker.py:87-98, 1425-1464 printTimeLog).  The
TPU tracker compiles the whole pipeline into one program, so phase
timing works differently:

* ``RuntimeLog`` — per-scan wall-clock of the fused step plus the
  watchdog checks (hard/soft real-time limits, tracker.py:282-287).
* ``phase_profile`` — a debug-mode runner that executes each phase as a
  separate jitted call with block_until_ready fences, recovering the
  reference's per-phase breakdown (at the cost of fusion).
* ``device_profile`` — wraps a call in jax.profiler tracing for XLA
  op-level analysis when a trace viewer is available.
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np

PHASES = ('Total', 'Process', 'Cluster', 'Optim', 'DynN',
          'N-Prune', 'Terminate', 'Init')


@dataclass
class RuntimeLog:
    radar_period: float
    log: dict = field(default_factory=lambda: {k: [] for k in PHASES})
    violations: int = 0
    soft_violations: int = 0

    def record(self, phase: str, seconds: float):
        self.log.setdefault(phase, []).append(seconds)
        if phase == 'Total':
            if seconds > self.radar_period:
                self.violations += 1
            elif seconds > 0.6 * self.radar_period:
                self.soft_violations += 1

    def averages(self):
        return {k: float(np.mean(v)) for k, v in self.log.items() if v}

    def summary(self):
        """reference getTimeLogString/printTimeLog analogue."""
        parts = []
        for k in PHASES:
            v = self.log.get(k)
            if v:
                parts.append("{0:}: {1:6.1f}ms".format(k, 1000 * np.mean(v)))
        s = "  ".join(parts)
        if self.violations:
            s += "  [HARD-RT violations: %d]" % self.violations
        elif self.soft_violations:
            s += "  [soft-RT violations: %d]" % self.soft_violations
        return s


def phase_profile(tracker, scan_time, z, ais_messages=None, reps: int = 3):
    """Run one scan phase-by-phase with separate jits and fences.

    Debug-mode analogue of the reference's per-phase tic/toc.  Returns
    {phase: seconds}.  Does NOT mutate the tracker.
    """
    import jax
    from ..core.grow import grow, empty_ais
    from ..core.select import select
    from ..core.lifecycle import n_scan_prune, terminate
    from ..core import initiator as initiator_mod

    shapes, params = tracker.shapes, tracker.params
    t_rel = float(scan_time) - (tracker.t0 or float(scan_time))
    packed = tracker._pad_scan(t_rel, z)
    from ..core.grow import Scan
    import jax.numpy as jnp
    M = shapes.max_meas
    scan = Scan(z=packed[:M], mask=jnp.arange(M) < packed[M, 0].astype(int),
                time=packed[M, 1])
    ais = tracker._pad_ais(ais_messages or [])

    out = {}

    def timed(name, fn, *args):
        f = jax.jit(fn)
        r = f(*args)
        jax.block_until_ready(r)
        ts = []
        for _ in range(reps):
            t0 = time.time()
            r = f(*args)
            jax.block_until_ready(r)
            ts.append(time.time() - t0)
        out[name] = float(np.median(ts))
        return r

    g = timed('Process', lambda s: grow(s, scan, ais, shapes, params),
              tracker.state)
    st = g.state
    sel_res = timed('Optim', lambda s: select(s, shapes, params,
                                              method=tracker.method), st)
    st = st.replace(sel_leaf=sel_res.sel)
    term = timed('Terminate', lambda s: terminate(s, shapes, params), st)
    timed('N-Prune', lambda s: n_scan_prune(s, shapes, params), term.state)
    timed('Init', lambda i: initiator_mod.step(
        i, scan.z, scan.mask & ~g.used_meas, scan.time, ais, shapes, params),
        tracker.init_state)
    out['Total'] = sum(out.values())
    return out
