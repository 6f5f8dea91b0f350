#!/usr/bin/env python
"""Quick TPU timing: grow-only and full scan_step (see profile_phases)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from pymht_tpu.core.tracker import scan_step
from pymht_tpu.core.grow import grow
from tools.profile_phases import build, timeit, N_SCANS  # noqa: E402

STAGES = os.environ.get("STAGES", "grow,full").split(",")


def main():
    shapes, params, tr, scans_dev, ais_dev = build()
    st, ist = tr.state, tr.init_state

    if "grow" in STAGES:
        def grow_only(s, sc, a):
            def body(st_, inp):
                scan_t, _ = inp
                g = grow(st_, scan_t, None, shapes, params)
                return g.state, g.used_meas
            return jax.lax.scan(body, s, (sc, a))
        timeit("grow only", jax.jit(grow_only), st, scans_dev, ais_dev)

    if "full" in STAGES:
        def full(s, i, sc, a):
            def body(carry, inp):
                s_, i_ = carry
                scan_t, ais_t = inp
                s_, i_, out = scan_step(s_, i_, scan_t, ais_t, shapes,
                                        params, method='lagrangian',
                                        use_ais=False,
                                        compute_clusters=False)
                return (s_, i_), out.sel_obj
            return jax.lax.scan(body, (s, i), (sc, a))
        timeit("full scan_step", jax.jit(full), st, ist, scans_dev, ais_dev)


if __name__ == "__main__":
    main()
