#!/usr/bin/env python
"""On-TPU A/B microbench: Pallas fused gate kernel vs the XLA-fused
radar-candidate path, at headline bench shapes (round-2 verdict item 5).

Times grow() end-to-end both ways (the kernel replaces predict + gate +
score inside grow), plus the isolated candidate stage, and prints one
JSON line.  Run:

  env PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_gate_kernel.py
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T = int(os.environ.get("GK_TARGETS", "128"))
L = int(os.environ.get("GK_LEAVES", "32"))
M = int(os.environ.get("GK_MEAS", "512"))
REPS = int(os.environ.get("GK_REPS", "20"))


def main():
    import jax
    import jax.numpy as jnp
    from pymht_tpu.core.config import TrackerShapes, TrackerParams
    from pymht_tpu.core.state import empty_state, insert_targets
    from pymht_tpu.core.grow import Scan, grow
    from pymht_tpu.models import pv

    shapes = TrackerShapes(max_targets=T, max_leaves=L, max_meas=M,
                           max_ais=8, window=7, max_prelim=64,
                           max_initiators=M)
    params = TrackerParams(radar_period=2.5, P_d=0.9, lambda_phi=2e-5,
                           lambda_nu=1e-5, N=5, radar_range=2000.0)

    rng = np.random.default_rng(0)
    xs = np.zeros((T, 4), np.float32)
    xs[:, :2] = rng.uniform(-1500, 1500, (T, 2))
    xs[:, 2:] = rng.normal(0, 5, (T, 2))
    st = empty_state(shapes, params)
    st = insert_targets(st, jnp.asarray(xs),
                        jnp.broadcast_to(jnp.asarray(np.asarray(pv.P0)),
                                         (T, 4, 4)),
                        jnp.ones((T,), bool), jnp.zeros((T,), jnp.int32),
                        jnp.asarray(0.0), params)
    # densify: run one real grow so every target has a few live leaves
    z0 = np.concatenate([xs[:, :2] + rng.normal(0, 2.5, (T, 2)),
                         rng.uniform(-2000, 2000, (M - T, 2))]).astype(
        np.float32)
    sc0 = Scan(z=jnp.asarray(z0), mask=jnp.ones((M,), bool),
               time=jnp.asarray(2.5, jnp.float32))
    z1 = np.concatenate([xs[:, :2] + 2.5 * xs[:, 2:]
                         + rng.normal(0, 2.5, (T, 2)),
                         rng.uniform(-2000, 2000, (M - T, 2))]).astype(
        np.float32)
    sc1 = Scan(z=jnp.asarray(z1), mask=jnp.ones((M,), bool),
               time=jnp.asarray(5.0, jnp.float32))

    results = {}
    for use_kernel in (False, True):
        try:
            f = jax.jit(lambda s, sc: grow(s, sc, None, shapes, params,
                                           use_gate_kernel=use_kernel))
            st1 = f(st, sc0)
            jax.block_until_ready(st1)
            g = f(st1.state, sc1)
            jax.block_until_ready(g)
            times = []
            for _ in range(REPS):
                t0 = time.time()
                g = f(st1.state, sc1)
                jax.block_until_ready(g)
                times.append(time.time() - t0)
            key = "kernel_ms" if use_kernel else "xla_ms"
            results[key] = round(float(np.median(times)) * 1000.0, 3)
        except Exception as e:  # noqa: BLE001 — report, don't crash A/B
            key = "kernel_error" if use_kernel else "xla_error"
            results[key] = f"{type(e).__name__}: {e}"[:300]

    results.update({"T": T, "L": L, "M": M, "reps": REPS,
                    "note": "grow() end-to-end incl. dispatch overhead; "
                            "same jit wrapper both ways"})
    print(json.dumps(results))


if __name__ == "__main__":
    main()
