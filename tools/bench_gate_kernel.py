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

    # Device-resident A/B: REPS grows chained in ONE dispatch via
    # lax.scan (the axon tunnel adds ~30 ms per dispatch, which would
    # swamp a ~1 ms difference in single-dispatch timing).  The state
    # carry makes each grow depend on the previous one so XLA cannot
    # DCE or overlap them away; scan times alternate so the forest
    # stays live.
    results = {}
    zb = jnp.stack([sc0.z, sc1.z] * (REPS // 2 + 1))[:REPS]
    mb = jnp.stack([sc0.mask, sc1.mask] * (REPS // 2 + 1))[:REPS]
    tidx = jnp.arange(1, REPS + 1, dtype=jnp.float32) * 2.5
    for use_kernel in (False, True):
        try:
            def many(s, zz, mm, tt):
                def body(st_, inp):
                    z, m, t = inp
                    g = grow(st_, Scan(z=z, mask=m, time=t), None,
                             shapes, params, use_gate_kernel=use_kernel)
                    return g.state, g.used_meas.sum()
                return jax.lax.scan(body, s, (zz, mm, tt))
            f = jax.jit(many)
            out = f(st, zb, mb, tidx)
            jax.block_until_ready(out)
            times = []
            for _ in range(7):
                t0 = time.time()
                out = f(st, zb, mb, tidx)
                jax.block_until_ready(out)
                times.append(time.time() - t0)
            key = "kernel_ms" if use_kernel else "xla_ms"
            results[key] = round(float(np.median(times)) / REPS * 1000.0, 3)
        except Exception as e:  # noqa: BLE001 — report, don't crash A/B
            key = "kernel_error" if use_kernel else "xla_error"
            results[key] = f"{type(e).__name__}: {e}"[:300]

    results.update({"T": T, "L": L, "M": M, "reps": REPS,
                    "note": "ms per grow(), REPS grows chained in one "
                            "dispatch (device-resident lax.scan); same "
                            "jit wrapper both ways"})
    print(json.dumps(results))


if __name__ == "__main__":
    main()
