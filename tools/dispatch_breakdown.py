#!/usr/bin/env python
"""Host-stepped dispatch breakdown (round-3 verdict item 8).

The honest per-dispatch number in BENCH_r03 was ~56 ms/scan, attributed
by inference to ~30 ms of axon-tunnel relay.  This measures the pieces
so the claim has a basis:

  ping_ms       — round trip of a trivial (scalar add) dispatch + fetch:
                  the pure tunnel relay floor, no real compute/transfer
  upload_ms     — host->device transfer of one packed scan [M+1, 2]
  step_ms       — scan_step dispatch + device compute (block_until_ready
                  on device-resident outputs; no output fetch)
  fetch_ms      — device->host transfer of the full StepOutputs tree
  total_ms      — add_measurement_list wall (upload+step+fetch)
  total_pipelined_ms — same with pipeline_outputs=True (fetch overlapped)
  stream_ms     — device-resident scan_many per-scan time (the floor the
                  host path would approach with zero relay cost)

Writes DISPATCH_r04.json at the repo root when run on TPU.

Run:  env PYTHONPATH=/root/.axon_site:/root/repo python tools/dispatch_breakdown.py
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pymht_tpu.core.tracker import Tracker, scan_many
from tools.profile_phases import build, N_SCANS


def med(fn, reps=20):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return float(np.median(ts) * 1000.0)


def main():
    shapes, params, tr, scans_dev, ais_dev = build()

    # tunnel relay floor
    one = jnp.ones(())
    add = jax.jit(lambda x: x + 1)
    jax.block_until_ready(add(one))
    ping_ms = med(lambda: jax.block_until_ready(add(one)))

    # one packed scan upload
    packed = np.zeros((shapes.max_meas + 1, 2), np.float32)
    upload_ms = med(lambda: jax.block_until_ready(jnp.asarray(packed)))

    # host-stepped tracker at bench shapes
    tr2 = Tracker(shapes, params, method='lagrangian', use_ais=False)
    z0 = np.asarray(scans_dev.z[0])
    m0 = int(np.asarray(scans_dev.mask[0]).sum())
    t_abs = [float(t) for t in np.asarray(scans_dev.time)]
    tr2.t0 = 0.0
    # warm the jit + settle state with the first scans
    for i in range(3):
        tr2.add_measurement_list(t_abs[i], np.asarray(scans_dev.z[i])[
            np.asarray(scans_dev.mask[i])])

    sc_dev = tr2._pad_scan(t_abs[3], z0[:m0])
    ais_dev1 = tr2._empty_ais

    def step_only():
        out = tr2._step(tr2.state, tr2.init_state, sc_dev, ais_dev1)
        tr2.state, tr2.init_state = out[0], out[1]
        jax.block_until_ready(out)
        return out

    out = step_only()
    ts = []
    outs_tree = None
    for _ in range(20):
        t0 = time.time()
        outs_tree = step_only()
        ts.append(time.time() - t0)
    step_ms = float(np.median(ts) * 1000.0)
    fetch_ms = med(lambda: jax.device_get(outs_tree[2]))

    # full wall per scan, unpipelined and pipelined
    def wall(pipeline):
        trw = Tracker(shapes, params, method='lagrangian', use_ais=False,
                      pipeline_outputs=pipeline)
        trw._step = tr2._step       # reuse the compiled step (identical
        #   shapes/params closure; a fresh Tracker would recompile it,
        #   ~10 min each through the tunnel)
        trw.t0 = 0.0
        ts = []
        for i in range(min(N_SCANS, len(t_abs))):
            z = np.asarray(scans_dev.z[i])[np.asarray(scans_dev.mask[i])]
            t0 = time.time()
            trw.add_measurement_list(t_abs[i], z)
            ts.append(time.time() - t0)
        trw.flush()
        return float(np.median(ts[2:]) * 1000.0)

    total_ms = wall(False)
    total_pipe_ms = wall(True)

    # device-resident streaming floor
    run = jax.jit(lambda s, i, sc, a: scan_many(
        s, i, sc, a, shapes, params, method='lagrangian', use_ais=False))
    st, ist = tr.state, tr.init_state
    jax.block_until_ready(run(st, ist, scans_dev, ais_dev))
    ts = []
    for _ in range(5):
        t0 = time.time()
        jax.block_until_ready(run(st, ist, scans_dev, ais_dev))
        ts.append(time.time() - t0)
    stream_ms = float(np.median(ts) / N_SCANS * 1000.0)

    out = {
        "metric": "host_dispatch_breakdown",
        "platform": jax.devices()[0].platform,
        "ping_ms": round(ping_ms, 2),
        "upload_ms": round(upload_ms, 2),
        "step_ms": round(step_ms, 2),
        "fetch_ms": round(fetch_ms, 2),
        "total_ms": round(total_ms, 2),
        "total_pipelined_ms": round(total_pipe_ms, 2),
        "stream_ms_per_scan": round(stream_ms, 2),
        # the non-compute share of a host-stepped scan, in units of the
        # measured relay floor: ~1.0 means the host path costs exactly
        # one tunnel round trip over the device compute (streaming) time
        "non_compute_ms": round(total_ms - stream_ms, 2),
        "non_compute_in_pings": round(
            (total_ms - stream_ms) / max(ping_ms, 1e-9), 2),
    }
    print(json.dumps(out), flush=True)
    if jax.devices()[0].platform != 'cpu':
        with open(os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "DISPATCH_r04.json"), "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
