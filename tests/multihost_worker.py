"""Worker process for tests/test_multihost.py.

Launched twice (process_id 0/1) over a localhost coordinator; each
process exposes 2 virtual CPU devices, giving a 2x2 (scenario x
cluster) hybrid mesh.  Asserts:

1. the measurement exchange unions both hosts' local returns,
2. one scenario+cluster-sharded tracker step on the global mesh equals
   the unsharded single-process step run locally on the same inputs.

Usage: python multihost_worker.py <pid> <nproc> <port>
"""
import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pymht_tpu.parallel import multihost  # noqa: E402

assert multihost.initialize(f"127.0.0.1:{port}", nproc, pid)
assert jax.process_count() == nproc
assert jax.device_count() == 2 * nproc

import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402
from pymht_tpu.core.config import TrackerShapes, TrackerParams  # noqa: E402
from pymht_tpu.core.grow import Scan, empty_ais  # noqa: E402
from pymht_tpu.parallel import scenario as scen  # noqa: E402

# --- 1. measurement exchange -------------------------------------------
M = 8
z_local = np.zeros((3, 2), np.float32)
z_local[:2] = [[10.0 * pid, 1.0], [10.0 * pid, 2.0]]   # 2 valid per host
mask_local = np.array([True, True, False])
z, mask = multihost.gather_local_measurements(z_local, mask_local, M)
assert mask.sum() == 2 * nproc, mask
assert {tuple(r) for r in z[mask]} == {
    (10.0 * p, float(v)) for p in range(nproc) for v in (1, 2)}

# --- 2. sharded tracker step == local unsharded step --------------------
mesh = multihost.hybrid_mesh()
assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
    "scenario": nproc, "cluster": 2}

shapes = TrackerShapes(max_targets=8, max_leaves=8, max_meas=M,
                       max_ais=2, window=4, max_prelim=8, max_initiators=8)
params = TrackerParams(radar_period=1.0, N=2)
B = nproc
state_b, istate_b = scen.batch_states(shapes, params, B)
rng = np.random.default_rng(0)
zb = jnp.asarray(rng.normal(0, 50, (B, M, 2)).astype(np.float32))
scan_b = Scan(z=zb, mask=jnp.ones((B, M), bool),
              time=jnp.full((B,), 1.0, jnp.float32))
ais_b = jax.tree_util.tree_map(
    lambda x: jnp.broadcast_to(x, (B,) + x.shape), empty_ais(shapes))

# local reference: unsharded batched step on this process's device 0
ref_step = jax.jit(scen.make_batched_step(shapes, params))
ref_state, _, ref_out = ref_step(state_b, istate_b, scan_b, ais_b)
ref_scalar = float(jnp.sum(jnp.where(ref_state.leaf_mask,
                                     ref_state.leaf_cnllr, 0.0)))

# global sharded step on the hybrid mesh (same host-identical inputs)
step, in_sh = scen.make_sharded_step(mesh, shapes, params)
args = jax.tree_util.tree_map(
    jax.device_put, (state_b, istate_b, scan_b, ais_b),
    in_sh(state_b, istate_b, scan_b, ais_b))
g_state, _, g_out = step(*args)


@jax.jit
def scalar_of(st):
    s = jnp.sum(jnp.where(st.leaf_mask, st.leaf_cnllr, 0.0))
    return jax.lax.with_sharding_constraint(s, NamedSharding(mesh, P()))


g_scalar = float(scalar_of(g_state))
assert abs(g_scalar - ref_scalar) <= 1e-3 * (1 + abs(ref_scalar)), \
    (g_scalar, ref_scalar)
print(f"OK pid={pid} scalar={g_scalar:.4f}", flush=True)
