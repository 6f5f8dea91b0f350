"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pymht_tpu.core.config import TrackerShapes, TrackerParams
from pymht_tpu.parallel.scenario import (
    dryrun, batch_states, make_batched_step, make_sharded_step)
from pymht_tpu.core.grow import Scan, empty_ais


def test_dryrun_8_devices():
    out = dryrun(8)
    assert out is not None


def test_sharded_matches_unsharded():
    """The sharded step must produce the same numbers as the plain
    vmapped step (GSPMD is a layout, not a semantic, change)."""
    n = 8
    devices = np.array(jax.devices()[:n]).reshape(4, 2)
    mesh = Mesh(devices, ('scenario', 'cluster'))
    shapes = TrackerShapes(max_targets=8, max_leaves=8, max_meas=8,
                           max_ais=2, window=4, max_prelim=8,
                           max_initiators=8)
    params = TrackerParams(radar_period=1.0, N=2)
    B = 4
    state_b, istate_b = batch_states(shapes, params, B)
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(0, 50, (B, shapes.max_meas, 2))
                    .astype(np.float32))
    scan_b = Scan(z=z, mask=jnp.ones((B, shapes.max_meas), bool),
                  time=jnp.full((B,), 1.0, jnp.float32))
    ais_b = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), empty_ais(shapes))

    plain = jax.jit(make_batched_step(shapes, params))
    ref = plain(state_b, istate_b, scan_b, ais_b)

    step, in_shardings_fn = make_sharded_step(mesh, shapes, params)
    shardings = in_shardings_fn(state_b, istate_b, scan_b, ais_b)
    args = jax.tree_util.tree_map(jax.device_put,
                                  (state_b, istate_b, scan_b, ais_b),
                                  shardings)
    out = step(*args)

    ref_leaves = jax.tree_util.tree_leaves(ref)
    out_leaves = jax.tree_util.tree_leaves(out)
    for a, b in zip(ref_leaves, out_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
