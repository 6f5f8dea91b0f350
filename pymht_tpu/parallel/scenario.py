"""Multi-chip parallelism: scenario batches × target (cluster) sharding.

The reference is single-threaded (SURVEY §2.3); the latent parallel
structure becomes explicit mesh axes here:

* ``scenario`` — independent Monte-Carlo scenarios (data-parallel-like):
  a vmapped tracker step with the batch axis sharded over the mesh; no
  collectives cross this axis.
* ``cluster``  — the target axis within one scenario (model-parallel-
  like): targets shard across chips; GSPMD inserts the collectives the
  selection needs (all-reduce of Lagrangian usage counts / duals over
  ICI, all-gather for the cluster-adjacency matmul).

Everything is expressed as sharding annotations on one jitted step —
the XLA-collective (scaling-book) recipe rather than hand-written
NCCL-style communication.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import TrackerShapes, TrackerParams
from ..core.state import TrackerState, empty_state
from ..core import initiator as initiator_mod
from ..core.grow import Scan, AisBatch, empty_ais
from ..core.tracker import scan_step


def make_batched_step(shapes: TrackerShapes, params: TrackerParams,
                      method: str = 'lagrangian', use_ais: bool = False):
    """vmapped scan_step over a leading scenario axis."""
    def one(state, istate, scan, ais):
        return scan_step(state, istate, scan, ais, shapes, params,
                         method=method, use_ais=use_ais)
    return jax.vmap(one)


def batch_states(shapes: TrackerShapes, params: TrackerParams, n: int):
    state = empty_state(shapes, params)
    istate = initiator_mod.empty_initiator(shapes)
    tile = lambda x: jnp.broadcast_to(x, (n,) + x.shape)
    return (jax.tree_util.tree_map(tile, state),
            jax.tree_util.tree_map(tile, istate))


def make_sharded_step(mesh: Mesh, shapes: TrackerShapes,
                      params: TrackerParams, method: str = 'lagrangian',
                      use_ais: bool = False):
    """jit the batched step with scenario+cluster shardings on the mesh.

    TrackerState arrays are [B, T, ...]: B shards over 'scenario', the
    target axis T over 'cluster'.  Scan/AIS inputs shard over 'scenario'
    only (measurements are broadcast to every cluster shard — they gate
    against all targets).
    """
    step = make_batched_step(shapes, params, method=method, use_ais=use_ais)

    def state_spec(x):
        if x.ndim >= 2:
            return P('scenario', 'cluster')
        if x.ndim == 1:
            return P('scenario')
        return P()

    def scalar_or_scenario(x):
        return P('scenario') if x.ndim >= 1 else P()

    def shard(tree, spec_fn):
        return jax.tree_util.tree_map(
            lambda x: NamedSharding(mesh, spec_fn(x)), tree)

    def in_shardings(state_b, istate_b, scan_b, ais_b):
        return (shard(state_b, state_spec),
                shard(istate_b, scalar_or_scenario),
                shard(scan_b, scalar_or_scenario),
                shard(ais_b, scalar_or_scenario))

    @functools.partial(jax.jit)
    def sharded_step(state_b, istate_b, scan_b, ais_b):
        return step(state_b, istate_b, scan_b, ais_b)

    return sharded_step, in_shardings


def dryrun(n_devices: int, scenario: int = None, cluster: int = None):
    """Compile + execute ONE sharded step on an n-device mesh with tiny
    shapes.  Used by the driver's multi-chip validation."""
    devices = np.array(jax.devices()[:n_devices])
    if scenario is None:
        cluster = min(2, n_devices)
        scenario = n_devices // cluster
    mesh = Mesh(devices.reshape(scenario, cluster), ('scenario', 'cluster'))

    shapes = TrackerShapes(max_targets=8, max_leaves=8, max_meas=8,
                           max_ais=2, window=4, max_prelim=8,
                           max_initiators=8)
    params = TrackerParams(radar_period=1.0, N=2)
    B = scenario  # one scenario per scenario-shard at minimum

    state_b, istate_b = batch_states(shapes, params, B)
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(0, 50, (B, shapes.max_meas, 2))
                    .astype(np.float32))
    scan_b = Scan(z=z, mask=jnp.ones((B, shapes.max_meas), bool),
                  time=jnp.full((B,), 1.0, jnp.float32))
    ais_b = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), empty_ais(shapes))

    step, in_shardings_fn = make_sharded_step(mesh, shapes, params)
    shardings = in_shardings_fn(state_b, istate_b, scan_b, ais_b)
    args = jax.tree_util.tree_map(jax.device_put,
                                  (state_b, istate_b, scan_b, ais_b),
                                  shardings)
    out = step(*args)
    jax.block_until_ready(out)
    return out
