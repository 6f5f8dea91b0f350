"""Device-resident Monte-Carlo scenario generation + batched tracking.

The reference's Monte-Carlo studies loop seeded host scenarios through a
single tracker (SURVEY §2.3); here whole scenario batches are generated
with JAX PRNG directly on device ([B, ...] arrays with static clutter
caps + masks) and tracked by the vmapped/sharded step — BASELINE
config 4 (256 randomized scenarios, scenario-parallel on one host).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models import pv
from ..core.config import TrackerShapes, TrackerParams
from ..core.grow import Scan
from .scenario import make_batched_step, batch_states

SPEEDS = jnp.array([1, 10, 12, 15, 28, 35], jnp.float32) * 0.5


class McScenario(NamedTuple):
    truth: jnp.ndarray     # [B, S, K, 4] truth states per scan
    z: jnp.ndarray         # [B, S, M, 2] measurements
    z_mask: jnp.ndarray    # [B, S, M]
    times: jnp.ndarray     # [S]


def generate(key, batch: int, n_targets: int, n_scans: int,
             shapes: TrackerShapes, params: TrackerParams,
             radar_range: float, sigma_R: float = 2.5,
             sigma_Q: float = 0.1, P_d: float = None,
             clutter_rate: float = None,
             lambda_local: float = 0.0, local_cap: int = 2) -> McScenario:
    """Batched scenario generation mirroring the host simulator's
    semantics (uniform-in-disc, discrete speed set, CV truth with
    process noise, P_d thinning, per-target local clutter at 3 sigma_R
    — reference simulator.py:93-96 — and Poisson-capped uniform global
    clutter).  ``local_cap`` statically bounds local-clutter points per
    target per scan (Poisson(0.5) exceeds 2 with p=1.4%)."""
    B, K, S = batch, n_targets, n_scans
    M = shapes.max_meas
    period = params.radar_period
    P_d = params.P_d if P_d is None else P_d
    lam = params.lambda_phi if clutter_rate is None else clutter_rate
    mean_clutter = lam * jnp.pi * radar_range ** 2

    k1, k2, k3, k4, k5, k6, k7, k8 = jax.random.split(key, 8)
    # initial states
    heading = jax.random.uniform(k1, (B, K)) * 2 * jnp.pi
    dist = jax.random.uniform(k2, (B, K)) * radar_range * 0.8
    pos = jnp.stack([dist * jnp.cos(heading), dist * jnp.sin(heading)], -1)
    vh = jax.random.uniform(k3, (B, K)) * 2 * jnp.pi
    sp = SPEEDS[jax.random.randint(k4, (B, K), 0, len(SPEEDS))]
    vel = jnp.stack([sp * jnp.cos(vh), sp * jnp.sin(vh)], -1)
    x0 = jnp.concatenate([pos, vel], -1)                    # [B,K,4]

    # truth propagation with process noise
    F = pv.Phi(period)
    Q = pv.Q(period, sigma_Q)
    Lq = jnp.linalg.cholesky(Q + 1e-9 * jnp.eye(4))

    def prop(x, key):
        w = jax.random.normal(key, x.shape) @ Lq.T
        return jnp.einsum('ij,bkj->bki', F, x) + w

    def scan_body(carry, key):
        x = carry
        x = prop(x, key)
        return x, x

    keys = jax.random.split(k5, S)
    _, truth = jax.lax.scan(scan_body, x0, keys)            # [S,B,K,4]
    truth = jnp.moveaxis(truth, 0, 1)                       # [B,S,K,4]

    # measurements: target returns + clutter, padded to M
    kz, kd, kc, kn = jax.random.split(k6, 4)
    z_t = truth[..., :2] + sigma_R * jax.random.normal(kz, (B, S, K, 2))
    det = jax.random.uniform(kd, (B, S, K)) <= P_d
    in_rng = jnp.linalg.norm(truth[..., :2], axis=-1) <= radar_range
    det = det & in_rng

    # local clutter: Poisson(lambda_local) points per in-range target at
    # 3*sigma_R around its true position (reference simulator.py:93-96).
    Cl = local_cap if lambda_local > 0.0 else 0
    if Cl > 0:
        kl1, kl2 = jax.random.split(k7)
        n_loc = jax.random.poisson(kl1, lambda_local, (B, S, K))
        l_xy = (truth[..., None, :2]
                + 3.0 * sigma_R * jax.random.normal(kl2, (B, S, K, Cl, 2)))
        l_mask = ((jnp.arange(Cl)[None, None, None, :] < n_loc[..., None])
                  & in_rng[..., None])
        l_xy = l_xy.reshape(B, S, K * Cl, 2)
        l_mask = l_mask.reshape(B, S, K * Cl)
    else:
        l_xy = jnp.zeros((B, S, 0, 2), jnp.float32)
        l_mask = jnp.zeros((B, S, 0), bool)

    n_clutter_max = M - K - K * Cl
    assert n_clutter_max > 0, "max_meas too small for targets + local clutter"
    c_xy = jax.random.uniform(kc, (B, S, n_clutter_max, 2),
                              minval=-radar_range, maxval=radar_range)
    c_ok = jnp.linalg.norm(c_xy, axis=-1) <= radar_range
    n_clutter = jax.random.poisson(kn, mean_clutter, (B, S))
    c_mask = (jnp.arange(n_clutter_max)[None, None, :]
              < n_clutter[..., None]) & c_ok

    z = jnp.concatenate([z_t, l_xy, c_xy], axis=2)          # [B,S,M,2]
    z_mask = jnp.concatenate([det, l_mask, c_mask], axis=2)
    times = (jnp.arange(S, dtype=jnp.float32) + 1) * period
    return McScenario(truth=truth, z=z, z_mask=z_mask, times=times)


def run_batch(scenario: McScenario, shapes: TrackerShapes,
              params: TrackerParams, method: str = 'lagrangian'):
    """Track every scenario in the batch: lax.scan over scans of a
    vmapped step.  Returns (final states, stacked outputs)."""
    from ..core.grow import empty_ais
    from ..core.state import insert_targets

    B, S, M, _ = scenario.z.shape
    K = scenario.truth.shape[2]
    step = make_batched_step(shapes, params, method=method, use_ais=False)
    state_b, istate_b = batch_states(shapes, params, B)

    # pre-initialise each scenario's targets from truth at the first scan
    # time (truth[:, 0] is the state at times[0]; the first tracked scan
    # then predicts with dt=0, which is exact).
    T = shapes.max_targets
    def pre(state, x0):
        xs = jnp.zeros((T, 4), jnp.float32).at[:K].set(x0[:K])
        mask = jnp.arange(T) < K
        return insert_targets(state, xs,
                              jnp.broadcast_to(pv.P0, (T, 4, 4)),
                              mask, jnp.zeros((T,), jnp.int32),
                              scenario.times[0], params)
    state_b = jax.vmap(pre)(state_b, scenario.truth[:, 0])

    ais_b = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), empty_ais(shapes))

    def body(carry, s):
        st, ist = carry
        scan_b = Scan(z=scenario.z[:, s], mask=scenario.z_mask[:, s],
                      time=jnp.full((B,), scenario.times[s]))
        st, ist, out = step(st, ist, scan_b, ais_b)
        return (st, ist), (out.track_x, out.track_mask)

    (state_b, istate_b), (xs, ms) = jax.lax.scan(
        body, (state_b, istate_b), jnp.arange(S))
    return state_b, xs, ms
