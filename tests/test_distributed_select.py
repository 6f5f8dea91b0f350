"""Target-sharded selection with psum collectives equals the
single-device solver."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from pymht_tpu.core.config import TrackerShapes, TrackerParams
from pymht_tpu.core.state import empty_state, insert_targets
from pymht_tpu.core.grow import Scan, grow
from pymht_tpu.core.select import select_lagrangian
from pymht_tpu.parallel.distributed_select import make_distributed_select
from pymht_tpu.models import pv

SHAPES = TrackerShapes(max_targets=8, max_leaves=8, max_meas=16,
                       max_ais=2, window=5)
PARAMS = TrackerParams(radar_period=2.5, P_d=0.85, lambda_phi=1e-5,
                       lambda_nu=1e-5, N=3)


def _conflicted_state(seed=0):
    """Grow a state where neighbouring targets share measurements."""
    rng = np.random.default_rng(seed)
    state = empty_state(SHAPES, PARAMS)
    # four close target pairs -> shared gates
    xs = np.zeros((8, 4), np.float32)
    for i in range(8):
        xs[i, :2] = [20 * (i // 2), 6 * (i % 2)]
        xs[i, 2:] = [1.0, 0.0]
    state = insert_targets(state, jnp.asarray(xs),
                           jnp.broadcast_to(pv.P0, (8, 4, 4)),
                           jnp.ones(8, bool), jnp.zeros(8, jnp.int32),
                           jnp.asarray(0.0), PARAMS)
    z = np.concatenate([
        xs[:, :2] + xs[:, 2:] * 2.5 + rng.normal(0, 1.0, (8, 2)),
        xs[:4, :2] + xs[:4, 2:] * 2.5 + np.array([0., 3.])
        + rng.normal(0, 1.0, (4, 2)),
        rng.normal(0, 100, (4, 2))]).astype(np.float32)
    scan = Scan(z=jnp.asarray(z), mask=jnp.ones(16, bool),
                time=jnp.asarray(2.5, jnp.float32))
    g = grow(state, scan, None, SHAPES, PARAMS, use_gate_kernel=False)
    return g.state


def test_distributed_matches_single_device():
    state = _conflicted_state()
    ref = select_lagrangian(state, SHAPES, PARAMS)

    mesh = Mesh(np.array(jax.devices()[:4]), ('cluster',))
    run = make_distributed_select(mesh, SHAPES, PARAMS, iters=60)
    sel, obj, lb, feas = run(state)

    assert bool(feas)
    # objective must match the single-device solver's (both converge to
    # the same near-optimal incumbent on this instance)
    assert abs(float(obj) - float(ref.obj)) < 1e-3 * (1 + abs(float(ref.obj)))
    # and the lower bound must bound the objective
    assert float(lb) <= float(obj) + 1e-4
