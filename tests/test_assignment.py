"""Auction assignment vs scipy.optimize.linear_sum_assignment oracle."""
import numpy as np
import jax.numpy as jnp
import pytest
from scipy.optimize import linear_sum_assignment

from pymht_tpu.ops.assignment import auction_assign


def _oracle(cost, valid):
    """Hungarian with bigM padding + post filter (the reference recipe,
    m_of_n.py:24-104)."""
    R, C = cost.shape
    big = 1e6
    n = max(R, C)
    d = np.full((n, n), big)
    d[:R, :C] = np.where(valid, cost, big)
    rows, cols = linear_sum_assignment(d)
    out = -np.ones(R, np.int64)
    for r, c in zip(rows, cols):
        if r < R and c < C and valid[r, c]:
            out[r] = c
    return out


def _total(cost, assign):
    return sum(cost[r, c] for r, c in enumerate(assign) if c >= 0)


@pytest.mark.parametrize("seed", range(8))
def test_auction_matches_hungarian_cost(seed):
    rng = np.random.default_rng(seed)
    R, C = int(rng.integers(1, 12)), int(rng.integers(1, 16))
    cost = rng.uniform(0, 100, (R, C)).astype(np.float32)
    valid = rng.uniform(size=(R, C)) < 0.6
    ref = _oracle(cost, valid)
    out = np.asarray(auction_assign(jnp.asarray(cost), jnp.asarray(valid)))
    # Same cardinality, near-equal total cost (auction is eps-optimal).
    assert (out >= 0).sum() == (ref >= 0).sum(), (out, ref)
    assert _total(cost, out) <= _total(cost, ref) + 1e-2 * max(1, R)
    # All returned pairs are valid.
    for r, c in enumerate(out):
        if c >= 0:
            assert valid[r, c]


def test_no_valid_pairs():
    cost = jnp.ones((3, 4))
    valid = jnp.zeros((3, 4), bool)
    out = np.asarray(auction_assign(cost, valid))
    assert (out == -1).all()


def test_simple_cross():
    # two rows prefer the same column; optimal splits them.
    cost = jnp.asarray(np.array([[1.0, 5.0], [2.0, 3.0]], np.float32))
    valid = jnp.ones((2, 2), bool)
    out = np.asarray(auction_assign(cost, valid))
    assert out.tolist() == [0, 1]
