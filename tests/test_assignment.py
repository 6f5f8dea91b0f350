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


def test_initiator_contested_pairing_is_optimal():
    """A contested initiator<->measurement pairing where greedy drops a
    pairing but the optimal assignment keeps both (reference exact
    Munkres, m_of_n.py:380-413).  Geometry: initiator i1 can only reach
    m0; greedy lets i0 grab m0 first and strands i1."""
    import jax.numpy as jnp
    from pymht_tpu.core.config import TrackerShapes, TrackerParams
    from pymht_tpu.core import initiator as initiator_mod
    from pymht_tpu.core.grow import empty_ais

    shapes = TrackerShapes(max_targets=8, max_leaves=4, max_meas=4,
                           max_ais=2, window=3, max_prelim=8,
                           max_initiators=8)
    params = TrackerParams(radar_period=1.0, max_speed=5.0)
    st = initiator_mod.empty_initiator(shapes)

    def pad(pts):
        z = np.zeros((shapes.max_meas, 2), np.float32)
        mask = np.zeros((shapes.max_meas,), bool)
        z[:len(pts)] = pts
        mask[:len(pts)] = True
        return jnp.asarray(z), jnp.asarray(mask)

    # scan 0: two measurements become initiators
    z0, m0 = pad([(0.0, 0.0), (2.1, 0.0)])
    out = initiator_mod.step(st, z0, m0, jnp.asarray(0.0), empty_ais(shapes),
                             shapes, params)
    st = out.state
    assert int(np.asarray(st.i_mask).sum()) == 2

    # scan 1 (dt=1, gate=5): m0=(1,0) is reachable by both initiators
    # (cost 1.0 vs 1.1); m1=(0,4.9) only by i0 (d(i1,m1)=5.33 > gate).
    z1, m1 = pad([(1.0, 0.0), (0.0, 4.9)])
    out = initiator_mod.step(st, z1, m1, jnp.asarray(1.0), empty_ais(shapes),
                             shapes, params)
    st = out.state
    # optimal: i0 -> m1, i1 -> m0 => TWO preliminary tracks
    pm = np.asarray(st.p_mask)
    assert pm.sum() == 2, f"expected 2 prelims, got {pm.sum()}"
    pos = np.asarray(st.p_x)[pm, :2]
    np.testing.assert_allclose(
        sorted(map(tuple, pos.tolist())),
        [(0.0, 4.9), (1.0, 0.0)], atol=1e-5)

    # cross-check against scipy on the same cost matrix
    cost = np.array([[1.0, 4.9], [1.1, 5.33]])
    valid = np.array([[True, True], [True, False]])
    ref = _oracle(cost, valid)
    assert (ref >= 0).sum() == 2


def test_auction_at_scale_dense_contention():
    """Production GNN regime at bench scale (round-2 verdict item 8):
    R=64 bidders vs M=512 measurements, clustered so gates overlap
    heavily, every pair valid.  Every row must be assigned (solvable:
    C >> R) at near-Hungarian cost."""
    rng = np.random.default_rng(0)
    R, M = 64, 512
    tracks = rng.normal(0, 20.0, (R, 2))
    meas = np.concatenate([
        tracks[rng.permutation(R)] + rng.normal(0, 5.0, (R, 2)),
        rng.normal(0, 25.0, (M - R, 2))])
    cost = np.linalg.norm(tracks[:, None, :] - meas[None, :, :], axis=2)
    valid = np.ones((R, M), bool)
    out = np.asarray(auction_assign(jnp.asarray(cost, jnp.float32),
                                    jnp.asarray(valid)))
    assert (out >= 0).all(), f"{(out < 0).sum()} rows silently dropped"
    assert len(set(out.tolist())) == R, "duplicate column assignment"
    opt = _total(cost, _oracle(cost, valid))
    got = _total(cost, out)
    span = cost.max() - cost.min()
    assert got <= opt + span * 1e-2 + 1e-3, (got, opt)


def test_auction_square_512_cardinality_guarantee():
    """Adversarial DENSE SQUARE at n=512 (far beyond the asymmetric
    production shapes): the final eps phase can exhaust the iteration
    cap, but the completion pass must still deliver a full matching —
    no silent drops, no duplicates — with gracefully degraded cost.
    (n=256 keeps suite time sane; n=512 behaves the same, verified
    manually in round 3.)"""
    rng = np.random.default_rng(0)
    n = 256
    tracks = rng.normal(0, 30.0, (n, 2))
    meas = tracks[rng.permutation(n)] + rng.normal(0, 5.0, (n, 2))
    cost = np.linalg.norm(tracks[:, None, :] - meas[None, :, :], axis=2)
    valid = np.ones((n, n), bool)
    out = np.asarray(auction_assign(jnp.asarray(cost, jnp.float32),
                                    jnp.asarray(valid)))
    assert (out >= 0).all(), f"{(out < 0).sum()} rows silently dropped"
    assert len(set(out.tolist())) == n, "duplicate column assignment"
    opt = _total(cost, _oracle(cost, valid))
    got = _total(cost, out)
    assert got <= opt * 1.2, (got, opt)


def test_auction_tie_heavy_cap_no_drops():
    """Quantized (tie-heavy) costs with a tiny iteration cap: the
    bidding war hits the cap, but the completion pass must still
    deliver full cardinality on an all-valid square instance."""
    rng = np.random.default_rng(3)
    n = 128
    cost = np.round(rng.uniform(0, 3.0, (n, n)), 0)   # massive ties
    valid = np.ones((n, n), bool)
    # deliberately starve the auction: cap far below convergence needs
    # (taken verbatim — cardinality is restored by the exact
    # augmenting-path completion stage, not by any internal floor).
    out = np.asarray(auction_assign(jnp.asarray(cost, jnp.float32),
                                    jnp.asarray(valid), max_iters=1))
    assert (out >= 0).all(), f"{(out < 0).sum()} rows dropped at cap"
    assert len(set(out.tolist())) == n


def test_auction_initiator_density_m512():
    """The initiator's shape regime at bench scale: P=32 prelims vs
    M=512 measurements, gates overlapping heavily.  All prelims with
    any gated measurement must be assigned (solvable: 512 >> 32)."""
    rng = np.random.default_rng(7)
    P, M = 32, 512
    px = rng.normal(0, 50.0, (P, 2))
    z = np.concatenate([px + rng.normal(0, 3.0, (P, 2)),
                        rng.normal(0, 60.0, (M - P, 2))])
    cost = np.linalg.norm(px[:, None, :] - z[None, :, :], axis=2)
    valid = cost < 25.0
    solvable = valid.any(axis=1)
    out = np.asarray(auction_assign(jnp.asarray(cost, jnp.float32),
                                    jnp.asarray(valid), max_iters=300))
    # oracle cardinality: with 512 columns and 32 rows each gated to
    # >=1 column, Hungarian assigns every solvable row
    ref = _oracle(cost, valid)
    assert ((out >= 0) == (ref >= 0)).all() or \
        (out >= 0).sum() >= (ref >= 0).sum(), \
        f"cardinality {np.sum(out >= 0)} vs oracle {np.sum(ref >= 0)}"
    assert (out[solvable] >= 0).all()
    got = _total(cost, out)
    opt = _total(cost, ref)
    span = cost[valid].max() - cost[valid].min()
    assert got <= opt + span * 1e-2 + 1e-3, (got, opt)


def test_auction_initiator_density_production_cap():
    """Same shape regime as the density test above, but at the DEPLOYED
    iteration cap (max_iters=48, core/initiator.py:151,188) — pins the
    cost-optimality degradation of the production configuration, not
    just the generous-cap one (advisor round-3 finding)."""
    rng = np.random.default_rng(7)
    P, M = 32, 512
    px = rng.normal(0, 50.0, (P, 2))
    z = np.concatenate([px + rng.normal(0, 3.0, (P, 2)),
                        rng.normal(0, 60.0, (M - P, 2))])
    cost = np.linalg.norm(px[:, None, :] - z[None, :, :], axis=2)
    valid = cost < 25.0
    solvable = valid.any(axis=1)
    out = np.asarray(auction_assign(jnp.asarray(cost, jnp.float32),
                                    jnp.asarray(valid), max_iters=48))
    ref = _oracle(cost, valid)
    assert (out[solvable] >= 0).all()
    assert (out >= 0).sum() >= (ref >= 0).sum()
    got = _total(cost, out)
    opt = _total(cost, ref)
    span = cost[valid].max() - cost[valid].min()
    assert got <= opt + span * 1e-2 + 1e-3, (got, opt)


def test_auction_augmentation_displacement_chain():
    """Max cardinality requiring a length-3 alternating chain: with a
    starved cap the auction can leave row 2 unassigned with NO free
    valid column (greedy completion is powerless — only displacement
    via an augmenting path reaches full cardinality).  Chain: r2 takes
    c1, displacing r1 to c0, displacing r0 to c2."""
    cost = np.array([[1.0, 9.0, 2.0],
                     [1.0, 1.1, 9.0],
                     [9.0, 1.0, 9.0]], np.float32)
    valid = np.array([[True, True, True],
                      [True, True, False],
                      [False, True, False]])
    out = np.asarray(auction_assign(jnp.asarray(cost), jnp.asarray(valid),
                                    max_iters=1))
    assert (out >= 0).all(), out
    assert sorted(out.tolist()) == [0, 1, 2]
    ref = _oracle(cost, valid)
    assert (ref >= 0).sum() == 3
