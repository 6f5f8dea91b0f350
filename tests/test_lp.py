"""ILP solver tests: IPM LP accuracy vs scipy, and end-to-end integral
selection gap vs an exact MILP oracle on random MHT-shaped instances."""
import numpy as np
import jax.numpy as jnp
import pytest
from scipy.optimize import linprog, milp, LinearConstraint, Bounds

from pymht_tpu.ops.lp import solve_lp, solve_ilp, round_and_repair


def _instance(seed, T=None, L=8, R=None, max_rows_per_leaf=3):
    rng = np.random.default_rng(seed)
    T = T or int(rng.integers(2, 10))
    R = R or int(rng.integers(4, 16))
    n = T * L
    f = rng.normal(0.0, 2.0, n).astype(np.float32)
    A_eq = np.zeros((T, n), np.float32)
    for t in range(T):
        A_eq[t, t * L:(t + 1) * L] = 1
    b_eq = np.ones(T, np.float32)
    A_in = np.zeros((R, n), np.float32)
    for j in range(n):
        for row in rng.choice(R, rng.integers(0, max_rows_per_leaf + 1),
                              replace=False):
            A_in[row, j] = 1
    # Guarantee feasibility: one unconstrained leaf per target (the
    # zero-hypothesis chain analogue).
    for t in range(T):
        A_in[:, t * L] = 0
    b_in = np.ones(R, np.float32)
    return f, A_eq, b_eq, A_in, b_in, T, L, R


def _exact(f, A_eq, b_eq, A_in, b_in):
    R = A_in.shape[0]
    c = LinearConstraint(np.vstack([A_eq, A_in]),
                         np.concatenate([b_eq, -np.inf * np.ones(R)]),
                         np.concatenate([b_eq, b_in]))
    m = milp(f, constraints=c, integrality=np.ones(f.size), bounds=Bounds(0, 1))
    return m.fun


def test_lp_matches_scipy():
    f, A_eq, b_eq, A_in, b_in, T, L, R = _instance(0)
    res = linprog(f, A_ub=A_in, b_ub=b_in, A_eq=A_eq, b_eq=b_eq,
                  bounds=(0, None))
    sol = solve_lp(jnp.asarray(f), jnp.asarray(A_eq), jnp.asarray(b_eq),
                   jnp.asarray(A_in), jnp.asarray(b_in),
                   jnp.ones(T * L, bool), jnp.ones(T, bool), jnp.ones(R, bool))
    assert abs(float(sol.obj) - res.fun) < 1e-3 * max(1.0, abs(res.fun))


def test_lp_padding_neutral():
    """Padded rows/vars must not change the solution."""
    f, A_eq, b_eq, A_in, b_in, T, L, R = _instance(1)
    n = T * L
    # Embed in a larger padded problem.
    pad_n, pad_p, pad_r = n + 16, T + 4, R + 8
    f2 = np.zeros(pad_n, np.float32); f2[:n] = f
    A_eq2 = np.zeros((pad_p, pad_n), np.float32); A_eq2[:T, :n] = A_eq
    b_eq2 = np.zeros(pad_p, np.float32); b_eq2[:T] = b_eq
    A_in2 = np.zeros((pad_r, pad_n), np.float32); A_in2[:R, :n] = A_in
    b_in2 = np.ones(pad_r, np.float32)
    vm = np.zeros(pad_n, bool); vm[:n] = True
    em = np.zeros(pad_p, bool); em[:T] = True
    im = np.zeros(pad_r, bool); im[:R] = True

    sol_ref = solve_lp(jnp.asarray(f), jnp.asarray(A_eq), jnp.asarray(b_eq),
                       jnp.asarray(A_in), jnp.asarray(b_in),
                       jnp.ones(n, bool), jnp.ones(T, bool), jnp.ones(R, bool))
    sol_pad = solve_lp(jnp.asarray(f2), jnp.asarray(A_eq2), jnp.asarray(b_eq2),
                       jnp.asarray(A_in2), jnp.asarray(b_in2),
                       jnp.asarray(vm), jnp.asarray(em), jnp.asarray(im))
    assert abs(float(sol_ref.obj) - float(sol_pad.obj)) < 2e-3


@pytest.mark.parametrize("seed", range(10))
def test_ilp_gap_vs_exact(seed):
    f, A_eq, b_eq, A_in, b_in, T, L, R = _instance(seed)
    sel, feas, obj, bound = solve_ilp(
        jnp.asarray(f), jnp.asarray(A_eq), jnp.asarray(b_eq),
        jnp.asarray(A_in), jnp.asarray(b_in),
        jnp.ones(T * L, bool), jnp.ones(T, bool), jnp.ones(R, bool),
        T, L, jnp.ones(T, bool), budget=8)
    assert bool(feas)
    sel = np.asarray(sel)
    obj_int = sum(f[t * L + sel[t]] for t in range(T))
    exact = _exact(f, A_eq, b_eq, A_in, b_in)
    gap = (obj_int - exact) / max(1.0, abs(exact))
    # Dense-random set-packing instances are far denser in conflicts than
    # real MHT clusters; allow a small truncation gap there.  Mean gap on
    # real tracker instances is validated separately against the exact
    # native oracle.
    assert gap < 2.5e-2, f"gap {gap}"
    # Lower bound must actually bound the exact optimum.
    assert float(bound) <= exact + 1e-2 * max(1.0, abs(exact))


def test_ilp_conflict_forces_split():
    """Two targets, both preferring the same measurement: only one may
    keep it (mirrors the reference's A1 row semantics)."""
    T, L, R = 2, 2, 1
    # leaf 0 of each target uses measurement row 0; leaf 1 is free.
    f = np.array([-5.0, -1.0, -4.0, -1.0], np.float32)
    A_eq = np.array([[1, 1, 0, 0], [0, 0, 1, 1]], np.float32)
    b_eq = np.ones(2, np.float32)
    A_in = np.array([[1, 0, 1, 0]], np.float32)
    b_in = np.ones(1, np.float32)
    sel, feas, obj, _ = solve_ilp(
        jnp.asarray(f), jnp.asarray(A_eq), jnp.asarray(b_eq),
        jnp.asarray(A_in), jnp.asarray(b_in),
        jnp.ones(4, bool), jnp.ones(2, bool), jnp.ones(1, bool),
        2, 2, jnp.ones(2, bool), budget=4)
    assert bool(feas)
    sel = np.asarray(sel)
    # Optimal: target 0 takes the measurement (-5), target 1 yields (-1).
    assert sel[0] == 0 and sel[1] == 1
    assert abs(float(obj) - (-6.0)) < 1e-4
