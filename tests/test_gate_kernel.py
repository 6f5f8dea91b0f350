"""Pallas fused gating kernel parity vs the pure-jnp oracle.

Runs the kernel in interpreter mode on CPU; the compiled-TPU path is
exercised by bench.py and the graft entry."""
import numpy as np
import jax.numpy as jnp
import pytest

from pymht_tpu.models import pv
from pymht_tpu.ops.gate_kernel import (
    gate_and_score_pallas, gate_and_score_reference, BIG)


def _inputs(seed=0, N=32, M=24):
    rng = np.random.default_rng(seed)
    x = rng.normal(0, 100, (N, 4)).astype(np.float32)
    P = np.broadcast_to(np.asarray(pv.P0), (N, 4, 4)).copy()
    P += rng.uniform(0, 1, (N, 1, 1)).astype(np.float32) * np.eye(4)
    cnllr = rng.normal(0, 1, N).astype(np.float32)
    pd = np.full(N, 0.85, np.float32)
    mask = rng.uniform(size=N) < 0.9
    z = rng.normal(0, 100, (M, 2)).astype(np.float32)
    # place some measurements near leaves so gates fire
    k = min(M, N) // 2
    z[:k] = x[:k, :2] + x[:k, 2:] * 2.5 + rng.normal(0, 2.0, (k, 2))
    zmask = rng.uniform(size=M) < 0.95
    return (jnp.asarray(x), jnp.asarray(P), jnp.asarray(cnllr),
            jnp.asarray(pd), jnp.asarray(mask), jnp.asarray(z),
            jnp.asarray(zmask))


ARGS = dict(radar_period=2.5, q_scale=1.0, r_var=6.25, eta2=5.99,
            lambda_ex=2e-5)


@pytest.mark.parametrize("seed", range(3))
def test_kernel_matches_reference(seed):
    inp = _inputs(seed)
    s_ref, xb_ref, pb_ref = gate_and_score_reference(*inp, **ARGS)
    s_k, xb_k, pb_k = gate_and_score_pallas(*inp, **ARGS, tile_n=16,
                                            interpret=True)
    np.testing.assert_allclose(np.asarray(xb_k), np.asarray(xb_ref),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pb_k), np.asarray(pb_ref),
                               rtol=1e-4, atol=1e-3)
    ref = np.asarray(s_ref)
    ker = np.asarray(s_k)
    # identical gating decisions
    np.testing.assert_array_equal(ker >= BIG * 0.5, ref >= BIG * 0.5)
    # identical scores where gated
    gated = ref < BIG * 0.5
    np.testing.assert_allclose(ker[gated], ref[gated], rtol=1e-4,
                               atol=1e-3)


def test_kernel_padding_rows():
    """N not a multiple of tile_n: padded rows must not poison output."""
    inp = _inputs(5, N=20, M=8)
    s_ref, _, _ = gate_and_score_reference(*inp, **ARGS)
    s_k, _, _ = gate_and_score_pallas(*inp, **ARGS, tile_n=16,
                                      interpret=True)
    ref, ker = np.asarray(s_ref), np.asarray(s_k)
    gated = ref < BIG * 0.5
    np.testing.assert_allclose(ker[gated], ref[gated], rtol=1e-4, atol=1e-3)
