"""Fused Pallas TPU kernel: CV predict + innovation precalc + gating +
candidate scoring for all leaves x measurements.

This is the speed-of-light op the reference's Cython sketch aimed at
(cFunctions.pyx ``cNewMeasurement``, SURVEY N4) and the hot tensor loop
of __processMeasurements (/root/reference/pymht/tracker.py:804-859):
for every hypothesis leaf, predict one radar period ahead, form the 2x2
innovation covariance, gate every measurement (NIS <= eta2) and emit the
candidate score  cnllr + 0.5*NIS + ln(lambda_ex*sqrt(det 2*pi*S)/P_d),
plus the zero-hypothesis column — all in one VMEM-resident pass so the
[N, M] NIS/score intermediates never round-trip HBM.

The constant-velocity structure is exploited in closed form (the
transition touches only (pos, vel) pairs), the 2x2 innovation inverse is
analytic, and measurements sit on the 128-lane axis.

``gate_and_score`` dispatches to the kernel on TPU and to the identical
pure-jnp formulation elsewhere (also the parity oracle in tests).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e9  # python float: jnp constants would be captured by the kernel
_LOG2PI = float(math.log(2.0 * math.pi))


def _kernel(params_ref, x_ref, p_ref, cnllr_ref, pd_ref, mask_ref,
            z_ref, zmask_ref,
            score_ref, xbar_ref, pbar_ref, scratch):
    """One grid step: a tile of TN leaves against all M measurements.

    params_ref (SMEM): [8] = (T, q_scale, r_var, eta2, log_lambda_ex,
                              big_guard, _, _)
    x_ref:  [TN, 4]   leaf state
    p_ref:  [TN, 16]  leaf covariance (row-major 4x4)
    cnllr_ref: [TN, 1]
    pd_ref:    [TN, 1]
    mask_ref:  [TN, 1] (float 0/1)
    z_ref:  [M, 2]
    zmask_ref: [M, 1] (float 0/1)
    score_ref: [TN, M+1] out — col 0 zero-hyp, cols 1..M measurements
    xbar_ref:  [TN, 4] out
    pbar_ref:  [TN, 16] out (predicted covariance, for downstream K/P_hat)
    """
    T = params_ref[0]
    q = params_ref[1]
    r_var = params_ref[2]
    eta2 = params_ref[3]
    log_lam = params_ref[4]

    x = x_ref[:]                                  # [TN, 4]
    P = p_ref[:]                                  # [TN, 16]

    # --- CV predict, closed form --------------------------------------
    # x_bar = [px + T vx, py + T vy, vx, vy]
    px, py, vx, vy = x[:, 0], x[:, 1], x[:, 2], x[:, 3]
    xbar = jnp.stack([px + T * vx, py + T * vy, vx, vy], axis=1)

    # P_bar = A P A^T + Q with A = [[I, T I], [0, I]] pairwise in
    # (0,2) and (1,3).  Q follows the reference kernel (pv.py:17-23).
    def g(i, j):
        return P[:, 4 * i + j]
    T2 = T * T
    T3 = T2 * T / 3.0
    T4 = T2 * T2 / 4.0
    pb = {}
    for (a, b) in ((0, 2), (1, 3)):
        pb[(a, a)] = (g(a, a) + T * (g(a, b) + g(b, a)) + T2 * g(b, b)
                      + T4 * q)
        pb[(a, b)] = g(a, b) + T * g(b, b) + T3 * q
        pb[(b, a)] = g(b, a) + T * g(b, b) + T3 * q
        pb[(b, b)] = g(b, b) + T2 * q
    # cross pairs (0,1), (0,3), (1,2), (2,3), (2,1), (3,0), (1,0), (3,2)
    pb[(0, 1)] = g(0, 1) + T * (g(0, 3) + g(2, 1)) + T2 * g(2, 3)
    pb[(1, 0)] = g(1, 0) + T * (g(1, 2) + g(3, 0)) + T2 * g(3, 2)
    pb[(0, 3)] = g(0, 3) + T * g(2, 3)
    pb[(3, 0)] = g(3, 0) + T * g(3, 2)
    pb[(1, 2)] = g(1, 2) + T * g(3, 2)
    pb[(2, 1)] = g(2, 1) + T * g(2, 3)
    pb[(2, 3)] = g(2, 3)
    pb[(3, 2)] = g(3, 2)
    pbar = jnp.stack([pb[(i, j)] for i in range(4) for j in range(4)],
                     axis=1)                       # [TN, 16]

    # --- innovation 2x2, closed form ---------------------------------
    s11 = pb[(0, 0)] + r_var
    s12 = pb[(0, 1)]
    s21 = pb[(1, 0)]
    s22 = pb[(1, 1)] + r_var
    det = s11 * s22 - s12 * s21
    inv_det = 1.0 / det
    i11 = s22 * inv_det
    i12 = -s12 * inv_det
    i21 = -s21 * inv_det
    i22 = s11 * inv_det
    # symmetrise the cross term for the quadratic form
    i_off = 0.5 * (i12 + i21)

    log_norm = 0.5 * (2.0 * _LOG2PI + jnp.log(jnp.maximum(det, 1e-20)))
    pd = pd_ref[:, 0]
    log_term = log_lam + log_norm - jnp.log(pd)    # [TN]

    # --- all-pairs NIS + score ---------------------------------------
    zx = z_ref[:, 0][None, :]                      # [1, M]
    zy = z_ref[:, 1][None, :]
    dx = zx - xbar[:, 0][:, None]                  # [TN, M]
    dy = zy - xbar[:, 1][:, None]
    nis = (i11[:, None] * dx * dx
           + 2.0 * i_off[:, None] * dx * dy
           + i22[:, None] * dy * dy)
    cn = cnllr_ref[:, 0][:, None]
    score = cn + 0.5 * nis + log_term[:, None]

    ok = ((nis <= eta2)
          & (zmask_ref[:, 0][None, :] > 0.5)
          & (mask_ref[:, 0][:, None] > 0.5))
    score = jnp.where(ok, score, 1e9)

    # zero-hypothesis column
    miss = cnllr_ref[:, 0] - jnp.log(1.0 - pd)
    zero_col = jnp.where(mask_ref[:, 0] > 0.5, miss, 1e9)

    score_ref[:, 0] = zero_col
    score_ref[:, 1:] = score
    xbar_ref[:] = xbar
    pbar_ref[:] = pbar


def gate_and_score_pallas(x, P, cnllr, pd, mask, z, zmask,
                          radar_period, q_scale, r_var, eta2, lambda_ex,
                          tile_n: int = 128, interpret: bool = None):
    """x: [N,4], P: [N,4,4], cnllr/pd/mask: [N], z: [M,2], zmask: [M].

    Returns (scores [N, M+1], x_bar [N,4], P_bar [N,4,4])."""
    N = x.shape[0]
    M = z.shape[0]
    if interpret is None:
        # The Mosaic kernel only compiles for TPU; elsewhere run the
        # interpreter (tests force CPU).
        interpret = jax.default_backend() != 'tpu'
    n_tiles = pl.cdiv(N, tile_n)
    zero = jnp.zeros((), jnp.float32)
    params = jnp.stack([
        jnp.asarray(radar_period, jnp.float32),
        jnp.asarray(q_scale, jnp.float32),
        jnp.asarray(r_var, jnp.float32),
        jnp.asarray(eta2, jnp.float32),
        jnp.asarray(math.log(max(lambda_ex, 1e-20)), jnp.float32)
        if not hasattr(lambda_ex, 'dtype')
        else jnp.log(jnp.maximum(lambda_ex, 1e-20)),
        zero, zero, zero])

    out_shapes = (
        jax.ShapeDtypeStruct((N, M + 1), jnp.float32),
        jax.ShapeDtypeStruct((N, 4), jnp.float32),
        jax.ShapeDtypeStruct((N, 16), jnp.float32),
    )
    # Plain blocked specs: blocks are pipelined HBM->VMEM per grid step
    # (pinning whole arrays with an explicit VMEM memory_space blows the
    # 16M scoped-vmem budget at production shapes).
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile_n, 4), lambda i, p: (i, 0)),
            pl.BlockSpec((tile_n, 16), lambda i, p: (i, 0)),
            pl.BlockSpec((tile_n, 1), lambda i, p: (i, 0)),
            pl.BlockSpec((tile_n, 1), lambda i, p: (i, 0)),
            pl.BlockSpec((tile_n, 1), lambda i, p: (i, 0)),
            pl.BlockSpec((M, 2), lambda i, p: (0, 0)),
            pl.BlockSpec((M, 1), lambda i, p: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((tile_n, M + 1), lambda i, p: (i, 0)),
            pl.BlockSpec((tile_n, 4), lambda i, p: (i, 0)),
            pl.BlockSpec((tile_n, 16), lambda i, p: (i, 0)),
        ),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
    )
    scores, xbar, pbar = pl.pallas_call(
        _kernel,
        out_shape=out_shapes,
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(params,
      x.astype(jnp.float32),
      P.reshape(N, 16).astype(jnp.float32),
      cnllr[:, None].astype(jnp.float32),
      pd[:, None].astype(jnp.float32),
      mask[:, None].astype(jnp.float32),
      z.astype(jnp.float32),
      zmask[:, None].astype(jnp.float32))
    return scores, xbar, pbar.reshape(N, 4, 4)


def gate_and_score_reference(x, P, cnllr, pd, mask, z, zmask,
                             radar_period, q_scale, r_var, eta2,
                             lambda_ex):
    """Pure-jnp formulation (identical math) — CPU path + parity oracle."""
    from ..models import pv
    from . import kalman as k
    A = pv.Phi(radar_period)
    Q = pv.Q(radar_period, q_scale)
    R = jnp.eye(2, dtype=jnp.float32) * r_var
    x_bar, P_bar = k.predict(A, Q, x, P)
    z_hat, S, S_inv, K, P_hat = k.precalc(pv.C_RADAR, R, x_bar, P_bar)
    zt = k.residuals(z, z_hat)
    nis = k.nis(zt, S_inv)
    nllr_m = k.nllr(lambda_ex, pd, S, nis)
    gate = (nis <= eta2) & zmask[None, :] & mask[:, None]
    meas_score = jnp.where(gate, cnllr[:, None] + nllr_m, 1e9)
    zero = jnp.where(mask, cnllr - jnp.log1p(-pd), 1e9)
    scores = jnp.concatenate([zero[:, None], meas_score], axis=1)
    return scores, x_bar, P_bar


def gate_and_score(x, P, cnllr, pd, mask, z, zmask, radar_period,
                   q_scale, r_var, eta2, lambda_ex, use_pallas=None):
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ('cpu',)
    fn = (functools.partial(gate_and_score_pallas)
          if use_pallas else gate_and_score_reference)
    return fn(x, P, cnllr, pd, mask, z, zmask, radar_period, q_scale,
              r_var, eta2, lambda_ex)
