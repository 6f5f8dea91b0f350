#!/usr/bin/env python
"""Bisect grow()'s cost at arbitrary shapes (radar-only path).

Four cumulative variants, each lax.scan'd with a real dependency chain
(results folded into the carried state so XLA cannot DCE or reorder
across scans):

  1 candidates   — plane predict/gate/score only
  2 +topk        — + beam top_k
  3 +payload     — + packed parent gather + new-leaf states
  4 full grow    — + history roll/write + state rebuild

Use the BENCH_* envs from tools/profile_phases.py to set shapes.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pymht_tpu.core.grow import grow
from pymht_tpu.ops.ais_fused import radar_candidates_planes
from tools.profile_phases import build, timeit  # noqa: E402


def main():
    shapes, params, tr, scans_dev, ais_dev = build()
    st = tr.state
    T, L = shapes.max_targets, shapes.max_leaves
    M = shapes.max_meas

    def fold(state, val):
        # keep a traced dependency on `val` without changing behaviour
        return state.replace(
            leaf_cnllr=state.leaf_cnllr + 0.0 * val)

    def v_cands(s, sc, a):
        def body(st_, inp):
            scan_t, _ = inp
            (x_bar, P_bar, K, P_hat, gate,
             nllr_m) = radar_candidates_planes(st_, scan_t, params)
            val = (nllr_m.sum() + x_bar.sum() + P_hat.sum()
                   + gate.sum().astype(jnp.float32))
            return fold(st_, val), val
        return jax.lax.scan(body, s, (sc, a))

    def v_topk(s, sc, a):
        def body(st_, inp):
            scan_t, _ = inp
            (x_bar, P_bar, K, P_hat, gate,
             nllr_m) = radar_candidates_planes(st_, scan_t, params)
            zero = jnp.where(st_.leaf_mask, st_.leaf_cnllr + 1.0, 1e9)
            meas = jnp.where(gate, st_.leaf_cnllr[:, :, None] + nllr_m,
                             1e9)
            cand = jnp.concatenate([zero[:, :, None], meas], axis=2)
            tsc, tix = jax.lax.top_k(-cand.reshape(T, L * (1 + M)), L)
            val = tsc.sum() + tix.sum().astype(jnp.float32) + P_hat.sum() \
                + K.sum() + P_bar.sum() + x_bar.sum()
            return fold(st_, val), val
        return jax.lax.scan(body, s, (sc, a))

    def v_payload(s, sc, a):
        def body(st_, inp):
            scan_t, _ = inp
            (x_bar, P_bar, K, P_hat, gate,
             nllr_m) = radar_candidates_planes(st_, scan_t, params)
            zero = jnp.where(st_.leaf_mask, st_.leaf_cnllr + 1.0, 1e9)
            meas = jnp.where(gate, st_.leaf_cnllr[:, :, None] + nllr_m,
                             1e9)
            cand = jnp.concatenate([zero[:, :, None], meas], axis=2)
            Cn = 1 + M
            tsc, tix = jax.lax.top_k(-cand.reshape(T, L * Cn), L)
            parent = tix // Cn
            slot = tix % Cn
            tb = jnp.arange(T)[:, None]
            payload = jnp.concatenate([
                x_bar, P_bar.reshape(T, L, 16), K.reshape(T, L, 8),
                P_hat.reshape(T, L, 16)], axis=2)
            pp = payload[tb, parent]
            x_bar_p = pp[:, :, 0:4]
            K_p = pp[:, :, 20:28].reshape(T, L, 4, 2)
            radar_m = jnp.clip(slot - 1, 0, M - 1)
            zt_p = scan_t.z[radar_m] - x_bar_p[..., :2]
            x_new = x_bar_p + jnp.einsum('tlij,tlj->tli', K_p, zt_p)
            val = x_new.sum() - tsc.sum() + pp.sum()
            return fold(st_, val), val
        return jax.lax.scan(body, s, (sc, a))

    def v_used(s, sc, a):
        # variant 2r: candidates + the used/gated_counts reductions
        # (any over the MAJOR axes of [T,L,M] -> [M])
        def body(st_, inp):
            scan_t, _ = inp
            (x_bar, P_bar, K, P_hat, gate,
             nllr_m) = radar_candidates_planes(st_, scan_t, params)
            used = jnp.any(gate, axis=(0, 1))
            gated_counts = jnp.sum(gate.astype(jnp.int32), axis=(1, 2))
            val = (used.sum().astype(jnp.float32)
                   + gated_counts.sum().astype(jnp.float32)
                   + nllr_m.sum() + P_hat.sum() + K.sum() + P_bar.sum()
                   + x_bar.sum())
            return fold(st_, val), val
        return jax.lax.scan(body, s, (sc, a))

    def v_statecarry(s, sc, a):
        # variant 3s: payload variant but REBUILDING and CARRYING a real
        # evolved state (leaf tables + histories written each scan) —
        # isolates the cost of the evolving lax.scan carry itself.
        def body(st_, inp):
            scan_t, _ = inp
            (x_bar, P_bar, K, P_hat, gate,
             nllr_m) = radar_candidates_planes(st_, scan_t, params)
            W = st_.hist_meas.shape[2]
            zero = jnp.where(st_.leaf_mask, st_.leaf_cnllr + 1.0, 1e9)
            meas = jnp.where(gate, st_.leaf_cnllr[:, :, None] + nllr_m,
                             1e9)
            cand = jnp.concatenate([zero[:, :, None], meas], axis=2)
            Cn = 1 + M
            tsc, tix = jax.lax.top_k(-cand.reshape(T, L * Cn), L)
            parent = tix // Cn
            slot = tix % Cn
            tb = jnp.arange(T)[:, None]
            i2f = lambda x: jax.lax.bitcast_convert_type(x, jnp.float32)
            f2i = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)
            payload = jnp.concatenate([
                x_bar, P_bar.reshape(T, L, 16), K.reshape(T, L, 8),
                P_hat.reshape(T, L, 16),
                i2f(st_.hist_meas), i2f(st_.hist_ais),
                i2f(st_.hist_mmsi), st_.hist_cnllr,
                st_.hist_x.reshape(T, L, 4 * W)], axis=2)
            pp = payload[tb, parent]
            x_bar_p = pp[:, :, 0:4]
            P_bar_p = pp[:, :, 4:20].reshape(T, L, 4, 4)
            K_p = pp[:, :, 20:28].reshape(T, L, 4, 2)
            P_radar = pp[:, :, 28:44].reshape(T, L, 4, 4)
            h0 = 44
            hist_meas_p = f2i(pp[:, :, h0:h0 + W])
            hist_ais_p = f2i(pp[:, :, h0 + W:h0 + 2 * W])
            hist_mmsi_p = f2i(pp[:, :, h0 + 2 * W:h0 + 3 * W])
            hist_cnllr_p = pp[:, :, h0 + 3 * W:h0 + 4 * W]
            hist_x_p = pp[:, :, h0 + 4 * W:h0 + 8 * W].reshape(T, L, W, 4)
            # spine-forcing block (as in real grow)
            if os.environ.get("BISECT_SPINE", "0") == "1":
                zero_parent = jnp.clip(st_.sel_leaf, 0, L - 1)
                has_zero = st_.leaf_mask[jnp.arange(T), zero_parent]
                zcand = zero_parent * Cn
                beam_pos = jnp.argmax(tix == zcand[:, None], axis=1)
                in_beam = jnp.any(tix == zcand[:, None], axis=1)
                force = has_zero & ~in_beam
                if os.environ.get("BISECT_SPINE") == "2":
                    # read the tiny zero-score plane, not the big concat
                    zscore = zero[jnp.arange(T), zero_parent]
                else:
                    zscore = cand[jnp.arange(T), zero_parent, 0]
                tix = tix.at[:, L - 1].set(
                    jnp.where(force, zcand, tix[:, L - 1]))
                tsc = tsc.at[:, L - 1].set(
                    jnp.where(force, -zscore, tsc[:, L - 1]))
                parent = tix // Cn
                slot = tix % Cn
            radar_m = jnp.clip(slot - 1, 0, M - 1)
            zt_p = scan_t.z[radar_m] - x_bar_p[..., :2]
            x_new = x_bar_p + jnp.einsum('tlij,tlj->tli', K_p, zt_p)
            is_zero = slot == 0
            new_x = jnp.where(is_zero[..., None], x_bar_p, x_new)
            new_P = jnp.where(is_zero[..., None, None], P_bar_p, P_radar)
            top_scores = -tsc
            new_mask = top_scores < 0.5e9
            lbl = jnp.where(is_zero, 0, radar_m + 1)
            lbl = jnp.where(new_mask, lbl, -1)
            def shift(hp, col, fill):
                r = jnp.concatenate([hp[:, :, 1:], col[:, :, None]], axis=2)
                return jnp.where(new_mask[:, :, None], r, fill)
            hist_meas = shift(hist_meas_p, lbl, -1)
            hist_ais = shift(hist_ais_p, jnp.zeros_like(lbl), 0)
            hist_mmsi = shift(hist_mmsi_p, jnp.zeros_like(lbl), 0)
            hist_cnllr = shift(hist_cnllr_p, top_scores, 0.0)
            hx = jnp.concatenate([hist_x_p[:, :, 1:], new_x[:, :, None]],
                                 axis=2)
            hist_x = jnp.where(new_mask[:, :, None, None], hx, 0.0)
            st2 = st_.replace(
                leaf_x=jnp.where(new_mask[..., None], new_x, 0.0),
                leaf_P=jnp.where(new_mask[..., None, None], new_P, 0.0),
                leaf_cnllr=jnp.where(new_mask, top_scores, 0.0),
                leaf_mask=new_mask & st_.tgt_mask[:, None],
                hist_meas=hist_meas, hist_ais=hist_ais,
                hist_mmsi=hist_mmsi, hist_cnllr=hist_cnllr,
                hist_x=hist_x,
                time=scan_t.time)
            return st2, top_scores.sum()
        return jax.lax.scan(body, s, (sc, a))

    def v_payload_full(s, sc, a):
        # variant 3a: the FULL 92-channel payload (incl. bitcast history
        # channels) + gather + history shift_append, no spine/label/state
        def body(st_, inp):
            scan_t, _ = inp
            (x_bar, P_bar, K, P_hat, gate,
             nllr_m) = radar_candidates_planes(st_, scan_t, params)
            W = st_.hist_meas.shape[2]
            zero = jnp.where(st_.leaf_mask, st_.leaf_cnllr + 1.0, 1e9)
            meas = jnp.where(gate, st_.leaf_cnllr[:, :, None] + nllr_m,
                             1e9)
            cand = jnp.concatenate([zero[:, :, None], meas], axis=2)
            Cn = 1 + M
            tsc, tix = jax.lax.top_k(-cand.reshape(T, L * Cn), L)
            parent = tix // Cn
            slot = tix % Cn
            tb = jnp.arange(T)[:, None]
            i2f = lambda x: jax.lax.bitcast_convert_type(x, jnp.float32)
            f2i = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)
            payload = jnp.concatenate([
                x_bar, P_bar.reshape(T, L, 16), K.reshape(T, L, 8),
                P_hat.reshape(T, L, 16),
                i2f(st_.hist_meas), i2f(st_.hist_ais),
                i2f(st_.hist_mmsi), st_.hist_cnllr,
                st_.hist_x.reshape(T, L, 4 * W)], axis=2)
            pp = payload[tb, parent]
            x_bar_p = pp[:, :, 0:4]
            K_p = pp[:, :, 20:28].reshape(T, L, 4, 2)
            h0 = 44
            hist_meas_p = f2i(pp[:, :, h0:h0 + W])
            hist_cnllr_p = pp[:, :, h0 + 3 * W:h0 + 4 * W]
            hist_x_p = pp[:, :, h0 + 4 * W:h0 + 8 * W].reshape(T, L, W, 4)
            radar_m = jnp.clip(slot - 1, 0, M - 1)
            zt_p = scan_t.z[radar_m] - x_bar_p[..., :2]
            x_new = x_bar_p + jnp.einsum('tlij,tlj->tli', K_p, zt_p)
            new_mask = (-tsc) < 0.5e9
            lbl = jnp.where(slot == 0, 0, radar_m + 1)
            hm = jnp.concatenate([hist_meas_p[:, :, 1:], lbl[:, :, None]],
                                 axis=2)
            hm = jnp.where(new_mask[:, :, None], hm, -1)
            hc = jnp.concatenate([hist_cnllr_p[:, :, 1:],
                                  (-tsc)[:, :, None]], axis=2)
            hc = jnp.where(new_mask[:, :, None], hc, 0.0)
            hx = jnp.concatenate([hist_x_p[:, :, 1:], x_new[:, :, None]],
                                 axis=2)
            hx = jnp.where(new_mask[:, :, None, None], hx, 0.0)
            val = (x_new.sum() + hm.sum().astype(jnp.float32) + hc.sum()
                   + hx.sum())
            return fold(st_, val), val
        return jax.lax.scan(body, s, (sc, a))

    def v_full(s, sc, a):
        def body(st_, inp):
            scan_t, _ = inp
            g = grow(st_, scan_t, None, shapes, params)
            return g.state, g.used_meas.sum()
        return jax.lax.scan(body, s, (sc, a))

    timeit("1 candidates", jax.jit(v_cands), st, scans_dev, ais_dev)
    timeit("2 +topk", jax.jit(v_topk), st, scans_dev, ais_dev)
    timeit("3 +payload gather", jax.jit(v_payload), st, scans_dev, ais_dev)
    timeit("3a +hist payload+rolls", jax.jit(v_payload_full), st,
           scans_dev, ais_dev)
    timeit("2r cands+used reductions", jax.jit(v_used), st, scans_dev,
           ais_dev)
    timeit("3s evolving state carry", jax.jit(v_statecarry), st,
           scans_dev, ais_dev)
    timeit("4 full grow", jax.jit(v_full), st, scans_dev, ais_dev)


if __name__ == "__main__":
    main()
