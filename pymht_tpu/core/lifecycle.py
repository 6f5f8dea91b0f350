"""Track lifecycle: N-scan pruning and termination.

N-scan pruning (reference tracker.py:1229-1231, pyTarget.py:330-356):
after selection, the window root advances so at most N scans of branching
remain.  In array form nothing moves: confirmed columns are the oldest
``depth - N`` columns; the leaves that disagree with the selected leaf on
those columns die, the columns are blanked, and their labels are emitted
to the host as the newly *confirmed* track segment (the reference's root
spine).

Termination (reference tracker.py:891-916): a selected track dies when it
leaves radar range, its windowed score rate exceeds the limit, or its
cumulative NLLR exceeds the hard limit.  Dead targets free their slots;
their identity is reported so the host can archive the track.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

from .config import TrackerShapes, TrackerParams
from .state import TrackerState


class PruneOutputs(NamedTuple):
    state: TrackerState
    # Newly confirmed columns of the selected leaf (host appends these to
    # the per-track archives).  Column w valid iff confirmed_mask[t, w].
    confirmed_mask: jnp.ndarray   # [T, W] bool
    confirmed_x: jnp.ndarray      # [T, W, 4] f32
    confirmed_meas: jnp.ndarray   # [T, W] i32
    confirmed_ais: jnp.ndarray    # [T, W] i32
    confirmed_mmsi: jnp.ndarray   # [T, W] i32
    confirmed_cnllr: jnp.ndarray  # [T, W] f32


def n_scan_prune(state: TrackerState, shapes: TrackerShapes,
                 params: TrackerParams) -> PruneOutputs:
    T, L, W = state.hist_meas.shape
    sel = state.sel_leaf
    tb = jnp.arange(T)

    depth = state.tgt_depth                                # [T]
    ncut = jnp.maximum(0, depth - state.tgt_window)        # [T]
    w_ids = jnp.arange(W)[None, :]                         # [1, W]
    col_valid = w_ids >= (W - depth)[:, None]              # [T, W]
    col_cut = col_valid & (w_ids < (W - depth + ncut)[:, None])

    sel_meas = state.hist_meas[tb, sel]                    # [T, W]
    sel_ais = state.hist_ais[tb, sel]
    sel_mmsi = state.hist_mmsi[tb, sel]
    sel_cnllr = state.hist_cnllr[tb, sel]
    sel_x = state.hist_x[tb, sel]                          # [T, W, 4]

    # A leaf survives iff it matches the selected leaf's labels on every
    # confirmed column (i.e. it descends from the new root).
    agree = ((state.hist_meas == sel_meas[:, None, :])
             & (state.hist_ais == sel_ais[:, None, :])
             & (state.hist_mmsi == sel_mmsi[:, None, :]))  # [T, L, W]
    keep = jnp.all(agree | ~col_cut[:, None, :], axis=2)
    leaf_mask = state.leaf_mask & keep

    # New root score: selected leaf's cnllr at the last confirmed column.
    last_cut = W - depth + ncut - 1                        # [T] (valid if ncut>0)
    last_cut_c = jnp.clip(last_cut, 0, W - 1)
    new_root_cnllr = jnp.where(ncut > 0,
                               sel_cnllr[tb, last_cut_c],
                               state.tgt_root_cnllr)

    # Promote any MMSI confirmed out of the window into the track identity.
    cut_mmsi = jnp.where(col_cut, sel_mmsi, 0)
    new_tgt_mmsi = jnp.maximum(state.tgt_mmsi, jnp.max(cut_mmsi, axis=1))

    # Blank confirmed columns for all leaves.
    cut3 = col_cut[:, None, :]
    hist_meas = jnp.where(cut3, -1, state.hist_meas)
    hist_ais = jnp.where(cut3, 0, state.hist_ais)
    hist_mmsi = jnp.where(cut3, 0, state.hist_mmsi)
    hist_cnllr = jnp.where(cut3, 0.0, state.hist_cnllr)
    hist_x = jnp.where(cut3[..., None], 0.0, state.hist_x)

    new_state = state.replace(
        leaf_mask=leaf_mask,
        hist_meas=hist_meas, hist_ais=hist_ais, hist_mmsi=hist_mmsi,
        hist_cnllr=hist_cnllr, hist_x=hist_x,
        tgt_depth=depth - ncut,
        tgt_root_cnllr=new_root_cnllr,
        tgt_mmsi=new_tgt_mmsi,
    )
    active = state.tgt_mask
    return PruneOutputs(
        state=new_state,
        confirmed_mask=col_cut & active[:, None],
        confirmed_x=sel_x,
        confirmed_meas=sel_meas,
        confirmed_ais=sel_ais,
        confirmed_mmsi=sel_mmsi,
        confirmed_cnllr=sel_cnllr,
    )


class TerminateOutputs(NamedTuple):
    state: TrackerState
    dead: jnp.ndarray        # [T] bool — terminated this scan
    reason: jnp.ndarray      # [T] i32 — 0 alive, 1 range, 2 score, 3 cnllr


def terminate(state: TrackerState, shapes: TrackerShapes,
              params: TrackerParams) -> TerminateOutputs:
    T = state.tgt_mask.shape[0]
    tb = jnp.arange(T)
    sel_x = state.leaf_x[tb, state.sel_leaf]               # [T, 4]
    sel_cnllr = state.leaf_cnllr[tb, state.sel_leaf]

    pos = jnp.asarray(params.position, jnp.float32)
    rng = params.radar_range
    out_of_range = (jnp.linalg.norm(sel_x[:, :2] - pos, axis=1) > rng
                    if math.isfinite(rng)
                    else jnp.zeros((T,), bool))

    score = (sel_cnllr - state.tgt_root_cnllr) / (params.N + 1)
    bad_score = score > params.score_upper_limit
    bad_cnllr = sel_cnllr > params.cnllr_upper_limit

    dead = state.tgt_mask & (out_of_range | bad_score | bad_cnllr)
    reason = jnp.where(out_of_range, 1,
                       jnp.where(bad_score, 2,
                                 jnp.where(bad_cnllr, 3, 0)))
    reason = jnp.where(dead, reason, 0)

    new_state = state.replace(
        tgt_mask=state.tgt_mask & ~dead,
        leaf_mask=state.leaf_mask & ~dead[:, None],
        tgt_id=jnp.where(dead, -1, state.tgt_id),
    )
    return TerminateOutputs(state=new_state, dead=dead, reason=reason)
