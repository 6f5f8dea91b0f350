"""Batched auction algorithm for global-nearest-neighbour assignment.

The reference solves its initiator GNN with an external Cython/C++
Hungarian solver (munkres, /root/reference/pymht/initiators/m_of_n.py:24-104)
after bigM-padding the gated cost matrix.  Here the same problem — pick a
minimum-cost matching among the gated (row, col) pairs, rows may stay
unassigned — is solved in two bounded stages:

1. a single-phase Jacobi parallel auction (every unassigned row bids for
   its best column, columns go to the highest bidder, prices rise by at
   least eps) under a MODEST iteration cap.  The cap is a latency
   budget: the auction runs inside the per-scan jit, and its
   unassignment-by-price-out semantics make convergence time unbounded
   on over-subscribed components (losing rows must bid prices past a
   bigM-scale profitability threshold in eps steps — measured round 3:
   the old 1024-iteration floor alone cost ~10 ms/scan on TPU, with the
   loop hitting the cap every scan).  Within the cap the auction
   resolves the geometric common case at eps-optimal cost.
2. an EXACT maximum-cardinality completion: alternating-path
   augmentation (BFS over the gated bipartite graph from every
   unassigned row, flip one augmenting path per round) until no
   augmenting path exists.  This is Berge's theorem run on device —
   when it stops, cardinality equals the Hungarian oracle's, so
   solvable rows are never silently dropped (round-2 verdict item 8;
   the reference Hungarian never drops, m_of_n.py:63).  When the
   auction converged (the common case) the first BFS finds no
   augmenting path and the loop exits after one cheap round.

Cost optimality therefore degrades gracefully at the cap (tested up to
dense tie-heavy squares), while cardinality is always exact and the
total iteration count is bounded by cap + paths*diameter.
Fixed-shape, while_loop-friendly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NEG = jnp.float32(-1e9)


def auction_assign(cost, valid, max_iters: int = 4000):
    """Min-cost bipartite matching with unassignment allowed.

    cost: [R, C] f32; valid: [R, C] bool (gated pairs).
    Returns row_to_col [R] i32 (-1 = unassigned).

    Semantics match the reference's bigM-padded Hungarian + post filter:
    maximum cardinality over gated pairs (exact, via the augmentation
    stage), minimum total cost among those matchings (within n*eps on
    instances the auction resolves inside its iteration cap).
    """
    R, C = cost.shape
    cmax = jnp.max(jnp.where(valid, cost, 0.0))
    cmin = jnp.min(jnp.where(valid, cost, cmax))
    span = jnp.maximum(cmax - cmin, 1.0)
    # K far above the span so every valid pair is worth taking (prices
    # never overshoot profitability within the iteration cap).
    K = cmax + span * (R + 1)
    value = jnp.where(valid, K - cost, NEG)               # maximize value
    n = max(R, C)
    # n*eps-optimal; ONE phase.  Bertsekas eps-scaling with carried
    # prices interacts badly with profitable drop-out in this
    # asymmetric problem: coarse-phase price overshoot never decays and
    # pushes rows below the 0-profit dropout threshold, losing both
    # cardinality and optimality (measured, round 3) — so we keep the
    # exact single small-eps phase and bound it by the cap.
    eps = span / jnp.float32(2.0 * (n + 1) * (n + 1))

    def phase_body(carry):
        # Scatter-free iteration: every update is a dense one-hot
        # compare/select on [R, C] — scatters inside loop bodies are the
        # expensive op class on TPU (measured cost model, CLAUDE.md).
        price, owner, row_of, it = carry
        unassigned = row_of < 0                            # [R]
        net = value - price[None, :]                       # [R, C]
        best_col = jnp.argmax(net, axis=1)                 # [R]
        best_val = jnp.max(net, axis=1)
        onehot_best = jnp.arange(C)[None, :] == best_col[:, None]  # [R,C]
        second_val = jnp.maximum(
            jnp.max(jnp.where(onehot_best, NEG, net), axis=1), 0.0)
        wants = unassigned & (best_val > 0.0)              # profitable bid
        bid_price = price[best_col] + best_val - second_val + eps

        bid_matrix = jnp.where(wants[:, None] & onehot_best,
                               bid_price[:, None], NEG)    # [R, C]
        col_best_bid = jnp.max(bid_matrix, axis=0)         # [C]
        col_winner = jnp.argmax(bid_matrix, axis=0)        # [C]
        col_has_bid = col_best_bid > NEG * 0.5

        # Rows displaced from a column that was re-bid this round.
        displaced = col_has_bid & (owner >= 0)
        row_displaced = jnp.any(
            (jnp.arange(R)[:, None] == owner[None, :]) & displaced[None, :],
            axis=1)                                        # [R]
        # Winning bidders take their column (a winner was unassigned, so
        # it is never simultaneously displaced).
        win_matrix = ((jnp.arange(R)[:, None] == col_winner[None, :])
                      & col_has_bid[None, :])              # [R, C]
        row_won = jnp.any(win_matrix, axis=1)
        row_new_col = jnp.argmax(win_matrix, axis=1)
        row_of = jnp.where(row_won, row_new_col,
                           jnp.where(row_displaced, -1, row_of))
        owner = jnp.where(col_has_bid, col_winner, owner)
        price = jnp.where(col_has_bid, col_best_bid, price)
        return price, owner, row_of, it + 1

    def phase_cond(carry):
        price, owner, row_of, it = carry
        net = value - price[None, :]
        can_bid = (row_of < 0) & (jnp.max(net, axis=1) > 0.0)
        return (it < max_iters) & jnp.any(can_bid)

    price, owner, row_of, _ = jax.lax.while_loop(
        phase_cond, phase_body,
        (jnp.zeros((C,), jnp.float32),
         jnp.full((C,), -1, jnp.int32),
         jnp.full((R,), -1, jnp.int32),
         jnp.asarray(0)))

    # Safety: never return an invalid pair (possible only at iteration
    # caps with pathological ties).
    ok = valid[jnp.arange(R), jnp.clip(row_of, 0, C - 1)] & (row_of >= 0)
    row_of = jnp.where(ok, row_of, -1)
    owner = jnp.full((C,), -1, jnp.int32).at[
        jnp.where(row_of >= 0, row_of, C)].set(
            jnp.arange(R), mode='drop')

    # Cost-aware greedy completion first: unassigned rows claim their
    # cheapest FREE valid column (no displacement).  These are the
    # length-1 augmenting paths — taking them by cost keeps the
    # cap-truncated matching near the oracle's total before the
    # cost-blind displacement stage below.  Exits immediately when the
    # auction converged (then no unassigned row has a free valid column).
    INF = jnp.float32(1e9)
    c = jnp.where(valid, cost, INF)

    def comp_cond(carry):
        row_of, owner, it = carry
        open_ = (~(owner >= 0))[None, :] & (c < INF * 0.5) \
            & (row_of < 0)[:, None]
        return (it < R) & jnp.any(open_)

    def comp_body(carry):
        row_of, owner, it = carry
        cc = jnp.where((owner >= 0)[None, :], INF, c)
        best_c = jnp.argmin(cc, axis=1)                    # [R]
        best_v = jnp.min(cc, axis=1)
        wants = (row_of < 0) & (best_v < INF * 0.5)
        bid = jnp.where(
            wants[:, None] & (jnp.arange(C)[None, :] == best_c[:, None]),
            c, INF)                                        # [R, C]
        win_r = jnp.argmin(bid, axis=0)                    # [C]
        has = jnp.min(bid, axis=0) < INF * 0.5
        win_matrix = ((jnp.arange(R)[:, None] == win_r[None, :])
                      & has[None, :])                      # [R, C]
        row_won = jnp.any(win_matrix, axis=1)
        row_of = jnp.where(row_won, jnp.argmax(win_matrix, axis=1), row_of)
        owner = jnp.where(has, win_r, owner)
        return row_of, owner, it + 1

    row_of, owner, _ = jax.lax.while_loop(
        comp_cond, comp_body, (row_of, owner, jnp.asarray(0)))

    return _augment_to_max_cardinality(valid, row_of, owner)


def _augment_to_max_cardinality(valid, row_of, owner):
    """Alternating-path augmentation to exact maximum cardinality.

    Repeats {BFS from all unassigned rows over (valid edge -> matched
    edge) layers until a FREE column is reached; flip that augmenting
    path} until no augmenting path exists (Berge: the matching is then
    maximum).  All loops are fixed-shape lax.while_loops: the outer loop
    runs (paths found + 1) times, the BFS at most min(R,C)+1 layers, the
    flip walks one path.  On an already-maximum matching (the common
    case after the auction) the first BFS exhausts without reaching a
    free column and the loop exits after one round.
    """
    R, C = valid.shape
    max_layers = min(R, C) + 1

    def bfs(row_of, owner):
        """One BFS.  Returns (found, free_col, col_parent)."""
        vis_rows = row_of < 0                              # sources
        vis_cols = jnp.zeros((C,), bool)
        col_parent = jnp.full((C,), -1, jnp.int32)

        def bfs_body(carry):
            vis_rows, vis_cols, col_parent, frontier, it = carry
            # rows in `frontier` expand along valid edges to new cols
            reach = jnp.any(frontier[:, None] & valid, axis=0)  # [C]
            new_cols = reach & ~vis_cols
            # parent row for each newly reached col (any reaching row)
            par = jnp.argmax(frontier[:, None] & valid, axis=0)  # [C]
            col_parent = jnp.where(new_cols, par, col_parent)
            vis_cols = vis_cols | new_cols
            # matched edges: owners of newly visited (non-free) cols
            nr = jnp.any(
                (jnp.arange(R)[:, None] == owner[None, :])
                & (new_cols & (owner >= 0))[None, :], axis=1)
            new_rows = nr & ~vis_rows
            vis_rows = vis_rows | new_rows
            return vis_rows, vis_cols, col_parent, new_rows, it + 1

        def bfs_cond(carry):
            vis_rows, vis_cols, col_parent, frontier, it = carry
            free_hit = jnp.any(vis_cols & (owner < 0))
            return (~free_hit) & jnp.any(frontier) & (it < max_layers)

        vis_rows, vis_cols, col_parent, _, _ = jax.lax.while_loop(
            bfs_cond, bfs_body,
            (vis_rows, vis_cols, col_parent, vis_rows, jnp.asarray(0)))
        free_cols = vis_cols & (owner < 0)
        found = jnp.any(free_cols)
        free_col = jnp.argmax(free_cols)
        return found, free_col, col_parent

    def flip(row_of, owner, end_col, col_parent):
        """Flip the augmenting path ending at free column end_col."""
        def flip_body(carry):
            c, row_of, owner = carry
            r = col_parent[c]
            c_prev = row_of[r]            # -1 once r is a source row
            row_of = row_of.at[r].set(c)
            owner = owner.at[c].set(r)
            return c_prev, row_of, owner

        def flip_cond(carry):
            c, _, _ = carry
            return c >= 0

        _, row_of, owner = jax.lax.while_loop(
            flip_cond, flip_body, (end_col, row_of, owner))
        return row_of, owner

    def outer_body(carry):
        row_of, owner, _ = carry
        found, end_col, col_parent = bfs(row_of, owner)
        row_of, owner = jax.lax.cond(
            found,
            lambda: flip(row_of, owner, end_col, col_parent),
            lambda: (row_of, owner))
        return row_of, owner, found

    def outer_cond(carry):
        _, _, more = carry
        return more

    row_of, _, _ = jax.lax.while_loop(
        outer_cond, outer_body, (row_of, owner, jnp.asarray(True)))
    return row_of
