"""Host-side exact selection oracles for gap validation.

The reference solves its per-cluster ILP with OR-Tools CBC
(/root/reference/pymht/tracker.py:1155-1217); our production solve is
on-device.  For validation we keep two host oracles: the native C++
branch-and-bound (pymht_tpu/native, good for small instances with a
proven-optimal flag) and this scipy/HiGHS MILP formulation which scales
to full bench-size forests in seconds.
"""
from __future__ import annotations

import numpy as np


def milp_select_oracle(state, shapes, params, time_limit=120.0):
    """Exact global-hypothesis selection via scipy.optimize.milp (HiGHS).

    Returns (sel [T], objective_over_active_targets, proven_optimal).
    Mirrors the on-device problem exactly: one leaf per target,
    single-use (window-scan, measurement) slots.
    """
    from scipy import sparse
    from scipy.optimize import milp, LinearConstraint, Bounds
    from ..core.select import _slot_index, leaf_scores

    f = np.asarray(leaf_scores(state, params)).astype(np.float64)
    lmask = np.asarray(state.leaf_mask)
    tgt = np.asarray(state.tgt_mask)
    slots, n_slots = _slot_index(state, shapes)
    slots_flat = np.asarray(slots).reshape(f.shape[0], f.shape[1], -1)
    T, L = f.shape
    n = T * L
    fo = np.where(lmask, f, 1e7).reshape(-1)
    for t in range(T):
        if not tgt[t]:
            fo[t * L] = 0.0
    rows, cols = [], []
    for j in range(n):
        t, l = divmod(j, L)
        if not tgt[t] or not lmask[t, l]:
            continue
        for s in set(int(x) for x in slots_flat[t, l] if x < n_slots):
            rows.append(s)
            cols.append(j)
    A_in = sparse.csr_matrix((np.ones(len(rows)), (rows, cols)),
                             shape=(n_slots, n))
    A_eq = sparse.csr_matrix(
        (np.ones(n), (np.arange(n) // L, np.arange(n))), shape=(T, n))
    cons = [LinearConstraint(A_eq, 1, 1),
            LinearConstraint(A_in, -np.inf, 1)]
    res = milp(fo, constraints=cons, integrality=np.ones(n),
               bounds=Bounds(0, 1), options={'time_limit': time_limit})
    if res.x is None:
        return None, float('nan'), False
    sel = res.x.reshape(T, L).argmax(axis=1)
    obj = float(sum(fo[t * L + sel[t]] for t in range(T) if tgt[t]))
    return sel, obj, bool(res.status == 0)


def selection_gap(state, shapes, params, time_limit=120.0):
    """Relative gap of the device's current selection vs the MILP oracle
    on the same forest; None if the oracle failed."""
    sel_o, obj_o, optimal = milp_select_oracle(state, shapes, params,
                                               time_limit)
    if sel_o is None or not optimal:
        return None
    from ..core.select import leaf_scores
    f = np.asarray(leaf_scores(state, params)).astype(np.float64)
    tgt = np.asarray(state.tgt_mask)
    sel_dev = np.asarray(state.sel_leaf)
    obj_dev = float(sum(f[t, sel_dev[t]] for t in range(f.shape[0])
                        if tgt[t]))
    return (obj_dev - obj_o) / max(1.0, abs(obj_o))
