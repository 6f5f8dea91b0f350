"""Host-side port of the reference's per-scan DECISION logic, used as a
parity oracle for the device tracker.

This is a deliberately slow, readable numpy reimplementation of the
reference pipeline — full hypothesis trees (no beam), exact per-cluster
ILP via scipy/HiGHS instead of OR-Tools CBC — so tests can assert that
the TPU tracker selects the same global hypothesis (within the solver
optimality gap) on whole scenarios:

* grow:      /root/reference/pymht/tracker.py:309-415, pyTarget.py:227-295
* scoring:   /root/reference/pymht/utils/kalman.py:14-22 (nllr),
             pyTarget.py:319-328 (zero hypothesis, -ln(1-P_d))
* cluster:   /root/reference/pymht/tracker.py:961-974
* optimise:  /root/reference/pymht/tracker.py:979-1217 (A1/A2/C + ILP)
* N-scan prune: /root/reference/pymht/tracker.py:1229-1231,
             pyTarget.py:343-356
The reference itself cannot run here (ortools/munkres/pykalman are not
installed), hence this port.  Track initiation and AIS fusion are out of
scope — parity scenarios pre-initialize all targets and use radar only.
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from ..models import pv


@dataclass
class Node:
    x: np.ndarray             # [4] state estimate
    P: np.ndarray             # [4,4]
    cnllr: float              # cumulative NLLR since birth
    meas: int                 # 0 = missed detection, m >= 1 = measurement m-1
    scan: int                 # scan index of this node
    parent: Optional["Node"] = None
    children: list = field(default_factory=list)

    def leaves(self):
        if not self.children:
            return [self]
        out = []
        for c in self.children:
            out.extend(c.leaves())
        return out

    def path(self):
        n, out = self, []
        while n is not None:
            out.append(n)
            n = n.parent
        return out[::-1]


class RefOracle:
    """Full-tree tracker with exact per-cluster selection."""

    def __init__(self, params, sigma_R: float = None):
        self.params = params
        self.C = np.asarray(pv.C_RADAR, np.float64)
        self.R = np.asarray(pv.R_RADAR(sigma_R) if sigma_R is not None
                            else pv.R_RADAR(), np.float64)
        self.roots = []            # tree root per target
        self.sel = []              # selected leaf per target
        self.time = None
        self.scan_idx = 0

    def pre_initialize(self, t, states):
        self.time = float(t)
        for x in states:
            n = Node(x=np.asarray(x, np.float64),
                     P=np.asarray(pv.P0, np.float64),
                     cnllr=0.0, meas=0, scan=0)
            self.roots.append(n)
            self.sel.append(n)

    # -- growth (tracker.py:309-415) ----------------------------------
    def _grow_target(self, root, z, dt):
        F = np.asarray(pv.Phi(dt), np.float64)
        Q = np.asarray(pv.Q(dt), np.float64)
        p = self.params
        lam_ex = p.lambda_ex
        nllr_missed = -math.log(1.0 - p.P_d)
        for leaf in root.leaves():
            x_bar = F @ leaf.x
            P_bar = F @ leaf.P @ F.T + Q
            S = self.C @ P_bar @ self.C.T + self.R
            S_inv = np.linalg.inv(S)
            K = P_bar @ self.C.T @ S_inv
            P_hat = P_bar - K @ self.C @ P_bar
            # zero hypothesis (pyTarget.py:319-328)
            leaf.children.append(Node(
                x=x_bar, P=P_bar, cnllr=leaf.cnllr + nllr_missed,
                meas=0, scan=self.scan_idx, parent=leaf))
            # gated radar children (pyTarget.py:242-254)
            zt = z - (self.C @ x_bar)[None, :]              # [M,2]
            nis = np.einsum('mi,ij,mj->m', zt, S_inv, zt)
            # nllr (kalman.py:14-22)
            nllr = 0.5 * nis + math.log(
                lam_ex * math.sqrt(np.linalg.det(2 * math.pi * S)) / p.P_d)
            for m in np.nonzero(nis <= p.eta2)[0]:
                leaf.children.append(Node(
                    x=x_bar + K @ zt[m], P=P_hat,
                    cnllr=leaf.cnllr + float(nllr[m]),
                    meas=int(m) + 1, scan=self.scan_idx,
                    parent=leaf))

    # -- clustering + exact selection ----------------------------------
    def _meas_set(self, root):
        """All (scan, meas) pairs any leaf of this tree associates
        (reference getMeasurementSet, pyTarget.py:414-430)."""
        out = set()
        for leaf in root.leaves():
            for n in leaf.path():
                if n.meas >= 1:
                    out.add((n.scan, n.meas))
        return out

    def _clusters(self):
        """Connected components over shared measurements
        (tracker.py:961-974)."""
        sets = [self._meas_set(r) for r in self.roots]
        n = len(sets)
        parent = list(range(n))

        def find(i):
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        for i in range(n):
            for j in range(i + 1, n):
                if sets[i] & sets[j]:
                    pi, pj = find(i), find(j)
                    if pi != pj:
                        parent[pi] = pj
        groups = {}
        for i in range(n):
            groups.setdefault(find(i), []).append(i)
        return list(groups.values())

    def _solve_cluster(self, members):
        """Exact per-cluster ILP (tracker.py:979-1217) via HiGHS."""
        leaves = []
        owner = []
        for t in members:
            for leaf in self.roots[t].leaves():
                leaves.append(leaf)
                owner.append(t)
        if len(members) == 1:
            # singleton: best hypothesis (pyTarget.py:446-459)
            best = min(range(len(leaves)), key=lambda i: leaves[i].cnllr)
            self.sel[members[0]] = leaves[best]
            return
        from scipy import sparse
        from scipy.optimize import milp, LinearConstraint, Bounds
        nv = len(leaves)
        f = np.array([leaf.cnllr for leaf in leaves])
        slots = {}
        rows, cols = [], []
        for j, leaf in enumerate(leaves):
            for n in leaf.path():
                if n.meas >= 1:
                    s = slots.setdefault((n.scan, n.meas), len(slots))
                    rows.append(s)
                    cols.append(j)
        A1 = sparse.csr_matrix((np.ones(len(rows)), (rows, cols)),
                               shape=(len(slots), nv))
        t_index = {t: i for i, t in enumerate(members)}
        A2 = sparse.csr_matrix(
            (np.ones(nv), ([t_index[o] for o in owner], range(nv))),
            shape=(len(members), nv))
        res = milp(f, constraints=[LinearConstraint(A2, 1, 1),
                                   LinearConstraint(A1, -np.inf, 1)],
                   integrality=np.ones(nv), bounds=Bounds(0, 1))
        assert res.x is not None and res.status == 0, "oracle ILP failed"
        chosen = np.nonzero(res.x > 0.5)[0]
        for j in chosen:
            self.sel[owner[j]] = leaves[j]

    # -- N-scan prune (tracker.py:1229-1231, pyTarget.py:343-356) ------
    def _prune(self):
        N = self.params.N
        for t, leaf in enumerate(self.sel):
            path = leaf.path()
            if len(path) - 1 > N:
                new_root = path[len(path) - 1 - N]
                new_root.parent = None
                self.roots[t] = new_root

    # -- per-scan main loop (tracker.py:162-307) -----------------------
    def step(self, t, z):
        z = np.asarray(z, np.float64).reshape(-1, 2)
        dt = float(t) - self.time
        self.scan_idx += 1
        for root in self.roots:
            self._grow_target(root, z, dt)
        for members in self._clusters():
            self._solve_cluster(members)
        self._prune()
        self.time = float(t)
        return [(leaf.meas, leaf.x.copy(), leaf.cnllr)
                for leaf in self.sel]

    def objective(self):
        return float(sum(leaf.cnllr for leaf in self.sel))
