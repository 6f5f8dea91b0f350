"""Tracking-quality gates over the BASELINE scenario families
(round-2 verdict item 4): regressions in rms / coverage / false tracks
/ track loss now fail CI instead of passing silently.  Thresholds sit
just below the measured small-scale numbers (round 3, seeded):

  1_crossing       rms 2.83  track% 0.765  false 0  loss 0
  2_10tgt_clutter  rms 4.96  track% 0.665  false 1  loss 0
  5_ais_swarm      rms 4.05  track% 0.730  false 0  loss 0

track_percent is initiation-limited (~0.81 ceiling at 16 scans: tracks
confirm from an empty tracker after ~3 scans).  The reference measures
the same vocabulary via its XML pipeline
(/root/reference/pymht/utils/xmlDefinitions.py:44-64).
"""
import sys
import os

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def eval_mod():
    import eval_configs
    return eval_configs


def test_config1_crossing_quality(eval_mod):
    small = dict(max_targets=16, max_leaves=32, max_meas=64, max_ais=4,
                 window=7, max_prelim=16, max_initiators=64)
    m = eval_mod.run_config("1_crossing", 2, 0.0, 1.0, 5, small,
                            radar_range=2000.0)
    # pinned to round-3 measured 0.765 / 2.83 minus ~5% (verdict item 5)
    assert m['track_percent'] >= 0.72, m
    assert m['rms'] <= 3.1, m
    assert m['n_false_tracks'] == 0, m
    assert m['track_loss'] == 0.0, m
    assert m['median_gap'] <= 1e-3, m


def test_config2_clutter_quality_and_ipm_crosscheck(eval_mod):
    small = dict(max_targets=16, max_leaves=32, max_meas=64, max_ais=4,
                 window=7, max_prelim=16, max_initiators=64)
    m = eval_mod.run_config("2_10tgt_clutter", 10, 2e-6, 0.9, 5, small)
    # pinned to round-3 measured 0.665 / 4.96 minus ~5% (verdict item 5)
    assert m['track_percent'] >= 0.63, m
    assert m['rms'] <= 5.4, m
    assert m['n_false_tracks'] <= 2, m
    assert m['track_loss'] == 0.0, m
    # production lagrangian must match the dense-IPM debug path
    x = eval_mod.run_config("2_ipm_xcheck", 10, 2e-6, 0.9, 5, small,
                            method='ipm')
    assert abs(m['track_percent'] - x['track_percent']) <= 0.05, (m, x)
    assert abs(m['rms'] - x['rms']) <= 0.5, (m, x)


def test_config5_ais_swarm_quality(eval_mod):
    small = dict(max_targets=16, max_leaves=32, max_meas=64, max_ais=4,
                 window=7, max_prelim=16, max_initiators=64)
    # max_ais sized to the scenario's peak AIS rate (12 msgs/scan) —
    # an undersized static cap silently drops messages (round-4 parity
    # finding: A=4 cost ~0.06 track_percent and 2 whole tracks here)
    m = eval_mod.run_config("5_ais_swarm", 12, 1e-6, 0.9, 4,
                            dict(small, max_ais=16),
                            use_ais=True, radar_range=1500.0)
    # pinned to round-4 measured 0.784 / 3.85 minus ~5%
    assert m['track_percent'] >= 0.74, m
    assert m['rms'] <= 4.1, m
    assert m['track_loss'] == 0.0, m
    assert m['n_false_tracks'] <= 1, m
