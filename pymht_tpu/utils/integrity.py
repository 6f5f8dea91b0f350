"""Structural invariants of the forest state — the array analogue of the
reference's _checkTrackerIntegrity / Target integrity checks
(tracker.py:1241-1271, pyTarget.py:489-527).  Used by tests every scan
and exposed as Tracker.check_integrity().
"""
import numpy as np


def check_state_integrity(tracker):
    st = tracker.state
    shapes = tracker.shapes
    T, L, W = shapes.max_targets, shapes.max_leaves, shapes.window
    tgt_mask = np.asarray(st.tgt_mask)
    leaf_mask = np.asarray(st.leaf_mask)
    depth = np.asarray(st.tgt_depth)
    hist_meas = np.asarray(st.hist_meas)
    hist_mmsi = np.asarray(st.hist_mmsi)
    cnllr = np.asarray(st.leaf_cnllr)
    hist_cnllr = np.asarray(st.hist_cnllr)
    sel = np.asarray(st.sel_leaf)
    ids = np.asarray(st.tgt_id)

    # leaves only on active targets
    assert not (leaf_mask & ~tgt_mask[:, None]).any()
    # every active target has >= 1 leaf
    assert (leaf_mask.any(axis=1) | ~tgt_mask).all()
    # selected leaf is live
    for t in np.nonzero(tgt_mask)[0]:
        assert leaf_mask[t, sel[t]]
    # track ids unique among active
    active_ids = ids[tgt_mask]
    assert len(set(active_ids.tolist())) == len(active_ids)
    # depth bounds + column alignment: valid labels exactly in the last
    # `depth` columns
    for t in np.nonzero(tgt_mask)[0]:
        assert 0 <= depth[t] <= W
        for l in np.nonzero(leaf_mask[t])[0]:
            labels = hist_meas[t, l]
            assert (labels[:W - depth[t]] == -1).all(), (t, l, labels)
            assert (labels[W - depth[t]:] >= 0).all(), (t, l, labels)
        # distinct leaves have distinct window histories (trie property)
        live = np.nonzero(leaf_mask[t])[0]
        sigs = {tuple(hist_meas[t, l].tolist())
                + tuple(np.asarray(tracker.state.hist_ais)[t, l].tolist())
                for l in live}
        assert len(sigs) == len(live)
        # single MMSI per path
        for l in live:
            ms = set(hist_mmsi[t, l][hist_mmsi[t, l] > 0].tolist())
            tm = int(np.asarray(st.tgt_mmsi)[t])
            if tm > 0:
                ms.add(tm)
            assert len(ms) <= 1, (t, l, ms)
    # finite scores; history cnllr of last column == leaf cnllr
    assert np.isfinite(cnllr[leaf_mask]).all()
    np.testing.assert_allclose(hist_cnllr[:, :, -1][leaf_mask],
                               cnllr[leaf_mask], rtol=1e-5)


