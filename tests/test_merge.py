"""Similar-state merging tests (reference pruneSimilarState semantics)."""
import numpy as np
import jax.numpy as jnp

from pymht_tpu.core.config import TrackerShapes, TrackerParams
from pymht_tpu.core.state import empty_state, insert_targets
from pymht_tpu.core.merge import prune_similar
from pymht_tpu.models import pv

SHAPES = TrackerShapes(max_targets=4, max_leaves=8, max_meas=8,
                       max_ais=2, window=4)
PARAMS = TrackerParams(prune_threshold=4.0)


def _state_with_leaves(positions, last_labels, prefix_label=1, mmsi=None):
    """Build a single-target state with given leaf positions and current
    labels; all leaves share the history prefix."""
    st = empty_state(SHAPES, PARAMS)
    T, L, W = st.hist_meas.shape
    n = len(positions)
    leaf_x = np.zeros((T, L, 4), np.float32)
    leaf_mask = np.zeros((T, L), bool)
    hist_meas = np.full((T, L, W), -1, np.int32)
    hist_mmsi = np.zeros((T, L, W), np.int32)
    cnllr = np.zeros((T, L), np.float32)
    for i, p in enumerate(positions):
        leaf_x[0, i, :2] = p
        leaf_mask[0, i] = True
        hist_meas[0, i, W - 2] = prefix_label
        hist_meas[0, i, W - 1] = last_labels[i]
        if mmsi and mmsi[i]:
            hist_mmsi[0, i, W - 1] = mmsi[i]
        cnllr[0, i] = float(i)
    return st.replace(
        leaf_x=jnp.asarray(leaf_x), leaf_mask=jnp.asarray(leaf_mask),
        hist_meas=jnp.asarray(hist_meas), hist_mmsi=jnp.asarray(hist_mmsi),
        leaf_cnllr=jnp.asarray(cnllr),
        hist_cnllr=jnp.asarray(np.broadcast_to(cnllr[..., None],
                                               (T, L, W)).copy()),
        tgt_mask=jnp.asarray(np.array([True, False, False, False])),
        tgt_depth=jnp.asarray(np.array([2, 0, 0, 0], np.int32)),
        # point the feasibility spine at an unused slot so these tests
        # exercise plain merge semantics (see test_spine_exempt)
        spine_leaf=jnp.full((T,), L - 1, jnp.int32),
    )


def test_close_siblings_merge():
    st = _state_with_leaves([(0, 0), (1, 0), (100, 0)], [1, 2, 3])
    out = prune_similar(st, SHAPES, PARAMS)
    mask = np.asarray(out.leaf_mask[0])
    assert mask[0] and not mask[1] and mask[2]
    # representative takes the group mean state and cnllr
    np.testing.assert_allclose(np.asarray(out.leaf_x[0, 0, :2]), [0.5, 0.0])
    np.testing.assert_allclose(float(out.leaf_cnllr[0, 0]), 0.5)


def test_ais_leaves_exempt():
    st = _state_with_leaves([(0, 0), (1, 0)], [1, 2], mmsi=[0, 123456789])
    out = prune_similar(st, SHAPES, PARAMS)
    mask = np.asarray(out.leaf_mask[0])
    assert mask.sum() == 2  # AIS leaf not merged


def test_spine_exempt():
    """The feasibility spine (zero-hyp child of the previously selected
    leaf) must never be absorbed by similar-state merging — selection
    conflict repair relies on its existence."""
    st = _state_with_leaves([(0, 0), (1, 0)], [0, 2])
    st = st.replace(spine_leaf=jnp.zeros_like(st.spine_leaf))  # leaf 0
    out = prune_similar(st, SHAPES, PARAMS)
    assert np.asarray(out.leaf_mask[0]).sum() == 2


def test_different_prefix_not_merged():
    st = _state_with_leaves([(0, 0), (1, 0)], [1, 2])
    # change prefix of second leaf
    hm = np.asarray(st.hist_meas).copy()
    hm[0, 1, -2] = 5
    out = prune_similar(st.replace(hist_meas=jnp.asarray(hm)),
                        SHAPES, PARAMS)
    assert np.asarray(out.leaf_mask[0]).sum() == 2
