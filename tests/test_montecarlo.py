"""Device-batched Monte-Carlo scenario generation + batched tracking."""
import numpy as np
import jax
import jax.numpy as jnp

from pymht_tpu.core.config import TrackerShapes, TrackerParams
from pymht_tpu.parallel import montecarlo as mc


SHAPES = TrackerShapes(max_targets=8, max_leaves=16, max_meas=24,
                       max_ais=2, window=6, max_prelim=8, max_initiators=24)
PARAMS = TrackerParams(radar_period=2.5, P_d=0.95, lambda_phi=1e-6,
                       lambda_nu=1e-5, N=4, radar_range=500.0)


def test_generate_shapes_and_determinism():
    key = jax.random.PRNGKey(0)
    s1 = mc.generate(key, batch=4, n_targets=3, n_scans=6, shapes=SHAPES,
                     params=PARAMS, radar_range=500.0)
    s2 = mc.generate(key, batch=4, n_targets=3, n_scans=6, shapes=SHAPES,
                     params=PARAMS, radar_range=500.0)
    assert s1.z.shape == (4, 6, 24, 2)
    np.testing.assert_array_equal(np.asarray(s1.z), np.asarray(s2.z))
    np.testing.assert_array_equal(np.asarray(s1.z_mask), np.asarray(s2.z_mask))
    # detections present for most targets (P_d=0.95)
    det_rate = np.asarray(s1.z_mask[:, :, :3]).mean()
    assert det_rate > 0.8


def test_run_batch_tracks_truth():
    key = jax.random.PRNGKey(7)
    sc = mc.generate(key, batch=4, n_targets=3, n_scans=8, shapes=SHAPES,
                     params=PARAMS, radar_range=500.0, sigma_Q=0.05)
    state_b, xs, ms = mc.run_batch(sc, SHAPES, PARAMS)
    xs = np.asarray(xs)            # [S, B, T, 4]
    ms = np.asarray(ms)
    truth = np.asarray(sc.truth)   # [B, S, K, 4]
    S, B = xs.shape[0], xs.shape[1]
    # at the final scan, every pre-initialised target slot should track
    # its truth within a loose bound (slots 0..K-1 align with truth ids)
    errs = []
    for b in range(B):
        for k in range(3):
            if ms[-1, b, k]:
                errs.append(np.linalg.norm(xs[-1, b, k, :2]
                                           - truth[b, -1, k, :2]))
    assert len(errs) >= 8, "most tracks should survive"
    assert np.median(errs) < 20.0, f"median err {np.median(errs)}"
