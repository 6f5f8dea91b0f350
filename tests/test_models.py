import numpy as np
import jax.numpy as jnp

from pymht_tpu.models import ais, pv


def test_shapes():
    assert pv.C_RADAR.shape == (2, 4)
    assert pv.P0.shape == (4, 4)
    assert pv.Q(2.5).shape == (4, 4)
    assert pv.R_RADAR().shape == (2, 2)
    assert pv.Phi(1.0).shape == (4, 4)
    assert ais.C.shape == (4, 4)
    assert ais.R(True).shape == (4, 4)


def test_batched_phi_q():
    Ts = jnp.array([0.5, 1.0, 2.0])
    assert pv.Phi(Ts).shape == (3, 4, 4)
    assert pv.Q(Ts).shape == (3, 4, 4)
    np.testing.assert_allclose(pv.Phi(Ts)[1], pv.Phi(1.0), rtol=1e-6)
    np.testing.assert_allclose(pv.Q(Ts)[2], pv.Q(2.0), rtol=1e-6)


def test_phi_moves_position():
    x = jnp.array([0.0, 0.0, 2.0, -1.0])
    x1 = pv.Phi(2.0) @ x
    np.testing.assert_allclose(np.asarray(x1), [4.0, -2.0, 2.0, -1.0], atol=1e-6)


def test_ais_r_accuracy_flag():
    hi = np.asarray(ais.R(True))
    lo = np.asarray(ais.R(False))
    np.testing.assert_allclose(hi, np.eye(4) * 1.0, atol=1e-6)
    np.testing.assert_allclose(lo, np.eye(4) * 9.0, atol=1e-6)
