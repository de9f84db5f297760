"""Block-tridiagonal primitive oracles vs dense NumPy."""

import jax.numpy as jnp
import numpy as np
import pytest

from gato_tpu.blocktri import btd_matvec, btd_to_dense, btd_transpose, halo_stack


def _random_btd(K, s, seed=0):
    rng = np.random.default_rng(seed)
    S = rng.normal(size=(K, 3, s, s)).astype(np.float32)
    S[0, 0] = 0.0
    S[-1, 2] = 0.0
    return S


@pytest.mark.parametrize("K,s", [(5, 2), (50, 14), (3, 1), (2, 4)])
def test_matvec_matches_dense(K, s):
    S = _random_btd(K, s)
    x = np.random.default_rng(1).normal(size=(K, s)).astype(np.float32)
    y = btd_matvec(jnp.asarray(S), jnp.asarray(x))
    y_ref = (btd_to_dense(S) @ x.reshape(-1)).reshape(K, s)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-5, atol=1e-5)


def test_halo_edges_zero():
    x = jnp.arange(6, dtype=jnp.float32).reshape(3, 2)
    h = halo_stack(x)
    np.testing.assert_array_equal(np.asarray(h[0, 0]), [0, 0])   # no left at row 0
    np.testing.assert_array_equal(np.asarray(h[-1, 2]), [0, 0])  # no right at row K-1
    np.testing.assert_array_equal(np.asarray(h[1, 0]), [0, 1])
    np.testing.assert_array_equal(np.asarray(h[1, 2]), [4, 5])


def test_transpose_matches_dense():
    S = _random_btd(6, 3, seed=2)
    St = btd_transpose(jnp.asarray(S))
    np.testing.assert_allclose(
        btd_to_dense(np.asarray(St)), btd_to_dense(S).T, atol=1e-6
    )
