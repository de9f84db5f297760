"""Condensation oracle: S, gamma, Pinv vs dense NumPy Schur complement."""

import jax.numpy as jnp
import numpy as np
import pytest

from gato_tpu import Preconditioner, ProblemSpec
from gato_tpu.assemble import condense
from gato_tpu.blocktri import btd_to_dense
from gato_tpu.formats import blocks_to_dense_kkt
from gato_tpu.testing import random_blocks


def _dense_schur(spec, blocks, rho):
    """Oracle: S = C G^{-1} C^T, gamma = C G^{-1} g - c from the dense KKT."""
    KKT, rhs = blocks_to_dense_kkt(spec, blocks, rho=rho)
    nz = spec.nz
    G = KKT[:nz, :nz]
    C = KKT[nz:, :nz]
    g = rhs[:nz]
    c = rhs[nz:]
    Ginv = np.linalg.inv(G)
    return C @ Ginv @ C.T, C @ Ginv @ g - c


@pytest.mark.parametrize("spec,rho", [
    (ProblemSpec(2, 1, 5), 0.001),
    (ProblemSpec(3, 2, 6), 0.0),
    # IIWA runs compiled in bench.py's on-device parity gate every round.
    pytest.param(ProblemSpec(14, 7, 50), 0.01, marks=pytest.mark.slow),
])
def test_schur_matches_dense(spec, rho):
    blocks = random_blocks(spec, seed=3)
    sys = condense(*(jnp.asarray(a) for a in blocks), rho=jnp.float32(rho))
    S_dense, gamma_dense = _dense_schur(spec, blocks, rho)
    np.testing.assert_allclose(
        btd_to_dense(np.asarray(sys.S)), S_dense, rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(sys.gamma).reshape(-1), gamma_dense, rtol=1e-3, atol=1e-4
    )


def test_gamma0_includes_c0():
    """The reference drops -c_0 from gamma_0 (gato_schur.cuh:131-147); we keep
    it — verify against the dense oracle with a nonzero initial residual."""
    spec = ProblemSpec(3, 2, 4)
    blocks = random_blocks(spec, seed=4)
    assert np.any(np.asarray(blocks.c)[0] != 0)
    sys = condense(*(jnp.asarray(a) for a in blocks), rho=jnp.float32(0.0))
    _, gamma_dense = _dense_schur(spec, blocks, 0.0)
    np.testing.assert_allclose(
        np.asarray(sys.gamma)[0], gamma_dense[: spec.state_size],
        rtol=1e-4, atol=1e-5,
    )


def test_qinv_rinv_cached():
    spec = ProblemSpec(4, 2, 5)
    blocks = random_blocks(spec, seed=5)
    rho = 0.05
    sys = condense(*(jnp.asarray(a) for a in blocks), rho=jnp.float32(rho))
    for k in range(spec.knot_points):
        np.testing.assert_allclose(
            np.asarray(sys.Qinv)[k],
            np.linalg.inv(np.asarray(blocks.Q)[k] + rho * np.eye(4)),
            rtol=1e-3, atol=1e-4,
        )
    for k in range(spec.knot_points - 1):
        np.testing.assert_allclose(
            np.asarray(sys.Rinv)[k],
            np.linalg.inv(np.asarray(blocks.R)[k] + rho * np.eye(2)),
            rtol=1e-3, atol=1e-4,
        )


@pytest.mark.parametrize("kind", list(Preconditioner))
def test_preconditioner_structure(kind):
    spec = ProblemSpec(3, 1, 5)
    blocks = random_blocks(spec, seed=6)
    sys = condense(
        *(jnp.asarray(a) for a in blocks), rho=jnp.float32(0.001),
        preconditioner=kind,
    )
    Pinv = np.asarray(sys.Pinv)
    S = np.asarray(sys.S)
    theta = S[:, 1]
    if kind == Preconditioner.JACOBI:
        for k in range(spec.knot_points):
            np.testing.assert_allclose(
                np.diag(Pinv[k, 1]), 1.0 / np.diag(theta[k]), rtol=1e-5
            )
        assert np.all(Pinv[:, 0] == 0) and np.all(Pinv[:, 2] == 0)
    elif kind == Preconditioner.BLOCK_JACOBI:
        for k in range(spec.knot_points):
            np.testing.assert_allclose(
                Pinv[k, 1], np.linalg.inv(theta[k]), rtol=1e-3, atol=1e-4
            )
        assert np.all(Pinv[:, 0] == 0) and np.all(Pinv[:, 2] == 0)
    else:  # symmetric stair: Pinv_(k,k-1) = -th_k^{-1} phi_k th_{k-1}^{-1}
        for k in range(1, spec.knot_points):
            phi_k = S[k, 0]
            expected = -np.linalg.inv(theta[k]) @ phi_k @ np.linalg.inv(theta[k - 1])
            np.testing.assert_allclose(Pinv[k, 0], expected, rtol=1e-3, atol=1e-4)
