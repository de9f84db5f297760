"""PCG unit tests on random SPD block-tridiagonal systems."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gato_tpu.blocktri import btd_to_dense
from gato_tpu.pcg import pcg


def _random_spd_btd(K, s, seed=0, precond="block_jacobi"):
    """Random SPD block-tridiagonal (diagonally dominant) + preconditioner."""
    rng = np.random.default_rng(seed)
    off = rng.normal(size=(K - 1, s, s)).astype(np.float32) * 0.2
    diag = []
    for k in range(K):
        F = rng.normal(size=(s, s)) * 0.3
        diag.append(F @ F.T + np.eye(s) * 2.0)
    diag = np.asarray(diag, dtype=np.float32)
    zero = np.zeros((1, s, s), dtype=np.float32)
    left = np.concatenate([zero, off], axis=0)
    right = np.concatenate([off.transpose(0, 2, 1), zero], axis=0)
    S = np.stack([left, diag, right], axis=1)

    if precond == "identity":
        main = np.broadcast_to(np.eye(s, dtype=np.float32), (K, s, s)).copy()
    else:
        main = np.linalg.inv(diag).astype(np.float32)
    zeros = np.zeros_like(main)
    Pinv = np.stack([zeros, main, zeros], axis=1)
    return S, Pinv


@pytest.mark.parametrize("K,s", [(5, 2), (20, 4), (50, 14)])
def test_pcg_solves_spd_system(K, s):
    S, Pinv = _random_spd_btd(K, s, seed=K)
    rhs = np.random.default_rng(1).normal(size=(K, s)).astype(np.float32)
    res = pcg(jnp.asarray(S), jnp.asarray(Pinv), jnp.asarray(rhs),
              exit_tol=1e-10, max_iters=500)
    x = np.linalg.solve(btd_to_dense(S).astype(np.float64), rhs.reshape(-1))
    assert bool(res.converged)
    np.testing.assert_allclose(
        np.asarray(res.lam).reshape(-1), x, rtol=1e-3, atol=1e-4
    )


def test_iteration_count_semantics():
    """Reference counting: 0-based index at exit, max_iters on exhaustion
    (gato_pcg.cuh:311-313, 404-411)."""
    S, Pinv = _random_spd_btd(6, 2, seed=7)
    rhs = np.ones((6, 2), dtype=np.float32)
    # Exhaustion: tiny budget
    res = pcg(jnp.asarray(S), jnp.asarray(Pinv), jnp.asarray(rhs),
              exit_tol=1e-30, max_iters=3)
    assert int(res.iters) == 3 and not bool(res.converged)
    # Immediate-ish convergence with huge tol: loop still runs one iteration
    # and reports index 0, like the reference's in-loop exit test.
    res = pcg(jnp.asarray(S), jnp.asarray(Pinv), jnp.asarray(rhs),
              exit_tol=1e30, max_iters=50)
    assert int(res.iters) == 0 and bool(res.converged)


def test_zero_rhs_is_finite():
    """gamma = 0 must return lambda = 0 (the reference would produce NaN via
    0/0 — documented robustness fix)."""
    S, Pinv = _random_spd_btd(4, 3, seed=9)
    rhs = np.zeros((4, 3), dtype=np.float32)
    res = pcg(jnp.asarray(S), jnp.asarray(Pinv), jnp.asarray(rhs),
              exit_tol=1e-8, max_iters=10)
    assert bool(res.converged)
    np.testing.assert_array_equal(np.asarray(res.lam), 0.0)


def test_warm_start_reduces_iterations():
    S, Pinv = _random_spd_btd(20, 4, seed=11)
    rhs = np.random.default_rng(2).normal(size=(20, 4)).astype(np.float32)
    cold = pcg(jnp.asarray(S), jnp.asarray(Pinv), jnp.asarray(rhs),
               exit_tol=1e-8, max_iters=200)
    warm = pcg(jnp.asarray(S), jnp.asarray(Pinv), jnp.asarray(rhs),
               lam0=cold.lam, exit_tol=1e-8, max_iters=200)
    assert int(warm.iters) <= 1
    np.testing.assert_allclose(np.asarray(warm.lam), np.asarray(cold.lam),
                               rtol=1e-4, atol=1e-5)


def test_vmap_batch_matches_sequential():
    """vmap'd PCG must freeze converged problems (masked updates)."""
    K, s, Bn = 10, 3, 4
    Ss, Ps, rs = [], [], []
    for b in range(Bn):
        S, Pinv = _random_spd_btd(K, s, seed=100 + b)
        Ss.append(S)
        Ps.append(Pinv)
        rs.append(np.random.default_rng(b).normal(size=(K, s)).astype(np.float32)
                  * (10.0 ** b))  # very different scales -> different iter counts
    Sb, Pb, rb = map(np.stack, (Ss, Ps, rs))

    batched = jax.vmap(
        lambda S, P, g: pcg(S, P, g, exit_tol=1e-8, max_iters=300)
    )(jnp.asarray(Sb), jnp.asarray(Pb), jnp.asarray(rb))

    for b in range(Bn):
        single = pcg(jnp.asarray(Sb[b]), jnp.asarray(Pb[b]), jnp.asarray(rb[b]),
                     exit_tol=1e-8, max_iters=300)
        assert int(batched.iters[b]) == int(single.iters)
        np.testing.assert_allclose(
            np.asarray(batched.lam[b]), np.asarray(single.lam),
            rtol=1e-4, atol=1e-4 * max(1.0, 10.0 ** b),
        )
