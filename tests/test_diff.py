"""Implicit differentiation: VJP correctness vs finite differences and vs
native AD through the (differentiable) direct-solver composition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gato_tpu import ProblemSpec
from gato_tpu.diff import kkt_solve, _solve_kkt
from gato_tpu.testing import random_blocks

SPEC = ProblemSpec(3, 2, 6)


def _args(seed=11, rho=0.05):
    b = random_blocks(SPEC, seed=seed)
    return tuple(jnp.asarray(a) for a in b) + (jnp.float32(rho),)


def _loss(lam, dz_x, dz_u):
    return (jnp.sum(lam * jnp.cos(lam)) + jnp.sum(dz_x ** 2)
            + jnp.sum(jnp.sin(dz_u)))


def test_primal_matches_direct():
    args = _args()
    out1 = kkt_solve(*args)
    out2 = _solve_kkt(*args)
    for a, b in zip(out1, out2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_grads_match_native_ad():
    """Native AD differentiates through condense+scan; the implicit VJP must
    give the same gradients without touching solver internals."""
    args = _args()

    def f_implicit(*a):
        return _loss(*kkt_solve(*a))

    def f_native(*a):
        return _loss(*_solve_kkt(*a))

    g_imp = jax.grad(f_implicit, argnums=tuple(range(8)))(*args)
    g_nat = jax.grad(f_native, argnums=tuple(range(8)))(*args)
    names = ["Q", "R", "A", "B", "q", "r", "c", "rho"]

    def sym(M):
        return 0.5 * (np.asarray(M) + np.swapaxes(np.asarray(M), -1, -2))

    for name, gi, gn in zip(names, g_imp, g_nat):
        if name in ("Q", "R"):
            # Hessian blocks live on the symmetric manifold: only the
            # symmetrized cotangent is well defined (see diff.py), and
            # native AD's antisymmetric component reflects condense's
            # internal formulas, not the saddle system.
            gi, gn = sym(gi), sym(gn)
        scale = max(1.0, float(np.abs(np.asarray(gn)).max()))
        np.testing.assert_allclose(
            np.asarray(gi), np.asarray(gn), rtol=2e-3, atol=2e-3 * scale,
            err_msg=name,
        )


@pytest.mark.parametrize("argnum,name", [(4, "q"), (6, "c"), (7, "rho")])
def test_grads_match_finite_differences(argnum, name):
    args = list(_args())

    def f(x):
        a = list(args)
        a[argnum] = x
        return _loss(*kkt_solve(*a))

    g = jax.grad(f)(args[argnum])
    x0 = np.asarray(args[argnum], np.float64)
    eps = 1e-3
    if x0.ndim == 0:
        fd = (f(jnp.float32(x0 + eps)) - f(jnp.float32(x0 - eps))) / (2 * eps)
        np.testing.assert_allclose(float(g), float(fd), rtol=3e-2,
                                   err_msg=name)
    else:
        idx = tuple(np.unravel_index(x0.size // 2, x0.shape))
        xp = x0.copy(); xp[idx] += eps
        xm = x0.copy(); xm[idx] -= eps
        fd = (f(jnp.asarray(xp, jnp.float32))
              - f(jnp.asarray(xm, jnp.float32))) / (2 * eps)
        np.testing.assert_allclose(float(g[idx]), float(fd), rtol=3e-2,
                                   err_msg=name)


def test_grad_Q_symmetric_finite_difference():
    """Q stays on the symmetric manifold: perturb (i,j) and (j,i) together
    and compare against g[i,j] + g[j,i]."""
    args = list(_args())

    def f(Qx):
        a = list(args)
        a[0] = Qx
        return _loss(*kkt_solve(*a))

    g = jax.grad(f)(args[0])
    Q0 = np.asarray(args[0], np.float64)
    eps = 1e-3
    k, i, j = 2, 1, 0
    Qp = Q0.copy(); Qp[k, i, j] += eps; Qp[k, j, i] += eps
    Qm = Q0.copy(); Qm[k, i, j] -= eps; Qm[k, j, i] -= eps
    fd = (f(jnp.asarray(Qp, jnp.float32))
          - f(jnp.asarray(Qm, jnp.float32))) / (2 * eps)
    np.testing.assert_allclose(float(g[k, i, j] + g[k, j, i]), float(fd),
                               rtol=3e-2)


def test_vmap_and_jit_compose():
    B = 3
    problems = [_args(seed=20 + i) for i in range(B)]
    stacked = tuple(jnp.stack([p[i] for p in problems]) for i in range(8))

    @jax.jit
    def batched_loss_grad(*a):
        f = lambda *x: _loss(*kkt_solve(*x))
        return jax.vmap(jax.grad(f, argnums=4))(*a)

    g = batched_loss_grad(*stacked)
    assert g.shape == (B, SPEC.knot_points, SPEC.state_size)
    assert np.all(np.isfinite(np.asarray(g)))
