"""Schur-complement condensation of the trajectory-QP KKT system.

Given the block KKT data (Q, R, A, B, q, r, c) and regularizer rho, form the
block-tridiagonal Schur system in the multipliers lambda:

    S lambda = gamma,      S = C (G + rho I)^{-1} C^T,
                           gamma = C (G + rho I)^{-1} g - c

with C the [I; dynamics] constraint Jacobian (see formats.py).  Per knot:

    theta_0 = Qr_0^{-1}
    phi_k   = A_{k-1} Qr_{k-1}^{-1}                                (k = 1..K-1)
    theta_k = phi_k A_{k-1}^T + B_{k-1} Rr_{k-1}^{-1} B_{k-1}^T + Qr_k^{-1}
    S       = btd(left=phi_k, main=theta_k, right=phi_{k+1}^T)
    gamma_0 = Qr_0^{-1} q_0 - c_0
    gamma_k = phi_k q_{k-1} + B_{k-1} Rr_{k-1}^{-1} r_{k-1} + Qr_k^{-1} q_k - c_k

where Qr = Q + rho I, Rr = R + rho I.

Reference: ``gato_form_schur_jacobi`` (gato_schur.cuh:13-494) computes the same
quantities but stores S, gamma, and Pinv *negated* and solves (-S)λ = (-γ); the
signs cancel, so this positive-definite convention yields identical iterates.
Two deliberate corrections vs the reference (both invisible on the reference's
own tests, where c_0 = 0):

  * gamma_0 includes the -c_0 term; the reference drops it
    (gato_schur.cuh:131-147 stores only -Q_0^{-1} q_0).
  * No out-of-bounds neighbor reads at the edges.

The preconditioners mirror gato_defines.h:9-11 / gato_schur.cuh:407-429,496-671:

  * block Jacobi:     Pinv main diagonal = theta_k^{-1}
  * symmetric stair:  additionally Pinv_(k,k-1) = -theta_k^{-1} phi_k theta_{k-1}^{-1}
                      and          Pinv_(k,k+1) = -theta_k^{-1} phi_{k+1}^T theta_{k+1}^{-1}
  * scalar Jacobi:    Pinv main diagonal = diag(1/diag(theta_k))

Like the reference (which overwrites dense G with the block inverses for the
later dz recovery, gato_schur.cuh:238-259), the condensation returns Qr^{-1}
and Rr^{-1} for reuse by recover.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .blocktri import block_inv
from .problem import Preconditioner

_PRECISION = jax.lax.Precision.HIGHEST


class SchurSystem(NamedTuple):
    """Condensed system + preconditioner + cached inverses for dz recovery."""

    S: jnp.ndarray      # (K, 3, s, s)  block-tridiagonal Schur complement
    Pinv: jnp.ndarray   # (K, 3, s, s)  preconditioner (approximate S^{-1})
    gamma: jnp.ndarray  # (K, s)        condensed rhs
    Qinv: jnp.ndarray   # (K, s, s)     (Q_k + rho I)^{-1}
    Rinv: jnp.ndarray   # (K-1, c, c)   (R_k + rho I)^{-1}


def _bmm(a, b):
    return jnp.einsum("kab,kbc->kac", a, b, precision=_PRECISION)


def _bmm_t(a, b):
    """Batched a @ b^T (the reference's mat_mat_prod with transpose=true,
    gato_utils.cuh:609-659)."""
    return jnp.einsum("kab,kcb->kac", a, b, precision=_PRECISION)


def _bmv(a, x):
    return jnp.einsum("kab,kb->ka", a, x, precision=_PRECISION)


def condense(
    Q: jnp.ndarray,
    R: jnp.ndarray,
    A: jnp.ndarray,
    B: jnp.ndarray,
    q: jnp.ndarray,
    r: jnp.ndarray,
    c: jnp.ndarray,
    rho: jnp.ndarray,
    preconditioner: "Preconditioner | None" = Preconditioner.SYMMETRIC_STAIR,
) -> SchurSystem:
    """Assemble (S, Pinv, gamma) from block KKT data.  Fully traced/jittable;
    ``rho`` is a runtime scalar (the reference bakes it into the CSR->dense
    conversion, gato_schur.cuh:697, forcing re-conversion per rho).

    ``preconditioner=None`` skips the preconditioner entirely (Pinv is None) —
    used by the direct solver, saving the theta inversion and stair products
    (roughly half the condensation FLOPs)."""
    K, s, _ = Q.shape
    cdim = R.shape[-1]
    dt = Q.dtype
    eye_s = jnp.eye(s, dtype=dt)
    eye_c = jnp.eye(cdim, dtype=dt)

    Qinv = block_inv(Q + rho * eye_s)          # (K, s, s)
    Rinv = block_inv(R + rho * eye_c)          # (K-1, c, c)

    phi = _bmm(A, Qinv[:-1])                   # (K-1, s, s): phi_{k+1} = A_k Qr_k^{-1}
    BRinv = _bmm(B, Rinv)                      # (K-1, s, c)

    theta_rest = (
        _bmm_t(phi, A) + _bmm_t(BRinv, B) + Qinv[1:]
    )                                          # (K-1, s, s): theta_1..theta_{K-1}
    theta = jnp.concatenate([Qinv[:1], theta_rest], axis=0)  # (K, s, s)

    zero_block = jnp.zeros((1, s, s), dtype=dt)
    left = jnp.concatenate([zero_block, phi], axis=0)
    right = jnp.concatenate([jnp.swapaxes(phi, -1, -2), zero_block], axis=0)
    S = jnp.stack([left, theta, right], axis=1)  # (K, 3, s, s)

    gamma_rest = (
        _bmv(phi, q[:-1]) + _bmv(BRinv, r) + _bmv(Qinv[1:], q[1:]) - c[1:]
    )
    gamma0 = _bmv(Qinv[:1], q[:1]) - c[:1]     # includes -c_0 (reference omits it)
    gamma = jnp.concatenate([gamma0, gamma_rest], axis=0)  # (K, s)

    if preconditioner is None:
        Pinv = None
    else:
        Pinv = _preconditioner(S, theta, phi, preconditioner)
    return SchurSystem(S=S, Pinv=Pinv, gamma=gamma, Qinv=Qinv, Rinv=Rinv)


def _preconditioner(S, theta, phi, kind: Preconditioner) -> jnp.ndarray:
    K, _, s, _ = S.shape
    dt = S.dtype
    zero_block = jnp.zeros((1, s, s), dtype=dt)

    if kind == Preconditioner.JACOBI:
        diag = jnp.diagonal(theta, axis1=-2, axis2=-1)          # (K, s)
        main = jnp.zeros_like(theta).at[
            :, jnp.arange(s), jnp.arange(s)
        ].set(1.0 / diag)
        zeros = jnp.zeros_like(theta)
        return jnp.stack([zeros, main, zeros], axis=1)

    theta_inv = block_inv(theta)                                # (K, s, s)

    if kind == Preconditioner.BLOCK_JACOBI:
        zeros = jnp.zeros_like(theta_inv)
        return jnp.stack([zeros, theta_inv, zeros], axis=1)

    # Symmetric stair (bandwidth-3 approximate inverse), gato_schur.cuh:496-671:
    #   Pinv_(k,k-1) = -theta_k^{-1} phi_k theta_{k-1}^{-1}        k = 1..K-1
    #   Pinv_(k,k+1) = -theta_k^{-1} phi_{k+1}^T theta_{k+1}^{-1}  k = 0..K-2
    left_off = -_bmm(_bmm(theta_inv[1:], phi), theta_inv[:-1])   # (K-1, s, s)
    right_off = -_bmm(
        _bmm_t(theta_inv[:-1], phi), theta_inv[1:]
    )                                                            # (K-1, s, s)
    p_left = jnp.concatenate([zero_block, left_off], axis=0)
    p_right = jnp.concatenate([right_off, zero_block], axis=0)
    return jnp.stack([p_left, theta_inv, p_right], axis=1)
