"""Primal step recovery: dz from the converged multipliers.

After PCG produces lambda, the primal step is the block back-substitution
dz = (G + rho I)^{-1} (g - C^T lambda), which splits per knot into

    dz_x_k = Qr_k^{-1} (q_k - lambda_k - A_k^T lambda_{k+1})     k = 0..K-2
    dz_x_{K-1} = Qr_{K-1}^{-1} (q_{K-1} - lambda_{K-1})
    dz_u_k = Rr_k^{-1} (r_k - B_k^T lambda_{k+1})                k = 0..K-2

using the block inverses cached by the condensation (the reference stashes them
in the dense-G buffer, gato_schur.cuh:238-259, and replays them in
``gato_compute_dz``, gato_schur.cuh:758-879).

Deliberate correction vs the reference: for the last state row the reference's
kernel still adds an A_{K-1}^T lambda_K term, reading one block past the end of
both the C buffer and lambda (gato_schur.cuh:811-866 with set = K-1; C holds
only K-1 interval blocks and lambda K knot blocks).  The correct last row —
which is also what the dense NumPy oracle produces — has no such term.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_PRECISION = jax.lax.Precision.HIGHEST


def recover_dz(
    Qinv: jnp.ndarray,   # (K, s, s)
    Rinv: jnp.ndarray,   # (K-1, c, c)
    A: jnp.ndarray,      # (K-1, s, s)
    B: jnp.ndarray,      # (K-1, s, c)
    q: jnp.ndarray,      # (K, s)
    r: jnp.ndarray,      # (K-1, c)
    lam: jnp.ndarray,    # (K, s)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (dz_x: (K, s), dz_u: (K-1, c))."""
    lam_next = lam[1:]  # lambda_{k+1}, k = 0..K-2

    # A_k^T lambda_{k+1} / B_k^T lambda_{k+1}: contract over the row index.
    at_l = jnp.einsum("kba,kb->ka", A, lam_next, precision=_PRECISION)  # (K-1, s)
    bt_l = jnp.einsum("kba,kb->ka", B, lam_next, precision=_PRECISION)  # (K-1, c)

    rhs_x = q - lam - jnp.concatenate([at_l, jnp.zeros_like(at_l[:1])], axis=0)
    dz_x = jnp.einsum("kab,kb->ka", Qinv, rhs_x, precision=_PRECISION)
    dz_u = jnp.einsum("kab,kb->ka", Rinv, r - bt_l, precision=_PRECISION)
    return dz_x, dz_u
