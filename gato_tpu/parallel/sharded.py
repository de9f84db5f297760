"""Knot-axis sharding: the solver distributed over a TPU mesh via shard_map.

The reference's only parallel axis is knot points <-> CUDA blocks inside one
GPU, synchronized with cooperative grid barriers; its neighbor communication is
the block-tridiagonal halo read through global memory (loadBlockTriDiagonal,
gato_utils.cuh:121-251) and its all-reduce is atomicAdd on global scalars
(gato_pcg.cuh:331,357,387).  The TPU-native scaling of the same axis across
chips over ICI:

  * halo exchange  -> ``lax.ppermute`` of the single boundary row per step
    (bandwidth-1 comm: O(s) floats per device per matvec, independent of K)
  * dot products   -> ``lax.psum``
  * barriers       -> implicit in XLA dataflow

The PCG loop itself is the *same code* as the single-chip path (pcg.pcg) with a
sharded matvec/dot injected — one algorithm, two placements.

Condensation and dz recovery are left to XLA's sharding propagation: theta_k
couples only knots k-1 and k, so with inputs sharded on the knot axis XLA
inserts the one-row collective-permutes itself.  Only the iterative loop, where
naive propagation would re-gather per iteration, uses explicit shard_map.

This module targets horizons too long for one chip's VMEM/HBM appetite (K in
the many thousands) and, more importantly, demonstrates the mesh story; for the
BASELINE.json shapes a single chip is faster (K=500 => S is ~1.2 MB).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import assemble, recover
from ..pcg import PCGResult, pcg
from ..problem import Preconditioner
from ..solver import _cached_const

_PRECISION = jax.lax.Precision.HIGHEST


def _sharded_halo_stack(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """(Kl, s) local rows -> (Kl, 3, s) halo stack with cross-device neighbors.

    Devices at the mesh edge receive zeros from ppermute for missing partners,
    which is exactly the global boundary condition (rows 0 and K-1 have no
    neighbor) — correct edge handling for free, where the reference's strided
    variant has an off-by-one (gato_utils.cuh:202,232).
    """
    n = lax.axis_size(axis_name)
    # Last local row -> right neighbor; first local row -> left neighbor.
    from_left = lax.ppermute(
        x[-1:], axis_name, [(i, i + 1) for i in range(n - 1)]
    )
    from_right = lax.ppermute(
        x[:1], axis_name, [(i, i - 1) for i in range(1, n)]
    )
    xm = jnp.concatenate([from_left, x[:-1]], axis=0)
    xp = jnp.concatenate([x[1:], from_right], axis=0)
    return jnp.stack([xm, x, xp], axis=1)


def _sharded_matvec(axis_name: str):
    def matvec(S_local: jnp.ndarray, x_local: jnp.ndarray) -> jnp.ndarray:
        xh = _sharded_halo_stack(x_local, axis_name)
        return jnp.einsum("kjab,kjb->ka", S_local, xh, precision=_PRECISION)

    return matvec


def _sharded_dot(axis_name: str):
    def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        return lax.psum(
            jnp.vdot(a, b, precision=_PRECISION), axis_name
        )

    return dot


def pcg_sharded(
    mesh: Mesh,
    S: jnp.ndarray,
    Pinv: jnp.ndarray,
    gamma: jnp.ndarray,
    lam0: Optional[jnp.ndarray] = None,
    *,
    exit_tol=1e-6,
    max_iters=100,
    poly_degree: int = 1,
    axis_name: str = "knot",
) -> PCGResult:
    """PCG with the knot axis sharded over ``mesh[axis_name]``.

    K must be divisible by the axis size.  Scalar outputs (iters, converged,
    eta) are replicated — every device computes identical values because all
    decisions flow from psum'd scalars, the exact analog of every CUDA block
    reading the same atomicAdd'd eta after a grid barrier.
    """
    K = gamma.shape[0]
    n = mesh.shape[axis_name]
    if K % n:
        raise ValueError(f"knot_points={K} not divisible by mesh axis {axis_name}={n}")

    matvec = _sharded_matvec(axis_name)
    dot = _sharded_dot(axis_name)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name), P(axis_name)),
        out_specs=PCGResult(
            lam=P(axis_name), iters=P(), converged=P(), eta=P()
        ),
    )
    def run(S_l, Pinv_l, gamma_l, lam0_l):
        return pcg(
            S_l, Pinv_l, gamma_l, lam0_l,
            exit_tol=exit_tol, max_iters=max_iters,
            matvec=matvec, dot=dot, poly_degree=poly_degree,
        )

    if lam0 is None:
        lam0 = jnp.zeros_like(gamma)
    return run(S, Pinv, gamma, lam0)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "axis_name", "poly_degree", "preconditioner",
                     "method"),
)
def _solve_batched_dp_core(
    Q, R, A, B, q, r, c, lam0, rho, exit_tol, max_iters,
    mesh: Mesh,
    axis_name: str,
    poly_degree: int,
    preconditioner: str,
    method: str = "pcg",
):
    from ..kernels import direct_fused, fused_solve
    from ..pcg import PCGResult

    def body(Ql, Rl, Al, Bl, ql, rl, cl, l0, rho_, tol_, mi_):
        if method == "direct":
            # Exact per-shard solves via the fused cyclic-reduction kernel
            # (kernels/direct_fused.py); tol/max_iters/lam0 are unused.
            return direct_fused.solve_direct_fused_batched(
                Ql, Rl, Al, Bl, ql, rl, cl, rho=rho_,
            )
        return fused_solve.solve_fused_batched(
            Ql, Rl, Al, Bl, ql, rl, cl, l0,
            rho=rho_, exit_tol=tol_, max_iters=mi_,
            poly_degree=poly_degree, preconditioner=preconditioner,
        )

    run = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis_name),) * 8 + (P(), P(), P()),
        out_specs=(
            PCGResult(lam=P(axis_name), iters=P(axis_name),
                      converged=P(axis_name), eta=P(axis_name)),
            P(axis_name), P(axis_name),
        ),
        # pallas_call out_shapes carry no varying-mesh-axes annotation; the
        # body is embarrassingly parallel (no collectives), so skip the check.
        check_vma=False,
    )
    return run(Q, R, A, B, q, r, c, lam0, rho, exit_tol, max_iters)


def solve_batched_dp(
    mesh: Mesh,
    Q, R, A, B, q, r, c,
    lam0=None,
    *,
    rho=0.0,
    exit_tol=1e-6,
    max_iters=100,
    poly_degree: int = 1,
    preconditioner: str = "symmetric_stair",
    axis_name: str = "dp",
    method: str = "pcg",
):
    """Data-parallel batched solves: the problem batch shards across the mesh
    and every device runs the whole-solve fused kernel on its local shard.
    ``method='direct'`` runs the fused cyclic-reduction kernel per shard
    instead of PCG — exact batched solves across the mesh.

    The natural multi-chip deployment for MPC farms / batched QP serving:
    problems are independent, so there is NO cross-device communication at
    all — each chip's lane-packed fused kernel (kernels/fused_solve.py) runs
    its local problems, and results come back sharded the same way.  This
    composes orthogonally with the knot-axis sharding of
    :func:`solve_sharded` (which targets single problems too long for one
    chip).  The core is jitted (mesh/axis/preconditioner static, scalars
    traced), so repeated serving-loop calls hit the compile cache.

    Arrays follow formats.KKTBlocks with a leading batch axis divisible by
    the mesh axis size.  Returns (PCGResult, dz_x, dz_u) with the batch axis
    sharded over ``axis_name``.
    """
    if method not in ("pcg", "direct"):
        raise ValueError(
            f"solve_batched_dp supports method in ('pcg', 'direct'); "
            f"got {method!r}")
    Bn = q.shape[0]
    n = mesh.shape[axis_name]
    if Bn % n:
        raise ValueError(
            f"batch {Bn} not divisible by mesh axis {axis_name}={n}")
    if lam0 is None:
        lam0 = jnp.zeros_like(q)
    dt = q.dtype
    # _cached_const: fresh per-call device_put of scalars costs a ~30 ms
    # round trip on remote-attached TPUs (CLAUDE.md) — fatal in the repeated
    # serving-loop deployment this entry point targets.
    return _solve_batched_dp_core(
        Q, R, A, B, q, r, c, lam0,
        _cached_const(rho, dt), _cached_const(exit_tol, dt),
        _cached_const(max_iters, jnp.int32),
        mesh=mesh, axis_name=axis_name, poly_degree=poly_degree,
        preconditioner=preconditioner, method=method,
    )


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "axis_name", "poly_degree", "preconditioner"),
)
def _solve_sequence_batched_dp_core(
    Q, R, A, B, q, r, c, lam0, rhos, exit_tol, max_iters,
    mesh: Mesh,
    axis_name: str,
    poly_degree: int,
    preconditioner: str,
):
    from ..kernels import fused_solve

    def body(Ql, Rl, Al, Bl, ql, rl, cl, l0, rhos_, tol_, mi_):
        return fused_solve.solve_fused_sequence_batched(
            Ql, Rl, Al, Bl, ql, rl, cl, l0, rhos_, tol_, mi_,
            poly_degree=poly_degree, preconditioner=preconditioner,
        )

    run = jax.shard_map(
        body,
        mesh=mesh,
        # Sequence arrays carry (T, B, ...): the stream axis B (axis 1)
        # shards; T stays replicated in time (the scan is per device).
        in_specs=(P(None, axis_name),) * 7 + (P(axis_name), P(), P(), P()),
        out_specs=(P(None, axis_name),) * 6,
        check_vma=False,  # embarrassingly parallel (see _solve_batched_dp_core)
    )
    return run(Q, R, A, B, q, r, c, lam0, rhos, exit_tol, max_iters)


def solve_sequence_batched_dp(
    mesh: Mesh,
    Q, R, A, B, q, r, c,          # leading (T, B) axes on every array
    lam0=None,
    rhos=None,
    *,
    rho=0.0,
    exit_tol=1e-6,
    max_iters=100,
    poly_degree: int = 1,
    preconditioner: str = "symmetric_stair",
    axis_name: str = "dp",
):
    """An MPC farm sharded across the mesh: B warm-started streams split over
    ``mesh[axis_name]``, each device scanning its local shard of streams with
    the lane-packed fused kernel (mpc.solve_sequence_batched semantics) —
    zero cross-device communication, the fleet-serving deployment at
    chips x streams x steps scale.

    Arrays carry leading (T, B) axes; B must divide by the mesh axis size.
    ``rhos`` is per-step (T,), ``lam0`` is (B, K, s) (zeros by default).
    Returns (lam, dz_x, dz_u, iters, converged, eta) with (T, B) leading
    axes, stream-sharded over ``axis_name``."""
    T, Bn = q.shape[0], q.shape[1]
    n = mesh.shape[axis_name]
    if Bn % n:
        raise ValueError(
            f"stream count {Bn} not divisible by mesh axis {axis_name}={n}")
    dt = q.dtype
    if lam0 is None:
        lam0 = jnp.zeros_like(q[0])
    if rhos is None:
        rhos = _cached_const(rho, dt, (T,))
    else:
        rhos = jnp.asarray(rhos, dt)
    # _cached_const: see solve_batched_dp.
    return _solve_sequence_batched_dp_core(
        Q, R, A, B, q, r, c, lam0,
        rhos, _cached_const(exit_tol, dt),
        _cached_const(max_iters, jnp.int32),
        mesh=mesh, axis_name=axis_name, poly_degree=poly_degree,
        preconditioner=preconditioner,
    )


def solve_sharded(
    mesh: Mesh,
    Q, R, A, B, q, r, c,
    lam0=None,
    *,
    rho=0.0,
    exit_tol=1e-6,
    max_iters=100,
    preconditioner: Preconditioner = Preconditioner.SYMMETRIC_STAIR,
    poly_degree: int = 1,
    axis_name: str = "knot",
):
    """Full solve with the knot axis sharded across the mesh.

    Condensation/recovery run under jit with knot-sharded inputs (XLA inserts
    the neighbor collectives); the PCG loop runs under shard_map.  Interval
    arrays (R, A, B, r: K-1 entries) are padded by one zero row to K so every
    array shards evenly; the pad never contributes (zero blocks).
    """
    K, s = q.shape
    n = mesh.shape[axis_name]
    if K % n:
        raise ValueError(f"knot_points={K} not divisible by mesh axis {axis_name}={n}")

    knot_sharded = NamedSharding(mesh, P(axis_name))

    def pad1(x):
        return jnp.concatenate([x, jnp.zeros_like(x[:1])], axis=0)

    @functools.partial(jax.jit, static_argnames=("precond",))
    def _condense(Qp, Rp, Ap, Bp, qp, rp, cp, rho_, precond):
        # Unpad the interval arrays for the (K-1)-shaped math; XLA keeps the
        # sharded layouts and inserts halo permutes where theta_k touches k-1.
        return assemble.condense(
            Qp, Rp[:-1], Ap[:-1], Bp[:-1], qp, rp[:-1], cp, rho_, precond
        )

    Qd = jax.device_put(Q, knot_sharded)
    Rd = jax.device_put(pad1(jnp.asarray(R)), knot_sharded)
    Ad = jax.device_put(pad1(jnp.asarray(A)), knot_sharded)
    Bd = jax.device_put(pad1(jnp.asarray(B)), knot_sharded)
    qd = jax.device_put(q, knot_sharded)
    rd = jax.device_put(pad1(jnp.asarray(r)), knot_sharded)
    cd = jax.device_put(c, knot_sharded)

    sys = _condense(Qd, Rd, Ad, Bd, qd, rd, cd,
                    jnp.asarray(rho, Qd.dtype), preconditioner)

    S = jax.device_put(sys.S, knot_sharded)
    Pinv = jax.device_put(sys.Pinv, knot_sharded)
    gamma = jax.device_put(sys.gamma, knot_sharded)
    if lam0 is None:
        lam0 = jnp.zeros_like(gamma)
    lam0 = jax.device_put(jnp.asarray(lam0), knot_sharded)

    res = pcg_sharded(
        mesh, S, Pinv, gamma, lam0,
        exit_tol=exit_tol, max_iters=max_iters, poly_degree=poly_degree,
        axis_name=axis_name,
    )

    @jax.jit
    def _recover(Qinv, Rinv, Ap, Bp, qp, rp, lam):
        return recover.recover_dz(Qinv, Rinv[:-1], Ap[:-1], Bp[:-1], qp,
                                  rp[:-1], lam)

    dz_x, dz_u = _recover(sys.Qinv, pad1(sys.Rinv), Ad, Bd, qd, rd, res.lam)
    return res, dz_x, dz_u
