"""Fused single-kernel PCG: the TPU analog of the reference's cooperative
CUDA kernel (``parallelPCG``, gato_pcg.cuh:270-470).

The entire PCG loop runs inside ONE ``pallas_call``: S, Pinv, gamma and every
work vector stay VMEM-resident across all iterations, eliminating the
per-iteration dispatch overhead of the ``lax.while_loop`` path just as the
reference's cooperative launch eliminates per-iteration kernel launches.
Where the reference needs grid-wide barriers between phases and atomicAdd
scalar reductions, the kernel body here is a single program: dependencies are
plain dataflow and the dot products are VPU reductions.

Layout — knots (x problems) in lanes
------------------------------------
The trajectory (knot) axis K is the long axis (50-500) while the block size s
is tiny (2-14), so arrays are stored transposed with K on the 128-wide lane
dimension and the block-row index on sublanes:

    S, Pinv : (3, s, sp, C, Kp)   [slot j, block col b, block row a, problem, knot]
    vectors : (sp, C, Kp)

with sp = s rounded up to the f32 sublane tile (8) and Kp = K rounded up to
the lane tile (128).  The block-tridiagonal matvec is then 3*s lane-parallel
fused multiply-adds over (sp, C, Kp) tiles — every lane is a different
(problem, knot) pair: the same work assignment as the reference's
one-CUDA-block-per-knot, but expressed as vector width instead of grid width,
and extended over a problem batch the reference doesn't have.

Batching is the throughput lever: a single (14, 7, 50) problem fills 50 of 128
lanes; a 16-problem chunk fills 2048 lanes and makes every VPU op do 16x the
work at the same op count.  Chunks of C problems are sized to VMEM
(~10 MB for S+Pinv+vectors) and mapped onto the Pallas grid; chunk DMA
overlaps compute via the standard pipeline.

Padding is structural, not masked: padded S/Pinv blocks are zero, so padded
lanes never contribute to matvecs or dot products, and the ``pltpu.roll``
halo shift along the knot axis wraps either into a padded lane or against the
zero left-slot of row 0 / right-slot of row K-1 (the same zero blocks that
encode the boundary in blocktri.py) — exact edge handling with no branches,
where the reference needed per-edge special cases (gato_utils.cuh:131-149)
and its strided variant got them wrong (off-by-one, gato_utils.cuh:202,232).

Numerics are identical to pcg.pcg (same update order, same exit test on the
preconditioned residual dot, same iteration-count semantics, per-problem
masked updates after convergence); reductions are reordered, so agreement is
to f32 round-off, verified by tests.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..pcg import PCGResult

_LANE = 128
_SUBLANE = 8
# VMEM budget for the two operators + work vectors per chunk.  v5e has ~16 MB;
# Pallas double-buffers every gridded block (next chunk's DMA overlaps this
# chunk's compute), so the effective footprint is ~2x this plus loop carries.
_VMEM_BUDGET_BYTES = 4 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _chunk_size(B: int, s: int, sp: int, Kp: int) -> int:
    """Largest divisor of B whose working set fits the VMEM budget."""
    per_problem = (2 * 3 * s * sp * Kp + 8 * sp * Kp) * 4
    cap = max(1, _VMEM_BUDGET_BYTES // per_problem)
    c = min(B, cap)
    while B % c:
        c -= 1
    return c


def _pack_operator(S: jnp.ndarray, sp: int, Kp: int) -> jnp.ndarray:
    """(B, K, 3, s, s) -> (3, s_col, B, sp_row, Kp), zero padded.

    The contracted block-column index b and the problem index land in *outer*
    (untiled) dims — Pallas requires the last two block dims to be
    tile-aligned, and this keeps the matvec's per-b slice M[j, b] a stack of
    contiguous (sp, Kp) tiles with only (row, knot) on (sublane, lane)."""
    B, K, _, s, _ = S.shape
    St = jnp.transpose(S, (2, 4, 0, 3, 1))  # (3, b, B, a, K)
    return jnp.pad(St, ((0, 0), (0, 0), (0, 0), (0, sp - s), (0, Kp - K)))


def _pack_vec(x: jnp.ndarray, sp: int, Kp: int) -> jnp.ndarray:
    """(B, K, s) -> (B, sp, Kp)."""
    B, K, s = x.shape
    xt = jnp.transpose(x, (0, 2, 1))  # (B, s, K)
    return jnp.pad(xt, ((0, 0), (0, sp - s), (0, Kp - K)))


def _matvec_lanes(M: jnp.ndarray, x: jnp.ndarray, s: int) -> jnp.ndarray:
    """y[c,a,k] = sum_{j,b} M[j,b,c,a,k] * halo_j(x)[c,b,k].

    Unrolled over j (3 slots) and b (s block columns): 3*s lane-parallel FMAs
    over (C, sp, Kp) tiles.  The roll is along the knot axis only, so halos
    never cross problem boundaries."""
    Kp = x.shape[-1]
    xm = pltpu.roll(x, shift=1, axis=2)       # x_{k-1} in lane k
    xp = pltpu.roll(x, shift=Kp - 1, axis=2)  # x_{k+1} in lane k (shift >= 0)
    halos = (xm, x, xp)
    y = jnp.zeros_like(x)
    for j in range(3):
        h = halos[j]
        for b in range(s):
            y = y + M[j, b] * h[:, b : b + 1, :]
    return y


def _dot_lanes(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Per-problem dot: (C, sp, Kp) x (C, sp, Kp) -> (C, 1, 1).

    Reduced one axis at a time: Mosaic's vector-layout inference crashes on a
    multi-axis keepdims reduction straight to (C, 1, 1) (layout.h check
    failure, observed on libtpu v5e); sequential single-axis reductions
    compile cleanly."""
    partial = jnp.sum(a * b, axis=2, keepdims=True)  # (C, sp, 1)
    return jnp.sum(partial, axis=1, keepdims=True)   # (C, 1, 1)


def _pcg_kernel(
    tol_ref, maxit_ref,                     # SMEM scalars
    S_ref, P_ref, gam_ref, lam0_ref,        # VMEM tensors
    lam_out, iters_out, conv_out, eta_out,  # outputs
    *, s: int,
):
    S = S_ref[:]
    P = P_ref[:]
    gam = gam_ref[:]
    lam0 = lam0_ref[:]
    exit_tol = tol_ref[0]
    max_iters = maxit_ref[0]

    mv = functools.partial(_matvec_lanes, s=s)

    # r0 = gamma - S lam0 (cold start: lam0 = 0 -> r0 = gamma, like the
    # reference's unconditional reset, gato_pcg.cuh:296-304; warm start real).
    r = gam - mv(S, lam0)
    r_tilde = mv(P, r)
    p = r_tilde
    eta = _dot_lanes(r, r_tilde)

    C = gam.shape[0]
    i32 = jnp.int32

    # NOTE: `conv` is carried as int32, not bool — Mosaic cannot legalize
    # vector<i1> loop carries (scf.yield legalization failure, observed on
    # libtpu v5e); int32 0/1 with arithmetic masking compiles cleanly.
    def cond(st):
        it, conv = st[4], st[6]
        return jnp.logical_and(it < max_iters, jnp.sum(conv) < C)

    def body(st):
        lam, r, p, eta, it, n_iters, conv = st
        live = (conv == 0)                               # (C, 1, 1) bool, local
        upsilon = mv(S, p)
        nu = _dot_lanes(p, upsilon)
        alpha = jnp.where(nu != 0, eta / nu, 0.0)
        lam_n = lam + alpha * p
        r_n = r - alpha * upsilon
        r_tilde = mv(P, r_n)
        eta_new = _dot_lanes(r_n, r_tilde)
        conv_now = jnp.abs(eta_new) < exit_tol
        beta = jnp.where(eta != 0, eta_new / eta, 0.0)
        p_n = r_tilde + beta * p

        # Per-problem freeze after convergence (matches pcg.pcg / vmap).
        lam = jnp.where(live, lam_n, lam)
        r = jnp.where(live, r_n, r)
        p = jnp.where(live, p_n, p)
        eta = jnp.where(live, eta_new, eta)
        n_iters = jnp.where(jnp.logical_and(live, conv_now), it, n_iters)
        conv = jnp.maximum(conv, conv_now.astype(i32))
        return (lam, r, p, eta, it + 1, n_iters, conv)

    init = (
        lam0, r, p, eta,
        jnp.zeros((), i32),
        jnp.full((C, 1, 1), max_iters, i32),  # reference: count = maxIters
        jnp.zeros((C, 1, 1), i32),
    )
    lam, r, p, eta, it, n_iters, conv = jax.lax.while_loop(cond, body, init)

    out_shape = iters_out.shape  # (C, 8, Kp)
    lam_out[:] = lam
    iters_out[:] = jnp.broadcast_to(n_iters, out_shape)
    conv_out[:] = jnp.broadcast_to(conv, out_shape)
    eta_out[:] = jnp.broadcast_to(jnp.abs(eta), out_shape)


def pcg_fused_batched(
    S: jnp.ndarray,       # (B, K, 3, s, s)
    Pinv: jnp.ndarray,    # (B, K, 3, s, s)
    gamma: jnp.ndarray,   # (B, K, s)
    lam0: Optional[jnp.ndarray] = None,
    *,
    exit_tol=1e-6,
    max_iters=100,
    interpret: bool = False,
) -> PCGResult:
    """Solve a batch of block-tridiagonal systems in fused TPU kernels.

    Problems are packed C-per-chunk onto the lane axis (C sized to VMEM) and
    chunks are pipelined over the Pallas grid.  Returns PCGResult with leading
    batch axis on every field.
    """
    B, K, _, s, _ = S.shape
    sp = _round_up(s, _SUBLANE)
    Kp = _round_up(K, _LANE)
    dt = gamma.dtype
    C = _chunk_size(B, s, sp, Kp)
    grid = B // C

    if lam0 is None:
        lam0 = jnp.zeros_like(gamma)

    Sb = _pack_operator(S.astype(dt), sp, Kp)
    Pb = _pack_operator(Pinv.astype(dt), sp, Kp)
    gb = _pack_vec(gamma, sp, Kp)
    lb = _pack_vec(lam0.astype(dt), sp, Kp)

    iters_per_chunk = max(int(max_iters) if not hasattr(max_iters, "shape")
                          else 100, 1)
    cost = pl.CostEstimate(
        flops=int(2 * 2 * 3 * s * s * K * B * min(iters_per_chunk, 100)),
        bytes_accessed=int(Sb.size + Pb.size + 6 * gb.size) * 4,
        transcendentals=0,
    )

    op_spec = pl.BlockSpec(
        (3, s, C, sp, Kp), lambda i: (0, 0, i, 0, 0), memory_space=pltpu.VMEM
    )
    vec_spec = pl.BlockSpec(
        (C, sp, Kp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    aux_spec = pl.BlockSpec(
        (C, _SUBLANE, Kp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )

    lam_p, iters, conv, eta = pl.pallas_call(
        functools.partial(_pcg_kernel, s=s),
        grid=(grid,),
        out_shape=(
            jax.ShapeDtypeStruct((B, sp, Kp), dt),
            jax.ShapeDtypeStruct((B, _SUBLANE, Kp), jnp.int32),
            jax.ShapeDtypeStruct((B, _SUBLANE, Kp), jnp.int32),
            jax.ShapeDtypeStruct((B, _SUBLANE, Kp), dt),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            op_spec, op_spec, vec_spec, vec_spec,
        ],
        out_specs=(vec_spec, aux_spec, aux_spec, aux_spec),
        cost_estimate=cost,
        interpret=interpret,
    )(
        jnp.asarray(exit_tol, dt).reshape(1),
        jnp.asarray(max_iters, jnp.int32).reshape(1),
        Sb, Pb, gb, lb,
    )

    return PCGResult(
        lam=jnp.transpose(lam_p[:, :s, :K], (0, 2, 1)),  # (B, K, s)
        iters=iters[:, 0, 0],
        converged=conv[:, 0, 0] != 0,
        eta=eta[:, 0, 0],
    )


def pcg_fused(
    S: jnp.ndarray,
    Pinv: jnp.ndarray,
    gamma: jnp.ndarray,
    lam0: Optional[jnp.ndarray] = None,
    *,
    exit_tol=1e-6,
    max_iters=100,
    interpret: bool = False,
) -> PCGResult:
    """Single-problem fused solve: same contract as pcg.pcg."""
    res = pcg_fused_batched(
        S[None], Pinv[None], gamma[None],
        None if lam0 is None else lam0[None],
        exit_tol=exit_tol, max_iters=max_iters, interpret=interpret,
    )
    return PCGResult(
        lam=res.lam[0], iters=res.iters[0],
        converged=res.converged[0], eta=res.eta[0],
    )
