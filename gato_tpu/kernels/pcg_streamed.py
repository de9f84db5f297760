"""HBM-streamed PCG for horizons too long to be VMEM-resident.

The TPU analog of the reference's ``parallelPCG_fixed`` strided kernel
(gato_pcg.cuh:17-268): when ``check_sms`` finds the problem larger than the
co-resident capacity, the GPU re-streams S/Pinv tiles from global memory every
iteration (gato_pcg.cuh:82-84,120-122,182-184).  Here the same decision is
``fits_vmem`` (pcg_pallas.py / fused_solve.py), and past the budget the PCG
loop runs as the ordinary ``pcg.pcg`` ``lax.while_loop`` with the
block-tridiagonal matvec replaced by a *gridded Pallas kernel* that streams
the operator chunk-by-chunk through VMEM in the lane-packed layout:

    operator : (3, s, sp, Ltot)   [slot, block col, block row, K on lanes]
    vectors  : (sp, Ltot)

Per chunk the kernel DMAs one (3, s, sp, Lc) operator tile plus three views of
the vector (previous / current / next chunk) and runs the same 3*s
lane-parallel FMAs as the resident kernel (pcg_pallas._matvec_lanes).  The
halo at a chunk boundary is patched from the neighbor chunk's edge lane;
grid-edge chunks take zeros — together with the structural zero blocks at
trajectory boundaries this gives exact edge handling, where the reference's
strided variant reads one block out of bounds (gato_utils.cuh:202,232).

The elementwise PCG updates and the dot products stay in XLA: on the packed
(sp, Ltot) layout they are already lane-major, and the streamed matvec is
bandwidth-bound — the operator tile DMA dominates, exactly as on the GPU.

Iteration counts match pcg.pcg EXACTLY by construction (it IS pcg.pcg, with a
different matvec executor).  Single-problem only: a *batch* of over-budget
problems is solved with ``lax.map`` (sequential streamed solves — each solve
already saturates HBM bandwidth, so problem-level concurrency has nothing to
add).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..pcg import PCGResult, pcg
from .pcg_pallas import _LANE, _SUBLANE, _round_up

# Per-chunk operator tile budget; one matvec streams one operator, so the
# working set is tile + double-buffer (~2x) + the three small vector views.
_CHUNK_BYTES = 3 * 1024 * 1024


def plan_chunks(K: int, s: int):
    """(K_pad, Lc, n_chunks): lane padding and chunk split for horizon K.

    K_pad is always n_chunks * Lc (lane-tile aligned) so every BlockSpec
    block is fully in bounds — the zero padding doubles as the trajectory-end
    boundary condition."""
    sp = _round_up(s, _SUBLANE)
    bytes_per_lane = 3 * s * sp * 4
    max_chunk = max(_LANE, (_CHUNK_BYTES // bytes_per_lane) // _LANE * _LANE)
    K_pad0 = _round_up(K, _LANE)
    n_chunks = -(-K_pad0 // max_chunk)
    Lc = _round_up(-(-K_pad0 // n_chunks), _LANE)
    return Lc * n_chunks, Lc, n_chunks, sp


def _pack_operator(S: jnp.ndarray, K_pad: int, sp: int) -> jnp.ndarray:
    """(K, 3, s, s) -> (3, s_col, sp_row, K_pad), zero padded."""
    K, _, s, _ = S.shape
    St = jnp.transpose(S, (1, 3, 2, 0))  # (3, b, a, K)
    return jnp.pad(St, ((0, 0), (0, 0), (0, sp - s), (0, K_pad - K)))


def _pack_vec(x: jnp.ndarray, K_pad: int, sp: int) -> jnp.ndarray:
    """(K, s) -> (sp, K_pad)."""
    K, s = x.shape
    return jnp.pad(x.T, ((0, sp - s), (0, K_pad - K)))


def _mv_kernel(M_ref, xm_ref, x_ref, xp_ref, y_ref, *, s: int, n_chunks: int):
    c = pl.program_id(0)
    x = x_ref[:]
    Lc = x.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)

    # In-chunk halos by lane roll; boundary lanes patched from the neighbor
    # chunk's edge lane (zero at the grid edges — index_map clamps there, so
    # mask the self-read off).
    xm = pltpu.roll(x, shift=1, axis=1)
    xp = pltpu.roll(x, shift=Lc - 1, axis=1)
    prev_last = jnp.where(c == 0, 0.0, xm_ref[:, Lc - 1 : Lc])
    next_first = jnp.where(c == n_chunks - 1, 0.0, xp_ref[:, 0:1])
    xm = jnp.where(lane == 0, prev_last, xm)
    xp = jnp.where(lane == Lc - 1, next_first, xp)

    # Per-slot accumulators, (left + right) + main: the 3x-shorter FMA
    # chains measure ~8-14% faster than a single accumulator, and the
    # association order matches pcg_pallas._matvec_lanes.
    slots = []
    for j, h in enumerate((xm, x, xp)):
        y = M_ref[j, 0] * h[0:1, :]
        for b in range(1, s):
            y = y + M_ref[j, b] * h[b : b + 1, :]
        slots.append(y)
    y_ref[:] = (slots[0] + slots[2]) + slots[1]


def streamed_matvec(M: jnp.ndarray, x: jnp.ndarray, *, s: int,
                    Lc: int, n_chunks: int, interpret: bool = False):
    """y = btd_matvec(M, x) on packed arrays, streamed over the lane axis.

    M: (3, s, sp, Ltot) packed operator; x: (sp, Ltot) packed vector."""
    sp, Ltot = x.shape

    op_spec = pl.BlockSpec((3, s, sp, Lc), lambda c: (0, 0, 0, c),
                           memory_space=pltpu.VMEM)
    cur = pl.BlockSpec((sp, Lc), lambda c: (0, c), memory_space=pltpu.VMEM)
    prev = pl.BlockSpec((sp, Lc), lambda c: (0, jnp.maximum(c - 1, 0)),
                        memory_space=pltpu.VMEM)
    nxt = pl.BlockSpec(
        (sp, Lc), lambda c: (0, jnp.minimum(c + 1, n_chunks - 1)),
        memory_space=pltpu.VMEM)

    cost = pl.CostEstimate(
        flops=int(2 * 3 * s * sp * Ltot),
        bytes_accessed=int((M.size + 4 * x.size) * 4),
        transcendentals=0,
    )
    return pl.pallas_call(
        functools.partial(_mv_kernel, s=s, n_chunks=n_chunks),
        grid=(n_chunks,),
        out_shape=jax.ShapeDtypeStruct((sp, Ltot), x.dtype),
        in_specs=[op_spec, prev, cur, nxt],
        out_specs=cur,
        cost_estimate=cost,
        interpret=interpret,
    )(M, x, x, x)


def pcg_streamed(
    S: jnp.ndarray,       # (K, 3, s, s)
    Pinv: jnp.ndarray,    # (K, 3, s, s)
    gamma: jnp.ndarray,   # (K, s)
    lam0: Optional[jnp.ndarray] = None,
    *,
    exit_tol=1e-6,
    max_iters=100,
    poly_degree: int = 1,
    interpret: bool = False,
) -> PCGResult:
    """Single-problem PCG with HBM-streamed operators; same contract (and
    exact iteration parity — same loop) as pcg.pcg."""
    K, _, s, _ = S.shape
    dt = gamma.dtype
    K_pad, Lc, n_chunks, sp = plan_chunks(K, s)
    interpret = interpret or jax.default_backend() != "tpu"

    Sp = _pack_operator(S.astype(dt), K_pad, sp)
    Pp = _pack_operator(Pinv.astype(dt), K_pad, sp)
    gp = _pack_vec(gamma, K_pad, sp)
    lp = None if lam0 is None else _pack_vec(lam0.astype(dt), K_pad, sp)

    mv = functools.partial(streamed_matvec, s=s, Lc=Lc, n_chunks=n_chunks,
                           interpret=interpret)

    def dot(a, b):
        # Zero padding keeps pads out of the sum; HIGHEST matches pcg._dot.
        return jnp.vdot(a, b, precision=jax.lax.Precision.HIGHEST)

    res = pcg(Sp, Pp, gp, lp, exit_tol=exit_tol, max_iters=max_iters,
              matvec=mv, dot=dot, poly_degree=poly_degree)
    return PCGResult(
        lam=res.lam[:s, :K].T,
        iters=res.iters,
        converged=res.converged,
        eta=res.eta,
    )


def pcg_streamed_batched(
    S: jnp.ndarray,       # (B, K, 3, s, s)
    Pinv: jnp.ndarray,
    gamma: jnp.ndarray,
    lam0: Optional[jnp.ndarray] = None,
    *,
    exit_tol=1e-6,
    max_iters=100,
    poly_degree: int = 1,
    interpret: bool = False,
) -> PCGResult:
    """Sequential streamed solves over the batch (lax.map): each over-budget
    solve is HBM-bandwidth-bound on its own, so problem concurrency would not
    help — matching the GPU reality that one parallelPCG_fixed launch already
    occupies every SM (gato_pcg.cuh:549-552)."""
    if lam0 is None:
        lam0 = jnp.zeros_like(gamma)

    def one(args):
        Si, Pi, gi, li = args
        return pcg_streamed(Si, Pi, gi, li, exit_tol=exit_tol,
                            max_iters=max_iters, poly_degree=poly_degree,
                            interpret=interpret)

    return jax.lax.map(one, (S, Pinv, gamma, lam0))
