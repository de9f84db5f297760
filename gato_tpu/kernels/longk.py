"""Long-horizon kernel tier: whole solves for K past the fused kernel's VMEM
residency, in the lane-packed layout end to end.

This is the TPU answer to the reference's ``parallelPCG_fixed`` regime
(gato_pcg.cuh:17-268): when the problem exceeds on-chip residency, the GPU
keeps the WHOLE PCG loop inside one cooperative kernel and re-streams S/Pinv
tiles from global memory every iteration.  The earlier streamed tier here
(kernels/pcg_streamed.py) kerneled only the matvec and left the loop,
condensation, and recovery in XLA — measured at K=1024 it beat pure XLA by
only 1.9% (VERDICT round 1).  This module closes that cliff with three
observations:

1. **TPU VMEM is ~16 MB, not the GPU's ~100 KB/SM** — the IIWA operators at
   K=1024 are only 5.5 MB.  What forced the old 4 MB budget was Pallas's
   grid double-buffering, not the hardware: passing S/Pinv through
   ``pl.ANY`` (HBM) and DMA-ing them ONCE into single-buffered VMEM scratch
   (``_pcg_xl``) extends full-speed residency to K ~ 2000 at IIWA width.
2. **Condensation must not fall back to XLA** at long K (batched (14,14)
   Gauss-Jordan runs at ~11% lane occupancy there — the disease that
   motivated fused_solve.py).  ``_condense_kernel`` runs the lane-packed
   condensation GRIDDED over lane chunks, carrying the one-lane cross-chunk
   dependency (phi / th_int / thinv / g_int at the chunk's last lane)
   through a tiny VMEM scratch between sequentially-executed grid steps.
   The next-neighbor term of the symmetric stair is recovered from symmetry
   (Pinv_(k,k+1) = Pinv_(k+1,k)^T): the kernel emits P_left^T at its own
   lane and the caller shifts it one lane left in XLA.
3. **Past XL residency, stream the loop, not the dispatch**: ``_pcg_stream``
   keeps the entire PCG loop in ONE kernel with all vectors VMEM-resident
   and double-buffered chunk DMA of the operator tiles per matvec — the
   true analog of the reference's strided cooperative kernel, with the DMA
   prefetch playing the role of its global-memory re-streaming.  Per
   iteration the traffic is 2 operator passes (~0.5 FLOP/byte): HBM-bound
   by construction, so the roofline is the bandwidth line.
4. **While operators + one condense chunk fit VMEM, fuse EVERYTHING**:
   ``_fused_xl_kernel`` condenses chunk-by-chunk straight into VMEM scratch
   (dynamic 128-aligned lane stores) and runs the whole PCG loop at the
   last chunk — S/Pinv/gamma never touch HBM and the 3-dispatch pipeline
   becomes one kernel.  Measured on v5e at IIWA K=1024 the latency win is
   small (fixed cost 31.4 -> 29.4 us, full solve ~65 -> ~64 us: the
   condense phase is VPU-compute-bound, so the eliminated 22 MB of HBM
   traffic was mostly overlapped) — the tier's value is the freed HBM
   bandwidth under concurrent farms and the single dispatch, at strictly
   bit-identical results (measured max|diff| = 0 vs the xl tier).

Iteration counts match pcg.pcg EXACTLY (the loop is pcg_pallas.pcg_loop —
the same shared body as the resident kernels; tests enforce).

Layout (shared with pcg_pallas/fused_solve, g=1 per problem):

    inputs    : (B, n_cols, sp, Kp)   [column stacks, K on lanes]
    operators : (B, 3, s, sp, Kp)     [slot, block col, block row, lanes]
    vectors   : (B, sp, Kp)

with Kp = n_chunks * Lc (lane-tile chunks; zero padding doubles as the
trajectory-end boundary condition, exactly as in pcg_streamed.plan_chunks).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..pcg import PCGResult
from .pcg_pallas import (_LANE, _SUBLANE, _round_up, _matvec_lanes,
                         _pcg_kernel, make_reducers, pcg_loop)
from .fused_solve import (
    _gj_inv,
    _gj_inv_flag,
    _mat_mat,
    _mat_matT,
    _mat_vec,
    _matT_vec,
    _pack_mat,
    _pack_vec,
    _roll_m1,
    _roll_p1,
    _row_onehot,
    _transpose,
    _unpack_vec,
)

# Per-chunk budget for the gridded condense/recover kernels (blocks are
# double-buffered by the Pallas pipeline, intermediates are not; the constant
# absorbs the slack, validated on-device like fused_solve's budget).
# 8 MB -> Lc=256 at IIWA width (measured VMEM plan ~6 MB): halving the
# sequential grid steps vs the 5 MB/Lc=128 plan cut the K=1024 zero-iter
# span 32 -> 27 us with identical parity.
_CHUNK_BUDGET_BYTES = 8 * 1024 * 1024
# Resident-XL PCG: single-buffered manual-DMA operators + loop vectors.
# 13 MB admits IIWA K=2048 (plan needs 12.25 MB; executed on real v5e VMEM):
# measured 0.129 ms resident vs 0.192 ms streamed-loop at exact iteration
# parity — the streamed tier starts one doubling later.
_XL_BUDGET_BYTES = 13 * 1024 * 1024
# Streamed-loop PCG: resident vectors + 2 operator tiles.
_STREAM_BUDGET_BYTES = 12 * 1024 * 1024


class LongKPlan(NamedTuple):
    sp: int        # padded block rows
    Kp: int        # padded lane length = n_chunks * Lc
    Lc: int        # chunk lane width (multiple of 128)
    n_chunks: int


def plan_longk(K: int, s: int, c: int) -> LongKPlan:
    """Chunking plan: smallest chunk count whose width fits the condense
    working set, then the minimal tile-aligned Kp (pcg_streamed.plan_chunks
    convention, so padding never doubles the array)."""
    sp = _round_up(s, _SUBLANE)
    # Condense working set per lane (f32 words): inputs (2s+2c+3 cols,
    # double-buffered), outputs (7s+c+1 cols, double-buffered), GJ and
    # product intermediates (~7s+c single).
    words = sp * (25 * s + 7 * c + 18)
    Lc_max = max(_LANE, (_CHUNK_BUDGET_BYTES // (4 * words)) // _LANE * _LANE)
    Kp0 = _round_up(K, _LANE)
    n_chunks = -(-Kp0 // Lc_max)
    Lc = _round_up(-(-Kp0 // n_chunks), _LANE)
    return LongKPlan(sp=sp, Kp=Lc * n_chunks, Lc=Lc, n_chunks=n_chunks)


def _vec_words(sp: int) -> int:
    # PCG loop vectors per lane: lam/r/p/eta carries, gamma, lam0, upsilon,
    # r_tilde, plus in/out pipeline blocks — ~14 (sp,) columns.
    return 14 * sp


# The streamed-loop kernel's matvec is a PYTHON-unrolled walk over the
# operator chunks (static DMA slots/slices), so its compiled size scales
# with the chunk count; past ~32 chunks Mosaic compile time explodes
# (measured: nc=64 at K=8192 took >5 min).  Stream tiles are therefore
# re-grouped to the largest width the tile budget allows.
_STREAM_TILE_BYTES = 4 * 1024 * 1024
_STREAM_MAX_CHUNKS = 32


def _stream_chunks(Kp: int, Lc: int, n_chunks: int, s: int, sp: int):
    """Regroup the condense-grid chunking (Lc, n_chunks) into wider stream
    tiles: the largest divisor grouping whose two double-buffered tiles fit
    the budget.  Kp = n*Lc is preserved exactly."""
    per_lane = 2 * 3 * s * sp * 4          # two tile slots
    max_lanes = max(Lc, (_STREAM_TILE_BYTES // per_lane) // _LANE * _LANE)
    for m in range(n_chunks, 0, -1):
        if n_chunks % m == 0 and m * Lc <= max_lanes:
            return Lc * m, n_chunks // m
    return Lc, n_chunks


# Fused condense+PCG (single kernel): S+P+gamma+loop vectors resident over
# the FULL Kp, plus one chunk's condense working set (double-buffered input
# blocks, Qinv/Rinv output blocks, GJ/product intermediates).
_FUSED_XL_BUDGET_BYTES = 13 * 1024 * 1024


def fits_fused_xl(K: int, s: int, c: int) -> bool:
    """True iff the single-kernel condense+PCG tier fits VMEM: the whole
    operators and loop vectors resident over Kp lanes plus one chunk's
    condensation working set."""
    plan = plan_longk(K, s, c)
    sp, Kp, Lc = plan.sp, plan.Kp, plan.Lc
    per_kp = (2 * 3 * s * sp + sp + _vec_words(sp)) * 4
    per_lc = ((2 * s + 2 * c + 3) * 2 + (s + c) * 2 + 7 * s + c) * sp * 4
    return Kp * per_kp + Lc * per_lc <= _FUSED_XL_BUDGET_BYTES


def fits_xl(K: int, s: int, c: int) -> bool:
    """True iff S+Pinv and the loop vectors fit VMEM single-buffered — the
    resident-XL regime (full-speed PCG, no per-iteration HBM traffic)."""
    plan = plan_longk(K, s, c)
    bytes_per_lane = (2 * 3 * s * plan.sp + _vec_words(plan.sp)) * 4
    return plan.Kp * bytes_per_lane <= _XL_BUDGET_BYTES


def fits_vmem(K: int, s: int, c: int) -> bool:
    """True iff the streamed-loop tier can run: vectors resident + 2 DMA
    tiles, at a compilable chunk count.  Past this (K in the tens of
    thousands at IIWA width) the solver falls back to the XLA-loop streamed
    matvec (kernels/pcg_streamed.py), which has no residency requirement."""
    plan = plan_longk(K, s, c)
    Lc_s, n_s = _stream_chunks(plan.Kp, plan.Lc, plan.n_chunks, s, plan.sp)
    vec_bytes = _vec_words(plan.sp) * 4 * plan.Kp
    tile_bytes = 2 * 3 * s * plan.sp * Lc_s * 4
    return (vec_bytes + tile_bytes <= _STREAM_BUDGET_BYTES
            and n_s <= _STREAM_MAX_CHUNKS)


def should_dispatch(K: int, s: int, c: int) -> bool:
    """True iff the long-horizon tier owns this shape under the 'pallas'
    backend: past the resident PCG kernel's VMEM budget but within one of
    the longk tiers.  The ONE definition of that boundary — solver dispatch
    (single, batched) and the MPC sequence core all call this, so a tier
    change cannot silently diverge between entry points."""
    from .pcg_pallas import fits_vmem as _resident_fits

    return not _resident_fits(K, s) and fits_vmem(K, s, c)


# --------------------------------------------------------------------------
# Condensation, gridded over lane chunks with a carry.


def _condense_chunk(
    rho,
    Q_ref, R_ref, A_ref, B_ref, qv, rv, cv,              # (1, ncols, sp, Lc) / (sp, Lc)
    carry,                                               # VMEM (sp, 3s+1)
    ch,
    *, s: int, c: int, sp: int, precond: str,
):
    """One lane chunk of the Schur condensation (assemble.condense formulas
    on column stacks — identical primitives to fused_solve._condense_cols).
    Shared body of the standalone condense kernel and the fused-XL kernel.

    The caller grids (B, n_chunks) with chunks innermost: TPU grid steps
    execute sequentially, so the ``carry`` scratch written at chunk ch is
    exactly what chunk ch+1 reads — the one-lane dependency (phi_k / th_int
    / thinv / g_int at lane ch*Lc-1) crosses the chunk boundary through it.
    Chunk 0 substitutes zeros (the trajectory-start boundary), which also
    resets the carry between problems of the batch grid axis.

    Returns (S_slots, P_slots, gamma, Qinv, Rinv) with S/P as 3-slot lists
    of column stacks; P slot 2 is P_left^T AT ITS OWN LANE (the caller
    shifts it one lane left — see the stair note below).  Writes the carry
    LAST, after every read of the incoming carry.
    """
    dt = qv.dtype

    L = qv.shape[-1]

    Qc = [Q_ref[0, b] + rho * _row_onehot(b, sp, dt) for b in range(s)]
    Rc = [R_ref[0, b] + rho * _row_onehot(b, sp, dt) for b in range(c)]
    Ac = [A_ref[0, b] for b in range(s)]
    Bc = [B_ref[0, b] for b in range(c)]

    Qinv = _gj_inv(Qc, s, sp)          # knot lanes
    Rinv = _gj_inv(Rc, c, sp)          # interval lanes
    phi = _mat_mat(Ac, Qinv, s)        # interval lane k: phi_{k+1} = A_k Qinv_k
    BR = _mat_mat(Bc, Rinv, c)
    th_int = [
        a + b
        for a, b in zip(_mat_matT(phi, Ac, s, s), _mat_matT(BR, Bc, s, c))
    ]
    g_int = _mat_vec(phi, qv, s) + _mat_vec(BR, rv, c)

    # Cross-chunk roll: in-chunk lane roll with lane 0 patched from the
    # carry (zeros at chunk 0).  Carry columns: [0:s] th_int, [s:2s] phi,
    # [2s:3s] thinv, [3s] g_int — each the previous chunk's LAST lane.
    lane0 = jax.lax.broadcasted_iota(jnp.int32, (sp, L), 1) == 0
    first = ch == 0

    def roll_in(x, idx):
        prev = jnp.where(first, 0.0, carry[:, idx : idx + 1])
        return jnp.where(lane0, prev, _roll_p1(x))

    theta = [roll_in(th_int[b], b) + Qinv[b] for b in range(s)]
    gamma = roll_in(g_int, 3 * s) + _mat_vec(Qinv, qv, s) - cv
    S_left = [roll_in(phi[b], s + b) for b in range(s)]
    phiT = _transpose(phi, s, sp)      # S_right: at knot lane k, phi_{k+1}^T

    # Preconditioner (assemble._preconditioner formulas).  The stair's
    # NEXT-neighbor block can't be formed under a sequential carry; by
    # symmetry Pinv_(k,k+1) = Pinv_(k+1,k)^T, so slot 2 is emitted as
    # P_left^T AT ITS OWN LANE and the caller shifts it one lane left
    # (solve_longk_batched).
    zero = jnp.zeros((sp, L), dt)
    if precond == "jacobi":
        thdinv = [
            1.0 / jnp.where(theta[b][b : b + 1, :] != 0,
                            theta[b][b : b + 1, :], 1.0)
            for b in range(s)
        ]
        P_main = [_row_onehot(b, sp, dt) * thdinv[b] for b in range(s)]
        P_left = [zero] * s
        PLT = [zero] * s
        thinv = [zero] * s             # carry slot unused in this mode
    else:
        thinv = _gj_inv(theta, s, sp)
        P_main = thinv
        if precond == "block_jacobi":
            P_left = [zero] * s
            PLT = [zero] * s
        else:
            thinv_prev = [roll_in(thinv[b], 2 * s + b) for b in range(s)]
            P_left = [
                -x for x in
                _mat_mat(_mat_mat(thinv, S_left, s), thinv_prev, s)
            ]
            PLT = _transpose(P_left, s, sp)

    # Write the carry LAST (chunk ch+1 reads what this chunk's lane L-1 had).
    for b in range(s):
        carry[:, b : b + 1] = th_int[b][:, L - 1 : L]
        carry[:, s + b : s + b + 1] = phi[b][:, L - 1 : L]
        carry[:, 2 * s + b : 2 * s + b + 1] = thinv[b][:, L - 1 : L]
    carry[:, 3 * s : 3 * s + 1] = g_int[:, L - 1 : L]

    return ((S_left, theta, phiT), (P_left, P_main, PLT), gamma, Qinv, Rinv)


def _condense_kernel(
    rho_ref,                                             # SMEM scalar
    Q_ref, R_ref, A_ref, B_ref, q_ref, r_ref, c_ref,     # (1, ncols, sp, Lc)
    S_out, P_out, gam_out, Qinv_out, Rinv_out,
    carry,                                               # VMEM (sp, 3s+1)
    *, s: int, c: int, sp: int, precond: str,
):
    """Standalone chunked condensation (for the XL / streamed-loop tiers):
    runs :func:`_condense_chunk` and writes each chunk's outputs to HBM."""
    S_slots, P_slots, gamma, Qinv, Rinv = _condense_chunk(
        rho_ref[0], Q_ref, R_ref, A_ref, B_ref,
        q_ref[0], r_ref[0], c_ref[0], carry, pl.program_id(1),
        s=s, c=c, sp=sp, precond=precond,
    )
    for j in range(3):
        for b in range(s):
            S_out[0, j, b] = S_slots[j][b]
            P_out[0, j, b] = P_slots[j][b]
    for b in range(s):
        Qinv_out[0, b] = Qinv[b]
    for b in range(c):
        Rinv_out[0, b] = Rinv[b]
    gam_out[0] = gamma


def _condense_call(rho, Qb, Rb, Ab, Bb, qb, rb, cb, *,
                   s, c, sp, Kp, Lc, n_chunks, precond, interpret):
    Bn = qb.shape[0]
    dt = qb.dtype

    def mat_in(ncols):
        return pl.BlockSpec((1, ncols, sp, Lc), lambda b, ch: (b, 0, 0, ch),
                            memory_space=pltpu.VMEM)

    def mat_out(ncols):
        return pl.BlockSpec((1, ncols, sp, Lc), lambda b, ch: (b, 0, 0, ch),
                            memory_space=pltpu.VMEM)

    op_out = pl.BlockSpec((1, 3, s, sp, Lc), lambda b, ch: (b, 0, 0, 0, ch),
                          memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, sp, Lc), lambda b, ch: (b, 0, ch),
                       memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    cost = pl.CostEstimate(
        flops=int(Bn * Kp * sp * s * (12 * s + 6 * c)),
        bytes_accessed=int((Qb.size + Rb.size + Ab.size + Bb.size) * 4 * 2),
        transcendentals=0,
    )
    return pl.pallas_call(
        functools.partial(_condense_kernel, s=s, c=c, sp=sp, precond=precond),
        grid=(Bn, n_chunks),
        out_shape=(
            jax.ShapeDtypeStruct((Bn, 3, s, sp, Kp), dt),   # S
            jax.ShapeDtypeStruct((Bn, 3, s, sp, Kp), dt),   # Pinv (slot 2 pre-shift)
            jax.ShapeDtypeStruct((Bn, sp, Kp), dt),         # gamma
            jax.ShapeDtypeStruct((Bn, s, sp, Kp), dt),      # Qinv
            jax.ShapeDtypeStruct((Bn, c, sp, Kp), dt),      # Rinv
        ),
        in_specs=[smem, mat_in(s), mat_in(c), mat_in(s), mat_in(c),
                  vec, vec, vec],
        out_specs=(op_out, op_out, vec, mat_out(s), mat_out(c)),
        scratch_shapes=[pltpu.VMEM((sp, 3 * s + 1), dt)],
        cost_estimate=cost,
        interpret=interpret,
    )(jnp.asarray(rho, dt).reshape(1), Qb, Rb, Ab, Bb, qb, rb, cb)


# --------------------------------------------------------------------------
# PCG tiers.


def _aux_tail(lanes, lam, eta, n_iters, conv, lam_out, it_out, cv_out,
              eta_out):
    i32 = jnp.int32
    lam_out[0] = lam
    shape = it_out.shape[1:]
    dt = lam.dtype
    it_out[0] = jnp.broadcast_to(lanes(n_iters.astype(dt)), shape).astype(i32)
    cv_out[0] = jnp.broadcast_to(lanes(conv.astype(dt)), shape).astype(i32)
    eta_out[0] = jnp.broadcast_to(lanes(jnp.abs(eta)), shape)


def _pcg_xl_call(Sb, Pb, gamb, lb, exit_tol, max_iters, *,
                 s, sp, Kp, poly_degree, interpret):
    """Resident-XL: grid over problems; each program DMAs its S/Pinv from
    HBM into SINGLE-buffered VMEM scratch once, then runs the resident
    PCG kernel body (pcg_pallas._pcg_kernel, g=1) on it.  Manual DMA exists
    precisely to opt out of the pipeline's double buffering — at these sizes
    2x the operators is the difference between resident and not."""
    Bn = gamb.shape[0]
    dt = gamb.dtype

    def kernel(tol_ref, maxit_ref, S_hbm, P_hbm, gam_ref, lam0_ref,
               lam_out, it_out, cv_out, eta_out, S_vm, P_vm, sems):
        b = pl.program_id(0)
        cS = pltpu.make_async_copy(S_hbm.at[b], S_vm, sems.at[0])
        cP = pltpu.make_async_copy(P_hbm.at[b], P_vm, sems.at[1])
        cS.start()
        cP.start()
        cS.wait()
        cP.wait()
        # Finish the stair in-scratch (see _fused_xl_kernel): slot 2 arrives
        # as P_left^T at its own lane; shift it one lane left here instead
        # of paying an XLA update-slice on the (Bn, 3, s, sp, Kp) array.
        lane = jax.lax.broadcasted_iota(jnp.int32, (sp, Kp), 1)
        for col in range(s):
            p2 = P_vm[2, col]
            P_vm[2, col, :, :] = jnp.where(lane == Kp - 1, 0.0, _roll_m1(p2))
        _pcg_kernel(
            tol_ref, maxit_ref, S_vm, P_vm, gam_ref.at[0], lam0_ref.at[0],
            lam_out.at[0], it_out.at[0], cv_out.at[0], eta_out.at[0],
            s=s, K_sub=Kp, g=1, poly_degree=poly_degree, unroll=4,
        )

    vec = pl.BlockSpec((1, sp, Kp), lambda b: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    aux = pl.BlockSpec((1, _SUBLANE, Kp), lambda b: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)

    cost = pl.CostEstimate(
        flops=int(Bn * 2 * 2 * 3 * s * sp * Kp * 50),
        bytes_accessed=int((Sb.size + Pb.size + 6 * gamb.size) * 4),
        transcendentals=0,
    )
    return pl.pallas_call(
        kernel,
        grid=(Bn,),
        out_shape=(
            jax.ShapeDtypeStruct((Bn, sp, Kp), dt),
            jax.ShapeDtypeStruct((Bn, _SUBLANE, Kp), jnp.int32),
            jax.ShapeDtypeStruct((Bn, _SUBLANE, Kp), jnp.int32),
            jax.ShapeDtypeStruct((Bn, _SUBLANE, Kp), dt),
        ),
        in_specs=[smem, smem, hbm, hbm, vec, vec],
        out_specs=(vec, aux, aux, aux),
        scratch_shapes=[
            pltpu.VMEM((3, s, sp, Kp), dt),
            pltpu.VMEM((3, s, sp, Kp), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=cost,
        interpret=interpret,
    )(
        jnp.asarray(exit_tol, dt).reshape(1),
        jnp.asarray(max_iters, jnp.int32).reshape(1),
        Sb, Pb, gamb, lb,
    )


def _fused_xl_kernel(
    rho_ref, tol_ref, maxit_ref,                          # SMEM scalars
    Q_ref, R_ref, A_ref, B_ref, q_ref, r_ref, c_ref,      # (1,·,sp,Lc) @ (b,ch)
    lam0_ref,                                             # (1,sp,Kp) @ b
    lam_out, it_out, cv_out, eta_out,                     # (1,·,Kp) @ b
    Qinv_out, Rinv_out,                                   # (1,·,sp,Lc) @ (b,ch)
    S_vm, P_vm, gam_vm, carry,                            # VMEM scratch
    *, s: int, c: int, sp: int, Lc: int, n_chunks: int, Kp: int,
    precond: str, poly_degree: int,
):
    """Condense + WHOLE PCG loop in ONE kernel: S/Pinv/gamma never touch HBM.

    Each (b, ch) grid step condenses one lane chunk (the shared
    :func:`_condense_chunk` body, same carry) and stores its column stacks
    into contiguous (3, s, sp, Kp) VMEM scratch at lane offset ch*Lc — a
    dynamic but 128-aligned lane store, which Mosaic lowers natively
    (validated on v5e).  At the LAST chunk the stair's next-neighbor shift
    runs in-scratch and the resident PCG loop (pcg_pallas.pcg_loop with the
    same whole-array matvec as the XL tier) executes on the just-built
    operators.  Vs the 3-dispatch pipeline this eliminates the S/P HBM
    write (~13 us at IIWA K=1024), the XL DMA read-back (~11 us), and the
    XLA slot-2 shift — with BIT-IDENTICAL operator values, so iteration
    parity with the XLA oracle is inherited unchanged.

    Qinv/Rinv still stream out per chunk (the recovery kernel needs them).
    """
    ch = pl.program_id(1)
    S_slots, P_slots, gamma, Qinv, Rinv = _condense_chunk(
        rho_ref[0], Q_ref, R_ref, A_ref, B_ref,
        q_ref[0], r_ref[0], c_ref[0], carry, ch,
        s=s, c=c, sp=sp, precond=precond,
    )
    off = ch * Lc
    for j in range(3):
        for b in range(s):
            S_vm[j, b, :, pl.ds(off, Lc)] = S_slots[j][b]
            P_vm[j, b, :, pl.ds(off, Lc)] = P_slots[j][b]
    gam_vm[:, pl.ds(off, Lc)] = gamma
    for b in range(s):
        Qinv_out[0, b] = Qinv[b]
    for b in range(c):
        Rinv_out[0, b] = Rinv[b]

    @pl.when(ch == n_chunks - 1)
    def _pcg_phase():
        dt = gamma.dtype
        # Finish the stair in-scratch: slot 2 was stored as P_left^T at its
        # own lane; Pinv_(k,k+1) = Pinv_(k+1,k)^T lives one lane LEFT.  The
        # scratch is lane-contiguous over the whole Kp, so one global roll
        # with the last lane zeroed is bit-identical to _shift_left_lane.
        lane = jax.lax.broadcasted_iota(jnp.int32, (sp, Kp), 1)
        for b in range(s):
            p2 = P_vm[2, b]
            P_vm[2, b, :, :] = jnp.where(lane == Kp - 1, 0.0, _roll_m1(p2))

        S = S_vm[:, :, :, :]
        P = P_vm[:, :, :, :]
        mv = functools.partial(_matvec_lanes, s=s)
        seg_sum, lanes = make_reducers(1, Kp, Kp, dt)
        lam, eta, n_iters, conv = pcg_loop(
            functools.partial(mv, S), functools.partial(mv, P),
            gam_vm[:, :], lam0_ref[0], tol_ref[0], maxit_ref[0],
            seg_sum, lanes, 1, poly_degree=poly_degree, unroll=4,
        )
        _aux_tail(lanes, lam, eta, n_iters, conv, lam_out, it_out, cv_out,
                  eta_out)


def _fused_xl_call(rho, Qb, Rb, Ab, Bb, qb, rb, cb, lb, exit_tol, max_iters,
                   *, s, c, sp, Kp, Lc, n_chunks, precond, poly_degree,
                   interpret):
    Bn = qb.shape[0]
    dt = qb.dtype

    def mat_in(ncols):
        return pl.BlockSpec((1, ncols, sp, Lc), lambda b, ch: (b, 0, 0, ch),
                            memory_space=pltpu.VMEM)

    vec_ch = pl.BlockSpec((1, sp, Lc), lambda b, ch: (b, 0, ch),
                          memory_space=pltpu.VMEM)
    vec_full = pl.BlockSpec((1, sp, Kp), lambda b, ch: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    aux = pl.BlockSpec((1, _SUBLANE, Kp), lambda b, ch: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    cost = pl.CostEstimate(
        flops=int(Bn * Kp * sp * s * (12 * s + 6 * c)
                  + Bn * 2 * 2 * 3 * s * sp * Kp * 50),
        bytes_accessed=int((Qb.size + Rb.size + Ab.size + Bb.size) * 4 * 2),
        transcendentals=0,
    )
    return pl.pallas_call(
        functools.partial(_fused_xl_kernel, s=s, c=c, sp=sp, Lc=Lc,
                          n_chunks=n_chunks, Kp=Kp, precond=precond,
                          poly_degree=poly_degree),
        grid=(Bn, n_chunks),
        out_shape=(
            jax.ShapeDtypeStruct((Bn, sp, Kp), dt),              # lam
            jax.ShapeDtypeStruct((Bn, _SUBLANE, Kp), jnp.int32), # iters
            jax.ShapeDtypeStruct((Bn, _SUBLANE, Kp), jnp.int32), # conv
            jax.ShapeDtypeStruct((Bn, _SUBLANE, Kp), dt),        # eta
            jax.ShapeDtypeStruct((Bn, s, sp, Kp), dt),           # Qinv
            jax.ShapeDtypeStruct((Bn, c, sp, Kp), dt),           # Rinv
        ),
        in_specs=[smem, smem, smem,
                  mat_in(s), mat_in(c), mat_in(s), mat_in(c),
                  vec_ch, vec_ch, vec_ch, vec_full],
        out_specs=(vec_full, aux, aux, aux, mat_in(s), mat_in(c)),
        scratch_shapes=[
            pltpu.VMEM((3, s, sp, Kp), dt),
            pltpu.VMEM((3, s, sp, Kp), dt),
            pltpu.VMEM((sp, Kp), dt),
            pltpu.VMEM((sp, 3 * s + 1), dt),
        ],
        cost_estimate=cost,
        interpret=interpret,
    )(
        jnp.asarray(rho, dt).reshape(1),
        jnp.asarray(exit_tol, dt).reshape(1),
        jnp.asarray(max_iters, jnp.int32).reshape(1),
        Qb, Rb, Ab, Bb, qb, rb, cb, lb,
    )


def _pcg_stream_kernel(
    tol_ref, maxit_ref, S_hbm, P_hbm, gam_ref, lam0_ref,
    lam_out, it_out, cv_out, eta_out, tiles, sems,
    *, s: int, sp: int, Lc: int, n_chunks: int, Kp: int, poly_degree: int,
):
    """The whole PCG loop in one kernel with the operators HBM-streamed:
    vectors stay VMEM-resident across all iterations; each matvec walks the
    chunked operator (n_chunks, 3, s, sp, Lc) with double-buffered DMA —
    tile ch+1 is in flight while tile ch multiplies.  Role of the
    reference's parallelPCG_fixed re-streaming (gato_pcg.cuh:82-84,120-122,
    182-184), with DMA prefetch instead of cache hope."""
    b = pl.program_id(0)
    gam = gam_ref[0]
    lam0 = lam0_ref[0]
    dt = gam.dtype
    lane = jax.lax.broadcasted_iota(jnp.int32, (sp, Lc), 1)
    zcol = jnp.zeros((sp, 1), dt)

    def mv(M_hbm, x):
        def dma(ci, slot):
            return pltpu.make_async_copy(
                M_hbm.at[b, ci], tiles.at[slot], sems.at[slot]
            )

        dma(0, 0).start()
        parts = []
        for ci in range(n_chunks):
            if ci + 1 < n_chunks:
                dma(ci + 1, (ci + 1) % 2).start()
            dma(ci, ci % 2).wait()
            M = tiles[ci % 2]                       # (3, s, sp, Lc)
            xc = x[:, ci * Lc : (ci + 1) * Lc]
            xm = pltpu.roll(xc, shift=1, axis=1)
            xp = pltpu.roll(xc, shift=Lc - 1, axis=1)
            pcol = x[:, ci * Lc - 1 : ci * Lc] if ci > 0 else zcol
            ncol = (x[:, (ci + 1) * Lc : (ci + 1) * Lc + 1]
                    if ci + 1 < n_chunks else zcol)
            xm = jnp.where(lane == 0, pcol, xm)
            xp = jnp.where(lane == Lc - 1, ncol, xp)
            # Per-slot accumulators, (left + right) + main: same
            # 3x-shorter-chain win and association order as
            # pcg_pallas._matvec_lanes (measured ~8% at stream tile widths).
            slots = []
            for j, h in ((0, xm), (1, xc), (2, xp)):
                y = M[j, 0] * h[0:1, :]
                for col in range(1, s):
                    y = y + M[j, col] * h[col : col + 1, :]
                slots.append(y)
            parts.append((slots[0] + slots[2]) + slots[1])
        return jnp.concatenate(parts, axis=1)

    seg_sum, lanes = make_reducers(1, Kp, Kp, dt)
    lam, eta, n_iters, conv = pcg_loop(
        functools.partial(mv, S_hbm), functools.partial(mv, P_hbm),
        gam, lam0, tol_ref[0], maxit_ref[0], seg_sum, lanes, 1,
        poly_degree=poly_degree, unroll=1,
    )
    _aux_tail(lanes, lam, eta, n_iters, conv, lam_out, it_out, cv_out,
              eta_out)


def _pcg_stream_call(Sb, Pb, gamb, lb, exit_tol, max_iters, *,
                     s, sp, Kp, Lc, n_chunks, poly_degree, interpret):
    Bn = gamb.shape[0]
    dt = gamb.dtype
    # Chunk-major operator layout so every DMA tile is contiguous.
    Sc = Sb.reshape(Bn, 3, s, sp, n_chunks, Lc).transpose(0, 4, 1, 2, 3, 5)
    Pc = Pb.reshape(Bn, 3, s, sp, n_chunks, Lc).transpose(0, 4, 1, 2, 3, 5)

    vec = pl.BlockSpec((1, sp, Kp), lambda b: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    aux = pl.BlockSpec((1, _SUBLANE, Kp), lambda b: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)

    cost = pl.CostEstimate(
        flops=int(Bn * 2 * 2 * 3 * s * sp * Kp * 50),
        bytes_accessed=int((Sc.size + Pc.size) * 4 * 50),
        transcendentals=0,
    )
    return pl.pallas_call(
        functools.partial(_pcg_stream_kernel, s=s, sp=sp, Lc=Lc,
                          n_chunks=n_chunks, Kp=Kp, poly_degree=poly_degree),
        grid=(Bn,),
        out_shape=(
            jax.ShapeDtypeStruct((Bn, sp, Kp), dt),
            jax.ShapeDtypeStruct((Bn, _SUBLANE, Kp), jnp.int32),
            jax.ShapeDtypeStruct((Bn, _SUBLANE, Kp), jnp.int32),
            jax.ShapeDtypeStruct((Bn, _SUBLANE, Kp), dt),
        ),
        in_specs=[smem, smem, hbm, hbm, vec, vec],
        out_specs=(vec, aux, aux, aux),
        scratch_shapes=[
            pltpu.VMEM((2, 3, s, sp, Lc), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=cost,
        interpret=interpret,
    )(
        jnp.asarray(exit_tol, dt).reshape(1),
        jnp.asarray(max_iters, jnp.int32).reshape(1),
        Sc, Pc, gamb, lb,
    )


# --------------------------------------------------------------------------
# Direct (exact) tier: whole block cyclic reduction in one kernel.

# What actually binds this tier is Mosaic's 16 MB SCOPED-vmem (stack)
# limit, not total VMEM: with the CR's log2(Kp) levels Python-unrolled the
# stack holds every level's intermediates at once — measured 20.2 MB at
# Kp=1024 with SSA state, 18.7 MB with in-place scratch (Mosaic does not
# coalesce stack slots across unrolled levels) — both hard compile errors.
# _cr_solve_scratch therefore mutates the operator IN VMEM scratch and runs
# the levels as a fori_loop (dynamic-shift rolls), so the stack holds ONE
# level's transients: ~(10s + 6) (sp, Kp) f32 arrays (Dinv + its rolls
# against the L/U reads, the four neighbor-product stacks, the D/L/U
# updates, b/x vectors).  The formula below models that per-level stack;
# 13 MB of modeled transients keeps the real stack under Mosaic's 16,
# validated on-device AT THE BOUNDARY, not extrapolated: the largest
# admitted K per width compiles and solves on v5e (IIWA s=14: K=1280,
# plan Kp=1280 sp=16; s=8: K=4480; s=4: K=8960 — all converged,
# rel err vs the XLA path ~3e-6).
_DIRECT_XL_BUDGET_BYTES = 13 * 1024 * 1024


def fits_direct_xl(K: int, s: int, c: int) -> bool:
    """True iff the long-horizon DIRECT tier compiles: one cyclic-reduction
    level's transients fit Mosaic's scoped-vmem stack (see the budget note
    above; the DMA'd operator scratch is small next to it).  Past it,
    ``method='direct'`` falls back to the XLA path (exact either way, only
    latency differs)."""
    plan = plan_longk(K, s, c)
    return plan.Kp * 4 * plan.sp * (10 * s + 6) <= _DIRECT_XL_BUDGET_BYTES


def should_dispatch_direct(K: int, s: int, c: int) -> bool:
    """True iff the longk direct ladder owns this shape under the 'pallas'
    backend: past the fused cyclic-reduction kernel's packing budget — the
    method='direct' analog of :func:`should_dispatch` (one definition,
    used by solver dispatch).  Round 5: no upper bound — past direct-XL
    residency the HYBRID tier (compacting XLA peels + the one-kernel CR)
    serves ANY K, measured faster than the jax Thomas scan at narrow batch
    (0.34 vs ~1.0 ms at K=2048/B=1, 0.79 vs 2.10 at K=4096, v5e)."""
    from .direct_fused import fits_vmem as _fused_direct_fits

    return not _fused_direct_fits(K, s, c)


def _cr_solve_scratch(S_vm, bv, lane, *, s: int, sp: int, Kp: int):
    """Block cyclic reduction with the operator state IN VMEM SCRATCH,
    updated in place per level (the role of the reference's in-shared-memory
    elimination, gato_utils.cuh:409-586) instead of carried as SSA values.
    The functional direct_fused._cr_solve is the wrong shape at XL scale:
    its Python-unrolled log2(Kp) levels keep every level's intermediates
    live on Mosaic's scoped-vmem stack — measured 20.2 MB at Kp=1024
    (> the 16 MB scoped limit), and still 18.7 MB with in-place scratch
    alone (Mosaic does not coalesce stack slots across unrolled levels).
    Same per-level algebra and masked-blend schedule as
    direct_fused._cr_solve (incl. the merged Dinv-in-D-slot store); every
    read of a level completes before its writes, so the computed values are
    identical.  ``S_vm`` slots follow the blocktri convention 0=L, 1=D, 2=U;
    the operator is DESTROYED (retired lanes hold their Dinv).  Returns x
    with S x = b, poisoned by +1e30 at lanes whose USED block inversion
    clamped a zero pivot on live data (_gj_inv_flag) — singular input the
    clamp would otherwise silently regularize; the caller's true-residual
    eta then blows past residual_converged like the XLA path's NaN
    (finite poison, not inf: structurally-zero operator blocks times inf
    would NaN unrelated lanes in the caller's residual matvec)."""
    dt = bv.dtype
    levels = max(1, (Kp - 1).bit_length())

    # The levels run as a fori_loop with a DYNAMIC shift h = 1 << lev
    # (pltpu.roll takes traced shifts), not a Python unroll: unrolled, every
    # level's transients occupy distinct Mosaic stack slots and the scoped-
    # vmem footprint scales with level count (measured 18.7 MB at Kp=1024
    # even with the in-place scratch — still over the 16 MB limit); as a
    # loop the stack holds exactly one level's transients.

    def _elim_level(lev, carry):
        bv, bad = carry
        h = jnp.int32(1) << lev

        def rp(x):   # value of lane k-h at lane k (left neighbor)
            return pltpu.roll(x, shift=h, axis=x.ndim - 1)

        def rm(x):   # value of lane k+h at lane k (right neighbor)
            return pltpu.roll(x, shift=Kp - h, axis=x.ndim - 1)

        Lc = [S_vm[0, col] for col in range(s)]
        Dc = [S_vm[1, col] for col in range(s)]
        Uc = [S_vm[2, col] for col in range(s)]
        Dinv_cur, bad_cur = _gj_inv_flag(Dc, s, sp)
        odd_f = (lane % (2 * h) == h).astype(dt)
        even_f = (lane % (2 * h) == 0).astype(dt)
        bad = bad + odd_f * bad_cur

        Am = _mat_mat(Lc, [rp(x) for x in Dinv_cur], s)   # L_e D_{o,l}^-1
        Bm = _mat_mat(Uc, [rm(x) for x in Dinv_cur], s)   # U_e D_{o,r}^-1
        AU = _mat_mat(Am, [rp(x) for x in Uc], s)
        BL = _mat_mat(Bm, [rm(x) for x in Lc], s)
        b_new = bv - _mat_vec(Am, rp(bv), s) - _mat_vec(Bm, rm(bv), s)
        L_new = [-x for x in _mat_mat(Am, [rp(x) for x in Lc], s)]
        U_new = [-x for x in _mat_mat(Bm, [rm(x) for x in Uc], s)]

        for col in range(s):
            S_vm[1, col] = (even_f * (Dc[col] - AU[col] - BL[col])
                            + odd_f * Dinv_cur[col]
                            + (1.0 - even_f - odd_f) * Dc[col])
        for col in range(s):
            S_vm[0, col] = even_f * L_new[col] + (1.0 - even_f) * Lc[col]
            S_vm[2, col] = even_f * U_new[col] + (1.0 - even_f) * Uc[col]
        return even_f * b_new + (1.0 - even_f) * bv, bad

    bv, bad = jax.lax.fori_loop(
        0, levels, _elim_level, (bv, jnp.zeros((1, Kp), dt)))

    # Root solve: lane 0 holds the only live D (see direct_fused._cr_solve).
    root_f = (lane == 0).astype(dt)
    Dinv_root, bad_root = _gj_inv_flag(
        [S_vm[1, col] for col in range(s)], s, sp)
    bad = bad + root_f * bad_root
    x = root_f * _mat_vec(Dinv_root, bv, s)

    # Back-substitution: x_odd = Dinv (b - L x_left - U x_right); this
    # level's odd lanes hold their Dinv in the D slot.
    def _back_level(i, x):
        h = jnp.int32(1) << (levels - 1 - i)

        def rp(x_):
            return pltpu.roll(x_, shift=h, axis=x_.ndim - 1)

        def rm(x_):
            return pltpu.roll(x_, shift=Kp - h, axis=x_.ndim - 1)

        odd_f = (lane % (2 * h) == h).astype(dt)
        rhs = (bv
               - _mat_vec([S_vm[0, col] for col in range(s)], rp(x), s)
               - _mat_vec([S_vm[2, col] for col in range(s)], rm(x), s))
        x_odd = _mat_vec([S_vm[1, col] for col in range(s)], rhs, s)
        return odd_f * x_odd + (1.0 - odd_f) * x

    x = jax.lax.fori_loop(0, levels, _back_level, x)
    return x + jnp.where(bad > 0, 1e30, 0.0)


def _direct_xl_call(Sb, gamb, *, s, sp, Kp, interpret):
    """Exact solve of S lam = gamma with the WHOLE block cyclic reduction in
    one kernel: grid over problems; each program DMAs its condensed operator
    from HBM into single-buffered VMEM scratch once (the _pcg_xl_call idiom)
    and runs :func:`_cr_solve_scratch` IN that scratch — log2(Kp)
    lane-parallel elimination levels instead of the XLA path's K-sequential
    Thomas sweep or its relayout-diseased batched CR (direct.btd_solve_cr).
    The CR destroys the scratch copy; the true-residual eta is computed by
    the caller in XLA from the HBM-resident Sb (one extra operator pass —
    cheaper than a second operator-sized VMEM residency here).  Returns
    packed lam (B, sp, Kp)."""
    Bn = gamb.shape[0]
    dt = gamb.dtype

    def kernel(S_hbm, gam_ref, lam_out, S_vm, sems):
        b = pl.program_id(0)
        cp = pltpu.make_async_copy(S_hbm.at[b], S_vm, sems.at[0])
        cp.start()
        cp.wait()
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, Kp), 1)
        lam_out[0] = _cr_solve_scratch(
            S_vm, gam_ref[0], lane, s=s, sp=sp, Kp=Kp)

    vec = pl.BlockSpec((1, sp, Kp), lambda b: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)

    levels = max(1, (Kp - 1).bit_length())
    cost = pl.CostEstimate(
        flops=int(Bn * Kp * sp * s * s * 8 * levels),
        bytes_accessed=int(Sb.size * 4 + 2 * gamb.size * 4),
        transcendentals=0,
    )
    return pl.pallas_call(
        kernel,
        grid=(Bn,),
        out_shape=jax.ShapeDtypeStruct((Bn, sp, Kp), dt),
        in_specs=[hbm, vec],
        out_specs=vec,
        scratch_shapes=[
            pltpu.VMEM((3, s, sp, Kp), dt),
            pltpu.SemaphoreType.DMA((1,)),
        ],
        cost_estimate=cost,
        interpret=interpret,
    )(Sb, gamb)


def _cr_solve_xla(Sp, bv, *, s: int, sp: int, Kp: int):
    """Lane-packed block cyclic reduction in PURE XLA — the unlimited-K
    direct tier.  Same per-level algebra as :func:`_cr_solve_scratch`
    (reusing the column-stack primitives, which are plain jnp code), with
    ``jnp.roll`` for the lane shifts and the state carried through a
    ``fori_loop``; no VMEM residency constraint, so this covers every K the
    chunked condense kernel can produce.  Unlike direct.btd_solve_cr (which
    gathers/reshapes (K, 3, s, s) blocks every level — the measured
    "relayout-diseased" path), the state here never leaves the packed lane
    layout the condense kernel emitted: each level is a handful of fused
    elementwise passes over (s, sp, Kp) stacks, bandwidth-bound, log2(Kp)
    deep instead of the Thomas scan's K-sequential chain.

    Measured (v5e, IIWA width, whole solve through this tier vs the XLA
    path): K=2048 1.68 ms vs 1.00, K=4096 3.76 ms vs 2.12 — every level
    re-touches the FULL (s, sp, Kp) stacks (roll-based CR never compacts),
    so past the kernel tiers the Thomas scan's single pass wins on
    bandwidth.  The auto default therefore stays 'jax' beyond
    fits_direct_xl (solver.default_pcg_backend); this tier exists so an
    EXPLICIT 'pallas' + method='direct' request is honored at any K
    (packed condense/recovery kernels + this solve) instead of raising at
    an arbitrary VMEM boundary.

    Sp: (3, s, sp, Kp) packed operator (slots L/D/U), bv: (sp, Kp).
    Returns x with S x = b."""
    dt = bv.dtype
    levels = max(1, (Kp - 1).bit_length())
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, Kp), 1)

    def elim(lev, carry):
        Lst, Dst, Ust, b, bad = carry
        h = jnp.int32(1) << lev

        def rp(x):
            return jnp.roll(x, h, axis=-1)

        def rm(x):
            return jnp.roll(x, -h, axis=-1)

        Lc = [Lst[i] for i in range(s)]
        Dc = [Dst[i] for i in range(s)]
        Uc = [Ust[i] for i in range(s)]
        Dinv_cur, bad_cur = _gj_inv_flag(Dc, s, sp)
        odd_f = (lane % (2 * h) == h).astype(dt)
        even_f = (lane % (2 * h) == 0).astype(dt)
        bad = bad + odd_f * bad_cur

        Am = _mat_mat(Lc, [rp(x) for x in Dinv_cur], s)
        Bm = _mat_mat(Uc, [rm(x) for x in Dinv_cur], s)
        AU = _mat_mat(Am, [rp(x) for x in Uc], s)
        BL = _mat_mat(Bm, [rm(x) for x in Lc], s)
        b_new = b - _mat_vec(Am, rp(b), s) - _mat_vec(Bm, rm(b), s)
        L_new = [-x for x in _mat_mat(Am, [rp(x) for x in Lc], s)]
        U_new = [-x for x in _mat_mat(Bm, [rm(x) for x in Uc], s)]

        keep = 1.0 - even_f
        Dn = jnp.stack([even_f * (Dc[i] - AU[i] - BL[i])
                        + odd_f * Dinv_cur[i]
                        + (keep - odd_f) * Dc[i] for i in range(s)])
        Ln = jnp.stack([even_f * L_new[i] + keep * Lc[i] for i in range(s)])
        Un = jnp.stack([even_f * U_new[i] + keep * Uc[i] for i in range(s)])
        return Ln, Dn, Un, even_f * b_new + keep * b, bad

    Lst, Dst, Ust, bv, bad = jax.lax.fori_loop(
        0, levels, elim,
        (Sp[0], Sp[1], Sp[2], bv, jnp.zeros((1, Kp), dt)))

    root_f = (lane == 0).astype(dt)
    Dinv_root, bad_root = _gj_inv_flag([Dst[i] for i in range(s)], s, sp)
    bad = bad + root_f * bad_root
    x = root_f * _mat_vec(Dinv_root, bv, s)

    def back(i, x):
        h = jnp.int32(1) << (levels - 1 - i)
        odd_f = (lane % (2 * h) == h).astype(dt)
        rhs = (bv
               - _mat_vec([Lst[i_] for i_ in range(s)],
                          jnp.roll(x, h, axis=-1), s)
               - _mat_vec([Ust[i_] for i_ in range(s)],
                          jnp.roll(x, -h, axis=-1), s))
        x_odd = _mat_vec([Dst[i_] for i_ in range(s)], rhs, s)
        return odd_f * x_odd + (1.0 - odd_f) * x

    x = jax.lax.fori_loop(0, levels, back, x)
    # Singular-input poison, as in _cr_solve_scratch (same flag semantics).
    return x + jnp.where(bad > 0, 1e30, 0.0)


# ---------------------------------------------------------------------------
# Hybrid direct tier (round 5, VERDICT r4 #6): narrow-batch exact solves past
# fits_direct_xl's reach.  The pure-XLA CR above loses to the Thomas scan at
# K >= 2048 because its roll-based levels re-touch the FULL (s, sp, Kp)
# stacks log2(Kp) times; the one-kernel CR can't reach because one level's
# transients overflow Mosaic's scoped-vmem stack.  The hybrid PEELS levels in
# XLA *with compaction* — each peel eliminates the odd lanes and emits a
# genuinely half-width system (strided slices, not masks), so level i costs
# one pass over K/2^i lanes — until the reduced system fits the one-kernel
# CR, which does the remaining log2 levels at Mosaic speed; the peeled
# levels back-substitute in XLA (one half-width pass each).  At IIWA width
# this is 1 peel for K=2048, 2 for K=4096 (budget 13 MiB -> Kp <= 1408).
# ---------------------------------------------------------------------------


def _pad_lanes_128(W: int) -> int:
    return ((W + 127) // 128) * 128


def _fits_direct_xl_width(Kp: int, s: int, sp: int) -> bool:
    """fits_direct_xl restated on an already-packed lane width."""
    return Kp * 4 * sp * (10 * s + 6) <= _DIRECT_XL_BUDGET_BYTES


def _hybrid_widths(Kp: int, s: int, sp: int):
    """Static peel schedule: lane widths from Kp down to the first width
    the one-kernel CR accepts (each step: half, padded back to x128)."""
    widths = [Kp]
    while not _fits_direct_xl_width(widths[-1], s, sp):
        nxt = _pad_lanes_128(widths[-1] // 2)
        if nxt >= widths[-1]:
            break  # 128-lane padding floor: cannot compact further (only
            # reachable with an artificially tiny test budget — the real
            # 13 MiB budget always admits a 128-lane system)
        widths.append(nxt)
    return widths


def _cr_peel(Sp, bv, W_out: int, *, s: int, sp: int):
    """One COMPACTING cyclic-reduction level in XLA.

    Eliminates the ODD lanes of the (3, s, sp, W) packed operator and
    returns the half-width reduced system over the even lanes, zero-padded
    to ``W_out`` lanes, plus the per-level state back-substitution needs
    (the odd lanes' Dinv/L/U/b) and a scalar singular flag.  Structural
    zeros make the roll wraps exact, as everywhere in this layout: lane 0
    carries no L and the last live lane no U, so the wrapped-in neighbor is
    always multiplied by an exactly-zero block; zero pad lanes stay
    disconnected (their D clamp-inverts harmlessly, b is zero).

    Algebra (even lane 2j, odd compacted index j <-> lane 2j+1):
      A_j  = L[2j] Dinv[2j-1]          B_j  = U[2j] Dinv[2j+1]
      D'_j = D[2j] - A_j U[2j-1] - B_j L[2j+1]
      L'_j = -A_j L[2j-1]              U'_j = -B_j U[2j+1]
      b'_j = b[2j] - A_j b[2j-1] - B_j b[2j+1]
    — the same per-level algebra as _cr_solve_scratch/_cr_solve_xla, on
    sliced half-width stacks instead of masked full-width ones."""
    W = bv.shape[-1]
    Wh = W // 2

    # ONE strided slice per stacked array, not one per column: the per-
    # column form issued ~84 separate lane-stride-2 relayouts and measured
    # 0.83 ms at (14, 16, 2048) — more than the entire rest of the hybrid
    # solve combined (chain-differenced, v5e).  Leading-axis indexing of
    # the sliced stacks below is free (no lane relayout).
    Sp_e, Sp_o = Sp[..., 0::2], Sp[..., 1::2]
    L_e = [Sp_e[0, i] for i in range(s)]
    D_e = [Sp_e[1, i] for i in range(s)]
    U_e = [Sp_e[2, i] for i in range(s)]
    L_o = [Sp_o[0, i] for i in range(s)]
    D_o = [Sp_o[1, i] for i in range(s)]
    U_o = [Sp_o[2, i] for i in range(s)]
    b_e, b_o = bv[..., 0::2], bv[..., 1::2]

    OInv, bad_o = _gj_inv_flag(D_o, s, sp)

    def rp(x):
        return jnp.roll(x, 1, axis=-1)

    A = _mat_mat(L_e, [rp(x) for x in OInv], s)     # L[2j] Dinv[2j-1]
    Bm = _mat_mat(U_e, OInv, s)                     # U[2j] Dinv[2j+1]
    AU = _mat_mat(A, [rp(x) for x in U_o], s)
    BL = _mat_mat(Bm, L_o, s)
    D_n = [D_e[i] - AU[i] - BL[i] for i in range(s)]
    L_n = [-x for x in _mat_mat(A, [rp(x) for x in L_o], s)]
    U_n = [-x for x in _mat_mat(Bm, U_o, s)]
    b_n = b_e - _mat_vec(A, rp(b_o), s) - _mat_vec(Bm, b_o, s)

    def pad(x):
        if W_out == Wh:
            return x
        return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, W_out - Wh)])

    Sp_half = jnp.stack([jnp.stack([pad(x) for x in cols])
                         for cols in (L_n, D_n, U_n)])
    saved = (jnp.stack(OInv), Sp_o[0], Sp_o[2], b_o)
    return Sp_half, pad(b_n), saved, jnp.sum(bad_o)


def _cr_unpeel(x_half, saved, W: int, *, s: int, sp: int):
    """Back-substitute one peeled level: interleave the solved even lanes
    with x[2j+1] = Dinv[2j+1] (b[2j+1] - L[2j+1] x[2j] - U[2j+1] x[2j+2])
    (the wrap of the x[2j+2] roll is annihilated by the last live odd
    lane's structurally-zero U)."""
    OInv, L_o, U_o, b_o = saved
    Wh = W // 2
    xh = x_half[..., :Wh]
    x_right = jnp.roll(xh, -1, axis=-1)
    rhs = (b_o
           - _mat_vec([L_o[i] for i in range(s)], xh, s)
           - _mat_vec([U_o[i] for i in range(s)], x_right, s))
    x_odd = _mat_vec([OInv[i] for i in range(s)], rhs, s)
    return jnp.stack([xh, x_odd], axis=-1).reshape(x_half.shape[:-1] + (W,))


#: Use the Mosaic peel kernel for the hybrid tier's elimination levels
#: (vs the reference XLA peel, which pays ~190 us of _mat_mat intermediate
#: HBM traffic per level at W=2048).  Validated on v5e 2026-08-21 after a
#: session-long red herring: attaching a pl.CostEstimate to this call made
#: Mosaic's compile hang (>9 min vs 2.6 s without, byte-identical body) —
#: see _peel_call.  Interpret-mode parity vs the XLA reference peel is
#: pinned by tests/test_longk.py.
_PEEL_USE_KERNEL = True


def _peel_kernel(
    Le_ref, De_ref, Ue_ref, Lo_ref, Do_ref, Uo_ref, be_ref, bo_ref,
    Ln_out, Dn_out, Un_out, bn_out, oinv_out, bad_out,
    carry,                                               # VMEM (sp, 3s+1)
    *, s: int, sp: int,
):
    """One lane chunk of a compacting CR peel (the algebra of :func:`_cr_peel`
    with the operands VMEM-resident).  The XLA peel's ~190 us of _mat_mat
    intermediate traffic at W=2048 (every (sp, Wh) product written/read
    through HBM) collapses to two streaming passes here.  Chunks grid
    sequentially with the one-lane left-neighbor dependency (odd index j-1
    for the chunk's first even lane) carried through scratch, exactly like
    :func:`_condense_chunk`: carry columns [0:s] OInv, [s:2s] U_o,
    [2s:3s] L_o, [3s] b_o — each the previous chunk's LAST odd lane.
    Chunk 0 substitutes zeros (the trajectory start has no left neighbor),
    which also resets the carry between problems of the batch grid axis."""
    dt = be_ref.dtype
    L = be_ref.shape[-1]
    Le = [Le_ref[0, i] for i in range(s)]
    De = [De_ref[0, i] for i in range(s)]
    Ue = [Ue_ref[0, i] for i in range(s)]
    Lo = [Lo_ref[0, i] for i in range(s)]
    Do = [Do_ref[0, i] for i in range(s)]
    Uo = [Uo_ref[0, i] for i in range(s)]
    be = be_ref[0]
    bo = bo_ref[0]

    OInv, bad = _gj_inv_flag(Do, s, sp)

    lane0 = jax.lax.broadcasted_iota(jnp.int32, (sp, L), 1) == 0
    first = pl.program_id(1) == 0

    def roll_in(x, idx):
        prev = jnp.where(first, jnp.zeros((sp, 1), dt),
                         carry[:, idx : idx + 1])
        return jnp.where(lane0, prev, _roll_p1(x))

    OInv_p = [roll_in(OInv[i], i) for i in range(s)]
    Uo_p = [roll_in(Uo[i], s + i) for i in range(s)]
    Lo_p = [roll_in(Lo[i], 2 * s + i) for i in range(s)]
    bo_p = roll_in(bo, 3 * s)

    A = _mat_mat(Le, OInv_p, s)        # L[2j] Dinv[2j-1]
    Bm = _mat_mat(Ue, OInv, s)         # U[2j] Dinv[2j+1]
    AU = _mat_mat(A, Uo_p, s)
    BL = _mat_mat(Bm, Lo, s)
    L_n = _mat_mat(A, Lo_p, s)
    U_n = _mat_mat(Bm, Uo, s)
    for i in range(s):
        Dn_out[0, i] = De[i] - AU[i] - BL[i]
        Ln_out[0, i] = -L_n[i]
        Un_out[0, i] = -U_n[i]
        oinv_out[0, i] = OInv[i]
    bn_out[0] = be - _mat_vec(A, bo_p, s) - _mat_vec(Bm, bo, s)
    bad_out[0] = jnp.broadcast_to(bad, (sp, L))

    # Carry write LAST, after every read of the incoming carry.
    for i in range(s):
        carry[:, i : i + 1] = OInv[i][:, L - 1 : L]
        carry[:, s + i : s + i + 1] = Uo[i][:, L - 1 : L]
        carry[:, 2 * s + i : 2 * s + i + 1] = Lo[i][:, L - 1 : L]
    carry[:, 3 * s : 3 * s + 1] = bo[:, L - 1 : L]


def _peel_call(Sp_e, Sp_o, b_e, b_o, *, s: int, sp: int, interpret: bool):
    """Batched kernel peel: (B, 3, s, sp, Wh) even/odd stacks (the XLA-side
    stride-2 slices of the full operator) -> reduced (B, 3, s, sp, Wh)
    stack, b_n, OInv (for back-substitution) and the per-lane clamp-flag
    rows."""
    Bn, _, _, _, Wh = Sp_e.shape
    dt = b_e.dtype
    Lc = Wh if Wh <= 512 else 512
    n_chunks = Wh // Lc

    mat = pl.BlockSpec((1, s, sp, Lc), lambda b, ch: (b, 0, 0, ch),
                       memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, sp, Lc), lambda b, ch: (b, 0, ch),
                       memory_space=pltpu.VMEM)

    # NO pl.CostEstimate here: attaching one made Mosaic's compile HANG
    # (>9 min vs 2.6 s without, measured 2026-08-21 — the body is
    # byte-identical; the estimate was the only difference in the bisect).
    # The other longk kernels' estimates predate this and are left alone.
    Ln, Dn, Un, bn, OInv, bad = pl.pallas_call(
        functools.partial(_peel_kernel, s=s, sp=sp),
        grid=(Bn, n_chunks),
        out_shape=(
            jax.ShapeDtypeStruct((Bn, s, sp, Wh), dt),   # L'
            jax.ShapeDtypeStruct((Bn, s, sp, Wh), dt),   # D'
            jax.ShapeDtypeStruct((Bn, s, sp, Wh), dt),   # U'
            jax.ShapeDtypeStruct((Bn, sp, Wh), dt),      # b'
            jax.ShapeDtypeStruct((Bn, s, sp, Wh), dt),   # Dinv_odd
            jax.ShapeDtypeStruct((Bn, sp, Wh), dt),      # bad rows
        ),
        in_specs=[mat, mat, mat, mat, mat, mat, vec, vec],
        out_specs=(mat, mat, mat, vec, mat, vec),
        scratch_shapes=[pltpu.VMEM((sp, 3 * s + 1), dt)],
        interpret=interpret,
    )(Sp_e[:, 0], Sp_e[:, 1], Sp_e[:, 2],
      Sp_o[:, 0], Sp_o[:, 1], Sp_o[:, 2], b_e, b_o)
    return Ln, Dn, Un, bn, OInv, bad


def _cr_peel_to_fit_batched(Sb, bv, widths, *, s: int, sp: int,
                            interpret: bool):
    """Batched kernel-peel schedule (the hybrid tier's hot path): XLA does
    the stride-2 slices (4 per level, on the STACKED arrays — per-column
    slicing measured 0.83 ms alone, CLAUDE.md) and the zero-padding; the
    Mosaic kernel does the flops.  Same algebra and save layout as the
    per-problem XLA :func:`_cr_peel` (kept as the reference implementation
    — tests pin the two paths against each other)."""
    saves = []
    bad = jnp.zeros((bv.shape[0],), bv.dtype)
    for W_out in widths[1:]:
        W = bv.shape[-1]
        Wh = W // 2
        Sp_e, Sp_o = Sb[..., 0::2], Sb[..., 1::2]
        b_e, b_o = bv[..., 0::2], bv[..., 1::2]
        Ln, Dn, Un, bn, OInv, bad_rows = _peel_call(
            Sp_e, Sp_o, b_e, b_o, s=s, sp=sp, interpret=interpret)
        saves.append((OInv, Sp_o[:, 0], Sp_o[:, 2], b_o))
        bad = bad + jnp.sum(bad_rows[:, 0, :], axis=-1)

        def pad(x):
            if W_out == Wh:
                return x
            return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, W_out - Wh)])

        Sb = pad(jnp.stack([Ln, Dn, Un], axis=1))
        bv = pad(bn)
    return Sb, bv, tuple(saves), bad


def _cr_peel_to_fit(Sp, bv, widths, *, s: int, sp: int):
    """Peel along the static ``widths`` schedule; returns the reduced
    system + the per-level saved states (outermost level first)."""
    saves = []
    bad = jnp.zeros((), bv.dtype)
    for W_out in widths[1:]:
        Sp, bv, saved, bad_lvl = _cr_peel(Sp, bv, W_out, s=s, sp=sp)
        saves.append(saved)
        bad = bad + bad_lvl
    return Sp, bv, tuple(saves), bad


def _cr_unpeel_all(x, saves, widths, *, s: int, sp: int):
    for W, saved in zip(reversed(widths[:-1]), reversed(saves)):
        x = _cr_unpeel(x, saved, W, s=s, sp=sp)
    return x


def _packed_singular_flag(Mb, Minvb, n: int, rho, tol: float = 0.5):
    """Per-problem (B,) flag: the chunked-condense kernel's clamped GJ
    (_gj_inv zero-pivot clamp) silently regularized an exactly-singular
    live block — detected in XLA as a GROSS identity failure
    ``max |Minv (M + rho I) - I| > tol`` over live lanes (pad lanes have an
    all-zero diagonal, the same pad criterion _gj_inv_flag uses).  This is
    the condense-stage analog of the in-kernel flags the short-K direct
    kernels carry (direct_fused/thomas_batch): the chunked condense's
    Qinv/Rinv cross HBM anyway, so the check costs one fused XLA pass and
    zero kernel changes.  tol is coarse by design — it flags the O(1)
    garbage of a clamped zero pivot, not finite-precision conditioning
    (which produces the same finite garbage on the XLA path too).

    PSD assumption (ADVICE r4 #3, same as fused_solve._gj_inv_flag): the
    live criterion trusts that a valid PSD block with an all-zero diagonal
    is all-zero, i.e. padding.  A malformed non-PSD block with a zero
    diagonal but nonzero off-diagonals escapes the flag (the XLA path would
    NaN); only reachable with invalid problem data."""
    live = sum(jnp.abs(Mb[:, i, i, :]) for i in range(n)) > 0   # (B, Kp)
    err = jnp.zeros_like(Mb[:, 0, 0, :])
    for b in range(n):
        col = sum(Minvb[:, e]
                  * (Mb[:, b, e, :] + (rho if e == b else 0.0))[:, None, :]
                  for e in range(n))
        for row in range(n):
            tgt = 1.0 if row == b else 0.0
            err = jnp.maximum(err, jnp.abs(col[:, row, :] - tgt))
    return jnp.any(live & (err > tol), axis=-1)


def _direct_residual(Sb, gamb, lamb, *, s: int):
    """Packed-layout squared true residual |gam - S lam|^2 and rhs norm
    |gam|^2 per problem, in XLA on the HBM-resident packed operator (the
    kernel's scratch copy is destroyed by the in-place CR).  Pad lanes and
    pad sublanes contribute exact zeros (structurally zero blocks times the
    finite pad-lane lam — _gj_inv clamps zero pivots).  Same roll convention
    as the in-kernel matvec (_roll_p1: lane k reads k-1)."""
    lamL = jnp.roll(lamb, 1, axis=-1)
    lamR = jnp.roll(lamb, -1, axis=-1)

    def mv(slot, x):
        return sum(Sb[:, slot, col] * x[:, col:col + 1, :]
                   for col in range(s))

    resid = gamb - (mv(0, lamL) + mv(1, lamb) + mv(2, lamR))
    eta = jnp.sum(resid * resid, axis=(-2, -1))
    gnorm = jnp.sum(gamb * gamb, axis=(-2, -1))
    return eta, gnorm


def _solve_direct_longk_packed(
    Qb, Rb, Ab, Bb, qb, rb, cb, rho, *,
    s, cdim, sp, Kp, Lc, n_chunks, interpret, tier="xl",
):
    """Direct (exact) analog of :func:`_solve_longk_packed`: condense ->
    whole cyclic reduction -> recovery on PRE-PACKED (B, ·, sp, Kp) arrays;
    returns packed (lamb, dzxb, dzub, eta, gnorm) with eta/gnorm as
    (B,) per-problem scalars (:func:`_direct_residual`).  The seam the
    packed serving surface (gato_tpu.packed) calls with zero public-surface
    relayout.  ``tier``: 'xl' = the one-kernel CR on the DMA'd operator
    (within fits_direct_xl), 'xla' = the lane-packed XLA CR
    (:func:`_cr_solve_xla`, unlimited K)."""
    Sb, _Pb, gamb, Qinvb, Rinvb = _condense_call(
        rho, Qb, Rb, Ab, Bb, qb, rb, cb,
        s=s, c=cdim, sp=sp, Kp=Kp, Lc=Lc, n_chunks=n_chunks,
        precond="jacobi", interpret=interpret,
    )
    if tier == "xl":
        lamb = _direct_xl_call(Sb, gamb, s=s, sp=sp, Kp=Kp,
                               interpret=interpret)
    elif tier == "hybrid":
        # Compacting peel levels down to one-kernel-CR reach, kernel CR on
        # the reduced system, XLA back-substitution (see the peel section).
        widths = tuple(_hybrid_widths(Kp, s, sp))
        if _PEEL_USE_KERNEL:
            S_red, b_red, saves, bad_pe = _cr_peel_to_fit_batched(
                Sb, gamb, widths, s=s, sp=sp, interpret=interpret)
        else:
            S_red, b_red, saves, bad_pe = jax.vmap(
                functools.partial(_cr_peel_to_fit, widths=widths, s=s,
                                  sp=sp))(Sb, gamb)
        lam_red = _direct_xl_call(S_red, b_red, s=s, sp=sp, Kp=widths[-1],
                                  interpret=interpret)
        lamb = jax.vmap(
            functools.partial(_cr_unpeel_all, widths=widths, s=s, sp=sp)
        )(lam_red, saves)
        # Peel-stage singular clamps poison lam (finite), blowing the
        # true-residual eta below — same flag semantics as the kernels.
        lamb = lamb + jnp.where(bad_pe[:, None, None] > 0, 1e30, 0.0)
    else:
        lamb = jax.vmap(
            functools.partial(_cr_solve_xla, s=s, sp=sp, Kp=Kp)
        )(Sb, gamb)
    eta, gnorm = _direct_residual(Sb, gamb, lamb, s=s)
    # Condense-stage singularity (clamped zero pivots in the chunk kernel's
    # Q/R inversions) never reaches the CR kernels' in-solve flags — the
    # garbage S is finite and usually invertible; poison eta here so
    # residual_converged reports False like every other direct tier.
    bad = (_packed_singular_flag(Qb, Qinvb, s, rho)
           | _packed_singular_flag(Rb, Rinvb, cdim, rho))
    eta = eta + jnp.where(bad, 1e30, 0.0)
    lamnb = _shift_left_lane(lamb)
    dzxb, dzub = _recover_call(
        Qinvb, Rinvb, Ab, Bb, qb, rb, lamb, lamnb,
        s=s, c=cdim, sp=sp, Kp=Kp, Lc=Lc, n_chunks=n_chunks,
        interpret=interpret,
    )
    return lamb, dzxb, dzub, eta, gnorm


def direct_tier(K: int, s: int, c: int) -> str:
    """The long-horizon direct tier for a shape: 'xl' (one-kernel CR on the
    DMA'd operator) within fits_direct_xl, 'hybrid' (compacting XLA peels
    + the one-kernel CR on the reduced system, unlimited K — round 5)
    beyond.  'xla' (the roll-based full-width XLA CR) remains a forceable
    tier for tests but is never auto-picked: it loses to the Thomas scan
    at K >= 2048 because its levels never compact.  The in-ladder rule
    behind an explicit 'pallas'+direct request
    (solve_direct_longk_batched); the packed and dp surfaces instead gate
    on :func:`should_dispatch_direct`."""
    return "xl" if fits_direct_xl(K, s, c) else "hybrid"


def solve_direct_longk_batched(
    Q, R, A, B, q, r, c, *,
    rho=0.0, interpret: bool = False, chunk_lanes: "int | None" = None,
    force_tier: "str | None" = None,
):
    """Whole batched DIRECT (exact) solve for long horizons: chunked
    condensation (:func:`_condense_call` with the cheap Jacobi branch — the
    preconditioner output is unused) -> whole block cyclic reduction — in
    ONE kernel on the DMA'd operator within fits_direct_xl
    (:func:`_direct_xl_call`), in lane-packed XLA beyond
    (:func:`_cr_solve_xla`, unlimited K) -> packed recovery.  Extends
    kernels/direct_fused.py up in K exactly as :func:`solve_longk_batched`
    extends fused_solve for PCG; no reference equivalent (the CUDA
    reference has no direct solver at all).

    Contract matches solve_direct_fused_batched: returns (PCGResult with
    batch axis — iters = 0, eta = squared true residual, converged =
    direct.residual_converged — , dz_x (B,K,s), dz_u (B,K-1,c)).
    ``chunk_lanes`` / ``force_tier`` pin the condense chunking and CR tier
    for tests."""
    Bn, K, s, _ = Q.shape
    cdim = R.shape[-1]
    if force_tier not in (None, "xl", "hybrid", "xla"):
        raise ValueError(
            f"force_tier={force_tier!r}; valid direct tiers are 'xl' "
            "(one-kernel CR), 'hybrid' (XLA peels + kernel CR), and 'xla' "
            "(lane-packed XLA CR)")
    tier = force_tier or direct_tier(K, s, cdim)
    sp, Kp, Lc, n_chunks, _, _ = _plan_dispatch(K, s, cdim, "xl", chunk_lanes)
    interpret = interpret or jax.default_backend() != "tpu"

    pm = functools.partial(_pack_mat, K_sub=Kp, g=1, L=Kp, n_groups=Bn, sp=sp)
    pv = functools.partial(_pack_vec, K_sub=Kp, g=1, L=Kp, n_groups=Bn, sp=sp)
    Qb, Rb, Ab, Bb = pm(Q), pm(R), pm(A), pm(B)
    qb, rb, cb = pv(q), pv(r), pv(c)

    lamb, dzxb, dzub, eta, gnorm = _solve_direct_longk_packed(
        Qb, Rb, Ab, Bb, qb, rb, cb, rho,
        s=s, cdim=cdim, sp=sp, Kp=Kp, Lc=Lc, n_chunks=n_chunks,
        interpret=interpret, tier=tier,
    )

    lam = _unpack_vec(lamb, Bn, K, s, Kp, 1)
    dz_x = _unpack_vec(dzxb, Bn, K, s, Kp, 1)
    dz_u = _unpack_vec(dzub, Bn, K, cdim, Kp, 1)[:, : K - 1, :]

    from ..direct import residual_converged

    res = PCGResult(
        lam=lam,
        iters=jnp.zeros((Bn,), jnp.int32),
        converged=residual_converged(eta, gnorm),
        eta=eta,
    )
    return res, dz_x, dz_u


def solve_direct_longk(Q, R, A, B, q, r, c, **kw):
    """Single-problem wrapper (the B=1 case of solve_direct_longk_batched)."""
    res, dz_x, dz_u = solve_direct_longk_batched(
        Q[None], R[None], A[None], B[None], q[None], r[None], c[None], **kw,
    )
    return (
        PCGResult(lam=res.lam[0], iters=res.iters[0],
                  converged=res.converged[0], eta=res.eta[0]),
        dz_x[0], dz_u[0],
    )


# --------------------------------------------------------------------------
# Recovery, gridded over lane chunks (lane-local given the shifted lambda).


def _recover_kernel(Qinv_ref, Rinv_ref, A_ref, B_ref, q_ref, r_ref,
                    lam_ref, lamn_ref, dzx_out, dzu_out,
                    *, s: int, c: int, sp: int):
    """dz recovery (recover.recover_dz formulas) on one lane chunk.  The
    only neighbor term, lambda_{k+1}, arrives pre-shifted (``lamn_ref``,
    shifted in XLA by the caller) so every lane is independent."""
    lam = lam_ref[0]
    lam_next = lamn_ref[0]
    Qinv = [Qinv_ref[0, b] for b in range(s)]
    Rinv = [Rinv_ref[0, b] for b in range(c)]
    Ac = [A_ref[0, b] for b in range(s)]
    Bc = [B_ref[0, b] for b in range(c)]
    at_l = _matT_vec(Ac, lam_next, s, sp)
    bt_l = _matT_vec(Bc, lam_next, c, sp)
    dzx_out[0] = _mat_vec(Qinv, q_ref[0] - lam - at_l, s)
    dzu_out[0] = _mat_vec(Rinv, r_ref[0] - bt_l, c)


def _recover_call(Qinvb, Rinvb, Ab, Bb, qb, rb, lamb, lamnb, *,
                  s, c, sp, Kp, Lc, n_chunks, interpret):
    Bn = qb.shape[0]
    dt = qb.dtype

    def mat(ncols):
        return pl.BlockSpec((1, ncols, sp, Lc), lambda b, ch: (b, 0, 0, ch),
                            memory_space=pltpu.VMEM)

    vec = pl.BlockSpec((1, sp, Lc), lambda b, ch: (b, 0, ch),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_recover_kernel, s=s, c=c, sp=sp),
        grid=(Bn, n_chunks),
        out_shape=(
            jax.ShapeDtypeStruct((Bn, sp, Kp), dt),
            jax.ShapeDtypeStruct((Bn, sp, Kp), dt),
        ),
        in_specs=[mat(s), mat(c), mat(s), mat(c), vec, vec, vec, vec],
        out_specs=(vec, vec),
        interpret=interpret,
    )(Qinvb, Rinvb, Ab, Bb, qb, rb, lamb, lamnb)


# --------------------------------------------------------------------------
# Orchestration.


def _shift_left_lane(x):
    """x[..., k] <- x[..., k+1], zero-filled at the end (NOT a roll: the
    last lane must see the boundary zero, not the first lane's value)."""
    return jnp.concatenate(
        [x[..., 1:], jnp.zeros_like(x[..., :1])], axis=-1
    )


def _plan_dispatch(K: int, s: int, cdim: int, force_tier, chunk_lanes):
    """Static (trace-time) part of a longk solve: the chunking plan, the
    tier choice, and the stream regrouping — shared by the one-shot and
    sequence entry points so both dispatch identically."""
    plan = plan_longk(K, s, cdim)
    sp, Kp, Lc, n_chunks = plan
    if chunk_lanes is not None:
        Lc = chunk_lanes
        n_chunks = -(-_round_up(K, _LANE) // Lc)
        Kp = Lc * n_chunks
    tier = force_tier or (
        "fused_xl" if fits_fused_xl(K, s, cdim)
        else "xl" if fits_xl(K, s, cdim) else "stream"
    )
    if chunk_lanes is not None:      # tests pin the chunking exactly
        stream = (Lc, n_chunks)
    else:
        stream = _stream_chunks(Kp, Lc, n_chunks, s, sp)
    return sp, Kp, Lc, n_chunks, tier, stream


def _solve_longk_packed(
    Qb, Rb, Ab, Bb, qb, rb, cb, lb, rho, exit_tol, max_iters, *,
    s, cdim, sp, Kp, Lc, n_chunks, tier, stream, poly_degree,
    preconditioner, interpret,
):
    """Tier dispatch + recovery on PRE-PACKED (B, ·, sp, Kp) arrays; returns
    packed (lamb, dzxb, dzub, iters, conv, eta).  The seam that lets the
    sequence entry point keep its lambda carry in the packed layout."""
    if tier == "fused_xl":
        lamb, iters, conv, eta, Qinvb, Rinvb = _fused_xl_call(
            rho, Qb, Rb, Ab, Bb, qb, rb, cb, lb, exit_tol, max_iters,
            s=s, c=cdim, sp=sp, Kp=Kp, Lc=Lc, n_chunks=n_chunks,
            precond=preconditioner, poly_degree=poly_degree,
            interpret=interpret,
        )
    else:
        Sb, Pb, gamb, Qinvb, Rinvb = _condense_call(
            rho, Qb, Rb, Ab, Bb, qb, rb, cb,
            s=s, c=cdim, sp=sp, Kp=Kp, Lc=Lc, n_chunks=n_chunks,
            precond=preconditioner, interpret=interpret,
        )
        # Finish the stair: slot 2 was emitted as P_left^T at its own lane;
        # Pinv_(k,k+1) = Pinv_(k+1,k)^T lives one lane to the left.  The XL
        # kernel shifts in-scratch after its DMA; the streamed tier still
        # needs the shift materialized here (its tiles are DMA'd per chunk).
        if tier != "xl":
            Pb = Pb.at[:, 2].set(_shift_left_lane(Pb[:, 2]))

        if tier == "xl":
            lamb, iters, conv, eta = _pcg_xl_call(
                Sb, Pb, gamb, lb, exit_tol, max_iters,
                s=s, sp=sp, Kp=Kp, poly_degree=poly_degree,
                interpret=interpret,
            )
        else:
            Lc_s, n_s = stream
            lamb, iters, conv, eta = _pcg_stream_call(
                Sb, Pb, gamb, lb, exit_tol, max_iters,
                s=s, sp=sp, Kp=Kp, Lc=Lc_s, n_chunks=n_s,
                poly_degree=poly_degree, interpret=interpret,
            )

    # Condense-stage singularity (ADVICE r4 #2 applied to the long-K PCG
    # tiers, same mechanism as the direct tier): a clamped zero pivot makes
    # the kernel converge on a silently-regularized system while the XLA
    # oracle NaNs and runs to max_iters unconverged.  The packed Qinv*Q
    # identity check flags it per problem; force the oracle outcome
    # (iters = max_iters, conv = 0, huge-but-FINITE eta).
    bad = (_packed_singular_flag(Qb, Qinvb, s, rho)
           | _packed_singular_flag(Rb, Rinvb, cdim, rho))
    badr = bad[:, None, None]  # aux arrays are lane-broadcast (B, 8, Kp)
    iters = jnp.where(badr, jnp.asarray(max_iters, iters.dtype), iters)
    conv = jnp.where(badr, jnp.zeros_like(conv), conv)
    eta = eta + jnp.where(badr, 1e30, 0.0).astype(eta.dtype)

    lamnb = _shift_left_lane(lamb)
    dzxb, dzub = _recover_call(
        Qinvb, Rinvb, Ab, Bb, qb, rb, lamb, lamnb,
        s=s, c=cdim, sp=sp, Kp=Kp, Lc=Lc, n_chunks=n_chunks,
        interpret=interpret,
    )
    return lamb, dzxb, dzub, iters, conv, eta


def solve_longk_batched(
    Q, R, A, B, q, r, c, lam0=None, *,
    rho=0.0, exit_tol=1e-6, max_iters=100, poly_degree: int = 1,
    preconditioner: str = "symmetric_stair",
    interpret: bool = False, force_tier: "str | None" = None,
    chunk_lanes: "int | None" = None,
):
    """Whole batched solve (condense + PCG + recover) for long horizons, all
    stages in lane-packed Pallas kernels.

    Args follow formats.KKTBlocks with a leading batch axis; returns
    (PCGResult with batch axis, dz_x (B,K,s), dz_u (B,K-1,c)) — the same
    contract as fused_solve.solve_fused_batched, one tier up in K.

    ``force_tier`` ('fused_xl' | 'xl' | 'stream') and ``chunk_lanes`` exist
    for tests:
    production calls leave them None and get the fits_xl decision and the
    budget-derived chunk width.
    """
    if preconditioner not in ("symmetric_stair", "block_jacobi", "jacobi"):
        raise ValueError(
            f"unknown preconditioner {preconditioner!r}; valid: "
            "'symmetric_stair', 'block_jacobi', 'jacobi'"
        )
    Bn, K, s, _ = Q.shape
    cdim = R.shape[-1]
    sp, Kp, Lc, n_chunks, tier, stream = _plan_dispatch(
        K, s, cdim, force_tier, chunk_lanes)
    interpret = interpret or jax.default_backend() != "tpu"

    if lam0 is None:
        lam0 = jnp.zeros_like(q)

    pm = functools.partial(_pack_mat, K_sub=Kp, g=1, L=Kp, n_groups=Bn, sp=sp)
    pv = functools.partial(_pack_vec, K_sub=Kp, g=1, L=Kp, n_groups=Bn, sp=sp)
    Qb, Rb, Ab, Bb = pm(Q), pm(R), pm(A), pm(B)
    qb, rb, cb, lb = pv(q), pv(r), pv(c), pv(lam0)

    lamb, dzxb, dzub, iters, conv, eta = _solve_longk_packed(
        Qb, Rb, Ab, Bb, qb, rb, cb, lb, rho, exit_tol, max_iters,
        s=s, cdim=cdim, sp=sp, Kp=Kp, Lc=Lc, n_chunks=n_chunks, tier=tier,
        stream=stream, poly_degree=poly_degree,
        preconditioner=preconditioner, interpret=interpret,
    )

    lam = _unpack_vec(lamb, Bn, K, s, Kp, 1)
    dz_x = _unpack_vec(dzxb, Bn, K, s, Kp, 1)
    dz_u = _unpack_vec(dzub, Bn, K, cdim, Kp, 1)[:, : K - 1, :]

    res = PCGResult(
        lam=lam,
        iters=iters[:, 0, 0],
        converged=conv[:, 0, 0] != 0,
        eta=eta[:, 0, 0],
    )
    return res, dz_x, dz_u


def solve_longk_sequence_batched(
    Q, R, A, B, q, r, c,           # leading (T, B) axes on every array
    lam0, rhos, exit_tol, max_iters, *,
    poly_degree: int = 1, preconditioner: str = "symmetric_stair",
    interpret: bool = False,
):
    """T dependent warm-started LONG-HORIZON solves over a batch of B
    problems in lockstep — the longk analog of
    fused_solve.solve_fused_sequence_batched, with the same relayout
    hoisting: all T steps' inputs are packed into the lane layout in one
    vectorized pass BEFORE the scan, the lambda carry stays packed between
    steps (pack/unpack are exact permutations plus zero padding, so the
    carried values are bit-identical to an unpack->repack round trip), and
    outputs unpack once after the scan.  Without this, a long-K MPC
    sequence would pay the (B, K>=1024, s, s) pack transposes on every
    sequential step (the exact cost the fused sequence path hoists).

    Returns (lam (T,B,K,s), dz_x (T,B,K,s), dz_u (T,B,K-1,c), iters (T,B),
    conv (T,B), eta (T,B)) — the solve_fused_sequence_batched contract."""
    if preconditioner not in ("symmetric_stair", "block_jacobi", "jacobi"):
        raise ValueError(
            f"unknown preconditioner {preconditioner!r}; valid: "
            "'symmetric_stair', 'block_jacobi', 'jacobi'"
        )
    T, Bn, K, s, _ = Q.shape
    cdim = R.shape[-1]
    sp, Kp, Lc, n_chunks, tier, stream = _plan_dispatch(
        K, s, cdim, None, None)
    interpret = interpret or jax.default_backend() != "tpu"

    pm = jax.vmap(functools.partial(_pack_mat, K_sub=Kp, g=1, L=Kp,
                                    n_groups=Bn, sp=sp))
    pv = jax.vmap(functools.partial(_pack_vec, K_sub=Kp, g=1, L=Kp,
                                    n_groups=Bn, sp=sp))
    Qb, Rb, Ab, Bb = pm(Q), pm(R), pm(A), pm(B)   # (T, Bn, ncols, sp, Kp)
    qb, rb, cb = pv(q), pv(r), pv(c)              # (T, Bn, sp, Kp)
    lb0 = _pack_vec(lam0, K_sub=Kp, g=1, L=Kp, n_groups=Bn, sp=sp)

    core = functools.partial(
        _solve_longk_packed,
        s=s, cdim=cdim, sp=sp, Kp=Kp, Lc=Lc, n_chunks=n_chunks, tier=tier,
        stream=stream, poly_degree=poly_degree,
        preconditioner=preconditioner, interpret=interpret,
    )

    def step(lam_carry, xs):
        Qt, Rt, At, Bt, qt, rt, ct, rho_t = xs
        out = core(Qt, Rt, At, Bt, qt, rt, ct, lam_carry,
                   rho_t, exit_tol, max_iters)
        return out[0], out

    _, (lamb, dzxb, dzub, iters, conv, eta) = jax.lax.scan(
        step, lb0, (Qb, Rb, Ab, Bb, qb, rb, cb, rhos)
    )

    up = jax.vmap(lambda x, n: _unpack_vec(x, Bn, K, n, Kp, 1),
                  in_axes=(0, None))
    lam = up(lamb, s)                             # (T, B, K, s)
    dz_x = up(dzxb, s)
    dz_u = up(dzub, cdim)[:, :, : K - 1, :]
    return (lam, dz_x, dz_u, iters[:, :, 0, 0], conv[:, :, 0, 0] != 0,
            eta[:, :, 0, 0])


def solve_longk(Q, R, A, B, q, r, c, lam0=None, **kw):
    """Single-problem wrapper (the B=1 case of solve_longk_batched)."""
    res, dz_x, dz_u = solve_longk_batched(
        Q[None], R[None], A[None], B[None], q[None], r[None], c[None],
        None if lam0 is None else lam0[None], **kw,
    )
    return (
        PCGResult(lam=res.lam[0], iters=res.iters[0],
                  converged=res.converged[0], eta=res.eta[0]),
        dz_x[0], dz_u[0],
    )
