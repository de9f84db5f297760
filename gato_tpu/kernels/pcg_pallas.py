"""Fused single-kernel PCG: the TPU analog of the reference's cooperative
CUDA kernel (``parallelPCG``, gato_pcg.cuh:270-470).

The entire PCG loop runs inside ONE ``pallas_call``: S, Pinv, gamma and every
work vector stay VMEM-resident across all iterations, eliminating per-
iteration dispatch just as the reference's cooperative launch eliminates
per-iteration kernel launches.  Where the reference needs grid-wide barriers
between phases and atomicAdd scalar reductions, the kernel body here is a
single program: dependencies are plain dataflow, elementwise work rides the
VPU, and the per-problem dot-product reductions ride the MXU (see below).

Layout — dense knots-in-lanes packing
-------------------------------------
The trajectory (knot) axis K is the long axis (50-500) while the block size s
is tiny (2-14), so arrays are stored transposed with knots on the 128-wide
lane dimension and the block-row index on sublanes.  Because a single
trajectory rarely fills a lane tile (K=50 uses 39% of 128 lanes), *multiple
problems are packed side by side on the lane axis*: each problem occupies a
segment of K_sub = round_up(K, 8) lanes, g = L // K_sub problems per program:

    S, Pinv : (3, s, sp, L)   [slot j, block col b, block row a, g x K_sub lanes]
    vectors : (sp, L)

with sp = round_up(s, 8) and L a lane-tile multiple sized to VMEM.  For the
IIWA shape this packs 16 problems per program at 89% lane occupancy — every
VPU op advances 16 trajectories at once, the same work assignment as the
reference's one-CUDA-block-per-knot but two axes wider (knots x problems).

The block-tridiagonal matvec is 3*s lane-parallel FMAs; the halo shift is a
``pltpu.roll`` along the lane axis.  Rolls wrap across problem segments and
the array edge, but every wrapped lane lands either in a zero-padded lane or
against the structural zero block that encodes the trajectory boundary (row
0's left slot / row K-1's right slot — the same zeros as in blocktri.py), so
edge handling is exact with no branches; the reference needed per-edge special
cases (gato_utils.cuh:131-149) and its strided variant got them wrong
(off-by-one, gato_utils.cuh:202,232).

Per-problem reductions on the MXU
---------------------------------
PCG needs per-problem dot products (eta, nu) and per-problem scalars (alpha,
beta) broadcast back over each problem's lanes.  With problems packed along
lanes these are segment reductions; both directions are expressed as tiny
matmuls against a constant 0/1 segment matrix Seg (L, g):

    per-problem sums:  (1, L) @ Seg   -> (1, g)
    lane broadcast  :  (1, g) @ Seg^T -> (1, L)

which the MXU executes in one pass each — the TPU-native analog of the
reference's atomicAdd-into-global-scalar reduction (gato_pcg.cuh:331,357,387).

Numerics are identical to pcg.pcg (same update order, same exit test on the
preconditioned residual dot, same iteration-count semantics, per-problem
masked freezing after convergence); reductions are reordered, so agreement is
to f32 round-off — tests enforce EXACT iteration-count parity.
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
# Lane-equivalent charge per grid program in the packing search: a group's
# fixed cost (~5 us input DMA + prologue, measured v5e) over the ~0.05-0.07
# us/lane-column a whole solve spends — order one 128-lane tile.
_GROUP_OVERHEAD_LANES = _LANE
# Per-program VMEM budget for the two operators + vectors.  v5e has ~16 MB;
# Pallas double-buffers gridded blocks (next program's DMA overlaps this one's
# compute), so the effective footprint is ~2x this plus loop carries.
_VMEM_BUDGET_BYTES = 4 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _max_lanes(bytes_per_lane: int) -> int:
    # No floor: a working set that exceeds the budget even at minimum lane
    # width must be reported as not fitting (fits_vmem False -> streamed
    # path), not silently rounded up to a block Mosaic cannot allocate.
    return _VMEM_BUDGET_BYTES // bytes_per_lane


def _bytes_per_lane(s: int, sp: int) -> int:
    return (2 * 3 * s * sp + 8 * sp) * 4  # S+P columns + vectors


def fits_vmem(K: int, s: int) -> bool:
    """True iff ONE problem's working set fits this kernel's VMEM budget.

    The TPU analog of the reference's ``check_sms`` capacity decision
    (gato_utils.cuh:829-854): when the trajectory is too long to be
    kernel-resident, the solver switches to the HBM-streamed kernel
    (kernels/pcg_streamed.py), the role ``parallelPCG_fixed`` plays on the
    GPU (gato_pcg.cuh:17-268)."""
    sp = _round_up(s, _SUBLANE)
    # The resident kernel always allocates at least one 128-lane tile, so a
    # short-K problem must fit at L = _LANE width.
    lanes = max(_round_up(K, _SUBLANE), _LANE)
    return lanes <= _max_lanes(_bytes_per_lane(s, sp))


def plan_lane_groups(B: int, K_sub: int, max_lanes: int,
                     over_budget_msg: str):
    """Shared packing search for every lane-packed kernel: choose g problems
    per program, the lane width L = round_up(g*K_sub, 128), and the grid
    size, under a ``max_lanes`` VMEM-derived budget.  Raises ValueError with
    the caller-supplied message when even one problem at minimum tile width
    busts the budget (callers gate with their fits_vmem first).

    Among feasible g the search minimizes TOTAL padded lanes
    n_groups * L — the lane-tile columns are the vector work the VPU
    actually executes, so a g that divides B into dense tiles beats the raw
    VMEM maximum (measured: B=256 IIWA at g=16 packs 896 = exactly 7 tiles
    per program with B divisible — zero waste — while g=20 pads to 1152 and
    leaves a ragged final group, costing ~5% more tile columns for no
    benefit).  Each group is additionally charged one lane tile of overhead
    (_GROUP_OVERHEAD_LANES): grid programs run sequentially and a group's
    fixed cost (input DMA ~5 us + prologue) is worth ~75-130 lanes of vector
    work, so a plan must save at least a tile's worth of lanes to justify an
    extra program (e.g. B=30 IIWA: 3 groups x 576 lanes saves only 64 raw
    lanes over 2 x 896 — a net loss the overhead term rejects).  Ties break
    toward larger g (fewer programs amortize further)."""
    if _round_up(K_sub, _LANE) > max_lanes:
        raise ValueError(over_budget_msg)
    g_cap = max(1, min(B, max_lanes // K_sub))
    while g_cap > 1 and _round_up(g_cap * K_sub, _LANE) > max_lanes:
        g_cap -= 1
    best = None
    for g in range(1, g_cap + 1):
        L = _round_up(g * K_sub, _LANE)
        n_groups = -(-B // g)
        key = (n_groups * (L + _GROUP_OVERHEAD_LANES), n_groups, -g)
        if best is None or key < best[0]:
            best = (key, g, L, n_groups)
    _, g, L, n_groups = best
    return g, L, n_groups


def plan_packing(B: int, K: int, s: int):
    """Choose (K_sub, g, L, n_groups): problems-per-program and lane width.

    K_sub is the per-problem lane segment; g problems share a program; the
    lane axis L = round_up(g*K_sub, 128) is sized so the operators fit the
    VMEM budget.  Raises when even a single problem exceeds the budget —
    callers must check :func:`fits_vmem` and fall back to the 'jax' backend
    (solver.default_pcg_backend does)."""
    sp = _round_up(s, _SUBLANE)
    K_sub = _round_up(K, _SUBLANE)
    max_lanes = _max_lanes(_bytes_per_lane(s, sp))
    g, L, n_groups = plan_lane_groups(
        B, K_sub, int(max_lanes),
        f"trajectory K={K} (s={s}) needs {_round_up(K_sub, _LANE)} lanes "
        f"but only {max_lanes} fit the {_VMEM_BUDGET_BYTES >> 20} MB VMEM "
        "budget; use the HBM-streamed path (kernels/pcg_streamed.py) for "
        "horizons this long",
    )
    return K_sub, g, L, n_groups, sp


def _pack_operator(S: jnp.ndarray, K_sub: int, g: int, L: int,
                   n_groups: int, sp: int) -> jnp.ndarray:
    """(B, K, 3, s, s) -> (n_groups, 3, s_col, sp_row, L), zero padded.

    Lane l of group gr holds knot (l % K_sub) of problem gr*g + l//K_sub.
    Zero padding everywhere else (pad problems, pad knots, pad lanes) is what
    makes the roll wraparound exact — see module docstring."""
    B, K, _, s, _ = S.shape
    St = jnp.transpose(S, (2, 4, 3, 0, 1))  # (3, b, a, B, K)
    St = jnp.pad(St, ((0, 0), (0, 0), (0, sp - s),
                      (0, n_groups * g - B), (0, K_sub - K)))
    St = St.reshape(3, s, sp, n_groups, g * K_sub)
    St = jnp.pad(St, ((0, 0), (0, 0), (0, 0), (0, 0), (0, L - g * K_sub)))
    return jnp.transpose(St, (3, 0, 1, 2, 4))  # (n_groups, 3, b, a, L)


def _pack_vec(x: jnp.ndarray, K_sub: int, g: int, L: int,
              n_groups: int, sp: int) -> jnp.ndarray:
    """(B, K, s) -> (n_groups, sp, L)."""
    B, K, s = x.shape
    xt = jnp.transpose(x, (2, 0, 1))  # (s, B, K)
    xt = jnp.pad(xt, ((0, sp - s), (0, n_groups * g - B), (0, K_sub - K)))
    xt = xt.reshape(sp, n_groups, g * K_sub)
    xt = jnp.pad(xt, ((0, 0), (0, 0), (0, L - g * K_sub)))
    return jnp.transpose(xt, (1, 0, 2))  # (n_groups, sp, L)


def _unpack_vec(x: jnp.ndarray, B: int, K: int, s: int, K_sub: int,
                g: int) -> jnp.ndarray:
    """(n_groups, sp, L) -> (B, K, s)."""
    n_groups = x.shape[0]
    xt = x[:, :s, : g * K_sub].reshape(n_groups, s, g, K_sub)
    xt = jnp.transpose(xt, (0, 2, 3, 1)).reshape(n_groups * g, K_sub, s)
    return xt[:B, :K, :]


def _matvec_lanes(M: jnp.ndarray, x: jnp.ndarray, s: int) -> jnp.ndarray:
    """y[a,l] = sum_{j,b} M[j,b,a,l] * halo_j(x)[b,l] — 3*s lane-parallel FMAs.

    One accumulator per halo slot, summed at the end: the 3x-shorter FMA
    dependency chains run ~8% faster at L=1024 and ~14% at L=128 than a
    single accumulator (measured on v5e; deeper splits and explicit
    broadcasts both lose).  The final tree is (left + right) + main: all
    associations are numerically admissible (the oracle is an einsum whose
    internal order XLA picks), and this one empirically preserves the
    suite's exact iteration-count parity at noise-floor tolerances."""
    L = x.shape[-1]
    xm = pltpu.roll(x, shift=1, axis=1)      # knot k-1 in lane l
    xp = pltpu.roll(x, shift=L - 1, axis=1)  # knot k+1 in lane l
    halos = (xm, x, xp)
    parts = []
    for j in range(3):
        h = halos[j]
        y = M[j, 0] * h[0:1, :]
        for b in range(1, s):
            y = y + M[j, b] * h[b : b + 1, :]
        parts.append(y)
    return (parts[0] + parts[2]) + parts[1]


def make_reducers(g: int, K_sub: int, L: int, dt):
    """Per-problem segment reduction / lane broadcast for the packed layout.

    g == 1 degenerates to whole-tile two-step sums (Mosaic cannot legalize
    multi-axis keepdims); g > 1 rides the MXU via a constant 0/1 segment
    matrix Seg[l, j] = 1 iff lane l belongs to problem j (module docstring).
    Shared by every lane-packed kernel (fused_solve/direct_fused/longk
    re-export this as their reducer factory)."""
    i32 = jnp.int32
    if g == 1:
        def seg_sum(z):
            row = jnp.sum(z, axis=0, keepdims=True)              # (1, L)
            return jnp.sum(row, axis=1, keepdims=True)           # (1, 1)

        def lanes(per):
            return jnp.broadcast_to(per, (1, L))
    else:
        # Built from iota; hoisted by the compiler.
        lane_seg = jax.lax.broadcasted_iota(i32, (L, g), 0) // K_sub
        prob_ids = jax.lax.broadcasted_iota(i32, (L, g), 1)
        seg = (lane_seg == prob_ids).astype(dt)  # (L, g)

        def seg_sum(z):
            """(sp, L) -> per-problem sums (1, g), via one MXU pass."""
            row = jnp.sum(z, axis=0, keepdims=True)              # (1, L)
            return jax.lax.dot_general(                          # (1, g)
                row, seg, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def lanes(per):
            """(1, g) per-problem values -> (1, L) lane broadcast, one MXU pass.

            (pltpu.repeat is NOT usable here: it tiles [a,b,a,b,...] rather
            than element-repeating [a,a,...,b,b,...], which would scatter
            problems' scalars across the wrong lane segments.)"""
            return jax.lax.dot_general(
                per, seg, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    return seg_sum, lanes


def pcg_loop(mvS, mvP, gam, lam0, exit_tol, max_iters, seg_sum, lanes, g: int,
             *, poly_degree: int = 1, unroll: int = 1, bad=None):
    """The in-kernel PCG loop on packed (sp, L) values, generic over the
    operator executors: ``mvS``/``mvP`` apply S and the preconditioner to a
    packed vector (VMEM-resident rolls here; HBM-streamed chunk DMA in
    kernels/longk.py — the same injection seam as pcg.pcg's ``matvec``).

    Numerics are identical to pcg.pcg (same update order, same exit test,
    same iteration-count semantics, per-problem masked freezing), so callers
    inherit the exact-iteration-parity invariant.  Returns
    (lam, eta, n_iters, conv) with per-problem (1, g) scalars.

    ``bad`` (optional, (1, g) float counts > 0 where the caller's in-kernel
    condense clamped a zero pivot on a LIVE lane — _gj_inv_flag): a flagged
    problem is frozen out of the live mask and gated out of the exit test,
    so it performs no updates, never converges, and exits with
    n_iters == max_iters, conv == 0; its REPORTED eta is then pinned to a
    huge-but-FINITE poison (1e30) after the loop.  The in-loop alpha/beta
    scalars stay at their natural finite magnitudes — poisoning eta inside
    the loop measurably NaN'd the whole group: alpha = 1e30/nu overflows
    to inf and the lanes() masked matmul turns inf * 0-mask into NaN for
    every problem (the CLAUDE.md seg-reducer lesson, reproduced here).
    The max_iters/unconverged outcome matches the XLA oracle on the same
    degenerate input, where the singular inverse produces NaNs whose failed
    comparisons also run the loop to max_iters (the kernel's clamp would
    otherwise quietly solve a DIFFERENT, regularized system and report
    converged — ADVICE r4 #2)."""
    dt = gam.dtype
    i32 = jnp.int32
    badm = None if bad is None else (bad > 0)                  # (1, g)

    def dot(a, b):
        return seg_sum(a * b)  # (1, g)

    def apply_P(rv):
        # Polynomial composition (SolverOptions.precond_poly_degree), Horner
        # form — identical formula to pcg.apply_P so iteration counts match.
        y = mvP(rv)
        for _ in range(poly_degree - 1):
            y = y + mvP(rv - mvS(y))
        return y

    # r0 = gamma - S lam0 (cold start: lam0 = 0 -> r0 = gamma, like the
    # reference's unconditional reset, gato_pcg.cuh:296-304; warm start real).
    r = gam - mvS(lam0)
    r_tilde = apply_P(r)
    p = r_tilde
    eta = dot(r, r_tilde)  # (1, g)

    # NOTE: int32 flags, not bool — Mosaic cannot legalize vector<i1> loop
    # carries (scf.yield legalization failure on libtpu v5e).
    def cond(st):
        it, conv = st[4], st[6]
        return jnp.logical_and(it < max_iters, jnp.sum(conv) < g)

    def one_iter(st):
        """One PCG iteration with self-gated masked updates.

        Every state update is masked per problem by
        ``live = (not converged) & (it < max_iters)``, which makes the step a
        no-op past convergence or past the iteration budget.  This is exactly
        pcg.pcg's semantics (the converging update IS applied on the iteration
        that trips the exit test, then the problem freezes), and the self-gate
        makes the body safe to UNROLL inside one while_loop trip at identical
        iteration counts.  Measured on v5e (IIWA): unroll=4 cuts the g=1
        per-iteration cost 0.46 -> 0.35 us (~6%% off the single-solve
        headline); at g>1 unrolling loses slightly (masked overshoot across
        the group's ragged convergence), hence the g-dependent auto rule."""
        lam, r, p, eta, it, n_iters, conv = st
        upsilon = mvS(p)
        nu = dot(p, upsilon)
        alpha = jnp.where(nu != 0, eta / nu, 0.0)          # (1, g)
        alpha_l = lanes(alpha)
        lam_n = lam + alpha_l * p
        r_n = r - alpha_l * upsilon
        r_tilde = apply_P(r_n)
        eta_new = dot(r_n, r_tilde)
        conv_now = jnp.abs(eta_new) < exit_tol             # (1, g)
        if badm is not None:
            conv_now = jnp.logical_and(conv_now, jnp.logical_not(badm))
        beta = jnp.where(eta != 0, eta_new / eta, 0.0)
        p_n = r_tilde + lanes(beta) * p

        live = jnp.logical_and(conv == 0, it < max_iters)  # (1, g)
        if badm is not None:  # flagged problems freeze at lam0, stay finite
            live = jnp.logical_and(live, jnp.logical_not(badm))
        # Lane mask as a SELECT, not an arithmetic blend: lanes() emits
        # exact 1.0/0.0 (0/1 segment matmul), so where() is value-identical
        # to live_l*new + (1-live_l)*old while costing one select per
        # vector instead of two multiplies and an add (and it cannot
        # propagate a frozen lane's garbage through 0*x).
        live_l = lanes(live.astype(dt)) > 0.5              # (1, L) bool
        lam = jnp.where(live_l, lam_n, lam)
        r = jnp.where(live_l, r_n, r)
        p = jnp.where(live_l, p_n, p)
        eta = jnp.where(live, eta_new, eta)
        n_iters = jnp.where(jnp.logical_and(live, conv_now), it, n_iters)
        conv = jnp.maximum(conv, jnp.logical_and(live, conv_now).astype(i32))
        return (lam, r, p, eta, it + 1, n_iters, conv)

    def body(st):
        for _ in range(unroll):
            st = one_iter(st)
        return st

    init = (
        lam0, r, p, eta,
        jnp.zeros((), i32),
        jnp.full((1, g), max_iters, i32),  # reference: count = maxIters
        jnp.zeros((1, g), i32),
    )
    lam, r, p, eta, it, n_iters, conv = jax.lax.while_loop(cond, body, init)
    if badm is not None:  # post-loop: report a poisoned (finite) eta
        eta = jnp.where(badm, jnp.asarray(1e30, dt), eta)
    return lam, eta, n_iters, conv


def _pcg_kernel(
    tol_ref, maxit_ref,                     # SMEM scalars
    S_ref, P_ref, gam_ref, lam0_ref,        # VMEM tensors
    lam_out, iters_out, conv_out, eta_out,  # outputs
    *, s: int, K_sub: int, g: int, poly_degree: int = 1, unroll: int = 1,
):
    S = S_ref[:]
    P = P_ref[:]
    gam = gam_ref[:]
    lam0 = lam0_ref[:]
    L = gam.shape[-1]
    i32 = jnp.int32

    mv = functools.partial(_matvec_lanes, s=s)
    seg_sum, lanes = make_reducers(g, K_sub, L, gam.dtype)
    lam, eta, n_iters, conv = pcg_loop(
        functools.partial(mv, S), functools.partial(mv, P),
        gam, lam0, tol_ref[0], maxit_ref[0], seg_sum, lanes, g,
        poly_degree=poly_degree, unroll=unroll,
    )

    lam_out[:] = lam
    out_shape = iters_out.shape  # (8, L)
    iters_out[:] = jnp.broadcast_to(lanes(n_iters.astype(gam.dtype)),
                                    out_shape).astype(i32)
    conv_out[:] = jnp.broadcast_to(lanes(conv.astype(gam.dtype)),
                                   out_shape).astype(i32)
    eta_out[:] = jnp.broadcast_to(lanes(jnp.abs(eta)), out_shape)


def pcg_fused_batched(
    S: jnp.ndarray,       # (B, K, 3, s, s)
    Pinv: jnp.ndarray,    # (B, K, 3, s, s)
    gamma: jnp.ndarray,   # (B, K, s)
    lam0: Optional[jnp.ndarray] = None,
    *,
    exit_tol=1e-6,
    max_iters=100,
    poly_degree: int = 1,
    interpret: bool = False,
    unroll=None,
) -> PCGResult:
    """Solve a batch of block-tridiagonal systems in fused TPU kernels.

    Problems are lane-packed g-per-program (g sized to VMEM and lane width)
    and programs are pipelined over the Pallas grid; a short batch (even B=1)
    is simply one program with g=1.  Returns PCGResult with a leading batch
    axis on every field.
    """
    B, K, _, s, _ = S.shape
    dt = gamma.dtype
    K_sub, g, L, n_groups, sp = plan_packing(B, K, s)
    if unroll is None:
        unroll = 4 if g == 1 else 1  # same auto rule as fused_solve
    # Mosaic kernels only lower on TPU; elsewhere (CPU tests, GPU) run the
    # Pallas interpreter so explicit pcg_backend='pallas' works everywhere.
    interpret = interpret or jax.default_backend() != "tpu"

    if lam0 is None:
        lam0 = jnp.zeros_like(gamma)

    pk = functools.partial(_pack_operator, K_sub=K_sub, g=g, L=L,
                           n_groups=n_groups, sp=sp)
    pv = functools.partial(_pack_vec, K_sub=K_sub, g=g, L=L,
                           n_groups=n_groups, sp=sp)
    Sb, Pb = pk(S.astype(dt)), pk(Pinv.astype(dt))
    gb, lb = pv(gamma), pv(lam0.astype(dt))

    cost = pl.CostEstimate(
        flops=int(2 * 2 * 3 * s * s * K * B * 100),
        bytes_accessed=int((Sb.size + Pb.size + 6 * gb.size) * 4),
        transcendentals=0,
    )
    op_spec = pl.BlockSpec(
        (1, 3, s, sp, L), lambda i: (i, 0, 0, 0, 0), memory_space=pltpu.VMEM
    )
    vec_spec = pl.BlockSpec(
        (1, sp, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    aux_spec = pl.BlockSpec(
        (1, _SUBLANE, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )

    def kernel(tol_ref, maxit_ref, S_ref, P_ref, gam_ref, lam0_ref,
               lam_out, iters_out, conv_out, eta_out):
        _pcg_kernel(
            tol_ref, maxit_ref,
            S_ref.at[0], P_ref.at[0], gam_ref.at[0], lam0_ref.at[0],
            lam_out.at[0], iters_out.at[0], conv_out.at[0], eta_out.at[0],
            s=s, K_sub=K_sub, g=g, poly_degree=poly_degree, unroll=unroll,
        )

    lam_p, iters, conv, eta = pl.pallas_call(
        kernel,
        grid=(n_groups,),
        out_shape=(
            jax.ShapeDtypeStruct((n_groups, sp, L), dt),
            jax.ShapeDtypeStruct((n_groups, _SUBLANE, L), jnp.int32),
            jax.ShapeDtypeStruct((n_groups, _SUBLANE, L), jnp.int32),
            jax.ShapeDtypeStruct((n_groups, _SUBLANE, L), dt),
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

    lam = _unpack_vec(lam_p, B, K, s, K_sub, g)

    def per_problem(x):
        """(n_groups, 8, L) -> (B,) picking lane 0 of each problem segment."""
        v = x[:, 0, : g * K_sub].reshape(n_groups * g, K_sub)[:B, 0]
        return v

    return PCGResult(
        lam=lam,
        iters=per_problem(iters),
        converged=per_problem(conv) != 0,
        eta=per_problem(eta),
    )


def pcg_fused(
    S: jnp.ndarray,
    Pinv: jnp.ndarray,
    gamma: jnp.ndarray,
    lam0: Optional[jnp.ndarray] = None,
    *,
    exit_tol=1e-6,
    max_iters=100,
    poly_degree: int = 1,
    interpret: bool = False,
) -> PCGResult:
    """Single-problem fused solve: same contract as pcg.pcg."""
    res = pcg_fused_batched(
        S[None], Pinv[None], gamma[None],
        None if lam0 is None else lam0[None],
        exit_tol=exit_tol, max_iters=max_iters, poly_degree=poly_degree,
        interpret=interpret,
    )
    return PCGResult(
        lam=res.lam[0], iters=res.iters[0],
        converged=res.converged[0], eta=res.eta[0],
    )
