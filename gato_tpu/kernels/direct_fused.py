"""Whole-solve fused DIRECT kernel: condense + block cyclic reduction +
recovery in ONE Pallas program.

Motivation (measured on v5e before this kernel): ``method='direct'`` ran
condensation and the cyclic-reduction solve as XLA ops over (K, s, s) arrays
— 0.17 ms single / 85 us-per-solve batched, dominated by the same tiny-block
relayout disease that motivated the fused PCG kernel (fused_solve.py module
docstring).  Running the exact solver inside the lane-packed layout removes
every relayout and HBM round trip: the direct solve becomes latency-
competitive with the iterative path while giving the exact answer with no
tolerance or iteration count.

Layout and primitives are shared with fused_solve.py (column stacks on
(sp, L) tiles, problems lane-packed g-per-program, neighbor access by lane
roll).  The solve stage replaces PCG with block cyclic reduction — the same
recurrences as the pure-JAX oracle ``direct.btd_solve_cr`` (see its docstring
for the per-level algebra), laid out TPU-natively:

* Level l eliminates rows with in-segment index == 2^l (mod 2^{l+1}) ("odd"
  rows of the level); rolls by +-2^l gather the odd neighbors of the
  surviving "even" rows.  All lanes compute; a per-level 0/1 mask blends the
  update into even lanes only, so odd lanes RETAIN their level-l system
  (L, U, b) — exactly the state back-substitution needs — while their D
  slot retires holding their Dinv (each lane is eliminated at exactly one
  level, and a retired lane's D is never read again, so the D stack doubles
  as the Dinv store: zero extra per-level storage).
* No masking is needed for the neighbor READS: an out-of-range or
  cross-segment roll is always multiplied by a structurally zero L/U block.
  Invariant (induction over levels, base case = the trajectory boundary
  zeros): at level l, U is zero at any row whose right neighbor row+2^l
  exceeds the last real row, and L is zero at row 0; pad lanes keep
  D = L = U = b = 0 throughout, so their Gauss-Jordan (clamped pivots ->
  identity) never contaminates a real lane.  This replaces the oracle's
  per-level zero-padding of the compacted arrays.

The reduced systems are Schur complements of SPD systems (SPD themselves),
so the no-pivoting Gauss-Jordan carries the same justification as
blocktri.block_inv.  Results match the pure path (direct.btd_solve_auto on
assemble.condense output) to f32 round-off; ``eta`` reports the squared true
residual of the returned multipliers, like solver._direct_result — poisoned
to a huge finite value (1e30; inf would NaN-contaminate other problems
through the masked-matmul reducers) when any live-lane block inversion
clamped a zero pivot (singular input; _gj_inv_flag), so ``converged``
reports False like the XLA path's NaN propagation instead of blessing a
silently-regularized solve.

No reference equivalent: the CUDA reference has no direct solver at all —
this is the batch-throughput exact-solve tier the TPU design adds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..pcg import PCGResult
from .pcg_pallas import _LANE, _SUBLANE, _round_up, plan_lane_groups
from .fused_solve import (
    _condense_cols,
    _gj_inv_flag,
    _make_reducers,
    _mat_mat,
    _mat_vec,
    _pack_mat,
    _pack_vec,
    _recover_cols,
    _roll_m1,
    _roll_p1,
    _unpack_vec,
)

# Per-program VMEM budget.  The CR working set is wider than the PCG
# kernel's (persistent D/L/U/Dinv stacks plus the original S kept live for
# the residual), so the sustainable g is lower: on-device sweep (v5e, IIWA
# batch) drives the budget below just like fused_solve._VMEM_BUDGET_BYTES.
_VMEM_BUDGET_BYTES = (8 * 1024 + 512) * 1024


def _lane_budget(K: int, s: int, c: int):
    sp = _round_up(s, _SUBLANE)
    K_sub = _round_up(K, _SUBLANE)
    # Column count per lane (f32 words x sp): inputs (2s+2c), condensation
    # intermediates (~4s + 2c), CR state D(+merged Dinv)/L/U/Dinv_cur (~4s)
    # + roll transients (~4s), original S + gamma kept for the residual
    # (3s), vectors (~8).  Mosaic's liveness reuse makes this an
    # over-estimate; the budget constant absorbs the slack (validated
    # on-device; the merged-Dinv store left it untouched — headroom, not a
    # retune).
    words_per_lane = sp * (13 * s + 5 * c + 10)
    max_lanes = _VMEM_BUDGET_BYTES // (4 * words_per_lane)
    return sp, K_sub, int(max_lanes)


def fits_vmem(K: int, s: int, c: int) -> bool:
    """True iff one problem's condense+CR working set fits the VMEM budget.

    Past it the solver falls back to the XLA path (assemble.condense +
    direct.btd_solve_auto) — exact either way, only latency differs."""
    _, K_sub, max_lanes = _lane_budget(K, s, c)
    return _round_up(max(K_sub, _LANE), _LANE) <= max_lanes


def plan_packing(B: int, K: int, s: int, c: int):
    """Same contract as fused_solve.plan_packing, with the CR budget."""
    sp, K_sub, max_lanes = _lane_budget(K, s, c)
    g, L, n_groups = plan_lane_groups(
        B, K_sub, max_lanes,
        f"trajectory K={K} (s={s}, c={c}) needs "
        f"{_round_up(K_sub, _LANE)} lanes but only {max_lanes} fit the "
        f"{_VMEM_BUDGET_BYTES >> 20} MB VMEM budget of the fused direct "
        "kernel; use method='direct' with pcg_backend=None/'jax' (XLA "
        "path) for horizons this long",
    )
    return K_sub, g, L, n_groups, sp


def _n_levels(K_sub: int) -> int:
    n = 0
    while (1 << n) < K_sub:
        n += 1
    return n


def _cr_solve(Dc, Lc, Uc, bv, lane_in_seg, *, s: int, sp: int, K_sub: int):
    """Block cyclic reduction on column stacks; returns (x, bad) with
    S x = b and ``bad`` a (1, L) flag marking lanes whose USED block
    inversion clamped a zero pivot on live data (_gj_inv_flag): a level's
    inverse is consumed only at the lanes it eliminates (odd lanes) and at
    the root, so only those lanes' flags count — retired lanes' D slots
    hold already-inverted garbage whose re-inversion is masked away.

    Arguments are the level-0 system (Dc/Lc/Uc: s-column stacks, bv: (sp, L))
    in knot-lane layout; ``lane_in_seg`` is the (1, L) in-segment lane index.
    """
    dt = bv.dtype
    levels = _n_levels(K_sub)
    bad = jnp.zeros((1, bv.shape[-1]), dt)

    for lev in range(levels):
        h = 1 << lev

        def rp(x, h=h):   # value of lane k-h at lane k (left neighbor)
            return pltpu.roll(x, shift=h, axis=x.ndim - 1)

        def rm(x, h=h):   # value of lane k+h at lane k (right neighbor)
            return pltpu.roll(x, shift=x.shape[-1] - h, axis=x.ndim - 1)

        Dinv_cur, bad_cur = _gj_inv_flag(Dc, s, sp)
        odd_f = (lane_in_seg % (2 * h) == h).astype(dt)
        even_f = (lane_in_seg % (2 * h) == 0).astype(dt)
        bad = bad + odd_f * bad_cur

        DinvL = [rp(x) for x in Dinv_cur]
        DinvR = [rm(x) for x in Dinv_cur]
        LoL = [rp(x) for x in Lc]
        UoL = [rp(x) for x in Uc]
        LoR = [rm(x) for x in Lc]
        UoR = [rm(x) for x in Uc]
        bL = rp(bv)
        bR = rm(bv)

        Am = _mat_mat(Lc, DinvL, s)     # L_e D_{o,left}^{-1}
        Bm = _mat_mat(Uc, DinvR, s)     # U_e D_{o,right}^{-1}
        L_new = [-x for x in _mat_mat(Am, LoL, s)]
        U_new = [-x for x in _mat_mat(Bm, UoR, s)]
        AU = _mat_mat(Am, UoL, s)
        BL = _mat_mat(Bm, LoR, s)
        D_new = [Dc[b] - AU[b] - BL[b] for b in range(s)]
        b_new = bv - _mat_vec(Am, bL, s) - _mat_vec(Bm, bR, s)

        # Blend into even lanes only; odd lanes keep their level-lev system
        # for back-substitution.  An odd (retiring) lane's D is DEAD after
        # this level — back-substitution reads only its b/L/U plus its
        # Dinv — so the Dinv is stored INTO the D slot: even lanes take the
        # reduced D_new, odd lanes retire holding Dinv_cur, every other lane
        # keeps what it holds (live D, or an earlier level's Dinv).  This
        # replaces the separate s-column DinvStore stack of the original
        # formulation with identical values at every read site — one fewer
        # persistent operator-sized stack in VMEM.
        Dc = [even_f * D_new[b] + odd_f * Dinv_cur[b]
              + (1.0 - even_f - odd_f) * Dc[b] for b in range(s)]
        Lc = [even_f * L_new[b] + (1.0 - even_f) * Lc[b] for b in range(s)]
        Uc = [even_f * U_new[b] + (1.0 - even_f) * Uc[b] for b in range(s)]
        bv = even_f * b_new + (1.0 - even_f) * bv

    # Root solve: each segment's surviving system is the single block at
    # in-segment lane 0 (the only lane whose D slot still holds a live D —
    # the GJ output at retired lanes is garbage-in-garbage-out, masked away).
    root_f = (lane_in_seg == 0).astype(dt)
    Dinv_root, bad_root = _gj_inv_flag(Dc, s, sp)
    bad = bad + root_f * bad_root
    x = root_f * _mat_vec(Dinv_root, bv, s)

    # Back-substitution: x_odd = Dinv (b - L x_left - U x_right).
    for lev in reversed(range(levels)):
        h = 1 << lev

        def rp(x_, h=h):
            return pltpu.roll(x_, shift=h, axis=x_.ndim - 1)

        def rm(x_, h=h):
            return pltpu.roll(x_, shift=x_.shape[-1] - h, axis=x_.ndim - 1)

        odd_f = (lane_in_seg % (2 * h) == h).astype(dt)
        xL = rp(x)
        xR = rm(x)
        rhs = bv - _mat_vec(Lc, xL, s) - _mat_vec(Uc, xR, s)
        # This level's odd lanes hold their Dinv in the D slot (stored at
        # their elimination level above).
        x_odd = _mat_vec(Dc, rhs, s)
        x = odd_f * x_odd + (1.0 - odd_f) * x

    return x, bad


def _direct_kernel(
    rho_ref,                                      # SMEM scalar
    Q_ref, R_ref, A_ref, B_ref, q_ref, r_ref, c_ref,
    lam_out, dzx_out, dzu_out, eta_out, gnorm_out,
    *, s: int, c: int, K_sub: int, g: int, sp: int,
):
    """Kernel body on UNPREFIXED refs (see fused_solve._fused_kernel): the
    group axis is handled by the caller (block views or DMA scratch)."""
    dt = q_ref.dtype
    rho = rho_ref[0]
    L = q_ref.shape[-1]

    qv = q_ref[...]
    rv = r_ref[...]
    cv = c_ref[...]

    (Qinv, Rinv, Ac, Bc, theta, gamma, S_left, S_right,
     bad_qr) = _condense_cols(
        Q_ref, R_ref, A_ref, B_ref, qv, rv, cv, rho, s=s, c=c, sp=sp,
        want_flag=True,
    )

    lane_in_seg = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1) % K_sub
    lam, bad_cr = _cr_solve(list(theta), list(S_left), list(S_right), gamma,
                            lane_in_seg, s=s, sp=sp, K_sub=K_sub)

    # eta = squared true residual of the returned solution (the contract of
    # solver._direct_result) — needs the ORIGINAL system, which the CR left
    # untouched (it blends into fresh value lists).  Problems where a LIVE
    # block inversion clamped a zero pivot (singular Q/R/theta — the kernel
    # then solved a silently-regularized system whose self-consistent
    # residual is meaninglessly small) poison eta to a huge FINITE value,
    # so the wrapper's residual_converged reports False like the XLA path's
    # NaN propagation (solver._direct_result docstring).  Finite, not inf:
    # the seg_sum/lanes reducers are masked MXU matmuls, and inf times an
    # out-of-segment 0 mask is NaN — an inf poison would contaminate every
    # OTHER problem in the group (measured: one singular problem in a
    # 5-batch flipped all five flags).
    seg_sum, lanes = _make_reducers(g, K_sub, L, dt)
    resid = gamma - (_mat_vec(S_left, _roll_p1(lam), s)
                     + _mat_vec(theta, lam, s)
                     + _mat_vec(S_right, _roll_m1(lam), s))
    bad_seg = seg_sum(jnp.broadcast_to(bad_qr + bad_cr, resid.shape))
    eta = seg_sum(resid * resid) + jnp.where(bad_seg > 0, 1e30, 0.0)

    dzx, dzu = _recover_cols(Qinv, Rinv, Ac, Bc, qv, rv, lam, s=s, c=c, sp=sp)

    lam_out[...] = lam
    dzx_out[...] = dzx
    dzu_out[...] = dzu
    eta_out[...] = jnp.broadcast_to(lanes(eta), eta_out.shape)
    # ||gamma||^2 per problem, for the residual-based converged flag
    # (direct.residual_converged) computed by the wrapper.
    gnorm_out[...] = jnp.broadcast_to(lanes(seg_sum(gamma * gamma)),
                                      gnorm_out.shape)


def _call_direct(rho, Qb, Rb, Ab, Bb, qb, rb, cb, *,
                 s, c, K_sub, g, L, sp, n_groups, flops_scale,
                 interpret, input_dma=None):
    """Invoke the direct kernel on pre-packed arrays; returns packed outputs
    (lam_p, dzx_p, dzu_p, eta, gnorm) — the direct analog of
    fused_solve._call_fused, shared by :func:`solve_direct_fused_batched`
    and the packed serving API (gato_tpu.packed)."""
    dt = qb.dtype
    cdim = c

    vec_spec = pl.BlockSpec((1, sp, L), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    aux_spec = pl.BlockSpec((1, _SUBLANE, L), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    body = functools.partial(_direct_kernel, s=s, c=cdim, K_sub=K_sub, g=g,
                             sp=sp)
    if input_dma is None:
        input_dma = L > _LANE or n_groups > 1
    if input_dma:
        # Single-buffered manual-DMA inputs (see fused_solve._call_fused /
        # longk._pcg_xl_call): frees the pipeline's double-buffer copy of
        # the 7 input planes, VMEM that goes to more problems per program.
        def kernel(rho_ref, Q_hbm, R_hbm, A_hbm, B_hbm, q_hbm, r_hbm, c_hbm,
                   lam_out, dzx_out, dzu_out, eta_out, gnorm_out,
                   Qs, Rs, As, Bs, qs, rs, cs, sems):
            i = pl.program_id(0)
            pairs = list(zip((Q_hbm, R_hbm, A_hbm, B_hbm, q_hbm, r_hbm,
                              c_hbm),
                             (Qs, Rs, As, Bs, qs, rs, cs)))
            copies = [pltpu.make_async_copy(h.at[i], v, sems.at[j])
                      for j, (h, v) in enumerate(pairs)]
            for cp in copies:
                cp.start()
            for cp in copies:
                cp.wait()
            body(rho_ref, Qs, Rs, As, Bs, qs, rs, cs,
                 lam_out.at[0], dzx_out.at[0], dzu_out.at[0],
                 eta_out.at[0], gnorm_out.at[0])

        hbm = pl.BlockSpec(memory_space=pl.ANY)
        in_specs = [smem] + [hbm] * 7
        scratch_shapes = [
            pltpu.VMEM((s, sp, L), dt), pltpu.VMEM((cdim, sp, L), dt),
            pltpu.VMEM((s, sp, L), dt), pltpu.VMEM((cdim, sp, L), dt),
            pltpu.VMEM((sp, L), dt), pltpu.VMEM((sp, L), dt),
            pltpu.VMEM((sp, L), dt),
            pltpu.SemaphoreType.DMA((7,)),
        ]
    else:
        def kernel(rho_ref, Q_ref, R_ref, A_ref, B_ref, q_ref, r_ref, c_ref,
                   lam_out, dzx_out, dzu_out, eta_out, gnorm_out):
            body(rho_ref, Q_ref.at[0], R_ref.at[0], A_ref.at[0], B_ref.at[0],
                 q_ref.at[0], r_ref.at[0], c_ref.at[0],
                 lam_out.at[0], dzx_out.at[0], dzu_out.at[0],
                 eta_out.at[0], gnorm_out.at[0])

        def mat_spec(ncols):
            return pl.BlockSpec((1, ncols, sp, L), lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)

        in_specs = [smem,
                    mat_spec(s), mat_spec(cdim), mat_spec(s), mat_spec(cdim),
                    vec_spec, vec_spec, vec_spec]
        scratch_shapes = []

    cost = pl.CostEstimate(
        flops=int(flops_scale * s * s * (20 * s + 40)),
        bytes_accessed=int((Qb.size + Rb.size + Ab.size + Bb.size) * 4),
        transcendentals=0,
    )

    return pl.pallas_call(
        kernel,
        grid=(n_groups,),
        out_shape=(
            jax.ShapeDtypeStruct((n_groups, sp, L), dt),
            jax.ShapeDtypeStruct((n_groups, sp, L), dt),
            jax.ShapeDtypeStruct((n_groups, sp, L), dt),
            jax.ShapeDtypeStruct((n_groups, _SUBLANE, L), dt),
            jax.ShapeDtypeStruct((n_groups, _SUBLANE, L), dt),
        ),
        in_specs=in_specs,
        out_specs=(vec_spec, vec_spec, vec_spec, aux_spec, aux_spec),
        scratch_shapes=scratch_shapes,
        cost_estimate=cost,
        interpret=interpret,
    )(
        jnp.asarray(rho, dt).reshape(1),
        Qb, Rb, Ab, Bb, qb, rb, cb,
    )


def solve_direct_fused_batched(
    Q, R, A, B, q, r, c, *,
    rho=0.0, interpret: bool = False, input_dma=None,
):
    """Whole batched DIRECT solve (condense + cyclic reduction + recover) in
    fused TPU kernels.

    Args follow formats.KKTBlocks with a leading batch axis.  Returns
    (PCGResult with batch axis — iters = 0, eta = squared true residual,
    converged derived from eta (direct.residual_converged) — , dz_x (B,K,s),
    dz_u (B,K-1,c)), matching the contract of the XLA direct path
    (solver._direct_result).

    ``input_dma`` selects how inputs reach VMEM (None = auto, exactly as
    fused_solve._call_fused: manual single-buffered DMA whenever VMEM
    pressure exists, pipeline blocks otherwise); both paths wrap the same
    kernel body and are bit-identical (tests pin this)."""
    Bn, K, s, _ = Q.shape
    cdim = R.shape[-1]
    K_sub, g, L, n_groups, sp = plan_packing(Bn, K, s, cdim)
    interpret = interpret or jax.default_backend() != "tpu"

    pm = functools.partial(_pack_mat, K_sub=K_sub, g=g, L=L,
                           n_groups=n_groups, sp=sp)
    pv = functools.partial(_pack_vec, K_sub=K_sub, g=g, L=L,
                           n_groups=n_groups, sp=sp)
    Qb, Rb, Ab, Bb = pm(Q), pm(R), pm(A), pm(B)
    qb, rb, cb = pv(q), pv(r), pv(c)

    lam_p, dzx_p, dzu_p, eta, gnorm = _call_direct(
        rho, Qb, Rb, Ab, Bb, qb, rb, cb,
        s=s, c=cdim, K_sub=K_sub, g=g, L=L, sp=sp, n_groups=n_groups,
        flops_scale=Bn * K, interpret=interpret, input_dma=input_dma,
    )

    lam = _unpack_vec(lam_p, Bn, K, s, K_sub, g)
    dz_x = _unpack_vec(dzx_p, Bn, K, s, K_sub, g)
    dz_u = _unpack_vec(dzu_p, Bn, K, cdim, K_sub, g)[:, : K - 1, :]

    def per_problem(x):
        return x[:, 0, : g * K_sub].reshape(n_groups * g, K_sub)[:Bn, 0]

    from ..direct import residual_converged

    eta_b = per_problem(eta)
    res = PCGResult(
        lam=lam,
        iters=jnp.zeros((Bn,), jnp.int32),
        converged=residual_converged(eta_b, per_problem(gnorm)),
        eta=eta_b,
    )
    return res, dz_x, dz_u
