"""Batch-throughput DIRECT kernel: batch-in-lanes block-Thomas.

Motivation (measured on v5e, BENCH_DETAIL round 3): the fused cyclic-
reduction kernel (direct_fused.py) packs KNOTS into lanes, so every CR level
issues work on all K_sub lanes while only half the surviving rows are live —
4.8x the analytically-needed FLOPs at IIWA scale (flops_issued 15.2M vs
3.18M needed).  It runs at 56% of the machine's ISSUE ceiling but only 11.7%
of the true roofline: the gap is occupancy by construction, not scheduling.

At wide batches the TPU-right layout inverts the axes: put the BATCH in
lanes and walk the knot axis sequentially.  Every (sp, L) tile then holds
one matrix column across L independent problems — 100% lane occupancy at
B >= 128 — and sequential block-Thomas elimination issues ~1x the needed
FLOPs (one Gauss-Jordan + a handful of s-column products per knot) instead
of CR's log2(K) masked levels.  The serial knot walk costs latency per
problem but that is exactly what a throughput batch does not pay for: all L
lanes advance together.

Structure (two Pallas programs, knot axis = sequential grid dimension with
a VMEM scratch carry — the longk._condense_chunk idiom, longk.py:205-299):

* FORWARD, grid (n_groups, K): per knot, condense the Schur row (identical
  algebra to assemble.condense — interval quantities arrive pre-shifted one
  knot right so row j loads A_{j-1}/B_{j-1}/R_{j-1}/r_{j-1} at slot j) and
  eliminate it against the carried previous row:

      phi_j  = A_{j-1} Qinv_{j-1}          (Qinv carried)
      theta_j = phi_j A_{j-1}^T + B R^{-1} B^T + Qinv_j
      M_j    = phi_j Cinv_{j-1}            (Cinv carried)
      Dhat_j = theta_j - M_j phi_j^T       (U_{j-1} = phi_j^T by symmetry)
      bhat_j = gamma_j - M_j bhat_{j-1}
      Cinv_j = Dhat_j^{-1}                 (Gauss-Jordan, blocktri.block_inv
                                            justification: Schur complements
                                            of SPD systems are SPD)

  The factor stacks (Cinv, bhat, Qinv, Rinv, phi, theta, gamma) stream to
  HBM per knot — VMEM holds only one knot's working set, so K is unbounded
  by VMEM (unlike every resident kernel tier).  Storing theta is a MEASURED
  choice: rebuilding it in the reverse pass (phi A^T + BR B^T + Qinv, zero
  extra HBM reads, -21% factor traffic) ran 0.91 -> 1.13 us/solve at B=256
  on v5e — the knot walk is bound by the ISSUE LATENCY of its dependent
  per-knot op chain, not by HBM bandwidth (despite sitting at ~80% of the
  byte-model roofline), so trading bytes for serial flops loses.

* REVERSE, grid (n_groups, K) visiting knots K-1..0: back-substitution
  x_j = Cinv_j (bhat_j - phi_{j+1}^T x_{j+1}), fused with dz recovery
  (recover.recover_dz formulas; dz_u_{j-1} completes at step j where
  B_{j-1}, Rinv_{j-1}, r_{j-1} and lam_j are all local) and the squared
  TRUE residual of the original system: row j+1's residual needs x_j, so
  each step completes the previous knot's row from a carried partial
  (partial_{j+1} = gamma - theta x - phi^T x_next) minus phi_{j+1} x_j.

Numerics: identical formulas to assemble.condense + direct.btd_solve
(block-Thomas) + recover.recover_dz; reductions are reordered so values
agree with the XLA path to f32 round-off.  eta reports the squared true
residual and ``converged`` derives from it (direct.residual_converged),
matching solver._direct_result's contract.

No reference equivalent: the CUDA reference has no direct solver
(/root/reference/src/gato_pcg.cuh is its only solver); this tier exists so
exact solves keep up with — and at batch scale beat — the iterative path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..pcg import PCGResult
from .pcg_pallas import _LANE, _SUBLANE, _round_up
from .fused_solve import (
    _gj_inv_flag,
    _mat_mat,
    _mat_matT,
    _mat_vec,
    _matT_vec,
    _row_onehot,
)

# Per-program VMEM budget.  The working set per knot step is small (one
# knot's inputs + factors + carries), so the lane capacity is high; the
# budget mirrors the other kernels' convention of a measured-headroom cap.
_VMEM_BUDGET_BYTES = 9 * 1024 * 1024

# Factor stacks live in HBM: cap their footprint so a pathological
# (B, K) combination falls back to the CR kernel instead of OOMing.
_HBM_FACTOR_BUDGET_BYTES = 2 * 1024 * 1024 * 1024

# Measured crossover vs the knots-in-lanes CR kernel (see should_dispatch).
_MIN_BATCH = 16


def _cols(s: int, c: int):
    in_cols = 2 * s + 2 * c + 3            # Q,A (s) R,B (c) q,r,c vectors
    out_cols = 4 * s + c + 2               # Cinv,Qinv,phi,theta,Rinv,bhat,gam
    return in_cols, out_cols


def _lane_budget(s: int, c: int):
    sp = _round_up(s, _SUBLANE)
    in_cols, out_cols = _cols(s, c)
    carry_cols = 2 * s + 2                 # Qinv, Cinv, bhat, q_prev
    temp_cols = 8 * s + 2 * c              # GJ scratch + phi/BR/M/theta chains
    words = sp * (2 * in_cols + 2 * out_cols + carry_cols + temp_cols)
    max_lanes = _VMEM_BUDGET_BYTES // (4 * words)
    return sp, (max_lanes // _LANE) * _LANE


def plan_packing(B: int, s: int, c: int):
    """Lane plan: Lb lanes of problems per program, n_groups programs."""
    sp, max_lanes = _lane_budget(s, c)
    if max_lanes < _LANE:
        raise ValueError(
            f"state size {s} (sp={sp}) needs more than the "
            f"{_VMEM_BUDGET_BYTES >> 20} MB per-step VMEM budget of the "
            "batch-Thomas kernel even at one lane tile; use the "
            "cyclic-reduction kernel (kernels/direct_fused.py)"
        )
    Bp = _round_up(B, _LANE)
    n_groups = -(-Bp // min(Bp, max_lanes))
    # Balance lanes across groups instead of filling groups to max_lanes:
    # time scales with TOTAL lanes including pad (measured on v5e: B=512 at
    # the old fill-first plan ran 2 groups x 384 lanes = 768 lanes for 512
    # problems, 1.91 us/solve vs 1.39 at zero pad), so the width that
    # minimizes padded lanes at the same group count strictly wins.
    Lb = _round_up(-(-Bp // n_groups), _LANE)
    return sp, Lb, n_groups


def fits(B: int, K: int, s: int, c: int) -> bool:
    """True iff the lane plan and the HBM factor-stack footprint are sane."""
    sp, max_lanes = _lane_budget(s, c)
    if max_lanes < _LANE:
        return False
    _, out_cols = _cols(s, c)
    sp, Lb, n_groups = plan_packing(B, s, c)
    factor_bytes = n_groups * K * out_cols * sp * Lb * 4
    return factor_bytes <= _HBM_FACTOR_BUDGET_BYTES


def should_dispatch(B: int, K: int, s: int, c: int) -> bool:
    """Auto-tier boundary inside pcg_backend='fused' + method='direct':
    batch-in-lanes Thomas at wide batches, knots-in-lanes CR below.

    Measured on v5e (IIWA (14,7,50), chain-differenced, us/solve):

        B        16     32     64    128    256
        thomas  7.16   3.36   2.00   0.97   0.93
        CR      8.34   8.01   7.56   6.78   6.91

    The Thomas batch cost is nearly FLAT in B (0.107 -> 0.238 ms/batch over
    32 -> 256: the serial knot walk sets the time, the lanes ride along), so
    per-solve cost halves with every doubling until the lane plan fills.
    Below _MIN_BATCH the walk amortizes over too few problems and the CR
    kernel's knot-parallel latency wins (single-problem direct_fused runs
    ~18 us — 6x under the walk's floor).  The boundary is measured at the
    benchmark shape; it shifts with K (walk is linear in K, CR levels are
    log2 K) but both sides of it serve any (B, K) the other declines.
    """
    return B >= _MIN_BATCH and fits(B, K, s, c)


# --------------------------------------------------------------------------
# Packing: batch-in-lanes, knot-major.


def _shift1(X):
    """Interval arrays (B, K-1, ...) -> (B, K, ...) with a leading zero knot,
    so knot slot j holds interval j-1 (the quantity Schur row j consumes)."""
    pad = [(0, 0)] * X.ndim
    pad[1] = (1, 0)
    return jnp.pad(X, pad)


def _pack_mat_bt(M, sp: int, Lb: int, n_groups: int):
    """(B, K, n, m) -> (n_groups*K, m_cols, sp_rows, Lb_problems)."""
    B, K, n, m = M.shape
    Mt = jnp.transpose(M, (1, 3, 2, 0))                    # (K, m, n, B)
    Mt = jnp.pad(Mt, ((0, 0), (0, 0), (0, sp - n), (0, n_groups * Lb - B)))
    Mt = Mt.reshape(K, m, sp, n_groups, Lb)
    return jnp.transpose(Mt, (3, 0, 1, 2, 4)).reshape(n_groups * K, m, sp, Lb)


def _pack_vec_bt(x, sp: int, Lb: int, n_groups: int):
    """(B, K, n) -> (n_groups*K, sp, Lb)."""
    B, K, n = x.shape
    xt = jnp.transpose(x, (1, 2, 0))                       # (K, n, B)
    xt = jnp.pad(xt, ((0, 0), (0, sp - n), (0, n_groups * Lb - B)))
    xt = xt.reshape(K, sp, n_groups, Lb)
    return jnp.transpose(xt, (2, 0, 1, 3)).reshape(n_groups * K, sp, Lb)


def _unpack_vec_bt(x, B: int, K: int, n: int, Lb: int, n_groups: int):
    """(n_groups*K, sp, Lb) -> (B, K, n)."""
    sp = x.shape[1]
    xt = x.reshape(n_groups, K, sp, Lb)
    xt = jnp.transpose(xt, (0, 3, 1, 2)).reshape(n_groups * Lb, K, sp)
    return xt[:B, :, :n]


# --------------------------------------------------------------------------
# Forward: condense + block-LU elimination, one knot per grid step.


def _fwd_kernel(
    rho_ref,
    Q_ref, R_ref, A_ref, B_ref, q_ref, r_ref, c_ref,
    Cinv_out, bhat_out, Qinv_out, Rinv_out, phi_out, th_out, gam_out,
    Qprev, Cprev, bprev, qprev,
    *, s: int, c: int, sp: int,
):
    dt = q_ref.dtype
    t = pl.program_id(1)
    first = t == 0
    rho = rho_ref[0]

    qv = q_ref[0]
    rv = r_ref[0]
    cv = c_ref[0]
    Qc = [Q_ref[0, b] + rho * _row_onehot(b, sp, dt) for b in range(s)]
    Rc = [R_ref[0, b] + rho * _row_onehot(b, sp, dt) for b in range(c)]
    Ac = [A_ref[0, b] for b in range(s)]
    Bc = [B_ref[0, b] for b in range(c)]

    Qinv, bad_q = _gj_inv_flag(Qc, s, sp)
    Rinv, bad_r = _gj_inv_flag(Rc, c, sp)

    # Carries hold the previous knot's state; knot 0 (and each new group)
    # substitutes the trajectory-start zeros, which also keeps uninitialized
    # scratch bits out of the 0*x products below.
    Qp = [jnp.where(first, 0.0, Qprev[b]) for b in range(s)]
    Cp = [jnp.where(first, 0.0, Cprev[b]) for b in range(s)]
    bp = jnp.where(first, 0.0, bprev[...])
    qp = jnp.where(first, 0.0, qprev[...])

    # Condensation row j (assemble.condense): interval arrays are pre-shifted
    # (slot j holds A_{j-1} etc., zeros at j=0), so the j=0 row needs no
    # special case — phi, BR, and the interval gamma terms vanish there.
    phi = _mat_mat(Ac, Qp, s)                       # phi_j = A_{j-1} Qinv_{j-1}
    BR = _mat_mat(Bc, Rinv, c)                      # B_{j-1} Rinv_{j-1}
    th_int = [
        a + b
        for a, b in zip(_mat_matT(phi, Ac, s, s), _mat_matT(BR, Bc, s, c))
    ]
    theta = [th_int[b] + Qinv[b] for b in range(s)]
    gamma = (_mat_vec(phi, qp, s) + _mat_vec(BR, rv, c)
             + _mat_vec(Qinv, qv, s) - cv)

    # Block-Thomas elimination against the carried row (U_{j-1} = phi_j^T).
    M = _mat_mat(phi, Cp, s)
    MphiT = _mat_matT(M, phi, s, s)
    Dhat = [theta[b] - MphiT[b] for b in range(s)]
    bhat = gamma - _mat_vec(M, bp, s)
    Cinv, bad_d = _gj_inv_flag(Dhat, s, sp)
    # Singular live-lane input (zero pivot clamped in Q/R/Dhat inversion,
    # _gj_inv_flag): poison this problem's rhs with +inf — lanes are whole
    # problems here and every op is lane-local, so the inf/NaN reaches ONLY
    # this problem's lam/dz/eta, and residual_converged reports False
    # exactly like the XLA path's NaN propagation (the clamp would otherwise
    # solve a silently-regularized system and report it converged).
    bhat = bhat + jnp.where(bad_q + bad_r + bad_d > 0,
                            jnp.asarray(jnp.inf, dt), 0.0)

    for b in range(s):
        Cinv_out[0, b] = Cinv[b]
        Qinv_out[0, b] = Qinv[b]
        phi_out[0, b] = phi[b]
        th_out[0, b] = theta[b]
        Qprev[b] = Qinv[b]
        Cprev[b] = Cinv[b]
    for b in range(c):
        Rinv_out[0, b] = Rinv[b]
    bhat_out[0] = bhat
    gam_out[0] = gamma
    bprev[...] = bhat
    qprev[...] = qv


def _fwd_call(rho, Qb, Rb, Ab, Bb, qb, rb, cb, *,
              s, c, sp, K, Lb, n_groups, flops_scale, interpret):
    dt = qb.dtype

    def mat_in(ncols):
        return pl.BlockSpec((1, ncols, sp, Lb),
                            lambda gi, t: (gi * K + t, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    vec = pl.BlockSpec((1, sp, Lb), lambda gi, t: (gi * K + t, 0, 0),
                       memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    def out_mat(ncols):
        return jax.ShapeDtypeStruct((n_groups * K, ncols, sp, Lb), dt)

    out_vec = jax.ShapeDtypeStruct((n_groups * K, sp, Lb), dt)

    cost = pl.CostEstimate(
        flops=int(flops_scale * s * s * (16 * s + 30)),
        bytes_accessed=int((Qb.size + Ab.size + Rb.size + Bb.size) * 4 * 2),
        transcendentals=0,
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, s=s, c=c, sp=sp),
        grid=(n_groups, K),
        out_shape=(out_mat(s), out_vec, out_mat(s), out_mat(c),
                   out_mat(s), out_mat(s), out_vec),
        in_specs=[smem, mat_in(s), mat_in(c), mat_in(s), mat_in(c),
                  vec, vec, vec],
        out_specs=(mat_in(s), vec, mat_in(s), mat_in(c),
                   mat_in(s), mat_in(s), vec),
        scratch_shapes=[
            pltpu.VMEM((s, sp, Lb), dt), pltpu.VMEM((s, sp, Lb), dt),
            pltpu.VMEM((sp, Lb), dt), pltpu.VMEM((sp, Lb), dt),
        ],
        cost_estimate=cost,
        interpret=interpret,
    )(jnp.asarray(rho, dt).reshape(1), Qb, Rb, Ab, Bb, qb, rb, cb)


# --------------------------------------------------------------------------
# Reverse: back-substitution + dz recovery + true residual, knots K-1..0.


def _rev_kernel(
    Cinv_ref, bhat_ref, Qinv_ref, Rinv_ref, phi_ref, th_ref, gam_ref,
    q_ref, A_ref, B_ref, r_ref,
    lam_out, dzx_out, dzu_out, eta_out, gnorm_out,
    xc, phic, partc, atlc,
    *, s: int, c: int, sp: int, K: int,
):
    dt = q_ref.dtype
    t = pl.program_id(1)
    first = t == 0
    last = t == K - 1

    x_next = jnp.where(first, 0.0, xc[...])
    phi_next = [jnp.where(first, 0.0, phic[b]) for b in range(s)]
    part_next = jnp.where(first, 0.0, partc[...])
    atl = jnp.where(first, 0.0, atlc[...])

    Cinv = [Cinv_ref[0, b] for b in range(s)]
    phi_j = [phi_ref[0, b] for b in range(s)]
    theta = [th_ref[0, b] for b in range(s)]
    Qinv = [Qinv_ref[0, b] for b in range(s)]
    Rinv = [Rinv_ref[0, b] for b in range(c)]
    Ac = [A_ref[0, b] for b in range(s)]
    Bc = [B_ref[0, b] for b in range(c)]
    bhat = bhat_ref[0]
    gamma = gam_ref[0]
    qv = q_ref[0]
    rv = r_ref[0]

    # Back-substitution: x_j = Cinv_j (bhat_j - phi_{j+1}^T x_{j+1}).
    u_term = _matT_vec(phi_next, x_next, s, sp)
    x = _mat_vec(Cinv, bhat - u_term, s)

    # True residual: row j+1 completes now (it needed x_j); row j's partial
    # (everything except its left-neighbor term) carries to the next step.
    res_next = part_next - _mat_vec(phi_next, x, s)
    part_j = gamma - _mat_vec(theta, x, s) - u_term

    eta_add = jnp.sum(res_next * res_next, axis=0, keepdims=True)
    eta_add = eta_add + jnp.where(
        last, jnp.sum(part_j * part_j, axis=0, keepdims=True), 0.0)
    gnorm_add = jnp.sum(gamma * gamma, axis=0, keepdims=True)

    @pl.when(first)
    def _():
        eta_out[0] = jnp.zeros_like(eta_out[0])
        gnorm_out[0] = jnp.zeros_like(gnorm_out[0])

    eta_out[0] = eta_out[0] + jnp.broadcast_to(eta_add, eta_out.shape[1:])
    gnorm_out[0] = gnorm_out[0] + jnp.broadcast_to(gnorm_add,
                                                   gnorm_out.shape[1:])

    # Recovery (recover.recover_dz): dz_x_j needs A_j^T lam_{j+1}, computed
    # at the PREVIOUS step (where A_j = shifted slot j+1 was local) and
    # carried; dz_u_{j-1} completes here (Rinv_{j-1}, B_{j-1}, r_{j-1} live
    # at slot j) and writes one knot left.
    dzx = _mat_vec(Qinv, qv - x - atl, s)
    btl = _matT_vec(Bc, x, c, sp)
    dzu_prev = _mat_vec(Rinv, rv - btl, c)
    atl_next = _matT_vec(Ac, x, s, sp)

    lam_out[0] = x
    dzx_out[0] = dzx
    dzu_out[0] = dzu_prev
    xc[...] = x
    partc[...] = part_j
    atlc[...] = atl_next
    for b in range(s):
        phic[b] = phi_j[b]


def _rev_call(Cinv, bhat, Qinv, Rinv, phi, theta, gamma, qb, Ab, Bb, rb, *,
              s, c, sp, K, Lb, n_groups, flops_scale, interpret):
    dt = qb.dtype

    def mat_rev(ncols):
        return pl.BlockSpec((1, ncols, sp, Lb),
                            lambda gi, t: (gi * K + K - 1 - t, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    vec_rev = pl.BlockSpec((1, sp, Lb),
                           lambda gi, t: (gi * K + K - 1 - t, 0, 0),
                           memory_space=pltpu.VMEM)
    # dz_u_{j-1} is produced while processing knot j; (2K-2-t) % K lands the
    # no-interval step (t = K-1, knot 0) on pad slot K-1, sliced off by the
    # caller's [:K-1].
    vec_dzu = pl.BlockSpec((1, sp, Lb),
                           lambda gi, t: (gi * K + (2 * K - 2 - t) % K, 0, 0),
                           memory_space=pltpu.VMEM)
    aux = pl.BlockSpec((1, _SUBLANE, Lb), lambda gi, t: (gi, 0, 0),
                       memory_space=pltpu.VMEM)

    out_vec = jax.ShapeDtypeStruct((n_groups * K, sp, Lb), dt)
    out_aux = jax.ShapeDtypeStruct((n_groups, _SUBLANE, Lb), dt)

    cost = pl.CostEstimate(
        flops=int(flops_scale * s * s * 14),
        bytes_accessed=int((Cinv.size + phi.size + theta.size + Qinv.size)
                           * 4),
        transcendentals=0,
    )
    return pl.pallas_call(
        functools.partial(_rev_kernel, s=s, c=c, sp=sp, K=K),
        grid=(n_groups, K),
        out_shape=(out_vec, out_vec, out_vec, out_aux, out_aux),
        in_specs=[mat_rev(s), vec_rev, mat_rev(s), mat_rev(c),
                  mat_rev(s), mat_rev(s), vec_rev,
                  vec_rev, mat_rev(s), mat_rev(c), vec_rev],
        out_specs=(vec_rev, vec_rev, vec_dzu, aux, aux),
        scratch_shapes=[
            pltpu.VMEM((sp, Lb), dt), pltpu.VMEM((s, sp, Lb), dt),
            pltpu.VMEM((sp, Lb), dt), pltpu.VMEM((sp, Lb), dt),
        ],
        cost_estimate=cost,
        interpret=interpret,
    )(Cinv, bhat, Qinv, Rinv, phi, theta, gamma, qb, Ab, Bb, rb)


# --------------------------------------------------------------------------


def _call_thomas(rho, Qb, Rb, Ab, Bb, qb, rb, cb, *,
                 s, c, sp, K, Lb, n_groups, flops_scale, interpret):
    """Forward + reverse kernels on PRE-PACKED arrays (knot-major flat
    (n_groups*K, ...) batch-in-lanes layout, interval arrays pre-shifted —
    _pack_mat_bt/_pack_vec_bt/_shift1).  The seam the packed serving surface
    (gato_tpu.packed, tier='thomas') calls so a stored pack skips the
    relayout; returns (lam_p, dzx_p, dzu_p, eta, gnorm) in packed layout.

    Multi-group plans run ONE fwd+rev call pair PER GROUP instead of one
    (n_groups, K) grid: measured on v5e (B=512, 2 x 256-lane groups) the
    multi-group grid costs ~40% more than the same groups as separate
    call pairs (0.63 vs 0.44 ms/batch, chain-differenced; cause
    unattributed — the work per group is identical, so it sits in how the
    pipeline schedules the factor-stack streams across the group
    boundary).  Per-group results are bitwise identical either way (same
    kernel body, same per-group inputs); the HBM factor budget (fits())
    caps n_groups long before the Python loop hurts compile time."""
    if n_groups > 1:
        outs = [
            _call_thomas(
                rho, *(a[gi * K:(gi + 1) * K] for a in
                       (Qb, Rb, Ab, Bb, qb, rb, cb)),
                s=s, c=c, sp=sp, K=K, Lb=Lb, n_groups=1,
                flops_scale=max(1, flops_scale // n_groups),
                interpret=interpret)
            for gi in range(n_groups)
        ]
        return tuple(jnp.concatenate([o[i] for o in outs], axis=0)
                     for i in range(5))
    Cinv, bhat, Qinv, Rinv, phi, theta, gamma = _fwd_call(
        rho, Qb, Rb, Ab, Bb, qb, rb, cb,
        s=s, c=c, sp=sp, K=K, Lb=Lb, n_groups=n_groups,
        flops_scale=flops_scale, interpret=interpret,
    )
    return _rev_call(
        Cinv, bhat, Qinv, Rinv, phi, theta, gamma, qb, Ab, Bb, rb,
        s=s, c=c, sp=sp, K=K, Lb=Lb, n_groups=n_groups,
        flops_scale=flops_scale, interpret=interpret,
    )


def _per_problem_bt(x, *, B: int, Lb: int, n_groups: int):
    """(n_groups, sublanes, Lb) aux output -> (B,) per-problem values (one
    problem per lane — row 0 holds the reduction, pad lanes sliced off)."""
    return x[:, 0, :].reshape(n_groups * Lb)[:B]


def solve_direct_thomas_batched(
    Q, R, A, B, q, r, c, *,
    rho=0.0, interpret: bool = False,
):
    """Whole batched DIRECT solve (condense + block-Thomas + recover) in
    batch-in-lanes Pallas kernels.

    Same contract as direct_fused.solve_direct_fused_batched: args follow
    formats.KKTBlocks with a leading batch axis; returns (PCGResult with
    batch axis — iters = 0, eta = squared true residual, converged derived
    from it —, dz_x (B,K,s), dz_u (B,K-1,c))."""
    Bn, K, s, _ = Q.shape
    cdim = R.shape[-1]
    sp, Lb, n_groups = plan_packing(Bn, s, cdim)
    interpret = interpret or jax.default_backend() != "tpu"

    if n_groups > 1:
        # Split multi-group batches at the PUBLIC surface (one recursive
        # single-group solve per Lb-problem slice, results concatenated):
        # each group's pack then fuses into its own kernel stream.
        # Measured on v5e at B=512 this is the fastest of the three
        # arrangements (1.02 us/solve vs 1.06 for pack-then-slice per-group
        # calls and 1.91 for the round-3 fill-first multi-group grid), and
        # it makes wide-fleet per-solve cost FLAT: ~1.02 us/solve at both
        # B=512 and B=1024; results are bitwise identical (same kernel
        # body, same per-group inputs).
        parts = [
            solve_direct_thomas_batched(
                *(a[gi * Lb:(gi + 1) * Lb] for a in (Q, R, A, B, q, r, c)),
                rho=rho, interpret=interpret)
            for gi in range(n_groups)
        ]
        res = PCGResult(
            lam=jnp.concatenate([p[0].lam for p in parts]),
            iters=jnp.concatenate([p[0].iters for p in parts]),
            converged=jnp.concatenate([p[0].converged for p in parts]),
            eta=jnp.concatenate([p[0].eta for p in parts]),
        )
        return (res, jnp.concatenate([p[1] for p in parts]),
                jnp.concatenate([p[2] for p in parts]))

    pm = functools.partial(_pack_mat_bt, sp=sp, Lb=Lb, n_groups=n_groups)
    pv = functools.partial(_pack_vec_bt, sp=sp, Lb=Lb, n_groups=n_groups)
    Qb = pm(Q)
    Ab, Bb, Rb = pm(_shift1(A)), pm(_shift1(B)), pm(_shift1(R))
    qb, cb, rb = pv(q), pv(c), pv(_shift1(r))

    lam_p, dzx_p, dzu_p, eta, gnorm = _call_thomas(
        rho, Qb, Rb, Ab, Bb, qb, rb, cb,
        s=s, c=cdim, sp=sp, K=K, Lb=Lb, n_groups=n_groups,
        flops_scale=Bn * K, interpret=interpret,
    )

    up = functools.partial(_unpack_vec_bt, B=Bn, K=K, Lb=Lb,
                           n_groups=n_groups)
    lam = up(lam_p, n=s)
    dz_x = up(dzx_p, n=s)
    dz_u = up(dzu_p, n=cdim)[:, : K - 1, :]

    per_problem = functools.partial(_per_problem_bt, B=Bn, Lb=Lb,
                                    n_groups=n_groups)

    from ..direct import residual_converged

    eta_b = per_problem(eta)
    res = PCGResult(
        lam=lam,
        iters=jnp.zeros((Bn,), jnp.int32),
        converged=residual_converged(eta_b, per_problem(gnorm)),
        eta=eta_b,
    )
    return res, dz_x, dz_u
