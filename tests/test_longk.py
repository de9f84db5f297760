"""Long-horizon whole-solve tier (kernels/longk.py): chunked condensation
with the sequential-grid carry, resident-XL and streamed-loop PCG, packed
recovery — all vs the pure-path oracle with EXACT iteration parity.

Shapes are kept small and ``chunk_lanes`` is forced to 128 so several chunks
(and therefore every cross-chunk carry/halo path) are exercised at CPU
interpret-mode speed; the real-TPU shapes run through bench.py/verify."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gato_tpu import assemble, pcg as pcg_mod
from gato_tpu.problem import Preconditioner, ProblemSpec, SolverOptions
from gato_tpu.recover import recover_dz
from gato_tpu.kernels import longk
from gato_tpu.testing import random_blocks

SPEC = ProblemSpec(3, 2, 200)
RHO = 1e-3


def _arrs(spec, seed):
    return [jnp.asarray(np.asarray(a), jnp.float32)
            for a in random_blocks(spec, seed=seed)]


@pytest.mark.parametrize("tier", ["fused_xl", "xl", "stream"])
def test_tier_parity_vs_oracle(tier):
    """All three PCG tiers: iteration counts EXACT vs pcg.pcg, solution and
    recovered dz to f32 round-off."""
    Q, R, A, B, q, r, cc = _arrs(SPEC, seed=7)
    sys = assemble.condense(Q, R, A, B, q, r, cc, RHO)
    ref = pcg_mod.pcg(sys.S, sys.Pinv, sys.gamma, exit_tol=1e-8,
                      max_iters=300)
    dzx_ref, dzu_ref = recover_dz(sys.Qinv, sys.Rinv, A, B, q, r, ref.lam)

    res, dzx, dzu = longk.solve_longk(
        Q, R, A, B, q, r, cc, rho=RHO, exit_tol=1e-8, max_iters=300,
        force_tier=tier, chunk_lanes=128,
    )
    assert int(res.iters) == int(ref.iters)
    assert bool(res.converged)
    scale = float(jnp.max(jnp.abs(ref.lam)))
    assert float(jnp.max(jnp.abs(res.lam - ref.lam))) / scale < 5e-4
    sx = float(jnp.max(jnp.abs(dzx_ref))) or 1.0
    assert float(jnp.max(jnp.abs(dzx - dzx_ref))) / sx < 5e-4
    su = float(jnp.max(jnp.abs(dzu_ref))) or 1.0
    assert float(jnp.max(jnp.abs(dzu - dzu_ref))) / su < 5e-4


@pytest.mark.parametrize("kind,name", [
    (Preconditioner.BLOCK_JACOBI, "block_jacobi"),
    (Preconditioner.JACOBI, "jacobi"),
])
def test_preconditioner_parity(kind, name):
    Q, R, A, B, q, r, cc = _arrs(SPEC, seed=9)
    sys = assemble.condense(Q, R, A, B, q, r, cc, RHO, kind)
    ref = pcg_mod.pcg(sys.S, sys.Pinv, sys.gamma, exit_tol=1e-8,
                      max_iters=500)
    res, _, _ = longk.solve_longk(
        Q, R, A, B, q, r, cc, rho=RHO, exit_tol=1e-8, max_iters=500,
        preconditioner=name, chunk_lanes=128,
    )
    assert int(res.iters) == int(ref.iters)
    scale = float(jnp.max(jnp.abs(ref.lam)))
    assert float(jnp.max(jnp.abs(res.lam - ref.lam))) / scale < 1e-3


# slow tier: each combo factor (poly parity, warm start, per-tier oracle
# parity) has its own default-tier test; this combined sweep is the
# belt-and-braces pass.
@pytest.mark.parametrize("tier", [
    pytest.param("stream", marks=pytest.mark.slow),
    pytest.param("fused_xl", marks=pytest.mark.slow)])
def test_batched_warm_start_poly(tier):
    """Ragged batch + warm start + poly_degree=2 through the streamed-loop
    and single-kernel tiers: per-problem iteration counts must match the
    vmapped oracle."""
    pro = [random_blocks(SPEC, seed=30 + i) for i in range(3)]
    ab = [jnp.asarray(np.stack([np.asarray(p[f]) for p in pro]), jnp.float32)
          for f in range(7)]
    K, s = SPEC.knot_points, SPEC.state_size
    lam0 = jnp.asarray(
        np.random.default_rng(0).normal(size=(3, K, s)) * 0.1, jnp.float32)
    sysb = jax.vmap(
        lambda *xs: assemble.condense(*xs, RHO,
                                      Preconditioner.SYMMETRIC_STAIR)
    )(*ab)
    refb = jax.vmap(
        lambda S, P, g0, l0: pcg_mod.pcg(S, P, g0, l0, exit_tol=1e-8,
                                         max_iters=500, poly_degree=2)
    )(sysb.S, sysb.Pinv, sysb.gamma, lam0)
    resb, _, _ = longk.solve_longk_batched(
        *ab, lam0, rho=RHO, exit_tol=1e-8, max_iters=500, poly_degree=2,
        force_tier=tier, chunk_lanes=128,
    )
    assert [int(x) for x in resb.iters] == [int(x) for x in refb.iters]
    scale = float(jnp.max(jnp.abs(refb.lam)))
    assert float(jnp.max(jnp.abs(resb.lam - refb.lam))) / scale < 1e-3


def test_condensed_operators_match_assemble():
    """The chunked condense kernel (carry + P_right-by-symmetry shift) must
    reproduce assemble.condense's S and Pinv blockwise — this pins the
    cross-chunk carry and the stair's next-neighbor reconstruction directly,
    not just through PCG behavior."""
    import functools

    from gato_tpu.kernels.fused_solve import _pack_mat, _pack_vec

    spec = ProblemSpec(2, 2, 160)
    Q, R, A, B, q, r, cc = _arrs(spec, seed=3)
    s, cdim, K = 2, 2, 160
    sys = assemble.condense(Q, R, A, B, q, r, cc, RHO,
                            Preconditioner.SYMMETRIC_STAIR)

    sp, Kp, Lc, n_chunks = 8, 256, 128, 2
    pm = functools.partial(_pack_mat, K_sub=Kp, g=1, L=Kp, n_groups=1, sp=sp)
    pv = functools.partial(_pack_vec, K_sub=Kp, g=1, L=Kp, n_groups=1, sp=sp)
    Sb, Pb, gamb, _, _ = longk._condense_call(
        RHO, pm(Q[None]), pm(R[None]), pm(A[None]), pm(B[None]),
        pv(q[None]), pv(r[None]), pv(cc[None]),
        s=s, c=cdim, sp=sp, Kp=Kp, Lc=Lc, n_chunks=n_chunks,
        precond="symmetric_stair", interpret=True,
    )
    Pb = Pb.at[:, 2].set(longk._shift_left_lane(Pb[:, 2]))

    def unpack_op(Mb):
        # (1, 3, s, sp, Kp) -> (K, 3, s, s): slot, col b, row a, lane k.
        M = np.asarray(Mb)[0][:, :, :s, :K]          # (3, s_col, s_row, K)
        return np.transpose(M, (3, 0, 2, 1))

    np.testing.assert_allclose(unpack_op(Sb), np.asarray(sys.S),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(unpack_op(Pb), np.asarray(sys.Pinv),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gamb)[0][:s, :K].T,
                               np.asarray(sys.gamma), rtol=1e-5, atol=1e-5)


def test_fits_tiers_are_ordered():
    """Budget sanity at IIWA width: the fused kernel tops out below XL
    residency, XL below the streamed loop, and everything reports False
    before the XLA fallback regime."""
    from gato_tpu.kernels import fused_solve

    s, c = 14, 7
    assert fused_solve.fits_vmem(500, s, c)
    assert longk.fits_fused_xl(1024, s, c)   # single-kernel condense+PCG
    assert not longk.fits_fused_xl(2048, s, c)
    assert longk.fits_xl(1024, s, c)
    assert longk.fits_vmem(1024, s, c)
    assert longk.fits_xl(2048, s, c)   # 13 MB budget: validated on-device
    assert not longk.fits_xl(4096, s, c)
    assert longk.fits_vmem(4096, s, c)
    assert not longk.fits_vmem(65536, s, c)


def test_direct_tier_parity_vs_oracle():
    """The long-horizon DIRECT tier (chunked condense -> whole block cyclic
    reduction in one kernel -> packed recovery) must reproduce the Thomas
    oracle to f32 round-off across several condense chunks, with the exact-
    solve contract (iters=0, converged, tiny squared true residual)."""
    from gato_tpu import direct

    Q, R, A, B, q, r, cc = _arrs(SPEC, seed=7)
    sys = assemble.condense(Q, R, A, B, q, r, cc, RHO)
    lam_ref = direct.btd_solve(sys.S, sys.gamma)
    dzx_ref, dzu_ref = recover_dz(sys.Qinv, sys.Rinv, A, B, q, r, lam_ref)

    res, dzx, dzu = longk.solve_direct_longk(
        Q, R, A, B, q, r, cc, rho=RHO, chunk_lanes=128)
    assert int(res.iters) == 0 and bool(res.converged)
    assert float(res.eta) < 1e-6
    scale = float(jnp.max(jnp.abs(lam_ref)))
    assert float(jnp.max(jnp.abs(res.lam - lam_ref))) / scale < 5e-4
    sx = float(jnp.max(jnp.abs(dzx_ref))) or 1.0
    assert float(jnp.max(jnp.abs(dzx - dzx_ref))) / sx < 5e-4
    su = float(jnp.max(jnp.abs(dzu_ref))) or 1.0
    assert float(jnp.max(jnp.abs(dzu - dzu_ref))) / su < 5e-4


def test_direct_tier_batched_parity():
    """Batched direct tier vs the vmapped Thomas oracle (one grid program
    per problem; no lane packing across problems in this tier)."""
    from gato_tpu import direct

    pro = [random_blocks(SPEC, seed=40 + i) for i in range(3)]
    ab = [jnp.asarray(np.stack([np.asarray(p[f]) for p in pro]), jnp.float32)
          for f in range(7)]
    sysb = jax.vmap(lambda *xs: assemble.condense(*xs, RHO, None))(*ab)
    lam_ref = direct.btd_solve(sysb.S, sysb.gamma)
    resb, _, _ = longk.solve_direct_longk_batched(
        *ab, rho=RHO, chunk_lanes=128)
    assert [int(x) for x in resb.iters] == [0, 0, 0]
    assert bool(jnp.all(resb.converged))
    scale = float(jnp.max(jnp.abs(lam_ref)))
    assert float(jnp.max(jnp.abs(resb.lam - lam_ref))) / scale < 5e-4


def test_direct_hybrid_tier_parity_vs_oracle():
    """The hybrid direct tier (compacting XLA peels + the one-kernel CR on
    the reduced system — the round-5 unlimited-K auto tier) must match the
    Thomas oracle; the budget is shrunk so the peel schedule engages at an
    interpret-affordable shape (two peels: 512 -> 256 -> 128 lanes), and a
    singular input through the PEELED levels must flag unconverged."""
    from gato_tpu import direct
    from gato_tpu.testing import random_blocks

    spec = ProblemSpec(3, 2, 400)
    old = longk._DIRECT_XL_BUDGET_BYTES
    longk._DIRECT_XL_BUDGET_BYTES = 128 * 4 * 8 * (10 * 3 + 6)
    try:
        assert longk._hybrid_widths(512, 3, 8) == [512, 256, 128]
        Q, R, A, B, q, r, cc = _arrs(spec, seed=5)
        sys = assemble.condense(Q, R, A, B, q, r, cc, RHO)
        lam_ref = direct.btd_solve(sys.S, sys.gamma)

        res, dzx, dzu = longk.solve_direct_longk(
            Q, R, A, B, q, r, cc, rho=RHO, chunk_lanes=128,
            force_tier="hybrid")
        assert int(res.iters) == 0 and bool(res.converged)
        scale = float(jnp.max(jnp.abs(lam_ref)))
        assert float(jnp.max(jnp.abs(res.lam - lam_ref))) / scale < 5e-4

        # Singular live block at rho=0, eliminated INSIDE a peeled level:
        # the peel's clamp flag must poison lam -> residual unconverged.
        Qn = np.asarray(Q).copy()
        Qn[7, :, 0] = 0.0
        Qn[7, 0, :] = 0.0
        res_s, _, _ = longk.solve_direct_longk(
            jnp.asarray(Qn), R, A, B, q, r, cc, rho=0.0,
            chunk_lanes=128, force_tier="hybrid")
        assert not bool(res_s.converged)
    finally:
        longk._DIRECT_XL_BUDGET_BYTES = old


def test_peel_kernel_matches_xla_reference(monkeypatch):
    """The Mosaic peel kernel (interpret here) must reproduce the XLA
    reference peel — reduced system, back-substitution saves, and flags —
    to f32 round-off; and the hybrid tier must produce the same solution
    through either peel path (_PEEL_USE_KERNEL is OFF by default pending
    real-hardware compile validation; this pins the gated path so the flip
    is a one-line change)."""
    import functools

    from gato_tpu import direct

    spec = ProblemSpec(3, 2, 400)
    Q, R, A, B, q, r, cc = _arrs(spec, seed=5)
    sp, Kp, Lc, n_chunks, _, _ = longk._plan_dispatch(400, 3, 2, "xl", 128)
    pm = functools.partial(longk._pack_mat, K_sub=Kp, g=1, L=Kp,
                           n_groups=1, sp=sp)
    pv = functools.partial(longk._pack_vec, K_sub=Kp, g=1, L=Kp,
                           n_groups=1, sp=sp)
    Sb, _Pb, gamb, _Qi, _Ri = longk._condense_call(
        jnp.float32(RHO), pm(Q[None]), pm(R[None]), pm(A[None]), pm(B[None]),
        pv(q[None]), pv(r[None]), pv(cc[None]),
        s=3, c=2, sp=sp, Kp=Kp, Lc=Lc, n_chunks=n_chunks,
        precond="jacobi", interpret=True)

    widths = (512, 256, 128)
    Sk, bk, sav_k, bad_k = longk._cr_peel_to_fit_batched(
        Sb, gamb, widths, s=3, sp=sp, interpret=True)
    Sx, bx, sav_x, bad_x = jax.vmap(functools.partial(
        longk._cr_peel_to_fit, widths=widths, s=3, sp=sp))(Sb, gamb)
    scale = float(jnp.max(jnp.abs(Sx)))
    assert float(jnp.max(jnp.abs(Sk - Sx))) / scale < 1e-5
    assert float(jnp.max(jnp.abs(bk - bx))) / (float(jnp.max(jnp.abs(bx)))
                                               or 1.0) < 1e-5
    for a, b_ in zip(jax.tree_util.tree_leaves(sav_k),
                     jax.tree_util.tree_leaves(sav_x)):
        sc = float(jnp.max(jnp.abs(b_))) or 1.0
        assert float(jnp.max(jnp.abs(a - b_))) / sc < 1e-5
    np.testing.assert_array_equal(np.asarray(bad_k > 0),
                                  np.asarray(bad_x > 0))

    # End-to-end through the gated kernel path.
    old = longk._DIRECT_XL_BUDGET_BYTES
    monkeypatch.setattr(longk, "_PEEL_USE_KERNEL", True)
    longk._DIRECT_XL_BUDGET_BYTES = 128 * 4 * 8 * (10 * 3 + 6)
    try:
        sys = assemble.condense(Q, R, A, B, q, r, cc, RHO)
        lam_ref = direct.btd_solve(sys.S, sys.gamma)
        res, _, _ = longk.solve_direct_longk(
            Q, R, A, B, q, r, cc, rho=RHO, chunk_lanes=128,
            force_tier="hybrid")
        assert bool(res.converged)
        sc = float(jnp.max(jnp.abs(lam_ref)))
        assert float(jnp.max(jnp.abs(res.lam - lam_ref))) / sc < 5e-4
    finally:
        longk._DIRECT_XL_BUDGET_BYTES = old


def test_direct_xla_tier_parity_vs_oracle():
    """The unlimited-K FORCEABLE direct tier (lane-packed XLA cyclic
    reduction, _cr_solve_xla) must match the Thomas oracle like the kernel
    tier does; forced here at a small shape (the auto ladder now picks
    'hybrid' beyond fits_direct_xl — 'xla' stays as an explicit tier)."""
    from gato_tpu import direct

    assert longk.direct_tier(4096, 14, 7) == "hybrid"
    assert longk.direct_tier(200, 3, 2) == "xl"

    with pytest.raises(ValueError, match="force_tier"):
        longk.solve_direct_longk(
            *_arrs(SPEC, seed=13), rho=RHO, force_tier="bogus")

    Q, R, A, B, q, r, cc = _arrs(SPEC, seed=13)
    sys = assemble.condense(Q, R, A, B, q, r, cc, RHO)
    lam_ref = direct.btd_solve(sys.S, sys.gamma)
    dzx_ref, dzu_ref = recover_dz(sys.Qinv, sys.Rinv, A, B, q, r, lam_ref)

    res, dzx, dzu = longk.solve_direct_longk(
        Q, R, A, B, q, r, cc, rho=RHO, chunk_lanes=128, force_tier="xla")
    assert int(res.iters) == 0 and bool(res.converged)
    assert float(res.eta) < 1e-6
    scale = float(jnp.max(jnp.abs(lam_ref)))
    assert float(jnp.max(jnp.abs(res.lam - lam_ref))) / scale < 5e-4
    sx = float(jnp.max(jnp.abs(dzx_ref))) or 1.0
    assert float(jnp.max(jnp.abs(dzx - dzx_ref))) / sx < 5e-4
    su = float(jnp.max(jnp.abs(dzu_ref))) or 1.0
    assert float(jnp.max(jnp.abs(dzu - dzu_ref))) / su < 5e-4


def test_direct_tier_boundaries():
    """Tier ownership at IIWA width: should_dispatch_direct is True for
    every K past the fused cyclic-reduction kernel's packing budget — the
    one-kernel 'xl' tier within direct-XL residency, the compacting-peel
    'hybrid' tier beyond (round 5: unlimited K)."""
    from gato_tpu.kernels import direct_fused

    s, c = 14, 7
    assert direct_fused.fits_vmem(50, s, c)
    assert not longk.should_dispatch_direct(50, s, c)
    assert not direct_fused.fits_vmem(1024, s, c)
    assert longk.fits_direct_xl(1024, s, c)
    assert longk.should_dispatch_direct(1024, s, c)
    assert longk.direct_tier(1024, s, c) == "xl"
    assert not longk.fits_direct_xl(4096, s, c)
    assert longk.should_dispatch_direct(4096, s, c)
    assert longk.direct_tier(4096, s, c) == "hybrid"
    # The hybrid peel schedule at IIWA width: one peel for K=2048, two for
    # K=4096 (13 MiB scoped-vmem budget -> Kp <= 1408).
    assert longk._hybrid_widths(2048, s, 16) == [2048, 1024]
    assert longk._hybrid_widths(4096, s, 16) == [4096, 2048, 1024]


def test_direct_tier_converged_is_residual_derived():
    """A singular condensed system through the longk direct tier must report
    converged=False (same construction as
    test_direct.test_direct_converged_is_residual_derived)."""
    from gato_tpu.formats import KKTBlocks
    from gato_tpu.problem import SolverOptions
    from gato_tpu.solver import solve

    s, c, K = 2, 2, 3
    spec = ProblemSpec(s, c, K)
    eye = np.eye(s, dtype=np.float32)
    blocks = KKTBlocks(
        Q=np.stack([eye, eye, eye]),
        R=np.stack([np.eye(c, dtype=np.float32),
                    -np.eye(c, dtype=np.float32)]),
        A=np.stack([eye, eye]),
        B=np.stack([np.zeros((s, c), np.float32), eye[:, :c]]),
        q=np.arange(K * s, dtype=np.float32).reshape(K, s) + 1.0,
        r=np.ones((K - 1, c), np.float32),
        c=np.ones((K, s), np.float32),
    )
    opts = SolverOptions(rho=0.0, method="direct")
    res = solve(spec, blocks, opts, pcg_backend="pallas")
    assert not bool(res.converged)

    good = blocks._replace(R=np.stack([np.eye(c, dtype=np.float32)] * 2))
    res = solve(spec, good, opts, pcg_backend="pallas")
    assert bool(res.converged)
    assert float(res.eta) < 1e-6


@pytest.mark.slow
def test_sequence_packed_carry_matches_per_step_loop():
    """solve_longk_sequence_batched (inputs packed once, lambda carried in
    the packed lane layout) must reproduce a per-step solve_longk_batched
    loop EXACTLY: pack/unpack are pure permutations plus zero padding, so
    the hoisted-relayout chain is the same computation, not an
    approximation.  (slow tier: T x B x K=200 interpret-mode solves; the
    fused-kernel sequence analog covers the carried-packing logic in the
    fast tier.)"""
    T, Bn = 3, 2
    pro = [random_blocks(SPEC, seed=60 + b) for b in range(Bn)]
    base = [jnp.asarray(np.stack([np.asarray(p[f]) for p in pro]),
                        jnp.float32) for f in range(7)]
    drift = jnp.asarray(1.0 + 0.02 * np.arange(T), jnp.float32)
    seq = [a[None] * drift.reshape((T,) + (1,) * a.ndim) for a in base]
    K, s = SPEC.knot_points, SPEC.state_size
    lam0 = jnp.zeros((Bn, K, s), jnp.float32)
    rhos = jnp.full((T,), RHO, jnp.float32)

    lam, dz_x, dz_u, iters, conv, eta = longk.solve_longk_sequence_batched(
        *seq, lam0, rhos, 1e-8, 300)

    carry = lam0
    for t in range(T):
        res_t, dzx_t, dzu_t = longk.solve_longk_batched(
            *(a[t] for a in seq), carry, rho=RHO, exit_tol=1e-8,
            max_iters=300)
        carry = res_t.lam
        assert [int(x) for x in iters[t]] == [int(x) for x in res_t.iters]
        assert float(jnp.max(jnp.abs(lam[t] - res_t.lam))) == 0.0
        assert float(jnp.max(jnp.abs(dz_x[t] - dzx_t))) == 0.0
        assert float(jnp.max(jnp.abs(dz_u[t] - dzu_t))) == 0.0
    assert bool(jnp.all(conv))
