"""Fused direct-solve kernel (kernels/direct_fused.py): cyclic reduction in
the lane-packed layout vs the pure-path oracle, plus solver-level dispatch.

The pure path (assemble.condense + direct.btd_solve) is the numerics oracle;
the kernel must reproduce its solution to f32 round-off on every shape —
including non-power-of-two horizons (pad-lane structural-zero induction) and
multi-problem lane packing (segment-boundary rolls)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gato_tpu import assemble, direct
from gato_tpu.kernels import direct_fused
from gato_tpu.problem import ProblemSpec, SolverOptions
from gato_tpu.recover import recover_dz
from gato_tpu.solver import solve, solve_batched
from gato_tpu.testing import random_blocks


def _arrs(spec, seed=0):
    b = random_blocks(spec, seed=seed)
    return [jnp.asarray(np.asarray(a), jnp.float32) for a in b]


@pytest.mark.parametrize(
    # (9, 2, 8) keeps the sp=16 (two-sublane-tile) layout axis that
    # (14, 7, 50) exercised, at interpret-mode-affordable cost: the IIWA
    # shape itself runs compiled in bench.py's on-device parity gate every
    # round.  The two heavy shapes are `slow`-tier (the fast tier keeps the
    # kernel-vs-oracle pair via the small shapes; sp=16 runs compiled in the
    # bench parity gate).
    "shape", [pytest.param((4, 2, 2), marks=pytest.mark.slow),
              (2, 1, 5),
              pytest.param((5, 3, 8), marks=pytest.mark.slow),
              pytest.param((9, 2, 8), marks=pytest.mark.slow)]
)
def test_matches_oracle_single(shape):
    s, c, K = shape
    spec = ProblemSpec(s, c, K)
    Q, R, A, B, q, r, cc = _arrs(spec, seed=11)
    rho = 1e-3
    sys = assemble.condense(Q, R, A, B, q, r, cc, rho, None)
    lam_ref = direct.btd_solve(sys.S, sys.gamma)
    dzx_ref, dzu_ref = recover_dz(sys.Qinv, sys.Rinv, A, B, q, r, lam_ref)

    res, dzx, dzu = direct_fused.solve_direct_fused_batched(
        Q[None], R[None], A[None], B[None], q[None], r[None], cc[None],
        rho=rho,
    )
    scale = float(jnp.max(jnp.abs(lam_ref))) or 1.0
    assert float(jnp.max(jnp.abs(res.lam[0] - lam_ref))) / scale < 5e-5
    sx = float(jnp.max(jnp.abs(dzx_ref))) or 1.0
    assert float(jnp.max(jnp.abs(dzx[0] - dzx_ref))) / sx < 5e-5
    su = float(jnp.max(jnp.abs(dzu_ref))) or 1.0
    assert float(jnp.max(jnp.abs(dzu[0] - dzu_ref))) / su < 5e-5
    assert int(res.iters[0]) == 0 and bool(res.converged[0])
    # eta is the squared TRUE residual of an exact solve: tiny.
    assert float(res.eta[0]) < 1e-6


# slow tier: segment-boundary hygiene of the lane-packed CR batch is also
# pinned (faster) by test_conditioning's B=5 batch vs the XLA path, and
# compiled on-device by bench.py's batched-direct parity gate every round.
@pytest.mark.slow
def test_matches_oracle_lane_packed_batch():
    """Multiple problems per program: segment-boundary rolls must not leak
    between problems (different seeds -> different solutions)."""
    spec = ProblemSpec(5, 3, 12)
    pro = [random_blocks(spec, seed=100 + i) for i in range(7)]
    arrs = [
        jnp.asarray(np.stack([np.asarray(p[f]) for p in pro]), jnp.float32)
        for f in range(7)
    ]
    Q, R, A, B, q, r, cc = arrs
    K_sub, g, L, n_groups, sp = direct_fused.plan_packing(7, 12, 5, 3)
    assert g > 1, "this test must exercise multi-problem packing"
    sys = jax.vmap(lambda *xs: assemble.condense(*xs, 1e-2, None))(*arrs)
    lam_ref = direct.btd_solve(sys.S, sys.gamma)
    res, _, _ = direct_fused.solve_direct_fused_batched(*arrs, rho=1e-2)
    scale = float(jnp.max(jnp.abs(lam_ref)))
    assert float(jnp.max(jnp.abs(res.lam - lam_ref))) / scale < 5e-5


@pytest.mark.slow
def test_solver_dispatch_fused_direct():
    """solve/solve_batched accept pcg_backend='fused' with method='direct'
    and agree with the 'jax' direct path.

    slow tier: the fast tier keeps fused-direct solver-level numerics via
    test_packed.test_packed_matches_fused_batched[direct] and the routing
    logic via test_backend_select's monkeypatched dispatch tests; the
    genuine kernel runs compiled in bench.py's on-device parity gate."""
    spec = ProblemSpec(4, 2, 10)
    blocks = random_blocks(spec, seed=3)
    opts = SolverOptions(rho=1e-2, method="direct")
    ref = solve(spec, blocks, opts, pcg_backend="jax")
    got = solve(spec, blocks, opts, pcg_backend="fused")
    np.testing.assert_allclose(np.asarray(got.lam), np.asarray(ref.lam),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.dz_x), np.asarray(ref.dz_x),
                               rtol=1e-4, atol=1e-5)
    assert int(got.iters) == 0 and bool(got.converged)

    pro = [random_blocks(spec, seed=20 + i) for i in range(3)]
    batch = type(blocks)(
        *(np.stack([np.asarray(p[f]) for p in pro]) for f in range(7))
    )
    refb = solve_batched(spec, batch, opts, pcg_backend="jax")
    gotb = solve_batched(spec, batch, opts, pcg_backend="fused")
    np.testing.assert_allclose(np.asarray(gotb.lam), np.asarray(refb.lam),
                               rtol=1e-4, atol=1e-5)
    assert [int(i) for i in gotb.iters] == [0, 0, 0]


@pytest.mark.slow
def test_direct_input_paths_identical():
    """The manual-DMA and pipeline-BlockSpec input paths wrap the same
    kernel body — forcing each on a multi-problem packed config (where DMA
    is the auto choice) must give bit-identical outputs.

    slow tier: both input paths are exercised individually by the fast
    oracle tests (auto picks DMA on the packed batch, BlockSpec on the
    single); this cross-check is structural, not numeric."""
    spec = ProblemSpec(5, 3, 12)
    pro = [random_blocks(spec, seed=200 + i) for i in range(7)]
    arrs = [
        jnp.asarray(np.stack([np.asarray(p[f]) for p in pro]), jnp.float32)
        for f in range(7)
    ]
    res_b, dzx_b, dzu_b = direct_fused.solve_direct_fused_batched(
        *arrs, rho=1e-2, input_dma=False)
    res_d, dzx_d, dzu_d = direct_fused.solve_direct_fused_batched(
        *arrs, rho=1e-2, input_dma=True)
    np.testing.assert_array_equal(np.asarray(res_b.lam), np.asarray(res_d.lam))
    np.testing.assert_array_equal(np.asarray(res_b.eta), np.asarray(res_d.eta))
    np.testing.assert_array_equal(np.asarray(dzx_b), np.asarray(dzx_d))
    np.testing.assert_array_equal(np.asarray(dzu_b), np.asarray(dzu_d))


def test_direct_pallas_runs_longk_tier():
    """pcg_backend='pallas' + method='direct' dispatches the long-horizon
    cyclic-reduction tier (kernels/longk.py) and agrees with the XLA path;
    the converged flag stays residual-derived through it."""
    spec = ProblemSpec(4, 2, 10)
    blocks = random_blocks(spec, seed=3)
    opts = SolverOptions(rho=1e-2, method="direct")
    ref = solve(spec, blocks, opts, pcg_backend="jax")
    got = solve(spec, blocks, opts, pcg_backend="pallas")
    np.testing.assert_allclose(np.asarray(got.lam), np.asarray(ref.lam),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.dz_x), np.asarray(ref.dz_x),
                               rtol=1e-4, atol=1e-5)
    assert int(got.iters) == 0 and bool(got.converged)


def test_sequence_direct_runs_exact_not_pcg():
    """solve_sequence(method='direct') runs the EXACT farm (T independent
    solves batched over the T axis — iters == 0, exact solutions), never
    silently PCG (test_mpc covers per-step parity in depth)."""
    from gato_tpu.formats import KKTBlocks
    from gato_tpu.mpc import solve_sequence

    spec = ProblemSpec(4, 2, 10)
    blocks = random_blocks(spec, seed=3)
    seq = KKTBlocks(*(jnp.broadcast_to(jnp.asarray(a), (3,) + a.shape)
                      for a in blocks))
    res = solve_sequence(spec, seq, SolverOptions(rho=1e-2, method="direct"))
    assert np.all(np.asarray(res.iters) == 0)
    assert bool(np.all(np.asarray(res.converged)))
    # Identical steps -> identical exact solutions (no warm-start coupling).
    np.testing.assert_allclose(np.asarray(res.lam[0]), np.asarray(res.lam[2]),
                               rtol=1e-6, atol=1e-7)


def test_plan_packing_raises_over_budget():
    with pytest.raises(ValueError, match="VMEM budget"):
        direct_fused.plan_packing(1, 4096, 14, 7)
    assert not direct_fused.fits_vmem(4096, 14, 7)
    assert direct_fused.fits_vmem(50, 14, 7)


def test_default_backend_direct_on_cpu_is_jax():
    from gato_tpu.solver import default_pcg_backend

    assert default_pcg_backend(method="direct") == "jax"


def test_fused_direct_ill_conditioned():
    """Nearly-singular Hessian blocks (tiny rho): the no-pivot CR stays
    accurate because every reduced system is SPD (Schur complements of SPD
    systems) — same justification as blocktri.block_inv, checked against the
    f64 dense oracle at f32-appropriate tolerance."""
    from gato_tpu.testing import dense_oracle

    spec = ProblemSpec(6, 3, 12)
    blocks = random_blocks(spec, seed=2)
    # Scale Q down so rho dominates conditioning.
    blocks = type(blocks)(
        Q=np.asarray(blocks.Q) * 1e-3, R=blocks.R, A=blocks.A, B=blocks.B,
        q=blocks.q, r=blocks.r, c=blocks.c,
    )
    rho = 1e-5
    res = solve(spec, blocks, SolverOptions(rho=rho, method="direct"),
                pcg_backend="fused")
    lam_ref, dz_ref = dense_oracle(spec, blocks, rho=rho)
    err = np.max(np.abs(res.lam_flat() - lam_ref)) / np.max(np.abs(lam_ref))
    assert err < 1e-3, err


@pytest.mark.slow
def test_power_of_two_segments_no_pad_lanes():
    """K equal to a power of two makes K_sub == K: NO pad lanes inside the
    segment, so every cross-segment roll lands on a REAL lane of the
    neighboring problem — correctness rests entirely on the structural-zero
    induction (L zero at row 0, U zero at the last row, per level).

    slow tier: structural edge case; the non-power-of-two induction runs
    fast via test_matches_oracle_single[(2,1,5)] and the packed batch."""
    s, c, K = 3, 2, 16
    spec = ProblemSpec(s, c, K)
    K_sub, g, L, n_groups, sp = direct_fused.plan_packing(6, K, s, c)
    assert K_sub == K and g > 1, (K_sub, g)

    pro = [random_blocks(spec, seed=60 + i) for i in range(6)]
    arrs = [
        jnp.asarray(np.stack([np.asarray(p[f]) for p in pro]), jnp.float32)
        for f in range(7)
    ]
    sys = jax.vmap(lambda *xs: assemble.condense(*xs, 1e-2, None))(*arrs)
    lam_ref = direct.btd_solve(sys.S, sys.gamma)
    res, _, _ = direct_fused.solve_direct_fused_batched(*arrs, rho=1e-2)
    scale = float(jnp.max(jnp.abs(lam_ref)))
    assert float(jnp.max(jnp.abs(res.lam - lam_ref))) / scale < 5e-5


def test_long_horizon_auto_routes_to_kernel_ladder(monkeypatch):
    """On TPU, a horizon past the direct kernel's VMEM budget auto-selects
    'pallas' — the longk direct ladder (one-kernel CR within residency,
    the round-5 hybrid compacting-peel tier at any K beyond, measured
    faster than the jax Thomas scan at narrow batch) — as does PCG at the
    same horizon (HBM-streamed tier): the check_sms-style capacity
    decisions at the solver level."""
    import jax as jax_mod

    from gato_tpu.solver import default_pcg_backend

    class _FakeTPU:
        platform = "tpu"

    monkeypatch.setattr(jax_mod, "devices", lambda *a: [_FakeTPU()])
    long_spec = ProblemSpec(14, 7, 4096)
    assert default_pcg_backend(spec=long_spec, method="direct") == "pallas"
    assert default_pcg_backend(spec=long_spec, method="pcg") == "pallas"
    # Mid-range K past the fused packing budget but within direct-XL
    # residency: the long-horizon cyclic-reduction tier owns it.
    mid_spec = ProblemSpec(14, 7, 1024)
    assert default_pcg_backend(spec=mid_spec, method="direct") == "pallas"
    short_spec = ProblemSpec(14, 7, 50)
    assert default_pcg_backend(spec=short_spec, method="direct") == "fused"
    # A wide-enough batch keeps 'fused' past the CR kernel's packing budget:
    # the batch-in-lanes Thomas tier streams its factors to HBM, so K is
    # VMEM-unbounded there (solve_batched passes batch=B; narrow batches
    # keep the longk/jax ladder above).
    from gato_tpu.kernels import thomas_batch

    wide = thomas_batch._MIN_BATCH
    assert default_pcg_backend(spec=mid_spec, method="direct",
                               batch=wide) == "fused"
    # ...until the Thomas HBM factor budget declines too (K=4096 at IIWA
    # width needs ~2.2 GB of factor stacks per 128-lane group, past the
    # 2 GB cap) — then the auto ladder falls through to the longk direct
    # ladder (round 5: the hybrid tier, not 'jax').
    assert not thomas_batch.fits(wide, 4096, 14, 7)
    assert default_pcg_backend(spec=long_spec, method="direct",
                               batch=wide) == "pallas"
    assert default_pcg_backend(spec=mid_spec, method="direct",
                               batch=wide - 1) == "pallas"
