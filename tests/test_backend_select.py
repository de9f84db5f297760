"""Backend selection/validation and the long-horizon VMEM fallback.

The reference selects its PCG kernel explicitly and exits rather than
silently degrading (check_sms, gato_utils.cuh:836-854); these tests pin the
same contract here: unknown or option-incompatible explicit backends raise,
and horizons too long for kernel residency auto-fall back to 'jax'.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gato_tpu import ProblemSpec, SolverOptions
from gato_tpu.mpc import solve_sequence
from gato_tpu.problem import Preconditioner
from gato_tpu.formats import KKTBlocks
from gato_tpu.solver import (
    VALID_PCG_BACKENDS,
    _resolve_backend,
    solve,
    solve_batched,
)
from gato_tpu.testing import random_blocks

SPEC = ProblemSpec(3, 2, 8)
OPTS = SolverOptions(rho=0.01, exit_tol=1e-8, max_iters=200)


def _blocks(seed=0):
    return random_blocks(SPEC, seed=seed)


def test_unknown_backend_raises():
    with pytest.raises(ValueError, match="unknown pcg_backend"):
        solve(SPEC, _blocks(), OPTS, pcg_backend="fast")
    with pytest.raises(ValueError, match="unknown pcg_backend"):
        solve(SPEC, _blocks(), OPTS, pcg_backend="PALLAS")


def test_unknown_backend_raises_batched():
    b = KKTBlocks(*(np.stack([np.asarray(a)] * 2) for a in _blocks()))
    with pytest.raises(ValueError, match="unknown pcg_backend"):
        solve_batched(SPEC, b, OPTS, pcg_backend="fsued")


def test_fused_requires_symmetric_stair():
    opts = SolverOptions(rho=0.01, preconditioner=Preconditioner.BLOCK_JACOBI)
    with pytest.raises(ValueError, match="SYMMETRIC_STAIR"):
        solve(SPEC, _blocks(), opts, pcg_backend="fused")


def test_direct_rejects_pcg_backends():
    opts = SolverOptions(rho=0.01, method="direct")
    with pytest.raises(ValueError, match="direct"):
        solve(SPEC, _blocks(), opts, pcg_backend="pallas")
    # None and 'jax' stay fine.
    solve(SPEC, _blocks(), opts, pcg_backend="jax")


def test_sequence_rejects_unknown_and_incompatible():
    seq = KKTBlocks(*(jnp.broadcast_to(jnp.asarray(a), (3,) + a.shape)
                      for a in _blocks()))
    with pytest.raises(ValueError, match="solve_sequence supports"):
        solve_sequence(SPEC, seq, OPTS, pcg_backend="nope")
    bj = SolverOptions(rho=0.01, preconditioner=Preconditioner.BLOCK_JACOBI)
    with pytest.raises(ValueError, match="SYMMETRIC_STAIR"):
        solve_sequence(SPEC, seq, bj, pcg_backend="fused")


def test_sequence_honors_fused():
    """Per-step fused whole-solve kernel in the scan, warm-started from the
    carry: iteration counts must match the jax path exactly."""
    seq = KKTBlocks(*(jnp.broadcast_to(jnp.asarray(a), (4,) + a.shape)
                      for a in _blocks()))
    opts = SolverOptions(rho=0.01, exit_tol=1e-8, max_iters=60)
    ref = solve_sequence(SPEC, seq, opts, pcg_backend="jax")
    got = solve_sequence(SPEC, seq, opts, pcg_backend="fused")
    np.testing.assert_array_equal(np.asarray(got.iters), np.asarray(ref.iters))
    np.testing.assert_allclose(np.asarray(got.lam), np.asarray(ref.lam),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.dz_u), np.asarray(ref.dz_u),
                               rtol=1e-4, atol=1e-4)


def test_sequence_honors_pallas():
    """Explicit 'pallas' inside the scan: exact iteration parity with 'jax'."""
    seq = KKTBlocks(*(jnp.broadcast_to(jnp.asarray(a), (3,) + a.shape)
                      for a in _blocks()))
    opts = SolverOptions(rho=0.01, exit_tol=1e-8, max_iters=60)
    ref = solve_sequence(SPEC, seq, opts, pcg_backend="jax")
    got = solve_sequence(SPEC, seq, opts, pcg_backend="pallas")
    np.testing.assert_array_equal(np.asarray(got.iters), np.asarray(ref.iters))
    np.testing.assert_allclose(np.asarray(got.lam), np.asarray(ref.lam),
                               rtol=1e-4, atol=1e-5)


def test_single_problem_fused_matches_jax():
    """pcg_backend='fused' on one problem (interpret on CPU): exact iteration
    parity and matching solutions vs the numerics oracle."""
    blocks = _blocks(seed=3)
    ref = solve(SPEC, blocks, OPTS, pcg_backend="jax")
    got = solve(SPEC, blocks, OPTS, pcg_backend="fused")
    assert int(got.iters) == int(ref.iters)
    assert bool(got.converged)
    np.testing.assert_allclose(np.asarray(got.lam), np.asarray(ref.lam),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.dz_x), np.asarray(ref.dz_x),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.dz_u), np.asarray(ref.dz_u),
                               rtol=1e-4, atol=1e-5)


def test_resolve_backend_auto_falls_back_on_long_horizon():
    """IIWA-width K=4096 exceeds the VMEM lane budget: the Pallas tiers must
    not be auto-selected (the 'jax' while_loop is the HBM-streamed fallback,
    the role of parallelPCG_fixed, gato_pcg.cuh:17-268)."""
    from gato_tpu.kernels import fused_solve, pcg_pallas

    long_spec = ProblemSpec(14, 7, 4096)
    assert not fused_solve.fits_vmem(4096, 14, 7)
    assert not pcg_pallas.fits_vmem(4096, 14)
    assert fused_solve.fits_vmem(500, 14, 7)
    assert _resolve_backend(None, OPTS, batched=False, spec=long_spec) == "jax"
    with pytest.raises(ValueError, match="VMEM"):
        fused_solve.plan_packing(1, 4096, 14, 7)
    with pytest.raises(ValueError, match="VMEM"):
        pcg_pallas.plan_packing(1, 8192, 14)


def test_long_horizon_solve_succeeds_via_fallback():
    """End-to-end auto-backend solve at a horizon past the VMEM budget."""
    spec = ProblemSpec(14, 7, 4096)
    blocks = random_blocks(spec, seed=1)
    res = solve(spec, blocks, SolverOptions(rho=0.01, exit_tol=1e-6,
                                            max_iters=500))
    assert bool(res.converged)
    assert np.all(np.isfinite(np.asarray(res.lam)))


def test_valid_backends_are_exhaustive():
    assert set(VALID_PCG_BACKENDS) == {"jax", "pallas", "fused"}
