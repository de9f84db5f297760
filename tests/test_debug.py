"""Observability module: residual histories, debug solves, convergence parity."""

import numpy as np

from gato_tpu import ProblemSpec, SolverOptions
from gato_tpu.debug import solve_debug
from gato_tpu.solver import solve
from gato_tpu.testing import dense_oracle, random_blocks


def test_debug_matches_solve():
    spec = ProblemSpec(4, 2, 16)
    blocks = random_blocks(spec, seed=3)
    opts = SolverOptions(exit_tol=1e-10, max_iters=300, rho=0.01)
    dbg = solve_debug(spec, blocks, opts)
    plain = solve(spec, blocks, opts, pcg_backend="jax")
    assert int(dbg.result.iters) == int(plain.iters)
    np.testing.assert_allclose(np.asarray(dbg.result.lam),
                               np.asarray(plain.lam), rtol=1e-5, atol=1e-6)


def test_eta_history_monotone_tail_and_residual():
    spec = ProblemSpec(3, 2, 12)
    blocks = random_blocks(spec, seed=11)
    opts = SolverOptions(exit_tol=1e-10, max_iters=200, rho=0.01)
    dbg = solve_debug(spec, blocks, opts)
    hist = np.asarray(dbg.eta_history)
    assert hist.shape == (201,)
    it = int(dbg.result.iters)
    # eta at the recorded exit iteration is below tol; start is above.
    assert hist[it + 1] < 1e-10 < hist[0]
    # true residual of the returned solution is small
    assert float(dbg.final_residual_norm) < 1e-4
    # the condensed system is exposed
    assert dbg.system.S.shape == (12, 3, 3, 3)


def test_debug_oracle_consistency():
    spec = ProblemSpec(4, 2, 10)
    blocks = random_blocks(spec, seed=21)
    opts = SolverOptions(exit_tol=1e-12, max_iters=400, rho=0.02)
    dbg = solve_debug(spec, blocks, opts)
    lam_ref, _ = dense_oracle(spec, blocks, rho=0.02)
    np.testing.assert_allclose(np.asarray(dbg.result.lam).reshape(-1), lam_ref,
                               rtol=2e-3, atol=2e-3)
