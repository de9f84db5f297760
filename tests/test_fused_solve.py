"""Whole-solve fused kernel vs the pure path (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gato_tpu import ProblemSpec, SolverOptions
from gato_tpu.kernels import fused_solve as fs
from gato_tpu.solver import solve, solve_batched
from gato_tpu.formats import KKTBlocks
from gato_tpu.testing import dense_oracle, random_blocks


def _stack(spec, n, seed0=0):
    problems = [random_blocks(spec, seed=seed0 + i) for i in range(n)]
    return problems, KKTBlocks(*(jnp.asarray(np.stack(
        [np.asarray(p[f]) for p in problems])) for f in range(7)))


@pytest.mark.parametrize("spec", [
    ProblemSpec(2, 1, 5),
    # (3,2,10) duplicates the single-tile axis (2,1,5) already covers.
    pytest.param(ProblemSpec(3, 2, 10), marks=pytest.mark.slow),
    # sp=16 (two sublane tiles) at interpret-mode-affordable size; the IIWA
    # shape itself runs compiled in bench.py's on-device parity gate.
    pytest.param(ProblemSpec(9, 4, 24), marks=pytest.mark.slow),
])
def test_fused_solve_matches_pure_single(spec):
    problems, bb = _stack(spec, 1, seed0=7)
    opts = SolverOptions(rho=1e-3, exit_tol=1e-10, max_iters=300)
    ref = solve(spec, problems[0], opts, pcg_backend="jax")
    res, dz_x, dz_u = fs.solve_fused_batched(
        *bb, rho=1e-3, exit_tol=1e-10, max_iters=300, interpret=True)
    assert int(res.iters[0]) == int(ref.iters)
    np.testing.assert_allclose(np.asarray(res.lam[0]), np.asarray(ref.lam),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dz_x[0]), np.asarray(ref.dz_x),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dz_u[0]), np.asarray(ref.dz_u),
                               rtol=1e-4, atol=1e-4)


def test_fused_solve_batch_multi_group(monkeypatch):
    # 270 kB -> max_lanes = 140 at this shape (1920 B/lane): g = 8 problems
    # per 128-lane program, 3 ragged groups for n = 17.
    monkeypatch.setattr(fs, "_VMEM_BUDGET_BYTES", 270_000)
    spec = ProblemSpec(3, 2, 12)
    n = 17
    problems, bb = _stack(spec, n, seed0=30)
    K_sub, g, L, n_groups, sp = fs.plan_packing(n, 12, 3, 2)
    assert n_groups > 1 and n_groups * g > n  # ragged multi-group
    res, dz_x, dz_u = fs.solve_fused_batched(
        *bb, rho=1e-2, exit_tol=1e-10, max_iters=300, interpret=True)
    for i in range(n):
        ref = solve(spec, problems[i],
                    SolverOptions(rho=1e-2, exit_tol=1e-10, max_iters=300),
                    pcg_backend="jax")
        assert int(res.iters[i]) == int(ref.iters), i
        np.testing.assert_allclose(np.asarray(res.lam[i]),
                                   np.asarray(ref.lam), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(dz_u[i]),
                                   np.asarray(ref.dz_u), rtol=1e-4, atol=1e-4)


def test_fused_solve_oracle():
    spec = ProblemSpec(4, 2, 8)
    problems, bb = _stack(spec, 3, seed0=60)
    res, dz_x, dz_u = fs.solve_fused_batched(
        *bb, rho=1e-2, exit_tol=1e-12, max_iters=400, interpret=True)
    for i in range(3):
        lam_ref, _ = dense_oracle(spec, problems[i], rho=1e-2)
        np.testing.assert_allclose(np.asarray(res.lam[i]).reshape(-1),
                                   lam_ref, rtol=2e-3, atol=2e-3)


def test_fused_solve_warm_start():
    spec = ProblemSpec(3, 1, 10)
    problems, bb = _stack(spec, 2, seed0=90)
    res, _, _ = fs.solve_fused_batched(
        *bb, rho=1e-3, exit_tol=1e-8, max_iters=300, interpret=True)
    res2, _, _ = fs.solve_fused_batched(
        *bb, lam0=res.lam, rho=1e-3, exit_tol=1e-8, max_iters=300,
        interpret=True)
    assert int(np.max(np.asarray(res2.iters))) <= 1


def test_solve_batched_fused_backend(monkeypatch):
    """End-to-end solve_batched with pcg_backend='fused' (interpret on CPU)."""
    orig = fs.solve_fused_batched
    monkeypatch.setattr(
        fs, "solve_fused_batched",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}),
    )
    spec = ProblemSpec(4, 2, 12)
    problems, bb = _stack(spec, 5, seed0=120)
    res = solve_batched(spec, bb,
                        SolverOptions(rho=1e-2, exit_tol=1e-10, max_iters=300),
                        pcg_backend="fused")
    for i in range(5):
        ref = solve(spec, problems[i],
                    SolverOptions(rho=1e-2, exit_tol=1e-10, max_iters=300),
                    pcg_backend="jax")
        assert int(res.iters[i]) == int(ref.iters)
        np.testing.assert_allclose(np.asarray(res.lam[i]), np.asarray(ref.lam),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(res.dz_x[i]),
                                   np.asarray(ref.dz_x), rtol=1e-4, atol=1e-4)


def test_fused_input_paths_identical(monkeypatch):
    """The manual-DMA input path (auto when VMEM pressure exists) and the
    pipeline-BlockSpec path wrap the SAME kernel body — outputs must be
    bit-identical on a config where DMA is the auto choice (multi-group,
    ragged last group)."""
    monkeypatch.setattr(fs, "_VMEM_BUDGET_BYTES", 270_000)  # force n_groups>1
    spec = ProblemSpec(3, 2, 12)
    _, bb = _stack(spec, 17, seed0=150)
    orig = fs._call_fused
    outs = {}
    for dma in (False, True):
        monkeypatch.setattr(
            fs, "_call_fused",
            lambda *a, _dma=dma, **k: orig(*a, **{**k, "input_dma": _dma}),
        )
        outs[dma] = fs.solve_fused_batched(
            *bb, rho=1e-2, exit_tol=1e-10, max_iters=300, interpret=True)
    (res_b, dzx_b, dzu_b), (res_d, dzx_d, dzu_d) = outs[False], outs[True]
    np.testing.assert_array_equal(np.asarray(res_b.iters),
                                  np.asarray(res_d.iters))
    np.testing.assert_array_equal(np.asarray(res_b.lam), np.asarray(res_d.lam))
    np.testing.assert_array_equal(np.asarray(dzx_b), np.asarray(dzx_d))
    np.testing.assert_array_equal(np.asarray(dzu_b), np.asarray(dzu_d))


def test_fused_rejects_unknown_preconditioner():
    spec = ProblemSpec(3, 2, 8)
    problems, bb = _stack(spec, 1, seed0=7)
    with pytest.raises(ValueError, match="unknown preconditioner"):
        fs.solve_fused_batched(*bb, rho=1e-2, preconditioner="block-jacobi",
                               interpret=True)
