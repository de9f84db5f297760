"""Fused Pallas kernel tests in interpreter mode (CPU) vs the pure-JAX oracle.

The numerics contract: identical update order and exit semantics to pcg.pcg,
so iteration counts must match EXACTLY; solutions agree to f32 round-off
(reduction order differs).  On-TPU compiled parity is exercised by bench.py
and the verify flow (can't compile Mosaic on CPU CI).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gato_tpu import ProblemSpec
from gato_tpu.assemble import condense
from gato_tpu.kernels import pcg_pallas as kp
from gato_tpu.pcg import pcg
from gato_tpu.testing import random_blocks


def _sys(spec, seed=3, rho=0.01):
    b = random_blocks(spec, seed=seed)
    return condense(*(jnp.asarray(a) for a in b), rho=jnp.float32(rho))


@pytest.mark.parametrize("spec", [
    ProblemSpec(2, 1, 5),      # pendulum shape
    # IIWA and the just-over-one-tile shape are slow-tier: the IIWA shape
    # runs compiled in bench.py's on-device parity gate every round, and the
    # exact-tile wraparound case below keeps the tile-edge axis fast.
    pytest.param(ProblemSpec(14, 7, 50), marks=pytest.mark.slow),
    ProblemSpec(4, 2, 128),    # K == lane tile exactly (wraparound case)
    pytest.param(ProblemSpec(8, 3, 130), marks=pytest.mark.slow),
])
def test_fused_matches_pure(spec):
    sys = _sys(spec)
    ref = pcg(sys.S, sys.Pinv, sys.gamma, exit_tol=1e-10, max_iters=300)
    fused = kp.pcg_fused(sys.S, sys.Pinv, sys.gamma,
                         exit_tol=1e-10, max_iters=300, interpret=True)
    assert int(fused.iters) == int(ref.iters)
    assert bool(fused.converged) == bool(ref.converged)
    np.testing.assert_allclose(np.asarray(fused.lam), np.asarray(ref.lam),
                               rtol=1e-4, atol=1e-4)


def test_fused_warm_start():
    sys = _sys(ProblemSpec(4, 2, 30))
    cold = kp.pcg_fused(sys.S, sys.Pinv, sys.gamma,
                        exit_tol=1e-8, max_iters=300, interpret=True)
    warm = kp.pcg_fused(sys.S, sys.Pinv, sys.gamma, lam0=cold.lam,
                        exit_tol=1e-8, max_iters=300, interpret=True)
    assert int(warm.iters) <= 1


def test_fused_max_iters_exhaustion():
    sys = _sys(ProblemSpec(4, 2, 30))
    res = kp.pcg_fused(sys.S, sys.Pinv, sys.gamma,
                       exit_tol=1e-30, max_iters=3, interpret=True)
    assert int(res.iters) == 3 and not bool(res.converged)


def test_fused_batched_multi_chunk(monkeypatch):
    """Force a multi-group grid (with a ragged final group padded by dummy
    problems) and check per-problem parity with the pure path."""
    # 135 kB -> max_lanes = 131 at this shape (1024 B/lane): g = 5 problems
    # per 128-lane program, 2 ragged groups for B = 6.
    monkeypatch.setattr(kp, "_VMEM_BUDGET_BYTES", 135_000)
    spec = ProblemSpec(4, 2, 20)
    Ss, Ps, gs = [], [], []
    for i in range(6):
        sys = _sys(spec, seed=10 + i)
        Ss.append(sys.S)
        Ps.append(sys.Pinv)
        gs.append(sys.gamma)
    Sb, Pb, gb = map(jnp.stack, (Ss, Ps, gs))
    _, g, _, n_groups, _ = kp.plan_packing(6, 20, 4)
    assert n_groups > 1 and n_groups * g > 6  # multi-group + dummy padding

    res = kp.pcg_fused_batched(Sb, Pb, gb, exit_tol=1e-10, max_iters=300,
                               interpret=True)
    for i in range(6):
        ref = pcg(Ss[i], Ps[i], gs[i], exit_tol=1e-10, max_iters=300)
        assert int(res.iters[i]) == int(ref.iters)
        np.testing.assert_allclose(np.asarray(res.lam[i]), np.asarray(ref.lam),
                                   rtol=1e-4, atol=1e-4)


def test_fused_batched_mixed_convergence(monkeypatch):
    """Problems with very different conditioning: early-converging problems
    must freeze (per-problem masking), matching the pure path exactly."""
    # 110 kB -> 132 lanes (832 B/lane): all 4 problems share one program.
    monkeypatch.setattr(kp, "_VMEM_BUDGET_BYTES", 110_000)
    spec = ProblemSpec(3, 1, 16)
    Ss, Ps, gs = [], [], []
    for i in range(4):
        sys = _sys(spec, seed=50 + i)
        Ss.append(sys.S)
        Ps.append(sys.Pinv)
        gs.append(sys.gamma * (10.0 ** i))  # scales -> different iter counts
    Sb, Pb, gb = map(jnp.stack, (Ss, Ps, gs))
    res = kp.pcg_fused_batched(Sb, Pb, gb, exit_tol=1e-8, max_iters=300,
                               interpret=True)
    iters = [int(x) for x in res.iters]
    assert len(set(iters)) > 1  # genuinely different convergence points
    for i in range(4):
        ref = pcg(Ss[i], Ps[i], gs[i], exit_tol=1e-8, max_iters=300)
        assert iters[i] == int(ref.iters)
        np.testing.assert_allclose(
            np.asarray(res.lam[i]), np.asarray(ref.lam),
            rtol=1e-4, atol=1e-4 * max(1.0, 10.0 ** i),
        )


def test_solver_pallas_backend_interpret(monkeypatch):
    """End-to-end solve() with the pallas backend (interpret under CPU)."""
    import gato_tpu.kernels.pcg_pallas as pp
    orig = pp.pcg_fused_batched
    monkeypatch.setattr(
        pp, "pcg_fused_batched",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}),
    )
    from gato_tpu.problem import SolverOptions
    from gato_tpu.solver import solve
    from gato_tpu.testing import dense_oracle

    spec = ProblemSpec(4, 2, 12)
    blocks = random_blocks(spec, seed=9)
    res = solve(spec, blocks,
                SolverOptions(exit_tol=1e-12, max_iters=300, rho=0.01),
                pcg_backend="pallas")
    lam_ref, _ = dense_oracle(spec, blocks, rho=0.01)
    np.testing.assert_allclose(res.lam_flat(), lam_ref, rtol=2e-3, atol=2e-3)


def test_plan_lane_groups_tile_efficiency():
    """The packing search minimizes TOTAL padded lanes (= VPU tile columns),
    not just problems-per-program: a g that divides B into dense tiles beats
    the raw VMEM maximum; ties prefer larger g (fewer programs)."""
    # B divisible into dense tiles: the VMEM maximum survives (IIWA batch:
    # g=16 packs 896 lanes = exactly 7 tiles, B=256 divides into 16 groups).
    assert kp.plan_lane_groups(256, 56, 910, "x") == (16, 896, 16)
    # Ragged B=20: two balanced 640-lane groups (1280 total lanes) beat the
    # 16+4 split at 896 lanes each (1792 total); the 1280-lane tie between
    # g=10 and g=11 breaks toward larger g.
    assert kp.plan_lane_groups(20, 56, 910, "x") == (11, 640, 2)
    # B=17: 9+8 at 512 lanes (1024 total) beats 16+1 at 896 (1792 total).
    assert kp.plan_lane_groups(17, 56, 910, "x") == (9, 512, 2)
    # Group-overhead guard (B=30): 3 groups x 576 lanes would save 64 raw
    # lanes over 2 x 896, but the extra program's fixed cost outweighs it —
    # the per-group tile charge keeps the 2-group plan.
    assert kp.plan_lane_groups(30, 56, 910, "x") == (16, 896, 2)
    # Single problem: minimum tile.
    assert kp.plan_lane_groups(1, 56, 910, "x") == (1, 128, 1)
    # One problem over the lane budget still raises.
    with pytest.raises(ValueError, match="nope"):
        kp.plan_lane_groups(4, 1000, 900, "nope")
