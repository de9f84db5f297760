"""Multi-chip paths on the 8-virtual-device CPU mesh (conftest forces
xla_force_host_platform_device_count=8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from gato_tpu import ProblemSpec, SolverOptions
from gato_tpu.assemble import condense
from gato_tpu.formats import KKTBlocks
from gato_tpu.parallel.sharded import pcg_sharded, solve_sharded
from gato_tpu.pcg import pcg
from gato_tpu.solver import solve
from gato_tpu.testing import dense_oracle, random_blocks


def _mesh(n, name="knot"):
    devs = jax.devices()[:n]
    return Mesh(np.array(devs), (name,))


def test_8_devices_available():
    assert len(jax.devices()) >= 8


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_pcg_sharded_matches_single(n_dev):
    spec = ProblemSpec(4, 2, 32)
    blocks = random_blocks(spec, seed=8)
    sys = condense(*(jnp.asarray(a) for a in blocks), rho=jnp.float32(0.01))

    single = pcg(sys.S, sys.Pinv, sys.gamma, exit_tol=1e-10, max_iters=300)
    sharded = pcg_sharded(
        _mesh(n_dev), sys.S, sys.Pinv, sys.gamma,
        exit_tol=1e-10, max_iters=300,
    )
    assert bool(sharded.converged)
    # Same algorithm, different reduction order: expect near-identical iterates.
    assert abs(int(sharded.iters) - int(single.iters)) <= 2
    np.testing.assert_allclose(
        np.asarray(sharded.lam), np.asarray(single.lam), rtol=1e-3, atol=1e-4
    )


def test_solve_sharded_matches_oracle():
    spec = ProblemSpec(4, 2, 32)
    blocks = random_blocks(spec, seed=17)
    rho = 0.01
    res, dz_x, dz_u = solve_sharded(
        _mesh(8),
        *(jnp.asarray(a) for a in blocks),
        rho=rho, exit_tol=1e-12, max_iters=500,
    )
    lam_ref, dz_ref = dense_oracle(spec, blocks, rho=rho)
    assert bool(res.converged)
    np.testing.assert_allclose(
        np.asarray(res.lam).reshape(-1), lam_ref, rtol=2e-3, atol=2e-3
    )
    single = solve(spec, blocks, SolverOptions(exit_tol=1e-12, max_iters=500,
                                               rho=rho), pcg_backend="jax")
    np.testing.assert_allclose(
        np.asarray(dz_x), np.asarray(single.dz_x), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(dz_u), np.asarray(single.dz_u), rtol=1e-3, atol=1e-4
    )


def test_sharded_rejects_indivisible():
    spec = ProblemSpec(3, 1, 30)
    blocks = random_blocks(spec, seed=2)
    sys = condense(*(jnp.asarray(a) for a in blocks), rho=jnp.float32(0.01))
    with pytest.raises(ValueError):
        pcg_sharded(_mesh(8), sys.S, sys.Pinv, sys.gamma)


def test_batch_sharding_dp():
    """Plain data parallelism: a batch of problems sharded over devices via
    sharding annotations only (no shard_map needed)."""
    from gato_tpu.formats import KKTBlocks
    from gato_tpu.solver import solve_batched

    spec = ProblemSpec(3, 2, 10)
    problems = [random_blocks(spec, seed=200 + i) for i in range(8)]
    batched = KKTBlocks(*(np.stack([np.asarray(p[f]) for p in problems])
                          for f in range(7)))
    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    sharding = jax.sharding.NamedSharding(mesh, P("dp"))
    batched = KKTBlocks(*(jax.device_put(jnp.asarray(a), sharding)
                          for a in batched))
    res = solve_batched(spec, batched,
                        SolverOptions(exit_tol=1e-10, max_iters=300, rho=0.01),
                        pcg_backend="jax")
    for i, p in enumerate(problems):
        single = solve(spec, p,
                       SolverOptions(exit_tol=1e-10, max_iters=300, rho=0.01),
                       pcg_backend="jax")
        np.testing.assert_allclose(np.asarray(res.lam[i]),
                                   np.asarray(single.lam),
                                   rtol=1e-3, atol=1e-4)


def test_solve_batched_dp_fused():
    """Data-parallel batch: problems sharded over the mesh, fused whole-solve
    kernel per device (interpret on CPU), zero cross-device comm.  Exact
    iteration parity with the single-chip jax path per problem."""
    from jax.sharding import Mesh

    from gato_tpu.parallel.sharded import solve_batched_dp

    spec = ProblemSpec(4, 2, 10)
    n_dev = 4
    B = 8
    problems = [random_blocks(spec, seed=200 + i) for i in range(B)]
    batch = KKTBlocks(*(jnp.asarray(np.stack([np.asarray(p[f])
                                              for p in problems]))
                        for f in range(7)))
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("dp",))
    res, dz_x, dz_u = solve_batched_dp(
        mesh, *batch, rho=1e-2, exit_tol=1e-10, max_iters=300)
    for i in range(B):
        ref = solve(spec, problems[i],
                    SolverOptions(rho=1e-2, exit_tol=1e-10, max_iters=300),
                    pcg_backend="jax")
        assert int(np.asarray(res.iters)[i]) == int(ref.iters), i
        np.testing.assert_allclose(np.asarray(res.lam)[i],
                                   np.asarray(ref.lam), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(dz_u)[i],
                                   np.asarray(ref.dz_u), rtol=1e-4, atol=1e-4)


def test_solve_batched_dp_rejects_ragged():
    from jax.sharding import Mesh

    from gato_tpu.parallel.sharded import solve_batched_dp

    spec = ProblemSpec(3, 2, 8)
    batch = KKTBlocks(*(jnp.asarray(np.stack([np.asarray(a)] * 3))
                        for a in random_blocks(spec, seed=0)))
    mesh = Mesh(np.array(jax.devices()[:2]), ("dp",))
    with pytest.raises(ValueError, match="divisible"):
        solve_batched_dp(mesh, *batch, rho=1e-2)


def test_solve_batched_dp_direct():
    """Data-parallel EXACT solves: method='direct' runs the fused cyclic-
    reduction kernel per shard (interpret on CPU) — results match the
    single-chip direct oracle, iters are 0 by definition."""
    from jax.sharding import Mesh

    from gato_tpu.parallel.sharded import solve_batched_dp

    spec = ProblemSpec(4, 2, 10)
    n_dev = 4
    B = 8
    problems = [random_blocks(spec, seed=400 + i) for i in range(B)]
    batch = KKTBlocks(*(jnp.asarray(np.stack([np.asarray(p[f])
                                              for p in problems]))
                        for f in range(7)))
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("dp",))
    res, dz_x, dz_u = solve_batched_dp(mesh, *batch, rho=1e-2,
                                       method="direct")
    for i in range(B):
        ref = solve(spec, problems[i],
                    SolverOptions(rho=1e-2, method="direct"),
                    pcg_backend="jax")
        assert int(np.asarray(res.iters)[i]) == 0
        np.testing.assert_allclose(np.asarray(res.lam)[i],
                                   np.asarray(ref.lam), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(dz_x)[i],
                                   np.asarray(ref.dz_x), rtol=1e-4, atol=1e-4)

    import pytest

    with pytest.raises(ValueError, match="method"):
        solve_batched_dp(mesh, *batch, rho=1e-2, method="thomas")


def test_solve_batched_dp_longk_tiers(monkeypatch):
    """Horizons past the fused kernels' budgets route solve_batched_dp to
    the long-horizon tiers per shard, for BOTH methods — same boundary
    definitions as single-chip dispatch (budgets shrunk so the boundary
    sits at an interpret-affordable shape)."""
    from jax.sharding import Mesh

    from gato_tpu.kernels import direct_fused as df
    from gato_tpu.kernels import fused_solve as fs
    from gato_tpu.kernels import pcg_pallas as pp
    from gato_tpu.kernels import longk
    from gato_tpu.parallel.sharded import solve_batched_dp

    monkeypatch.setattr(fs, "_VMEM_BUDGET_BYTES", 10_000)
    monkeypatch.setattr(pp, "_VMEM_BUDGET_BYTES", 10_000)
    monkeypatch.setattr(df, "_VMEM_BUDGET_BYTES", 10_000)
    spec = ProblemSpec(3, 2, 48)
    assert longk.should_dispatch(48, 3, 2)
    assert longk.should_dispatch_direct(48, 3, 2)

    B = 4
    problems = [random_blocks(spec, seed=500 + i) for i in range(B)]
    batch = KKTBlocks(*(jnp.asarray(np.stack([np.asarray(p[f])
                                              for p in problems]))
                        for f in range(7)))
    mesh = Mesh(np.array(jax.devices()[:2]), ("dp",))

    res, _, _ = solve_batched_dp(mesh, *batch, rho=1e-2, exit_tol=1e-10,
                                 max_iters=300)
    res_d, dzx_d, _ = solve_batched_dp(mesh, *batch, rho=1e-2,
                                       method="direct")
    for i in range(B):
        opts = SolverOptions(rho=1e-2, exit_tol=1e-10, max_iters=300)
        ref = solve(spec, problems[i], opts, pcg_backend="jax")
        assert int(np.asarray(res.iters)[i]) == int(ref.iters), i
        np.testing.assert_allclose(np.asarray(res.lam)[i],
                                   np.asarray(ref.lam), rtol=1e-4, atol=1e-4)
        ref_d = solve(spec, problems[i],
                      SolverOptions(rho=1e-2, method="direct"),
                      pcg_backend="jax")
        assert int(np.asarray(res_d.iters)[i]) == 0
        assert bool(np.asarray(res_d.converged)[i])
        np.testing.assert_allclose(np.asarray(res_d.lam)[i],
                                   np.asarray(ref_d.lam),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(dzx_d)[i],
                                   np.asarray(ref_d.dz_x),
                                   rtol=1e-4, atol=1e-4)

    # Round 5: no direct shape is unowned any more — shrinking direct-XL
    # residency just engages the hybrid tier's compacting peel schedule
    # (here down to the 128-lane floor); answers unchanged.
    monkeypatch.setattr(longk, "_DIRECT_XL_BUDGET_BYTES",
                        64 * 4 * 8 * (10 * 3 + 6))
    assert longk.direct_tier(48, 3, 2) == "hybrid"
    res_h, _, _ = solve_batched_dp(mesh, *batch, rho=1e-2, method="direct")
    np.testing.assert_allclose(np.asarray(res_h.lam), np.asarray(res_d.lam),
                               rtol=1e-4, atol=1e-4)


# slow tier: the dp farm runs in every round's driver dryrun
# (__graft_entry__ placement 5) and the exact variant below stays default.
@pytest.mark.slow
def test_solve_sequence_batched_dp():
    """MPC farm sharded over the mesh: each device scans its local streams
    with the fused kernel; matches the single-mesh farm exactly."""
    from jax.sharding import Mesh

    from gato_tpu.mpc import solve_sequence_batched
    from gato_tpu.parallel.sharded import solve_sequence_batched_dp

    spec = ProblemSpec(4, 2, 10)
    T, B, n_dev = 3, 8, 4
    streams = []
    for b in range(B):
        steps = [random_blocks(spec, seed=800 + 10 * b + t) for t in range(T)]
        streams.append(KKTBlocks(*(np.stack([np.asarray(s[f]) for s in steps])
                                   for f in range(7))))
    batched = KKTBlocks(*(jnp.asarray(
        np.stack([np.asarray(streams[b][f]) for b in range(B)], axis=1))
        for f in range(7)))
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("dp",))
    lam, dz_x, dz_u, iters, conv, eta = solve_sequence_batched_dp(
        mesh, *batched, rho=1e-2, exit_tol=1e-8, max_iters=300)
    ref = solve_sequence_batched(spec, batched,
                                 SolverOptions(rho=1e-2, exit_tol=1e-8,
                                               max_iters=300),
                                 pcg_backend="fused")
    assert np.asarray(iters).tolist() == np.asarray(ref.iters).tolist()
    np.testing.assert_allclose(np.asarray(lam), np.asarray(ref.lam),
                               rtol=1e-5, atol=1e-6)

    import pytest

    with pytest.raises(ValueError, match="divisible"):
        solve_sequence_batched_dp(
            Mesh(np.array(jax.devices()[:3]), ("dp",)), *batched, rho=1e-2)

    # The EXACT farm over the mesh: stream-major fold into one dp batch —
    # matches the single-mesh exact farm (which itself matches per-step
    # solve_batched, test_mpc), per-step rhos included.
    rhos = np.array([1e-2, 5e-2, 1e-3], dtype=np.float32)
    lam_d, dzx_d, dzu_d, it_d, conv_d, eta_d = solve_sequence_batched_dp(
        mesh, *batched, rhos=rhos, method="direct")
    ref_d = solve_sequence_batched(spec, batched,
                                   SolverOptions(method="direct"), rhos=rhos)
    assert lam_d.shape == ref_d.lam.shape
    assert np.all(np.asarray(conv_d))
    # Cross-kernel round-off tolerance: the per-shard batch (B*T/n) can sit
    # on the other side of the Thomas-width crossover than the single-mesh
    # fold (B*T), so the two exact kernels differ at f32 round-off.
    np.testing.assert_allclose(np.asarray(lam_d), np.asarray(ref_d.lam),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dzu_d), np.asarray(ref_d.dz_u),
                               rtol=1e-4, atol=1e-4)

    with pytest.raises(ValueError, match="supports method"):
        solve_sequence_batched_dp(mesh, *batched, method="nope")


@pytest.mark.parametrize("n_dev", [2, pytest.param(4, marks=pytest.mark.slow)])
def test_pcg_sharded_kernel_tier_matches_einsum(n_dev):
    """use_kernel=True (lane-packed Pallas matvec per shard, boundary-column
    ppermute) must agree with the einsum path on iteration count and
    solution — the same loop, two per-shard executors."""
    spec = ProblemSpec(4, 2, 32)
    blocks = random_blocks(spec, seed=21)
    sys = condense(*(jnp.asarray(a) for a in blocks), rho=jnp.float32(0.01))
    a = pcg_sharded(_mesh(n_dev), sys.S, sys.Pinv, sys.gamma,
                    exit_tol=1e-10, max_iters=300, use_kernel=False)
    b = pcg_sharded(_mesh(n_dev), sys.S, sys.Pinv, sys.gamma,
                    exit_tol=1e-10, max_iters=300, use_kernel=True)
    assert bool(a.converged) and bool(b.converged)
    assert int(a.iters) == int(b.iters)
    np.testing.assert_allclose(np.asarray(b.lam), np.asarray(a.lam),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize(
    # symmetric_stair (the default) keeps the lane-granular operator check
    # fast; the other preconditioners' full-path parity stays fast via
    # test_solve_sharded_kernel_tier_matches_einsum.
    "precond",
    ["symmetric_stair",
     pytest.param("block_jacobi", marks=pytest.mark.slow),
     pytest.param("jacobi", marks=pytest.mark.slow)])
def test_sharded_kernel_condense_operators_match_oracle(precond):
    """The per-shard kernel condensation with its cross-shard boundary
    patches must reproduce assemble.condense's S / Pinv / gamma at EVERY
    lane — in particular the patched boundary lanes (theta/gamma/S_left at
    lane 0, P_left at lanes 0-1, the slot-2 shift at lane Kl-1)."""
    import functools as ft

    from jax import lax
    from gato_tpu.kernels import longk
    from gato_tpu.kernels.fused_solve import _pack_mat, _pack_vec
    from gato_tpu.parallel import sharded as sh

    spec = ProblemSpec(4, 2, 32)
    s, cdim, K = 4, 2, 32
    blocks = random_blocks(spec, seed=31)
    rho = jnp.float32(0.01)
    from gato_tpu.problem import Preconditioner

    sys = condense(*(jnp.asarray(a) for a in blocks), rho=rho,
                   preconditioner=Preconditioner(precond))

    # 2 shards: the boundary-patch logic under test is per boundary lane
    # (identical at every interior seam); fewer devices just means fewer
    # copies of the same patch, at half the interpret cost.
    n_dev = 2
    Kl = K // n_dev
    plan = longk.plan_longk(Kl, s, cdim)
    sp, Kp, Lc, n_chunks = plan

    def body(Ql, Rl, Al, Bl, ql, rl, cl):
        pm = ft.partial(_pack_mat, K_sub=Kp, g=1, L=Kp, n_groups=1, sp=sp)
        pv = ft.partial(_pack_vec, K_sub=Kp, g=1, L=Kp, n_groups=1, sp=sp)
        St, Pt, gam, _, _ = sh._condense_sharded_local(
            pm(Ql[None]), pm(Rl[None]), pm(Al[None]), pm(Bl[None]),
            pv(ql[None]), pv(rl[None]), pv(cl[None]),
            Ql, Rl, Al, Bl, ql, rl, rho,
            axis_name="knot", s=s, cdim=cdim, sp=sp, Kp=Kp, Lc=Lc,
            n_chunks=n_chunks, Kl=Kl, precond=precond, interpret=True,
        )
        unp = lambda M: jnp.transpose(M[:, :, :s, :Kl], (3, 0, 2, 1))
        return unp(St), unp(Pt), gam[:s, :Kl].T

    mesh = _mesh(n_dev)
    pad1 = lambda x: jnp.concatenate([x, jnp.zeros_like(x[:1])], axis=0)
    from jax.sharding import PartitionSpec as P

    run = jax.shard_map(
        body, mesh=mesh, in_specs=(P("knot"),) * 7,
        out_specs=(P("knot"), P("knot"), P("knot")), check_vma=False,
    )
    S_k, P_k, gam_k = run(
        jnp.asarray(blocks.Q), pad1(jnp.asarray(blocks.R)),
        pad1(jnp.asarray(blocks.A)), pad1(jnp.asarray(blocks.B)),
        jnp.asarray(blocks.q), pad1(jnp.asarray(blocks.r)),
        jnp.asarray(blocks.c))

    for name, got, ref in (("S", S_k, sys.S), ("Pinv", P_k, sys.Pinv)):
        scale = float(jnp.max(jnp.abs(ref))) or 1.0
        np.testing.assert_allclose(
            np.asarray(got) / scale, np.asarray(ref) / scale,
            rtol=2e-4, atol=2e-5, err_msg=f"{precond}/{name}")
    gscale = float(jnp.max(jnp.abs(sys.gamma))) or 1.0
    np.testing.assert_allclose(
        np.asarray(gam_k) / gscale, np.asarray(sys.gamma) / gscale,
        rtol=2e-4, atol=2e-5, err_msg=f"{precond}/gamma")


@pytest.mark.parametrize("precond", ["symmetric_stair", "block_jacobi",
                                     "jacobi"])
def test_solve_sharded_kernel_tier_matches_einsum(precond):
    """The FULL kernel-tier sharded solve (round-3: chunked condense +
    packed-matvec PCG + packed recovery per shard, boundary restored by the
    ppermuted carry column) must agree with the einsum tier on iteration
    count and solution for every preconditioner — the cross-shard condense
    seam (theta/gamma/S_left/thinv/P_left/slot-2 patches at the boundary
    lanes) is exactly what this pins down."""
    from gato_tpu.problem import Preconditioner

    # K=64 deliberately (not the suite-wide K=32 shrink): at (4, 2, 32)
    # seed 23 the block_jacobi case lands eta within round-off of exit_tol
    # and flips 95-vs-96 iterations — a tolerance tie this strict-equality
    # test must not depend on.
    spec = ProblemSpec(4, 2, 64)
    blocks = random_blocks(spec, seed=23)
    mesh = _mesh(4)  # Kl=16 per shard
    kw = dict(rho=0.01, exit_tol=1e-10, max_iters=300,
              preconditioner=Preconditioner(precond))
    arrs = [jnp.asarray(a) for a in blocks]
    e = solve_sharded(mesh, *arrs, use_kernel=False, **kw)
    k = solve_sharded(mesh, *arrs, use_kernel=True, **kw)
    res_e, res_k = e[0], k[0]
    assert bool(res_e.converged) and bool(res_k.converged)
    if precond == "jacobi":
        # Scalar Jacobi converges slowest (>100 iterations here); the
        # kernel- and XLA-condensed operators agree only to f32 round-off
        # (test_sharded_kernel_condense_operators_match_oracle pins that),
        # and after that many iterations the accumulated reordering can
        # land eta within round-off of exit_tol — the CLAUDE.md-documented
        # tolerance-tie exception.  Anything beyond +-1 is a real failure.
        assert abs(int(res_e.iters) - int(res_k.iters)) <= 1, precond
    else:
        assert int(res_e.iters) == int(res_k.iters), precond
    scale = max(1.0, float(np.max(np.abs(np.asarray(res_e.lam)))))
    np.testing.assert_allclose(np.asarray(res_k.lam) / scale,
                               np.asarray(res_e.lam) / scale,
                               rtol=1e-4, atol=1e-4, err_msg=precond)
    np.testing.assert_allclose(np.asarray(k[1]), np.asarray(e[1]),
                               rtol=1e-3, atol=1e-3, err_msg=precond)
    np.testing.assert_allclose(np.asarray(k[2]), np.asarray(e[2]),
                               rtol=1e-3, atol=1e-3, err_msg=precond)


def test_solve_sharded_second_call_hits_jit_cache():
    """The core is a single module-level jit (mesh/axis/precond static):
    a serving loop that varies data and rho must not retrace."""
    from gato_tpu.parallel.sharded import _solve_sharded_core

    spec = ProblemSpec(4, 2, 32)
    mesh = _mesh(4)
    _solve_sharded_core._clear_cache()
    for seed, rho in ((1, 0.01), (2, 0.02)):
        blocks = random_blocks(spec, seed=seed)
        res, dz_x, dz_u = solve_sharded(mesh, *blocks, rho=rho,
                                        exit_tol=1e-8, max_iters=200)
        assert bool(res.converged)
    assert _solve_sharded_core._cache_size() == 1


def test_solve_packed_dp_matches_single_device(monkeypatch):
    """One PackedKKT served over the mesh: groups shard, each device runs
    its groups' kernel grid — results bitwise-identical to the single-device
    packed solve (the grid programs never interact)."""
    import dataclasses

    from gato_tpu import packed as pk
    from gato_tpu.kernels import fused_solve as fs
    from gato_tpu.parallel.sharded import solve_packed_dp

    monkeypatch.setattr(fs, "_VMEM_BUDGET_BYTES", 270_000)  # multi-group
    spec = ProblemSpec(3, 2, 12)
    B = 16
    problems = [random_blocks(spec, seed=60 + i) for i in range(B)]
    bb = KKTBlocks(*(jnp.asarray(np.stack([np.asarray(p[f])
                                           for p in problems]))
                     for f in range(7)))
    opts = SolverOptions(rho=1e-2, exit_tol=1e-10, max_iters=300)
    packed = pk.pack(spec, bb)
    assert packed.plan.n_groups == 2 and packed.plan.batch == 16

    single = pk.solve_packed(packed, opts)
    dp = solve_packed_dp(_mesh(2, "dp"), packed, opts)
    assert dp.plan == packed.plan
    # Exact iteration parity; values to f32 round-off.  NOT bitwise here:
    # each device runs a grid of n_groups/n programs where the single-device
    # solve runs one grid of n_groups, and interpret mode's grid compilation
    # reassociates reductions with the grid count (verified: pipeline-vs-DMA
    # at EQUAL grid is bitwise; grid 1 vs 2 differs at ~4e-6).
    np.testing.assert_array_equal(np.asarray(dp.iters),
                                  np.asarray(single.iters))
    np.testing.assert_array_equal(np.asarray(dp.converged),
                                  np.asarray(single.converged))
    for f in ("lam_p", "dzx_p", "dzu_p"):
        np.testing.assert_allclose(np.asarray(getattr(dp, f)),
                                   np.asarray(getattr(single, f)),
                                   rtol=1e-4, atol=1e-4, err_msg=f)

    # The packed warm-start carry works across the mesh too.
    again = solve_packed_dp(_mesh(2, "dp"), packed, opts,
                            lam0=dp.lam_packed)
    assert int(np.max(np.asarray(again.iters))) <= 1

    # Direct method through the same deployment.
    opts_d = dataclasses.replace(opts, method="direct")
    pd = pk.pack(spec, bb, method="direct")
    if pd.plan.n_groups % 2 == 0 and pd.plan.batch == (
            pd.plan.n_groups * pd.plan.g):
        dp_d = solve_packed_dp(_mesh(2, "dp"), pd, opts_d)
        sd = pk.solve_packed(pd, opts_d)
        np.testing.assert_allclose(np.asarray(dp_d.unpack().lam),
                                   np.asarray(sd.unpack().lam),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_solve_packed_dp_longk_tier(monkeypatch):
    """The long-horizon tier dp-shards too (each group IS one problem) —
    for PCG and for the direct (one-kernel cyclic-reduction) tier."""
    import dataclasses

    from gato_tpu import packed as pk
    from gato_tpu.kernels import direct_fused as df
    from gato_tpu.kernels import fused_solve as fs
    from gato_tpu.kernels import pcg_pallas as pp
    from gato_tpu.parallel.sharded import solve_packed_dp

    monkeypatch.setattr(fs, "_VMEM_BUDGET_BYTES", 10_000)
    monkeypatch.setattr(pp, "_VMEM_BUDGET_BYTES", 10_000)
    monkeypatch.setattr(df, "_VMEM_BUDGET_BYTES", 10_000)
    spec = ProblemSpec(3, 2, 48)
    B = 4
    problems = [random_blocks(spec, seed=80 + i) for i in range(B)]
    bb = KKTBlocks(*(jnp.asarray(np.stack([np.asarray(p[f])
                                           for p in problems]))
                     for f in range(7)))
    opts = SolverOptions(rho=1e-3, exit_tol=1e-10, max_iters=300)
    packed = pk.pack(spec, bb)
    assert packed.plan.tier == "longk"
    single = pk.solve_packed(packed, opts)
    dp = solve_packed_dp(_mesh(2, "dp"), packed, opts)
    np.testing.assert_array_equal(np.asarray(dp.iters),
                                  np.asarray(single.iters))
    np.testing.assert_allclose(np.asarray(dp.unpack().lam),
                               np.asarray(single.unpack().lam),
                               rtol=1e-4, atol=1e-4)

    opts_d = dataclasses.replace(opts, method="direct")
    pd = pk.pack(spec, bb, method="direct")
    assert pd.plan.tier == "longk"
    sd = pk.solve_packed(pd, opts_d)
    dp_d = solve_packed_dp(_mesh(2, "dp"), pd, opts_d)
    assert bool(np.all(np.asarray(dp_d.converged)))
    np.testing.assert_allclose(np.asarray(dp_d.unpack().lam),
                               np.asarray(sd.unpack().lam),
                               rtol=1e-4, atol=1e-4)


def test_solve_packed_dp_validation(monkeypatch):
    import dataclasses

    from gato_tpu import packed as pk
    from gato_tpu.kernels import fused_solve as fs
    from gato_tpu.parallel.sharded import solve_packed_dp

    monkeypatch.setattr(fs, "_VMEM_BUDGET_BYTES", 270_000)
    spec = ProblemSpec(3, 2, 12)
    opts = SolverOptions(rho=1e-2, exit_tol=1e-10, max_iters=300)

    def stack(B, seed0):
        ps = [random_blocks(spec, seed=seed0 + i) for i in range(B)]
        return KKTBlocks(*(jnp.asarray(np.stack([np.asarray(p[f])
                                                 for p in ps]))
                           for f in range(7)))

    ragged = pk.pack(spec, stack(15, 100))  # 2 groups x g=8, batch 15
    with pytest.raises(ValueError, match="ragged final group"):
        solve_packed_dp(_mesh(2, "dp"), ragged, opts)
    packed = pk.pack(spec, stack(16, 100))
    with pytest.raises(ValueError, match="not divisible by mesh axis"):
        solve_packed_dp(_mesh(4, "dp"), packed, opts)  # 2 groups / 4 devs
    with pytest.raises(ValueError, match="does not relabel"):
        solve_packed_dp(_mesh(2, "dp"), packed,
                        dataclasses.replace(opts, method="direct"))


def test_solve_packed_dp_second_call_hits_jit_cache(monkeypatch):
    """A fleet-serving loop must not retrace: the second call with fresh
    data and the packed carry reuses the compiled executable."""
    from gato_tpu import packed as pk
    from gato_tpu.kernels import fused_solve as fs
    from gato_tpu.parallel import sharded as sh

    monkeypatch.setattr(fs, "_VMEM_BUDGET_BYTES", 270_000)
    spec = ProblemSpec(3, 2, 12)
    ps = [random_blocks(spec, seed=120 + i) for i in range(16)]
    bb = KKTBlocks(*(jnp.asarray(np.stack([np.asarray(p[f]) for p in ps]))
                     for f in range(7)))
    opts = SolverOptions(rho=1e-2, exit_tol=1e-10, max_iters=300)
    packed = pk.pack(spec, bb)
    mesh = _mesh(2, "dp")
    first = sh.solve_packed_dp(mesh, packed, opts)
    size = sh._solve_packed_dp_core._cache_size()
    refreshed = pk.update_vectors(packed, np.asarray(bb.q) * 1.01,
                                  bb.r, bb.c)
    sh.solve_packed_dp(mesh, refreshed, opts, lam0=first.lam_packed)
    assert sh._solve_packed_dp_core._cache_size() == size


# ---- Sharded EXACT solve (substructuring) ---------------------------------


@pytest.mark.parametrize(
    "n_dev",
    [pytest.param(2, marks=pytest.mark.slow),
     pytest.param(4, marks=pytest.mark.slow),
     pytest.param(8, marks=pytest.mark.slow)])
def test_btd_solve_sharded_matches_thomas(n_dev):
    """The SPIKE interface solve is exact: agrees with single-device block
    Thomas to f32 round-off on a random SPD Schur system."""
    from gato_tpu.direct import btd_solve
    from gato_tpu.parallel.sharded import btd_solve_sharded

    spec = ProblemSpec(4, 2, 32)
    blocks = random_blocks(spec, seed=91)
    sys = condense(*(jnp.asarray(a) for a in blocks), rho=jnp.float32(0.01))

    x_single = btd_solve(sys.S, sys.gamma)
    x_sharded = btd_solve_sharded(_mesh(n_dev), sys.S, sys.gamma)
    np.testing.assert_allclose(
        np.asarray(x_sharded), np.asarray(x_single), rtol=2e-4, atol=2e-5
    )


def test_btd_solve_sharded_rejects_thin_shards():
    from gato_tpu.parallel.sharded import btd_solve_sharded

    spec = ProblemSpec(3, 1, 8)
    blocks = random_blocks(spec, seed=5)
    sys = condense(*(jnp.asarray(a) for a in blocks), rho=jnp.float32(0.01))
    with pytest.raises(ValueError, match="2 rows per shard"):
        btd_solve_sharded(_mesh(8), sys.S, sys.gamma)


@pytest.mark.parametrize("n_dev", [2, 8])
def test_solve_sharded_direct_matches_single(n_dev):
    """Full exact knot-sharded solve: lam/dz agree with the single-device
    method='direct' path; converged derives from the true residual."""
    spec = ProblemSpec(4, 2, 32)
    blocks = random_blocks(spec, seed=23)
    rho = 0.01
    res, dz_x, dz_u = solve_sharded(
        _mesh(n_dev), *(jnp.asarray(a) for a in blocks),
        rho=rho, method="direct",
    )
    single = solve(spec, blocks, SolverOptions(rho=rho, method="direct"),
                   pcg_backend="jax")
    assert bool(res.converged)
    assert int(res.iters) == 0
    np.testing.assert_allclose(
        np.asarray(res.lam), np.asarray(single.lam), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(dz_x), np.asarray(single.dz_x), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(dz_u), np.asarray(single.dz_u), rtol=2e-4, atol=2e-5
    )


def test_solve_sharded_direct_thin_shards_fall_back():
    """K == mesh size: no interior rows — the core solves the (tiny) whole
    system in place instead of substructuring."""
    spec = ProblemSpec(3, 2, 8)
    blocks = random_blocks(spec, seed=31)
    res, dz_x, dz_u = solve_sharded(
        _mesh(8), *(jnp.asarray(a) for a in blocks),
        rho=0.01, method="direct",
    )
    single = solve(spec, blocks, SolverOptions(rho=0.01, method="direct"),
                   pcg_backend="jax")
    assert bool(res.converged)
    np.testing.assert_allclose(
        np.asarray(res.lam), np.asarray(single.lam), rtol=2e-4, atol=2e-5
    )


def test_solve_sharded_direct_rejects_kernel_request():
    spec = ProblemSpec(4, 2, 16)
    blocks = random_blocks(spec, seed=3)
    with pytest.raises(ValueError, match="direct"):
        solve_sharded(_mesh(2), *(jnp.asarray(a) for a in blocks),
                      rho=0.01, method="direct", use_kernel=True)


def test_solve_sharded_rejects_unknown_method():
    spec = ProblemSpec(4, 2, 16)
    blocks = random_blocks(spec, seed=3)
    with pytest.raises(ValueError, match="method"):
        solve_sharded(_mesh(2), *(jnp.asarray(a) for a in blocks),
                      rho=0.01, method="thomas")
