"""Batch-in-lanes block-Thomas direct kernel (kernels/thomas_batch.py) vs
the pure-path oracle, plus the batch-width dispatch inside
pcg_backend='fused' + method='direct'.

The pure path (assemble.condense + direct.btd_solve + recover.recover_dz) is
the numerics oracle; the kernel must reproduce its solution to f32 round-off
on every shape — including multi-group lane packing (problems split across
programs) and non-multiple-of-128 batch widths (pad-lane hygiene)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gato_tpu import assemble, direct
from gato_tpu.kernels import thomas_batch
from gato_tpu.problem import ProblemSpec, SolverOptions
from gato_tpu.recover import recover_dz
from gato_tpu.solver import solve_batched
from gato_tpu.testing import random_blocks


def _batch(spec, B, seed=0):
    pro = [random_blocks(spec, seed=seed + i) for i in range(B)]
    return [
        jnp.asarray(np.stack([np.asarray(p[f]) for p in pro]), jnp.float32)
        for f in range(7)
    ]


def _oracle(arrs, rho):
    sys = jax.vmap(lambda *xs: assemble.condense(*xs, rho, None))(*arrs)
    lam = direct.btd_solve(sys.S, sys.gamma)
    Q, R, A, B, q, r, _ = arrs
    dzx, dzu = jax.vmap(recover_dz)(sys.Qinv, sys.Rinv, A, B, q, r, lam)
    return lam, dzx, dzu


def _assert_close(got, ref, tol=5e-5):
    scale = float(jnp.max(jnp.abs(ref))) or 1.0
    assert float(jnp.max(jnp.abs(got - ref))) / scale < tol


@pytest.mark.parametrize(
    # Batch stays in lanes whatever its width; K is the sequential grid.
    # (3, 2, 7) x B=5 covers pad lanes (5 of 128 live); the sp=16 two-tile
    # sublane layout runs compiled in bench.py's on-device parity gate.
    "shape,B", [((3, 2, 7), 5),
                ((2, 1, 2), 3),   # minimal horizon: the forward carry-zero
                                  # step is immediately the last knot and the
                                  # reverse (2K-2-t)%K dzu mapping degenerates
                pytest.param((5, 3, 12), 9, marks=pytest.mark.slow)]
)
def test_matches_oracle(shape, B):
    s, c, K = shape
    spec = ProblemSpec(s, c, K)
    arrs = _batch(spec, B, seed=31)
    rho = 1e-2
    lam_ref, dzx_ref, dzu_ref = _oracle(arrs, rho)
    res, dzx, dzu = thomas_batch.solve_direct_thomas_batched(*arrs, rho=rho)
    _assert_close(res.lam, lam_ref)
    _assert_close(dzx, dzx_ref)
    _assert_close(dzu, dzu_ref)
    assert bool(jnp.all(res.converged)) and bool(jnp.all(res.iters == 0))
    # eta is the squared TRUE residual of an exact solve: tiny.
    assert float(jnp.max(res.eta)) < 1e-6


# slow tier: the multi-group carry reset is also exercised (faster)
# by test_packed_thomas_dp's two-group pack.
@pytest.mark.slow
def test_multi_group_packing(monkeypatch):
    """Problems split across programs (n_groups > 1): the carry must reset at
    each group boundary (grid axis 0), not leak the previous group's rows."""
    # Shrink the VMEM budget so the lane plan forces a second group at a
    # CPU-affordable batch width.
    monkeypatch.setattr(thomas_batch, "_VMEM_BUDGET_BYTES", 1 << 19)
    spec = ProblemSpec(3, 2, 4)
    sp, Lb, n_groups = thomas_batch.plan_packing(130, 3, 2)
    assert n_groups > 1, "this test must exercise multi-group packing"
    arrs = _batch(spec, 130, seed=77)
    rho = 1e-3
    lam_ref, dzx_ref, dzu_ref = _oracle(arrs, rho)
    res, dzx, dzu = thomas_batch.solve_direct_thomas_batched(*arrs, rho=rho)
    _assert_close(res.lam, lam_ref)
    _assert_close(dzx, dzx_ref)
    _assert_close(dzu, dzu_ref)


def test_solver_dispatch_boundary(monkeypatch):
    """fused+direct routes by batch width: thomas_batch at B >= _MIN_BATCH,
    the CR kernel below — and the routed result keeps oracle parity."""
    calls = []
    orig = thomas_batch.solve_direct_thomas_batched

    def spy(*a, **k):
        calls.append(a[0].shape[0])
        return orig(*a, **k)

    monkeypatch.setattr(thomas_batch, "solve_direct_thomas_batched", spy)
    spec = ProblemSpec(3, 2, 5)
    opts = SolverOptions(method="direct", rho=1e-2)

    wide = thomas_batch._MIN_BATCH
    arrs = _batch(spec, wide, seed=5)
    res = solve_batched(spec, arrs, opts, pcg_backend="fused")
    assert calls == [wide]
    lam_ref, _, _ = _oracle(arrs, 1e-2)
    _assert_close(res.lam, lam_ref)

    narrow = _batch(spec, 2, seed=9)
    solve_batched(spec, narrow, opts, pcg_backend="fused")
    assert calls == [wide], "below _MIN_BATCH must stay on the CR kernel"


# slow tier: the dp routing spy; the placement itself runs in the
# driver's dryrun (placement 4b) and test_packed_thomas_dp covers dp.
@pytest.mark.slow
def test_dp_per_shard_dispatch(monkeypatch):
    """solve_batched_dp(method='direct') picks by the PER-SHARD batch width:
    wide shards run the Thomas kernel, and results keep oracle parity."""
    from gato_tpu.parallel.sharded import solve_batched_dp

    calls = []
    orig = thomas_batch.solve_direct_thomas_batched

    def spy(*a, **k):
        calls.append(a[0].shape[0])
        return orig(*a, **k)

    monkeypatch.setattr(thomas_batch, "solve_direct_thomas_batched", spy)
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:2]), ("dp",))
    spec = ProblemSpec(3, 2, 4)
    B = 2 * thomas_batch._MIN_BATCH
    arrs = _batch(spec, B, seed=41)
    rho = 1e-2
    res, dzx, dzu = solve_batched_dp(mesh, *arrs, rho=rho, method="direct")
    assert calls == [thomas_batch._MIN_BATCH], \
        "each shard's local batch must route to the Thomas kernel"
    lam_ref, dzx_ref, dzu_ref = _oracle(arrs, rho)
    _assert_close(res.lam, lam_ref)
    _assert_close(dzx, dzx_ref)
    _assert_close(dzu, dzu_ref)


def test_packed_thomas_tier(monkeypatch):
    """pack(method='direct') plans the Thomas geometry at wide batches; the
    packed solve matches solve_batched (which routes the same kernel), the
    rhs-only refresh repacks correctly (shifted r), and tier='cr' opts out."""
    from gato_tpu import packed as pk

    spec = ProblemSpec(3, 2, 6)
    B = thomas_batch._MIN_BATCH
    arrs = _batch(spec, B, seed=13)
    opts = SolverOptions(method="direct", rho=1e-2)

    packed = pk.pack(spec, arrs, method="direct")
    assert packed.plan.tier == "thomas"
    assert packed.Qb.shape[0] == packed.plan.n_groups  # group axis leading
    res = pk.solve_packed(packed, opts).unpack()
    ref = solve_batched(spec, arrs, opts, pcg_backend="fused")
    _assert_close(res.lam, ref.lam, tol=1e-6)
    _assert_close(res.dz_x, ref.dz_x, tol=1e-6)
    _assert_close(res.dz_u, ref.dz_u, tol=1e-6)
    assert bool(jnp.all(res.converged))

    # rhs-only refresh: new q/r/c must reproduce a fresh full pack's solve.
    arrs2 = _batch(spec, B, seed=14)
    refreshed = pk.update_vectors(packed, arrs2[4], arrs2[5], arrs2[6])
    got = pk.solve_packed(refreshed, opts).unpack()
    fresh = pk.solve_packed(
        pk.pack(spec, arrs[:4] + arrs2[4:], method="direct"), opts).unpack()
    _assert_close(got.lam, fresh.lam, tol=1e-6)

    # tier='cr' keeps the cyclic-reduction geometry at the same batch.
    cr = pk.pack(spec, arrs, method="direct", tier="cr")
    assert cr.plan.tier == "fused"
    res_cr = pk.solve_packed(cr, opts).unpack()
    _assert_close(res_cr.lam, ref.lam)

    # An invalid tier string raises.
    with pytest.raises(ValueError):
        pk.pack(spec, arrs, method="direct", tier="nope")
    with pytest.raises(ValueError):
        pk.pack(spec, arrs, method="pcg", tier="thomas")


# slow tier: the dp-sharded Thomas fleet runs in every round's driver
# dryrun (__graft_entry__ placement 4b); the single-device packed tier
# test above stays default.
@pytest.mark.slow
def test_packed_thomas_dp(monkeypatch):
    """A Thomas pack fleet-serves over a dp mesh: the group axis shards,
    each device runs its local groups, results match the oracle."""
    from gato_tpu import packed as pk
    from gato_tpu.parallel.sharded import solve_packed_dp

    # Force two lane groups at a CPU-affordable width (cf.
    # test_multi_group_packing), so a 2-device mesh gets one group each.
    monkeypatch.setattr(thomas_batch, "_VMEM_BUDGET_BYTES", 1 << 19)
    spec = ProblemSpec(3, 2, 4)
    sp, Lb, n_groups = thomas_batch.plan_packing(256, 3, 2)
    assert (Lb, n_groups) == (128, 2)
    arrs = _batch(spec, 256, seed=55)
    opts = SolverOptions(method="direct", rho=1e-2)
    packed = pk.pack(spec, arrs, method="direct")
    assert packed.plan.tier == "thomas"
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:2]), ("dp",))
    res = solve_packed_dp(mesh, packed, opts).unpack()
    lam_ref, dzx_ref, dzu_ref = _oracle(arrs, 1e-2)
    _assert_close(res.lam, lam_ref)
    _assert_close(res.dz_x, dzx_ref)
    _assert_close(res.dz_u, dzu_ref)


# slow tier: accuracy hardening; the fast tier keeps oracle parity via
# test_matches_oracle and the GJ pivot lore is gated in test_fused_solve.
@pytest.mark.slow
def test_thomas_ill_conditioned():
    """Nearly-singular Hessian blocks (tiny rho): the no-pivot elimination
    stays accurate because every Dhat is a Schur complement of an SPD system
    (SPD itself) — same justification as direct_fused's CR, checked against
    the f64 dense oracle at f32-appropriate tolerance across the batch."""
    from gato_tpu.testing import dense_oracle

    spec = ProblemSpec(4, 2, 8)
    B, rho = 4, 1e-5
    arrs = _batch(spec, B, seed=8)
    # Scale Q down so rho dominates conditioning.
    arrs[0] = arrs[0] * 1e-3
    res, dzx, dzu = thomas_batch.solve_direct_thomas_batched(*arrs, rho=rho)
    from gato_tpu.formats import KKTBlocks

    for i in range(B):
        blocks = KKTBlocks(*(np.asarray(a[i]) for a in arrs))
        lam_ref, _ = dense_oracle(spec, blocks, rho=rho)
        err = (np.max(np.abs(np.asarray(res.lam[i]).ravel() - lam_ref))
               / np.max(np.abs(lam_ref)))
        assert err < 1e-3, (i, err)


def test_auto_backend_past_cr_budget(monkeypatch):
    """Auto backend selection keeps 'fused' past the CR kernel's packing
    budget when the batch is wide enough for the Thomas tier (K is
    VMEM-unbounded there), and the routed solve keeps oracle parity."""
    import jax as jax_mod

    from gato_tpu.kernels import direct_fused
    from gato_tpu.solver import default_pcg_backend

    class _FakeTPU:
        platform = "tpu"

    monkeypatch.setattr(jax_mod, "devices", lambda *a: [_FakeTPU()])
    monkeypatch.setattr(direct_fused, "fits_vmem", lambda *a: False)
    spec = ProblemSpec(3, 2, 5)
    B = thomas_batch._MIN_BATCH
    assert default_pcg_backend(spec=spec, method="direct",
                               batch=B) == "fused"
    # End to end through solve_batched's auto path (interpret kernels).
    arrs = _batch(spec, B, seed=3)
    opts = SolverOptions(method="direct", rho=1e-2)
    res = solve_batched(spec, arrs, opts)
    lam_ref, _, _ = _oracle(arrs, 1e-2)
    _assert_close(res.lam, lam_ref)
    assert bool(jnp.all(res.converged))


def test_should_dispatch_gates():
    s, c = 14, 7
    B = thomas_batch._MIN_BATCH
    assert thomas_batch.should_dispatch(B, 50, s, c)
    assert not thomas_batch.should_dispatch(B - 1, 50, s, c)
    # Past the HBM factor budget the tier declines (CR kernel serves it).
    assert not thomas_batch.fits(B, 10**9, s, c)
    # A state size too wide for even one lane tile raises at plan time...
    with pytest.raises(ValueError):
        thomas_batch.plan_packing(128, 200, 7)
    # ...and fits/should_dispatch report False instead of raising.
    assert not thomas_batch.fits(128, 50, 200, 7)
    assert not thomas_batch.should_dispatch(128, 50, 200, 7)
