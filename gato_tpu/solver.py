"""High-level solver: condense -> PCG -> recover, as one jitted function.

This is the idiomatic TPU API (the reference-signature shim lives in api.py).
The whole solve — CSR blocks already packed — is a single ``jax.jit`` program:
one dispatch, zero host<->device round-trips, workspaces managed by XLA.  The
reference re-allocates every workspace and re-launches 5 kernels per solve
(gpu_library.cu:25-83), paying allocator and launch latency each time.

Static under jit: array shapes (ProblemSpec) and the preconditioner kind.
Runtime: rho, exit_tol, max_iters, warm-start lambda — so an MPC loop that
adapts rho/tol retraces nothing (the reference needs a full CSR->dense
re-conversion per rho and a *recompile* per shape).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import assemble, blocktri, pcg as pcg_mod, recover
from .formats import KKTBlocks
from .problem import Preconditioner, ProblemSpec, SolverOptions


class SolveResult(NamedTuple):
    lam: jnp.ndarray        # (K, s)   multipliers
    dz_x: jnp.ndarray       # (K, s)   state steps
    dz_u: jnp.ndarray       # (K-1, c) control steps
    iters: jnp.ndarray      # ()       PCG iterations (reference counting)
    converged: jnp.ndarray  # ()       bool
    eta: jnp.ndarray        # ()       final |r . Pinv r|

    def dz_flat(self) -> np.ndarray:
        """Interleaved [dz_x0, dz_u0, ..., dz_x_{K-1}] as the reference
        returns — one implementation of the layout (formats.interleave_dz)."""
        from .formats import interleave_dz
        from .problem import ProblemSpec

        dz_x = np.asarray(self.dz_x)
        dz_u = np.asarray(self.dz_u)
        K, s = dz_x.shape
        c = dz_u.shape[-1]
        return interleave_dz(ProblemSpec(s, c, K), dz_x, dz_u)

    def lam_flat(self) -> np.ndarray:
        return np.asarray(self.lam).reshape(-1)


def _direct_result(sys, batched: bool):
    """Exact solve of S lam = gamma (direct.py).  iters=0 by definition; eta
    reports the squared true residual norm of the returned solution, and
    ``converged`` is derived from it (direct.residual_converged) — a
    singular/garbage system reports False instead of an unconditional True."""
    from . import direct

    lam = direct.btd_solve_auto(sys.S, sys.gamma)
    mv = jax.vmap(blocktri.btd_matvec) if batched else blocktri.btd_matvec
    resid = sys.gamma - mv(sys.S, lam)
    axes = tuple(range(resid.ndim - 2, resid.ndim))
    eta = jnp.sum(resid * resid, axis=axes)
    gamma_sq = jnp.sum(sys.gamma * sys.gamma, axis=axes)
    shape = resid.shape[:-2]
    return pcg_mod.PCGResult(
        lam=lam,
        iters=jnp.zeros(shape, jnp.int32),
        converged=direct.residual_converged(eta, gamma_sq),
        eta=eta,
    )


@functools.partial(
    jax.jit,
    static_argnames=("preconditioner", "pcg_backend", "method", "poly_degree"),
)
def _solve_core(
    Q, R, A, B, q, r, c,
    lam0, rho, exit_tol, max_iters,
    preconditioner: Preconditioner,
    pcg_backend: str,
    method: str = "pcg",
    poly_degree: int = 1,
):
    if pcg_backend == "fused":
        # Whole solve in one Pallas program (B=1 lane packing) — the
        # single-problem analog of the reference's one-resident-kernel-per-
        # solve design (gato_pcg.cuh:270-470).  method='direct' runs the
        # cyclic-reduction kernel instead of PCG (no reference equivalent).
        if method == "direct":
            from .kernels import direct_fused

            res, dz_x, dz_u = direct_fused.solve_direct_fused_batched(
                Q[None], R[None], A[None], B[None],
                q[None], r[None], c[None], rho=rho,
            )
        else:
            from .kernels import fused_solve

            res, dz_x, dz_u = fused_solve.solve_fused_batched(
                Q[None], R[None], A[None], B[None],
                q[None], r[None], c[None], lam0[None],
                rho=rho, exit_tol=exit_tol, max_iters=max_iters,
                poly_degree=poly_degree, preconditioner=preconditioner.value,
            )
        return SolveResult(
            lam=res.lam[0], dz_x=dz_x[0], dz_u=dz_u[0],
            iters=res.iters[0], converged=res.converged[0] != 0,
            eta=res.eta[0],
        )
    if pcg_backend == "pallas" and method == "direct":
        from .kernels import longk

        # Long-horizon EXACT ladder: chunked condensation + whole block
        # cyclic reduction — one kernel on the DMA'd operator within
        # fits_direct_xl, the hybrid compacting-peel tier beyond
        # (longk.direct_tier picks; valid at any K) — + packed recovery
        # (longk.solve_direct_longk), the method='direct' analog of the
        # longk PCG tiers below.
        res, dz_x, dz_u = longk.solve_direct_longk(
            Q, R, A, B, q, r, c, rho=rho,
        )
        return SolveResult(
            lam=res.lam, dz_x=dz_x, dz_u=dz_u,
            iters=res.iters, converged=res.converged, eta=res.eta,
        )
    if pcg_backend == "pallas" and method == "pcg":
        from .kernels import longk

        if longk.should_dispatch(q.shape[0], q.shape[1], r.shape[1]):
            # Long-horizon whole-solve tier: condensation, the PCG loop
            # (single-kernel condense+PCG / resident-XL / HBM-streamed per
            # fits_fused_xl/fits_xl), and recovery all in lane-packed
            # kernels (kernels/longk.py) — the role of the reference's
            # parallelPCG_fixed regime (gato_pcg.cuh:17-268).
            res, dz_x, dz_u = longk.solve_longk(
                Q, R, A, B, q, r, c, lam0,
                rho=rho, exit_tol=exit_tol, max_iters=max_iters,
                poly_degree=poly_degree, preconditioner=preconditioner.value,
            )
            return SolveResult(
                lam=res.lam, dz_x=dz_x, dz_u=dz_u,
                iters=res.iters, converged=res.converged, eta=res.eta,
            )
    precond = None if method == "direct" else preconditioner
    sys = assemble.condense(Q, R, A, B, q, r, c, rho, precond)
    if method == "direct":
        res = _direct_result(sys, batched=False)
    elif pcg_backend == "pallas":
        from .kernels import pcg_pallas, pcg_streamed

        if pcg_pallas.fits_vmem(q.shape[0], q.shape[1]):
            res = pcg_pallas.pcg_fused(
                sys.S, sys.Pinv, sys.gamma, lam0,
                exit_tol=exit_tol, max_iters=max_iters,
                poly_degree=poly_degree,
            )
        else:
            # Over the VMEM budget: HBM-streamed kernel — the check_sms ->
            # parallelPCG_fixed decision (gato_utils.cuh:829-854).
            res = pcg_streamed.pcg_streamed(
                sys.S, sys.Pinv, sys.gamma, lam0,
                exit_tol=exit_tol, max_iters=max_iters,
                poly_degree=poly_degree,
            )
    else:
        res = pcg_mod.pcg(
            sys.S, sys.Pinv, sys.gamma, lam0,
            exit_tol=exit_tol, max_iters=max_iters,
            poly_degree=poly_degree,
        )
    dz_x, dz_u = recover.recover_dz(sys.Qinv, sys.Rinv, A, B, q, r, res.lam)
    return SolveResult(
        lam=res.lam, dz_x=dz_x, dz_u=dz_u,
        iters=res.iters, converged=res.converged, eta=res.eta,
    )


def _as_jnp(blocks: KKTBlocks, dtype) -> KKTBlocks:
    return KKTBlocks(*(jnp.asarray(a, dtype=dtype) for a in blocks))


# Device-constant cache for per-call scalars (rho, exit_tol, max_iters) and
# cold-start lambda zeros.  Without it every solve() issues fresh host->device
# transfers, which dominates latency on remote-attached TPUs (measured ~30 ms
# per transfer over an axon tunnel vs ~0.5 ms of actual solve compute).  The
# reference has the same pattern on its own scale: it keeps CSR inputs
# device-resident across the testiters loop (gpu_library.cu:140-157).
_CONST_CACHE: dict = {}


def _cached_const(value, dtype, shape=None):
    key = (repr(value), str(dtype), shape)
    out = _CONST_CACHE.get(key)
    if out is None:
        if len(_CONST_CACHE) > 512:
            _CONST_CACHE.clear()
        if shape is None:
            out = jnp.asarray(value, dtype)
        else:
            out = jnp.full(shape, value, dtype)
        if isinstance(out, jax.core.Tracer):
            # solve()/solve_batched() is itself being traced (e.g. wrapped in
            # an outer jit); constants are then just graph nodes — no transfer
            # to amortize and nothing concrete to cache.
            return out
        out.block_until_ready()
        _CONST_CACHE[key] = out
    return out


VALID_PCG_BACKENDS = ("jax", "pallas", "fused")


def _reject_non_f32_kernels(pcg_backend: Optional[str], dtype) -> None:
    """Surface-level rejection of explicit kernel backends with non-f32
    dtypes: the Mosaic kernels lower float32 only, and without this check an
    explicit 'fused'/'pallas' + dtype='float64' request dies much later in an
    opaque Mosaic lowering error (auto-selection already routes f64 to 'jax'
    in default_pcg_backend)."""
    if pcg_backend in ("pallas", "fused") and jnp.dtype(dtype) != jnp.float32:
        raise ValueError(
            f"pcg_backend={pcg_backend!r} runs float32-only Mosaic kernels; "
            f"dtype={dtype!r} needs pcg_backend None (auto) or 'jax'"
        )


def default_pcg_backend(
    batched: bool = False, spec: Optional[ProblemSpec] = None,
    method: str = "pcg", dtype="float32", batch: Optional[int] = None,
) -> str:
    """Backend auto-selection.

    * CPU/GPU: always 'jax' (the pure path is the portable fallback and the
      numerics oracle).
    * TPU: 'fused' — the whole solve (condense + solve + recovery) in one
      lane-packed Pallas program, batched or not; ~12x the split pallas-PCG
      path on batches, ~10x the 'jax' path on single solves (measured v5e,
      BENCH_DETAIL.json).  method='pcg' runs the PCG kernel (all three
      preconditioners assembled in-kernel); method='direct' runs the
      cyclic-reduction kernel (kernels/direct_fused.py).
    * TPU, horizon too long for the fused kernel's VMEM residency: 'pallas'
      — for PCG the long-horizon whole-solve tiers (kernels/longk.py, then
      kernels/pcg_streamed.py past them), the role of the reference's
      strided ``parallelPCG_fixed`` (gato_pcg.cuh:17-268) after its
      ``check_sms`` capacity decision (gato_utils.cuh:829-854); for direct
      the one-kernel cyclic-reduction tier (longk.solve_direct_longk)
      while it fits VMEM, and the hybrid tier (compacting XLA peels + the
      kernel CR on the reduced system — faster than the jax Thomas scan
      at narrow batch, measured round 5) beyond: 'pallas' at any K.
    """
    del batched  # the fused kernels pack lanes well at any batch size
    if jnp.dtype(dtype) != jnp.float32:
        # The Mosaic kernels are f32-only; non-f32 compute (the f64
        # end-to-end mode) runs the pure-XLA path.  This lives here so EVERY
        # auto-selector (solve, solve_batched, the MPC sequences) inherits
        # it; an explicit kernel request with f64 inputs fails in the kernel.
        return "jax"
    try:
        platform = jax.devices()[0].platform
    except Exception:
        platform = "cpu"
    if platform != "tpu":
        return "jax"
    try:
        from .kernels import direct_fused, fused_solve  # noqa: F401
    except ImportError:
        return "jax"
    if method == "direct":
        if spec is not None and not direct_fused.fits_vmem(
            spec.knot_points, spec.state_size, spec.control_size
        ):
            # Past the fused cyclic-reduction kernel's packing budget, a
            # wide-enough batch still has a 'fused' kernel: the batch-in-
            # lanes Thomas tier is VMEM-unbounded in K (factor stacks
            # stream to HBM) and much faster than the per-problem longk CR
            # at batch scale — the same width boundary the fused dispatch
            # itself uses (thomas_batch.should_dispatch).
            if batch is not None:
                from .kernels import thomas_batch

                if thomas_batch.should_dispatch(
                    batch, spec.knot_points, spec.state_size,
                    spec.control_size,
                ):
                    return "fused"
            # Otherwise the long-horizon direct ladder
            # (longk.solve_direct_longk): one-kernel whole CR on the DMA'd
            # operator within fits_direct_xl, and the HYBRID tier beyond
            # (compacting XLA peels + the kernel CR on the reduced system
            # — measured FASTER than the jax Thomas scan at narrow batch:
            # 0.34 vs ~1.0 ms at K=2048/B=1, 0.79 vs 2.10 at K=4096, v5e
            # round 5), so auto stays 'pallas' at ANY K here.
            return "pallas"
        return "fused"
    if spec is not None and not fused_solve.fits_vmem(
        spec.knot_points, spec.state_size, spec.control_size
    ):
        return "pallas"
    return "fused"


def _resolve_backend(
    pcg_backend: Optional[str],
    options: SolverOptions,
    batched: bool,
    spec: Optional[ProblemSpec] = None,
    batch: Optional[int] = None,
) -> str:
    """Validate an explicit backend choice, or auto-select.

    Explicit requests that cannot be honored raise instead of silently
    degrading — matching the reference's explicit kernel-select contract
    (check_sms exits rather than running the wrong kernel,
    gato_utils.cuh:836-839).  Auto-selection (None) picks the fastest
    backend compatible with the options and problem size."""
    if pcg_backend is None:
        # default_pcg_backend is method-aware: 'pallas' means the longk
        # PCG tiers for method='pcg' and the longk direct tier for
        # method='direct' (both within their VMEM reach by construction).
        return default_pcg_backend(batched, spec=spec,
                                   method=options.method,
                                   dtype=options.dtype, batch=batch)
    if pcg_backend not in VALID_PCG_BACKENDS:
        raise ValueError(
            f"unknown pcg_backend {pcg_backend!r}; valid choices are "
            f"{VALID_PCG_BACKENDS} or None for auto-selection"
        )
    # 'pallas' + method='direct' = the long-horizon cyclic-reduction ladder
    # (kernels/longk.py): the one-kernel CR on the DMA'd operator within
    # fits_direct_xl, the hybrid compacting-peel tier beyond (unlimited K,
    # longk.direct_tier picks) — so the explicit request is valid at any K.
    _reject_non_f32_kernels(pcg_backend, options.dtype)
    return pcg_backend


def solve(
    spec: ProblemSpec,
    blocks: KKTBlocks,
    options: SolverOptions = SolverOptions(),
    lam0: Optional[jnp.ndarray] = None,
    pcg_backend: Optional[str] = None,
) -> SolveResult:
    """Solve one KKT system.

    Args:
      spec: static problem shape (consistency-checked against ``blocks``).
      blocks: packed KKT data (see formats.pack_kkt).
      options: runtime solver options.
      lam0: optional (K, s) warm-start multipliers; used only when
        ``options.warm_start`` — matching the reference API surface
        (gpu_library.cu:46-47), except that here warm starting actually works.
      pcg_backend: 'jax' | 'pallas' | 'fused' | None (auto).  Unknown strings
        and option-incompatible explicit choices raise ValueError.
    """
    dtype = jnp.dtype(options.dtype)
    b = _as_jnp(blocks, dtype)
    from .formats import check_block_shapes

    check_block_shapes(spec, b)  # every field — kernel paths zero-pad
    K, s = b.Q.shape[0], b.Q.shape[1]

    if options.warm_start and lam0 is not None:
        lam0 = jnp.asarray(lam0, dtype=dtype).reshape(K, s)
    else:
        lam0 = _cached_const(0, dtype, (K, s))

    backend = _resolve_backend(pcg_backend, options, batched=False, spec=spec)
    return _solve_core(
        b.Q, b.R, b.A, b.B, b.q, b.r, b.c,
        lam0,
        _cached_const(options.rho, dtype),
        _cached_const(options.exit_tol, dtype),
        _cached_const(options.max_iters, jnp.int32),
        options.preconditioner,
        backend,
        options.method,
        options.precond_poly_degree,
    )


@functools.partial(
    jax.jit,
    static_argnames=("preconditioner", "pcg_backend", "method", "poly_degree"),
)
def _solve_batched_core(
    Q, R, A, B, q, r, c, lam0, rho, exit_tol, max_iters,
    preconditioner: Preconditioner,
    pcg_backend: str,
    method: str = "pcg",
    poly_degree: int = 1,
):
    if pcg_backend == "fused":
        # Whole solve (condense + solve + recovery) in one Pallas program —
        # skips assemble.condense entirely.  method='direct' picks between
        # two fused exact kernels by batch width: batch-in-lanes block-
        # Thomas at wide batches (full lane occupancy, ~1x issued FLOPs),
        # knots-in-lanes cyclic reduction below (knot-parallel latency) —
        # see thomas_batch.should_dispatch for the measured crossover.
        if method == "direct":
            from .kernels import direct_fused, thomas_batch

            if thomas_batch.should_dispatch(
                Q.shape[0], Q.shape[1], Q.shape[2], R.shape[-1]
            ):
                res, dz_x, dz_u = thomas_batch.solve_direct_thomas_batched(
                    Q, R, A, B, q, r, c, rho=rho,
                )
            else:
                res, dz_x, dz_u = direct_fused.solve_direct_fused_batched(
                    Q, R, A, B, q, r, c, rho=rho,
                )
        else:
            from .kernels import fused_solve

            res, dz_x, dz_u = fused_solve.solve_fused_batched(
                Q, R, A, B, q, r, c, lam0,
                rho=rho, exit_tol=exit_tol, max_iters=max_iters,
                poly_degree=poly_degree, preconditioner=preconditioner.value,
            )
        return SolveResult(
            lam=res.lam, dz_x=dz_x, dz_u=dz_u,
            iters=res.iters, converged=res.converged, eta=res.eta,
        )
    if pcg_backend == "pallas" and method == "direct":
        from .kernels import longk

        # Long-horizon EXACT tier (see _solve_core).
        res, dz_x, dz_u = longk.solve_direct_longk_batched(
            Q, R, A, B, q, r, c, rho=rho,
        )
        return SolveResult(
            lam=res.lam, dz_x=dz_x, dz_u=dz_u,
            iters=res.iters, converged=res.converged, eta=res.eta,
        )
    if pcg_backend == "pallas" and method == "pcg":
        from .kernels import longk

        if longk.should_dispatch(q.shape[1], q.shape[2], r.shape[2]):
            # Long-horizon whole-solve tier (see _solve_core).
            res, dz_x, dz_u = longk.solve_longk_batched(
                Q, R, A, B, q, r, c, lam0,
                rho=rho, exit_tol=exit_tol, max_iters=max_iters,
                poly_degree=poly_degree, preconditioner=preconditioner.value,
            )
            return SolveResult(
                lam=res.lam, dz_x=dz_x, dz_u=dz_u,
                iters=res.iters, converged=res.converged, eta=res.eta,
            )
    precond = None if method == "direct" else preconditioner
    sys = jax.vmap(
        lambda *xs: assemble.condense(*xs, rho, precond)
    )(Q, R, A, B, q, r, c)
    if method == "direct":
        res = _direct_result(sys, batched=True)
    elif pcg_backend == "pallas":
        from .kernels import pcg_pallas, pcg_streamed

        if pcg_pallas.fits_vmem(q.shape[1], q.shape[2]):
            res = pcg_pallas.pcg_fused_batched(
                sys.S, sys.Pinv, sys.gamma, lam0,
                exit_tol=exit_tol, max_iters=max_iters,
                poly_degree=poly_degree,
            )
        else:
            res = pcg_streamed.pcg_streamed_batched(
                sys.S, sys.Pinv, sys.gamma, lam0,
                exit_tol=exit_tol, max_iters=max_iters,
                poly_degree=poly_degree,
            )
    else:
        res = jax.vmap(
            lambda S, P, g, l: pcg_mod.pcg(
                S, P, g, l, exit_tol=exit_tol, max_iters=max_iters,
                poly_degree=poly_degree,
            )
        )(sys.S, sys.Pinv, sys.gamma, lam0)
    dz_x, dz_u = jax.vmap(recover.recover_dz)(
        sys.Qinv, sys.Rinv, A, B, q, r, res.lam
    )
    return SolveResult(
        lam=res.lam, dz_x=dz_x, dz_u=dz_u,
        iters=res.iters, converged=res.converged, eta=res.eta,
    )


def solve_batched(
    spec: ProblemSpec,
    blocks: KKTBlocks,
    options: SolverOptions = SolverOptions(),
    lam0: Optional[jnp.ndarray] = None,
    pcg_backend: Optional[str] = None,
) -> SolveResult:
    """Solve a batch of independent KKT systems (leading batch axis on every
    array in ``blocks``).  No reference equivalent — the CUDA solver handles one
    problem per call; batching is the headline TPU win (MXU/VPU saturation).

    Per-problem convergence is exact: problems that converge early stop
    updating while the rest of the batch iterates (masked updates in pcg.py).
    """
    dtype = jnp.dtype(options.dtype)
    b = _as_jnp(blocks, dtype)
    if b.Q.ndim != 4:
        raise ValueError(
            f"solve_batched expects a leading batch axis on every array "
            f"(Q (B, K, s, s)); got Q shape {b.Q.shape}")
    Bn, K, s = b.Q.shape[0], b.Q.shape[1], b.Q.shape[2]
    from .formats import check_block_shapes

    check_block_shapes(spec, b, lead=(Bn,))

    if options.warm_start and lam0 is not None:
        lam0 = jnp.asarray(lam0, dtype=dtype).reshape(Bn, K, s)
    else:
        lam0 = _cached_const(0, dtype, (Bn, K, s))

    backend = _resolve_backend(pcg_backend, options, batched=True,
                               spec=spec, batch=Bn)
    return _solve_batched_core(
        b.Q, b.R, b.A, b.B, b.q, b.r, b.c,
        lam0,
        _cached_const(options.rho, dtype),
        _cached_const(options.exit_tol, dtype),
        _cached_const(options.max_iters, jnp.int32),
        options.preconditioner,
        backend,
        options.method,
        options.precond_poly_degree,
    )
