"""Benchmark harness: BASELINE.json configs on the current default device.

Prints exactly ONE JSON line to stdout:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Headline metric: average per-solve device latency of the IIWA-default problem
(STATE_SIZE=14, CONTROL_SIZE=7, KNOT_POINTS=50 — reference install.bash:6) at
exit_tol=1e-6 — the TPU analog of the reference's per-solve cudaEvent loop
(gpu_library.cu:166-198).

Measurement methodology (hard-won on a remote-attached TPU):
  * The runtime serves repeat executions of bit-identical program+inputs from
    a cache, under-reporting by >100x, and jax.block_until_ready can return
    BEFORE device execution completes; the only reliable fence is fetching a
    scalar reduction of the result (4 bytes that data-depend on everything).
  * Every config is timed as a chain of solves INSIDE one jitted lax.scan,
    differencing two chain lengths (T vs 2T) so the ~27-30 ms transport round
    trip cancels exactly.
  * Each scan step perturbs BOTH q and Q (scaled by step index and the lam
    carry): perturbing only the rhs lets XLA hoist the entire loop-invariant
    condensation (S, Pinv assembly) out of the scan, under-reporting the
    XLA-path configs by ~3x while the opaque fused kernel can't hoist —
    the round-1 bench's silent flaw.  With Q perturbed every step is a
    genuinely cold full solve.
  * Chain lengths are sized so the T-vs-2T difference is >> the ~1-2 ms
    run-to-run jitter of a synced call, auto-doubling T once if a pilot
    difference comes back too small to trust.
  * Everything reports the median of >=2 independent repetitions plus the
    spread (|rep1 - rep2|), written to BENCH_DETAIL.json.

Before any timing, a PARITY GATE runs on-device: jax / pallas / fused must
agree on iteration counts exactly (the repo's core invariant, CLAUDE.md) and
on lambda to f32 round-off, for one IIWA problem and a ragged 5-problem
batch.  A Mosaic numerics regression therefore fails the bench loudly instead
of shipping a fast wrong number.

Time split (the GATO_TIMING analog, gato_schur.cuh:972-982): the condense /
PCG / recover spans of the 'jax' path are measured by differencing chains of
truncated pipelines (condense-only, condense+PCG, full).  The fused kernel is
a single Pallas program — no XLA-visible internal spans; its split is
"whole solve".

``vs_baseline``: the reference publishes no numbers (BASELINE.json
"published": {}), so this reports the speedup of the framework's best method
over its own PCG/'jax' path on the headline config.

Full details go to BENCH_DETAIL.json and stderr.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


from gato_tpu.timing import chain_time, measure_rtt_ms, perturb  # noqa: E402


def scan_chain_time(step_fn, q0, T, reps=7, n_independent=2,
                    min_diff_ms=8.0, label=""):
    """bench-local wrapper: gato_tpu.timing.chain_time with stderr logging."""
    return chain_time(step_fn, q0, T, reps=reps, n_independent=n_independent,
                      min_diff_ms=min_diff_ms, label=label, log=_log)


def _perturb(blocks, q0, lam_carry, t):
    return perturb(blocks, q0, lam_carry, t)


# --------------------------------------------------------------------------
# Configs


def _staged_blocks(spec, seed=7, batch=None):
    from gato_tpu.formats import KKTBlocks
    from gato_tpu.testing import random_blocks

    if batch is None:
        arrs = random_blocks(spec, seed=seed)
        blocks = KKTBlocks(*(jax.device_put(jnp.asarray(a)) for a in arrs))
    else:
        problems = [random_blocks(spec, seed=seed + i) for i in range(batch)]
        blocks = KKTBlocks(*(jax.device_put(
            jnp.asarray(np.stack([np.asarray(p[f]) for p in problems])))
            for f in range(7)))
    float(jnp.sum(blocks.q))  # fence staging
    return blocks


def bench_single(spec, options, backend, *, T=64):
    """Per-solve device latency via gato_tpu.timing.time_solve (the library
    form of this harness's chain methodology — one implementation of the
    staging/perturbation/anti-DCE step to keep in sync)."""
    from gato_tpu.solver import solve
    from gato_tpu.timing import time_solve

    blocks = _staged_blocks(spec)
    ms, info = time_solve(
        spec, blocks, options, pcg_backend=backend or "jax", T=T,
        label=f"single/{backend or options.method}/K={spec.knot_points}",
        log=_log,
    )

    # One plain solve for iteration count / convergence reporting.
    res = solve(spec, blocks, options, pcg_backend=backend or "jax")
    float(jnp.sum(res.lam))
    return {
        "avg_ms_device": round(ms, 6),
        "pcg_iters": int(res.iters),
        "converged": bool(res.converged),
        **info,
    }


def bench_split(spec, options, *, T=64):
    """Condense / PCG / recover spans of the 'jax' path — the GATO_TIMING
    analog (gato_schur.cuh:972-982) — by differencing truncated-pipeline
    chains.  The fused kernel is one Pallas program with no XLA-visible
    internal spans (its 'split' is the whole solve)."""
    from gato_tpu import assemble, pcg as pcg_mod, recover

    blocks = _staged_blocks(spec)
    dt = blocks.q.dtype
    rho = jnp.asarray(options.rho, dt)
    tol = jnp.asarray(options.exit_tol, dt)
    mi = jnp.asarray(options.max_iters, jnp.int32)
    pre = options.preconditioner

    def step_condense(q0, lam_carry, t):
        Q, q = _perturb(blocks, q0, lam_carry, t)
        sys = assemble.condense(Q, blocks.R, blocks.A, blocks.B, q,
                                blocks.r, blocks.c, rho, pre)
        # Touch every output so nothing is dead-code eliminated.
        return (sys.gamma + jnp.sum(sys.S, axis=(1, 3))
                + jnp.sum(sys.Pinv, axis=(1, 3))
                + jnp.sum(sys.Qinv, axis=2) + 1e-20 * jnp.sum(sys.Rinv))

    def step_pcg(q0, lam_carry, t):
        Q, q = _perturb(blocks, q0, lam_carry, t)
        sys = assemble.condense(Q, blocks.R, blocks.A, blocks.B, q,
                                blocks.r, blocks.c, rho, pre)
        res = pcg_mod.pcg(sys.S, sys.Pinv, sys.gamma,
                          exit_tol=tol, max_iters=mi)
        return res.lam + 1e-20 * (jnp.sum(sys.Qinv, axis=2)
                                  + jnp.sum(sys.Rinv))

    def step_full(q0, lam_carry, t):
        Q, q = _perturb(blocks, q0, lam_carry, t)
        sys = assemble.condense(Q, blocks.R, blocks.A, blocks.B, q,
                                blocks.r, blocks.c, rho, pre)
        res = pcg_mod.pcg(sys.S, sys.Pinv, sys.gamma,
                          exit_tol=tol, max_iters=mi)
        dz_x, dz_u = recover.recover_dz(sys.Qinv, sys.Rinv, blocks.A,
                                        blocks.B, q, blocks.r, res.lam)
        return res.lam + dz_x + jnp.sum(dz_u)

    ms_c, i_c = scan_chain_time(step_condense, blocks.q, T, label="split/condense")
    ms_cp, i_cp = scan_chain_time(step_pcg, blocks.q, T, label="split/condense+pcg")
    ms_full, i_f = scan_chain_time(step_full, blocks.q, T, label="split/full")
    return {
        "condense_ms": round(ms_c, 6),
        "pcg_ms": round(max(ms_cp - ms_c, 0.0), 6),
        "recover_ms": round(max(ms_full - ms_cp, 0.0), 6),
        "full_ms": round(ms_full, 6),
        "detail": {"condense": i_c, "condense_pcg": i_cp, "full": i_f},
    }


def bench_batch(spec, options, backend, batch=256, *, T=12):
    """Batch throughput via gato_tpu.timing.time_solve over a leading batch
    axis (same chain methodology as bench_single — the round-1 batch-size-
    differencing method disagreed with it by 2.7x because two ~29 ms synced
    medians differenced to ~0.5 ms sit inside transport jitter)."""
    from gato_tpu.timing import time_solve

    blocks = _staged_blocks(spec, seed=1000, batch=batch)
    ms, info = time_solve(
        spec, blocks, options, pcg_backend=backend or "jax", T=T,
        label=f"batch{batch}/{backend or options.method}", log=_log,
    )
    return {
        "batch": batch,
        "ms_per_batch": round(ms, 4),
        "solves_per_sec": round(batch / (ms / 1e3), 1),
        "us_per_solve": round(1e3 * ms / batch, 4),
        **info,
    }


def bench_mpc_farm(spec, options, T=128, B=16, reps=7):
    """MPC FARM: B warm-started dependent streams in lockstep
    (mpc.solve_sequence_batched) — T steps, each ONE fused lane-packed kernel
    call advancing all B streams; sequence-length differencing as in
    bench_mpc_sequence."""
    from gato_tpu.formats import KKTBlocks
    from gato_tpu.mpc import solve_sequence_batched
    from gato_tpu.testing import random_blocks

    rng = np.random.default_rng(3)

    def make_seq(length):
        base = [random_blocks(spec, seed=50 + b) for b in range(B)]
        stack = KKTBlocks(*(np.stack([np.asarray(p[f]) for p in base])
                            for f in range(7)))
        qs = np.asarray(stack.q)[None] + 0.01 * rng.normal(
            size=(length,) + stack.q.shape).astype(np.float32).cumsum(axis=0)
        qsc = (1.0 + 1e-4 * rng.normal(size=(length, 1, 1, 1, 1))).astype(
            np.float32)
        seq = KKTBlocks(*(jnp.broadcast_to(jnp.asarray(a), (length,) + a.shape)
                          for a in stack))._replace(
            q=jnp.asarray(qs), Q=jnp.asarray(np.asarray(stack.Q)[None] * qsc))
        seq = KKTBlocks(*(jax.device_put(a) for a in seq))
        float(jnp.sum(seq.q))
        return seq

    seq1, seq2 = make_seq(T), make_seq(2 * T)
    res = solve_sequence_batched(spec, seq1, options)
    float(jnp.sum(res.lam))
    float(jnp.sum(solve_sequence_batched(spec, seq2, options).lam))
    it = np.asarray(res.iters)

    def timed(seq, i):
        s2 = seq._replace(q=seq.q * (1.0 + 1e-6 * (i + 1)))
        t0 = time.perf_counter()
        float(jnp.sum(solve_sequence_batched(spec, s2, options).lam))
        return (time.perf_counter() - t0) * 1e3

    # Same raw-diff noise gate as bench_mpc_sequence: decide on the raw
    # T-vs-2T chain differences, never the floor-clamped per-step estimates
    # (a negative/jitter diff clamps to 1e-4 with zero spread and would pass
    # silently — the exact failure mode commit 04b1206 fixed there).
    min_diff_ms = 8.0
    diffs = []
    for k in range(4):
        t1 = float(np.median([timed(seq1, 10 * k + i) for i in range(reps)]))
        t2 = float(np.median([timed(seq2, 10 * k + i) for i in range(reps)]))
        diffs.append(t2 - t1)
        if k >= 1:
            med = float(np.median(diffs))
            if (med >= min_diff_ms
                    and float(np.max(diffs) - np.min(diffs)) < 0.5 * med):
                break
    estimates = [max(d / T, 1e-4) for d in diffs]
    ms_step = float(np.median(estimates))
    out = {
        "T": T,
        "B": B,
        "ms_per_step": round(ms_step, 6),
        "us_per_solve": round(1e3 * ms_step / B, 4),
        "solves_per_sec": round(B / (ms_step / 1e3), 1),
        "reps_ms": [round(e, 6) for e in estimates],
        "spread_ms": round(float(np.max(estimates) - np.min(estimates)), 6),
        "chain_diff_ms": round(float(np.median(diffs)), 3),
        "iters_first_mean": float(it[0].mean()),
        "iters_rest_mean": float(it[1:].mean()),
    }
    if float(np.median(diffs)) < min_diff_ms:
        out["noise_warning"] = (
            "sequence difference below noise floor; increase T")
    return out


def bench_mpc_sequence(spec, options, T=64, reps=7, pcg_backend=None):
    """BASELINE config 3: warm-start MPC-style repeated solves as ONE
    on-device lax.scan (gato_tpu.mpc.solve_sequence), differencing sequence
    lengths T vs 2T.  Q varies across steps (an SQP relinearization), so the
    per-step condensation is genuinely in the loop."""
    from gato_tpu.formats import KKTBlocks
    from gato_tpu.mpc import solve_sequence
    from gato_tpu.testing import random_blocks

    base = random_blocks(spec, seed=7)
    rng = np.random.default_rng(0)

    def make_seq(length):
        qs = np.asarray(base.q)[None] + 0.01 * rng.normal(
            size=(length,) + base.q.shape
        ).astype(np.float32).cumsum(axis=0)
        qscale = (1.0 + 1e-4 * rng.normal(size=(length, 1, 1, 1))).astype(
            np.float32)
        seq = KKTBlocks(
            *(jnp.broadcast_to(jnp.asarray(a), (length,) + a.shape)
              for a in base)
        )._replace(q=jnp.asarray(qs),
                   Q=jnp.asarray(np.asarray(base.Q)[None] * qscale))
        seq = KKTBlocks(*(jax.device_put(a) for a in seq))
        float(jnp.sum(seq.q))
        return seq

    seq1, seq2 = make_seq(T), make_seq(2 * T)
    res = solve_sequence(spec, seq1, options, pcg_backend=pcg_backend)
    float(jnp.sum(res.lam))  # compile T + execute
    float(jnp.sum(solve_sequence(spec, seq2, options,
                                 pcg_backend=pcg_backend).lam))  # compile 2T
    iters_per_step = [int(x) for x in np.asarray(res.iters)]  # ONE D2H

    def timed(seq, i):
        s2 = seq._replace(q=seq.q * (1.0 + 1e-6 * (i + 1)))
        t0 = time.perf_counter()
        float(jnp.sum(solve_sequence(spec, s2, options,
                                     pcg_backend=pcg_backend).lam))
        return (time.perf_counter() - t0) * 1e3

    # Noise guard (same philosophy as timing.chain_time's min_diff check):
    # the decision must use the RAW T-vs-2T differences, not the clamped
    # per-solve estimates — negative diffs clamp to a floor with zero spread,
    # which would wave a pure-jitter measurement straight through (observed:
    # a 4x under-report at healthy T, and a floor-clamped result at small T).
    min_diff_ms = 8.0
    diffs = []
    for k in range(4):
        t1 = float(np.median([timed(seq1, 10 * k + i) for i in range(reps)]))
        t2 = float(np.median([timed(seq2, 10 * k + i) for i in range(reps)]))
        diffs.append(t2 - t1)
        if k >= 1:
            med = float(np.median(diffs))
            if (med >= min_diff_ms
                    and float(np.max(diffs) - np.min(diffs)) < 0.5 * med):
                break
    estimates = [max(d / T, 1e-4) for d in diffs]
    ms_per_solve = float(np.median(estimates))
    out = {
        "T": T,
        "ms_per_solve": round(ms_per_solve, 6),
        "ms_per_sequence": round(ms_per_solve * T, 4),
        "reps_ms": [round(e, 6) for e in estimates],
        "spread_ms": round(float(np.max(estimates) - np.min(estimates)), 6),
        "chain_diff_ms": round(float(np.median(diffs)), 3),
        "iters_first": iters_per_step[0],
        "iters_rest_mean": float(np.mean(iters_per_step[1:])),
    }
    if float(np.median(diffs)) < min_diff_ms:
        out["noise_warning"] = (
            "sequence difference below noise floor; increase T")
    return out


# --------------------------------------------------------------------------
# Parity gate


def parity_gate(spec, options):
    """On-device numerics gate, run BEFORE any timing: jax / pallas / fused
    must agree on PCG iteration counts EXACTLY (CLAUDE.md invariant) and on
    lambda to f32 round-off, for one problem and a ragged batch.  Raises on
    any mismatch so a Mosaic regression fails the bench loudly."""
    from gato_tpu.formats import KKTBlocks
    from gato_tpu.problem import SolverOptions
    from gato_tpu.solver import solve, solve_batched
    from gato_tpu.testing import random_blocks

    report = {}
    single = _staged_blocks(spec, seed=7)
    results = {}
    for be in ("jax", "pallas", "fused"):
        r = solve(spec, single, options, pcg_backend=be)
        float(jnp.sum(r.lam))
        results[be] = r
    def check(ok, msg):
        # Explicit raise: bare asserts vanish under `python -O`, which would
        # silently disable the exact invariant this gate exists to enforce.
        if not ok:
            raise AssertionError(msg)

    it = {be: int(r.iters) for be, r in results.items()}
    report["single_iters"] = it
    check(len(set(it.values())) == 1, f"PARITY FAILURE single iters: {it}")
    ref = np.asarray(results["jax"].lam)
    scale = float(np.max(np.abs(ref))) or 1.0
    for be in ("pallas", "fused"):
        err = float(np.max(np.abs(np.asarray(results[be].lam) - ref))) / scale
        report[f"single_rel_err_{be}"] = err
        check(err < 1e-3, f"PARITY FAILURE lam {be}: rel err {err}")

    # Direct method: the fused cyclic-reduction kernel vs the XLA path
    # (both exact; agreement to f32 round-off).
    dopts = SolverOptions(rho=options.rho, method="direct")
    d_jax = solve(spec, single, dopts, pcg_backend="jax")
    d_fused = solve(spec, single, dopts, pcg_backend="fused")
    float(jnp.sum(d_jax.lam) + jnp.sum(d_fused.lam))
    dref = np.asarray(d_jax.lam)
    dscale = float(np.max(np.abs(dref))) or 1.0
    derr = float(np.max(np.abs(np.asarray(d_fused.lam) - dref))) / dscale
    report["direct_rel_err_fused"] = derr
    check(derr < 1e-3, f"PARITY FAILURE direct fused: rel err {derr}")

    # Ragged batch: different seeds -> different iteration counts.
    nb = 5
    batch = _staged_blocks(spec, seed=50, batch=nb)
    bres = {}
    for be in ("jax", "pallas", "fused"):
        r = solve_batched(spec, batch, options, pcg_backend=be)
        float(jnp.sum(r.lam))
        bres[be] = r
    bit = {be: [int(x) for x in np.asarray(r.iters)] for be, r in bres.items()}
    report["batch_iters"] = bit
    check(bit["jax"] == bit["pallas"] == bit["fused"],
          f"PARITY FAILURE batch iters: {bit}")
    refb = np.asarray(bres["jax"].lam)
    scaleb = float(np.max(np.abs(refb))) or 1.0
    for be in ("pallas", "fused"):
        err = float(np.max(np.abs(np.asarray(bres[be].lam) - refb))) / scaleb
        report[f"batch_rel_err_{be}"] = err
        check(err < 1e-3, f"PARITY FAILURE batch lam {be}: rel err {err}")
    report["ok"] = True
    return report


# --------------------------------------------------------------------------


def main():
    from gato_tpu.problem import ProblemSpec, SolverOptions
    from gato_tpu.solver import default_pcg_backend

    platform = jax.devices()[0].platform
    rtt = measure_rtt_ms()
    _log(f"device: {jax.devices()[0]} ({platform}), transport rtt ~{rtt:.1f} ms")

    opts = SolverOptions(exit_tol=1e-6, max_iters=200, rho=1e-3)
    direct_opts = SolverOptions(rho=1e-3, method="direct")
    iiwa = ProblemSpec(14, 7, 50)
    have_pallas = default_pcg_backend() == "fused"

    detail = {"platform": platform, "rtt_ms": rtt, "configs": {}}
    C = detail["configs"]

    if have_pallas:
        detail["parity_gate"] = parity_gate(iiwa, opts)
        _log(f"parity gate: {detail['parity_gate']}")

    C["pendulum_2_1_5_pcg"] = bench_single(ProblemSpec(2, 1, 5), opts, "jax",
                                           T=512)
    _log(f"pendulum pcg: {C['pendulum_2_1_5_pcg']}")
    C["iiwa_pcg"] = bench_single(iiwa, opts, "jax")
    _log(f"iiwa pcg: {C['iiwa_pcg']}")
    C["iiwa_direct"] = bench_single(iiwa, direct_opts, "jax")
    _log(f"iiwa direct: {C['iiwa_direct']}")
    if have_pallas:
        # The fused cyclic-reduction kernel: exact solve at iterative-path
        # latency (kernels/direct_fused.py).
        C["iiwa_direct_fused"] = bench_single(iiwa, direct_opts, "fused",
                                              T=512)
        _log(f"iiwa direct fused: {C['iiwa_direct_fused']}")
    C["iiwa_split_jax"] = bench_split(iiwa, opts)
    _log(f"iiwa split: {C['iiwa_split_jax']}")
    if have_pallas:
        C["iiwa_pcg_pallas"] = bench_single(iiwa, opts, "pallas", T=256)
        _log(f"iiwa pallas: {C['iiwa_pcg_pallas']}")
        C["iiwa_fused"] = bench_single(iiwa, opts, "fused", T=512)
        _log(f"iiwa fused: {C['iiwa_fused']}")
        poly2 = SolverOptions(exit_tol=1e-6, max_iters=200, rho=1e-3,
                              precond_poly_degree=2)
        C["iiwa_fused_poly2"] = bench_single(iiwa, poly2, "fused", T=512)
        _log(f"iiwa fused poly2: {C['iiwa_fused_poly2']}")
    for K in (100, 250, 500):
        C[f"iiwa_horizon_{K}_pcg"] = bench_single(
            ProblemSpec(14, 7, K), opts, "jax", T=max(32, 6400 // K))
        _log(f"horizon {K} jax: {C[f'iiwa_horizon_{K}_pcg']}")
        if have_pallas:
            C[f"iiwa_horizon_{K}_fused"] = bench_single(
                ProblemSpec(14, 7, K), opts, "fused",
                T=512 if K <= 256 else 256)
            _log(f"horizon {K} fused: {C[f'iiwa_horizon_{K}_fused']}")

    # Past the VMEM budget: the HBM-streamed kernel tier (K=1024 does not
    # fit the resident kernels at s=14).
    C["iiwa_horizon_1024_pcg"] = bench_single(
        ProblemSpec(14, 7, 1024), opts, "jax", T=16)
    _log(f"horizon 1024 jax: {C['iiwa_horizon_1024_pcg']}")
    if have_pallas:
        C["iiwa_horizon_1024_streamed"] = bench_single(
            ProblemSpec(14, 7, 1024), opts, "pallas", T=16)
        _log(f"horizon 1024 streamed: {C['iiwa_horizon_1024_streamed']}")

    if have_pallas:
        C["iiwa_batch_256_fused"] = bench_batch(iiwa, opts, "fused", T=32)
        _log(f"batch fused: {C['iiwa_batch_256_fused']}")
        C["iiwa_batch_256_pcg_pallas"] = bench_batch(iiwa, opts, "pallas", T=6)
        _log(f"batch pcg: {C['iiwa_batch_256_pcg_pallas']}")
    C["iiwa_batch_256_direct"] = bench_batch(iiwa, direct_opts, "jax", T=6)
    _log(f"batch direct: {C['iiwa_batch_256_direct']}")
    if have_pallas:
        C["iiwa_batch_256_direct_fused"] = bench_batch(iiwa, direct_opts,
                                                       "fused", T=32)
        _log(f"batch direct fused: {C['iiwa_batch_256_direct_fused']}")
    C["iiwa_mpc_sequence"] = bench_mpc_sequence(iiwa, opts, T=128,
                                                pcg_backend="jax")
    _log(f"mpc sequence (jax): {C['iiwa_mpc_sequence']}")
    if have_pallas:
        # The fused step is ~10x faster, so the sequence-length differencing
        # needs a much longer sequence to rise above transport jitter.
        C["iiwa_mpc_sequence_fused"] = bench_mpc_sequence(iiwa, opts, T=1024)
        _log(f"mpc sequence (fused): {C['iiwa_mpc_sequence_fused']}")
        C["iiwa_mpc_farm_16"] = bench_mpc_farm(iiwa, opts, T=256, B=16)
        _log(f"mpc farm: {C['iiwa_mpc_farm_16']}")

    pcg_ms = C["iiwa_pcg"]["avg_ms_device"]
    candidates = [("pcg", pcg_ms), ("direct", C["iiwa_direct"]["avg_ms_device"])]
    if have_pallas:
        candidates.append(("fused", C["iiwa_fused"]["avg_ms_device"]))
        candidates.append(("fused_poly2", C["iiwa_fused_poly2"]["avg_ms_device"]))
        candidates.append(("direct_fused",
                           C["iiwa_direct_fused"]["avg_ms_device"]))
    best_name, best_ms = min(candidates, key=lambda kv: kv[1])
    detail["headline_method"] = best_name

    with open("BENCH_DETAIL.json", "w") as f:
        json.dump(detail, f, indent=2)

    print(json.dumps({
        "metric": "iiwa_14_7_50_avg_solve_ms",
        "value": round(best_ms, 4),
        "unit": "ms",
        "vs_baseline": round(pcg_ms / best_ms, 3),
    }))


if __name__ == "__main__":
    main()
