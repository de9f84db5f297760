"""Benchmark harness: BASELINE.json configs on the current default device.

Prints exactly ONE JSON line to stdout:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Headline metric: average per-solve device latency of the IIWA-default problem
(STATE_SIZE=14, CONTROL_SIZE=7, KNOT_POINTS=50 — reference install.bash:6) at
exit_tol=1e-6 — the TPU analog of the reference's per-solve cudaEvent loop
(gpu_library.cu:166-198).

Measurement methodology (hard-won on a remote-attached TPU):
  * The runtime serves repeat executions of bit-identical program+inputs from
    a cache, under-reporting by >100x.  Host-side chaining is not enough: a
    perturbation that saturates (e.g. tanh of large multipliers) converges to
    a bit-identical fixed point after one link and re-enables the cache.
  * jax.block_until_ready can return BEFORE device execution completes on
    this transport; the only reliable fence is fetching a scalar reduction
    of the result to the host (4 bytes that data-depend on everything).
  * Per-solve times far below the ~27 ms fetch round-trip are resolved by
    running chains INSIDE one jitted lax.scan with per-step non-converging
    perturbations and differencing two chain lengths (T vs 2T), which
    cancels the transport exactly.
  * Larger units of work (the 256-problem batch) are timed as scalar-fetch
    synchronized calls minus the measured fetch round-trip.

``vs_baseline``: the reference publishes no numbers (BASELINE.json
"published": {}), so this reports the speedup of the framework's best method
over its own PCG/'jax' path on the headline config.

Full details go to BENCH_DETAIL.json and stderr.
"""

from __future__ import annotations

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def measure_rtt_ms(reps: int = 10) -> float:
    """Transport round trip: time to fetch a 4-byte result to the host.

    NOTE: jax.block_until_ready is NOT a reliable fence on this transport (it
    can return before device execution completes), so every timing in this
    harness synchronizes by fetching a scalar reduction of the result —
    4 bytes of D2H that data-depend on the full computation."""
    f = jax.jit(lambda x: jnp.sum(x))
    float(f(jnp.ones((8, 128))))
    ts = []
    for i in range(reps):
        x = jnp.full((8, 128), float(i + 1))
        t0 = time.perf_counter()
        float(f(x))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def _scan_chain_time(step_fn, q0, T: int, reps: int = 5):
    """Per-solve device time from chained solves inside jitted lax.scans.

    step_fn(q, lam_carry, t) -> (lam, aux).  The perturbation inside step_fn
    must depend on both lam_carry and t so no two steps see identical inputs.

    Times scans of length T and 2T and differences them, so the per-dispatch
    transport cost — which jitters between ~0 and ~30 ms here — cancels
    exactly instead of polluting the per-step quotient.
    """

    def make_chain(length):
        @jax.jit
        def chain(q0):
            def body(carry, t):
                lam, _ = step_fn(q0, carry, t)
                return lam, None
            lam, _ = jax.lax.scan(
                body, jnp.zeros_like(q0),
                jnp.arange(length, dtype=jnp.float32),
            )
            return jnp.sum(lam)
        return chain

    c1, c2 = make_chain(T), make_chain(2 * T)
    float(c1(q0))  # compile
    float(c2(q0))

    def timed(chain, rep):
        q = q0 * (1.0 + 1e-6 * (rep + 1))
        t0 = time.perf_counter()
        float(chain(q))  # scalar fetch = the only reliable fence here
        return (time.perf_counter() - t0) * 1e3

    t1 = float(np.median([timed(c1, r) for r in range(reps)]))
    t2 = float(np.median([timed(c2, r) for r in range(reps)]))
    return max((t2 - t1) / T, 1e-4)


def bench_single(spec, options, backend, *, T=20):
    """Per-solve device latency via an in-scan cold-solve chain."""
    from gato_tpu.formats import KKTBlocks
    from gato_tpu.solver import _solve_core
    from gato_tpu.testing import random_blocks

    blocks = KKTBlocks(*(jax.device_put(jnp.asarray(a))
                         for a in random_blocks(spec, seed=7)))
    jax.block_until_ready(blocks.Q)
    core = functools.partial(
        _solve_core.__wrapped__,
        preconditioner=options.preconditioner,
        pcg_backend=backend or "jax",
        method=options.method,
    )
    dt = blocks.q.dtype
    rho = jnp.asarray(options.rho, dt)
    tol = jnp.asarray(options.exit_tol, dt)
    mi = jnp.asarray(options.max_iters, jnp.int32)
    zero_lam = jnp.zeros_like(blocks.q)

    def step(q0, lam_carry, t):
        q = q0 * (1.0 + 1e-6 * jnp.cos(t)) + 1e-7 * lam_carry
        res = core(blocks.Q, blocks.R, blocks.A, blocks.B, q, blocks.r,
                   blocks.c, zero_lam, rho, tol, mi)
        return res.lam, None

    ms = _scan_chain_time(step, blocks.q, T)

    # One plain solve for iteration count / convergence reporting.
    res = core(blocks.Q, blocks.R, blocks.A, blocks.B, blocks.q, blocks.r,
               blocks.c, zero_lam, rho, tol, mi)
    jax.block_until_ready(res.lam)
    return {
        "avg_ms_device": ms,
        "pcg_iters": int(res.iters),
        "converged": bool(res.converged),
    }


def bench_batch(spec, options, backend, batch=256, reps=8):
    """Batch throughput by batch-size differencing: time batches of B and 2B
    and difference, so the (jittery) transport round trip cancels exactly."""
    from gato_tpu.formats import KKTBlocks
    from gato_tpu.solver import solve_batched
    from gato_tpu.testing import random_blocks

    def staged(n):
        problems = [random_blocks(spec, seed=1000 + i) for i in range(n)]
        blocks = KKTBlocks(*(jax.device_put(
            jnp.asarray(np.stack([np.asarray(p[f]) for p in problems])))
            for f in range(7)))
        run = jax.jit(lambda q: jnp.sum(
            solve_batched(spec, blocks._replace(q=q), options,
                          pcg_backend=backend).lam))
        float(run(blocks.q))  # compile + first execution
        return blocks, run

    b1, run1 = staged(batch)
    b2, run2 = staged(2 * batch)

    def times(run, blocks):
        ts = []
        for i in range(reps):
            q = blocks.q * (1.0 + 1e-6 * (i + 1))
            t0 = time.perf_counter()
            float(run(q))
            ts.append((time.perf_counter() - t0) * 1e3)
        return float(np.median(ts))

    t1, t2 = times(run1, b1), times(run2, b2)
    ms = max(t2 - t1, 1e-3)  # device time for `batch` extra problems
    return {"batch": batch, "ms_per_batch": ms,
            "sync_ms_B": t1, "sync_ms_2B": t2,
            "solves_per_sec": batch / (ms / 1e3),
            "us_per_solve": 1e3 * ms / batch}


def bench_mpc_sequence(spec, options, T=64, reps=6):
    """BASELINE config 3: warm-start MPC-style repeated solves as ONE
    on-device lax.scan (gato_tpu.mpc.solve_sequence).

    Timed by differencing two sequence lengths (T and 2T) so the transport
    round trip — which jitters between ~0 and ~30 ms here, swamping any
    subtraction against a separately-measured RTT — cancels exactly.
    """
    from gato_tpu.formats import KKTBlocks
    from gato_tpu.mpc import solve_sequence
    from gato_tpu.testing import random_blocks

    base = random_blocks(spec, seed=7)
    rng = np.random.default_rng(0)

    def make_seq(length):
        qs = np.asarray(base.q)[None] + 0.01 * rng.normal(
            size=(length,) + base.q.shape
        ).astype(np.float32).cumsum(axis=0)
        seq = KKTBlocks(
            *(jnp.broadcast_to(jnp.asarray(a), (length,) + a.shape)
              for a in base)
        )._replace(q=jnp.asarray(qs))
        seq = KKTBlocks(*(jax.device_put(a) for a in seq))
        jax.block_until_ready(seq.Q)
        return seq

    seq1, seq2 = make_seq(T), make_seq(2 * T)
    res = solve_sequence(spec, seq1, options)
    float(jnp.sum(res.lam))  # compile T + execute
    float(jnp.sum(solve_sequence(spec, seq2, options).lam))  # compile 2T
    iters_per_step = [int(x) for x in res.iters]

    def timed(seq, i):
        s2 = seq._replace(q=seq.q * (1.0 + 1e-6 * (i + 1)))
        t0 = time.perf_counter()
        float(jnp.sum(solve_sequence(spec, s2, options).lam))
        return (time.perf_counter() - t0) * 1e3

    t1 = float(np.median([timed(seq1, i) for i in range(reps)]))
    t2 = float(np.median([timed(seq2, i) for i in range(reps)]))
    ms_per_solve = max((t2 - t1) / T, 1e-4)
    return {
        "T": T,
        "ms_per_solve": ms_per_solve,
        "ms_per_sequence": ms_per_solve * T,
        "iters_first": iters_per_step[0],
        "iters_rest_mean": float(np.mean(iters_per_step[1:])),
    }


def main():
    from gato_tpu.problem import ProblemSpec, SolverOptions
    from gato_tpu.solver import default_pcg_backend

    platform = jax.devices()[0].platform
    rtt = measure_rtt_ms()
    _log(f"device: {jax.devices()[0]} ({platform}), transport rtt ~{rtt:.1f} ms")

    opts = SolverOptions(exit_tol=1e-6, max_iters=200, rho=1e-3)
    direct_opts = SolverOptions(rho=1e-3, method="direct")
    iiwa = ProblemSpec(14, 7, 50)
    have_pallas = default_pcg_backend(batched=True) in ("pallas", "fused")

    detail = {"platform": platform, "rtt_ms": rtt, "configs": {}}
    C = detail["configs"]

    C["pendulum_2_1_5_pcg"] = bench_single(ProblemSpec(2, 1, 5), opts, "jax",
                                           T=500)
    _log(f"pendulum pcg: {C['pendulum_2_1_5_pcg']}")
    C["iiwa_pcg"] = bench_single(iiwa, opts, "jax")
    _log(f"iiwa pcg: {C['iiwa_pcg']}")
    C["iiwa_direct"] = bench_single(iiwa, direct_opts, None)
    _log(f"iiwa direct: {C['iiwa_direct']}")
    for K in (100, 250, 500):
        C[f"iiwa_horizon_{K}_pcg"] = bench_single(
            ProblemSpec(14, 7, K), opts, "jax", T=20)
        _log(f"horizon {K}: {C[f'iiwa_horizon_{K}_pcg']}")

    if have_pallas:
        C["iiwa_batch_256_fused"] = bench_batch(iiwa, opts, "fused")
        _log(f"batch fused: {C['iiwa_batch_256_fused']}")
        C["iiwa_batch_256_pcg_pallas"] = bench_batch(iiwa, opts, "pallas")
        _log(f"batch pcg: {C['iiwa_batch_256_pcg_pallas']}")
    C["iiwa_batch_256_direct"] = bench_batch(iiwa, direct_opts, None)
    _log(f"batch direct: {C['iiwa_batch_256_direct']}")
    C["iiwa_mpc_sequence_64"] = bench_mpc_sequence(iiwa, opts)
    _log(f"mpc sequence: {C['iiwa_mpc_sequence_64']}")

    pcg_ms = C["iiwa_pcg"]["avg_ms_device"]
    best_name, best_ms = min(
        [("pcg", pcg_ms), ("direct", C["iiwa_direct"]["avg_ms_device"])],
        key=lambda kv: kv[1],
    )
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
