"""Benchmark harness: BASELINE.json configs on the current default device.

Prints exactly ONE JSON line to stdout:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Headline metric: average per-solve latency of the IIWA-default problem
(STATE_SIZE=14, CONTROL_SIZE=7, KNOT_POINTS=50 — reference install.bash:6) at
exit_tol=1e-6, measured by data-dependency chaining (see _time_chained),
which is the TPU analog of the reference's per-solve cudaEvent loop
(gpu_library.cu:166-198).

``vs_baseline``: the reference publishes no numbers (BASELINE.json
"published": {}), so this reports the speedup of the best backend over this
framework's own pure-JAX lax.while_loop path ("jax" backend) — i.e. what the
fused Pallas tier buys.  >= 1.0; equals 1.0 when only the pure path exists.

Full details (all BASELINE.json configs, both backends, scaling curve, batch
throughput) are written to BENCH_DETAIL.json and stderr.
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


def _time_sync(fn, iters):
    """Per-call latency: block after every call (reference-harness style).
    On a remote-attached TPU this includes the transport round trip."""
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.mean(ts)), float(np.min(ts))


def _time_chained(fn_chained, zero_lam, iters):
    """True sequential device time: each call consumes the previous result
    (a value-neutral 1e-30*lam perturbation of the rhs), so the device must
    execute every solve and nothing can be served from an execution cache.
    Timing N *identical* async calls instead was observed to under-report by
    >100x on the axon-attached TPU (repeat executions of bit-identical
    programs+inputs come back almost instantly); data-dependency chaining is
    the methodology that matches the reference's per-solve cudaEvent numbers
    (gpu_library.cu:166-198)."""
    lam = jax.block_until_ready(fn_chained(zero_lam))
    t0 = time.perf_counter()
    for _ in range(iters):
        lam = fn_chained(lam)
    jax.block_until_ready(lam)
    return (time.perf_counter() - t0) * 1e3 / iters


def bench_config(spec, options, backend, *, sync_iters=10, chain_iters=50):
    from gato_tpu.formats import KKTBlocks
    from gato_tpu.solver import solve
    from gato_tpu.testing import random_blocks

    # Stage inputs on device once, as the reference keeps the CSR arrays
    # device-resident across its testiters loop (gpu_library.cu:140-157);
    # the timed region is the solve, not PCIe/tunnel upload.
    blocks = KKTBlocks(*(jax.device_put(jnp.asarray(a))
                         for a in random_blocks(spec, seed=7)))
    jax.block_until_ready(blocks.Q)
    run = lambda: solve(spec, blocks, options, pcg_backend=backend)

    t0 = time.perf_counter()
    res = run()
    jax.block_until_ready(res.lam)
    first_ms = (time.perf_counter() - t0) * 1e3

    def chained(lam_prev):
        b2 = blocks._replace(q=blocks.q + 1e-30 * lam_prev)
        return solve(spec, b2, options, pcg_backend=backend).lam

    avg_sync, best_sync = _time_sync(run, sync_iters)
    avg_chain = _time_chained(chained, jnp.zeros_like(blocks.q), chain_iters)
    return {
        "first_run_ms": first_ms,
        "avg_ms_sync": avg_sync,
        "best_ms_sync": best_sync,
        "avg_ms_chained": avg_chain,
        "pcg_iters": int(res.iters),
        "converged": bool(res.converged),
    }


def bench_batch(spec, options, backend, batch=256, iters=20):
    from gato_tpu.formats import KKTBlocks
    from gato_tpu.solver import solve_batched
    from gato_tpu.testing import random_blocks

    problems = [random_blocks(spec, seed=1000 + i) for i in range(batch)]
    blocks = KKTBlocks(*(jax.device_put(
        jnp.asarray(np.stack([np.asarray(p[f]) for p in problems])))
        for f in range(7)))
    jax.block_until_ready(blocks.Q)
    jax.block_until_ready(
        solve_batched(spec, blocks, options, pcg_backend=backend).lam
    )  # compile

    def chained(lam_prev):
        b2 = blocks._replace(q=blocks.q + 1e-30 * lam_prev)
        return solve_batched(spec, b2, options, pcg_backend=backend).lam

    ms = _time_chained(chained, jnp.zeros_like(blocks.q), iters)
    return {"batch": batch, "ms_per_batch": ms,
            "solves_per_sec": batch / (ms / 1e3)}


def bench_mpc_sequence(spec, options, T=64, iters=10):
    """BASELINE config 3: warm-start MPC-style repeated solves, run as ONE
    on-device lax.scan chain (gato_tpu.mpc.solve_sequence)."""
    from gato_tpu.formats import KKTBlocks
    from gato_tpu.mpc import solve_sequence
    from gato_tpu.testing import random_blocks

    base = random_blocks(spec, seed=7)
    rng = np.random.default_rng(0)
    # Slowly-varying problem sequence: base gradient + small per-step drift.
    qs = np.asarray(base.q)[None] + 0.01 * rng.normal(
        size=(T,) + base.q.shape
    ).astype(np.float32).cumsum(axis=0)
    seq = KKTBlocks(
        *(jnp.broadcast_to(jnp.asarray(a), (T,) + a.shape) for a in base)
    )._replace(q=jnp.asarray(qs))
    seq = KKTBlocks(*(jax.device_put(a) for a in seq))
    jax.block_until_ready(seq.Q)

    res = solve_sequence(spec, seq, options)
    jax.block_until_ready(res.lam)  # compile
    iters_per_step = [int(x) for x in res.iters]

    def chained(lam_prev):
        s2 = seq._replace(q=seq.q + 1e-30 * lam_prev[None])
        return solve_sequence(spec, s2, options).lam[-1]

    ms = _time_chained(chained, jnp.zeros_like(seq.q[0]), iters)
    return {
        "T": T,
        "ms_per_sequence": ms,
        "ms_per_solve": ms / T,
        "iters_first": iters_per_step[0],
        "iters_rest_mean": float(np.mean(iters_per_step[1:])),
    }


def main():
    from gato_tpu.problem import ProblemSpec, SolverOptions
    from gato_tpu.solver import default_pcg_backend

    platform = jax.devices()[0].platform
    _log(f"device: {jax.devices()[0]} ({platform})")

    opts = SolverOptions(exit_tol=1e-6, max_iters=200, rho=1e-3)
    iiwa = ProblemSpec(14, 7, 50)

    backends = ["jax"]
    if default_pcg_backend(batched=True) == "pallas":
        backends.append("pallas")

    detail = {"platform": platform, "backends": {}}

    for be in backends:
        d = {}
        _log(f"--- backend={be} ---")
        d["pendulum_2_1_5"] = bench_config(ProblemSpec(2, 1, 5), opts, be)
        _log(f"pendulum: {d['pendulum_2_1_5']}")
        d["iiwa_14_7_50"] = bench_config(iiwa, opts, be)
        _log(f"iiwa: {d['iiwa_14_7_50']}")
        for K in (100, 250, 500):
            key = f"iiwa_horizon_{K}"
            d[key] = bench_config(ProblemSpec(14, 7, K), opts, be,
                                  sync_iters=5, chain_iters=20)
            _log(f"{key}: {d[key]}")
        if be == "pallas":
            # The 256-problem batch runs only on the fused lane-packed kernel;
            # the vmapped while_loop fallback takes minutes just to compile at
            # this batch size and is not the production batch path.
            d["iiwa_batch_256"] = bench_batch(iiwa, opts, be)
            _log(f"batch: {d['iiwa_batch_256']}")
        detail["backends"][be] = d

    detail["mpc_sequence_64"] = bench_mpc_sequence(iiwa, opts)
    _log(f"mpc sequence: {detail['mpc_sequence_64']}")

    jax_ms = detail["backends"]["jax"]["iiwa_14_7_50"]["avg_ms_chained"]
    best_be = min(detail["backends"],
                  key=lambda b: detail["backends"][b]["iiwa_14_7_50"]["avg_ms_chained"])
    best_ms = detail["backends"][best_be]["iiwa_14_7_50"]["avg_ms_chained"]
    detail["headline_backend"] = best_be

    with open("BENCH_DETAIL.json", "w") as f:
        json.dump(detail, f, indent=2)

    print(json.dumps({
        "metric": "iiwa_14_7_50_avg_solve_ms",
        "value": round(best_ms, 4),
        "unit": "ms",
        "vs_baseline": round(jax_ms / best_ms, 3),
    }))


if __name__ == "__main__":
    main()
