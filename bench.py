"""Benchmark harness: BASELINE.json configs on the current default device.

Prints exactly ONE JSON line to stdout:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Headline metric: average per-solve latency of the IIWA-default problem
(STATE_SIZE=14, CONTROL_SIZE=7, KNOT_POINTS=50 — reference install.bash:6) at
exit_tol=1e-6, measured device-saturated (dispatches pipelined, one final
sync), which is the TPU analog of the reference's cudaEvent device-time loop
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
    """Per-call latency: block after every call (reference-harness style)."""
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.mean(ts)), float(np.min(ts))

def _time_pipelined(fn, iters):
    """Device-saturated per-call time: dispatch all, sync once."""
    out = None
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) * 1e3 / iters


def bench_config(spec, options, backend, *, sync_iters=10, pipe_iters=50):
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

    avg_sync, best_sync = _time_sync(run, sync_iters)
    avg_pipe = _time_pipelined(run, pipe_iters)
    return {
        "first_run_ms": first_ms,
        "avg_ms_sync": avg_sync,
        "best_ms_sync": best_sync,
        "avg_ms_pipelined": avg_pipe,
        "pcg_iters": int(res.iters),
        "converged": bool(res.converged),
    }


def bench_batch(spec, options, backend, batch=256, iters=10):
    from gato_tpu.formats import KKTBlocks
    from gato_tpu.solver import solve_batched
    from gato_tpu.testing import random_blocks

    problems = [random_blocks(spec, seed=1000 + i) for i in range(batch)]
    blocks = KKTBlocks(*(jax.device_put(
        jnp.asarray(np.stack([np.asarray(p[f]) for p in problems])))
        for f in range(7)))
    jax.block_until_ready(blocks.Q)
    run = lambda: solve_batched(spec, blocks, options, pcg_backend=backend)
    jax.block_until_ready(run().lam)  # compile
    ms = _time_pipelined(run, iters)
    return {"batch": batch, "ms_per_batch": ms,
            "solves_per_sec": batch / (ms / 1e3)}


def main():
    from gato_tpu.problem import ProblemSpec, SolverOptions
    from gato_tpu.solver import default_pcg_backend

    platform = jax.devices()[0].platform
    _log(f"device: {jax.devices()[0]} ({platform})")

    opts = SolverOptions(exit_tol=1e-6, max_iters=200, rho=1e-3)
    iiwa = ProblemSpec(14, 7, 50)

    backends = ["jax"]
    if default_pcg_backend() == "pallas":
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
                                  sync_iters=5, pipe_iters=20)
            _log(f"{key}: {d[key]}")
        d["iiwa_batch_256"] = bench_batch(iiwa, opts, be)
        _log(f"batch: {d['iiwa_batch_256']}")
        detail["backends"][be] = d

    jax_ms = detail["backends"]["jax"]["iiwa_14_7_50"]["avg_ms_pipelined"]
    best_be = min(detail["backends"],
                  key=lambda b: detail["backends"][b]["iiwa_14_7_50"]["avg_ms_pipelined"])
    best_ms = detail["backends"][best_be]["iiwa_14_7_50"]["avg_ms_pipelined"]
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
