"""Round-3 farm B-scaling follow-up: the fresh bench table (BENCH_r03 run)
shows non-monotone per-solve cost across the farm rows — B=64 and B=128 take
the SAME absolute step time (0.244 vs 0.231 ms/step, i.e. B=64 wastes half
the machine) and B=256 costs 3.4x B=128 instead of 2x, at near-zero recorded
spread — while the controlled fixed-T sweep (probe_throughput probe G) shows
FLAT per-(group, step) kernel cost from 1 to 16 groups.  Two confounders
separate the bench farm rows from probe G:

  1. each bench row uses a DIFFERENT chain length T (256/128/64/40);
  2. the bench path includes the XLA pack/unpack relayouts around the
     kernel, and runs DISTINCT problems per stream under a real exit_tol
     (group-lockstep exit) — probe G ran identical content at pinned maxit.

This probe removes them one at a time, on real TPU:

  e2e    solve_sequence_batched at MATCHED T (64 vs 128 chain differencing)
         for B in {64, 128, 256} — does the anomaly survive fixed T?
  tsens  B=128 at the bench's other T choices (40 vs 80) — is it T, not B?
  kernel _call_fused_sequence alone on pre-packed staged inputs, same
         distinct-problem content and real exit_tol — pack+unpack excluded;
         plus a maxit-pinned variant (tol=0, maxit=11) isolating the
         lockstep-exit contribution.

Usage (real TPU, serialize with other chip users):
    PYTHONPATH="$PYTHONPATH:." python tools/probe_farm.py [e2e tsens kernel]
Prints one JSON line per (probe, B).  Nothing here feeds BENCH_DETAIL.json.

CONCLUSIONS (v5e, 2026-08-19 — these drove the bench_mpc_farm rewrite):

  * At the MATCHED pair (64,128), e2e per-solve cost is FLAT in B:
    1.78 / 1.96 / 1.94 us/solve at B=64/128/256 (~29-31 us/group-step).
    The round-2 farm table's non-monotone column was per-row pair choice.
  * KERNEL-only cost (staged pre-packed inputs) is LINEAR in chain length:
    0.132 -> 0.146 ms/step between pairs (64,128) and (128,256) at B=64
    with real exit_tol, 0.135 -> 0.138 with maxit pinned (the residual 10%
    was iteration drift from the then-cumsum generator, since made
    stationary in bench.py).  Group-step cost 33-37 us at every B.
  * E2E cost is SUPERLINEAR in chain length: 0.111 -> 0.233 ms/step over
    the same pairs (probe "pairs", tight diffs) — the XLA pack/unpack
    relayouts around the kernel get more expensive per step as the
    (T, B, ...) relayout grows, while the kernel does not.  Hence e2e
    rows are only comparable at one fixed pair, and long-pair rows
    (round-2's B=64 at (128,256)) read ~2x high.
  * Short pairs bias high from chain-diff noise: B=128 at (40,80) reads
    2.90 us/solve vs 1.92 at (64,128) (probe "tsens", dispersed diffs).
  * Lockstep tolerance exit costs <=10% vs maxit-pinned (probe "kernel",
    tol vs maxit11 rows) — group lockstep is NOT a throughput problem.
"""

from __future__ import annotations

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from gato_tpu.problem import ProblemSpec, SolverOptions
from gato_tpu.formats import KKTBlocks
from gato_tpu.testing import random_blocks
from gato_tpu.kernels import fused_solve as fs

SPEC = ProblemSpec(14, 7, 50)
OPTS = SolverOptions()


def make_seq(B, length, seed0=50):
    """Same construction as bench.bench_mpc_farm.make_seq: B distinct base
    problems, per-step random-walk q and scalar-scaled Q (keeps warm-started
    iters at the bench's ~11/step and defeats XLA hoisting)."""
    rng = np.random.default_rng(3)
    base = [random_blocks(SPEC, seed=seed0 + b) for b in range(B)]
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


def diff_steps(time_chain, T1, T2, reps=5, rounds=3):
    """Median-of-rounds chain difference -> (ms_per_step, raw diffs)."""
    diffs = []
    for k in range(rounds):
        t1 = float(np.median([time_chain(T1, 10 * k + i)
                              for i in range(reps)]))
        t2 = float(np.median([time_chain(T2, 10 * k + i)
                              for i in range(reps)]))
        diffs.append(t2 - t1)
    med = float(np.median(diffs))
    return med / (T2 - T1), [round(d, 3) for d in diffs]


def probe_pairs(B=64, pairs=((64, 128), (128, 256))):
    """Same-B e2e differencing at two chain pairs: distinguishes long-pair
    bias (pair choice changes the estimate) from bench-order contamination
    (the bench's B=64 row at pair (128,256) read 2x this probe's (64,128))."""
    from gato_tpu.mpc import solve_sequence_batched

    for T1, T2 in pairs:
        seqs = {T: make_seq(B, T) for T in (T1, T2)}
        for T in (T1, T2):
            float(jnp.sum(solve_sequence_batched(SPEC, seqs[T], OPTS).lam))

        def tc(T, i):
            s2 = seqs[T]._replace(q=seqs[T].q * (1.0 + 1e-6 * (i + 1)))
            t0 = time.perf_counter()
            float(jnp.sum(solve_sequence_batched(SPEC, s2, OPTS).lam))
            return (time.perf_counter() - t0) * 1e3

        ms_step, diffs = diff_steps(tc, T1, T2)
        print(json.dumps({
            "probe": "pairs", "B": B, "T": [T1, T2],
            "ms_per_step": round(ms_step, 4),
            "us_per_solve": round(1e3 * ms_step / B, 3),
            "diffs_ms": diffs,
        }), flush=True)
        del seqs


def probe_e2e(Bs=(64, 128, 256), T1=64, T2=128):
    from gato_tpu.mpc import solve_sequence_batched

    for B in Bs:
        seqs = {T: make_seq(B, T) for T in (T1, T2)}
        # warm both shapes
        for T in (T1, T2):
            float(jnp.sum(solve_sequence_batched(SPEC, seqs[T], OPTS).lam))

        def tc(T, i):
            s2 = seqs[T]._replace(q=seqs[T].q * (1.0 + 1e-6 * (i + 1)))
            t0 = time.perf_counter()
            float(jnp.sum(solve_sequence_batched(SPEC, s2, OPTS).lam))
            return (time.perf_counter() - t0) * 1e3

        ms_step, diffs = diff_steps(tc, T1, T2)
        n_groups = fs.plan_packing(B, 50, 14, 7)[3]
        print(json.dumps({
            "probe": "e2e", "B": B, "T": [T1, T2],
            "ms_per_step": round(ms_step, 4),
            "us_per_solve": round(1e3 * ms_step / B, 3),
            "us_per_group_step": round(1e3 * ms_step / n_groups, 2),
            "diffs_ms": diffs,
        }), flush=True)
        del seqs


def probe_tsens(B=128, pairs=((40, 80), (64, 128))):
    from gato_tpu.mpc import solve_sequence_batched

    for T1, T2 in pairs:
        seqs = {T: make_seq(B, T) for T in (T1, T2)}
        for T in (T1, T2):
            float(jnp.sum(solve_sequence_batched(SPEC, seqs[T], OPTS).lam))

        def tc(T, i):
            s2 = seqs[T]._replace(q=seqs[T].q * (1.0 + 1e-6 * (i + 1)))
            t0 = time.perf_counter()
            float(jnp.sum(solve_sequence_batched(SPEC, s2, OPTS).lam))
            return (time.perf_counter() - t0) * 1e3

        ms_step, diffs = diff_steps(tc, T1, T2)
        print(json.dumps({
            "probe": "tsens", "B": B, "T": [T1, T2],
            "ms_per_step": round(ms_step, 4),
            "us_per_solve": round(1e3 * ms_step / B, 3),
            "diffs_ms": diffs,
        }), flush=True)
        del seqs


def _staged_packed(B, T):
    """Pack a make_seq sequence into the kernel's lane layout OUTSIDE the
    timed region; returns (packed tuple, lb0, plan)."""
    K_sub, g, L, n_groups, sp = fs.plan_packing(B, 50, 14, 7)
    seq = make_seq(B, T)

    @jax.jit
    def pack(b):
        pm = jax.vmap(functools.partial(fs._pack_mat, K_sub=K_sub, g=g, L=L,
                                        n_groups=n_groups, sp=sp))
        pv = jax.vmap(functools.partial(fs._pack_vec, K_sub=K_sub, g=g, L=L,
                                        n_groups=n_groups, sp=sp))
        return (pm(b.Q), pm(b.R), pm(b.A), pm(b.B),
                pv(b.q), pv(b.r), pv(b.c))

    packed = pack(seq)
    lb0 = jax.device_put(jnp.zeros((n_groups, 16, L), jnp.float32))
    float(sum(jnp.sum(v[0]) for v in packed))
    return packed, lb0, (K_sub, g, L, n_groups, sp)


def probe_kernel(Bs=(64, 128, 256), T1=64, T2=128):
    for B in Bs:
        staged = {T: _staged_packed(B, T) for T in (T1, T2)}
        K_sub, g, L, n_groups, sp = staged[T1][2]

        def run_fn(T, tol, maxit):
            @jax.jit
            def run(Qb, Rb, Ab, Bb, qb, rb, cb, lb, pert):
                outs = fs._call_fused_sequence(
                    jnp.full((T,), OPTS.rho, jnp.float32), tol, maxit,
                    Qb, Rb, Ab, Bb, qb * pert, rb, cb, lb,
                    s=14, c=7, K_sub=K_sub, g=g, L=L, sp=sp,
                    n_groups=n_groups, T=T, flops_scale=B * 50,
                    poly_degree=1, precond="symmetric_stair",
                    interpret=False)
                return jnp.sum(outs[0]) + jnp.sum(outs[5])
            return run

        for tol, maxit, tag in ((OPTS.exit_tol, OPTS.max_iters, "tol"),
                                (0.0, 11, "maxit11")):
            runs = {T: run_fn(T, tol, maxit) for T in (T1, T2)}
            for T in (T1, T2):
                float(runs[T](*staged[T][0], staged[T][1], 1.0))

            def tc(T, i):
                t0 = time.perf_counter()
                float(runs[T](*staged[T][0], staged[T][1],
                              1.0 + 1e-6 * (i + 1)))
                return (time.perf_counter() - t0) * 1e3

            ms_step, diffs = diff_steps(tc, T1, T2)
            print(json.dumps({
                "probe": f"kernel_{tag}", "B": B, "T": [T1, T2],
                "ms_per_step": round(ms_step, 4),
                "us_per_solve": round(1e3 * ms_step / B, 3),
                "us_per_group_step": round(1e3 * ms_step / n_groups, 2),
                "diffs_ms": diffs,
            }), flush=True)
        del staged


def probe_fit(Bs=(64, 256), Ts=(40, 64, 80, 128), reps=5):
    """Absolute time(T) across a T grid at fixed B, fit a + b*T.  Chain
    differencing assumes the SAME per-step cost b in both chain programs —
    but every T is a separately compiled program; this measures each one."""
    from gato_tpu.mpc import solve_sequence_batched

    for B in Bs:
        rows = {}
        for T in Ts:
            seq = make_seq(B, T)
            float(jnp.sum(solve_sequence_batched(SPEC, seq, OPTS).lam))
            ts = []
            for i in range(reps):
                s2 = seq._replace(q=seq.q * (1.0 + 1e-6 * (i + 1)))
                t0 = time.perf_counter()
                float(jnp.sum(solve_sequence_batched(SPEC, s2, OPTS).lam))
                ts.append((time.perf_counter() - t0) * 1e3)
            rows[T] = round(float(np.median(ts)), 3)
            del seq
        Ta = np.array(list(rows.keys()), dtype=np.float64)
        ya = np.array(list(rows.values()), dtype=np.float64)
        b_fit, a_fit = np.polyfit(Ta, ya, 1)
        resid = ya - (a_fit + b_fit * Ta)
        print(json.dumps({
            "probe": "fit", "B": B, "ms_by_T": rows,
            "fit_fixed_ms": round(float(a_fit), 3),
            "fit_ms_per_step": round(float(b_fit), 4),
            "us_per_solve": round(1e3 * float(b_fit) / B, 3),
            "resid_ms": [round(float(r), 3) for r in resid],
        }), flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["e2e", "tsens", "kernel"]
    print(json.dumps({"devices": str(jax.devices())}), flush=True)
    for p in which:
        {"e2e": probe_e2e, "tsens": probe_tsens, "fit": probe_fit,
         "pairs": probe_pairs,
         "kernel": probe_kernel}[p]()
