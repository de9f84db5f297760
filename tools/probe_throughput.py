"""Round-3 throughput investigation (VERDICT round-2 weak #1): decompose the
batch-256 fused solve's gap to roofline into MEASURED buckets.

The fused kernel reports 4.06 us/solve at B=256 vs a 0.45 us analytic floor
(18% of roofline).  This probe measures, on real TPU:

  A. fixed (condense+precond+recover) vs per-iteration cost at B=256, via
     exit_tol=0 + max_iters differencing (deterministic iteration counts —
     no exit-test variance, every problem runs exactly max_iters);
  B. lockstep-exit waste: each lane group runs until its SLOWEST problem
     converges; waste = 1 - mean(iters)/mean(group_max);
  C. input-path cost: manual single-buffered DMA (serializes ~5 us/group
     ahead of compute) vs the pipelined BlockSpec path (double-buffered,
     overlapped) at the same g;
  D. the empirical VPU ceiling for the kernel's dominant op — the
     (sp, L) column-FMA — via an R-round matvec chain microbenchmark
     (slope of time vs R), at the kernel's own tile shape;
  E. per-solve cost vs forced group size g (lockstep waste shrinks with g,
     fixed per-group cost amortizes worse — where is the optimum?).

Usage (real TPU, serialized with other chip users):
    PYTHONPATH="$PYTHONPATH:." python tools/probe_throughput.py [A B C D E]
Prints one JSON line per probe; nothing here feeds BENCH_DETAIL.json —
conclusions get folded into bench.py/README once understood.
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
from gato_tpu.timing import chain_time, perturb
from gato_tpu import timing
from gato_tpu.kernels import fused_solve as fs

SPEC = ProblemSpec(14, 7, 50)
B = 256


def _staged_batch(spec=SPEC, batch=B, seed=1000):
    pro = [random_blocks(spec, seed=seed + i) for i in range(batch)]
    blocks = KKTBlocks(*(jnp.asarray(np.stack([np.asarray(p[f]) for p in pro]))
                         for f in range(7)))
    blocks = KKTBlocks(*(jax.device_put(a) for a in blocks))
    float(jnp.sum(blocks.q))
    return blocks


def _time_fused(blocks, options, *, T=12, label=""):
    from gato_tpu.timing import time_solve

    ms, info = time_solve(SPEC, blocks, options, pcg_backend="fused", T=T,
                          label=label)
    return ms, info


def probe_A():
    blocks = _staged_batch()
    o0 = SolverOptions(rho=1e-3, exit_tol=0.0, max_iters=0)
    o8 = SolverOptions(rho=1e-3, exit_tol=0.0, max_iters=8)
    o16 = SolverOptions(rho=1e-3, exit_tol=0.0, max_iters=16)
    odef = SolverOptions(rho=1e-3, exit_tol=1e-8, max_iters=200)
    ms0, i0 = _time_fused(blocks, o0, label="A/maxit0")
    ms8, i8 = _time_fused(blocks, o8, label="A/maxit8")
    ms16, i16 = _time_fused(blocks, o16, label="A/maxit16")
    msf, inf_ = _time_fused(blocks, odef, label="A/full")
    per_iter_ms = (ms16 - ms8) / 8.0
    out = {
        "probe": "A",
        "batch": B,
        "fixed_ms": round(ms0, 4),
        "maxit8_ms": round(ms8, 4),
        "maxit16_ms": round(ms16, 4),
        "full_default_ms": round(msf, 4),
        "per_iter_ms_batch": round(per_iter_ms, 5),
        "per_iter_us_per_solve": round(1e3 * per_iter_ms / B, 4),
        "fixed_us_per_solve": round(1e3 * ms0 / B, 4),
        "full_us_per_solve": round(1e3 * msf / B, 4),
        # consistency: fixed + per_iter*8 should ~= maxit8
        "model_maxit8_ms": round(ms0 + 8 * per_iter_ms, 4),
        "spreads": {"maxit0": i0.get("spread_ms"), "maxit8": i8.get("spread_ms"),
                    "maxit16": i16.get("spread_ms"), "full": inf_.get("spread_ms")},
    }
    print(json.dumps(out), flush=True)
    return out


def probe_B():
    from gato_tpu.solver import solve_batched

    blocks = _staged_batch()
    odef = SolverOptions(rho=1e-3, exit_tol=1e-8, max_iters=200)
    res = solve_batched(SPEC, blocks, odef, pcg_backend="fused")
    it = np.asarray(res.iters).astype(np.int64)
    K_sub, g, L, n_groups, sp = fs.plan_packing(B, SPEC.knot_points, SPEC.state_size, SPEC.control_size)
    groups = it.reshape(n_groups, g)
    gmax = groups.max(axis=1)
    out = {
        "probe": "B",
        "g": g, "n_groups": n_groups,
        "iters_mean": round(float(it.mean()), 2),
        "iters_min": int(it.min()), "iters_max": int(it.max()),
        "group_max_mean": round(float(gmax.mean()), 2),
        "lockstep_waste_pct": round(100 * (1 - it.mean() / gmax.mean()), 1),
        "group_maxes": gmax.tolist(),
    }
    print(json.dumps(out), flush=True)
    return out


def _packed_inputs(blocks, K_sub, g, L, n_groups, sp):
    pm = functools.partial(fs._pack_mat, K_sub=K_sub, g=g, L=L,
                           n_groups=n_groups, sp=sp)
    pv = functools.partial(fs._pack_vec, K_sub=K_sub, g=g, L=L,
                           n_groups=n_groups, sp=sp)
    Qb, Rb, Ab, Bb = pm(blocks.Q), pm(blocks.R), pm(blocks.A), pm(blocks.B)
    qb, rb, cb = pv(blocks.q), pv(blocks.r), pv(blocks.c)
    lb = jnp.zeros_like(qb)
    arrs = [jax.device_put(a) for a in (Qb, Rb, Ab, Bb, qb, rb, cb, lb)]
    float(sum(jnp.sum(a) for a in arrs))
    return arrs


def probe_C(max_iters=16):
    blocks = _staged_batch()
    K_sub, g, L, n_groups, sp = fs.plan_packing(B, SPEC.knot_points, SPEC.state_size, SPEC.control_size)
    Qb, Rb, Ab, Bb, qb, rb, cb, lb = _packed_inputs(
        blocks, K_sub, g, L, n_groups, sp)
    out = {"probe": "C", "g": g, "L": L, "n_groups": n_groups,
           "max_iters": max_iters}
    for name, dma in (("dma", True), ("pipeline", False)):
        def step(q0, lam_carry, t, dma=dma):
            pert = (1.0 + 1e-6 * jnp.cos(t)
                    + 1e-7 * jnp.tanh(jnp.sum(lam_carry)))
            lam_p, dzx_p, dzu_p, *_ = fs._call_fused(
                1e-3, 0.0, max_iters, Qb * pert,
                Rb, Ab, Bb, q0 * (1.0 + 1e-6 * jnp.sin(t)), rb, cb, lb,
                s=SPEC.state_size, c=SPEC.control_size, K_sub=K_sub, g=g, L=L, sp=sp,
                n_groups=n_groups, flops_scale=B * SPEC.knot_points,
                poly_degree=1, precond="symmetric_stair",
                interpret=False, unroll=1, input_dma=dma)
            return lam_p + dzx_p + 1e-20 * jnp.sum(dzu_p)

        try:
            ms, info = chain_time(step, qb, 12, label=f"C/{name}")
            out[f"{name}_ms"] = round(ms, 4)
            out[f"{name}_us_per_solve"] = round(1e3 * ms / B, 4)
            out[f"{name}_spread"] = info.get("spread_ms")
        except Exception as e:  # pipeline may exceed VMEM at this g
            out[f"{name}_error"] = repr(e)[:200]
    print(json.dumps(out), flush=True)
    return out


def probe_C2():
    """Public-path A/B: solve_fused_batched with the input path FORCED to
    pipeline vs manual DMA (everything else identical, incl. the pack)."""
    blocks = _staged_batch()
    o16 = SolverOptions(rho=1e-3, exit_tol=0.0, max_iters=16)
    odef = SolverOptions(rho=1e-3, exit_tol=1e-8, max_iters=200)
    orig = fs._call_fused
    out = {"probe": "C2"}
    for name, dma in (("dma", True), ("pipeline", False)):
        def forced(*a, **kw):
            kw["input_dma"] = dma
            return orig(*a, **kw)

        fs._call_fused = forced
        try:
            for tag, opts in (("it16", o16), ("full", odef)):
                ms, info = _time_fused(blocks, opts,
                                       label=f"C2/{name}/{tag}")
                out[f"{name}_{tag}_ms"] = round(ms, 4)
                out[f"{name}_{tag}_us_per_solve"] = round(1e3 * ms / B, 4)
                out[f"{name}_{tag}_spread"] = info.get("spread_ms")
        finally:
            fs._call_fused = orig
    print(json.dumps(out), flush=True)
    return out


def probe_D():
    """Empirical VPU cost of the kernel's dominant op: one (sp, L) column-FMA
    y += M[b] * y[b:b+1, :].  An R-round matvec chain (sequential dependency,
    nothing foldable) timed at two R values; the slope is ns per s-column
    matvec, i.e. per s FMAs on an (sp, L) tile."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    s, sp, L = SPEC.state_size, 16, 896
    dt = jnp.float32

    def make(R, depth):
        def kernel(M_ref, y_ref, out_ref):
            Mc = [M_ref[b] * 0.01 for b in range(s)]

            def body(_, y):
                for _d in range(depth):
                    acc = Mc[0] * y[0:1, :]
                    for b in range(1, s):
                        acc = acc + Mc[b] * y[b : b + 1, :]
                    # keep magnitude bounded; adds 1 extra op per matvec
                    y = acc * 0.25 + y * 0.5
                return y

            y = jax.lax.fori_loop(0, R, body, y_ref[...])
            out_ref[...] = y

        @jax.jit
        def run(M, y):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((sp, L), dt),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(M, y)

        return run

    M = jax.device_put(jnp.ones((s, sp, L), dt))
    y0 = jax.device_put(jnp.ones((sp, L), dt))
    out = {"probe": "D", "sp": sp, "L": L, "s": s}
    times = {}
    for depth in (2, 6):
        for R in (50_000, 100_000):
            run = make(R, depth)
            float(jnp.sum(run(M, y0)))  # compile
            reps = []
            for i in range(7):
                y = y0 * (1.0 + 1e-6 * i)
                t0 = time.perf_counter()
                float(jnp.sum(run(M, y)))
                reps.append(time.perf_counter() - t0)
            times[(depth, R)] = float(np.median(reps))
            out[f"t_d{depth}_R{R}_ms"] = round(times[(depth, R)] * 1e3, 3)
    # slope per loop trip at each depth; difference isolates 3 extra matvecs
    trip1_ns = (times[(2, 100_000)] - times[(2, 50_000)]) / 50_000 * 1e9
    trip4_ns = (times[(6, 100_000)] - times[(6, 50_000)]) / 50_000 * 1e9
    ns_per_matvec = (trip4_ns - trip1_ns) / 4.0     # loop overhead cancels
    loop_overhead_ns = trip1_ns - 2 * ns_per_matvec
    ns_per_col_fma = ns_per_matvec / (s + 2)  # s FMAs + 2 bounding ops
    vregs = (sp // 8) * (L // 128)
    out.update({
        "trip_d2_ns": round(trip1_ns, 1),
        "trip_d6_ns": round(trip4_ns, 1),
        "ns_per_matvec": round(ns_per_matvec, 2),
        "loop_overhead_ns_per_trip": round(loop_overhead_ns, 1),
        "ns_per_col_fma": round(ns_per_col_fma, 3),
        "vregs_per_tile": vregs,
        "implied_cycles_per_vreg_fma": round(
            ns_per_col_fma * 0.94 / vregs, 3),  # v5e ~0.94 GHz
        "implied_vpu_tflops": round(
            2 * sp * L / ns_per_col_fma / 1e3, 2),
    })
    print(json.dumps(out), flush=True)
    return out


def probe_E():
    blocks = _staged_batch()
    odef = SolverOptions(rho=1e-3, exit_tol=1e-8, max_iters=200)
    out = {"probe": "E", "per_g": {}}
    orig = fs.plan_packing
    for g in (4, 8, 16):
        K_sub = 56
        L = ((g * K_sub + 127) // 128) * 128
        n_groups = -(-B // g)

        def fake_plan(Bn, K, s, c, g=g, L=L, n_groups=n_groups):
            return 56, g, L, n_groups, 16

        fs.plan_packing = fake_plan
        try:
            ms, info = _time_fused(blocks, odef, label=f"E/g{g}")
            out["per_g"][g] = {
                "L": L, "n_groups": n_groups,
                "ms": round(ms, 4),
                "us_per_solve": round(1e3 * ms / B, 4),
                "spread": info.get("spread_ms"),
            }
        finally:
            fs.plan_packing = orig
    print(json.dumps(out), flush=True)
    return out


def _farm_seq(Bn, T, seed=50):
    rng = np.random.default_rng(3)
    base = [random_blocks(SPEC, seed=seed + b) for b in range(Bn)]
    stack = KKTBlocks(*(np.stack([np.asarray(p[f]) for p in base])
                        for f in range(7)))
    qs = np.asarray(stack.q)[None] + 0.01 * rng.normal(
        size=(T,) + stack.q.shape).astype(np.float32).cumsum(axis=0)
    qsc = (1.0 + 1e-4 * rng.normal(size=(T, 1, 1, 1, 1))).astype(np.float32)
    seq = KKTBlocks(*(jnp.broadcast_to(jnp.asarray(a), (T,) + a.shape)
                      for a in stack))._replace(
        q=jnp.asarray(qs), Q=jnp.asarray(np.asarray(stack.Q)[None] * qsc))
    seq = KKTBlocks(*(jax.device_put(a) for a in seq))
    float(jnp.sum(seq.q))
    return seq


def probe_F():
    """Farm-step decomposition vs B (VERDICT r2 weak #2): public per-step
    cost = pack (vmapped relayout of the (T,B,...) inputs) + per-step kernel
    scan + unpack.  Measures (a) public, (b) kernel-scan on PRE-PACKED
    stacks (args, not closures), (c) pack alone — each by T-vs-2T chain
    differencing."""
    from gato_tpu.mpc import solve_sequence_batched

    odef = SolverOptions(rho=1e-3, exit_tol=1e-8, max_iters=200)
    out = {"probe": "F", "per_B": {}}
    for Bn, T in ((64, 64), (128, 48), (256, 24)):
        K_sub, g, L, n_groups, sp = fs.plan_packing(
            Bn, SPEC.knot_points, SPEC.state_size, SPEC.control_size)
        seq1, seq2 = _farm_seq(Bn, T), _farm_seq(Bn, 2 * T)
        res = {"g": g, "n_groups": n_groups, "T": T}

        def timed(fn, arg, i):
            t0 = time.perf_counter()
            float(fn(arg, 1.0 + 1e-6 * (i + 1)))
            return (time.perf_counter() - t0) * 1e3

        def diff_per_step(make_fn, reps=5, rounds=3):
            f1, f2 = make_fn(seq1, T), make_fn(seq2, 2 * T)
            float(f1(seq1, 1.0)), float(f2(seq2, 1.0))  # compile
            ds = []
            for k in range(rounds):
                t1 = float(np.median([timed(f1, seq1, 10 * k + i)
                                      for i in range(reps)]))
                t2 = float(np.median([timed(f2, seq2, 10 * k + i)
                                      for i in range(reps)]))
                if t2 - t1 > 0:
                    ds.append((t2 - t1) / T)
            return float(np.median(ds)) if ds else 0.0

        # (a) public
        def make_public(seq, length):
            def run(s, pert):
                s2 = s._replace(q=s.q * pert)
                return jnp.sum(solve_sequence_batched(SPEC, s2, odef).lam)
            return run

        # (c) pack only
        pm = jax.vmap(functools.partial(fs._pack_mat, K_sub=K_sub, g=g, L=L,
                                        n_groups=n_groups, sp=sp))
        pv = jax.vmap(functools.partial(fs._pack_vec, K_sub=K_sub, g=g, L=L,
                                        n_groups=n_groups, sp=sp))

        def make_pack(seq, length):
            @jax.jit
            def run(s, pert):
                packed = [pm(s.Q * pert), pm(s.R), pm(s.A), pm(s.B),
                          pv(s.q), pv(s.r), pv(s.c)]
                return sum(jnp.sum(p) for p in packed)
            return run

        # (b) kernel scan on pre-packed args
        def make_kernel(seq, length):
            Qb, Rb, Ab, Bb = pm(seq.Q), pm(seq.R), pm(seq.A), pm(seq.B)
            qb, rb, cb = pv(seq.q), pv(seq.r), pv(seq.c)
            lb0 = jnp.zeros_like(qb[0])
            stacks = (Qb, Rb, Ab, Bb, qb, rb, cb)
            for a in stacks:
                a.block_until_ready()

            @jax.jit
            def run_packed(st, lb, pert):
                Qb_, Rb_, Ab_, Bb_, qb_, rb_, cb_ = st

                def step(lam_carry, xs):
                    Qt, Rt, At, Bt, qt, rt, ct = xs
                    lam_p, dzx_p, dzu_p, *_ = fs._call_fused(
                        1e-3, 1e-8, 200, Qt * pert, Rt, At, Bt,
                        qt, rt, ct, lam_carry,
                        s=SPEC.state_size, c=SPEC.control_size,
                        K_sub=K_sub, g=g, L=L, sp=sp, n_groups=n_groups,
                        flops_scale=Bn * SPEC.knot_points, poly_degree=1,
                        precond="symmetric_stair", interpret=False,
                        unroll=1)
                    return lam_p, jnp.sum(lam_p + dzx_p)

                _, outs = jax.lax.scan(step, lb, stacks)
                return jnp.sum(outs)

            def run(s, pert):   # `s` ignored; packed stacks are args
                return run_packed(stacks, lb0, pert)

            return run

        # (b) direct pre-packed scan hits a remote-compile size limit
        # (HTTP 413) on this transport; derive kernel = public - pack.
        res["public_ms_per_step"] = round(diff_per_step(make_public), 4)
        print(json.dumps({Bn: res}), flush=True)
        res["pack_ms_per_step"] = round(diff_per_step(make_pack), 4)
        res["kernel_ms_per_step"] = round(
            res["public_ms_per_step"] - res["pack_ms_per_step"], 4)
        for k in ("public", "pack", "kernel"):
            res[f"{k}_us_per_solve"] = round(
                1e3 * res[f"{k}_ms_per_step"] / Bn, 3)
        out["per_B"][Bn] = res
        print(json.dumps({Bn: res}), flush=True)
    print(json.dumps(out), flush=True)
    return out


def probe_G():
    """Controlled farm-kernel scaling: per-(group, step) cost vs n_groups at
    FIXED T (48 vs 96 chain differencing) and IDENTICAL per-group content —
    isolates the (T, n_groups) grid's scaling from pack cost, staging size,
    and the per-B T choices that confound probe F and the bench farm sweep.

    Measured (v5e, IIWA g=16 groups, maxit pinned, exit_tol=0):

        n_groups              1     2     4     8    16
        fixed us/group-step  30.8  33.1  24.0  22.2  23.0   (maxit=0)
        +11 iters            31.9  40.6  32.5  39.4  33.9

    FLAT in n_groups (dispersion ~ +-25% is single-call RTT noise at these
    small levers) — the farm kernel has no group-count penalty; apparent
    B-to-B differences in the bench farm table are measurement dispersion,
    bounded by the recorded spreads.  VERDICT r2 weak #2 closure evidence.
    """
    from gato_tpu.kernels import fused_solve as fsq

    s_, c_, K_ = SPEC.state_size, SPEC.control_size, SPEC.knot_points
    K_sub, g, L, _, sp = fsq.plan_packing(16, K_, s_, c_)
    pro = [random_blocks(SPEC, seed=3000 + i) for i in range(16)]
    blocks = KKTBlocks(*(jnp.asarray(np.stack([np.asarray(p[f]) for p in pro]))
                         for f in range(7)))
    pm = functools.partial(fsq._pack_mat, K_sub=K_sub, g=g, L=L, n_groups=1,
                           sp=sp)
    pv = functools.partial(fsq._pack_vec, K_sub=K_sub, g=g, L=L, n_groups=1,
                           sp=sp)
    one = (pm(blocks.Q), pm(blocks.R), pm(blocks.A), pm(blocks.B),
           pv(blocks.q), pv(blocks.r), pv(blocks.c))

    def staged(T, n):
        def rep(a):
            tiled = jnp.broadcast_to(a[None], (T, n) + a.shape[1:])
            jit_scale = 1.0 + 1e-5 * jnp.arange(T * n).reshape(
                (T, n) + (1,) * (a.ndim - 1))
            return jax.device_put(tiled * jit_scale)

        arrs = tuple(rep(v) for v in one)
        lb0 = jax.device_put(jnp.zeros((n, sp, L), jnp.float32))
        float(sum(jnp.sum(v) for v in arrs))
        return arrs, lb0

    def time_cfg(T, n, max_iters, reps=7):
        arrs, lb0 = staged(T, n)

        @jax.jit
        def run(Q, R, A, B, q, r, cv, lb, pert):
            outs = fsq._call_fused_sequence(
                jnp.full((T,), 1e-3, jnp.float32), 0.0, max_iters,
                Q * pert, R, A, B, q, r, cv, lb,
                s=s_, c=c_, K_sub=K_sub, g=g, L=L, sp=sp, n_groups=n, T=T,
                flops_scale=16 * n * K_, poly_degree=1,
                precond="symmetric_stair", interpret=False)
            return jnp.sum(outs[0]) + jnp.sum(outs[1])

        float(run(*arrs, lb0, 1.0))
        ts = []
        for i in range(reps):
            t0 = time.perf_counter()
            float(run(*arrs, lb0, 1.0 + 1e-6 * (i + 1)))
            ts.append((time.perf_counter() - t0) * 1e3)
        return float(np.median(ts))

    out = {"probe": "G", "per_n": {}}
    T1, T2 = 48, 96
    for n in (1, 2, 4, 8, 16):
        row = {}
        for mi, tag in ((0, "fix"), (11, "it11")):
            ms1, ms2 = time_cfg(T1, n, mi), time_cfg(T2, n, mi)
            row[f"{tag}_us_per_group_step"] = round(
                1e3 * (ms2 - ms1) / (T2 - T1) / n, 2)
        out["per_n"][n] = row
        print(json.dumps({n: row}), flush=True)
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    which = sys.argv[1:] or ["A", "B", "C", "D", "E"]
    print(json.dumps({"devices": str(jax.devices()),
                      "rtt_ms": round(timing.measure_rtt_ms(), 2)}), flush=True)
    for p in which:
        globals()[f"probe_{p}"]()
