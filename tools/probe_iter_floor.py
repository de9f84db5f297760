"""Round-5 single-solve iteration-floor experiment (VERDICT r4 #3: the
headline has sat at ~15.7 us for three rounds against a <=14 us target, with
``bound: "latency"`` asserted but never DEMONSTRATED the way the Thomas
tier's theta-rebuild negative result pinned its bound).

Two measurements on real TPU:

  A. A NULL kernel with the exact op-chain structure of one fused-PCG
     iteration at the single-solve geometry (g=1, sp=16, L=128) but no
     algorithm: n_mv block-tridiagonal matvecs (2 pltpu.rolls + 3 slots x
     s=14 column-FMAs each, literally the btd_mv shape), n_dot
     reduce->broadcast->axpy sequences (full-tile multiply, sublane sum,
     lane sum, scalar guard, broadcast FMA — the nu->alpha->axpy chain),
     and the three full-tile freeze selects, inside the same
     lax.while_loop.  R-vs-2R trip differencing gives ns/trip; sweeping
     n_mv and n_dot fits trip = c0 + c_mv*n_mv + c_dot*n_dot.
  B. The REAL kernel's per-iteration cost at exit_tol=0 via max_iters
     16-vs-48 differencing (zero exit-test variance), poly_degree 1 and 2.

The floor claim is demonstrated if B(poly1) ~= A's prediction at the real
body's op counts (poly1 = 2 matvecs + 2 dots; poly2 = 4 matvecs + 2 dots +
2 extra axpys): the iteration body then costs what ANY Mosaic loop issuing
that dependent op chain costs, and no per-op tuning inside the body can
reach <=14 us — only an algorithm with fewer chained ops could, which the
exact-iteration-parity invariant forbids.  B(poly2)/B(poly1) also explains
the "poly2 bought ~0 us" observation: 19 heavier iterations == 27 light
ones when per-iteration cost ~ c_mv * n_mv.

Usage (real TPU, serialized with other chip users):
    PYTHONPATH="$PYTHONPATH:." python tools/probe_iter_floor.py
Prints one JSON line per probe; bench.py's ``iiwa_single_iter_floor``
config records the compact version in BENCH_DETAIL.json.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

S = 14          # IIWA state size: columns per matvec slot
SP = 16         # sublane-padded block rows
L = 128         # single-solve lane tile (K=50 -> one 128-lane tile)


def _null_kernel_time_ns(n_mv: int, n_dot: int, R: int = 50_000,
                         reps: int = 7, log=None):
    """ns per while-loop trip of the structure-matched null body."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dt = jnp.float32

    def make(R):
        def kernel(M_ref, y_ref, out_ref):
            Mc = [M_ref[b] * 0.01 for b in range(3 * S)]

            def matvec(y):
                # btd_mv shape: two rolls + 3 slots x S column-FMAs + 2 adds
                xm = pltpu.roll(y, shift=1, axis=1)
                xp = pltpu.roll(y, shift=L - 1, axis=1)
                acc = None
                for slot, x in ((0, xm), (1, y), (2, xp)):
                    a = Mc[slot * S] * x[0:1, :]
                    for b in range(1, S):
                        a = a + Mc[slot * S + b] * x[b : b + 1, :]
                    acc = a if acc is None else acc + a
                return acc

            def cond(st):
                return st[1] < R

            def body(st):
                y, it = st
                for _m in range(n_mv):
                    # contraction keeps magnitudes bounded over 100k trips
                    y = matvec(y) * 0.25 + y * 0.5
                for _d in range(n_dot):
                    # the nu -> alpha -> axpy dependent chain
                    row = jnp.sum(y * y, axis=0, keepdims=True)   # (1, L)
                    sc = jnp.sum(row, axis=1, keepdims=True)      # (1, 1)
                    a = jnp.where(sc != 0, 1.0 / (1.0 + sc), 0.0)
                    y = y + jnp.broadcast_to(a, (1, L)) * (y * 0.125)
                # freeze bookkeeping: lane-row compare + 3 full-tile selects
                live = (jnp.broadcast_to(
                    jnp.sum(y[0:1, :], axis=1, keepdims=True), (1, L))
                    > -1e30)
                y = jnp.where(live, y, y * 0.5)
                y = jnp.where(live, y, y + 1.0)
                y = jnp.where(live, y, y * 0.25)
                return (y, it + 1)

            y, _ = jax.lax.while_loop(
                cond, body, (y_ref[...], jnp.zeros((), jnp.int32)))
            out_ref[...] = y

        @jax.jit
        def run(M, y):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((SP, L), dt),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(M, y)

        return run

    M = jax.device_put(jnp.ones((3 * S, SP, L), dt))
    y0 = jax.device_put(jnp.full((SP, L), 0.5, dt))
    ts = {}
    for RR in (R, 2 * R):
        run = make(RR)
        float(jnp.sum(run(M, y0)))  # compile
        rs = []
        for i in range(reps):
            y = y0 * (1.0 + 1e-6 * i)
            t0 = time.perf_counter()
            float(jnp.sum(run(M, y)))  # scalar fetch = the reliable fence
            rs.append(time.perf_counter() - t0)
        ts[RR] = float(np.median(rs))
        if log:
            log(f"  null(n_mv={n_mv}, n_dot={n_dot}) R={RR}: "
                f"{ts[RR] * 1e3:.2f} ms")
    return (ts[2 * R] - ts[R]) / R * 1e9


def probe_null(log=None):
    """Sweep (n_mv, n_dot), fit trip = c0 + c_mv*n_mv + c_dot*n_dot."""
    grid = [(2, 2), (1, 2), (4, 2), (2, 1), (2, 4)]
    rows = {}
    for n_mv, n_dot in grid:
        rows[(n_mv, n_dot)] = _null_kernel_time_ns(n_mv, n_dot, log=log)
    # Least squares on the 5 rows.
    A = np.array([[1.0, m, d] for (m, d) in grid])
    b = np.array([rows[k] for k in grid])
    c0, c_mv, c_dot = np.linalg.lstsq(A, b, rcond=None)[0]
    out = {
        "probe": "null_chain",
        "rows_ns": {f"mv{m}_dot{d}": round(rows[(m, d)], 1)
                    for (m, d) in grid},
        "c0_ns_per_trip": round(float(c0), 1),
        "c_mv_ns": round(float(c_mv), 1),
        "c_dot_ns": round(float(c_dot), 1),
        # the real poly1 body: 2 matvecs + 2 dots (+ bookkeeping, in c0)
        "predicted_poly1_iter_ns": round(float(c0 + 2 * c_mv + 2 * c_dot), 1),
        "predicted_poly2_iter_ns": round(float(c0 + 4 * c_mv + 2 * c_dot), 1),
    }
    print(json.dumps(out), flush=True)
    return out


def probe_real(log=None):
    """Measured per-iteration cost of the shipping fused kernel (g=1,
    unroll=4) at exit_tol=0 via maxit 16-vs-48 differencing."""
    from gato_tpu.problem import ProblemSpec, SolverOptions
    from gato_tpu.formats import KKTBlocks
    from gato_tpu.testing import random_blocks
    from gato_tpu.timing import time_solve

    spec = ProblemSpec(14, 7, 50)
    blocks = KKTBlocks(*(jax.device_put(jnp.asarray(a))
                         for a in random_blocks(spec, seed=7)))
    float(jnp.sum(blocks.q))

    out = {"probe": "real_kernel"}
    for poly in (1, 2):
        ts = {}
        for mi in (16, 48):
            o = SolverOptions(rho=1e-3, exit_tol=0.0, max_iters=mi,
                              precond_poly_degree=poly)
            ms, _ = time_solve(spec, blocks, o, pcg_backend="fused",
                               T=512, label=f"floor/poly{poly}/maxit{mi}",
                               log=log)
            ts[mi] = ms
        per_iter_ns = (ts[48] - ts[16]) / 32.0 * 1e6
        out[f"poly{poly}_maxit16_us"] = round(ts[16] * 1e3, 3)
        out[f"poly{poly}_maxit48_us"] = round(ts[48] * 1e3, 3)
        out[f"poly{poly}_per_iter_ns"] = round(per_iter_ns, 1)
    out["poly2_over_poly1"] = round(
        out["poly2_per_iter_ns"] / out["poly1_per_iter_ns"], 3)
    print(json.dumps(out), flush=True)
    return out


def main():
    def log(m):
        print(m, file=sys.stderr, flush=True)

    null = probe_null(log=log)
    real = probe_real(log=log)
    # unroll=4 amortizes the trip overhead over 4 masked iterations.
    predicted = (null["c0_ns_per_trip"] / 4.0
                 + 2 * null["c_mv_ns"] + 2 * null["c_dot_ns"])
    summary = {
        "probe": "summary",
        "predicted_poly1_iter_ns_at_unroll4": round(predicted, 1),
        "measured_poly1_iter_ns": real["poly1_per_iter_ns"],
        "measured_over_predicted": round(
            real["poly1_per_iter_ns"] / predicted, 3),
        "poly2_over_poly1_measured": real["poly2_over_poly1"],
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
