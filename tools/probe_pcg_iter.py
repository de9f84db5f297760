"""Round-4 fused-PCG per-iteration probe: name the gap above the issued
ceiling (VERDICT r3 #2).

The batched fused PCG kernel measures ~34% of the useful-FLOP compute
roofline at B=256.  bench._flops_issued_pcg_fused accounts the layout's
issued work (sublane pad, K_sub lane pad, dot reductions, freeze selects);
this probe demonstrates where the REST of the cycles go, the way the Thomas
theta experiment demonstrated its issue-latency bound:

  width   Per-iteration cost vs lane width, at exit_tol=0 with max_iters
          pinned (maxit 16-vs-0 differencing — zero exit-test variance).
          Each row reports the per-GROUP-iteration time (one Pallas program
          iterating on (sp, L) tiles; the grid over groups is sequential on
          one core).  A cost FLAT in L means dependency-latency (the
          lax.scan finding, CLAUDE.md); cost proportional to L means issue
          throughput.  B in {1, 4, 8} sweeps L in {128, 256, 512} at one
          group; B >= 16 pins the shipping geometry (g=16, L=896) and
          sweeps the grid size instead.

Usage:
    PYTHONPATH="$PYTHONPATH:." python tools/probe_pcg_iter.py
Prints one JSON line per width.  Nothing here feeds BENCH_DETAIL.json.

CONCLUSIONS (v5e, 2026-08-20 — these set the 'issue+dependency' bound label
in bench.annotate_roofline's pcg_fused branch):

  * group-iteration cost (us) vs L: 0.344 @ 128 (g=1, unroll=4) /
    0.846 @ 256 / 1.18 @ 512 / 1.205 @ 896 — then FLAT across the grid:
    1.205 / 1.35 / 1.32 / 1.38 at n_groups = 1/4/8/16 (B = 16/64/128/256).
    Widening 512 -> 896 lanes cost +2%: the kernel is NOT
    throughput-bound at its shipping width.
  * The issued-FLOPs model (bench._flops_issued_pcg_fused) accounts 0.72
    us of the 1.2-1.38 (52-60%); the remainder is non-FLOP issue (4 rolls,
    3 freeze selects, 5 MXU reduction/broadcast passes per iteration) plus
    the dependent-chain latency of the serial PCG body (mvS -> dot ->
    alpha -> axpy -> mvP -> dot -> beta -> p), which the ~0.34 us floor at
    L=128 and the free 512 -> 896 widening demonstrate.
  * Consequence: per-solve cost falls only by packing more problems per
    group, and g=16 is VMEM-capped (13 MiB budget of ~16 MB/core; 2x g
    needs ~26 MiB — impossible without halving the per-lane working set).
    Attacks rejected: fewer vector ops (the body is ~90% two block-tridiag
    matvecs already in the VPU-native column-FMA form), MXU-ing the small
    matvecs (the contraction runs over sublanes within a lane — wrong axis
    for the MXU), one-reduction CG variants (change rounding -> break the
    exact iteration-parity invariant).
"""

import json
import sys

import numpy as np

import jax
import jax.numpy as jnp

from gato_tpu.formats import KKTBlocks
from gato_tpu.problem import ProblemSpec, SolverOptions
from gato_tpu.testing import random_blocks
from gato_tpu.timing import time_solve


def _log(m):
    print(m, file=sys.stderr, flush=True)


SPEC = ProblemSpec(14, 7, 50)


def _staged(batch, seed=1000):
    problems = [random_blocks(SPEC, seed=seed + i) for i in range(batch)]
    blocks = KKTBlocks(*(jax.device_put(
        jnp.asarray(np.stack([np.asarray(p[f]) for p in problems])))
        for f in range(7)))
    float(jnp.sum(blocks.q))
    return blocks


def probe_width(Bs=(16, 64, 128, 256), maxit=16, T=12):
    import bench
    from gato_tpu.kernels import fused_solve as fs

    for B in Bs:
        blocks = _staged(B)
        K_sub, g, L, n_groups, sp = fs.plan_packing(
            B, SPEC.knot_points, SPEC.state_size, SPEC.control_size)

        def timed(mi):
            o = SolverOptions(rho=1e-3, exit_tol=0.0, max_iters=mi)
            ms, _ = time_solve(SPEC, blocks, o, pcg_backend="fused", T=T,
                               label=f"pcg_iter/B{B}/maxit{mi}", log=_log)
            return ms

        ms0, msN = timed(0), timed(maxit)
        per_iter_batch_ms = (msN - ms0) / maxit
        group_iter_us = 1e3 * per_iter_batch_ms / n_groups
        issued = bench._flops_issued_pcg_fused(
            SPEC.state_size, SPEC.control_size, SPEC.knot_points, B,
            maxit) - bench._flops_issued_pcg_fused(
            SPEC.state_size, SPEC.control_size, SPEC.knot_points, B, 0)
        issued_group_iter_us = (issued * B / n_groups / maxit
                                / bench._V5E["vpu_f32_flops"] * 1e6)
        print(json.dumps({
            "B": B, "g": g, "L": L, "n_groups": n_groups,
            "per_iter_us_per_solve": round(1e3 * per_iter_batch_ms / B, 4),
            "group_iter_us": round(group_iter_us, 3),
            "issued_model_group_iter_us": round(issued_group_iter_us, 3),
            "pct_of_issued": round(100 * issued_group_iter_us
                                   / group_iter_us, 1)
            if group_iter_us > 0 else None,
            "fixed_ms0": round(ms0, 4), "msN": round(msN, 4),
        }), flush=True)


if __name__ == "__main__":
    probe_width()
