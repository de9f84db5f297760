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


def _jsonable(obj):
    """Recursively cast NumPy scalars/arrays so every dict this harness
    prints or serializes is json.dumps-able (a raw np.float64 repr leaking
    onto the stdout line would crash the driver's parser)."""
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, np.generic):
        return obj.item()
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    return obj


from gato_tpu.timing import (chain_time, measure_rtt_ms,  # noqa: E402
                             perturb, _best_cluster)


def scan_chain_time(step_fn, q0, T, reps=7, n_independent=2,
                    min_diff_ms=8.0, label=""):
    """bench-local wrapper: gato_tpu.timing.chain_time with stderr logging."""
    return chain_time(step_fn, q0, T, reps=reps, n_independent=n_independent,
                      min_diff_ms=min_diff_ms, label=label, log=_log)


def _perturb(blocks, q0, lam_carry, t):
    return perturb(blocks, q0, lam_carry, t)


# --------------------------------------------------------------------------
# Roofline accounting (the measurement the reference never had: its harness
# reports wall clock only, gpu_library.cu:166-198).  Analytic FLOPs and HBM
# bytes per solve, achieved GFLOP/s / GB/s, and distance to the BINDING
# roofline, so every latency below states how far from the hardware limit it
# sits.  FLOP conventions: FMA = 2 flops, Gauss-Jordan inverse of n x n =
# 2n^3, (n,m)x(m,k) product = 2nmk; estimates are +-20%-accurate by design
# (they bucket configs into latency/bandwidth/compute-bound, not cycle
# counts).

_V5E = {
    # The solver's kernels are f32 VPU work (lane FMAs).  The 4-ALU paper
    # peak (8*128 lanes x 4 ALUs x 2 flops at ~940 MHz ~= 7.5 TFLOP/s) is
    # NOT sustainable for the serial column-FMA mix these kernels issue:
    # measured on this chip (tools/probe_throughput.py probe D, an R-round
    # matvec chain at the kernels' own (16, 896) tile), a 14-column FMA
    # matvec costs ~109 ns = ~0.46 ns per (8,128) vreg-FMA = ~2 vreg
    # ops/cycle, i.e. ~4.1 TFLOP/s.  The roofline uses the MEASURED ceiling
    # so pct_of_roofline states distance to what the hardware actually
    # delivers on this op mix (round-2 used 7.5e12, overstating every
    # compute-bound gap by ~1.8x).  HBM 819 GB/s.
    "vpu_f32_flops": 4.1e12,
    "hbm_Bps": 819e9,
}


def _gj(n):
    return 2 * n ** 3


def _flops_condense(s, c, K, precond="symmetric_stair"):
    per = (_gj(s) + _gj(c)                    # Qinv, Rinv
           + 2 * s ** 3 + 2 * s * c * c      # phi, B Rinv
           + 2 * s ** 3 + 2 * s * s * c      # phi A^T, BR B^T
           + 6 * s * s + 4 * s * c)          # gamma / vector terms
    if precond == "symmetric_stair":
        per += _gj(s) + 2 * (2 * s ** 3)     # theta inv + stair products
    elif precond == "block_jacobi":
        per += _gj(s)
    return K * per


def _flops_pcg(s, K, iters, poly_degree=1):
    mv = 2 * 3 * s * s * K                   # one block-tridiag matvec
    per_iter = (2 + 2 * (poly_degree - 1)) * mv + 10 * s * K
    return iters * per_iter + 2 * mv         # + r0 / r~0 setup


def _flops_recover(s, c, K):
    return K * (4 * s * s + 2 * s * c + 2 * c * c + 6 * s)


def _flops_direct_cr(s, K):
    # Per eliminated row: one GJ + 6 (s,s) products (direct.btd_solve_cr);
    # back-substitution 3 matvecs per row.
    return K * (_gj(s) + 6 * 2 * s ** 3) + K * 3 * 2 * s * s


def _flops_direct_thomas(s, K):
    # Batch-in-lanes block-Thomas (kernels/thomas_batch.py), beyond the
    # condensation: per knot one GJ (Dhat inverse) + two (s,s) products
    # (M = phi Cinv, M phi^T) forward, and ~10 matvecs across
    # back-substitution, true residual and the carried recovery terms.
    return K * (_gj(s) + 2 * 2 * s ** 3 + 10 * 2 * s * s)


def _flops_issued_thomas(s, c, K, B):
    """ISSUED-work model for the batch-in-lanes Thomas kernel: every tile op
    runs on (sp, Lb) with s live sublanes and B/(Lb*n_groups) of the lane
    plan live per solve — at full batches the only waste is the sublane pad
    (sp/s, 16/14 at IIWA width), which is why this layout recovers the
    occupancy the knots-in-lanes CR kernel gives up (4.8x issued there)."""
    from gato_tpu.kernels import thomas_batch as _tb

    sp, Lb, n_groups = _tb.plan_packing(B, s, c)
    needed = (_flops_condense(s, c, K, precond=None)
              + _flops_direct_thomas(s, K) + _flops_recover(s, c, K))
    return int(needed * (sp / s) * (Lb * n_groups / B))


def _flops_issued_direct_fused(s, c, K, B=1):
    """ISSUED-work model for the fused cyclic-reduction kernel: every
    elimination/back-substitution level executes full-width masked vector
    ops over the packed lane tile (direct_fused._cr_solve blends with
    even/odd lane masks — retired lanes still carry the GJ and the six
    block products), so the vector units process levels*lanes rows, not K.
    The per-solve share is levels * (L / g) lanes from the actual packing
    plan.  This is the kernel's real arithmetic issue rate — the gap
    between it and the useful-FLOP roofline is the level-halving
    algorithm's masked-lane occupancy, not dispatch latency."""
    from gato_tpu.kernels import direct_fused as _df

    K_sub, g, L, _, _ = _df.plan_packing(B, K, s, c)
    levels = _df._n_levels(K_sub)
    lanes_per_solve = L / g
    per_row_elim = _gj(s) + 6 * 2 * s ** 3 + 4 * 2 * s * s   # GJ + 6 prods + blends
    per_row_back = 3 * 2 * s * s                              # 3 matvecs
    cr = levels * lanes_per_solve * (per_row_elim + per_row_back)
    return int(_flops_condense(s, c, K, precond=None) + cr
               + _flops_recover(s, c, K))


def _flops_issued_pcg_fused(s, c, K, B, iters, poly_degree=1):
    """ISSUED-work model for the fused PCG kernel (VERDICT r3 #2 — the
    Thomas tier's issued-FLOPs discipline applied to the PCG loop).

    Counts what the kernel actually executes per iteration on its (sp, L)
    lane tiles, from the pcg_loop body (kernels/pcg_pallas.py): two 3-block
    matvecs (6s column FMAs, x(2p-1) matvecs per preconditioner apply at
    poly degree p), the dot-product multiplies, three axpys, the three
    per-problem freeze selects and four neighbor rolls (counted at FMA
    weight — over-counting non-FMA ops roughly offsets the uncounted
    (1, g)-scalar arithmetic; +-20% model like everything here), plus the
    MXU segment reductions/broadcasts (seg_sum x2, lanes x3: (1,L)x(L,g)
    passes).  The +1 iteration is the r0/p0/eta0 setup.  Fixed stages
    (condense, stair preconditioner, recovery) issue their useful FLOPs
    scaled by the sublane pad (sp/s) and the lane occupancy (L lanes carry
    g problems x K real knots).

    The gap between this ceiling and the useful-FLOP roofline is the
    layout's occupancy cost (pads + masked lanes + reduction traffic); the
    gap between MEASURED time and this ceiling is dependency/issue stalls
    the flop count cannot see (tools/probe_pcg_iter.py names it by width
    sweep)."""
    from gato_tpu.kernels import fused_solve as _fs

    K_sub, g, L, n_groups, sp = _fs.plan_packing(B, K, s, c)
    p = poly_degree
    vec_ops = 3 * s * (2 * p) + 12            # mvS + apply_P + vector tail
    group_iter = (vec_ops * sp * L * 2        # full-tile vector ops
                  + 2 * sp * L * 2            # dot sublane pre-reductions
                  + 5 * L * g * 2)            # seg_sum x2 + lanes x3 (MXU)
    per_solve_iter = group_iter / g
    occupancy = (sp / s) * (L / (g * K))
    fixed = (_flops_condense(s, c, K, precond="symmetric_stair")
             + _flops_recover(s, c, K)) * occupancy
    return int(fixed + (iters + 1) * per_solve_iter)


def _bytes_io(s, c, K):
    """Problem blocks in + (lam, dz) out, once — the floor every backend
    pays."""
    ins = K * (2 * s * s + c * c + s * c + 2 * s + c)
    outs = 3 * K * s
    return 4 * (ins + outs)


# The kernels' own rounding (sp, Kp tiling) — imported, not re-derived, so
# the roofline byte model cannot desynchronize from the packed sizes.
from gato_tpu.kernels.pcg_pallas import _round_up  # noqa: E402


def _bytes_op_packed(s, K):
    """One pass over one packed operator (S or Pinv) in the lane layout."""
    return 4 * 3 * s * _round_up(s, 8) * _round_up(K, 128)


def _bytes_op_plain(s, K):
    return 4 * 3 * s * s * K


def _solve_flops_bytes(kind, s, c, K, iters, poly_degree=1):
    """(flops, hbm_bytes_floor, hbm_bytes_restream) per solve for a kind.

    Two-sided byte model.  ``floor`` is the unavoidable traffic — every
    operand crosses HBM at most once in each direction (problem in, results
    out, HBM-materialized operators written once + read once); no solve can
    beat max(flops/peak, floor/bw).  ``restream`` is the zero-reuse model —
    what the backend's structure implies if every per-iteration operator
    pass went all the way to HBM.  Measured times land between the two; the
    gap is cross-iteration on-chip reuse (measured up to ~4x at K=8192:
    Mosaic keeps most tile re-reads on chip).  Resident kinds have
    floor == restream.
    """
    fl_full = (_flops_condense(s, c, K) + _flops_pcg(s, K, iters, poly_degree)
               + _flops_recover(s, c, K))
    io = _bytes_io(s, c, K)
    if kind == "pcg_fused":          # whole solve VMEM-resident
        return fl_full, io, io
    if kind == "pcg_jax":            # XLA re-reads S+Pinv (+~6 vectors)/iter
        per_iter = 2 * _bytes_op_plain(s, K) + 6 * 4 * K * s
        floor = io + 4 * _bytes_op_plain(s, K)
        return fl_full, floor, floor + iters * per_iter
    if kind == "pcg_fused_xl":       # condense+PCG one kernel: S/Pinv never
        # touch HBM; only Qinv/Rinv round-trip to the recovery kernel.
        rt = 2 * 4 * (s + c) * _round_up(s, 8) * _round_up(K, 128)
        return fl_full, io + rt, io + rt
    if kind == "pcg_xl":             # condense writes S/Pinv, XL reads once
        b = io + 4 * _bytes_op_packed(s, K)
        return fl_full, b, b
    if kind == "pcg_stream":         # + operators re-streamed per iteration
        per_iter = 2 * poly_degree * _bytes_op_packed(s, K)
        floor = io + 4 * _bytes_op_packed(s, K)
        return fl_full, floor, io + 2 * _bytes_op_packed(s, K) + iters * per_iter
    if kind == "direct_fused":
        fl = (_flops_condense(s, c, K, precond=None) + _flops_direct_cr(s, K)
              + _flops_recover(s, c, K))
        return fl, io, io
    if kind == "direct_thomas":
        # Two-pass kernel: the forward factor stacks (Cinv, bhat, Qinv, Rinv,
        # phi, theta, gamma — thomas_batch._cols out_cols) round-trip through
        # HBM between the passes, and the reverse pass re-reads q/A/B/r
        # (~half the input bytes).  Per-step work is VMEM-resident, so
        # floor == restream.
        fl = (_flops_condense(s, c, K, precond=None)
              + _flops_direct_thomas(s, K) + _flops_recover(s, c, K))
        rt = 2 * 4 * (4 * s + c + 2) * _round_up(s, 8) * K
        b = io + rt + io // 2
        return fl, b, b
    if kind == "direct_jax":         # CR materializes ~2x operator per level sum
        fl = (_flops_condense(s, c, K, precond=None) + _flops_direct_cr(s, K)
              + _flops_recover(s, c, K))
        floor = io + 4 * _bytes_op_plain(s, K)
        return fl, floor, io + 6 * _bytes_op_plain(s, K)
    if kind == "direct_xl":
        # Long-horizon exact tier (longk._direct_xl_call): chunked condense
        # writes S (packed) once, the CR kernel DMAs it once and runs
        # log2(Kp) lane-parallel elimination levels — every level computes
        # on ALL Kp lanes (masked blend), unlike the XLA CR's halving
        # schedule, so the FLOP count carries the levels*Kp factor.  The
        # in-place CR destroys its scratch copy, so the true-residual check
        # re-reads S once more in XLA (the third packed-operator pass).
        Kp = _round_up(K, 128)
        levels = max(1, (Kp - 1).bit_length())
        fl = (_flops_condense(s, c, K, precond=None)
              + levels * Kp * (_gj(s) + 6 * 2 * s ** 3 + 4 * 2 * s * s)
              + _flops_recover(s, c, K))
        rt = 2 * 4 * (s + c) * _round_up(s, 8) * Kp   # Qinv/Rinv round-trip
        b = io + 3 * _bytes_op_packed(s, K) + rt
        return fl, b, b
    raise ValueError(kind)


def annotate_roofline(entry, spec, kind, *, ms_per_solve=None,
                      iters=None, poly_degree=1, batch=1):
    """Attach flops/bytes/roofline fields to a measured config entry.

    ``pct_of_roofline`` is measured against the FLOOR roofline (the true
    lower bound on time), so it is always a meaningful <=100%-ish figure;
    for re-streaming kinds the zero-reuse model is reported alongside as
    ``restream_ms`` with the achieved ``reuse_factor`` (restream/actual,
    >1 = the kernel beat the zero-reuse model via on-chip tile reuse).
    """
    s, c, K = spec.state_size, spec.control_size, spec.knot_points
    ms = ms_per_solve if ms_per_solve is not None else entry.get(
        "avg_ms_device")
    if iters is None:
        iters = entry.get("pcg_iters", 0)
    if not ms or ms <= 0:
        return entry
    flops, hbm_floor, hbm_restream = _solve_flops_bytes(
        kind, s, c, K, iters, poly_degree)
    t = ms / 1e3
    comp_s = flops / _V5E["vpu_f32_flops"]
    floor_s = max(comp_s, hbm_floor / _V5E["hbm_Bps"])
    restream_s = max(comp_s, hbm_restream / _V5E["hbm_Bps"])
    # pct is distance to the absolute floor; the bound label describes the
    # backend's structure (zero-reuse traffic vs arithmetic).
    bound = ("compute" if comp_s >= hbm_restream / _V5E["hbm_Bps"]
             else "bandwidth")
    pct = 100.0 * floor_s / t
    if ms > 5 * restream_s * 1e3:
        # Far above even the zero-reuse model: the cost is dispatch and
        # dependency stalls, not the hardware's arithmetic or memory
        # ceilings.
        bound = "latency"
    entry["roofline"] = {
        "flops_per_solve": int(flops),
        # Floor bytes: unavoidable traffic, the basis of the roofline.
        "hbm_bytes_per_solve": int(hbm_floor),
        "achieved_gflops": round(flops / t / 1e9, 1),
        # From floor bytes: exact for resident kinds, a lower bound on the
        # achieved bandwidth for re-streaming kinds.
        "achieved_gbps": round(hbm_floor / t / 1e9, 1),
        "roofline_ms": round(floor_s * 1e3, 6),
        "pct_of_roofline": round(pct, 1),
        "bound": bound,
    }
    if hbm_restream != hbm_floor:
        entry["roofline"]["hbm_bytes_restream"] = int(hbm_restream)
        entry["roofline"]["restream_ms"] = round(restream_s * 1e3, 6)
        entry["roofline"]["reuse_factor"] = round(restream_s / t, 2)
    if kind == "pcg_fused":
        # Issued-FLOPs ceiling for the fused PCG kernel (VERDICT r3 #2):
        # same discipline as the Thomas/CR tiers below.  pct close to
        # pct_of_roofline would certify near-zero layout waste; the
        # measured residue beyond it is dependency/issue stalls
        # (tools/probe_pcg_iter.py demonstrates by width sweep).
        issued = _flops_issued_pcg_fused(s, c, K, batch, max(iters, 1),
                                         poly_degree)
        iss_s = issued / _V5E["vpu_f32_flops"]
        entry["roofline"]["flops_issued_per_solve"] = int(issued)
        entry["roofline"]["pct_of_issued_ceiling"] = round(
            100.0 * iss_s / t, 1)
        # Measured bound (tools/probe_pcg_iter.py width sweep): at the
        # shipping group width the issued FLOPs explain 52-60% of the
        # cycles and the rest is non-FLOP issue slots + the serial PCG
        # body's dependency latency (group-iteration cost flat from
        # L=512 to 896); when the issued model explains >= 40% the honest
        # label is that mix, not the useful-FLOP "compute" distance.
        if iss_s / t >= 0.40:
            entry["roofline"]["bound"] = "issue+dependency"
    if kind == "direct_fused":
        # Name the gap (VERDICT r2 weak #1: no catch-all "latency" labels):
        # the fused CR issues full-width masked levels, so measure the
        # kernel against what it actually issues too.  When the issued-work
        # time explains >=1/3 of the measured time, the binding limit is
        # masked-lane OCCUPANCY (the level-halving algorithm), not dispatch.
        issued = _flops_issued_direct_fused(s, c, K, B=batch)
        iss_s = issued / _V5E["vpu_f32_flops"]
        entry["roofline"]["flops_issued_per_solve"] = int(issued)
        entry["roofline"]["pct_of_issued_ceiling"] = round(
            100.0 * iss_s / t, 1)
        if entry["roofline"]["bound"] == "latency" and iss_s / t >= 0.33:
            entry["roofline"]["bound"] = "occupancy"
    if kind == "direct_thomas":
        # Same issued-vs-needed accounting for the batch-in-lanes layout:
        # here issued ~= needed * sp/s (sublane pad only), so pct_of_issued
        # close to pct_of_roofline certifies the occupancy fix landed.
        issued = _flops_issued_thomas(s, c, K, B=batch)
        iss_s = issued / _V5E["vpu_f32_flops"]
        entry["roofline"]["flops_issued_per_solve"] = int(issued)
        entry["roofline"]["pct_of_issued_ceiling"] = round(
            100.0 * iss_s / t, 1)
        # The byte model puts this kernel at ~80% of the bandwidth roofline,
        # but a direct experiment falsified bandwidth as the binding limit:
        # rebuilding theta in-kernel (-21% factor traffic, +20% serial
        # flops, zero extra reads) ran 0.91 -> 1.13 us/solve at B=256.  The
        # sequential knot walk is bound by the issue latency of its
        # dependent per-knot op chain (thomas_batch.py module docstring).
        if entry["roofline"]["bound"] == "bandwidth":
            entry["roofline"]["bound"] = "issue-latency"
    return entry


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


def bench_direct_served(spec, options, batch=256, *, T=32):
    """EXACT batched serving on pre-packed inputs (gato_tpu.packed,
    tier='thomas' at this batch): the fleet-serving loop's cost with no
    matrix relayout in the loop — same protocol as bench_batch_split's
    packed_serving chain (packed arrays perturbed in place; a rhs-refresh
    loop additionally pays the O(s)-per-knot vector repack)."""
    import dataclasses as _dc

    from gato_tpu import packed as _pk

    blocks = _staged_blocks(spec, seed=1000, batch=batch)
    packed = _pk.pack(spec, blocks, method="direct")
    float(jnp.sum(packed.Qb) + jnp.sum(packed.qb))  # fence staging

    def step_served(q0, lam_carry, t):
        pert = (1.0 + 1e-6 * jnp.cos(t)
                + 1e-7 * jnp.tanh(jnp.sum(lam_carry)))
        p_t = _dc.replace(packed, Qb=packed.Qb * pert,
                          qb=q0 * (1.0 + 1e-6 * jnp.sin(t)))
        res = _pk.solve_packed(p_t, options)
        # The thomas tier returns flat (n_groups*K, sp, Lb) kernel layout;
        # fold it back to qb's (n_groups, K, sp, Lb) so the scan carry
        # type-checks (same bytes, free reshape).
        return (res.lam_p + res.dzx_p + res.dzu_p).reshape(q0.shape)

    ms, info = scan_chain_time(step_served, packed.qb, T,
                               label=f"batch{batch}/direct_served")
    return {
        "batch": batch,
        "tier": packed.plan.tier,
        "ms_per_batch": round(ms, 4),
        "solves_per_sec": round(batch / (ms / 1e3), 1),
        "us_per_solve": round(1e3 * ms / batch, 4),
        **info,
    }


def bench_mpc_farm_direct(spec, options, B=64, Tseq=4, *, T=12):
    """The EXACT MPC farm: mpc.solve_sequence_batched(method='direct').
    No warm-start carry exists for an exact solve, so the (Tseq, B) grid
    folds into ONE batch of Tseq*B batch-in-lanes Thomas solves (per-step
    rhos diagonal-folded) — the wide-fleet serving pick the pecking-order
    note in README recommends over the warm PCG farm.  Chain methodology
    of bench_batch (each chain step one whole farm call on fresh data);
    us_per_solve includes the surface's fold/reshape."""
    import functools

    from gato_tpu.formats import KKTBlocks
    from gato_tpu.mpc import _solve_sequence_batched_direct_core
    from gato_tpu.problem import Preconditioner
    from gato_tpu.timing import chain_time, perturb

    flat = _staged_blocks(spec, seed=1000, batch=Tseq * B)
    b = KKTBlocks(*(a.reshape((Tseq, B) + a.shape[1:]) for a in flat))
    rhos = jnp.full((Tseq,), options.rho, jnp.float32)
    float(jnp.sum(b.q))  # fence staging

    core = functools.partial(
        _solve_sequence_batched_direct_core.__wrapped__,
        preconditioner=Preconditioner.SYMMETRIC_STAIR,
        pcg_backend="fused", poly_degree=1,
    )

    def step(q0, lam_carry, t):
        Q, q = perturb(b, q0, lam_carry, t)
        res = core(Q, b.R, b.A, b.B, q, b.r, b.c, rhos)
        return res.lam + res.dz_x + 1e-20 * jnp.sum(res.dz_u)

    ms, info = chain_time(step, b.q, T, label=f"farm_direct{Tseq}x{B}",
                          log=_log)
    n = Tseq * B
    return {
        "seq_T": Tseq,
        "batch": B,
        "ms_per_call": round(ms, 4),
        "solves_per_sec": round(n / (ms / 1e3), 1),
        "us_per_solve": round(1e3 * ms / n, 4),
        **info,
    }


def bench_batch_split(spec, options, full_entry, batch=256):
    """Measured throughput decomposition of the batched fused solve
    (VERDICT round-2 weak #1): with exit_tol=0 every problem runs EXACTLY
    max_iters iterations, so differencing max_iters=8 vs 16 yields the
    marginal per-iteration cost with no exit-test variance, and max_iters=0
    is the fixed cost (pack + input DMA + condense + preconditioner +
    recovery + unpack).  Alongside: the lockstep-exit accounting — each
    lane group runs until its SLOWEST member converges, so the effective
    iteration count is the group max, not the mean.

    Cost discipline (VERDICT r4 weak #3 — this config measured 633 s wall,
    the single most expensive row, for digits that tolerate ±10%): each
    chain's T is sized UP FRONT from ``full_entry``'s measured per-call time
    (scaled by the maxit fraction of the full solve, ratios from the
    committed artifact) so chain_time's first attempt clears the 8 ms noise
    floor instead of burning two fresh ~18 s kernel compiles per T-doubling
    retry; and the full-solve + packed-serving chains are gone (their digits
    are measured independently by iiwa_batch_256_fused / _direct_served —
    nothing binds them here)."""
    from gato_tpu.kernels import fused_solve as _fs
    from gato_tpu.problem import SolverOptions
    from gato_tpu.solver import solve_batched
    from gato_tpu.timing import time_solve

    blocks = _staged_blocks(spec, seed=1000, batch=batch)
    full_ms = float(full_entry["ms_per_batch"])  # measured, same protocol

    def timed(max_iters, tol, expect_frac):
        o = SolverOptions(rho=options.rho, exit_tol=tol, max_iters=max_iters,
                          preconditioner=options.preconditioner,
                          precond_poly_degree=options.precond_poly_degree)
        T = max(8, int(np.ceil(12.0 / (expect_frac * full_ms))))
        ms, _ = time_solve(spec, blocks, o, pcg_backend="fused", T=T,
                           label=f"batch_split/maxit{max_iters}", log=_log)
        return ms

    # maxit-fraction priors from the committed full-budget artifact
    # (fixed 0.38/full 0.99 etc.); chain_time still self-corrects by
    # doubling if a prior is badly off.
    ms0 = timed(0, 0.0, 0.35)
    ms8 = timed(8, 0.0, 0.55)
    ms16 = timed(16, 0.0, 0.65)

    # Pack-only chain: the per-step share of the fixed cost that is input
    # relayout, NOT kernel work.  Only the perturbed arrays (Q, q) repack
    # per step — XLA hoists the loop-invariant R/A/B/r/c packs out of the
    # scan in BOTH this chain and the solve chains above, so the two
    # measurements subtract cleanly: fixed - pack = launch + input DMA +
    # in-kernel condense/precond/recover + output unpack.
    import functools as _ft
    K_sub_p, g_p, L_p, n_groups_p, sp_p = _fs.plan_packing(
        batch, spec.knot_points, spec.state_size, spec.control_size)
    pm = _ft.partial(_fs._pack_mat, K_sub=K_sub_p, g=g_p, L=L_p,
                     n_groups=n_groups_p, sp=sp_p)
    pv = _ft.partial(_fs._pack_vec, K_sub=K_sub_p, g=g_p, L=L_p,
                     n_groups=n_groups_p, sp=sp_p)

    def step_pack(q0, lam_carry, t):
        Q, q = _perturb(blocks, q0, lam_carry, t)
        tot = jnp.sum(pm(Q)) + jnp.sum(pv(q))
        return jnp.broadcast_to(tot, q0.shape)

    ms_pack, _ = scan_chain_time(step_pack, blocks.q,
                                 max(64, int(np.ceil(12.0 / (0.03 * full_ms)))),
                                 label="batch_split/pack_only")
    # Longest lever (0 -> 16) for the marginal cost: the ladder is linear
    # (validated on-device at maxit in {0,8,16,32,64}: 0.0200-0.0221
    # ms/iter per 256-batch on every segment), and anchoring at ms0 makes
    # one mis-measured midpoint show up in the model check below instead
    # of corrupting the slope (a round-3 bench run recorded ms16 ~= ms8
    # once — a one-off transport artifact the 8-step lever turned into a
    # 30x-too-small per-iteration number).
    per_iter_ms = (ms16 - ms0) / 16.0

    res = solve_batched(spec, blocks, options, pcg_backend="fused")
    it = np.asarray(res.iters).astype(np.int64)
    g, n_groups = g_p, n_groups_p
    gmax = it.reshape(n_groups, g).max(axis=1)
    return {
        "batch": batch,
        "fixed_ms": round(ms0, 4),
        "fixed_us_per_solve": round(1e3 * ms0 / batch, 4),
        "pack_ms": round(ms_pack, 4),
        "pack_us_per_solve": round(1e3 * ms_pack / batch, 4),
        "kernel_fixed_ms": round(max(ms0 - ms_pack, 0.0), 4),
        "kernel_fixed_us_per_solve": round(
            1e3 * max(ms0 - ms_pack, 0.0) / batch, 4),
        "per_iter_ms_batch": round(per_iter_ms, 5),
        "per_iter_us_per_solve": round(1e3 * per_iter_ms / batch, 4),
        # The full solve at this batch is measured independently (same
        # chain protocol) by the iiwa_batch_256_fused row; the split model
        # should reproduce it from fixed + group_max_mean iterations.
        "full_ms_ref": round(full_ms, 4),
        # consistency: fixed + 8*per_iter should track the independently
        # measured maxit8 chain (a drifting midpoint flags itself here)
        "model_maxit8_ms": round(ms0 + 8 * per_iter_ms, 4),
        "maxit8_ms": round(ms8, 4),
        "maxit16_ms": round(ms16, 4),
        "g": g, "n_groups": n_groups,
        "iters_mean": round(float(it.mean()), 2),
        "group_max_mean": round(float(gmax.mean()), 2),
        "model_full_ms": round(ms0 + float(gmax.mean()) * per_iter_ms, 4),
        "lockstep_waste_pct": round(
            100 * (1 - it.mean() / gmax.mean()), 1),
    }


def bench_fused_split(spec, options, full_entry, *, T=2048):
    """Intra-solve spans for the FUSED kernel (VERDICT round-1 missing #3):
    the kernel is one Pallas program with no XLA-visible internal spans, but
    ``max_iters=0`` runs it end to end with ZERO PCG iterations (the while
    loop never trips; condensation, preconditioner assembly, and recovery
    still execute) — differencing against the full run yields the PCG span
    and per-iteration cost with no new kernel code.  The GATO_TIMING analog
    (gato_schur.cuh:972-982) for the shipping default path."""
    from gato_tpu.problem import SolverOptions

    o0 = SolverOptions(exit_tol=options.exit_tol, max_iters=0,
                       rho=options.rho,
                       preconditioner=options.preconditioner,
                       precond_poly_degree=options.precond_poly_degree)
    blocks = _staged_blocks(spec)
    from gato_tpu.timing import time_solve

    ms0, info0 = time_solve(spec, blocks, o0, pcg_backend="fused", T=T,
                            label="fused_split/zero_iters", log=_log)

    # Second cut of the fixed cost: the same zero-iteration solve on
    # PRE-PACKED inputs through the packed serving API (gato_tpu.packed),
    # skipping the public (K, s)-surface relayout and the output unpack.
    # ms0 - kernel_only is the per-solve cost of living at the
    # reference-shaped surface; the remainder is the in-kernel condense +
    # preconditioner + recovery.  Measured through the PUBLIC packed path
    # (solve_packed traced inside the chain scan — _cached_const passes
    # tracers through), so kernel_only_ms IS the serving API's fixed cost.
    import dataclasses as _dc

    from gato_tpu import packed as _pk
    from gato_tpu.timing import chain_time

    packed = _pk.pack(spec, blocks)
    float(jnp.sum(packed.Qb) + jnp.sum(packed.qb))  # fence staging

    def _packed_step(opts_t):
        def step(q0, lam_carry, t):
            # Anti-hoist: perturb the packed Q by step index AND carry.
            pert = (1.0 + 1e-6 * jnp.cos(t)
                    + 1e-7 * jnp.tanh(jnp.sum(lam_carry)))
            p_t = _dc.replace(packed, Qb=packed.Qb * pert,
                              qb=q0 * (1.0 + 1e-6 * jnp.sin(t)))
            res = _pk.solve_packed(p_t, opts_t)
            return res.lam_p + res.dzx_p + res.dzu_p
        return step

    ms_k, info_k = chain_time(_packed_step(o0), packed.qb, T,
                              label="fused_split/kernel_only", log=_log)
    # The end-to-end packed serving solve (full iterations, no surface
    # relayout): what a pack-once serving loop pays per solve on device.
    ms_pk, info_pk = chain_time(_packed_step(options), packed.qb, T,
                                label="fused_split/packed_serving", log=_log)

    full_ms = full_entry["avg_ms_device"]
    iters = max(1, full_entry["pcg_iters"])
    pcg_ms = max(full_ms - ms0, 0.0)
    return {
        "condense_recover_ms": round(ms0, 6),
        "kernel_only_ms": round(ms_k, 6),
        "surface_overhead_ms": round(max(ms0 - ms_k, 0.0), 6),
        "packed_serving_ms": round(ms_pk, 6),
        "pcg_ms": round(pcg_ms, 6),
        "us_per_iteration": round(1e3 * pcg_ms / iters, 4),
        "iters": iters,
        "detail": info0,
        "detail_kernel_only": info_k,
        "detail_packed_serving": info_pk,
    }


def bench_single_iter_floor(spec, options):
    """The single-solve latency-floor DEMONSTRATION (VERDICT r4 #3: three
    rounds flat at ~15.7 us vs a <=14 us target, with ``bound: "latency"``
    asserted but not shown).  Two numbers, measured the same way:

    * ``null_chain_iter_ns`` — a kernel with the op-chain STRUCTURE of one
      fused-PCG iteration (2 btd matvecs, 2 reduce->broadcast->axpy
      chains, 3 freeze selects; tools/probe_iter_floor.py) but no
      algorithm, timed by R-vs-2R in-kernel trip differencing;
    * ``measured_iter_ns`` — the real kernel's marginal per-iteration cost
      at exit_tol=0 via maxit 16-vs-48 chain differencing.

    measured/floor ~= 1 means the iteration body costs what ANY Mosaic
    loop issuing that dependent chain costs: no per-op tuning inside the
    body can reach <=14 us at 27 iterations (that needs <=0.27 us/iter);
    only an algorithm with fewer chained ops could, which exact iteration
    parity with the oracle forbids.  Full fit (c0/c_mv/c_dot decomposition
    + the poly2 explanation) in tools/probe_iter_floor.py; on the 2026-08-20
    run: measured 434.8 ns vs predicted 439.6 (ratio 0.989), and
    poly2/poly1 per-iteration = 1.516 — which is why poly2's 19 iterations
    cost the same as poly1's 27 (19 * 1.52 ~= 29)."""
    import importlib.util as _ilu
    import os as _os

    from gato_tpu.formats import KKTBlocks
    from gato_tpu.problem import SolverOptions
    from gato_tpu.testing import random_blocks
    from gato_tpu.timing import time_solve

    spec_path = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                              "tools", "probe_iter_floor.py")
    mspec = _ilu.spec_from_file_location("probe_iter_floor", spec_path)
    probe = _ilu.module_from_spec(mspec)
    mspec.loader.exec_module(probe)

    null_ns = probe._null_kernel_time_ns(2, 2, R=50_000, log=_log)

    blocks = KKTBlocks(*(jax.device_put(jnp.asarray(a))
                         for a in random_blocks(spec, seed=7)))
    float(jnp.sum(blocks.q))
    ts = {}
    for mi in (16, 48):
        o = SolverOptions(rho=options.rho, exit_tol=0.0, max_iters=mi,
                          preconditioner=options.preconditioner)
        ms, _ = time_solve(spec, blocks, o, pcg_backend="fused", T=1024,
                           label=f"iter_floor/maxit{mi}", log=_log)
        ts[mi] = ms
    measured_ns = (ts[48] - ts[16]) / 32.0 * 1e6
    return {
        "null_chain_iter_ns": round(null_ns, 1),
        "measured_iter_ns": round(measured_ns, 1),
        "measured_over_floor": round(measured_ns / null_ns, 3),
        "maxit16_us": round(ts[16] * 1e3, 3),
        "maxit48_us": round(ts[48] * 1e3, 3),
        "bound_demonstrated": bool(measured_ns / null_ns < 1.3),
        "note": ("iteration body at the structural issue/dependency floor "
                 "of its op chain; <=14 us needs <=270 ns/iter — below the "
                 "floor (tools/probe_iter_floor.py)"),
    }


def bench_dispatch_floor(spec, *, T=4096):
    """Pallas dispatch + minimal-DMA floor at the single-solve shape
    (VERDICT r3 #6): a NULL kernel — copy the packed rhs to the output
    through the same pallas_call geometry as the fused solve (one grid
    step, one (sp, L) VMEM block in and out) — chain-differenced like
    every other config.  Whatever latency remains in the fused single
    solve above this floor is in-kernel compute; the floor itself is the
    per-call price of ANY kernel dispatch at this size, which batching
    (the packed serving surface) amortizes to nothing."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from gato_tpu.kernels import fused_solve as fs

    s, c, K = spec.state_size, spec.control_size, spec.knot_points
    K_sub, g, L, n_groups, sp = fs.plan_packing(1, K, s, c)
    blocks = _staged_blocks(spec)
    qb = fs._pack_vec(blocks.q[None], K_sub=K_sub, g=g, L=L,
                      n_groups=n_groups, sp=sp)
    float(jnp.sum(qb))

    def null_kernel(q_ref, out_ref):
        out_ref[...] = q_ref[...] * 1.0000001

    vec = pl.BlockSpec((1, sp, L), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    call = functools.partial(
        pl.pallas_call, null_kernel, grid=(n_groups,),
        out_shape=jax.ShapeDtypeStruct(qb.shape, qb.dtype),
        in_specs=[vec], out_specs=vec,
        interpret=jax.default_backend() != "tpu",
    )()

    def step(q0, lam_carry, t):
        pert = 1.0 + 1e-6 * jnp.sin(t) + 1e-7 * jnp.tanh(jnp.sum(lam_carry))
        return call(q0 * pert)

    ms, info = scan_chain_time(step, qb, T, label="dispatch_floor")
    return {"dispatch_floor_ms": round(ms, 6), **info}


def bench_direct_fused_split(spec, options, full_entry, floor, *, T=1024):
    """Fixed-cost decomposition of the single EXACT solve — the shipping
    headline method (VERDICT r3 #6).  The CR kernel has no iteration knob
    to difference, but the whole call splits cleanly into
      surface (pack + unpack at the public (K, s) shape)
        = full - kernel_only            (packed serving chain below)
      dispatch (the null-kernel pallas_call floor at this geometry)
        = bench_dispatch_floor
      in-kernel compute (condense + CR + recovery)
        = kernel_only - dispatch_floor."""
    import dataclasses as _dc

    from gato_tpu import packed as _pk
    from gato_tpu.timing import chain_time

    blocks = _staged_blocks(spec)
    packed = _pk.pack(spec, blocks, method="direct")
    float(jnp.sum(packed.Qb) + jnp.sum(packed.qb))

    def step(q0, lam_carry, t):
        pert = (1.0 + 1e-6 * jnp.cos(t)
                + 1e-7 * jnp.tanh(jnp.sum(lam_carry)))
        p_t = _dc.replace(packed, Qb=packed.Qb * pert,
                          qb=q0 * (1.0 + 1e-6 * jnp.sin(t)))
        res = _pk.solve_packed(p_t, options)
        return res.lam_p + res.dzx_p + res.dzu_p

    ms_k, info_k = chain_time(step, packed.qb, T,
                              label="direct_split/kernel_only", log=_log)
    full_ms = full_entry["avg_ms_device"]
    fl = floor["dispatch_floor_ms"]
    return {
        "full_ms": full_ms,
        "kernel_only_ms": round(ms_k, 6),
        "surface_overhead_ms": round(max(full_ms - ms_k, 0.0), 6),
        "dispatch_floor_ms": fl,
        "kernel_compute_ms": round(max(ms_k - fl, 0.0), 6),
        "detail_kernel_only": info_k,
    }


def _farm_chain_diff(timer, T1, T2, reps=7, min_diff_ms=8.0):
    """Chain-difference a per-(T, i) timer at lengths T1 < T2; returns
    (ms_per_step, spread, raw diffs, warnings).  The decision uses the RAW
    chain differences, never floor-clamped per-step estimates (a
    negative/jitter diff clamps with zero spread and would pass silently —
    the failure mode commit 04b1206 fixed in bench_mpc_sequence); demands a
    tight cluster before stopping (the round-2 farm table's apparent
    B-scaling was partly dispersion at the old 0.5*med tolerance)."""
    diffs = []
    for k in range(6):
        t1 = float(np.median([timer(T1, 10 * k + i) for i in range(reps)]))
        t2 = float(np.median([timer(T2, 10 * k + i) for i in range(reps)]))
        diffs.append(t2 - t1)
        if k >= 1:
            med = float(np.median(diffs))
            if (med >= min_diff_ms
                    and float(np.max(diffs) - np.min(diffs)) < 0.2 * med):
                break
    # Non-positive differences (a transport stall during either chain) are
    # DROPPED, not floor-clamped; tightest-pair cluster rejects one-off
    # stalls instead of averaging them in (as in timing.chain_time).
    estimates = [d / (T2 - T1) for d in diffs if d > 0]
    ms_step, spread = (_best_cluster(estimates, 2) if estimates
                       else (0.0, 0.0))
    warns = []
    if float(np.median(diffs)) < min_diff_ms:
        warns.append("chain difference below noise floor; increase T2")
    if len(estimates) < 2:
        warns.append(f"only {len(estimates)} usable estimates "
                     "(non-positive chain differences dropped)")
    return ms_step, spread, diffs, warns


def bench_mpc_farm(spec, options, B=16, reps=7):
    """MPC FARM steady-state throughput: B warm-started dependent streams in
    lockstep, the whole farm ONE Pallas kernel over a (T, n_groups) grid.
    Two chain-differenced protocols per row (round-3 finding, probes in
    tools/probe_farm.py, measured on v5e):

    * KERNEL (headline ``us_per_solve``): the farm kernel on PRE-PACKED
      staged inputs — what a pack-once serving deployment (the packed
      surface) pays per step.  Kernel time is measured LINEAR in the chain
      length (0.135 vs 0.138 ms/step at maxit-pinned pairs (64,128) and
      (128,256), B=64), so each row may size its own chain pair to clear
      the noise floor without bias.
    * E2E (``e2e`` sub-dict): mpc.solve_sequence_batched including the XLA
      pack/unpack relayouts around the kernel, at the FIXED pair (64, 128)
      for every row.  The relayout cost per step GROWS with total T
      (measured e2e 0.111 -> 0.233 ms/step at B=64 between pairs (64,128)
      and (128,256) while the kernel stayed flat), so only matched-T e2e
      rows are comparable across B; a row whose expected chain difference
      sits below the ~8 ms noise floor (B=16: one lane group, ~2 ms)
      records why it skipped instead of reporting noise.

    The round-2 farm table measured e2e at a DIFFERENT pair per row —
    (256,512)/(128,256)/(64,128)/(40,80) — which manufactured a fake
    non-monotone B-scaling (VERDICT r2 weak #2) out of the glue's
    T-dependence plus short-pair noise bias; at matched protocol the
    per-solve cost is FLAT in B (~33-37 us per group-step at every
    group count, consistent with tools/probe_throughput.py probe G)."""
    import functools

    from gato_tpu.formats import KKTBlocks
    from gato_tpu.kernels import fused_solve as fs
    from gato_tpu.mpc import solve_sequence_batched
    from gato_tpu.testing import random_blocks

    K, s, c = spec.knot_points, spec.state_size, spec.control_size
    K_sub, g, L, n_groups, sp = fs.plan_packing(B, K, s, c)
    rng = np.random.default_rng(3)

    def make_seq(length):
        base = [random_blocks(spec, seed=50 + b) for b in range(B)]
        stack = KKTBlocks(*(np.stack([np.asarray(p[f]) for p in base])
                            for f in range(7)))
        # STATIONARY per-step perturbation (independent draws, constant
        # scale, same step-to-step delta as the old generator's walk
        # increments): the round-2 generator CUMSUMMED the draws, so the
        # problem scale grew with the step index and the marginal steps a
        # chain difference isolates were more expensive than the average
        # step (more PCG iterations against the absolute exit_tol).
        qs = np.asarray(stack.q)[None] + 0.01 * rng.normal(
            size=(length,) + stack.q.shape).astype(np.float32)
        qsc = (1.0 + 1e-4 * rng.normal(size=(length, 1, 1, 1, 1))).astype(
            np.float32)
        seq = KKTBlocks(*(jnp.broadcast_to(jnp.asarray(a), (length,) + a.shape)
                          for a in stack))._replace(
            q=jnp.asarray(qs), Q=jnp.asarray(np.asarray(stack.Q)[None] * qsc))
        seq = KKTBlocks(*(jax.device_put(a) for a in seq))
        float(jnp.sum(seq.q))
        return seq

    # ---- KERNEL protocol: staged lane-packed inputs, tiled along T.
    # Tiling a 64-step distinct-content packed stack (instead of packing a
    # full make_seq(T2)) caps staging memory at long chains; after the first
    # repeat the warm-start carry makes the solve sequence exactly periodic,
    # so per-step iteration behavior matches the untiled run.  Pallas cannot
    # dedup grid steps, so repeated content cannot be hoisted (and probe G
    # measured identical-content grids at the same per-step cost).
    T0 = 64

    def staged_tiled(T):
        seq = make_seq(T0)

        @jax.jit
        def pack(b):
            pm = jax.vmap(functools.partial(fs._pack_mat, K_sub=K_sub, g=g,
                                            L=L, n_groups=n_groups, sp=sp))
            pv = jax.vmap(functools.partial(fs._pack_vec, K_sub=K_sub, g=g,
                                            L=L, n_groups=n_groups, sp=sp))
            return (pm(b.Q), pm(b.R), pm(b.A), pm(b.B),
                    pv(b.q), pv(b.r), pv(b.c))

        p0 = pack(seq)
        reps_t = T // T0
        packed = tuple(jnp.tile(a, (reps_t,) + (1,) * (a.ndim - 1))
                       for a in p0)
        float(sum(jnp.sum(v[0]) for v in packed))
        return packed

    def kernel_run(T):
        @jax.jit
        def run(Qb, Rb, Ab, Bb, qb, rb, cb, lb, pert):
            outs = fs._call_fused_sequence(
                jnp.full((T,), options.rho, jnp.float32),
                options.exit_tol, options.max_iters,
                Qb, Rb, Ab, Bb, qb * pert, rb, cb, lb,
                s=s, c=c, K_sub=K_sub, g=g, L=L, sp=sp,
                n_groups=n_groups, T=T, flops_scale=B * K,
                poly_degree=options.precond_poly_degree,
                precond=options.preconditioner.value,
                interpret=jax.default_backend() != "tpu",
                unroll=4 if g == 1 else 1,
            )
            return jnp.sum(outs[0]) + jnp.sum(outs[5])

        return run

    # Chain pair sized per row so the expected difference (~35 us/group-step,
    # the measured flat rate) clears the noise floor with ~3x margin — safe
    # ONLY because kernel time is linear in T (docstring).
    per_group_us = 35.0
    dT = max(T0, int(np.ceil(24e3 / (per_group_us * n_groups) / T0)) * T0)
    T1k, T2k = T0, T0 + dT
    lb0 = jax.device_put(jnp.zeros((n_groups, sp, L), jnp.float32))
    staged = {T: staged_tiled(T) for T in (T1k, T2k)}
    runs = {T: kernel_run(T) for T in (T1k, T2k)}
    for T in (T1k, T2k):
        float(runs[T](*staged[T], lb0, 1.0))

    def ktimer(T, i):
        t0 = time.perf_counter()
        float(runs[T](*staged[T], lb0, 1.0 + 1e-6 * (i + 1)))
        return (time.perf_counter() - t0) * 1e3

    ms_step, spread, diffs, warns = _farm_chain_diff(ktimer, T1k, T2k,
                                                     reps=reps)
    del staged, runs

    # ---- E2E protocol at the fixed matched pair (64, 128).
    T1e, T2e = 64, 128
    expected_diff_ms = per_group_us * n_groups * (T2e - T1e) / 1e3
    seqs = {T1e: make_seq(T1e)}
    res = solve_sequence_batched(spec, seqs[T1e], options)
    float(jnp.sum(res.lam))
    it = np.asarray(res.iters)

    if expected_diff_ms >= 8.0:
        seqs[T2e] = make_seq(T2e)
        float(jnp.sum(solve_sequence_batched(spec, seqs[T2e], options).lam))

        def etimer(T, i):
            s2 = seqs[T]._replace(q=seqs[T].q * (1.0 + 1e-6 * (i + 1)))
            t0 = time.perf_counter()
            float(jnp.sum(solve_sequence_batched(spec, s2, options).lam))
            return (time.perf_counter() - t0) * 1e3

        ems, espread, ediffs, ewarns = _farm_chain_diff(etimer, T1e, T2e,
                                                        reps=reps)
        e2e = {
            "T": [T1e, T2e],
            "ms_per_step": round(ems, 6),
            "us_per_solve": round(1e3 * ems / B, 4) if ems else 0.0,
            "spread_ms": round(espread, 6),
            "chain_diff_ms": round(float(np.median(ediffs)), 3),
        }
        if ewarns:
            e2e["noise_warning"] = "; ".join(ewarns)
    else:
        e2e = {"skipped": (f"expected chain diff {expected_diff_ms:.1f} ms "
                           "< 8 ms noise floor at this group count")}
    del seqs

    out = {
        "B": B,
        "n_groups": n_groups,
        "T_kernel": [T1k, T2k],
        "ms_per_step": round(ms_step, 6),
        "us_per_solve": round(1e3 * ms_step / B, 4),
        "us_per_group_step": round(1e3 * ms_step / n_groups, 2),
        "solves_per_sec": (round(B / (ms_step / 1e3), 1) if ms_step
                           else 0.0),
        "reps_ms": [round(d / (T2k - T1k), 6) for d in diffs if d > 0],
        "spread_ms": round(spread, 6),
        "chain_diff_ms": round(float(np.median(diffs)), 3),
        "iters_first_mean": float(it[0].mean()),
        "iters_rest_mean": float(it[1:].mean()),
        "protocol": "kernel (pack-once serving); e2e at matched (64,128)",
        "e2e": e2e,
    }
    if warns:
        out["noise_warning"] = "; ".join(warns)
    return out



def bench_mpc_farm_packed(spec, options, B=64, reps=7):
    """E2E flatness of the PUBLIC pack-once farm surface (VERDICT r4 #4).

    The public mpc.solve_sequence_batched pays XLA relayouts whose per-step
    cost GROWS with the window length (CLAUDE.md: e2e 0.111 -> 0.233
    ms/step between pairs (64,128) and (128,256) at B=64 while the kernel
    stayed linear).  gato_tpu.packed.pack_sequence/solve_packed_sequence
    is the fix: the stream is packed once, the warm start carries packed
    across windows, and the loop runs at the kernel's flat rate at ANY
    horizon.  This row measures that same-pair comparison THROUGH the
    public packed surface: ms/step at pairs (64,128) and (128,256) must
    agree within the run-to-run spread (``flat_ratio`` ~ 1.0, vs ~2.1 on
    the per-call public surface).

    Content: a T0=64 distinct-content window packed once, tiled along T on
    device (the steady-state periodic serving pattern; Pallas cannot dedup
    grid steps, and probe G measured identical-content grids at full
    per-step cost — bench_mpc_farm's kernel protocol, made public)."""
    import dataclasses as _dc

    from gato_tpu import packed as _pk
    from gato_tpu.formats import KKTBlocks
    from gato_tpu.testing import random_blocks

    K = spec.knot_points
    rng = np.random.default_rng(3)
    T0 = 64

    base = [random_blocks(spec, seed=50 + b) for b in range(B)]
    stack = KKTBlocks(*(np.stack([np.asarray(p[f]) for p in base])
                        for f in range(7)))
    qs = np.asarray(stack.q)[None] + 0.01 * rng.normal(
        size=(T0,) + stack.q.shape).astype(np.float32)
    qsc = (1.0 + 1e-4 * rng.normal(size=(T0, 1, 1, 1, 1))).astype(np.float32)
    seq = KKTBlocks(*(jnp.broadcast_to(jnp.asarray(a), (T0,) + a.shape)
                      for a in stack))._replace(
        q=jnp.asarray(qs), Q=jnp.asarray(np.asarray(stack.Q)[None] * qsc))

    t0 = time.perf_counter()
    p0 = _pk.pack_sequence(spec, seq)
    float(jnp.sum(p0.qb))
    pack_ms = (time.perf_counter() - t0) * 1e3

    def tiled(T):
        reps_t = T // T0
        arrs = [jnp.tile(a, (reps_t,) + (1,) * (a.ndim - 1))
                for a in (p0.Qb, p0.Rb, p0.Ab, p0.Bb, p0.qb, p0.rb, p0.cb)]
        ps = _pk.PackedKKTSequence(*arrs, plan=p0.plan)
        float(jnp.sum(ps.qb))
        return ps

    streams = {T: tiled(T) for T in (64, 128, 256)}
    for T, ps in streams.items():  # compile + first run
        float(jnp.sum(_pk.solve_packed_sequence(ps, options).lam_p))

    def timer(T, i):
        ps = streams[T]
        ps_i = _dc.replace(ps, qb=ps.qb * (1.0 + 1e-6 * (i + 1)))
        t0 = time.perf_counter()
        res = _pk.solve_packed_sequence(ps_i, options)
        float(jnp.sum(res.lam_p) + jnp.sum(res.iters))
        return (time.perf_counter() - t0) * 1e3

    ms_a, spread_a, diffs_a, warns_a = _farm_chain_diff(timer, 64, 128,
                                                        reps=reps)
    ms_b, spread_b, diffs_b, warns_b = _farm_chain_diff(timer, 128, 256,
                                                        reps=reps)
    res = _pk.solve_packed_sequence(streams[64], options)
    it = np.asarray(res.iters)
    entry = {
        "B": B,
        "pack_once_ms": round(pack_ms, 2),
        "ms_per_step_pair_64_128": round(ms_a, 6),
        "ms_per_step_pair_128_256": round(ms_b, 6),
        "flat_ratio": round(ms_b / ms_a, 3) if ms_a else 0.0,
        "us_per_solve": round(1e3 * ms_a / B, 4),
        "spread_ms": [round(spread_a, 6), round(spread_b, 6)],
        "chain_diff_ms": [round(float(np.median(diffs_a)), 3),
                          round(float(np.median(diffs_b)), 3)],
        "iters_first_mean": round(float(it[0].mean()), 2),
        "iters_rest_mean": round(float(it[1:].mean()), 4),
        "protocol": "public packed surface (pack_sequence once, tiled)",
    }
    warns = warns_a + warns_b
    if warns:
        entry["noise_warning"] = "; ".join(warns)
    return entry


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
        # Stationary per-step perturbation (independent draws, constant
        # scale): the old generator cumsummed these, growing the problem
        # scale with the step index — the marginal steps that sequence-length
        # differencing isolates then needed more PCG iterations against the
        # absolute exit_tol than the average step (see bench_mpc_farm).
        qs = np.asarray(base.q)[None] + 0.01 * rng.normal(
            size=(length,) + base.q.shape
        ).astype(np.float32)
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
    for k in range(6):
        t1 = float(np.median([timed(seq1, 10 * k + i) for i in range(reps)]))
        t2 = float(np.median([timed(seq2, 10 * k + i) for i in range(reps)]))
        diffs.append(t2 - t1)
        if k >= 1:
            med = float(np.median(diffs))
            # Demand a tight cluster before stopping: the round-2 farm
            # table's apparent B-scaling "ceiling" was dispersion at this
            # gate's old 0.5*med tolerance (the controlled fixed-T sweep in
            # tools/probe_throughput.py probe G shows flat per-group cost).
            if (med >= min_diff_ms
                    and float(np.max(diffs) - np.min(diffs)) < 0.2 * med):
                break
    # Dropped, not clamped — see bench_mpc_farm.
    estimates = [d / T for d in diffs if d > 0]
    # Tightest-pair cluster, as in timing.chain_time (transient rejection).
    ms_per_solve, spread = (_best_cluster(estimates, 2) if estimates
                            else (0.0, 0.0))
    out = {
        "T": T,
        "ms_per_solve": round(ms_per_solve, 6),
        "ms_per_sequence": round(ms_per_solve * T, 4),
        "reps_ms": [round(e, 6) for e in estimates],
        "spread_ms": round(spread, 6),
        "chain_diff_ms": round(float(np.median(diffs)), 3),
        "iters_first": iters_per_step[0],
        "iters_rest_mean": float(np.mean(iters_per_step[1:])),
    }
    warns = []
    if float(np.median(diffs)) < min_diff_ms:
        warns.append("sequence difference below noise floor; increase T")
    if len(estimates) < 2:
        warns.append(f"only {len(estimates)} usable estimates "
                     "(non-positive chain differences dropped)")
    if warns:
        out["noise_warning"] = "; ".join(warns)
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

    # Batched direct: multi-problem lane packing through the cyclic-reduction
    # kernel (g>1 exercises its manual-DMA input path on device).
    bd_jax = solve_batched(spec, batch, dopts, pcg_backend="jax")
    bd_fused = solve_batched(spec, batch, dopts, pcg_backend="fused")
    float(jnp.sum(bd_jax.lam) + jnp.sum(bd_fused.lam))
    bdref = np.asarray(bd_jax.lam)
    bdscale = float(np.max(np.abs(bdref))) or 1.0
    bderr = float(np.max(np.abs(np.asarray(bd_fused.lam) - bdref))) / bdscale
    report["batch_direct_rel_err_fused"] = bderr
    check(bderr < 1e-3, f"PARITY FAILURE batch direct fused: rel err {bderr}")

    # Packed serving surface: the same kernel on the same packed arrays as
    # the fused backend — must be BITWISE identical on device, not merely
    # close (gato_tpu.packed's contract; tests pin it in interpret mode,
    # this pins it compiled).
    from gato_tpu import pack, solve_packed

    pres = solve_packed(pack(spec, batch), options).unpack()
    float(jnp.sum(pres.lam))
    pit = [int(x) for x in np.asarray(pres.iters)]
    report["packed_iters"] = pit
    check(pit == bit["fused"], f"PARITY FAILURE packed iters: {pit}")
    check(np.array_equal(np.asarray(pres.lam), np.asarray(bres["fused"].lam)),
          "PARITY FAILURE packed lam not bitwise-equal to fused")
    report["ok"] = True
    return report


# --------------------------------------------------------------------------


def _git_rev():
    try:
        import subprocess
        out = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                             capture_output=True, text=True, timeout=10)
        return out.stdout.strip() or "unknown"
    except Exception:
        return "unknown"


def _load_prior_detail():
    """The committed/previous BENCH_DETAIL.json, for carrying rows a
    budget-limited run skips (VERDICT r4 #2: the driver's 1500 s run used
    to REWRITE the artifact down to the configs it reached, dropping rows
    that README/PARITY prose binds and leaving the suite red)."""
    try:
        with open("BENCH_DETAIL.json") as f:
            d = json.load(f)
        return d if isinstance(d, dict) else {}
    except (OSError, ValueError):
        return {}


def main():
    """Budget-aware run plan (VERDICT r3 #1 — the round-3 bench outgrew the
    driver's timeout and left NO independent perf record):

    * PHASE 1 (never skipped): parity gate + the headline candidates, then
      the one-line headline JSON goes to STDOUT IMMEDIATELY — the analog of
      the reference printing its numbers per run (gpu_library.cu:166-198).
      A later timeout can no longer erase the round's headline.
    * PHASE 2 (long tail): every further config declares a wall-clock
      estimate; a config that does not fit the remaining budget is SKIPPED
      with the reason recorded in BENCH_DETAIL["skipped"] (no silent caps).
      Prose-bound configs (tools/perfsync.py bindings) run FIRST, so a
      driver-budget run refreshes every number the docs quote (r4 #5).
    * BENCH_DETAIL.json is rewritten after EVERY config, so even a hard
      kill leaves a parseable artifact; each entry carries its measured
      ``wall_s`` (which is also where the next round's estimates come from)
      and the ``run_id``/``git_rev`` of the run that measured it.  Rows the
      budget skips are CARRIED from the previous artifact (marked
      ``carried: true``) instead of dropped, so a partial run still yields
      a complete artifact (r4 #2).
    * The one-line headline JSON is printed again as the FINAL stdout line
      — normal exit, phase-2 error, or SIGTERM alike (a handler converts
      the driver's timeout signal into SystemExit so the ``finally`` runs).
      Rounds 3 and 4 lost their official record because the driver parses
      the END of the output stream (r4 #1).

    Budget: ``BENCH_BUDGET_S`` env (seconds, default 1500 — under the
    driver budget that round 3's ~40 min run exceeded)."""
    import os

    from gato_tpu.problem import ProblemSpec, SolverOptions
    from gato_tpu.solver import default_pcg_backend

    budget_s = float(os.environ.get("BENCH_BUDGET_S", "1500"))
    t_start = time.perf_counter()

    # Persistent compile cache: bench wall time is compile-dominated (the
    # B=1024 Thomas chain alone compiles for ~63 s, and every chain pair is
    # two fresh executables), so a repeat run at the same HEAD should pay
    # compiles once.  Steady-state chain timings are unaffected (the cache
    # serves EXECUTABLES; execution still runs on device); first_call_ms
    # entries reflect cache hits on repeat runs.
    cache_ok = True
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(
                              os.path.abspath(__file__)), ".jax_bench_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:
        cache_ok = False
        _log(f"persistent compile cache unavailable: {e!r}")

    platform = jax.devices()[0].platform
    rtt = measure_rtt_ms()
    _log(f"device: {jax.devices()[0]} ({platform}), transport rtt ~{rtt:.1f} ms,"
         f" budget {budget_s:.0f}s")

    opts = SolverOptions(exit_tol=1e-6, max_iters=200, rho=1e-3)
    direct_opts = SolverOptions(rho=1e-3, method="direct")
    iiwa = ProblemSpec(14, 7, 50)
    pend = ProblemSpec(2, 1, 5)
    have_pallas = default_pcg_backend() == "fused"

    run_id = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    detail = {"platform": platform, "rtt_ms": rtt, "budget_s": budget_s,
              "run_id": run_id, "git_rev": _git_rev(),
              "compile_cache": cache_ok,
              "protocol": ("chain-differenced (T vs 2T) scalar-fenced scans,"
                           " Q+q perturbed per step; see bench.py docstring"),
              "configs": {}, "skipped": {}, "errors": {}}
    C = detail["configs"]

    prior = _load_prior_detail()
    if prior.get("platform") == platform:
        for k, v in prior.get("configs", {}).items():
            if isinstance(v, dict):
                e = dict(v)
                e.setdefault("run_id", prior.get("run_id", "pre-r05"))
                e.setdefault("git_rev", prior.get("git_rev", "unknown"))
                e["carried"] = True
                C[k] = e
        if C:
            _log(f"carried {len(C)} config rows from the prior artifact "
                 f"(run {prior.get('run_id', 'pre-r05')}); fresh "
                 "measurements overwrite per-config")

    def flush():
        with open("BENCH_DETAIL.json", "w") as f:
            json.dump(_jsonable(detail), f, indent=2)

    def remaining():
        return budget_s - (time.perf_counter() - t_start)

    def run(key, est_s, fn, *, required=False):
        """Run one config closure; skip-and-record when it does not fit the
        remaining budget (phase-1 ``required`` configs always run).  A
        config that raises is recorded in ``errors`` and the run continues
        (its carried row, if any, stays); skipped configs likewise keep
        their carried row."""
        if not required and remaining() < est_s:
            detail["skipped"][key] = (
                f"{remaining():.0f}s budget left < ~{est_s:.0f}s estimate"
                + ("; carried prior row" if key in C else ""))
            _log(f"SKIP {key}: {detail['skipped'][key]}")
            flush()
            return None
        t0 = time.perf_counter()
        try:
            entry = fn()
        except Exception as e:
            import traceback
            detail["errors"][key] = f"{type(e).__name__}: {e}"
            _log(f"ERROR {key}: {traceback.format_exc()}")
            flush()
            if required:
                raise
            return None
        entry["wall_s"] = round(time.perf_counter() - t0, 1)
        entry["run_id"] = run_id
        C[key] = entry
        _log(f"{key}: {json.dumps(_jsonable(entry))}")
        flush()
        return entry

    # ---------------- PHASE 1: parity gate + headline candidates ----------
    if have_pallas:
        t0 = time.perf_counter()
        detail["parity_gate"] = parity_gate(iiwa, opts)
        detail["parity_gate"]["wall_s"] = round(time.perf_counter() - t0, 1)
        _log(f"parity gate: {json.dumps(_jsonable(detail['parity_gate']))}")
        flush()

    def head_single(spec, o, backend, kind, T=64, **kw):
        def fn():
            e = bench_single(spec, o, backend, T=T)
            return annotate_roofline(e, spec, kind, **kw)
        return fn

    # Only genuine headline contenders run before the print: the XLA-path
    # direct (structurally ~10x the kernel tiers) and poly3 (measured
    # slower — 16 iterations don't pay for 5 matvecs each, BENCH_DETAIL
    # r04) measure in phase 2 instead, so a COLD driver run reaches the
    # headline sooner.
    run("iiwa_pcg", 0, head_single(iiwa, opts, "jax", "pcg_jax"),
        required=True)
    if have_pallas:
        run("iiwa_fused", 0, head_single(iiwa, opts, "fused", "pcg_fused",
                                         T=512), required=True)
        poly2 = SolverOptions(exit_tol=1e-6, max_iters=200, rho=1e-3,
                              precond_poly_degree=2)
        run("iiwa_fused_poly2", 0,
            head_single(iiwa, poly2, "fused", "pcg_fused", T=512,
                        poly_degree=2), required=True)
        # The fused cyclic-reduction kernel: exact solve at iterative-path
        # latency (kernels/direct_fused.py).
        run("iiwa_direct_fused", 0,
            head_single(iiwa, direct_opts, "fused", "direct_fused", T=512),
            required=True)

    pcg_ms = C["iiwa_pcg"]["avg_ms_device"]
    candidates = [("pcg", pcg_ms)]
    if have_pallas:
        candidates.append(("fused", C["iiwa_fused"]["avg_ms_device"]))
        candidates.append(("fused_poly2",
                           C["iiwa_fused_poly2"]["avg_ms_device"]))
        candidates.append(("direct_fused",
                           C["iiwa_direct_fused"]["avg_ms_device"]))
    best_name, best_ms = min(candidates, key=lambda kv: kv[1])
    detail["headline_method"] = best_name
    flush()
    # The ONE stdout JSON line, printed the moment the headline is known
    # (protects against a timeout killing the long tail) AND re-printed as
    # the final stdout line in the ``finally`` below (the driver parses the
    # END of the stream — VERDICT r4 #1).
    headline_line = json.dumps({
        "metric": "iiwa_14_7_50_avg_solve_ms",
        "value": round(float(best_ms), 4),
        "unit": "ms",
        "vs_baseline": round(float(pcg_ms / best_ms), 3),
    })
    print(headline_line, flush=True)
    _log(f"headline printed at +{time.perf_counter() - t_start:.0f}s "
         f"({best_name}: {best_ms:.4f} ms)")

    phase2_signal = None
    try:
        _phase2(run, C, iiwa, pend, opts, direct_opts, have_pallas)
    except BaseException as e:  # incl. SystemExit from the SIGTERM handler
        import traceback
        phase2_signal = e
        detail["error"] = repr(e)
        _log("phase 2 aborted: " + traceback.format_exc())
    finally:
        detail["total_wall_s"] = round(time.perf_counter() - t_start, 1)
        flush()
        fresh = sum(1 for v in C.values()
                    if isinstance(v, dict) and v.get("run_id") == run_id)
        _log(f"bench complete in {detail['total_wall_s']}s; "
             f"{fresh} configs measured, {len(C) - fresh} carried, "
             f"{len(detail['skipped'])} skipped, "
             f"{len(detail['errors'])} errored")
        print(headline_line, flush=True)
    if phase2_signal is not None and not isinstance(phase2_signal, Exception):
        raise SystemExit(143)  # keep the driver's timeout visible in rc


def _phase2(run, C, iiwa, pend, opts, direct_opts, have_pallas):
    """The long tail, prose-bound configs first (VERDICT r4 #5: the ~15
    README/PARITY-bound rows must all fit the driver's 1500 s window; the
    unbound diagnostic rows run after).  Wall-clock estimates are measured
    r04 wall_s rounded up ~20% — an under-estimate admits a config that
    then overshoots the budget; over-estimates only reorder skips."""
    from gato_tpu.problem import ProblemSpec, SolverOptions

    iiwa_iters = C["iiwa_pcg"]["pcg_iters"]

    def head_single(spec, o, backend, kind, T=64, **kw):
        def fn():
            e = bench_single(spec, o, backend, T=T)
            return annotate_roofline(e, spec, kind, **kw)
        return fn

    # ---------------- round-5 deliverable rows (freshest first: older
    # rows carry from the committed artifact when the budget runs out) ----
    if have_pallas:
        # Latency-floor demonstration (VERDICT r4 #3).
        run("iiwa_single_iter_floor", 140,
            lambda: bench_single_iter_floor(iiwa, opts))

        # Packed-farm e2e flatness in T (VERDICT r4 #4).
        def fn_farm_packed():
            e = bench_mpc_farm_packed(iiwa, opts, B=64)
            return annotate_roofline(
                e, iiwa, "pcg_fused", ms_per_solve=e["us_per_solve"] / 1e3,
                iters=max(1, int(round(e["iters_rest_mean"]))), batch=64)
        run("iiwa_mpc_farm_64_packed", 210, fn_farm_packed)

    # Narrow-batch long-K EXACT solves (VERDICT r4 #6): the jax Thomas
    # scan vs the round-5 hybrid tier (compacting XLA peels + one-kernel
    # CR on the reduced system) past fits_direct_xl's ~K=1300 reach.
    spec_2k = ProblemSpec(14, 7, 2048)

    def fn_hz2k_direct():
        return annotate_roofline(
            bench_single(spec_2k, direct_opts, "jax", T=8), spec_2k,
            "direct_jax")
    jd_2k = run("iiwa_horizon_2048_direct", 110, fn_hz2k_direct)
    if have_pallas and jd_2k is not None:
        def fn_hz2k_hybrid():
            from gato_tpu.kernels import longk as _lk
            from gato_tpu.solver import solve

            assert _lk.direct_tier(2048, 14, 7) == "hybrid"
            # The roofline byte model uses the packed one-pass 'direct_xl'
            # kind; each peel adds ~one extra half-width operator pass
            # (within the model's ±20% design accuracy).
            e = annotate_roofline(
                bench_single(spec_2k, direct_opts, "pallas", T=16), spec_2k,
                "direct_xl")
            blk_2k = _staged_blocks(spec_2k, seed=7)
            d_jax = solve(spec_2k, blk_2k, direct_opts, pcg_backend="jax")
            d_hy = solve(spec_2k, blk_2k, direct_opts, pcg_backend="pallas")
            float(jnp.sum(d_jax.lam) + jnp.sum(d_hy.lam))
            sc = float(np.max(np.abs(np.asarray(d_jax.lam)))) or 1.0
            err = float(np.max(np.abs(
                np.asarray(d_hy.lam) - np.asarray(d_jax.lam)))) / sc
            e["rel_err_vs_jax"] = err
            e["tier"] = "hybrid"
            if err > 1e-3:
                raise AssertionError(
                    f"hybrid direct parity failure at K=2048: rel {err}")
            return e
        run("iiwa_horizon_2048_direct_hybrid", 150, fn_hz2k_hybrid)

    # ---------------- prose-bound block ----------------
    if have_pallas:
        def fn_fused_split():
            e = bench_fused_split(iiwa, opts, C["iiwa_fused"])
            return annotate_roofline(
                e, iiwa, "pcg_fused",
                ms_per_solve=e["packed_serving_ms"],
                iters=C["iiwa_fused"]["pcg_iters"])
        run("iiwa_fused_split", 55, fn_fused_split)

        def fn_batch_fused():
            e = bench_batch(iiwa, opts, "fused", T=32)
            return annotate_roofline(
                e, iiwa, "pcg_fused", ms_per_solve=e["us_per_solve"] / 1e3,
                iters=iiwa_iters, batch=256)
        e_bf = run("iiwa_batch_256_fused", 80, fn_batch_fused)

        def fn_batch_direct_fused():
            # The fused backend picks its exact kernel by batch width
            # (solver._solve_batched_core): batch-in-lanes Thomas at wide
            # batches, knots-in-lanes CR below — annotate whichever tier
            # B=256 actually dispatched to, and record it.
            from gato_tpu.kernels import thomas_batch as _tb

            e = bench_batch(iiwa, direct_opts, "fused", T=32)
            _thomas = _tb.should_dispatch(256, iiwa.knot_points,
                                          iiwa.state_size, iiwa.control_size)
            e["tier"] = "thomas_batch" if _thomas else "direct_fused"
            return annotate_roofline(
                e, iiwa, "direct_thomas" if _thomas else "direct_fused",
                ms_per_solve=e["us_per_solve"] / 1e3, batch=256)
        e_bdf = run("iiwa_batch_256_direct_fused", 110, fn_batch_direct_fused)

    def fn_pend_pcg():
        return annotate_roofline(bench_single(pend, opts, "jax", T=512),
                                 pend, "pcg_jax")
    run("pendulum_2_1_5_pcg", 15, fn_pend_pcg)

    if have_pallas:
        def fn_pend_fused():
            return annotate_roofline(
                bench_single(pend, opts, "fused", T=512), pend, "pcg_fused")
        pf = run("pendulum_2_1_5_fused", 30, fn_pend_fused)
        if pf is not None:
            def fn_pend_fused_split():
                # Small-problem latency floor: the pendulum on the KERNEL
                # path with the fixed-cost split — separates the tiny-shape
                # surface/relayout cost from the in-kernel work.
                e = bench_fused_split(pend, opts, pf, T=4096)
                return annotate_roofline(
                    e, pend, "pcg_fused",
                    ms_per_solve=e["packed_serving_ms"],
                    iters=pf["pcg_iters"])
            run("pendulum_2_1_5_fused_split", 60, fn_pend_fused_split)

        # Horizon scaling, fused rows (README's K=100/250/500 sweep).
        for K in (100, 250, 500):
            spec_k = ProblemSpec(14, 7, K)

            def fn_hz_fused(spec_k=spec_k, K=K):
                return annotate_roofline(
                    bench_single(spec_k, opts, "fused",
                                 T=512 if K <= 256 else 256),
                    spec_k, "pcg_fused")
            run(f"iiwa_horizon_{K}_fused", 30, fn_hz_fused)

    # Past the fused kernel's VMEM budget: the long-horizon whole-solve tier
    # (kernels/longk.py) — single-kernel condense+PCG (fused_xl) while the
    # operators AND a condense chunk's working set fit VMEM, resident-XL
    # while S+Pinv alone fit, the streamed-loop kernel beyond.  The jax row
    # of each pair is bound prose too (the "Nx" speedup quotes).
    for K, T_jax, T_kern in ((1024, 32, 256), (2048, 16, 128),
                             (4096, 8, 64)):
        spec_k = ProblemSpec(14, 7, K)

        def fn_hzl_jax(spec_k=spec_k, T_jax=T_jax):
            return annotate_roofline(
                bench_single(spec_k, opts, "jax", T=T_jax), spec_k,
                "pcg_jax")
        jax_e = run(f"iiwa_horizon_{K}_pcg", 70, fn_hzl_jax)
        if have_pallas and jax_e is not None:
            from gato_tpu.kernels import longk

            tier = ("fused_xl" if longk.fits_fused_xl(K, 14, 7)
                    else "xl" if longk.fits_xl(K, 14, 7) else "stream")

            def fn_hzl_kernel(spec_k=spec_k, T_kern=T_kern, tier=tier,
                              K=K, jax_e=jax_e):
                e = annotate_roofline(
                    bench_single(spec_k, opts, "pallas", T=T_kern), spec_k,
                    f"pcg_{tier}")
                ij, ik = jax_e["pcg_iters"], e["pcg_iters"]
                if ij != ik:  # extend the parity gate to the long-K tiers
                    raise AssertionError(
                        f"long-horizon parity failure at K={K}: jax {ij} "
                        f"vs kernel {ik} iterations")
                return e
            run(f"iiwa_horizon_{K}_kernel_{tier}", 55, fn_hzl_kernel)

    # Long-horizon EXACT tier: method='direct' past the fused CR kernel's
    # packing budget — whole block cyclic reduction in one kernel
    # (longk.solve_direct_longk) vs the XLA Thomas path, with an on-device
    # agreement check (both exact; f32 round-off).
    spec_1k = ProblemSpec(14, 7, 1024)

    def fn_hz1k_direct():
        return annotate_roofline(
            bench_single(spec_1k, direct_opts, "jax", T=16), spec_1k,
            "direct_jax")
    run("iiwa_horizon_1024_direct", 105, fn_hz1k_direct)
    if have_pallas:
        def fn_hz1k_direct_xl():
            from gato_tpu.kernels import longk as _longk
            from gato_tpu.solver import solve

            assert _longk.fits_direct_xl(1024, 14, 7)
            e = annotate_roofline(
                bench_single(spec_1k, direct_opts, "pallas", T=64), spec_1k,
                "direct_xl")
            blk_1k = _staged_blocks(spec_1k, seed=7)
            dl_jax = solve(spec_1k, blk_1k, direct_opts, pcg_backend="jax")
            dl_xl = solve(spec_1k, blk_1k, direct_opts, pcg_backend="pallas")
            float(jnp.sum(dl_jax.lam) + jnp.sum(dl_xl.lam))
            dl_scale = float(np.max(np.abs(np.asarray(dl_jax.lam)))) or 1.0
            dl_err = float(np.max(np.abs(
                np.asarray(dl_xl.lam) - np.asarray(dl_jax.lam)))) / dl_scale
            e["rel_err_vs_jax"] = dl_err
            if dl_err > 1e-3:
                raise AssertionError(
                    f"long-horizon direct parity failure: rel err {dl_err}")
            return e
        run("iiwa_horizon_1024_direct_xl", 55, fn_hz1k_direct_xl)

    def fn_batch_direct_jax():
        e = bench_batch(iiwa, direct_opts, "jax", T=6)
        return annotate_roofline(e, iiwa, "direct_jax",
                                 ms_per_solve=e["us_per_solve"] / 1e3)
    run("iiwa_batch_256_direct", 120, fn_batch_direct_jax)

    if have_pallas:
        def fn_mpc_fused():
            # The fused step is ~10x faster, so sequence-length differencing
            # needs a much longer sequence to clear transport jitter:
            # 2048 * ~4.4 us/step ~= 9 ms T-vs-2T difference.
            e = bench_mpc_sequence(iiwa, opts, T=2048)
            return annotate_roofline(
                e, iiwa, "pcg_fused", ms_per_solve=e["ms_per_solve"],
                iters=max(1, round(e["iters_rest_mean"])))
        run("iiwa_mpc_sequence_fused", 65, fn_mpc_fused)

        # The README-quoted warm-farm row.  Kernel protocol at its own
        # noise-floor-sized chain pair plus e2e at the FIXED matched pair
        # (64, 128) — see bench_mpc_farm's docstring.
        def fn_farm_128():
            e = bench_mpc_farm(iiwa, opts, B=128)
            return annotate_roofline(
                e, iiwa, "pcg_fused", ms_per_solve=e["us_per_solve"] / 1e3,
                iters=max(1, int(e["iters_rest_mean"])), batch=128)
        run("iiwa_mpc_farm_128", 220, fn_farm_128)

        if e_bf is not None:
            def fn_batch_split():
                # Measured throughput breakdown at the headline batch
                # (VERDICT r2 weak #1): fixed vs marginal per-iteration cost
                # by exit_tol=0 max_iters differencing, plus lockstep-exit
                # waste.  Chains right-sized from e_bf so no T-doubling
                # recompiles (was 633 s wall; VERDICT r4 #5).
                e = bench_batch_split(iiwa, opts, e_bf, batch=256)
                return annotate_roofline(
                    e, iiwa, "pcg_fused",
                    ms_per_solve=e_bf["us_per_solve"] / 1e3,
                    iters=iiwa_iters, batch=256)
            run("iiwa_batch_256_fused_split", 240, fn_batch_split)

    # ---------------- unbound diagnostic tail ----------------
    if have_pallas:
        def fn_batch_1024_direct():
            # Wide-fleet exact throughput: 4 lane groups after the round-4
            # balanced-plan + per-group-call fixes (flat ~1.0 us/solve from
            # B=256 to 1024; the fill-first multi-group grid ran 1.6-1.9).
            # T=16 up front: the r04 run started at 8, and the one
            # T-doubling retry re-paid the ~63 s compile twice (385 s wall).
            e = bench_batch(iiwa, direct_opts, "fused", batch=1024, T=16)
            e["tier"] = "thomas_batch"
            return annotate_roofline(
                e, iiwa, "direct_thomas",
                ms_per_solve=e["us_per_solve"] / 1e3, batch=1024)
        run("iiwa_batch_1024_direct_fused", 300, fn_batch_1024_direct)

        if e_bdf is not None and e_bdf.get("tier") == "thomas_batch":
            def fn_direct_served():
                e = bench_direct_served(iiwa, direct_opts, batch=256)
                return annotate_roofline(
                    e, iiwa, "direct_thomas",
                    ms_per_solve=e["us_per_solve"] / 1e3, batch=256)
            run("iiwa_batch_256_direct_served", 130, fn_direct_served)

    run("iiwa_direct", 40,
        head_single(iiwa, direct_opts, "jax", "direct_jax"))
    if have_pallas:
        poly3 = SolverOptions(exit_tol=1e-6, max_iters=200, rho=1e-3,
                              precond_poly_degree=3)
        run("iiwa_fused_poly3", 35,
            head_single(iiwa, poly3, "fused", "pcg_fused", T=512,
                        poly_degree=3))

    def fn_split_jax():
        e = bench_split(iiwa, opts, T=256)
        return annotate_roofline(e, iiwa, "pcg_jax",
                                 ms_per_solve=e["full_ms"], iters=iiwa_iters)
    run("iiwa_split_jax", 35, fn_split_jax)

    if have_pallas:
        def fn_pcg_pallas():
            # Split-pallas tier: XLA condense writes packed S+Pinv once, the
            # resident kernel reads them once — the pcg_xl byte model.
            return annotate_roofline(
                bench_single(iiwa, opts, "pallas", T=256), iiwa, "pcg_xl")
        run("iiwa_pcg_pallas", 30, fn_pcg_pallas)

    for K in (100, 250, 500):
        spec_k = ProblemSpec(14, 7, K)

        def fn_hz_jax(spec_k=spec_k, K=K):
            # T sized so the T-vs-2T difference clears the ~8 ms noise
            # floor (round-1 entries at T=32/64 carried 60%+ spreads).
            return annotate_roofline(
                bench_single(spec_k, opts, "jax", T=max(64, 25600 // K)),
                spec_k, "pcg_jax")
        run(f"iiwa_horizon_{K}_pcg", 45, fn_hz_jax)

    if have_pallas:
        floor = run("iiwa_dispatch_floor", 45,
                    lambda: bench_dispatch_floor(iiwa))
        if floor is not None:
            def fn_direct_split():
                e = bench_direct_fused_split(iiwa, direct_opts,
                                             C["iiwa_direct_fused"], floor)
                return annotate_roofline(
                    e, iiwa, "direct_fused",
                    ms_per_solve=e["kernel_only_ms"])
            run("iiwa_direct_fused_split", 90, fn_direct_split)

        def fn_batch_pallas():
            e = bench_batch(iiwa, opts, "pallas", T=6)
            return annotate_roofline(
                e, iiwa, "pcg_xl", ms_per_solve=e["us_per_solve"] / 1e3,
                iters=iiwa_iters)
        run("iiwa_batch_256_pcg_pallas", 110, fn_batch_pallas)

    def fn_mpc_jax():
        e = bench_mpc_sequence(iiwa, opts, T=128, pcg_backend="jax")
        return annotate_roofline(
            e, iiwa, "pcg_jax", ms_per_solve=e["ms_per_solve"],
            iters=max(1, round(e["iters_rest_mean"])))
    run("iiwa_mpc_sequence", 90, fn_mpc_jax)

    if have_pallas:
        for B in (16, 64, 256):   # 128 ran earlier (prose-bound row)
            def fn_farm(B=B):
                e = bench_mpc_farm(iiwa, opts, B=B)
                return annotate_roofline(
                    e, iiwa, "pcg_fused", ms_per_solve=e["us_per_solve"] / 1e3,
                    iters=max(1, int(e["iters_rest_mean"])), batch=B)
            run(f"iiwa_mpc_farm_{B}", 80 if B == 16 else 330, fn_farm)

        def fn_farm_direct():
            # The EXACT farm at the wide-fleet shape the pecking-order note
            # recommends: (Tseq=4) x (B=64) = 256 Thomas solves per call.
            e = bench_mpc_farm_direct(iiwa, direct_opts, B=64, Tseq=4)
            return annotate_roofline(
                e, iiwa, "direct_thomas",
                ms_per_solve=e["us_per_solve"] / 1e3, batch=256)
        run("iiwa_mpc_farm_direct_4x64", 120, fn_farm_direct)

        def fn_farm_direct_wide():
            # Fleet scale: 4 x 256 = 1024 exact solves per call through the
            # round-4 flat wide-batch path (balanced plan + per-group
            # calls).
            e = bench_mpc_farm_direct(iiwa, direct_opts, B=256, Tseq=4)
            return annotate_roofline(
                e, iiwa, "direct_thomas",
                ms_per_solve=e["us_per_solve"] / 1e3, batch=1024)
        run("iiwa_mpc_farm_direct_4x256", 150, fn_farm_direct_wide)


def _transport_preflight(timeout_s: "int | None" = None):
    """Fail fast, with a parseable record, when the device transport is down.

    Two observed outage modes, both of which would hang the run BEFORE the
    headline prints: backend init on a dead axon tunnel BLOCKS forever
    rather than erroring (2026-08-17 outage), and a wedged compile service
    leaves jax.devices() working while EVERY compile hangs (2026-08-20
    outage — even a trivial jitted matmul).  Probe init AND one tiny
    compile+execute in a killable subprocess; on failure emit the driver's
    one-line JSON with an ``error`` field and exit nonzero."""
    import os
    import subprocess
    import sys

    if timeout_s is None:
        # Tunable for degraded-but-working transports: during the
        # 2026-08-20/21 partial recovery a trivial compile took ~90 s, so
        # init + compile can legitimately exceed the old 180 s cutoff.
        timeout_s = int(os.environ.get("BENCH_PREFLIGHT_S", "180"))
    probe = ("import jax, jax.numpy as jnp; "
             "print(jax.devices()[0].platform, flush=True); "
             "f = jax.jit(lambda a: (a @ a).sum()); "
             "print(float(f(jnp.ones((64, 64)))), flush=True)")
    try:
        out = subprocess.run([sys.executable, "-c", probe],
                             capture_output=True, text=True,
                             timeout=timeout_s)
        if out.returncode == 0:
            return
        reason = (out.stderr or out.stdout).strip()[-300:]
    except subprocess.TimeoutExpired:
        reason = (f"backend init did not complete in {timeout_s}s "
                  "(device transport down?)")
    print(json.dumps({
        "metric": "iiwa_14_7_50_avg_solve_ms",
        "value": None,
        "unit": "ms",
        "vs_baseline": None,
        "error": f"device transport preflight failed: {reason}",
    }))
    raise SystemExit(1)


def _sigterm_to_exit(signum, frame):
    """`timeout`/the driver deliver SIGTERM, whose default disposition kills
    the process WITHOUT running ``finally`` — which would again lose the
    final headline print (and the artifact's total_wall_s).  Convert it to
    SystemExit so main()'s finally re-prints the headline as the last line."""
    raise SystemExit(143)


if __name__ == "__main__":
    import signal

    signal.signal(signal.SIGTERM, _sigterm_to_exit)
    _transport_preflight()
    main()
