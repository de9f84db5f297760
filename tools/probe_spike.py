"""Round-3 long-horizon direct-solve race: Thomas vs CR vs single-chip SPIKE.

Reproducible measurement behind btd_solve_auto's B=1 pick and the lore entry
on XLA dependent-chain latency (run on real TPU, serialize with other chip
users):

  race    Solve-stage-only us/solve at B=1, IIWA width (s=14), K in
          {512, 1024, 2048, 4096}: block Thomas (lax.scan, depth K) vs
          cyclic reduction (log2 K levels) vs — when the checkout has it —
          single-chip SPIKE substructuring (chunk interiors batched in one
          multi-rhs Thomas scan + a CR interface system).  Chain-differenced
          via gato_tpu.timing.chain_time with the OPERATOR perturbed each
          step (not just the rhs — CLAUDE.md hoisting trap).

  full    The public surface: solve(method='direct', pcg_backend='jax') at
          K in {2048, 4096} — condense + solve + recover end to end.

Usage:
    PYTHONPATH="$PYTHONPATH:." python tools/probe_spike.py [race full]
Prints one JSON line per row.  Nothing here feeds BENCH_DETAIL.json.

CONCLUSIONS (v5e, 2026-08-20 — a NEGATIVE result, recorded so nobody
re-implements it):

  * race (us/solve, B=1 s=14, solve stage only):

        K        512     1024    2048    4096
        thomas   8580    17128   34382   72595
        cr        439      831    1095    3391
        spike*    626     1374    1318    5331

    (*best chunk count of {sqrt K, K/64..K/8}; btd_solve_spike lived only
    in the working tree of 2026-08-20 — this file's git-added commit is
    the only record of its algebra, which is parallel/sharded.py's
    _btd_solve_direct_local with the collectives replaced by array shifts.)

  * WHY spike loses on one chip: at B=1/narrow batch, an XLA lax.scan step
    costs ~17 us and a CR level ~50 us REGARDLESS of width — both are bound
    by the ~90-op dependent chain of blocktri.block_inv's unrolled
    Gauss-Jordan (14 pivots x ~6 dependent vector ops, each a dispatch-
    granularity HLO), not by occupancy or flops.  SPIKE's structure costs
    ~2K/c scan steps + log2(c) CR levels >= CR's log2(K) levels in
    dependent-chain count for every c, so CR's log depth is already optimal
    at XLA dispatch granularity.  The mesh-sharded SPIKE
    (parallel/sharded._btd_solve_direct_local) is a DIFFERENT trade — there
    it replaces log2(K) ppermute rounds with ONE ppermute + a redundant
    tiny CR, so it stays.
  * Where latency matters (B=1, K within VMEM reach) the fused/longk CR
    KERNELS already hold the floor (no per-op dispatch: 0.168 ms full solve
    at K=1024 vs 0.831 ms for this XLA CR solve stage alone); the XLA path
    is the f64/CPU/fallback tier, and its CR pick (btd_solve_auto) stands.
"""

import functools
import json
import sys

import numpy as np

import jax
import jax.numpy as jnp

from gato_tpu import direct
from gato_tpu.timing import chain_time


def _log(m):
    print(m, file=sys.stderr, flush=True)


def _rand_spd_btd(K, s, seed=0):
    rng = np.random.default_rng(seed)
    D = rng.standard_normal((K, s, s)).astype(np.float32)
    D = D @ np.transpose(D, (0, 2, 1)) + 4 * s * np.eye(s, dtype=np.float32)
    L = 0.3 * rng.standard_normal((K, s, s)).astype(np.float32)
    L[0] = 0
    U = np.transpose(L, (0, 2, 1))
    U = np.roll(U, -1, axis=0)
    U[-1] = 0
    S = np.stack([L, D, U], axis=1)
    b = rng.standard_normal((K, s)).astype(np.float32)
    return jax.device_put(jnp.asarray(S)), jax.device_put(jnp.asarray(b))


def _race_row(solver, tag, K, s=14, T=8):
    S0, b0 = _rand_spd_btd(K, s, seed=K)

    def step(q, carry, t):
        # Perturb the OPERATOR by t and the carry (hoisting trap): a
        # rhs-only perturbation lets XLA hoist the whole factorization.
        eps = 1e-6 * t + 1e-7 * jnp.mean(carry)
        S = S0.at[:, 1].mul(1.0 + eps)
        return solver(S, q * (1.0 + eps))

    ms, info = chain_time(step, b0, T, label=f"{tag}/K{K}", log=_log)
    row = {"probe": "race", "solver": tag, "K": K,
           "us_per_solve": round(1e3 * ms, 2),
           "spread_ms": info.get("spread_ms"), "T": info.get("T")}
    print(json.dumps(row), flush=True)
    return row


def probe_race():
    spike = getattr(direct, "btd_solve_spike", None)
    for K in (512, 1024, 2048, 4096):
        _race_row(direct.btd_solve, "thomas", K)
        _race_row(direct.btd_solve_cr, "cr", K)
        if spike is None:
            continue  # removed (see CONCLUSIONS); check out the old commit
        for c in sorted({max(2, int(round(K ** 0.5))), K // 8, K // 16,
                         K // 32, K // 64}):
            if 2 <= c <= K // 2:
                _race_row(functools.partial(spike, n_chunks=c),
                          f"spike_c{c}", K)


def probe_full():
    from gato_tpu.problem import ProblemSpec, SolverOptions
    from gato_tpu.testing import random_blocks
    from gato_tpu.timing import time_solve

    for K in (2048, 4096):
        spec = ProblemSpec(14, 7, K)
        blocks = random_blocks(spec, seed=3)
        ms, info = time_solve(
            spec, blocks, SolverOptions(method="direct", rho=1e-3),
            pcg_backend="jax", T=4, label=f"full/K{K}", log=_log)
        print(json.dumps({"probe": "full", "K": K,
                          "ms_per_solve": round(ms, 4),
                          "spread_ms": info.get("spread_ms")}), flush=True)


if __name__ == "__main__":
    modes = sys.argv[1:] or ["race", "full"]
    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    if "race" in modes:
        probe_race()
    if "full" in modes:
        probe_full()
