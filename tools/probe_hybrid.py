"""Round-5 hybrid-direct-tier stage decomposition (VERDICT r4 #6 follow-up).

Chain-differenced per-stage costs of the hybrid long-K exact solve
(kernels/longk.py: chunked condense -> compacting CR peels -> one-kernel CR
on the reduced system -> XLA back-substitution -> residual/flags ->
recovery), each stage timed as its own perturbed in-scan chain (direct
single-dispatch timing cannot resolve sub-RTT stages on this transport —
every stage measures ~27 ms wall, the scalar-fetch round trip).

Usage (real TPU, serialized with other chip users):
    PYTHONPATH="$PYTHONPATH:." python tools/probe_hybrid.py [K]
Prints one JSON line per stage; nothing here feeds BENCH_DETAIL.json.

CONCLUSIONS (v5e, K=2048 / B=1, 2026-08-20 — recorded so the experiments
aren't re-run):

  * Stage costs (ms): peel 0.83 -> 0.35 after the one-slice restructure
    (see below), kernel CR @1024 0.167, flags 0.021, residual 0.016,
    unpeel 0.009; whole solve 0.744 -> 0.437 vs 0.980 XLA Thomas.
  * The original peel sliced even/odd lanes PER COLUMN STACK — ~84
    separate lane-stride-2 relayouts at ~10 us each, 0.83 ms total, more
    than every other stage combined.  Slicing the stacked (3, s, sp, W)
    operator ONCE (4 strided slices) removed ~0.5 ms; the remaining ~0.3
    ms is the XLA _mat_mat chains' intermediate HBM traffic (6 chains x
    s^2 column ops, each (sp, Wh) product written/read through HBM).
  * That residue is what the gated Mosaic peel kernel (_peel_kernel,
    _PEEL_USE_KERNEL) addresses — VMEM-resident products, sequential-grid
    carry for the one-lane neighbor dependency.  It could not be compile-
    validated in round 5: the axon compile service went down mid-session
    (plain XLA compiles hung; after partial recovery Mosaic compiles of
    KNOWN-GOOD kernels still hung), so the flag ships False.
"""

from __future__ import annotations

import functools
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from gato_tpu.kernels import longk  # noqa: E402
from gato_tpu.problem import ProblemSpec  # noqa: E402
from gato_tpu.testing import random_blocks  # noqa: E402
from gato_tpu.timing import chain_time  # noqa: E402


def main(K: int = 2048):
    def log(m):
        print(m, file=sys.stderr, flush=True)

    s, cdim = 14, 7
    spec = ProblemSpec(s, cdim, K)
    b = random_blocks(spec, seed=7)
    arrs = [jax.device_put(jnp.asarray(x)[None]) for x in b]
    sp, Kp, Lc, n_chunks, _, _ = longk._plan_dispatch(K, s, cdim, "xl", None)
    pm = functools.partial(longk._pack_mat, K_sub=Kp, g=1, L=Kp,
                          n_groups=1, sp=sp)
    pv = functools.partial(longk._pack_vec, K_sub=Kp, g=1, L=Kp,
                          n_groups=1, sp=sp)
    Qb, Rb, Ab, Bb = pm(arrs[0]), pm(arrs[1]), pm(arrs[2]), pm(arrs[3])
    qb, rb, cb = pv(arrs[4]), pv(arrs[5]), pv(arrs[6])
    rho = jnp.float32(1e-3)
    Sb, _Pb, gamb, Qinvb, Rinvb = longk._condense_call(
        rho, Qb, Rb, Ab, Bb, qb, rb, cb, s=s, c=cdim, sp=sp, Kp=Kp, Lc=Lc,
        n_chunks=n_chunks, precond="jacobi", interpret=False)
    widths = tuple(longk._hybrid_widths(Kp, s, sp))
    log(f"widths: {widths}")

    peel = (functools.partial(longk._cr_peel_to_fit_batched, widths=widths,
                              s=s, sp=sp, interpret=False)
            if longk._PEEL_USE_KERNEL else
            jax.vmap(functools.partial(longk._cr_peel_to_fit, widths=widths,
                                       s=s, sp=sp)))

    def step_peel(x0, carry, t):
        pert = 1.0 + 1e-6 * jnp.cos(t) + 1e-7 * jnp.tanh(jnp.sum(carry))
        S_red, b_red, saves, bad = peel(Sb * pert,
                                        x0 * (1.0 + 1e-6 * jnp.sin(t)))
        tot = (jnp.sum(S_red) + jnp.sum(b_red) + jnp.sum(bad)
               + sum(jnp.sum(a) for lvl in saves for a in lvl))
        return jnp.broadcast_to(tot, x0.shape)

    ms, _ = chain_time(step_peel, gamb, 64, label="peel", log=log)
    print(json.dumps({"stage": "peel", "kernel": longk._PEEL_USE_KERNEL,
                      "ms": round(ms, 4)}), flush=True)

    S_red, b_red, saves, _bad = peel(Sb, gamb)

    def step_kern(x0, carry, t):
        pert = 1.0 + 1e-6 * jnp.cos(t) + 1e-7 * jnp.tanh(jnp.sum(carry))
        return longk._direct_xl_call(S_red * pert,
                                     x0 * (1.0 + 1e-6 * jnp.sin(t)),
                                     s=s, sp=sp, Kp=widths[-1],
                                     interpret=False)

    ms, _ = chain_time(step_kern, b_red, 64, label="kern_cr", log=log)
    print(json.dumps({"stage": f"kernel_cr_{widths[-1]}",
                      "ms": round(ms, 4)}), flush=True)

    lam_red = longk._direct_xl_call(S_red, b_red, s=s, sp=sp,
                                    Kp=widths[-1], interpret=False)
    unp = jax.vmap(functools.partial(longk._cr_unpeel_all, widths=widths,
                                     s=s, sp=sp))

    def step_unp(x0, carry, t):
        lam = unp(x0 * (1.0 + 1e-6 * jnp.sin(t)
                        + 1e-7 * jnp.tanh(jnp.sum(carry))), saves)
        return jnp.broadcast_to(jnp.sum(lam), x0.shape)

    ms, _ = chain_time(step_unp, lam_red, 128, label="unpeel", log=log)
    print(json.dumps({"stage": "unpeel", "ms": round(ms, 4)}), flush=True)

    def step_flags(x0, carry, t):
        pert = 1.0 + 1e-6 * jnp.cos(t) + 1e-7 * jnp.tanh(jnp.sum(carry))
        bad = (longk._packed_singular_flag(Qb * pert, Qinvb, s, rho)
               | longk._packed_singular_flag(Rb * pert, Rinvb, cdim, rho))
        return jnp.broadcast_to(bad.astype(x0.dtype).sum(), x0.shape)

    ms, _ = chain_time(step_flags, gamb, 128, label="flags", log=log)
    print(json.dumps({"stage": "flags", "ms": round(ms, 4)}), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2048)
