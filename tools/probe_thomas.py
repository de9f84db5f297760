"""Round-3 batch-Thomas probes: the crossover table and the bound experiment.

Two reproducible measurements behind kernels/thomas_batch.py's documented
claims (run on real TPU, serialize with other chip users):

  cross   Thomas vs CR us/solve at B in {16, 32, 64, 128, 256}, IIWA
          (14,7,50), via the repo chain protocol (gato_tpu.timing.time_solve)
          — the numbers in thomas_batch.should_dispatch's docstring.  The CR
          rows monkeypatch should_dispatch off; the B<64 Thomas rows force
          _MIN_BATCH=1 so both kernels measure at every width.

  bound   The falsification experiment behind the 'issue-latency' label
          (bench.annotate_roofline, CLAUDE.md lore): rebuild theta in the
          reverse pass instead of storing it (-21% factor-stack traffic,
          zero extra HBM reads, +20% serial flops).  Measured 0.91 -> 1.13
          us/solve at B=256 — SLOWER, so HBM bandwidth is NOT the binding
          limit despite the byte model reading ~80% of that roofline; the
          sequential knot walk is bound by the issue latency of its
          dependent per-knot op chain.  This mode only REPORTS the stored
          numbers and re-measures the production (stored-theta) kernel; the
          rebuild variant lives in git history (commit 'Name the Thomas
          tier's true bound'), not on a flag — re-measuring it requires
          reverting that commit's kernel hunk.

Usage:
    PYTHONPATH="$PYTHONPATH:." python tools/probe_thomas.py [cross bound]
Prints one JSON line per row.  Nothing here feeds BENCH_DETAIL.json.

CONCLUSIONS (v5e, 2026-08-19 — these set _MIN_BATCH=16 and the bound label):

  * crossover: Thomas 7.16 / 3.36 / 2.00 / 0.97 / 0.93 us/solve at
    B=16/32/64/128/256 vs CR 8.34 / 8.01 / 7.56 / 6.78 / 6.91 — Thomas wins
    from B=16 up; its ms/batch is nearly flat (0.107 -> 0.238 over 32 ->
    256: the serial knot walk sets the time, lanes ride along).
  * bound: stored-theta 0.91 vs rebuilt-theta 1.13 us/solve at B=256.
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
OPTS = SolverOptions(method="direct", rho=1e-3)


def _staged(batch, seed=1000):
    problems = [random_blocks(SPEC, seed=seed + i) for i in range(batch)]
    blocks = KKTBlocks(*(jax.device_put(
        jnp.asarray(np.stack([np.asarray(p[f]) for p in problems])))
        for f in range(7)))
    float(jnp.sum(blocks.q))
    return blocks


def _row(blocks, B, tag):
    ms, info = time_solve(SPEC, blocks, OPTS, pcg_backend="fused", T=12,
                          label=f"B{B}/{tag}", log=_log)
    row = {"probe": tag, "B": B, "ms_per_batch": round(ms, 4),
           "us_per_solve": round(1e3 * ms / B, 4),
           "spread_ms": info.get("spread_ms")}
    print(json.dumps(row), flush=True)
    return row


def probe_cross():
    import importlib

    from gato_tpu.kernels import thomas_batch

    for B in (16, 32, 64, 128, 256):
        blocks = _staged(B)
        importlib.reload(thomas_batch)
        thomas_batch._MIN_BATCH = 1          # force the tier at every width
        _row(blocks, B, "thomas")
        thomas_batch.should_dispatch = lambda *a: False
        _row(blocks, B, "cr")
    importlib.reload(thomas_batch)           # restore the real dispatch


def probe_bound():
    print(json.dumps({
        "probe": "bound", "B": 256,
        "stored_theta_us_per_solve": 0.93,
        "rebuilt_theta_us_per_solve": 1.13,
        "note": "rebuilt variant in git history; re-measuring production "
                "(stored-theta) kernel now for drift",
    }), flush=True)
    _row(_staged(256), 256, "bound/stored_theta")


if __name__ == "__main__":
    modes = sys.argv[1:] or ["cross", "bound"]
    if jax.default_backend() != "tpu":
        _log("WARNING: not on TPU — numbers will be meaningless "
             "(interpret-mode kernels)")
    for m in modes:
        {"cross": probe_cross, "bound": probe_bound}[m]()
