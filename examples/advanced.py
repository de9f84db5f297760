"""Round-2 capabilities tour: polynomial preconditioning, long-horizon
streaming, exact direct solves, fused MPC chains, and multi-chip batches.

Runs anywhere (Pallas kernels interpret off-TPU; the multi-chip section uses
however many devices exist).  On a real TPU the fused paths are the defaults.

Run:  python examples/advanced.py
"""

import jax
import jax.numpy as jnp
import numpy as np

from gato_tpu import ProblemSpec, SolverOptions, solve, solve_sequence
from gato_tpu.formats import KKTBlocks
from gato_tpu.testing import random_blocks

iiwa = ProblemSpec(state_size=14, control_size=7, knot_points=50)
blocks = random_blocks(iiwa, seed=0)

# --- polynomial preconditioner composition ----------------------------------
# precond_poly_degree=d applies M_d r = P sum_{i<d} (I - S P)^i r: wider
# effective bandwidth with no extra stored blocks.  Fewer iterations whenever
# iterations are the scarce resource (streamed horizons, sharded meshes).
for d in (1, 2, 3):
    res = solve(iiwa, blocks, SolverOptions(rho=1e-3, exit_tol=1e-6,
                                            max_iters=200,
                                            precond_poly_degree=d))
    print(f"poly degree {d}: {int(res.iters)} PCG iterations")

# --- horizons past VMEM residency -------------------------------------------
# K=1024 at IIWA width exceeds the resident kernels' VMEM budget; the solver
# automatically streams the operators from HBM (kernels/pcg_streamed.py) —
# the same decision the reference's check_sms makes between its resident and
# strided CUDA kernels.
long_spec = ProblemSpec(14, 7, 1024)
res = solve(long_spec, random_blocks(long_spec, seed=1),
            SolverOptions(rho=1e-2, exit_tol=1e-6, max_iters=300))
print(f"K=1024 (streamed): {int(res.iters)} iterations, "
      f"converged={bool(res.converged)}")

# --- exact direct solve ------------------------------------------------------
# Block cyclic reduction when depth-bound, block Thomas when the batch is
# wide; no tolerance, no iterations — the robust option when PCG stalls.
res = solve(iiwa, blocks, SolverOptions(rho=1e-3, method="direct"))
print(f"direct: iters={int(res.iters)} residual^2={float(res.eta):.2e}")

# --- MPC chain, one device program ------------------------------------------
T = 16
seq = KKTBlocks(*(jnp.broadcast_to(jnp.asarray(a), (T,) + a.shape)
                  for a in blocks))
seq = seq._replace(q=seq.q * (1.0 + 0.01 * jnp.arange(T)[:, None, None]))
out = solve_sequence(iiwa, seq, SolverOptions(rho=1e-3, exit_tol=1e-6,
                                              max_iters=200))
iters = [int(x) for x in np.asarray(out.iters)]
print(f"MPC chain: first {iters[0]} iters, warm-started rest "
      f"{float(np.mean(iters[1:])):.1f} mean")

# --- multi-chip: batch sharded over a mesh, fused kernel per device ----------
from jax.sharding import Mesh
from gato_tpu.parallel.sharded import solve_batched_dp

n_dev = max(1, len(jax.devices()))
B = 4 * n_dev
small = ProblemSpec(4, 2, 10)
probs = [random_blocks(small, seed=10 + i) for i in range(B)]
bb = KKTBlocks(*(jnp.asarray(np.stack([np.asarray(p[f]) for p in probs]))
                 for f in range(7)))
mesh = Mesh(np.array(jax.devices()), ("dp",))
res_dp, _, _ = solve_batched_dp(mesh, *bb, rho=1e-2, exit_tol=1e-8,
                                max_iters=200)
print(f"dp-sharded batch ({B} problems / {n_dev} devices): "
      f"all converged={bool(np.all(np.asarray(res_dp.converged)))}")
