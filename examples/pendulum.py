"""The reference's pendulum example (test_pendulum_5.py) on gato_tpu.

Run:  python examples/pendulum.py
"""

import numpy as np
from scipy import sparse

import gato_tpu
from gato_tpu.testing import pendulum_problem

p = pendulum_problem()
l, dz = gato_tpu.linsys_solve(
    p.G_row, p.G_col, p.G_val, p.C_row, p.C_col, p.C_val,
    p.g, p.c, [0.0] * 10,
    testiters=10, exit_tol=1e-6, max_iters=10, warm_start=False, rho=0.001,
)

# Oracle check, exactly as the reference example does (test_pendulum_5.py:28-37)
G = sparse.csr_matrix((p.G_val, p.G_col, p.G_row)).todense()
C = sparse.csr_matrix((p.C_val, p.C_col, p.C_row)).todense()
A = np.block([[G, C.T], [C, np.zeros((C.shape[0], C.shape[0]))]])
gamma = np.block([[np.array([p.g]).T], [np.array([p.c]).T]])
x = np.linalg.inv(A).dot(gamma)
x_gato = np.block([[np.array([dz]).T], [np.array([l]).T]])
assert np.allclose(x_gato, x, rtol=1, atol=0.01)
print("Test passed")
