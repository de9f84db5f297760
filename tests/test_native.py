"""Native C++ packer: build, parity with the NumPy packer, error paths."""

import numpy as np
import pytest

from gato_tpu import ProblemSpec
from gato_tpu import formats, native
from gato_tpu.testing import blocks_to_csr, pendulum_problem, random_blocks


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.available() and not native.build():
        pytest.skip("no C++ toolchain to build the native packer")


def _numpy_pack(spec, prob):
    old = formats.USE_NATIVE
    formats.USE_NATIVE = False
    try:
        return formats.pack_kkt(spec, prob.G_row, prob.G_col, prob.G_val,
                                prob.C_row, prob.C_col, prob.C_val,
                                prob.g, prob.c)
    finally:
        formats.USE_NATIVE = old


@pytest.mark.parametrize("spec,seed", [
    (ProblemSpec(2, 1, 5), 0),
    (ProblemSpec(14, 7, 50), 1),
    (ProblemSpec(5, 3, 17), 2),
])
def test_native_matches_numpy(spec, seed):
    prob = blocks_to_csr(spec, random_blocks(spec, seed=seed))
    ref = _numpy_pack(spec, prob)
    Q, R = native.pack_G_native(spec, prob.G_row, prob.G_col, prob.G_val)
    A, B = native.pack_C_native(spec, prob.C_row, prob.C_col, prob.C_val)
    np.testing.assert_array_equal(Q, ref.Q)
    np.testing.assert_array_equal(R, ref.R)
    np.testing.assert_array_equal(A, ref.A)
    np.testing.assert_array_equal(B, ref.B)


def test_native_pendulum():
    p = pendulum_problem()
    ref = _numpy_pack(p.spec, p)
    Q, R = native.pack_G_native(p.spec, p.G_row, p.G_col, p.G_val)
    A, B = native.pack_C_native(p.spec, p.C_row, p.C_col, p.C_val)
    np.testing.assert_array_equal(Q, ref.Q)
    np.testing.assert_array_equal(A, ref.A)
    np.testing.assert_array_equal(B, ref.B)


def test_native_rejects_cross_terms():
    spec = ProblemSpec(2, 1, 3)
    G_row = [0, 1] + [1] * (spec.nz - 1)
    with pytest.raises(ValueError, match="cross term"):
        native.pack_G_native(spec, G_row, [2], [1.0])


def test_native_rejects_cross_knot():
    spec = ProblemSpec(2, 1, 3)
    G_row = [0, 1] + [1] * (spec.nz - 1)
    with pytest.raises(ValueError, match="knot"):
        native.pack_G_native(spec, G_row, [4], [1.0])


def test_native_rejects_out_of_range_C_column():
    """A corrupt CSR column in C must be a hard error, not an out-of-bounds
    write (the reference's csr_to_custom_C silently corrupts memory,
    gato_schur.cuh:725-743)."""
    spec = ProblemSpec(2, 1, 3)  # nz = 8, nl = 6
    # Rows 0..1: identity block (skipped).  Row 2: one entry, column way out.
    C_row = [0, 1, 2, 3, 3, 3, 3]
    with pytest.raises(ValueError, match="out of range"):
        native.pack_C_native(spec, C_row, [0, 1, 99], [1.0, 1.0, 1.0])
    with pytest.raises(ValueError, match="out of range"):
        native.pack_C_native(spec, C_row, [0, 1, -1], [1.0, 1.0, 1.0])


def test_native_is_default_path():
    """formats.pack_G should route through the native packer when built."""
    assert formats.USE_NATIVE and native.available()
    p = pendulum_problem()
    Q, R = formats.pack_G(p.spec, p.G_row, p.G_col, p.G_val)
    assert Q.dtype == np.float32 and Q.shape == (5, 2, 2)
