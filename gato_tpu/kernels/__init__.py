"""Fused Pallas TPU kernels — the performance tier.

Numerics are identical to the pure-JAX path in pcg.py / assemble.py (which is
also the CPU fallback and the test oracle); every kernel here has an
``interpret=True`` CPU test.
"""
