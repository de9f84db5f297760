"""bench.py roofline accounting: the analytic FLOP/byte model and the
annotation logic (pure host math — no device work).  The model's job is to
bucket configs into latency/bandwidth/compute-bound and report distance to
the binding hardware limit (the measurement the reference's harness never
had, gpu_library.cu:166-198), so the tests pin the invariants that make
those buckets meaningful rather than exact constants."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402
from gato_tpu.problem import ProblemSpec  # noqa: E402


def test_flops_bytes_scale_with_problem():
    fl1, by1 = bench._solve_flops_bytes("pcg_fused", 14, 7, 50, 27)
    fl2, by2 = bench._solve_flops_bytes("pcg_fused", 14, 7, 100, 27)
    # Condense/PCG/recover all scale linearly in K.
    assert 1.8 < fl2 / fl1 < 2.2
    assert 1.8 < by2 / by1 < 2.2
    # More iterations -> more flops, same fused residency traffic.
    fl3, by3 = bench._solve_flops_bytes("pcg_fused", 14, 7, 50, 54)
    assert fl3 > fl1 and by3 == by1


def test_backend_kinds_ordering():
    s, c, K, iters = 14, 7, 1024, 30
    kinds = ["pcg_fused", "pcg_xl", "pcg_stream", "pcg_jax"]
    bys = [bench._solve_flops_bytes(k, s, c, K, iters)[1] for k in kinds]
    # Residency hierarchy: fused (io only) < xl (one operator pass) <
    # stream (re-streamed per iteration); jax re-reads plain-layout
    # operators per iteration.
    assert bys[0] < bys[1] < bys[2]
    assert bys[0] < bys[3]
    # Identical arithmetic across PCG backends.
    fls = [bench._solve_flops_bytes(k, s, c, K, iters)[0] for k in kinds]
    assert len(set(fls)) == 1


def test_annotate_roofline_fields_and_bounds():
    spec = ProblemSpec(14, 7, 50)
    # ~20 us solve on a ~0.7 us roofline -> latency-bound.
    e = bench.annotate_roofline(
        {"avg_ms_device": 0.020, "pcg_iters": 27}, spec, "pcg_fused")
    r = e["roofline"]
    for f in ("flops_per_solve", "hbm_bytes_per_solve", "achieved_gflops",
              "achieved_gbps", "roofline_ms", "pct_of_roofline", "bound"):
        assert f in r
    assert r["bound"] == "latency"
    assert 0 < r["pct_of_roofline"] < 100

    # A time close to the memory roofline -> bandwidth-bound, no note.
    spec_k = ProblemSpec(14, 7, 4096)
    flops, hbm = bench._solve_flops_bytes("pcg_jax", 14, 7, 4096, 31)
    roof_ms = max(flops / bench._V5E["vpu_f32_flops"],
                  hbm / bench._V5E["hbm_Bps"]) * 1e3
    e2 = bench.annotate_roofline(
        {"avg_ms_device": 2.0 * roof_ms, "pcg_iters": 31}, spec_k, "pcg_jax")
    assert e2["roofline"]["bound"] == "bandwidth"
    assert "note" not in e2["roofline"]

    # Faster than the modeled-traffic roofline (compiler on-chip reuse):
    # flagged as an upper bound, never silently reported as >100%.
    fl_s, hbm_s = bench._solve_flops_bytes("pcg_stream", 14, 7, 4096, 31)
    roof_s_ms = max(fl_s / bench._V5E["vpu_f32_flops"],
                    hbm_s / bench._V5E["hbm_Bps"]) * 1e3
    e3 = bench.annotate_roofline(
        {"avg_ms_device": 0.5 * roof_s_ms, "pcg_iters": 31}, spec_k,
        "pcg_stream")
    assert "note" in e3["roofline"]


def test_annotate_roofline_skips_unmeasured():
    spec = ProblemSpec(14, 7, 50)
    e = bench.annotate_roofline({"avg_ms_device": 0.0}, spec, "pcg_fused")
    assert "roofline" not in e
