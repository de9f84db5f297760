"""README/PARITY perf numbers must come from the committed BENCH_DETAIL.json
(one source of perf truth — VERDICT round-1 weak #7).  After a bench rerun
changes the artifact, regenerate the prose with ``python tools/perfsync.py
--fix`` in the same commit."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import perfsync


def test_readme_parity_numbers_match_artifact():
    drift = perfsync.run(fix=False)
    assert not drift, "\n".join(
        ["perf prose drifted from BENCH_DETAIL.json — run "
         "`python tools/perfsync.py --fix`:"] + drift)
