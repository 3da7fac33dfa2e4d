"""Smoke-test the bench.py flow end to end with shrunken models.

BENCH_TINY=1 + BENCH_CPU=1 shrink every model and force the CPU
backend so the complete bench control flow — survivability-ordered
stages, tier gating, incremental JSON emission, variable lifetimes —
executes in ~1-2 min without a TPU. This is the regression guard for
the thing BENCH_r04 died to: a runtime error in a rarely-exercised
branch of bench.py would cost an entire driver round's artifact.
"""

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_bench_tiny_flow_emits_all_tiers():
    env = dict(
        os.environ,
        BENCH_TINY="1", BENCH_CPU="1", BENCH_PIPELINE="0",
        BENCH_CAMS="1", BENCH_FRAMES="2", BENCH_N_LONG="2",
    )
    # the test conftest's 8-virtual-device XLA_FLAGS would leak into
    # the subprocess; the bench expects a plain single-device backend
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, "bench.py"], cwd=ROOT, env=env,
        capture_output=True, text=True, timeout=1200,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    lines = [json.loads(ln) for ln in out.stdout.strip().splitlines()]
    # survivability ladder: PARTIAL (det+pose) -> parity kernel ->
    # serving tier -> fast tier (pre-pipeline) -> final
    assert len(lines) == 5
    for ln in lines:
        assert ln["metric"] == "e2e_camera_frames_per_sec_per_chip"
        assert ln["value"] > 0
    assert "PARTIAL" in lines[0]["detail"]["tier_note"]
    assert set(lines[0]["detail"]["kernel_ms_per_chunk"]) == {
        "det", "pose"}
    assert set(lines[1]["detail"]["kernel_ms_per_chunk"]) == {
        "det", "pose", "id", "tri"}
    assert "kernel_cf_s_serving" in lines[2]["detail"]
    assert "kernel_cf_s_fast" in lines[3]["detail"]
    assert "BENCH_PIPELINE=0" in lines[4]["detail"]["tier_note"]
    # each successive line only grows the detail key set
    keys = [set(ln["detail"]) for ln in lines[1:]]
    for a, b in zip(keys, keys[1:]):
        assert a <= b
