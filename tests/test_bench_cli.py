"""bench.py's TPU-reachability guard and CPU-fallback contract.

The TPU arrives over a tunnel that can be down for hours (observed
2026-08-18); in that state any device op hangs forever. bench.py must
never leave the driver with NO output: it probes the device from a
watchdogged subprocess and, on a hung/absent accelerator, re-runs itself
on the CPU backend at a reduced shape, emitting one honestly-labeled
JSON line (compared per-sample against the CPU-measured torch baseline,
tools/baseline_torch.py).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _load_bench():
    sys.path.insert(0, REPO)
    import bench

    return bench


def test_probe_failure_returns_none_with_cause(monkeypatch):
    # _probe_backend must turn probe_device's RuntimeError into
    # (None, cause) so the fallback JSON can carry the actual reason.
    # The genuine subprocess-timeout behavior is pinned (CPU-safe) in
    # tests/test_runtime_probe.py — never run a killable default-platform
    # probe from the fast suite: a watchdog-killed TPU process sticks
    # the single-tenant chip ~8 min.
    from paa_tpu import runtime

    bench = _load_bench()

    def hung(timeout):
        raise RuntimeError(f"device probe hung for {timeout:.0f}s — down")

    monkeypatch.setattr(runtime, "probe_device", hung)
    backend, err = bench._probe_backend()
    assert backend is None
    assert "device probe hung" in err


@pytest.mark.slow  # compiles wav2vec2-tiny fwd+bwd in a fresh process
def test_cpu_fallback_emits_labeled_json():
    env = dict(os.environ)
    env.update(
        BENCH_CPU_FALLBACK="1",  # enter the fallback branch directly
        BENCH_BATCH="2",
        BENCH_STEPS="1",
        BENCH_MODEL="wav2vec2-tiny",
        BENCH_AUDIO_LEN="16000",
        BENCH_ATTN="xla",
        BENCH_PALLAS_FM="0",
        BENCH_PARAM_STORAGE="float32",
        BENCH_COMPUTE_DTYPE="float32",
    )
    r = subprocess.run(
        [sys.executable, BENCH], capture_output=True, text=True,
        env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
    assert len(lines) == 1  # the driver parses exactly one JSON line
    out = json.loads(lines[0])
    assert "CPU FALLBACK" in out["metric"]
    assert out["unit"] == "samples/sec (CPU)"
    assert out["value"] > 0
    assert out["vs_baseline"] > 0
    assert out["baseline_samples_per_sec"] == pytest.approx(64 * 0.0084)
    # the honest pointer to the real on-chip measurement — no stale
    # hardcoded steps/s figure in machine-readable output
    assert "docs/PERF.md" in out["note"]
    import re

    assert not re.search(r"\d", out["note"]), (
        "note must point at the docs, not embed a stale measured figure"
    )
    # entering fallback directly (no probe ran) records no cause
    assert out["fallback_reason"] == "unrecorded"
