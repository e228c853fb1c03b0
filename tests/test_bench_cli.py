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


def test_probe_timeout_returns_none(monkeypatch):
    # A 1 s budget is always shorter than the probe subprocess's own
    # `import jax`, so the watchdog path triggers deterministically
    # without needing a hung tunnel.
    bench = _load_bench()
    monkeypatch.setattr(bench, "PROBE_TIMEOUT", 1)
    assert bench._probe_backend() is None


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
    # the honest pointer to the real on-chip measurement
    assert "docs/PERF.md" in out["note"]
