"""Fail-fast device probing (paa_tpu.runtime.probe_device).

A down TPU tunnel makes the FIRST device op of a default-platform
process hang forever with no error (observed outage 2026-08-18). The
CLIs probe the accelerator from a watchdogged subprocess before touching
it and turn a hang into an actionable failure — run_attack writes its
standard failure results.json (reference: run_attack.py:265-279) and
exits 1 instead of blocking indefinitely.
"""

import json
import os

import pytest

from paa_tpu import runtime


def test_probe_timeout_raises_actionable_error():
    # 0.5 s is always shorter than the probe subprocess's own python
    # startup + `import jax`, so the watchdog fires deterministically
    # without a hung tunnel. platform="cpu" pins the child so a killed
    # probe can never be mid-TPU-acquisition (a killed TPU process
    # sticks the single-tenant chip ~8 min — never risk that from the
    # fast suite).
    with pytest.raises(RuntimeError, match="--platform cpu"):
        runtime.probe_device(timeout=0.5, platform="cpu")


def test_probe_succeeds_on_cpu_platform():
    # With a sane budget the CPU-pinned probe completes and reports the
    # pinned backend — the success contract the CLIs rely on.
    assert runtime.probe_device(timeout=120, platform="cpu") == "cpu"


def test_backends_initialized_flips_after_first_device_use():
    # Once a process has live backends (every test session does, via the
    # CPU mesh), in-process CLI callers must skip the probe via this
    # guard — a redundant probe would only add latency, and any hang
    # already happened.
    import jax

    jax.devices()
    assert runtime.backends_initialized()


def test_run_attack_probe_failure_writes_failure_json(tmp_path, monkeypatch):
    from paa_tpu.cli import parser as parser_lib
    from paa_tpu.cli import run_attack

    monkeypatch.setattr(runtime, "backends_initialized", lambda: False)

    def boom(timeout):
        raise RuntimeError(f"device probe hung for {timeout:.0f}s")

    monkeypatch.setattr(runtime, "probe_device", boom)
    args = parser_lib.create_arg_parser().parse_args([
        "--dataset", "synthetic", "--small_data", "--norm_type", "linf",
        "--save_root", str(tmp_path), "--device_probe_timeout", "7",
    ])
    assert run_attack.main(args) == 1
    results = json.load(open(os.path.join(
        tmp_path, "untargeted", "synthetic",
        "linf_0.0001_untargeted_adam", "results.json",
    )))
    assert results["finished_training"] is False
    assert "device probe hung for 7s" in results["error"]


def test_sweep_probe_failure_writes_marker_and_exits_1(tmp_path, monkeypatch):
    """A probe failure before any cell runs must still leave a
    machine-readable artifact (no per-cell results.json exists yet) and
    exit 1 — mirroring run_attack's failure contract."""
    import sys

    from paa_tpu.cli import sweep

    monkeypatch.setattr(runtime, "backends_initialized", lambda: False)

    def boom(timeout):
        raise RuntimeError(f"device probe hung for {timeout:.0f}s")

    monkeypatch.setattr(runtime, "probe_device", boom)
    monkeypatch.setattr(sys, "argv", [
        "sweep", "--norms", "linf", "--save_root", str(tmp_path),
        "--device_probe_timeout", "9",
    ])
    assert sweep.main() == 1
    marker = json.load(open(os.path.join(tmp_path, "sweep_failure.json")))
    assert marker["finished_training"] is False
    assert "device probe hung for 9s" in marker["error"]


def test_run_attack_skips_probe_when_backends_live(tmp_path, monkeypatch):
    """In-process callers (tests, notebooks with jax already up) never pay
    the probe: a poisoned probe_device must not be reached."""
    from paa_tpu.cli import parser as parser_lib
    from paa_tpu.cli import run_attack

    def boom(timeout):  # pragma: no cover - reaching this is the failure
        raise AssertionError("probe must be skipped when backends are live")

    monkeypatch.setattr(runtime, "probe_device", boom)
    args = parser_lib.create_arg_parser().parse_args([
        "--dataset", "synthetic", "--small_data", "--norm_type", "linf",
        "--num_epochs", "1", "--batch_size", "2", "--model", "wav2vec2-tiny",
        "--synthetic_samples", "6", "--num_items_to_inspect", "1",
        "--save_root", str(tmp_path),
    ])
    assert run_attack.main(args) == 0
