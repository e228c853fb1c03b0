"""Smoke test for the measured-baseline script (tools/baseline_torch.py).

The script is the evidence behind bench.py's 0.0084 steps/s denominator
(the reference's eager hot loop measured on this host) — it must keep
running end-to-end so the measurement stays reproducible.
"""

import json
import sys

import pytest

pytestmark = pytest.mark.slow  # loads full wav2vec2-base in torch


def test_baseline_script_runs_at_tiny_shape(capsys, monkeypatch):
    sys.path.insert(0, "tools")
    from tools import baseline_torch

    monkeypatch.setattr(sys, "argv", [
        "baseline_torch.py", "--batch", "1", "--full_batch", "2",
        "--audio_len", "8000", "--steps", "1", "--label_len", "5",
    ])
    assert baseline_torch.main() == 0
    line = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    # the keys bench.py's documented methodology cites
    assert out["steps_per_sec_2cpu"] > 0
    assert out["nn_fwd_bwd_sec_measured"] > 0
    assert out["fm_projection_sec"] >= 0
