"""Process-level grid launcher (cli/launch_grid.py) — the faithful twin
of the reference's SLURM driver: one OS process per (norm × ε) cell,
round-robin norm interleave, requeue of failed cells, job record
(reference: submit_scan_range.py:8-143). The consolidated in-process
sweep (cli/sweep.py) is the TPU fast path; this is the isolation path.
"""

import json
import os
import subprocess
import sys

import pytest

from paa_tpu.cli import launch_grid


def test_build_cells_round_robin():
    # Early cells must cover every norm (submit_scan_range.py:98-117):
    # first one cell of EACH norm, then each norm's second size, ...
    grids = {"a": [1.0, 2.0, 3.0], "b": [10.0], "c": [5.0, 6.0]}
    cells = launch_grid.build_cells(["a", "b", "c"], grids)
    assert cells == [
        ("a", 1.0), ("b", 10.0), ("c", 5.0),
        ("a", 2.0), ("c", 6.0),
        ("a", 3.0),
    ]


def test_dry_run_prints_one_command_per_cell(capsys):
    rc = launch_grid.main([
        "--norms", "max_phon,l2", "--dry_run", "--save_root", "/tmp/x",
        "--num_epochs", "2", "--dataset", "synthetic",
    ])
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    # 5 max_phon sizes + 3 l2 sizes (DEFAULT_GRIDS)
    assert len(lines) == 8
    # round-robin: the first two commands cover both norms
    assert "--norm_type max_phon" in lines[0]
    assert "--norm_type l2" in lines[1]
    # grid sizes land on the norm's own size flag; passthrough forwarded
    assert "--max_phon_level 15.0" in lines[0]
    assert "--l2_size 0.04" in lines[1]
    for line in lines:
        assert "paa_tpu.cli.run_attack" in line
        assert "--num_epochs 2" in line
        assert "--save_root /tmp/x" in line


def test_unknown_norm_is_an_error():
    with pytest.raises(SystemExit):
        launch_grid.main(["--norms", "nope", "--dry_run"])


def test_grid_norm_without_size_flag_is_an_error():
    """--grid can name a norm DEFAULT_GRIDS never had; unless it maps to
    a run_attack size flag the launcher must exit cleanly (not KeyError
    inside cell_command)."""
    with pytest.raises(SystemExit, match="unknown norm"):
        launch_grid.main([
            "--norms", "maxphon", "--grid", '{"maxphon": [15.0]}', "--dry_run",
        ])


def test_failed_cell_is_requeued_then_reported(tmp_path):
    """A cell whose process exits nonzero re-enters the queue up to
    --retries times (SLURM --requeue), and the grid exits 1 with every
    attempt recorded in grid_jobs.json."""
    rc = launch_grid.main([
        "--norms", "linf", "--save_root", str(tmp_path), "--retries", "1",
        "--bogus_flag_that_run_attack_rejects",
    ])
    assert rc == 1
    record = json.load(open(tmp_path / "grid_jobs.json"))
    assert len(record) == 1  # linf default grid is a single cell
    assert record[0]["attempts"] == 2  # initial + 1 requeue
    assert len(record[0]["returncodes"]) == 2
    assert all(c != 0 for c in record[0]["returncodes"])
    # each attempt's console output is captured
    logs = os.listdir(tmp_path / "grid_logs")
    assert sorted(logs) == [
        "linf_0.0001_attempt0.log", "linf_0.0001_attempt1.log",
    ]


@pytest.mark.slow  # two full run_attack child processes (tiny, CPU)
def test_two_cell_grid_end_to_end(tmp_path):
    """A real 2-cell linf grid: both cells run the FULL attack as
    separate OS processes and land finished per-cell results.json in the
    standard run dirs (the reference sbatch cell = full main run)."""
    rc = launch_grid.main([
        "--norms", "linf",
        "--grid", json.dumps({"linf": [1e-4, 2e-4]}),
        "--save_root", str(tmp_path), "--max_concurrent", "2",
        "--platform", "cpu", "--dataset", "synthetic", "--small_data",
        "--num_epochs", "1", "--batch_size", "2", "--model", "wav2vec2-tiny",
        "--synthetic_samples", "6", "--num_items_to_inspect", "1",
    ])
    assert rc == 0
    record = json.load(open(tmp_path / "grid_jobs.json"))
    assert [r["returncodes"] for r in record] == [[0], [0]]
    for size in ("0.0001", "0.0002"):
        results = json.load(open(
            tmp_path / "untargeted" / "synthetic"
            / f"linf_{size}_untargeted_adam" / "results.json"))
        assert results["finished_training"] is True
