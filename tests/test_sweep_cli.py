"""Sweep driver + aggregator tests (X1 replacement, SURVEY.md §2.3).

Runs the in-process sweep CLI path end-to-end on the 8-device virtual
CPU mesh with a tiny model + synthetic data, then aggregates the per-cell
results.json files the way `python -m paa_tpu.cli.aggregate` does.
"""

import json
import os

import numpy as np
import pytest

from paa_tpu.cli import aggregate, sweep


def _sweep_args(tmp_path, **kw):
    parser = sweep.create_sweep_parser()
    argv = [
        "--dataset", "synthetic",
        "--synthetic_samples", "48",
        "--model", "wav2vec2-tiny",
        "--batch_size", "8",
        "--num_epochs", "1",
        "--optimizer_type", "pgd",
        "--lr", "5e-3",
        "--save_root", str(tmp_path),
        "--norms", "linf,l2",
        "--grid", json.dumps({"linf": [1e-3, 1e-2], "l2": [0.5]}),
    ]
    for k, v in kw.items():
        argv += [f"--{k}", str(v)]
    return parser.parse_args(argv)


@pytest.fixture(scope="module")
def sweep_summary(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("sweep")
    args = _sweep_args(tmp_path)
    summary = sweep.run_sweep(args)
    return tmp_path, summary


def test_sweep_writes_summary_and_cells(sweep_summary):
    root, summary = sweep_summary
    assert set(summary) == {"linf", "l2"}
    assert len(summary["linf"]["cells"]) == 2
    assert len(summary["l2"]["cells"]) == 1
    assert os.path.exists(os.path.join(root, "sweep_results.json"))
    for norm, entry in summary.items():
        for cell in entry["cells"]:
            assert os.path.exists(os.path.join(cell["dir"], "results.json"))
            assert os.path.exists(os.path.join(cell["dir"], "perturbation.npy"))
            assert np.isfinite(cell["final_ctc"])


def test_sweep_cells_satisfy_their_epsilons(sweep_summary):
    root, summary = sweep_summary
    for cell in summary["linf"]["cells"]:
        p = np.load(os.path.join(cell["dir"], "perturbation.npy"))
        assert np.abs(p).max() <= cell["size"] * (1 + 1e-5)


def test_aggregate_collects_sweep_results(sweep_summary):
    root, summary = sweep_summary
    rows = aggregate.collect(str(root))
    assert len(rows) == 3  # 2 linf cells + 1 l2 cell
    norms = sorted(r["norm_type"] for r in rows)
    assert norms == ["l2", "linf", "linf"]
    table = aggregate.render(rows)
    assert "linf" in table and "l2" in table
    # every row has finite perturbed-eval CTC
    for r in rows:
        assert r["pert_ctc"] is not None and np.isfinite(r["pert_ctc"])
