"""Sweep driver + aggregator tests (X1 replacement, SURVEY.md §2.3).

Runs the in-process sweep CLI path end-to-end on the 8-device virtual
CPU mesh with a tiny model + synthetic data, then aggregates the per-cell
results.json files the way `python -m paa_tpu.cli.aggregate` does.
Sweep cells are FULL attack runs (per-epoch eval, best-p tracking,
per-cell early stop, checkpoint/resume), so a one-cell sweep must
reproduce the single-run loop's result for the same epsilon.
"""

import json
import os

import numpy as np
import pytest

from paa_tpu.cli import aggregate, sweep

pytestmark = pytest.mark.slow  # every test here runs full attack loops


def _sweep_args(save_root, **kw):
    parser = sweep.create_sweep_parser()
    defaults = {
        "dataset": "synthetic",
        "synthetic_samples": 48,
        "model": "wav2vec2-tiny",
        "batch_size": 8,
        "num_epochs": 1,
        "optimizer_type": "pgd",
        "lr": 5e-3,
        "save_root": str(save_root),
        "norms": "linf,l2",
        "grid": json.dumps({"linf": [1e-3, 1e-2], "l2": [0.5]}),
    }
    defaults.update(kw)
    argv = []
    for k, v in defaults.items():
        if isinstance(v, bool):  # store_true flags take no value
            if v:
                argv.append(f"--{k}")
        else:
            argv += [f"--{k}", str(v)]
    return parser.parse_args(argv)


@pytest.fixture(scope="module")
def sweep_summary(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("sweep")
    args = _sweep_args(tmp_path, cell_artifacts=True, num_items_to_inspect=2)
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
            assert os.path.exists(os.path.join(cell["dir"], "metrics.jsonl"))
            assert np.isfinite(cell["final_ctc"])
            # full-run cells: per-cell eval WER + test metrics recorded
            assert np.isfinite(cell["test_pert_wer"])
            assert np.isfinite(cell["best_eval_pert_ctc"])
            assert cell["best_epoch"] >= 0


def test_sweep_cell_artifacts_full_bundle(sweep_summary):
    """--cell_artifacts: every cell gets the full standalone-run bundle —
    loss plots and at least one inspected sample triple (reference: each
    SLURM cell runs full main and emits save.py:49-199's artifacts)."""
    root, summary = sweep_summary
    for norm, entry in summary.items():
        for cell in entry["cells"]:
            assert os.path.exists(os.path.join(cell["dir"], "loss_plot_ctc.png"))
            assert os.path.exists(os.path.join(cell["dir"], "loss_plot_wer.png"))
            sample_dirs = [
                d for d in os.listdir(cell["dir"])
                if d.startswith(("sample_", "sus_sample_"))
            ]
            assert sample_dirs, f"no inspected samples in {cell['dir']}"
            d0 = os.path.join(cell["dir"], sorted(sample_dirs)[0])
            assert os.path.exists(os.path.join(d0, "clean.wav"))
            assert os.path.exists(os.path.join(d0, "perturbed.wav"))


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


def test_aggregate_renders_close_sizes_distinctly():
    """Sub-milli epsilons must stay distinguishable in the table: fixed
    .3f formatting printed linf 1e-4 and 3e-4 both as '0.000'
    (round-4 verdict). The size column uses %g."""
    base = {
        "run": "x", "attack_mode": "untargeted", "dataset": "synthetic",
        "optimizer": "pgd", "norm_type": "linf", "finished": True,
        "clean_ctc": 1.0, "clean_wer": 1.0, "pert_ctc": 2.0, "pert_wer": 1.0,
        "efficiency_ctc": 2.0, "steps_per_sec": None, "error": None,
    }
    rows = [dict(base, attack_size=1e-4), dict(base, attack_size=3e-4)]
    table = aggregate.render(rows)
    assert "0.0001" in table and "0.0003" in table
    assert "0.000 " not in table


def test_one_cell_sweep_matches_run_attack(tmp_path):
    """A 1-cell sweep is the reference's single SLURM job: it must
    reproduce loop.run_attack's result for the same epsilon (reference:
    submit_scan_range.py:52-66 running run_attack.py:61-183 per cell)."""
    from paa_tpu.cli import run_attack as cli
    from paa_tpu.cli.parser import config_from_args, constraint_params_from_args
    from paa_tpu.config import with_sweep_value
    from paa_tpu.data import datasets, pipeline as pipeline_lib
    from paa_tpu.train import loop

    eps = 0.02
    # float32 forward: under bfloat16 the vmapped cell and the plain step
    # lower to differently-laid-out matmuls whose rounding differences
    # Adam then amplifies — the parity claim is about semantics, not
    # bf16 rounding
    args = _sweep_args(
        tmp_path / "sweep", norms="linf", grid=json.dumps({"linf": [eps]}),
        num_epochs=2, optimizer_type="adam", lr=5e-3, compute_dtype="float32",
    )
    summary = sweep.run_sweep(args)
    cell = summary["linf"]["cells"][0]

    cfg = config_from_args(args).replace(norm_type="linf")
    cparams = with_sweep_value(constraint_params_from_args(args), "linf", eps)
    samples = datasets.load_dataset_tuples(
        "synthetic", seed=args.seed, synthetic_samples=args.synthetic_samples
    )
    pipe = pipeline_lib.build_pipeline(samples, seed=args.seed)
    _, params, apply_fn = cli.load_model_bundle(args)
    res = loop.run_attack(
        cfg, apply_fn, params, pipe, str(tmp_path / "single"),
        cparams=cparams, num_items_to_inspect=0, resume=False,
    )

    # same best epoch, same perturbation (up to cross-program numerics)
    assert cell["best_epoch"] == res.best_epoch
    p_sweep = np.load(os.path.join(cell["dir"], "perturbation.npy"))
    np.testing.assert_allclose(
        p_sweep, res.perturbation, rtol=2e-3, atol=1e-6
    )
    # results.json parity on the final test metrics
    r = json.loads(open(os.path.join(cell["dir"], "results.json")).read())
    assert r["finished_training"] is True
    np.testing.assert_allclose(
        r["final_test_perturbed"]["ctc"], res.test_perturbed.ctc, rtol=1e-3
    )
    np.testing.assert_allclose(
        r["final_test_clean"]["ctc"], res.test_clean.ctc, rtol=1e-3
    )


def _preempt_after_epochs(args):
    """Run a sweep that dies at finalize (i.e. after its last epoch's
    checkpoint) — a faithful stand-in for SLURM preemption mid-sweep."""
    from paa_tpu.train import artifacts

    def boom(*a, **k):
        raise RuntimeError("preempted")

    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(artifacts, "save_epoch_bundle", boom)
        with pytest.raises(RuntimeError, match="preempted"):
            sweep.run_sweep(args)


def test_sweep_resume_is_exact(tmp_path):
    """1 epoch + preemption + resumed 1 more == 2 uninterrupted epochs:
    sweep state is fully checkpointed and batch order is (seed,
    epoch)-pure — the replacement for SLURM requeue-resume
    (submit_scan_range.py:58)."""
    grid = json.dumps({"linf": [5e-3]})
    kw = dict(norms="linf", grid=grid, early_stopping=99)

    s1 = sweep.run_sweep(_sweep_args(tmp_path / "straight", num_epochs=2, **kw))
    # a COMPLETED norm KEEPS its checkpoint: a requeued multi-norm sweep
    # must resume it straight to finalize instead of retraining (the
    # fingerprint guard covers the stale-config case)
    assert os.path.exists(tmp_path / "straight" / "sweep_state_linf.msgpack")

    _preempt_after_epochs(_sweep_args(tmp_path / "resumed", num_epochs=1, **kw))
    assert os.path.exists(tmp_path / "resumed" / "sweep_state_linf.msgpack")
    s2 = sweep.run_sweep(_sweep_args(tmp_path / "resumed", num_epochs=2, **kw))

    d1 = s1["linf"]["cells"][0]["dir"]
    d2 = s2["linf"]["cells"][0]["dir"]
    np.testing.assert_array_equal(
        np.load(os.path.join(d1, "perturbation.npy")),
        np.load(os.path.join(d2, "perturbation.npy")),
    )
    # resumed metrics stream covers both epochs, no duplicates
    lines = [json.loads(l) for l in open(os.path.join(d2, "metrics.jsonl"))]
    assert [l["epoch"] for l in lines] == [0, 1]

    # re-running the FINISHED sweep (same config, kept checkpoint — the
    # multi-norm requeue case) resumes past its last epoch and goes
    # straight to finalize: no retraining, identical outputs
    metrics_before = open(os.path.join(d1, "metrics.jsonl")).read()
    p_before = np.load(os.path.join(d1, "perturbation.npy"))
    s3 = sweep.run_sweep(_sweep_args(tmp_path / "straight", num_epochs=2, **kw))
    assert open(os.path.join(d1, "metrics.jsonl")).read() == metrics_before
    np.testing.assert_array_equal(
        p_before, np.load(os.path.join(d1, "perturbation.npy"))
    )
    assert s3["linf"]["n_cell_steps"] == 0  # not one training step re-run
    # the finalize-only rerun must NOT overwrite the recorded throughput
    # with 0.0 (n_cell_steps==0 -> None, and save_json_results keeps the
    # original value for None keys)
    r = json.loads(open(os.path.join(d1, "results.json")).read())
    assert r.get("sweep_steps_per_sec") not in (0, 0.0)


def test_sweep_drops_frozen_cells_and_counts_active_steps(tmp_path):
    """Late-sweep compute drop + honest throughput accounting.

    A cell with linf ε=0 is projected to the zero perturbation every
    step, so its eval score equals the clean score forever: it improves
    once (epoch 0, from the -inf sentinel) then early-stops after
    ``early_stopping`` flat epochs — deterministically. Once it freezes,
    the sweep must (a) rebuild the train program over the surviving
    cell(s) instead of paying S forward/backwards per batch, and
    (b) count only ACTIVE cells in cell-steps/sec."""
    args = _sweep_args(
        tmp_path, norms="linf", grid=json.dumps({"linf": [0.0, 1e-2]}),
        num_epochs=6, early_stopping=2,
    )
    summary = sweep.run_sweep(args)
    entry = summary["linf"]
    cells = entry["cells"]

    # the ε=0 cell stopped after exactly 1 + early_stopping live epochs
    dead = [c for c in cells if c["size"] == 0.0][0]
    lines = open(os.path.join(dead["dir"], "metrics.jsonl")).read().splitlines()
    assert len(lines) == 3  # epochs 0, 1, 2 — then frozen
    assert dead["best_epoch"] == 0
    p_dead = np.load(os.path.join(dead["dir"], "perturbation.npy"))
    assert np.all(p_dead == 0)

    # a 1-cell program was compiled (the drop engaged)...
    assert 1 in entry["programs_built"] and 2 in entry["programs_built"]

    # ...and n_cell_steps equals batches/epoch × Σ per-cell live epochs
    # (each live epoch of a cell leaves exactly one metrics line)
    from paa_tpu.data import datasets, pipeline as pipeline_lib

    samples = datasets.load_dataset_tuples(
        "synthetic", seed=args.seed, synthetic_samples=args.synthetic_samples
    )
    pipe = pipeline_lib.build_pipeline(samples, seed=args.seed)
    n_batches = -(-len(pipe.train) // args.batch_size)
    per_cell_lines = [
        len(open(os.path.join(c["dir"], "metrics.jsonl")).read().splitlines())
        for c in cells
    ]
    assert entry["n_cell_steps"] == n_batches * sum(per_cell_lines)
    # strictly fewer than the naive all-epochs × all-cells count
    assert entry["n_cell_steps"] < n_batches * max(per_cell_lines) * len(cells)


def test_sweep_resume_refuses_changed_config(tmp_path):
    """A leftover checkpoint from a DIFFERENT configuration (grid/lr/seed
    changed under the same save_root) must not be silently resumed —
    results would be labeled with the new epsilons but computed from
    stale state."""
    kw = dict(norms="linf", early_stopping=99, num_epochs=1)
    _preempt_after_epochs(
        _sweep_args(tmp_path, grid=json.dumps({"linf": [5e-3]}), **kw),
    )
    # same cell count, different epsilon → refuse
    with pytest.raises(RuntimeError, match="different configuration"):
        sweep.run_sweep(
            _sweep_args(tmp_path, grid=json.dumps({"linf": [1e-3]}), **kw)
        )
    # --no_resume discards the stale state and starts fresh
    args = _sweep_args(
        tmp_path, grid=json.dumps({"linf": [1e-3]}), no_resume=True, **kw
    )
    summary = sweep.run_sweep(args)
    assert summary["linf"]["cells"][0]["size"] == 1e-3


def test_sweep_identical_with_device_cache(tmp_path):
    """The sweep's batch feed honors cfg.cache_data_on_device: forcing the
    on-device gather feed reproduces the host-feed sweep bit-for-bit
    (same per-cell final/best metrics)."""
    outs = []
    for flag in ("no_device_cache", "device_cache"):
        root = tmp_path / flag
        args = _sweep_args(
            root, norms="linf", grid=json.dumps({"linf": [1e-3, 1e-2]}),
            **{flag: True},
        )
        outs.append(sweep.run_sweep(args))
    off, on = outs
    for c_off, c_on in zip(off["linf"]["cells"], on["linf"]["cells"]):
        assert c_off["size"] == c_on["size"]
        assert c_off["final_ctc"] == c_on["final_ctc"]
        assert c_off["best_eval_pert_ctc"] == c_on["best_eval_pert_ctc"]
        assert c_off["test_pert_wer"] == c_on["test_pert_wer"]


def test_mux_sweep_drops_frozen_cells_immediately(tmp_path):
    """With the host-multiplexed form (sweep axis 1 — here S=6 on 8
    devices, since 8 % 6 != 0), the same compiled single-cell program
    serves any cell count, so frozen cells must drop from device state
    the moment they freeze (no ≤ half hysteresis) — each frozen cell
    would otherwise pay a full discarded fwd+bwd dispatch per batch."""
    args = _sweep_args(
        tmp_path, norms="linf",
        grid=json.dumps({"linf": [0.0, 1e-2, 2e-2, 3e-2, 4e-2, 5e-2]}),
        num_epochs=5, early_stopping=2,
    )
    summary = sweep.run_sweep(args)
    entry = summary["linf"]

    # the eps=0 cell freezes after 1 + early_stopping epochs; n_live=5 >
    # 6//2 would NOT trip the vmapped hysteresis — the mux form (both 6
    # and 5 resolve to sweep axis 1) must still drop to a 5-cell state
    assert 5 in entry["programs_built"], entry["programs_built"]
    dead = [c for c in entry["cells"] if c["size"] == 0.0]
    assert len(dead) == 1
    lines = open(os.path.join(dead[0]["dir"], "metrics.jsonl")).read().splitlines()
    assert len(lines) == 3  # epochs 0-2, then frozen


def test_should_drop_policy():
    """Unit pin of the drop decision: immediate for mux→mux transitions
    (single chip: always; non-dividing counts otherwise), ≤ half
    hysteresis when a vmapped rebuild would be required."""
    # single chip: every count is the mux form — drop the moment any
    # cell freezes
    assert sweep._should_drop(4, 5, 1)
    assert sweep._should_drop(2, 3, 1)
    # 8 devices: 6→5 stays mux (neither divides 8) — immediate
    assert sweep._should_drop(5, 6, 8)
    # 8 devices: 5→4 would switch to the vmapped 4-cell sharded form —
    # wait for the hysteresis (4 > 5//2)
    assert not sweep._should_drop(4, 5, 8)
    assert sweep._should_drop(2, 5, 8)  # 2 <= 5//2
    # vmapped→vmapped: hysteresis only
    assert not sweep._should_drop(3, 4, 8)  # wait: 3 > 4//2 (ns 4→1... )
    assert sweep._should_drop(2, 4, 8)
    # no live cells / nothing frozen: never drop
    assert not sweep._should_drop(0, 4, 8)
    assert not sweep._should_drop(4, 4, 8)
