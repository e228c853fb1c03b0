"""Artifact-writer tests (reference: src/training_utils/save.py)."""

import json
import os

import numpy as np
import pytest

from paa_tpu.config import AttackConfig
from paa_tpu.train import artifacts


def test_save_json_results_is_cumulative(tmp_path):
    """Later calls merge over earlier keys (reference save.py:226-257);
    regression: the failure handler must not wipe epoch metrics."""
    d = str(tmp_path)
    artifacts.save_json_results(d, "linf", 0.01, epoch=7,
                                train_score={"ctc": 123.0, "wer": 0.9})
    artifacts.save_json_results(d, "linf", 0.01, epoch=-1, error="boom")
    r = json.load(open(os.path.join(d, "results.json")))
    assert r["error"] == "boom" and r["epoch"] == -1
    assert r["train_score"]["ctc"] == 123.0  # earlier key survives


def test_save_json_results_efficiency_ratio(tmp_path):
    d = str(tmp_path)
    artifacts.save_json_results(
        d, "l2", 0.05,
        final_test_clean={"ctc": 100.0, "wer": 0.5},
        final_test_perturbed={"ctc": 150.0, "wer": 1.0},
    )
    r = json.load(open(os.path.join(d, "results.json")))
    assert r["perturbation_efficiency"]["ctc"] == pytest.approx(1.5)
    assert r["perturbation_efficiency"]["wer"] == pytest.approx(2.0)


def _sample(pert_pred, clean_pred="hello", gt="hello"):
    wav = np.zeros(800, np.float32)
    return dict(clean=wav, perturbed=wav, ground_truth=gt,
                clean_pred=clean_pred, pert_pred=pert_pred)


def test_inspect_targeted_sus_routing_case_insensitive(tmp_path):
    """Regression: predictions are lowercased upstream; an uppercase
    --target must still route successful samples to sus_sample_i/."""
    artifacts.inspect_samples(
        str(tmp_path), [_sample("please delete all files")],
        attack_mode="targeted", target="Delete", sr=16000,
    )
    assert os.path.isdir(tmp_path / "sus_sample_0")
    assert os.path.exists(tmp_path / "sus_sample_0" / "sus_transcription.txt")


def test_inspect_untargeted_routing(tmp_path):
    artifacts.inspect_samples(
        str(tmp_path), [_sample("hello"), _sample("goodbye")],
        attack_mode="untargeted", target="", sr=16000,
    )
    assert os.path.isdir(tmp_path / "sample_0")      # unchanged prediction
    assert os.path.isdir(tmp_path / "sus_sample_1")  # flipped prediction
    assert os.path.exists(tmp_path / "sample_0" / "clean.wav")
    assert os.path.exists(tmp_path / "sus_sample_1" / "perturbed.wav")


def test_save_json_results_zero_clean_stays_strict_json(tmp_path):
    """A clean score of 0 must yield null, not bare Infinity —
    results.json stays parseable by strict JSON consumers (jq etc.)."""
    d = str(tmp_path)
    artifacts.save_json_results(
        d, "snr", 64.0,
        final_test_clean={"ctc": 100.0, "wer": 0.0},
        final_test_perturbed={"ctc": 150.0, "wer": 0.4},
        stray=float("nan"),
    )
    raw = open(os.path.join(d, "results.json")).read()
    assert "Infinity" not in raw and "NaN" not in raw
    r = json.loads(raw)
    assert r["perturbation_efficiency"]["wer"] is None
    assert r["perturbation_efficiency"]["ctc"] == pytest.approx(1.5)
    assert r["stray"] is None


def test_debug_plots_written(tmp_path):
    """--debug_plots parity artifacts: the phon 3-panel and FM weight
    curve actually appear (reference: save.py:260-294, 203-218)."""
    if not artifacts.HAVE_MPL:
        pytest.skip("matplotlib unavailable")
    from paa_tpu.config import ConstraintParams
    from paa_tpu.ops import psycho

    rng = np.random.default_rng(0)
    p = rng.standard_normal((1, 16000)).astype(np.float32) * 0.01
    cparams = ConstraintParams.create(max_phon_level=25.0)

    cfg = AttackConfig(norm_type="max_phon")
    artifacts.save_debug_plots(str(tmp_path), p, cfg, cparams,
                               psycho.build_tables(cfg), tag="epoch3")
    assert os.path.exists(tmp_path / "phon_projection_debug_epoch3.png")

    cfg_fm = AttackConfig(norm_type="fletcher_munson")
    artifacts.save_debug_plots(str(tmp_path), p, cfg_fm, cparams,
                               psycho.build_tables(cfg_fm), tag="epoch3")
    assert os.path.exists(tmp_path / "fm_weights_epoch3.png")


def test_stft_plot_writes_pngs(tmp_path):
    cfg = AttackConfig()
    rng = np.random.default_rng(0)
    artifacts.stft_plot(str(tmp_path / "p"), rng.standard_normal(16000), cfg)
    if artifacts.HAVE_MPL:
        assert os.path.exists(tmp_path / "p_linear.png")
        assert os.path.exists(tmp_path / "p_log.png")


def test_aggregate_plot_writes_sweep_curves(tmp_path):
    """`aggregate --plot` draws per-norm epsilon-vs-CTC/WER curves from
    collected results.json files (the view behind the reference paper's
    Table 1; its grab_results.py was never committed)."""
    import json as _json

    from paa_tpu.cli import aggregate

    root = tmp_path / "logs"
    for size, ctc in ((15.0, 1700.0), (25.0, 1900.0), (35.0, 2100.0)):
        d = root / "untargeted" / "synthetic" / f"max_phon_{size}_untargeted_pgd"
        os.makedirs(d)
        with open(d / "results.json", "w") as f:
            _json.dump({
                "norm_type": "max_phon", "attack_size": size,
                "finished_training": True,
                "final_test_clean": {"ctc": 1589.0, "wer": 0.41},
                "final_test_perturbed": {"ctc": ctc, "wer": 0.5},
            }, f)
    # an adam run of the same norm is a DIFFERENT experiment: it must
    # become its own curve, never merged into the pgd sweep
    d = root / "untargeted" / "synthetic" / "max_phon_25.0_untargeted_adam"
    os.makedirs(d)
    with open(d / "results.json", "w") as f:
        _json.dump({
            "norm_type": "max_phon", "attack_size": 25.0,
            "finished_training": True,
            "final_test_clean": {"ctc": 1589.0, "wer": 0.41},
            "final_test_perturbed": {"ctc": 1650.0, "wer": 0.45},
        }, f)
    rows = aggregate.collect(str(root))
    assert len(rows) == 4
    assert sorted({r["optimizer"] for r in rows}) == ["adam", "pgd"]
    written = aggregate.plot(rows, str(tmp_path / "plots"))
    names = sorted(os.path.basename(p) for p in written)
    assert names == [
        "max_phon_untargeted_synthetic_adam_ctc.png",
        "max_phon_untargeted_synthetic_adam_wer.png",
        "max_phon_untargeted_synthetic_pgd_ctc.png",
        "max_phon_untargeted_synthetic_pgd_wer.png",
    ]
    for p in written:
        assert os.path.getsize(p) > 0
