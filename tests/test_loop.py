"""End-to-end loop tests on CPU: run_attack produces artifacts, resumes,
early-stops, and the untargeted attack beats the clean baseline.

One representative end-to-end run stays in the default suite; the
resume/early-stop/targeted variants are marked ``slow`` (each is a full
attack run whose XLA compile dominates on CPU).
"""

import json
import os

import numpy as np
import pytest

from paa_tpu.cli import parser as parser_lib, run_attack as cli
from paa_tpu.config import AttackConfig, ConstraintParams
from paa_tpu.data import datasets, pipeline as pipeline_lib
from paa_tpu.models import wav2vec2
from paa_tpu.train import loop


@pytest.fixture(scope="module")
def bundle():
    mcfg = wav2vec2.get_config("wav2vec2-tiny")
    params = wav2vec2.init_params(mcfg, example_len=4000)
    model = wav2vec2.Wav2Vec2ForCTC(mcfg)
    apply_fn = lambda prm, audio: model.apply({"params": prm}, audio)
    samples = datasets.load_dataset_tuples("synthetic", synthetic_samples=48)
    pipe = pipeline_lib.build_pipeline(samples, seed=5)
    return apply_fn, params, pipe


def _cfg(**kw):
    base = dict(
        norm_type="linf", optimizer_type="pgd", lr=5e-3,
        batch_size=8, num_epochs=2, early_stopping=4, seed=5,
        model_name="wav2vec2-tiny",
    )
    base.update(kw)
    return AttackConfig(**base)


def test_run_attack_end_to_end(tmp_path, bundle):
    apply_fn, params, pipe = bundle
    cfg = _cfg()
    cparams = ConstraintParams.create(linf_size=0.02)
    res = loop.run_attack(
        cfg, apply_fn, params, pipe, str(tmp_path), cparams=cparams,
        num_items_to_inspect=2,
    )
    # untargeted: perturbed test CTC above clean
    assert res.test_perturbed.ctc > res.test_clean.ctc
    assert res.best_epoch >= 0
    # artifact bundle exists
    for f in [
        "results.json", "perturbation.npy", "perturbation.wav",
        "perturbation_5x.wav", "attack_state.msgpack",
    ]:
        assert os.path.exists(tmp_path / f), f
    results = json.loads((tmp_path / "results.json").read_text())
    assert results["finished_training"] is True
    assert "perturbation_efficiency" in results
    assert results["perturbation_efficiency"]["ctc"] > 1.0
    # inspection triple
    sample_dirs = [d for d in os.listdir(tmp_path) if "sample_" in d]
    assert sample_dirs
    # machine-readable metric stream: one JSON line per epoch
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert len(lines) == 2
    assert lines[1]["epoch"] == 1
    for k in ("train_ctc", "eval_pert_wer", "step_time_ms", "lr"):
        assert k in lines[0]


@pytest.mark.slow
def test_resume_continues(tmp_path, bundle):
    apply_fn, params, pipe = bundle
    cfg = _cfg(num_epochs=1)
    cparams = ConstraintParams.create(linf_size=0.02)
    loop.run_attack(cfg, apply_fn, params, pipe, str(tmp_path), cparams=cparams,
                    num_items_to_inspect=0)
    p_after_1 = np.load(tmp_path / "perturbation.npy")

    cfg2 = _cfg(num_epochs=2)
    res = loop.run_attack(cfg2, apply_fn, params, pipe, str(tmp_path),
                          cparams=cparams, num_items_to_inspect=0, resume=True)
    # epoch 0 was not re-run; history holds both epochs
    assert len(res.history["train_ctc"]) == 2


@pytest.mark.slow
def test_resume_is_exact(tmp_path, bundle):
    """1 epoch + resumed 2 more == 3 uninterrupted epochs, bit-for-bit:
    state is fully checkpointed and shuffle order is (seed, epoch)-pure."""
    apply_fn, params, pipe = bundle
    cparams = ConstraintParams.create(linf_size=0.05)
    kw = dict(cparams=cparams, num_items_to_inspect=0)

    d1 = tmp_path / "straight"
    res_straight = loop.run_attack(
        _cfg(num_epochs=3, early_stopping=99), apply_fn, params, pipe, str(d1), **kw
    )

    d2 = tmp_path / "resumed"
    loop.run_attack(_cfg(num_epochs=1, early_stopping=99), apply_fn, params, pipe, str(d2), **kw)
    res_resumed = loop.run_attack(
        _cfg(num_epochs=3, early_stopping=99), apply_fn, params, pipe, str(d2),
        resume=True, **kw,
    )
    np.testing.assert_array_equal(res_straight.perturbation, res_resumed.perturbation)
    np.testing.assert_allclose(
        res_straight.history["train_ctc"], res_resumed.history["train_ctc"], rtol=1e-6
    )


@pytest.mark.slow
def test_early_stopping(tmp_path, bundle):
    apply_fn, params, pipe = bundle
    # lr=0: no improvement possible after epoch 0 -> stops after patience
    cfg = _cfg(lr=0.0, num_epochs=10, early_stopping=2)
    res = loop.run_attack(
        cfg, apply_fn, params, pipe, str(tmp_path),
        cparams=ConstraintParams.create(linf_size=0.02), num_items_to_inspect=0,
    )
    assert len(res.history["train_ctc"]) <= 4  # 0 + patience, not 10


def test_targeted_labels_infeasible_raises(bundle):
    """An oversized --target_reps cannot fit any CTC alignment in the
    encoder's frame count: raise an actionable error instead of feeding
    inf/degenerate losses to every step."""
    _, _, pipe = bundle
    cfg = _cfg(attack_mode="targeted", target="delete", target_reps=100)
    with pytest.raises(ValueError, match="target_reps"):
        loop._targeted_labels(cfg, 8, 16, audio_len=pipe.audio_len)


@pytest.mark.slow
def test_targeted_mode_runs(tmp_path, bundle):
    """target_reps=8 needs more label slots than the corpus allocated —
    the targeted label grid must widen, not error (the reference has no
    such coupling; src/core/loss_helpers.py:14-20)."""
    apply_fn, params, pipe = bundle
    cfg = _cfg(attack_mode="targeted", target="delete", target_reps=8, num_epochs=1)
    res = loop.run_attack(
        cfg, apply_fn, params, pipe, str(tmp_path),
        cparams=ConstraintParams.create(linf_size=0.02), num_items_to_inspect=0,
    )
    assert np.isfinite(res.test_perturbed.ctc)


@pytest.mark.slow
def test_inspection_beyond_one_batch(tmp_path):
    """num_items_to_inspect may exceed batch_size: inspection chunks over
    extra eval batches (the reference samples the test set freely,
    save.py:59)."""
    mcfg = wav2vec2.get_config("wav2vec2-tiny")
    params = wav2vec2.init_params(mcfg, example_len=4000)
    model = wav2vec2.Wav2Vec2ForCTC(mcfg)
    apply_fn = lambda prm, audio: model.apply({"params": prm}, audio)
    samples = datasets.load_dataset_tuples("synthetic", synthetic_samples=320)
    pipe = pipeline_lib.build_pipeline(samples, seed=5)
    assert len(pipe.test) >= 20
    runner = loop.AttackRunner(
        _cfg(), apply_fn, params, pipe,
        cparams=ConstraintParams.create(linf_size=0.02), use_mesh=False,
    )
    import jax.numpy as jnp

    out = runner.inspect_samples(jnp.zeros((1, pipe.audio_len), jnp.float32), 20)
    assert len(out) == 20


def test_cli_parser_round_trip():
    p = parser_lib.create_arg_parser()
    args = p.parse_args(
        ["--norm_type", "snr", "--snr_db", "42", "--attack_mode", "targeted",
         "--optimizer_type", "pgd", "--model", "wav2vec2-tiny"]
    )
    cfg = parser_lib.config_from_args(args)
    assert cfg.norm_type == "snr" and cfg.attack_mode == "targeted"
    cp = parser_lib.constraint_params_from_args(args)
    assert float(cp.snr_db) == 42.0
    # every reference flag name still parses (parser.py:6-69)
    ref_flags = [
        "--batch_size", "1", "--lr", "1e-4", "--early_stopping", "4",
        "--num_epochs", "5", "--gamma", "0.9", "--step_size", "2",
        "--dataset", "LibreeSpeech", "--resume_from", "x.npy",
        "--target_reps", "5", "--target", "delete",
        "--fm_epsilon", "2", "--l2_size", "0.05", "--linf_size", "1e-4",
        "--snr_db", "64", "--min_freq_attack", "120",
        "--max_freq_attack", "20000", "--tv_epsilon", "1e-3",
        "--max_phon_level", "20", "--phon_reference_db", "65",
        "--sr", "16000", "--n_fft", "1024", "--hop_length", "256",
        "--win_length", "1024", "--relative_audio_length", "0.8",
        "--seed", "5", "--small_data", "--num_items_to_inspect", "12",
    ]
    p.parse_args(ref_flags)


def test_checkpoint_history_drift_tolerated(tmp_path):
    """A checkpoint written before a history series existed (e.g. the
    targeted emission metrics added after a long run started) still
    loads: the missing series NaN-backfills to the surviving length,
    series the template dropped disappear."""
    from paa_tpu.train import checkpoint

    old = {
        "p": np.zeros((1, 4), np.float32), "epoch": 2,
        "history": {"train_ctc": np.asarray([1.0, 2.0, 3.0]),
                    "legacy_series": np.asarray([9.0, 9.0, 9.0])},
    }
    path = os.path.join(tmp_path, "attack_state.msgpack")
    checkpoint.save_checkpoint(path, old)
    template = {
        "p": np.zeros((1, 4), np.float32), "epoch": 0,
        "history": {"train_ctc": np.zeros((0,), np.float64),
                    "eval_emission_rate": np.zeros((0,), np.float64)},
    }
    state = checkpoint.load_checkpoint(path, template)
    assert int(state["epoch"]) == 2
    np.testing.assert_array_equal(state["history"]["train_ctc"], [1.0, 2.0, 3.0])
    assert "legacy_series" not in state["history"]
    em = np.asarray(state["history"]["eval_emission_rate"])
    assert em.shape == (3,) and np.all(np.isnan(em))
