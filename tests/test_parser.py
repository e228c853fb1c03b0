"""CLI flag resolution (cli/parser.py).

Pins the tri-state performance flags: out-of-the-box runs must land on
the measured-fastest config per backend (docs/PERF.md) while explicit
flags always win; and the device-cache tri-state reaches AttackConfig
unchanged. Reference flag surface: src/training_utils/parser.py:6-69.
"""

import jax

from paa_tpu.cli import parser as parser_lib


def _args(*argv):
    return parser_lib.create_arg_parser().parse_args(list(argv))


def test_perf_defaults_off_tpu():
    """On this (CPU) backend the auto defaults resolve to remat off /
    full policy / no Pallas FM."""
    assert jax.default_backend() == "cpu"
    remat, policy, pallas_fm = parser_lib.resolve_perf_defaults(_args())
    assert remat is False and policy == "full" and pallas_fm is False


def test_perf_flags_explicit_win():
    remat, policy, pallas_fm = parser_lib.resolve_perf_defaults(
        _args("--remat", "--remat_policy", "save_resid", "--use_pallas_fm")
    )
    assert remat is True and policy == "save_resid" and pallas_fm is True
    # the force-off twins beat everything
    remat, policy, pallas_fm = parser_lib.resolve_perf_defaults(
        _args("--remat", "--no_remat", "--use_pallas_fm", "--no_pallas_fm")
    )
    assert remat is False and pallas_fm is False


def test_device_cache_tristate_reaches_config():
    assert parser_lib.config_from_args(_args()).cache_data_on_device is None
    assert (
        parser_lib.config_from_args(_args("--device_cache")).cache_data_on_device
        is True
    )
    assert (
        parser_lib.config_from_args(_args("--no_device_cache")).cache_data_on_device
        is False
    )
    # force-off beats force-on (explicit disable is the safety valve)
    assert (
        parser_lib.config_from_args(
            _args("--device_cache", "--no_device_cache")
        ).cache_data_on_device
        is False
    )


def test_every_reference_flag_still_parses():
    """The reference's full 28-flag surface parses unchanged
    (reference: parser.py:6-69)."""
    args = _args(
        "--batch_size", "64", "--lr", "1e-4", "--early_stopping", "4",
        "--num_epochs", "50", "--optimizer_type", "adam", "--gamma", "0.9",
        "--step_size", "2", "--target_reps", "5", "--target", "delete",
        "--attack_mode", "targeted", "--norm_type", "fletcher_munson",
        "--fm_epsilon", "8.9", "--phon_reference_db", "65", "--sr", "16000",
        "--n_fft", "1024", "--hop_length", "256", "--win_length", "1024",
        "--relative_audio_length", "0.80", "--seed", "5", "--small_data",
        "--num_items_to_inspect", "12",
    )
    cfg = parser_lib.config_from_args(args)
    assert cfg.norm_type == "fletcher_munson" and cfg.attack_mode == "targeted"
