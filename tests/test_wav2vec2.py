"""Wav2Vec2 architecture + converter parity vs the HF torch implementation.

Zero-egress environment: no pretrained downloads. Instead we instantiate
HF's torch ``Wav2Vec2ForCTC`` with *random* weights locally, convert its
state_dict through models/convert.py, and assert logits parity — which
verifies the full architecture (feature extractor, group/layer norms,
weight-normed positional conv, pre/post-LN encoder, CTC head) and the
converter at once. With parity on random weights, parity on the real
checkpoints follows.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from paa_tpu.models import convert, wav2vec2


def _hf_config(cfg: wav2vec2.Wav2Vec2Config):
    from transformers import Wav2Vec2Config as HFConfig

    return HFConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        conv_dim=list(cfg.conv_dim),
        conv_kernel=list(cfg.conv_kernel),
        conv_stride=list(cfg.conv_stride),
        conv_bias=cfg.conv_bias,
        feat_extract_norm=cfg.feat_extract_norm,
        do_stable_layer_norm=cfg.do_stable_layer_norm,
        num_conv_pos_embeddings=cfg.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=cfg.num_conv_pos_embedding_groups,
        layer_norm_eps=cfg.layer_norm_eps,
        hidden_dropout=0.0,
        activation_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        final_dropout=0.0,
        layerdrop=0.0,
        apply_spec_augment=False,
    )


def _parity_case(cfg: wav2vec2.Wav2Vec2Config, seed=0, b=2, t=4000):
    from transformers import Wav2Vec2ForCTC as TorchW2V

    torch.manual_seed(seed)
    torch_model = TorchW2V(_hf_config(cfg)).eval()

    params = convert.convert_hf_state_dict(torch_model.state_dict(), cfg)
    model = wav2vec2.Wav2Vec2ForCTC(cfg)

    rng = np.random.default_rng(seed)
    audio = (rng.standard_normal((b, t)) * 0.1).astype(np.float32)

    with torch.no_grad():
        theirs = torch_model(input_values=torch.from_numpy(audio)).logits.numpy()
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(audio)))
    return ours, theirs


@pytest.mark.parametrize(
    "preset_kw",
    [
        # base-style: group norm, post-LN
        dict(feat_extract_norm="group", do_stable_layer_norm=False, conv_bias=False),
        # large-lv60-style: layer norm, pre-LN, conv bias
        dict(feat_extract_norm="layer", do_stable_layer_norm=True, conv_bias=True),
    ],
    ids=["base-style", "lv60-style"],
)
def test_logits_parity_tiny(preset_kw):
    cfg = wav2vec2.get_config("wav2vec2-tiny", **preset_kw)
    ours, theirs = _parity_case(cfg)
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-4)


def test_feat_extract_output_length():
    cfg = wav2vec2.get_config("wav2vec2-tiny")
    for t in [4000, 16000, 160000]:
        expected = t
        for k, s in zip(cfg.conv_kernel, cfg.conv_stride):
            expected = (expected - k) // s + 1
        assert cfg.feat_extract_output_length(t) == expected


def test_grad_wrt_audio_flows():
    """The attack differentiates the frozen model w.r.t. its input."""
    cfg = wav2vec2.get_config("wav2vec2-tiny")
    params = wav2vec2.init_params(cfg, example_len=2000)
    model = wav2vec2.Wav2Vec2ForCTC(cfg)

    def loss(audio):
        return jnp.sum(model.apply({"params": params}, audio) ** 2)

    g = jax.grad(loss)(jnp.ones((1, 2000), jnp.float32) * 0.01)
    assert g.shape == (1, 2000)
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.abs(g).max()) > 0


def test_bf16_compute_close_to_fp32():
    cfg32 = wav2vec2.get_config("wav2vec2-tiny")
    cfg16 = wav2vec2.get_config("wav2vec2-tiny", compute_dtype="bfloat16")
    params = wav2vec2.init_params(cfg32, example_len=2000)
    audio = jnp.asarray(np.random.default_rng(0).standard_normal((1, 2000)), jnp.float32) * 0.1
    l32 = wav2vec2.Wav2Vec2ForCTC(cfg32).apply({"params": params}, audio)
    l16 = wav2vec2.Wav2Vec2ForCTC(cfg16).apply({"params": params}, audio)
    assert l16.dtype == jnp.float32  # head always fp32
    # bf16 matmuls: loose agreement is expected and sufficient
    assert float(jnp.mean(jnp.abs(l16 - l32))) < 0.1 * float(jnp.mean(jnp.abs(l32)) + 1e-6)


def test_do_normalize_scale_invariance():
    """With do_normalize, logits are invariant to input gain (the HF
    lv60 processor semantic); without it they are not."""
    cfg_n = wav2vec2.get_config("wav2vec2-tiny", do_normalize=True)
    cfg_r = wav2vec2.get_config("wav2vec2-tiny", do_normalize=False)
    params = wav2vec2.init_params(cfg_r, example_len=2000)
    audio = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 2000)).astype(np.float32) * 0.1
    )
    mn = wav2vec2.Wav2Vec2ForCTC(cfg_n)
    l1 = mn.apply({"params": params}, audio)
    l2 = mn.apply({"params": params}, audio * 7.5)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-4, atol=1e-4)
    mr = wav2vec2.Wav2Vec2ForCTC(cfg_r)
    r1 = mr.apply({"params": params}, audio)
    r2 = mr.apply({"params": params}, audio * 7.5)
    assert np.abs(np.asarray(r1) - np.asarray(r2)).max() > 1e-3


def test_conv_impls_match():
    """All three conv lowerings share one param layout and agree."""
    import torch as _torch
    from transformers import Wav2Vec2ForCTC as TorchW2V

    cfg_a = wav2vec2.get_config("wav2vec2-tiny", conv_impl="im2col")
    _torch.manual_seed(0)
    tm = TorchW2V(_hf_config(cfg_a)).eval()
    pa = convert.convert_hf_state_dict(tm.state_dict(), cfg_a)
    audio = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 4000)).astype(np.float32) * 0.1
    )
    la = wav2vec2.Wav2Vec2ForCTC(cfg_a).apply({"params": pa}, audio)
    for impl in ("conv", "tapdot", "pairdot", "hybrid"):
        cfg_b = wav2vec2.get_config("wav2vec2-tiny", conv_impl=impl)
        lb = wav2vec2.Wav2Vec2ForCTC(cfg_b).apply({"params": pa}, audio)
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), rtol=1e-4, atol=1e-5, err_msg=impl
        )


def test_hybrid_conv_grads_match_autodiff():
    """The hybrid impl's custom VJP (phase-matmul dgrad/wgrad) matches
    lax.conv autodiff for BOTH cotangents, in f32, across the FE's
    stride/kernel geometries — including k % s != 0 (nb padding), k == s,
    C_in == 1 (layer 0), and input lengths where pairdot's phase grid is
    shorter AND longer than T."""
    rng = np.random.default_rng(7)
    geometries = [
        # (T, C, O, k, s) — layer-0-like, layer-1-like, k==s, ragged tails
        (1009, 1, 16, 10, 5),
        (501, 8, 16, 3, 2),
        (500, 8, 16, 3, 2),
        (64, 8, 16, 2, 2),
        (37, 4, 8, 5, 3),
    ]
    for T, C, O, k, s in geometries:
        x = jnp.asarray(rng.standard_normal((2, T, C)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((k, C, O)).astype(np.float32) * 0.1)

        ref_dx, ref_dw = jax.grad(
            lambda xx, ww: jnp.sum(jnp.cos(jax.lax.conv_general_dilated(
                xx, ww, window_strides=(s,), padding="VALID",
                dimension_numbers=("NWC", "WIO", "NWC")))),
            argnums=(0, 1))(x, w)
        got_dx, got_dw = jax.grad(
            lambda xx, ww: jnp.sum(jnp.cos(wav2vec2._hybrid_conv(xx, ww, s))),
            argnums=(0, 1))(x, w)
        np.testing.assert_allclose(
            np.asarray(got_dx), np.asarray(ref_dx), rtol=1e-5, atol=1e-5,
            err_msg=f"dx T={T} C={C} k={k} s={s}")
        np.testing.assert_allclose(
            np.asarray(got_dw), np.asarray(ref_dw), rtol=1e-5, atol=1e-5,
            err_msg=f"dw T={T} C={C} k={k} s={s}")


def test_encoder_unroll_matches_scan():
    """encoder_unroll is a lowering knob, not a semantic one: fully
    unrolled layers produce the rolled scan's logits bit-for-bit (the
    params keep their stacked (num_layers, ...) layout either way)."""
    params = wav2vec2.init_params(wav2vec2.get_config("wav2vec2-tiny"), example_len=2000)
    audio = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 2000)).astype(np.float32) * 0.1
    )
    outs = []
    for unroll in (1, 99):
        m = wav2vec2.Wav2Vec2ForCTC(
            wav2vec2.get_config("wav2vec2-tiny", encoder_unroll=unroll)
        )
        outs.append(np.asarray(jax.jit(m.apply)({"params": params}, audio)))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_fused_qkv_matches_unfused():
    """fused_qkv packs q/k/v into one (H, 3H) matmul with the q scale
    folded into its weight slice; same params (HF tree), same logits."""
    params = wav2vec2.init_params(wav2vec2.get_config("wav2vec2-tiny"), example_len=2000)
    audio = jnp.asarray(
        np.random.default_rng(2).standard_normal((2, 2000)).astype(np.float32) * 0.1
    )
    outs = []
    for fused in (False, True):
        m = wav2vec2.Wav2Vec2ForCTC(
            wav2vec2.get_config("wav2vec2-tiny", fused_qkv=fused)
        )
        outs.append(np.asarray(jax.jit(m.apply)({"params": params}, audio)))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=1e-6)


def test_bf16_param_storage_bit_identical_under_bf16_compute():
    """cast_param_storage casts only the matmul/conv ``kernel`` leaves —
    which the model casts to compute dtype in-graph anyway — so under
    bfloat16 compute the logits are BIT-identical while parameter bytes
    roughly halve. Norm scales/biases and the weight-normed positional
    conv stay f32 (casting those would shift numerics)."""
    cfg = wav2vec2.get_config("wav2vec2-tiny", compute_dtype="bfloat16")
    params = wav2vec2.init_params(cfg, example_len=2000)
    params16 = wav2vec2.cast_param_storage(params, "bfloat16")
    model = wav2vec2.Wav2Vec2ForCTC(cfg)
    audio = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 2000)), jnp.float32) * 0.1
    l32 = model.apply({"params": params}, audio)
    l16 = model.apply({"params": params16}, audio)
    np.testing.assert_array_equal(np.asarray(l32), np.asarray(l16))
    nb = sum(x.nbytes for x in jax.tree.leaves(params))
    nb16 = sum(x.nbytes for x in jax.tree.leaves(params16))
    # tiny has a larger non-kernel fraction than base/lv60 (where
    # kernels are >99% of bytes and the ratio approaches 0.5)
    assert nb16 < 0.65 * nb
    # non-kernel leaves untouched
    from jax.tree_util import tree_flatten_with_path, keystr
    for path, x in tree_flatten_with_path(params16)[0]:
        if "kernel" not in keystr(path) or "lm_head" in keystr(path):
            assert x.dtype == jnp.float32, keystr(path)


def test_fe_gelu_resolution():
    """fe_gelu="auto" picks the tanh approximation only under bfloat16
    compute; explicit values win regardless of dtype."""
    res = wav2vec2._fe_gelu_approximate
    assert res(wav2vec2.get_config("wav2vec2-tiny")) is False  # f32 auto
    assert res(wav2vec2.get_config("wav2vec2-tiny", compute_dtype="bfloat16")) is True
    assert res(wav2vec2.get_config("wav2vec2-tiny", fe_gelu="tanh")) is True
    assert (
        res(wav2vec2.get_config(
            "wav2vec2-tiny", compute_dtype="bfloat16", fe_gelu="exact"))
        is False
    )
    with pytest.raises(ValueError, match="fe_gelu"):
        res(wav2vec2.get_config("wav2vec2-tiny", fe_gelu="fast"))


def test_fe_gelu_tanh_within_bf16_noise():
    """The tanh FE GELU under bf16 compute sits no further from the
    exact-f32 logits than the exact-erf bf16 path already does — the
    bf16 cast, not the approximation, is the error floor (measured on
    chip: max|Δ| 1.74e-2 tanh-bf16 vs 1.77e-2 exact-bf16 on N(0,1))."""
    cfg_ref = wav2vec2.get_config("wav2vec2-tiny", fe_gelu="exact")
    params = wav2vec2.init_params(cfg_ref, example_len=2000)
    audio = jnp.asarray(
        np.random.default_rng(7).standard_normal((2, 2000)), jnp.float32) * 0.1
    ref = np.asarray(
        wav2vec2.Wav2Vec2ForCTC(cfg_ref).apply({"params": params}, audio))
    errs = {}
    for mode in ("exact", "tanh"):
        cfg = wav2vec2.get_config(
            "wav2vec2-tiny", compute_dtype="bfloat16", fe_gelu=mode)
        out = np.asarray(
            wav2vec2.Wav2Vec2ForCTC(cfg).apply({"params": params}, audio))
        errs[mode] = float(np.mean(np.abs(out - ref)))
    assert errs["tanh"] <= 1.5 * errs["exact"] + 1e-6, errs
