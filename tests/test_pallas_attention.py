"""Fused whole-head attention kernel parity (interpret mode on CPU):
values AND input gradients vs the dense jnp reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paa_tpu.ops.pallas import attention as fused


def _dense_reference(q, k, v):
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


@pytest.mark.parametrize("T", [128, 130, 499])
def test_fused_attention_matches_dense(rng, T):
    B, H, d = 2, 3, 16
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, T, H, d)).astype(np.float32) * 0.5)
        for _ in range(3)
    )
    got = fused.fused_attention(q, k, v, interpret=True)
    want = _dense_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_fused_attention_grads_match_dense(rng):
    B, T, H, d = 2, 130, 2, 16
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, T, H, d)).astype(np.float32) * 0.5)
        for _ in range(3)
    )
    # a fixed cotangent direction exercises all of dq/dk/dv
    ct = jnp.asarray(np.random.default_rng(7).standard_normal((B, T, H, d)), jnp.float32)

    def scalar(fn):
        return lambda q, k, v: jnp.sum(fn(q, k, v) * ct)

    g_fused = jax.grad(
        scalar(lambda q, k, v: fused.fused_attention(q, k, v, interpret=True)),
        argnums=(0, 1, 2),
    )(q, k, v)
    g_dense = jax.grad(scalar(_dense_reference), argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_fused, g_dense, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-5, atol=3e-5, err_msg=name
        )


def test_fused_attention_head_chunking_matches(rng):
    """G>1 (head-chunked grid) matches the single-chunk path, values and
    grads — covers the (B, G, Hc, Tp) lse layout the TPU build uses
    (interpret mode otherwise always picks G=1)."""
    B, T, H, d = 2, 130, 4, 16
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, T, H, d)).astype(np.float32) * 0.5)
        for _ in range(3)
    )
    Tp = 256
    flat = lambda t: t.reshape(B, T, H * d)

    def run(G):
        def f(q, k, v):
            o = fused._attend(flat(q), flat(k), flat(v), H, G, Tp, True)
            return o.reshape(B, T, H, d)
        val = f(q, k, v)
        ct = jnp.asarray(
            np.random.default_rng(3).standard_normal((B, T, H, d)), jnp.float32
        )
        grads = jax.grad(
            lambda a, b, c: jnp.sum(f(a, b, c) * ct), argnums=(0, 1, 2)
        )(q, k, v)
        return val, grads

    v1, g1 = run(1)
    v2, g2 = run(2)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=2e-5, atol=2e-5)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-5, atol=3e-5, err_msg=name
        )


def test_pick_chunks_pins_production_geometries():
    """The VMEM-feasibility model's choices for the two production
    shapes (bf16, 10 s audio → Tp=640) are load-bearing: a regression in
    ``feasible_chunks`` would change the compiled kernel on the real
    chip without any other test noticing.

    wav2vec2-base: H=12, d=64 → G=3 (W=256).
    wav2vec2-large-lv60 (the committed reference's model,
    build.py:229-230): H=16, d=64 → G=4 (W=256)."""
    assert fused.feasible_chunks(12, 64, 640, 2) == 3
    assert fused.feasible_chunks(16, 64, 640, 2) == 4
    # long clips outgrow the whole-problem kernel: no feasible chunking
    assert fused.feasible_chunks(12, 64, 10_240, 2) is None
    with pytest.raises(ValueError, match="flash"):
        fused._pick_chunks(12, 64, 10_240, 2)


def test_lv60_head_geometry_matches_dense(rng):
    """Numerics at the lv60 attention geometry (H=16, d=64, seq≈500)
    with its production head-chunking G=4 — pins the exact (grid, lse
    layout) the fused kernel runs on-device for the committed
    reference's model."""
    B, T, H, d = 1, 499, 16, 64
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, T, H, d)).astype(np.float32) * 0.3)
        for _ in range(3)
    )
    Tp = 512
    flat = lambda t: t.reshape(B, T, H * d)
    got = fused._attend(flat(q), flat(k), flat(v), H, 4, Tp, True).reshape(
        B, T, H, d
    )
    want = _dense_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_auto_attention_impl_resolves_on_cpu(rng):
    """attention_impl='auto' must trace and run off-TPU (resolving to the
    dense XLA path) — the default-flag CLI path on any backend."""
    from paa_tpu.models import wav2vec2

    mcfg = wav2vec2.get_config("wav2vec2-tiny", attention_impl="auto")
    params = wav2vec2.init_params(mcfg, example_len=2000)
    model = wav2vec2.Wav2Vec2ForCTC(mcfg)
    audio = jnp.asarray(rng.standard_normal((2, 2000)).astype(np.float32) * 0.1)
    logits = model.apply({"params": params}, audio)
    assert bool(jnp.all(jnp.isfinite(logits)))
