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
