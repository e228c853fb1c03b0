"""Unit tests for the lean-residual custom VJPs in models/wav2vec2.py.

The attack differentiates w.r.t. the waveform only, so the parameter
cotangents of _layernorm/_ffn are DCE'd in production — these tests pin
them against stock autodiff so the model stays safely differentiable
end-to-end (e.g. for fine-tuning uses).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paa_tpu.models import wav2vec2 as w2v


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def _grads(f, args):
    return jax.grad(lambda *a: jnp.sum(f(*a) * jnp.cos(f(*a) * 0 + 1.7)), argnums=tuple(range(len(args))))(*args)


def test_layernorm_matches_stock_autodiff(rng):
    x = jnp.asarray(rng.standard_normal((3, 7, 16)).astype(np.float32))
    gamma = jnp.asarray(rng.standard_normal((16,)).astype(np.float32) * 0.3 + 1)
    beta = jnp.asarray(rng.standard_normal((16,)).astype(np.float32) * 0.1)
    eps = 1e-5

    def stock(x, gamma, beta):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu
        return (x - mu) * jax.lax.rsqrt(var + eps) * gamma + beta

    custom = lambda x, g, b: w2v._layernorm(x, g, b, eps)
    np.testing.assert_allclose(
        np.asarray(custom(x, gamma, beta)), np.asarray(stock(x, gamma, beta)),
        rtol=1e-6, atol=1e-6,
    )
    scal = lambda f: lambda *a: jnp.sum(jnp.sin(f(*a)))
    g_custom = jax.grad(scal(custom), argnums=(0, 1, 2))(x, gamma, beta)
    g_stock = jax.grad(scal(stock), argnums=(0, 1, 2))(x, gamma, beta)
    for a, b, name in zip(g_custom, g_stock, ("dx", "dgamma", "dbeta")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5, err_msg=name
        )


def test_gelu_matches_stock_autodiff(rng):
    x = jnp.asarray(rng.standard_normal((5, 33)).astype(np.float32) * 2)
    f_custom = lambda t: jnp.sum(jnp.sin(w2v._gelu(t)))
    f_stock = lambda t: jnp.sum(jnp.sin(nn.gelu(t, approximate=False)))
    np.testing.assert_allclose(
        float(f_custom(x)), float(f_stock(x)), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(jax.grad(f_custom)(x)), np.asarray(jax.grad(f_stock)(x)),
        rtol=1e-6, atol=1e-6,
    )


def test_ffn_matches_stock_autodiff_all_grads(rng):
    B, T, H, I = 2, 5, 8, 12
    y = jnp.asarray(rng.standard_normal((B, T, H)).astype(np.float32))
    ik = jnp.asarray(rng.standard_normal((H, I)).astype(np.float32) * 0.3)
    ib = jnp.asarray(rng.standard_normal((I,)).astype(np.float32) * 0.1)
    ok = jnp.asarray(rng.standard_normal((I, H)).astype(np.float32) * 0.3)
    ob = jnp.asarray(rng.standard_normal((H,)).astype(np.float32) * 0.1)

    def stock(y, ik, ib, ok, ob):
        return jnp.dot(nn.gelu(jnp.dot(y, ik) + ib, approximate=False), ok) + ob

    np.testing.assert_allclose(
        np.asarray(w2v._ffn(y, ik, ib, ok, ob)),
        np.asarray(stock(y, ik, ib, ok, ob)),
        rtol=1e-6, atol=1e-6,
    )
    scal = lambda f: lambda *a: jnp.sum(jnp.sin(f(*a)))
    g_custom = jax.grad(scal(w2v._ffn), argnums=(0, 1, 2, 3, 4))(y, ik, ib, ok, ob)
    g_stock = jax.grad(scal(stock), argnums=(0, 1, 2, 3, 4))(y, ik, ib, ok, ob)
    for a, b, name in zip(g_custom, g_stock, ("dy", "dik", "dib", "dok", "dob")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5, err_msg=name
        )
