"""Pallas TPU kernel: whole-head fused attention for short sequences.

The attack's Wav2Vec2 target runs attention at seq ≈ 500 (10 s of audio
→ 499 frames) with head_dim 64 — short enough that ONE (b, head) problem
fits entirely in VMEM (scores tile 512×512 f32 = 1 MiB). The general
Pallas flash-attention kernel pays multi-block machinery (running max,
rescaling, dq/dk/dv grid revisits) that this shape never needs and
measures SLOWER than dense XLA attention here (docs/PERF.md). This
kernel instead does the entire softmax(QKᵀ)V — and its whole backward —
in a single VMEM-resident tile per (batch, head):

  * forward stores only the output and the per-row logsumexp; the O(T²)
    probabilities never touch HBM (dense XLA writes/reads ~190 MB of
    probs per layer per microbatch at the production shape),
  * backward recomputes the probabilities in-kernel from (q, k, lse) and
    emits dq, dk, dv in one pass (flash-style algebra, no tiling):
    D = Σ_j p·dp per row, ds = p·(dp − D), dq = ds·k, dk = dsᵀ·q,
    dv = pᵀ·do.

Sequence padding is static: T is a trace-time shape, so the key mask is
a compile-time iota comparison. Numerics: scores/softmax in f32, matmul
inputs bf16 (same placement as the XLA path's `_softmax_bf16`).

Parity with the dense path is asserted in tests/test_pallas_attention.py
(interpret mode on CPU, values AND gradients).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
from jax.experimental import pallas as pl

_NEG_INF = -1e30


def _fwd_kernel(T_real: int, q_ref, k_ref, v_ref, o_ref, lse_ref):
    q = q_ref[0, 0].astype(jnp.float32)  # (Tp, d)
    k = k_ref[0, 0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (Tp, Tp)
    Tp = s.shape[1]
    kmask = jax.lax.broadcasted_iota(jnp.int32, (1, Tp), 1) < T_real
    s = jnp.where(kmask, s, _NEG_INF)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot_general(
        (p / l).astype(v_ref.dtype), v_ref[0, 0],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = o.astype(o_ref.dtype)
    # stored as a (1, Tp) row: Mosaic wants ≥2-D vector stores
    lse_ref[0, 0] = (m + jnp.log(l)).reshape(1, -1)


def _bwd_kernel(T_real: int, q_ref, k_ref, v_ref, lse_ref, do_ref,
                dq_ref, dk_ref, dv_ref):
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)
    lse = lse_ref[0, 0, 0]  # (Tp,)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    Tp = s.shape[1]
    kmask = jax.lax.broadcasted_iota(jnp.int32, (1, Tp), 1) < T_real
    s = jnp.where(kmask, s, _NEG_INF)
    p = jnp.exp(s - lse[:, None])  # (Tp, Tp), zero on padded keys
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    D = jnp.sum(p * dp, axis=1, keepdims=True)
    ds = p * (dp - D)
    dq_ref[0, 0] = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dq_ref.dtype)
    dk_ref[0, 0] = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dk_ref.dtype)
    dv_ref[0, 0] = jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dv_ref.dtype)


def _head_spec(Tp: int, d: int):
    return pl.BlockSpec((1, 1, Tp, d), lambda b, h: (b, h, 0, 0))


def _lse_spec(Tp: int):
    return pl.BlockSpec((1, 1, 1, Tp), lambda b, h: (b, h, 0, 0))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _attend(q, k, v, T_real: int, interpret: bool = False):
    o, _ = _attend_fwd(q, k, v, T_real, interpret)
    return o


def _attend_fwd(q, k, v, T_real: int, interpret: bool):
    B, H, Tp, d = q.shape
    o, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, T_real),
        grid=(B, H),
        in_specs=[_head_spec(Tp, d)] * 3,
        out_specs=(_head_spec(Tp, d), _lse_spec(Tp)),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Tp, d), q.dtype),
            jax.ShapeDtypeStruct((B, H, 1, Tp), jnp.float32),
        ),
        interpret=interpret,
    )(q, k, v)
    # The lse row is the only backward residual the kernel adds beyond
    # its inputs; naming it lets whitelist remat policies (models/
    # wav2vec2.py "save_resid") keep it instead of re-running the
    # forward kernel inside the backward pass.
    return o, (q, k, v, checkpoint_name(lse, "attn_lse"))


def _attend_bwd(T_real: int, interpret: bool, res, do):
    q, k, v, lse = res
    B, H, Tp, d = q.shape
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, T_real),
        grid=(B, H),
        in_specs=[_head_spec(Tp, d)] * 3 + [_lse_spec(Tp), _head_spec(Tp, d)],
        out_specs=(_head_spec(Tp, d),) * 3,
        out_shape=tuple(jax.ShapeDtypeStruct((B, H, Tp, d), q.dtype) for _ in range(3)),
        interpret=interpret,
    )(q, k, v, lse, do)
    return dq, dk, dv


_attend.defvjp(_attend_fwd, _attend_bwd)


def fused_attention(q, k, v, *, interpret: bool = False) -> jnp.ndarray:
    """softmax(q kᵀ) v with q pre-scaled; inputs/outputs (B, T, heads, d).

    T is padded to a lane multiple inside; padded KEYS are masked with a
    compile-time iota (T is a static shape), padded QUERY rows are sliced
    off on return. Differentiable w.r.t. q, k, v (custom VJP above).
    """
    B, T, H, d = q.shape
    Tp = max(128, -(-T // 128) * 128)
    pad = [(0, 0), (0, Tp - T), (0, 0), (0, 0)]
    to_bhtd = lambda t: checkpoint_name(
        jnp.transpose(jnp.pad(t, pad), (0, 2, 1, 3)), "attn_qkv"
    )
    o = _attend(to_bhtd(q), to_bhtd(k), to_bhtd(v), T, interpret)
    return jnp.transpose(o[:, :, :T, :], (0, 2, 1, 3))
