"""Pallas TPU kernel: fused whole-problem attention for short sequences.

The attack's Wav2Vec2 target runs attention at seq ≈ 500 (10 s of audio
→ 499 frames) with head_dim 64 — short enough that a whole (batch,
head-chunk) problem fits in VMEM (a head's scores tile is 512×512 f32 =
1 MiB). The general Pallas flash-attention kernel pays multi-block
machinery (running max, rescaling, dq/dk/dv grid revisits) that this
shape never needs and measures SLOWER than dense XLA attention here
(docs/PERF.md). This kernel does the entire softmax(QKᵀ)V — and its
whole backward — VMEM-resident:

  * forward stores only the output and the per-(head, row) logsumexp;
    the O(T²) probabilities never touch HBM (dense XLA writes/reads
    ~190 MB of probs per layer per microbatch at production shape),
  * backward recomputes the probabilities in-kernel from (q, k, lse) and
    emits dq, dk, dv in one pass (flash-style algebra, no tiling):
    D = Σ_j p·dp per row, ds = p·(dp − D), dq = ds·k, dk = dsᵀ·q,
    dv = pᵀ·do.

Layout: the kernel reads q/k/v in the MODEL's layout, (B, T, heads·d).
Each grid cell (b, g) DMAs one contiguous chunk of H/G heads (the chunk
lane-width is kept a multiple of 128, Mosaic's lane-tiling requirement)
and loops its heads as static 64-lane slices. An earlier revision
materialized padded (B, H, Tp, d) transposes of q/k/v/do/o in HBM
(~0.9 GB per microbatch per direction at production shape, ~50 ms/step
of copy/slice ops in the profile); no such buffer exists now. G is the
smallest head-chunking for which the kernel's VMEM footprint
(double-buffered blocks + f32 score/probability scratch) fits; the
whole-batch G=1 variant compiled to a 20.4 MiB backward stack and was
rejected by Mosaic at the production shape.

T is padded only inside the per-cell block: edge blocks have
Mosaic-padded (undefined) rows, so the kernel zero-masks every padded
row (0·NaN would otherwise poison the row/column sums) and the caller
never reads the padded query rows (out-of-bounds stores are dropped).

Numerics: scores/softmax in f32, matmul inputs bf16 (same placement as
the XLA path's `_softmax_bf16`).

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
_VMEM_BUDGET = 14 * 1024 * 1024  # leave headroom under the 16 MiB limit


def pad_seq(T: int) -> int:
    """Padded sequence length the kernel operates on (128-lane multiple).
    The ONE place this rounding lives — feasibility prechecks must agree
    with the Tp :func:`fused_attention` itself will use."""
    return max(128, -(-T // 128) * 128)


def fits(T: int, H: int, d: int, itemsize: int) -> bool:
    """Whole-problem kernel feasibility for an UNPADDED sequence length —
    what auto-impl selection should ask instead of re-deriving the
    padding formula (a divergent copy could answer "fits" for a shape
    :func:`_pick_chunks` then rejects at trace time)."""
    return feasible_chunks(H, d, pad_seq(T), itemsize) is not None


def feasible_chunks(H: int, d: int, Tp: int, itemsize: int) -> int | None:
    """Smallest G (number of head chunks) whose per-cell footprint fits
    VMEM, or None when no chunking does (long sequences — roughly >13 s
    of 16 kHz audio — outgrow the whole-problem kernel; callers in
    auto-select mode fall back to the multi-block flash kernel then)."""
    for G in range(1, H + 1):
        if H % G:
            continue
        W = (H // G) * d
        if W % 128:
            continue
        blocks = 7 * Tp * W * itemsize * 2  # q/k/v/do + dq/dk/dv, 2× buffered
        scratch = 4 * Tp * Tp * 4 + 2 * Tp * W * 4  # s/p/dp/ds + f32 casts
        if blocks + scratch <= _VMEM_BUDGET:
            return G
    return None


def _pick_chunks(H: int, d: int, Tp: int, itemsize: int) -> int:
    G = feasible_chunks(H, d, Tp, itemsize)
    if G is None:
        raise ValueError(
            f"no head-chunking of H={H}, d={d} fits VMEM at Tp={Tp}; "
            "use attention_impl='flash' or 'xla' for this shape"
        )
    return G


def _masked_rows(ref, T_real: int):
    """Load a (1, Tp, C) ref as (Tp, C) with padded rows zeroed."""
    x = ref[0]
    rmask = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], 1), 0) < T_real
    return jnp.where(rmask, x, jnp.zeros((), x.dtype))


def _fwd_kernel(T_real: int, Hc: int, q_ref, k_ref, v_ref, o_ref, lse_ref):
    Tp = q_ref.shape[1]
    d = q_ref.shape[2] // Hc
    q = _masked_rows(q_ref, T_real)  # (Tp, Hc·d), compute dtype
    k = _masked_rows(k_ref, T_real)
    v = _masked_rows(v_ref, T_real)
    kmask = jax.lax.broadcasted_iota(jnp.int32, (1, Tp), 1) < T_real
    for h in range(Hc):
        sl = slice(h * d, (h + 1) * d)
        # dot inputs stay in the INPUT dtype (bf16 in production — an
        # f32 MXU matmul costs ~3 bf16 passes), accumulation in f32
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )  # (Tp, Tp) f32
        s = jnp.where(kmask, s, _NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        o_ref[0, :, sl] = jax.lax.dot_general(
            (p / l).astype(v.dtype), v[:, sl],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)
        lse_ref[0, 0, h, :] = (m + jnp.log(l)).reshape(-1)


def _bwd_kernel(T_real: int, Hc: int, q_ref, k_ref, v_ref, lse_ref, do_ref,
                dq_ref, dk_ref, dv_ref):
    Tp = q_ref.shape[1]
    d = q_ref.shape[2] // Hc
    q = _masked_rows(q_ref, T_real)
    k = _masked_rows(k_ref, T_real)
    v = _masked_rows(v_ref, T_real)
    do = _masked_rows(do_ref, T_real)
    rmask = jax.lax.broadcasted_iota(jnp.int32, (Tp, 1), 0) < T_real
    kmask = jax.lax.broadcasted_iota(jnp.int32, (1, Tp), 1) < T_real
    for h in range(Hc):
        sl = slice(h * d, (h + 1) * d)
        qh = q[:, sl]
        kh = k[:, sl]
        vh = v[:, sl]
        doh = do[:, sl]
        lse = lse_ref[0, 0, h, :]  # (Tp,)
        # dot inputs stay in the INPUT dtype, f32 accumulation (the
        # probability/score factors below are rounded back to that dtype
        # for the grad dots — the same placement as the XLA path's
        # bf16-resident softmax VJP)
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = jnp.where(kmask, s, _NEG_INF)
        # padded QUERY rows hold an undefined lse: zero their
        # probabilities so dk/dv (which sum over query rows) are exact
        p = jnp.where(rmask, jnp.exp(s - lse[:, None]), 0.0)  # (Tp, Tp) f32
        dp = jax.lax.dot_general(
            doh, vh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        D = jnp.sum(p * dp, axis=1, keepdims=True)
        ds = (p * (dp - D)).astype(q.dtype)
        pc = p.astype(q.dtype)
        dq_ref[0, :, sl] = jax.lax.dot_general(
            ds, kh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dq_ref.dtype)
        dk_ref[0, :, sl] = jax.lax.dot_general(
            ds, qh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dk_ref.dtype)
        dv_ref[0, :, sl] = jax.lax.dot_general(
            pc, doh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dv_ref.dtype)


def _row_spec(Tp: int, W: int):
    # (1, Tp, W) block over the (B, T, H·d) array: grid cell (b, g) DMAs
    # head-chunk g's W lanes contiguously — no transpose buffer in HBM
    return pl.BlockSpec((1, Tp, W), lambda b, g: (b, 0, g))


def _lse_spec(Hc: int, Tp: int):
    # lse is laid out (B, G, Hc, Tp) so the block equals the array's
    # trailing dims (Mosaic's tiling rule for non-128-multiple dims)
    return pl.BlockSpec((1, 1, Hc, Tp), lambda b, g: (b, g, 0, 0))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _attend(q, k, v, H: int, G: int, T_pad: int, interpret: bool = False):
    o, _ = _attend_fwd(q, k, v, H, G, T_pad, interpret)
    return o


def _attend_fwd(q, k, v, H: int, G: int, T_pad: int, interpret: bool):
    B, T, Hd = q.shape
    Hc = H // G
    W = Hd // G
    o, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, T, Hc),
        grid=(B, G),
        in_specs=[_row_spec(T_pad, W)] * 3,
        out_specs=(_row_spec(T_pad, W), _lse_spec(Hc, T_pad)),
        out_shape=(
            jax.ShapeDtypeStruct((B, T, Hd), q.dtype),
            jax.ShapeDtypeStruct((B, G, Hc, T_pad), jnp.float32),
        ),
        interpret=interpret,
    )(q, k, v)
    # The lse rows are the only backward residual the kernel adds beyond
    # its inputs; naming it lets whitelist remat policies (models/
    # wav2vec2.py "save_resid") keep it instead of re-running the
    # forward kernel inside the backward pass.
    return o, (q, k, v, checkpoint_name(lse, "attn_lse"))


def _attend_bwd(H: int, G: int, T_pad: int, interpret: bool, res, do):
    q, k, v, lse = res
    B, T, Hd = q.shape
    Hc = H // G
    W = Hd // G
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, T, Hc),
        grid=(B, G),
        in_specs=[_row_spec(T_pad, W)] * 3
        + [_lse_spec(Hc, T_pad), _row_spec(T_pad, W)],
        out_specs=(_row_spec(T_pad, W),) * 3,
        out_shape=tuple(jax.ShapeDtypeStruct((B, T, Hd), q.dtype) for _ in range(3)),
        interpret=interpret,
    )(q, k, v, lse, do)
    return dq, dk, dv


_attend.defvjp(_attend_fwd, _attend_bwd)


def fused_attention(q, k, v, *, interpret: bool = False) -> jnp.ndarray:
    """softmax(q kᵀ) v with q pre-scaled; inputs/outputs (B, T, heads, d).

    The (B, T, heads, d) → (B, T, heads·d) reshape is a free bitcast;
    the per-head slicing happens inside the kernel as static 64-lane
    slices. Padded rows are masked inside the kernel with a compile-time
    iota (T is a static shape). Differentiable w.r.t. q, k, v (custom
    VJP above).
    """
    B, T, H, d = q.shape
    Tp = pad_seq(T)
    # interpret mode (CPU tests) has no lane-tiling constraint or VMEM
    # limit; tiny test heads (H·d < 128) would otherwise have no valid G
    G = 1 if interpret else _pick_chunks(H, d, Tp, q.dtype.itemsize)
    flat = lambda t: checkpoint_name(t.reshape(B, T, H * d), "attn_qkv")
    o = _attend(flat(q), flat(k), flat(v), H, G, Tp, interpret)
    return o.reshape(B, T, H, d)
