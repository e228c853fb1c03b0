"""Wav2Vec2-CTC in Flax — the frozen ASR target of the attack.

A from-scratch TPU-first implementation of the architecture the reference
attacks through HuggingFace (`Wav2Vec2ForCTC`; loaded at reference:
src/training_utils/build.py:225-231). Supports both checkpoints the
reference ecosystem uses:

  * ``wav2vec2-base``       — group-norm feature extractor, post-LN encoder
                              (the paper's target, BASELINE.md)
  * ``wav2vec2-large-lv60`` — layer-norm feature extractor, pre-LN
                              ("stable layer norm") encoder (the committed
                              code's target, build.py:229-230)

TPU-first design decisions:
  * Encoder layers are stacked and driven by ``flax.linen.scan`` — one
    traced layer instead of 12/24 unrolled copies, cutting compile time
    and letting XLA pipeline the layer loop; optional ``jax.checkpoint``
    (remat) on the scanned layer trades FLOPs for HBM when
    differentiating through the frozen model w.r.t. the input waveform.
  * All matmuls/convs run in a configurable ``compute_dtype`` (bfloat16
    by default) with float32 accumulation on the MXU; layer norms,
    softmax and the CTC head stay float32 for numerics.
  * No attention mask machinery: the attack pipeline feeds fixed-length
    batches (reference: build.py:41-61 collate), so every frame is valid
    and the attention is a dense, statically-shaped MXU matmul.

Parameter trees intentionally mirror HF naming closely enough for a
mechanical converter (models/convert.py) verified by logits-parity tests
against the torch implementation.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

Dtype = Any


@dataclasses.dataclass(frozen=True)
class Wav2Vec2Config:
    """Architecture hyperparameters (HF-compatible field meanings)."""

    vocab_size: int = 32
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: Sequence[int] = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: Sequence[int] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Sequence[int] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = False
    feat_extract_norm: str = "group"  # "group" | "layer"
    do_stable_layer_norm: bool = False
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    layer_norm_eps: float = 1e-5
    # Zero-mean/unit-variance normalization of the input waveform — what
    # HF's Wav2Vec2Processor (feature extractor, do_normalize=True)
    # applies for the lv60 checkpoints before the model. The reference
    # bypasses the processor in its train/eval paths and feeds raw
    # waveforms (reference: src/core/loss_helpers.py:21,56 vs the
    # processor-based get_logits at :35-40 — the preprocessing
    # inconsistency SURVEY.md §3.3 says to resolve deliberately). We put
    # the normalization INSIDE the differentiable forward so `clean + p`
    # is normalized exactly as the processor would, gradients included.
    # False for base (its HF processor has do_normalize=False).
    do_normalize: bool = False
    compute_dtype: str = "bfloat16"
    remat: bool = False
    # With remat on: "full" recomputes the whole encoder layer in
    # backward; "save_cheap" saves per-layer activations except those
    # funneled through lean-residual custom VJPs (_layernorm, _gelu,
    # _ffn) — NOTE a blacklist checkpoint_name alone cannot drop a
    # value: partial eval saves the unnamed producer one op upstream of
    # the name barrier, so the big-buffer control lives in the custom
    # VJPs, not the name list; "no_probs" blacklists only the O(T²)
    # attention scores/probs (moot under attention_impl="fused", where
    # they never exist); "save_resid" whitelists (attn_qkv, attn_lse,
    # attn_out) and recomputes everything else — measured SLOWER than
    # save_cheap at production shape (docs/PERF.md).
    remat_policy: str = "full"
    # Rematerialize the conv feature extractor in the backward pass.
    # Differentiating w.r.t. the raw waveform (the attack's only grad)
    # otherwise keeps every conv layer's im2col/pre-GELU activations
    # alive — O(B·T·C) bf16 buffers that OOM a 16 GB chip at the
    # reference's production batch (B=64, T=160k). The FE is <40% of the
    # model FLOPs, so recomputing it once is cheap; forward-only calls
    # are unaffected (remat has no effect without a backward pass).
    remat_feature_extractor: bool = True
    # With FE remat on: save the (bf16, post-gelu) OUTPUTS of the first
    # k conv layers across the remat boundary, so the backward replay
    # starts from layer k instead of re-running the most expensive early
    # convs (layer 0 output alone is (B, 31999, 512) ≈ 1 GB bf16 at
    # B=64). 0 = classic full remat (only the waveform is saved).
    remat_fe_save_layers: int = 0
    # Conv lowering for the feature extractor. All impls share one
    # (k, C_in, C_out) WIO param tensor, so checkpoints are portable.
    # "conv": lax.conv_general_dilated — XLA's native TPU conv path;
    #   measured 2× faster than im2col at production shapes (51 vs 96 ms
    #   fwd, 97 vs 229 ms fwd+bwd for the full FE at B=64, T=160k).
    # "pairdot": phase-blocked matmuls — reshape time into stride-sized
    #   phases, so a strided conv becomes ceil(k/s) dense MXU dots over
    #   CONTIGUOUS slices (no strided slicing, no conv lowering, no
    #   patch buffer); the last block's missing taps are zero rows of
    #   the weight. Backward is pad + matmul.
    # "im2col": strided-slice patch extraction + one MXU matmul per
    #   layer (backward = pad + matmul, no transposed-conv lowering) —
    #   but the (B, T', k·C) patch concat is materialized in HBM.
    # "tapdot": Σ_r slice_r(x) @ W_r — k accumulated MXU dots with a
    #   full C_in contraction dim each and NO patch buffer.
    # "hybrid": lax.conv forward + phase-matmul backward (custom VJP) —
    #   keeps XLA's fast native forward but replaces its dgrad (an
    #   input-dilated transposed conv, measured ~3× off its roofline on
    #   the strided k=3 layers) with pairdot's transpose: nb=ceil(k/s)
    #   dense bf16 MXU dots over contiguous time, overlap-added by
    #   static pads. wgrad is nb einsums contracting over B·T_out.
    conv_impl: str = "conv"
    # GELU flavor for the feature-extractor conv stack — the hottest
    # activation in the program (~2.1e9 elements/step at B=64 × 10 s,
    # vs ~0.1e9 in the whole encoder). "exact": erf GELU, what the HF
    # checkpoint was trained with. "tanh": the tanh approximation —
    # measured 2.4× cheaper on the v5e VPU (layer-0 conv+norm+gelu fwd
    # 21.8 → 9.0 ms, fwd+dgrad 30.6 → 21.8 ms) because erf lowers to a
    # long polynomial/exp chain while tanh is a single fused op.
    # "auto" (default): tanh under bfloat16 compute — where the
    # approximation error is BELOW the bf16 cast's own quantization
    # (measured max|Δ| vs exact-f32 on N(0,1): tanh-bf16 1.74e-2,
    # exact-bf16 1.77e-2) — and exact erf under float32, so f32 parity
    # tests against torch see the checkpoint's true activation.
    fe_gelu: str = "auto"
    # "xla": dense softmax(QK^T)V (probs materialized — O(T²) HBM per
    # head, what forces encoder remat at production batch). "flash":
    # the stock Pallas TPU flash-attention kernel (multi-block; O(T)
    # memory). "fused": the short-seq whole-head Pallas kernel
    # (ops/pallas/attention.py) — the entire softmax(QKᵀ)V and its
    # backward run VMEM-resident per (batch, head); probs never touch
    # HBM and only (q, k, v, logsumexp) are saved. TPU only. "auto":
    # resolve per traced shape — fused when its VMEM footprint fits,
    # flash otherwise (long clips), dense xla off-TPU.
    attention_impl: str = "xla"
    # Fuse the q/k/v projections into ONE (H, 3H) matmul per layer —
    # larger MXU tiles, one pass over x instead of three. The parameter
    # tree keeps the separate q_proj/k_proj/v_proj entries (HF layout);
    # the concat of the (stacked) weights is a few MB per step and hoists
    # cleanly. The q scale folds into its weight slice, so numerics match
    # the unfused path to bf16 rounding.
    fused_qkv: bool = False
    # Inner-remat the FFN hidden: (intermediate_dense + gelu) recompute
    # in backward from the layer input instead of stacking a
    # (L, B, T, 4H) residual across the encoder scan (1.18 GB bf16 per
    # microbatch at production shape). One extra (H, 4H) matmul per
    # layer in backward; independent of remat_policy (see FeedForward).
    remat_ffn: bool = False
    # Pallas flash-attention block size (0 = the kernel's 128 default).
    # At the production seq (~625 → padded 640) larger q/k blocks cut
    # grid/revisit overhead; tune per shape on the real chip.
    flash_block: int = 0
    # lax.scan unroll factor for the stacked encoder layers. 1 = rolled
    # loop (smallest program, but the scan backward stacks every layer's
    # residuals with dynamic-update-slices — measured ~41 ms/step at
    # production shape). num_hidden_layers = fully unrolled: residuals
    # become plain SSA values, no stacking traffic, larger program.
    encoder_unroll: int = 1
    # Mesh for MANUAL attention partitioning (jax.sharding.Mesh or None).
    # A pallas_call has no GSPMD partitioning rule: on a multi-chip mesh
    # XLA must treat the fused/flash kernels as opaque whole-array ops —
    # all-gathering the batch-sharded (dp) or head-sharded (tp) q/k/v and
    # running the full problem on every chip. When set, those kernels run
    # inside a jax.shard_map region over this mesh: each chip executes
    # the kernel on its local (batch rows, heads) shard. Attention is
    # independent across rows and heads, so the region needs no
    # collectives. None (default) = single device; the dense "xla" path
    # never needs this (GSPMD partitions plain matmuls fine).
    attn_mesh: Any = None
    # Run the fused Pallas kernel in interpret mode — CPU tests of the
    # shard_map-partitioned path; never set on TPU.
    attn_interpret: bool = False

    def __post_init__(self):
        checks = {
            "conv_impl": ("conv", "pairdot", "im2col", "tapdot", "hybrid"),
            "attention_impl": ("xla", "flash", "fused", "auto"),
            "feat_extract_norm": ("group", "layer"),
            "remat_policy": ("full", "save_cheap", "no_probs", "save_resid"),
        }
        for field_name, allowed in checks.items():
            v = getattr(self, field_name)
            if v not in allowed:
                raise ValueError(f"{field_name}={v!r}; expected one of {allowed}")

    @property
    def dtype(self) -> Dtype:
        return jnp.dtype(self.compute_dtype)

    def feat_extract_output_length(self, input_length: int) -> int:
        """Time frames produced by the conv feature extractor."""
        L = input_length
        for k, s in zip(self.conv_kernel, self.conv_stride):
            L = (L - k) // s + 1
        return L


PRESETS = {
    # facebook/wav2vec2-base-960h (the paper's target, SURVEY.md §6)
    "wav2vec2-base": Wav2Vec2Config(),
    # facebook/wav2vec2-large-960h-lv60-self (the committed code's target,
    # reference: src/training_utils/build.py:229-230)
    "wav2vec2-large-lv60": Wav2Vec2Config(
        hidden_size=1024,
        num_hidden_layers=24,
        num_attention_heads=16,
        intermediate_size=4096,
        conv_bias=True,
        feat_extract_norm="layer",
        do_stable_layer_norm=True,
        do_normalize=True,
    ),
    # Tiny config for tests / CI.
    "wav2vec2-tiny": Wav2Vec2Config(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        conv_dim=(32,) * 7,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        compute_dtype="float32",
    ),
}


def get_config(name: str, **overrides) -> Wav2Vec2Config:
    if name not in PRESETS:
        raise ValueError(f"Unknown model preset {name!r}; have {sorted(PRESETS)}")
    return dataclasses.replace(PRESETS[name], **overrides)


def cast_param_storage(params, storage_dtype) -> dict:
    """Cast the matmul/conv ``kernel`` leaves to ``storage_dtype`` for
    HBM residency (>99% of parameter bytes: base 378 → 189 MB, lv60
    1.26 → 0.63 GB).

    Every kernel is cast to ``compute_dtype`` in-graph before use, so
    bf16 storage under the default bf16 compute dtype produces
    BIT-IDENTICAL outputs (pre-casting equals the in-graph cast) while
    halving parameter HBM reads and resident bytes (measured: base
    4.15→4.18 steps/s, lv60 1.78→1.80 at accum=2; lv60 monolithic
    accum=1 still does not compile even with the freed 630 MB —
    docs/PERF.md round 3).
    Biases, norm scales, the weight-normed positional conv
    (weight_g/weight_v participate in an f32 norm), and the lm_head
    (the ONE projection applied in f32 — the head always runs f32) keep
    f32 storage: casting those WOULD shift numerics.
    """
    dt = jnp.dtype(storage_dtype)

    def _cast(path, x):
        names = {str(getattr(k, "key", getattr(k, "name", ""))) for k in path}
        # "kernel" (Dense/_ProjParams) and "conv_kernel" (FE conv stack)
        is_kernel = any("kernel" in n for n in names)
        return x.astype(dt) if is_kernel and "lm_head" not in names else x

    return jax.tree_util.tree_map_with_path(_cast, params)


# ---------------------------------------------------------------------------
# Feature extractor (raw waveform → 512-dim frames at 49.9 Hz)
# ---------------------------------------------------------------------------


def _im2col(x: jnp.ndarray, kernel: int, stride: int) -> jnp.ndarray:
    """Patch extraction as ``kernel`` strided slices — ``(B, T, C) →
    (B, T_out, kernel·C)``. Strided slicing lowers to plain XLA slices
    (backward: pad), so a VALID conv becomes im2col + one MXU matmul
    with no conv/transposed-conv lowering anywhere in the program."""
    B, T, C = x.shape
    t_out = (T - kernel) // stride + 1
    cols = [x[:, r : r + (t_out - 1) * stride + 1 : stride, :] for r in range(kernel)]
    return jnp.concatenate(cols, axis=-1)  # (B, t_out, kernel*C)


def _pairdot_conv(x: jnp.ndarray, w: jnp.ndarray, stride: int) -> jnp.ndarray:
    """VALID strided conv as phase-blocked dense matmuls.

    ``x: (B, T, C)``, ``w: (k, C, O)``. Reshaping time into chunks of
    ``stride`` turns the strided window into ``nb = ceil(k/stride)``
    UNIT-stride dots: ``y[t] = Σ_j z[t+j] @ Wb[j]`` with
    ``z = x.reshape(B, T//s, s·C)`` and ``Wb`` the taps regrouped into
    (s·C, O) blocks (missing taps of the last block are zero rows, so
    out-of-range input elements only ever multiply zeros). Every slice is
    contiguous along time, so neither forward nor backward contains a
    strided gather/scatter or a conv — just pads and MXU matmuls with
    contraction dims of s·C.
    """
    B, T, C = x.shape
    k, _, O = w.shape
    s = stride
    L = (T - k) // s + 1
    nb = -(-k // s)
    need = (L - 1 + nb) * s
    if need > T:
        x = jnp.pad(x, [(0, 0), (0, need - T), (0, 0)])
    z = x[:, : (L - 1 + nb) * s, :].reshape(B, L - 1 + nb, s * C)
    wb = jnp.pad(w, [(0, nb * s - k), (0, 0), (0, 0)]).reshape(nb, s, C, O)
    wb = wb.reshape(nb, s * C, O)
    y = jnp.dot(z[:, :L, :], wb[0], preferred_element_type=jnp.float32)
    for j in range(1, nb):
        y = y + jnp.dot(z[:, j : j + L, :], wb[j], preferred_element_type=jnp.float32)
    return y


def _pairdot_blocks(w: jnp.ndarray, stride: int) -> jnp.ndarray:
    """Regroup a ``(k, C, O)`` WIO kernel into pairdot's ``(nb, s·C, O)``
    phase blocks (missing taps of the last block are zero rows)."""
    k, C, O = w.shape
    nb = -(-k // stride)
    wb = jnp.pad(w, [(0, nb * stride - k), (0, 0), (0, 0)])
    return wb.reshape(nb, stride * C, O)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _hybrid_conv(x: jnp.ndarray, w: jnp.ndarray, stride: int) -> jnp.ndarray:
    """VALID strided conv: XLA-native forward, phase-matmul backward.

    Forward is ``lax.conv_general_dilated`` — the fastest measured FE
    forward (2× im2col, docs/PERF.md). Its autodiff dgrad, however, is
    an input-dilated transposed conv that the TPU backend runs ~3× off
    the layer's roofline at the FE's strided k=3 shapes (per-layer
    profile, docs/PERF.md round 4). This custom VJP swaps in the
    transpose of `_pairdot_conv`'s phase decomposition: reshape time
    into stride-sized phases so the dgrad becomes ``nb = ceil(k/s)``
    dense bf16 MXU dots over CONTIGUOUS time, overlap-added with static
    pads — no dilation, no scatter, no conv lowering. wgrad (used only
    when the model itself is trained, e.g. train/pretrain.py) is the
    matching ``nb`` einsums contracting over B·T_out.
    """
    return jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride,),
        padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )


def _hybrid_conv_fwd(x, w, stride):
    return _hybrid_conv(x, w, stride), (x, w)


def _hybrid_conv_bwd(stride, res, dy):
    x, w = res
    B, T, C = x.shape
    k = w.shape[0]
    s, L = stride, dy.shape[1]
    nb = -(-k // s)
    lz = L - 1 + nb
    need = lz * s
    wb = _pairdot_blocks(w, s)  # (nb, s*C, O)
    # dgrad: dz[u] = Σ_j dy[u-j] @ wb[j]ᵀ over the (B, lz, s·C) phase
    # grid, then un-reshape phases back into time.
    dz = None
    for j in range(nb):
        d = jnp.dot(dy, wb[j].T, preferred_element_type=jnp.float32)
        d = jnp.pad(d, [(0, 0), (j, nb - 1 - j), (0, 0)])
        dz = d if dz is None else dz + d
    dx = dz.reshape(B, need, C)
    # pairdot's forward geometry: x is sliced to `need` when longer
    # (those trailing samples never enter the conv ⇒ zero grad) and
    # zero-padded when shorter (those grads are dropped).
    dx = dx[:, :T, :] if need >= T else jnp.pad(dx, [(0, 0), (0, T - need), (0, 0)])
    # wgrad: dwb[j] = z[:, j:j+L]ᵀ @ dy, contraction over B·L.
    z = x if need <= T else jnp.pad(x, [(0, 0), (0, need - T), (0, 0)])
    z = z[:, :need, :].reshape(B, lz, s * C)
    dwb = jnp.stack([
        jnp.einsum(
            "bts,bto->so", z[:, j : j + L, :], dy,
            preferred_element_type=jnp.float32,
        )
        for j in range(nb)
    ])
    dw = dwb.reshape(nb * s, C, -1)[:k]
    return dx.astype(x.dtype), dw.astype(w.dtype)


_hybrid_conv.defvjp(_hybrid_conv_fwd, _hybrid_conv_bwd)


class ConvLayer(nn.Module):
    cfg: Wav2Vec2Config
    layer_id: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, T, C_in)
        cfg = self.cfg
        out_ch = cfg.conv_dim[self.layer_id]
        k = cfg.conv_kernel[self.layer_id]
        s = cfg.conv_stride[self.layer_id]
        in_ch = x.shape[-1]
        kernel = self.param(
            "conv_kernel",
            nn.initializers.lecun_normal(),
            (k, in_ch, out_ch),  # WIO layout, shared by every impl
            jnp.float32,
        )
        w = kernel.astype(cfg.dtype)
        xc = x.astype(cfg.dtype)
        if cfg.conv_impl == "conv":
            # no preferred_element_type here: its f32 output makes the
            # transposed-conv VJP see an f32 cotangent against a bf16
            # kernel (dtype-mismatch error); the MXU still accumulates
            # in f32 internally, and a norm layer follows immediately.
            x = jax.lax.conv_general_dilated(
                xc, w,
                window_strides=(s,),
                padding="VALID",
                dimension_numbers=("NWC", "WIO", "NWC"),
            )
        elif cfg.conv_impl == "pairdot":
            x = _pairdot_conv(xc, w, s)
        elif cfg.conv_impl == "hybrid":
            x = _hybrid_conv(xc, w, s)
        elif cfg.conv_impl == "tapdot" and in_ch > 1:
            t_out = (xc.shape[1] - k) // s + 1
            span = (t_out - 1) * s + 1
            acc = jnp.zeros((xc.shape[0], t_out, out_ch), jnp.float32)
            for r in range(k):
                acc = acc + jnp.dot(
                    xc[:, r : r + span : s, :], w[r],
                    preferred_element_type=jnp.float32,
                )
            x = acc
        else:
            patches = _im2col(xc, k, s)  # (B, T', k*in)
            x = jnp.dot(
                patches, w.reshape(k * in_ch, out_ch),
                preferred_element_type=jnp.float32,
            )
        x = x.astype(cfg.dtype)
        if cfg.conv_bias:
            bias = self.param("conv_bias", nn.initializers.zeros, (out_ch,), jnp.float32)
            x = x + bias.astype(cfg.dtype)
        if cfg.feat_extract_norm == "group" and self.layer_id == 0:
            # GroupNorm with num_groups == channels (per-channel instance
            # norm over time), as in the base checkpoint.
            x = _FeNorm(axis=1, eps=cfg.layer_norm_eps, out_dtype=cfg.dtype,
                        name="layer_norm")(x)
        elif cfg.feat_extract_norm == "layer":
            x = _FeNorm(axis=-1, eps=cfg.layer_norm_eps, out_dtype=cfg.dtype,
                        name="layer_norm")(x)
        x = nn.gelu(x, approximate=_fe_gelu_approximate(cfg))
        if self.layer_id < cfg.remat_fe_save_layers:
            x = checkpoint_name(x, "fe_out")
        return x


def _fe_gelu_approximate(cfg: Wav2Vec2Config) -> bool:
    """Resolve ``cfg.fe_gelu`` to nn.gelu's ``approximate`` flag."""
    if cfg.fe_gelu == "exact":
        return False
    if cfg.fe_gelu == "tanh":
        return True
    if cfg.fe_gelu == "auto":
        return cfg.dtype == jnp.dtype(jnp.bfloat16)
    raise ValueError(
        f"fe_gelu must be 'auto' | 'exact' | 'tanh', got {cfg.fe_gelu!r}"
    )


class _FeNorm(nn.Module):
    """Feature-extractor normalization with f32 statistics but a
    compute-dtype OUTPUT.

    Functionally ``nn.GroupNorm(num_groups=C)`` over time (``axis=1``) or
    ``nn.LayerNorm`` over channels (``axis=-1``) followed by a cast —
    but emitting bf16 from the same fusion halves the largest FE buffer
    XLA materializes: a profiled f32 (B, 31999, 512) normalized output
    written in forward AND in the remat recompute (~2 GB each at B=32).
    Parameter names/shapes match the flax norms, so HF conversion and
    checkpoints are unchanged.
    """

    axis: int
    eps: float
    out_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, axis=self.axis, keepdims=True)
        # E[x²] − E[x]² — the same single-pass formula flax uses
        var = jnp.mean(jnp.square(x32), axis=self.axis, keepdims=True) - jnp.square(mu)
        y = (x32 - mu) * jax.lax.rsqrt(var + self.eps)
        return (y * scale + bias).astype(self.out_dtype)


class FeatureExtractor(nn.Module):
    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, audio: jnp.ndarray) -> jnp.ndarray:  # (B, T)
        x = audio[..., None].astype(self.cfg.dtype)  # (B, T, 1)
        for i in range(len(self.cfg.conv_dim)):
            x = ConvLayer(self.cfg, i, name=f"conv_layers_{i}")(x)
        return x  # (B, frames, conv_dim[-1])


class FeatureProjection(nn.Module):
    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = _LayerNorm(epsilon=self.cfg.layer_norm_eps, name="layer_norm")(x)
        return nn.Dense(
            self.cfg.hidden_size,
            dtype=self.cfg.dtype,
            param_dtype=jnp.float32,
            name="projection",
        )(x)


# ---------------------------------------------------------------------------
# Positional conv embedding (grouped conv with weight normalization)
# ---------------------------------------------------------------------------


class PositionalConvEmbedding(nn.Module):
    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, T, H)
        cfg = self.cfg
        K = cfg.num_conv_pos_embeddings
        groups = cfg.num_conv_pos_embedding_groups
        H = cfg.hidden_size
        # Weight-normalized grouped conv, stored as (g, v) like the torch
        # parametrization (dim=2: one gain per kernel tap).
        v = self.param(
            "weight_v",
            nn.initializers.normal(stddev=0.02),
            (K, H // groups, H),  # lax WIO layout
            jnp.float32,
        )
        g = self.param("weight_g", nn.initializers.ones, (1, 1, K), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (H,), jnp.float32)
        # Per-tap normalization over (out, in) — matches torch weight_norm
        # with dim=2 on an (out, in, K) kernel.
        norm = jnp.sqrt(jnp.sum(v**2, axis=(1, 2), keepdims=True) + 1e-12)  # (K,1,1)
        w = v / norm * jnp.transpose(g, (2, 1, 0))  # (K, in, out)

        pad = K // 2
        y = jax.lax.conv_general_dilated(
            x.astype(cfg.dtype),
            w.astype(cfg.dtype),
            window_strides=(1,),
            padding=[(pad, pad)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=groups,
        )
        y = y + bias.astype(cfg.dtype)
        if K % 2 == 0:  # torch SamePad removes the trailing extra frame
            y = y[:, :-1, :]
        return nn.gelu(y, approximate=False)


# ---------------------------------------------------------------------------
# Transformer encoder
# ---------------------------------------------------------------------------


@jax.custom_vjp
def _softmax_bf16(scores: jnp.ndarray) -> jnp.ndarray:
    """Softmax computed in f32 but emitted — and SAVED — in bfloat16.

    Plain ``softmax(x.astype(f32)).astype(bf16)`` keeps the f32 output
    alive as the softmax VJP residual *in addition to* the bf16 copy the
    attention dot needs — an extra O(B·H·T²) f32 buffer. The custom VJP
    evaluates the exact softmax gradient from the bf16 probabilities
    instead (their quantization error is ~1e-3 relative, far below the
    bf16 matmul noise already present in the backward pass)."""
    return jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(jnp.bfloat16)


def _softmax_bf16_fwd(scores):
    out = _softmax_bf16(scores)
    return out, out


def _softmax_bf16_bwd(probs, g):
    p = probs.astype(jnp.float32)
    g = g.astype(jnp.float32)
    dx = p * (g - jnp.sum(g * p, axis=-1, keepdims=True))
    return (dx,)


_softmax_bf16.defvjp(_softmax_bf16_fwd, _softmax_bf16_bwd)


class _ProjParams(nn.Module):
    """Declares a Dense layer's params (kernel/bias, same names/layout as
    ``nn.Dense``) without applying it — used by the fused-QKV path so the
    checkpoint tree stays HF-convertible."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (in_features, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return kernel, bias


def _manual_shard(fn, mesh, batch: int, heads: int):
    """Partition a per-(row, head) independent attention kernel manually.

    ``fn`` maps three ``(batch, T, heads, d)`` arrays to one; batch rows
    ride the mesh's ``data`` axis and heads its ``model`` axis (the
    layout the surrounding step/tp shardings already give q/k/v,
    attack/step.py + parallel/tp.py). Each device runs the Pallas kernel
    on its local shard — without this manual region GSPMD has no
    partitioning rule for a ``pallas_call`` and replicates the whole
    problem onto every chip. No collectives are needed inside: attention
    mixes only the T axis, which stays unsharded.

    An axis the traced shape does not divide over is dropped from the
    specs (shard_map is strict where GSPMD pads): e.g. ``--accum_steps``
    microbatches smaller than the data axis run the kernel replicated
    along ``data`` — same semantics as the pre-manual-region program —
    instead of failing at trace time. Identity when the mesh is absent
    or no axis survives.
    """
    if mesh is None:
        return fn
    shape = dict(mesh.shape)
    data = "data" if 1 < shape.get("data", 1) and batch % shape["data"] == 0 else None
    model = (
        "model" if 1 < shape.get("model", 1) and heads % shape["model"] == 0 else None
    )
    if data is None and model is None:
        return fn
    spec = jax.sharding.PartitionSpec(data, None, model, None)
    return jax.shard_map(
        fn, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )


class SelfAttention(nn.Module):
    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, T, H)
        cfg = self.cfg
        H, nh = cfg.hidden_size, cfg.num_attention_heads
        hd = H // nh
        dense = lambda name: nn.Dense(
            H, dtype=cfg.dtype, param_dtype=jnp.float32, name=name
        )
        if cfg.fused_qkv:
            s = hd**-0.5
            qk, qb = _ProjParams(H, name="q_proj")(H)
            kk, kb = _ProjParams(H, name="k_proj")(H)
            vk, vb = _ProjParams(H, name="v_proj")(H)
            w = jnp.concatenate([qk * s, kk, vk], axis=1).astype(cfg.dtype)
            b = jnp.concatenate([qb * s, kb, vb]).astype(cfg.dtype)
            qkv = jnp.dot(x.astype(cfg.dtype), w) + b
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = dense("q_proj")(x) * (hd**-0.5)
            k = dense("k_proj")(x)
            v = dense("v_proj")(x)

        def split(t):
            return t.reshape(t.shape[:-1] + (nh, hd))

        q, k, v = split(q), split(k), split(v)
        mesh = cfg.attn_mesh
        # Per-device head count must mirror _manual_shard's axis-drop
        # rule: when heads don't divide the model axis the manual region
        # drops that axis and every device runs ALL nh heads, so the
        # VMEM feasibility check below must not assume the shard.
        tp_n = 1
        if mesh is not None and "model" in mesh.axis_names:
            n_model = int(mesh.shape["model"])
            if n_model > 1 and nh % n_model == 0:
                tp_n = n_model
        impl = cfg.attention_impl
        if impl == "auto":
            # fused is the measured-fastest TPU path at the attack's
            # short sequences but its whole-problem scratch outgrows VMEM
            # on long clips (~>13 s @ 16 kHz) — degrade to flash instead
            # of erroring; non-TPU backends take the dense XLA path
            from paa_tpu.ops.pallas import attention as fused_attn

            if jax.default_backend() != "tpu":
                impl = "xla"
            else:
                # feasibility is per DEVICE: under tensor parallelism each
                # chip's kernel sees nh/tp heads (parallel/tp.py), so the
                # lane width and VMEM footprint shrink with the shard
                impl = (
                    "fused"
                    if fused_attn.fits(x.shape[1], nh // tp_n, hd, cfg.dtype.itemsize)
                    else "flash"
                )
        if impl == "xla":
            # The fused path names its (padded, transposed) kernel inputs
            # inside fused_attention; the dense path names them here so
            # the "save_resid" whitelist policy covers both.
            q = checkpoint_name(q, "attn_qkv")
            k = checkpoint_name(k, "attn_qkv")
            v = checkpoint_name(v, "attn_qkv")
        if impl == "fused":
            from paa_tpu.ops.pallas import attention as fused_attn

            kern = _manual_shard(
                functools.partial(
                    fused_attn.fused_attention, interpret=cfg.attn_interpret
                ),
                mesh, q.shape[0], nh,
            )
            ctx = kern(
                q.astype(cfg.dtype), k.astype(cfg.dtype), v.astype(cfg.dtype)
            )
        elif impl == "flash":
            kern = _manual_shard(
                lambda q_, k_, v_: _flash_attention(
                    q_, k_, v_, cfg.dtype, block=cfg.flash_block
                ),
                mesh, q.shape[0], nh,
            )
            ctx = kern(q, k, v)
        else:
            # scores stay in compute dtype (bf16): the O(T²) buffer is
            # the encoder's largest HBM write/read, and the softmax
            # below re-subtracts the row max in f32 anyway — bf16's
            # ~3-digit mantissa on pre-softmax logits is well under the
            # noise of the bf16 matmuls that produced q and k.
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k)
            scores = checkpoint_name(scores, "attn_scores")
            if cfg.dtype == jnp.bfloat16:
                probs = _softmax_bf16(scores)
            else:
                probs = jax.nn.softmax(
                    scores.astype(jnp.float32), axis=-1
                ).astype(cfg.dtype)
            probs = checkpoint_name(probs, "attn_probs")
            ctx = jnp.einsum(
                "bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32
            )
        ctx = ctx.astype(cfg.dtype).reshape(x.shape)
        return checkpoint_name(dense("out_proj")(ctx), "attn_out")


def _flash_attention(q, k, v, dtype, block: int = 0) -> jnp.ndarray:
    """Pallas TPU flash attention over ``(B, T, heads, head_dim)`` inputs
    (q pre-scaled). T is zero-padded to a lane multiple; padded keys are
    masked out via segment ids so real queries see exactly the real keys,
    and padded query rows are sliced off after the kernel. ``block`` > 0
    overrides the kernel's 128×128 default block size (clamped to the
    largest divisor of the padded sequence ≤ the request — the stock
    kernel requires seq_len % block == 0)."""
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    from paa_tpu.ops.pallas.attention import pad_seq

    B, T, nh, hd = q.shape
    Tp = pad_seq(T)
    block_sizes = None
    if block > 0:
        b = max(128, min(block, Tp) // 128 * 128)
        while Tp % b:  # terminates: any 128-multiple descends to 128, and Tp % 128 == 0
            b -= 128
        block_sizes = fa.BlockSizes(
            block_q=b, block_k_major=b, block_k=b, block_b=1,
            block_q_major_dkv=b, block_k_major_dkv=b, block_k_dkv=b,
            block_q_dkv=b, block_k_major_dq=b, block_k_dq=b, block_q_dq=b,
        )
    pad = [(0, 0), (0, Tp - T), (0, 0), (0, 0)]
    to_bhtd = lambda t: jnp.transpose(jnp.pad(t, pad), (0, 2, 1, 3)).astype(dtype)
    seg = jnp.broadcast_to((jnp.arange(Tp) < T).astype(jnp.int32), (B, Tp))
    out = fa.flash_attention(
        to_bhtd(q), to_bhtd(k), to_bhtd(v),
        segment_ids=fa.SegmentIds(q=seg, kv=seg),
        sm_scale=1.0,
        block_sizes=block_sizes,
    )
    return jnp.transpose(out[:, :, :T, :], (0, 2, 1, 3))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _layernorm(x, gamma, beta, eps):
    """f32 LayerNorm whose backward residuals are (x̂ bf16, rstd) ONLY.

    Stock autodiff of the f32 flax LayerNorm keeps ~3 full-width f32
    copies per call (centered, normalized, scaled) as residuals; under
    the encoder layer scan those stack to six f32[L, B, T, H] buffers
    ≈ 3.5 GB per microbatch at the production shape — the single
    largest HBM cost in the profiled step. The classic LN input-grad
    needs only x̂ and rstd:
        dx = rstd · (dy·γ − mean(dy·γ) − x̂ · mean(dy·γ · x̂))
    Forward is exact f32, fast-variance like flax. Shapes follow flax
    broadcasting: gamma / beta are (..., H) reduced over the leading
    axes for their grads.
    """
    out, _ = _layernorm_fwd(x, gamma, beta, eps)
    return out


def _layernorm_fwd(x, gamma, beta, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    # fast variance (flax default): E[x²] − E[x]²
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xf - mean) * rstd
    out = xhat * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    # zero-size token carries the primal input dtype: the cotangent we
    # return for x must match it (bf16 under the encoder's compute dtype)
    # x̂ is stored in the layer's compute dtype (the input's): exact f32
    # for f32 models; bf16 under the production bf16 encoder, where the
    # rounding is backward-only and below the noise of the bf16 matmuls
    # that produced x (halves the largest remaining residual stack).
    return out, (xhat.astype(x.dtype), rstd, gamma, jnp.zeros((0,), x.dtype))


def _layernorm_bwd(eps, res, g):
    xhat_b, rstd, gamma, x_tok = res
    xhat = xhat_b.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    dxhat = gf * gamma.astype(jnp.float32)
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = (rstd * (dxhat - m1 - xhat * m2)).astype(x_tok.dtype)
    reduce_axes = tuple(range(g.ndim - 1))
    dgamma = jnp.sum(gf * xhat, axis=reduce_axes).astype(gamma.dtype)
    dbeta = jnp.sum(gf, axis=reduce_axes).astype(gamma.dtype)
    return dx, dgamma, dbeta


_layernorm.defvjp(_layernorm_fwd, _layernorm_bwd)


class _LayerNorm(nn.Module):
    """Drop-in for ``nn.LayerNorm(dtype=f32)`` with lean backward
    residuals (see ``_layernorm``). Param names/shapes match flax's
    ("scale", "bias"), so checkpoints stay HF-convertible."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        H = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (H,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (H,), jnp.float32)
        # stats/normalize in exact f32; the OUTPUT returns to the input's
        # dtype so the residual stream stays uniformly in the compute
        # dtype — f32 LN outputs otherwise ripple f32 copies of the
        # (B, T, H) stream through every layer's adds and matmul fusions
        return _layernorm(x, scale, bias, self.epsilon).astype(x.dtype)


@jax.custom_vjp
def _gelu(x: jnp.ndarray) -> jnp.ndarray:
    """gelu(approximate=False) whose ONLY backward residual is its input.

    Stock autodiff of erf-gelu leaves several unnamed (B, T, intermediate)
    chain-rule values in the residual set; blacklist remat policies
    (``save_cheap``) then stack them across the layer scan — profiled at
    2× bf16[12,32,499,3072] ≈ 2.4 GB per microbatch at the production
    shape. Funneling the backward through a custom VJP makes the input
    (named "ffn_hidden", so dropped and recomputed with one matmul) the
    single residual; the derivative is replayed from it bit-identically.
    """
    return nn.gelu(x, approximate=False)


def _gelu_fwd(x):
    return _gelu(x), (x,)


def _gelu_bwd(res, g):
    (x,) = res
    _, vjp = jax.vjp(lambda t: nn.gelu(t, approximate=False), x)
    (dx,) = vjp(g)
    # Barrier: without it XLA output-fuses this VPU-heavy erf/exp chain
    # into the downstream (B,T,4H)x(4H,H) cotangent matmul, serializing
    # VPU and MXU work inside one fusion (profiled ~49 TF/s vs a clean
    # dot); materializing dx once is cheaper.
    return (jax.lax.optimization_barrier(dx),)


_gelu.defvjp(_gelu_fwd, _gelu_bwd)


@jax.custom_vjp
def _ffn(y, ik, ib, ok, ob):
    """gelu MLP whose backward residuals are (y, weights) — the
    (B, T, 4H) hidden is recomputed with one matmul in the backward.

    A remat policy cannot drop the hidden: whatever barrier is placed,
    partial eval saves a saveable value one op upstream (measured: the
    bf16[L, B, T, 4H] stack persisted through checkpoint_name AND a
    nested jax.checkpoint). custom_vjp internals are opaque to partial
    eval, so this is the only construction that actually removes the
    stack (1.18 GB per microbatch at production shape). The unused
    weight/bias grads below are DCE'd by XLA when params are frozen
    (the attack differentiates w.r.t. the waveform only).
    """
    out, _ = _ffn_fwd(y, ik, ib, ok, ob)
    return out


def _ffn_fwd(y, ik, ib, ok, ob):
    h = jnp.dot(y, ik) + ib
    out = jnp.dot(nn.gelu(h, approximate=False), ok) + ob
    return out, (y, ik, ib, ok)


def _ffn_bwd(res, g):
    y, ik, ib, ok = res
    h = jnp.dot(y, ik) + ib
    a, gelu_vjp = jax.vjp(lambda t: nn.gelu(t, approximate=False), h)
    da = jnp.dot(g, ok.T)
    (dh,) = gelu_vjp(da)
    dy = jnp.dot(dh, ik.T)
    dik = jnp.einsum("...i,...j->ij", y, dh)
    dib = jnp.sum(dh, axis=tuple(range(dh.ndim - 1)))
    dok = jnp.einsum("...i,...j->ij", a, g)
    dob = jnp.sum(g, axis=tuple(range(g.ndim - 1)))
    return dy, dik, dib, dok, dob


_ffn.defvjp(_ffn_fwd, _ffn_bwd)


class FeedForward(nn.Module):
    """dense → gelu → dense via ``_ffn`` (lean-residual custom VJP) when
    ``remat_ffn`` is on. Params are declared via ``_ProjParams`` under
    the same names ``nn.Dense`` would use, so the checkpoint tree stays
    HF-convertible (reference weight layout: src/training_utils/
    build.py:225-231).
    """

    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        H = x.shape[-1]
        ik, ib = _ProjParams(cfg.intermediate_size, name="intermediate_dense")(H)
        ok, ob = _ProjParams(cfg.hidden_size, name="output_dense")(
            cfg.intermediate_size
        )
        d = cfg.dtype
        y = x.astype(d)
        if cfg.remat_ffn:
            return _ffn(y, ik.astype(d), ib.astype(d), ok.astype(d), ob.astype(d))
        h = jnp.dot(y, ik.astype(d)) + ib.astype(d)
        h = _gelu(checkpoint_name(h, "ffn_hidden"))
        return jnp.dot(h, ok.astype(d)) + ob.astype(d)


class EncoderLayer(nn.Module):
    """One transformer layer; pre- or post-LN per ``do_stable_layer_norm``."""

    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, x: jnp.ndarray, _=None):
        cfg = self.cfg
        # _LayerNorm (custom VJP) rather than nn.LayerNorm: under the
        # layer scan, stock LN autodiff stacks ~3 f32 (L, B, T, H)
        # residuals per call; this saves (x̂ bf16, rstd) instead.
        ln = lambda name: _LayerNorm(epsilon=cfg.layer_norm_eps, name=name)
        if cfg.do_stable_layer_norm:  # pre-LN (large-lv60)
            x = x + SelfAttention(cfg, name="attention")(ln("layer_norm")(x))
            x = x + FeedForward(cfg, name="feed_forward")(ln("final_layer_norm")(x))
        else:  # post-LN (base)
            x = ln("layer_norm")(x + SelfAttention(cfg, name="attention")(x))
            x = ln("final_layer_norm")(x + FeedForward(cfg, name="feed_forward")(x))
        return x.astype(cfg.dtype), None


class Encoder(nn.Module):
    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        x = x + PositionalConvEmbedding(cfg, name="pos_conv_embed")(x)
        if not cfg.do_stable_layer_norm:
            x = _LayerNorm(epsilon=cfg.layer_norm_eps, name="layer_norm")(x)
        x = x.astype(cfg.dtype)

        layer_cls = EncoderLayer
        if cfg.remat:
            policy = None
            if cfg.remat_policy == "save_cheap":
                policy = jax.checkpoint_policies.save_anything_except_these_names(
                    "attn_scores", "attn_probs", "ffn_hidden"
                )
            elif cfg.remat_policy == "save_resid":
                # Whitelist: save exactly what the backward NEEDS and
                # nothing else. The model runs frozen (grads flow only to
                # the input waveform), so matmul backwards never need
                # their input activations — only the attention kernel
                # (q, k, v, lse) and the gelu/LayerNorm nonlinearities
                # need residuals, and the latter are recomputed from the
                # layer carry + attn_out with one matmul per layer.
                # The blacklist "save_cheap" policy misses this: it
                # saves every UNNAMED neighbor (gelu's internal
                # (B, T, 3072) intermediates, softmax internals), which
                # profiled at ~2.4 GB of stacked residuals per
                # microbatch at the production shape.
                policy = jax.checkpoint_policies.save_only_these_names(
                    "attn_qkv", "attn_lse", "attn_out"
                )
            elif cfg.remat_policy == "no_probs":
                policy = jax.checkpoint_policies.save_anything_except_these_names(
                    "attn_scores", "attn_probs"
                )
            layer_cls = nn.remat(EncoderLayer, prevent_cse=False, policy=policy)
        # Stacked layers under scan: one traced layer, params with a
        # leading (num_layers,) axis.
        stack = nn.scan(
            layer_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=cfg.num_hidden_layers,
            unroll=min(cfg.encoder_unroll, cfg.num_hidden_layers),
            metadata_params={nn.meta.PARTITION_NAME: None},
        )(cfg, name="layers")
        x, _ = stack(x, None)

        if cfg.do_stable_layer_norm:
            x = _LayerNorm(epsilon=cfg.layer_norm_eps, name="layer_norm")(x)
        return x


# ---------------------------------------------------------------------------
# Full CTC model
# ---------------------------------------------------------------------------


class Wav2Vec2ForCTC(nn.Module):
    """Raw waveform ``(B, T)`` → CTC logits ``(B, frames, vocab)``.

    Equivalent surface to HF's ``Wav2Vec2ForCTC`` forward at eval time
    (dropout off, no spec-augment — the reference always runs the model
    frozen in eval mode, src/training_utils/train.py:118).
    """

    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, audio: jnp.ndarray) -> jnp.ndarray:
        if self.cfg.do_normalize:
            mu = jnp.mean(audio, axis=-1, keepdims=True)
            var = jnp.var(audio, axis=-1, keepdims=True)
            audio = (audio - mu) * jax.lax.rsqrt(var + 1e-7)
        fe_cls = FeatureExtractor
        if self.cfg.remat_feature_extractor:
            policy = None
            if self.cfg.remat_fe_save_layers > 0:
                # whitelist: early conv outputs become residuals, the
                # backward replay starts from the last saved layer
                policy = jax.checkpoint_policies.save_only_these_names("fe_out")
            fe_cls = nn.remat(FeatureExtractor, prevent_cse=False, policy=policy)
        x = fe_cls(self.cfg, name="feature_extractor")(audio)
        x = FeatureProjection(self.cfg, name="feature_projection")(x)
        x = Encoder(self.cfg, name="encoder")(x)
        # CTC head in float32 for stable log-softmax downstream.
        return nn.Dense(
            self.cfg.vocab_size,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            name="lm_head",
        )(x.astype(jnp.float32))


def init_params(cfg: Wav2Vec2Config, seed: int = 0, example_len: int = 4000):
    """Random-init parameters (used when no checkpoint is available).

    The init is jitted: un-jitted flax init dispatches thousands of tiny
    eager ops, which is minutes of round-trips on a remote-tunneled TPU.
    """
    model = Wav2Vec2ForCTC(cfg)
    rng = jax.random.PRNGKey(seed)
    init = jax.jit(model.init, static_argnums=())
    return init(rng, jnp.zeros((1, example_len), jnp.float32))["params"]
