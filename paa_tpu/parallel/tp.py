"""Tensor parallelism for the frozen wav2vec2 encoder (Megatron layout).

The reference never shards the model — its only scale-out is one whole
model per GPU (reference: submit_scan_range.py:52-66). On a TPU slice the
natural second axis is *tensor* parallelism over ICI: each encoder layer's
q/k/v and FFN-in projections are column-sharded (each chip owns
``num_heads / n_model`` attention heads and a ``4H / n_model`` slice of the
FFN hidden), and the out/FFN-out projections are row-sharded, so the only
cross-chip traffic is one all-reduce per residual branch — exactly the
Megatron-LM decomposition, expressed as GSPMD shardings instead of hand
collectives: we annotate the *parameters* with a ``model`` mesh axis and
XLA partitions every matmul and inserts the psums.

This composes with the attack's other axes: the batch stays sharded over
``data`` and the perturbation/optimizer state replicated, so a
``(data, model)`` mesh runs dp×tp with no code change in the step body
(attack/step.py accepts a per-leaf params sharding).

Why it matters here: the attack differentiates w.r.t. the *waveform*, so
the whole (frozen) model's activations sit on every chip at production
batch; tp divides the encoder weight bytes AND its activation slices per
chip, which is what lets wav2vec2-large-lv60 (24×1024, the committed
reference's target, build.py:229-230) fit alongside big batches on small
(16 GB) chips.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# Parameter-path suffixes → how the weight participates in the layer:
# column-parallel (output features sharded; the activation it produces is
# head/hidden-sliced) vs row-parallel (input features sharded; the matmul
# produces partial sums that XLA all-reduces over ``model``).
_COL_SUFFIXES = ("q_proj", "k_proj", "v_proj", "intermediate_dense")
_ROW_SUFFIXES = ("out_proj", "output_dense")


def param_spec(path_names: tuple[str, ...], ndim: int) -> P:
    """PartitionSpec for one parameter leaf, by its flax path.

    Encoder-layer params carry a leading stacked-layer axis L from the
    ``nn.scan`` stack (models/wav2vec2.py Encoder), so kernels are
    (L, in, out) and biases (L, out); the spec is written against the
    trailing dims so it covers both scanned and unscanned layouts.
    Everything outside the attention/FFN projections (layernorms, the
    conv feature extractor, lm_head) is small and stays replicated.
    """
    if len(path_names) >= 2:
        owner, leaf = path_names[-2], path_names[-1]
        if owner in _COL_SUFFIXES:
            # kernel (..., in, out) and bias (..., out): shard the output
            # features; downstream reshape (B,T,H)->(B,T,heads,hd) keeps
            # the sharding on the heads axis.
            return P(*([None] * (ndim - 1) + ["model"]))
        if owner in _ROW_SUFFIXES and leaf == "kernel":
            # kernel (..., in, out): shard the contraction dim; the
            # product is partial-summed over ``model`` (one all-reduce
            # per residual branch). Bias replicated — added post-psum.
            return P(*([None] * (ndim - 2) + ["model", None]))
    return P()


def param_specs(params) -> dict:
    """Pytree of PartitionSpecs mirroring ``params``."""

    def spec(path, x):
        names = tuple(str(getattr(k, "key", k)) for k in path)
        return param_spec(names, x.ndim)

    return jax.tree_util.tree_map_with_path(spec, params)


def param_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings for ``params`` on ``mesh``.

    Fully replicated when the mesh has no ``model`` axis (or a trivial
    one), so callers can use this unconditionally.
    """
    if "model" not in mesh.axis_names or mesh.shape["model"] <= 1:
        return jax.tree.map(lambda _: NamedSharding(mesh, P()), params)
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s), param_specs(params)
    )


def check_model_axis(mcfg, n_model: int) -> None:
    """Validate that ``n_model`` tensor-parallel shards divide the model's
    sharded dimensions (attention heads and FFN hidden)."""
    if n_model <= 1:
        return
    if mcfg.num_attention_heads % n_model != 0:
        raise ValueError(
            f"tensor-parallel size {n_model} must divide "
            f"num_attention_heads={mcfg.num_attention_heads}"
        )
    if mcfg.intermediate_size % n_model != 0:
        raise ValueError(
            f"tensor-parallel size {n_model} must divide "
            f"intermediate_size={mcfg.intermediate_size}"
        )


def shard_params(params, mesh: Mesh, shardings=None):
    """Place ``params`` on ``mesh`` with the tensor-parallel layout.
    Pass ``shardings`` (a :func:`param_shardings` result the caller
    already holds, e.g. for a step's ``in_shardings``) to skip
    re-deriving it."""
    return jax.device_put(
        params, shardings if shardings is not None else param_shardings(params, mesh)
    )
