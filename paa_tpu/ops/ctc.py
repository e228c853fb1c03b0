"""CTC loss and greedy decode, fully on-device.

The reference gets its CTC loss from HF's ``Wav2Vec2ForCTC`` forward
(label padding → -100, blank = pad = 0, ``reduction="sum"``;
reference: src/core/loss_helpers.py:12-23) and decodes by argmax +
``processor.batch_decode`` on the host (loss_helpers.py:25-32). Here:

  * the loss is ``optax.ctc_loss`` over float32 logits with the same
    blank and the same *sum* reduction, so loss magnitudes are directly
    comparable to the reference's Table 1 scale (SURVEY.md §6),
  * greedy decode (argmax) runs on device; only the id→string mapping
    happens on host at report time (ops/text.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from paa_tpu.ops.text import PAD_ID


def ctc_loss(
    logits: jnp.ndarray,  # (B, T, V) float32
    labels: jnp.ndarray,  # (B, L) int32, PAD_ID at padded positions
    label_paddings: jnp.ndarray,  # (B, L) float32, 1.0 where padded
    reduction: str = "sum",
) -> jnp.ndarray:
    """CTC negative log likelihood with HF-compatible reduction.

    All frames are valid (fixed-length batches, see models/wav2vec2.py),
    so logit paddings are zero.
    """
    logit_paddings = jnp.zeros(logits.shape[:2], dtype=jnp.float32)
    per_example = optax.ctc_loss(
        logits.astype(jnp.float32),
        logit_paddings,
        labels,
        label_paddings,
        blank_id=PAD_ID,
    )
    if reduction == "sum":
        return jnp.sum(per_example)
    if reduction == "mean":
        # torch 'mean': per-example loss / target_length, then batch mean.
        target_lengths = jnp.maximum(jnp.sum(1.0 - label_paddings, axis=-1), 1.0)
        return jnp.mean(per_example / target_lengths)
    if reduction == "none":
        return per_example
    raise ValueError(f"Unknown reduction {reduction!r}")


def greedy_ids(logits: jnp.ndarray) -> jnp.ndarray:
    """Per-frame argmax ids ``(B, T)`` — the device half of greedy decode."""
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def collapse_mask(ids: jnp.ndarray) -> jnp.ndarray:
    """Device-side CTC collapse mask: True at frames that survive
    (first of each repeat run and not blank). Useful for on-device
    statistics without host transfer."""
    prev = jnp.pad(ids[..., :-1], ((0, 0), (1, 0)), constant_values=-1)
    return (ids != prev) & (ids != PAD_ID)
