"""CTC loss parity vs torch, tokenizer round-trips, and WER correctness."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from paa_tpu.ops import ctc, text, wer


# -- tokenizer ---------------------------------------------------------------


def test_encode_decode_round_trip():
    # decode_ids applies CTC collapse, so use a repeat-free string
    s = "heloward"
    ids = text.encode(s)
    assert text.decode_ids(np.asarray(ids)) == "HELOWARD"
    ids2 = text.encode("hi yo")
    assert text.decode_ids(np.asarray(ids2)) == "HI YO"


def test_clean_transcripts():
    out = text.clean_transcripts(["  Hello   <unk>WORLD  ", "a\tb\nc"])
    assert out == ["hello world", "a b c"]


def test_encode_batch_padding():
    labels, pads = text.encode_batch(["ab", "a"])
    assert labels.shape == (2, 2)
    assert labels[1, 1] == text.PAD_ID
    np.testing.assert_array_equal(pads, [[0.0, 0.0], [0.0, 1.0]])


def test_targeted_texts():
    got = text.targeted_texts("delete", 3, 2)
    assert got == ["delete delete delete"] * 2


def test_decode_collapses_ctc():
    # blank=0; repeats collapse; '|'(4) → space; specials dropped
    ids = np.array([5, 5, 0, 5, 4, 4, 6, 0, 0, 3, 6])
    assert text.decode_ids(ids) == "EE TT"


# -- CTC loss parity ----------------------------------------------------------


@pytest.mark.parametrize("reduction", ["sum", "mean", "none"])
def test_ctc_loss_matches_torch(rng, reduction):
    B, T, V, L = 3, 50, 32, 12
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    label_lens = [12, 7, 1]
    labels = np.full((B, L), text.PAD_ID, dtype=np.int32)
    paddings = np.ones((B, L), dtype=np.float32)
    for i, ln in enumerate(label_lens):
        labels[i, :ln] = rng.integers(5, V, size=ln)  # real chars only
        paddings[i, :ln] = 0.0

    ours = ctc.ctc_loss(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(paddings), reduction)

    log_probs = F.log_softmax(torch.from_numpy(logits), dim=-1).transpose(0, 1)
    t_labels = torch.from_numpy(labels.astype(np.int64))
    input_lengths = torch.full((B,), T, dtype=torch.long)
    target_lengths = torch.tensor(label_lens, dtype=torch.long)
    flattened = torch.cat([t_labels[i, :ln] for i, ln in enumerate(label_lens)])
    theirs = F.ctc_loss(
        log_probs,
        flattened,
        input_lengths,
        target_lengths,
        blank=text.PAD_ID,
        reduction=reduction if reduction != "none" else "none",
        zero_infinity=False,
    )
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=2e-4, atol=2e-4)


def test_ctc_loss_differentiable(rng):
    import jax

    B, T, V = 2, 30, 32
    logits = jnp.asarray(rng.standard_normal((B, T, V)).astype(np.float32))
    labels, pads = text.encode_batch(["hello", "world hi"])

    g = jax.grad(lambda lg: ctc.ctc_loss(lg, jnp.asarray(labels), jnp.asarray(pads)))(logits)
    assert g.shape == logits.shape
    assert bool(jnp.all(jnp.isfinite(g)))


def test_greedy_ids_and_collapse(rng):
    B, T, V = 2, 10, 32
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    ids = np.asarray(ctc.greedy_ids(jnp.asarray(logits)))
    np.testing.assert_array_equal(ids, logits.argmax(-1))
    mask = np.asarray(ctc.collapse_mask(jnp.asarray(ids)))
    assert mask.shape == ids.shape


# -- WER -----------------------------------------------------------------------


def test_wer_identity():
    assert wer.wer(["hello world"], ["hello world"]) == 0.0


def test_wer_known_values():
    # 1 substitution over 2 reference words
    assert wer.wer(["hello there"], ["hello world"]) == 0.5
    # deletion + insertion
    assert wer.wer(["a c"], ["a b c"]) == pytest.approx(1 / 3)
    # corpus-level pooling: (1 + 0) errors / (2 + 1) words
    assert wer.wer(["x y", "z"], ["x q", "z"]) == pytest.approx(1 / 3)


def test_wer_empty_cases():
    assert wer.wer([""], [""]) == 0.0
    assert wer.wer(["a b"], ["a b c d"]) == 0.5


def test_native_matches_numpy(rng):
    words = ["alpha", "beta", "gamma", "delta", "eps"]
    preds, refs = [], []
    for _ in range(50):
        preds.append(" ".join(rng.choice(words, size=rng.integers(0, 12))))
        refs.append(" ".join(rng.choice(words, size=rng.integers(1, 12))))
    fast = wer.batched_word_distances(preds, refs)
    # force the numpy path
    lib, tried = wer._lib, wer._lib_tried
    wer._lib, wer._lib_tried = None, True
    try:
        slow = wer.batched_word_distances(preds, refs)
    finally:
        wer._lib, wer._lib_tried = lib, tried
    np.testing.assert_array_equal(fast, slow)
