"""Targeted-attack emission metrics (train/scoring.emission_metrics).

Pins the emission-detection logic on canned inputs, including a canned
LOGITS fixture driven through the real device decode path
(ctc.greedy_ids → text.decode_batch) — the same pipeline the loop's
eval pass feeds into the metric. The substring test mirrors the
reference's sus-routing detector (src/training_utils/save.py:86); the
full-repeated-phrase WER mirrors the targeted training label
(src/core/loss_helpers.py:13-15).
"""

from __future__ import annotations

import numpy as np
import pytest

from paa_tpu.ops import ctc as ctc_ops, text as text_ops
from paa_tpu.train import scoring


def test_emission_rate_substring_detection():
    preds = [
        "delete",                      # exact
        "please delete my files",      # embedded
        "deleted everything",          # substring of a longer word — the
                                       # reference's `in` test counts this
        "nothing to see here",         # miss
    ]
    m = scoring.emission_metrics(preds, "delete", target_reps=2)
    assert m["emission_rate"] == pytest.approx(3 / 4)


def test_emission_target_cleaning_and_case():
    # target goes through clean_transcripts: <unk> stripped, lowercased
    m = scoring.emission_metrics(
        ["say DELETE now"], "<unk> DeLeTe", target_reps=1
    )
    assert m["emission_rate"] == 1.0


def test_wer_to_target_perfect_control_is_zero():
    # predictions exactly equal to the repeated-target label
    full = " ".join(["delete"] * 3)
    m = scoring.emission_metrics([full, full], "delete", target_reps=3)
    assert m["wer_to_target"] == 0.0
    assert m["emission_rate"] == 1.0


def test_wer_to_target_counts_against_full_phrase():
    # one "delete" out of a 5-rep target: 4 deletions / 5 ref words,
    # over 2 utterances with the second fully wrong (5 substitutions...
    # actually 1 sub + 4 deletions). Just pin monotonicity + bounds.
    m_half = scoring.emission_metrics(["delete"], "delete", target_reps=5)
    m_full = scoring.emission_metrics(
        [" ".join(["delete"] * 5)], "delete", target_reps=5
    )
    assert m_full["wer_to_target"] == 0.0
    assert m_half["wer_to_target"] == pytest.approx(4 / 5)


def test_empty_preds_are_safe():
    m = scoring.emission_metrics([], "delete", target_reps=5)
    assert m["emission_rate"] == 0.0
    assert m["wer_to_target"] == float("inf")


def _logits_for(text: str, n_frames_pad: int = 4) -> np.ndarray:
    """One-hot-ish logits whose per-frame argmax CTC-decodes to ``text``:
    each token gets its own frame, repeats separated by an explicit
    blank frame, plus trailing blank padding."""
    ids = []
    prev = None
    for tok in text_ops.encode(text):
        if tok == prev:
            ids.append(text_ops.PAD_ID)
        ids.append(tok)
        prev = tok
    ids.extend([text_ops.PAD_ID] * n_frames_pad)
    logits = np.full((len(ids), text_ops.VOCAB_SIZE), -5.0, dtype=np.float32)
    logits[np.arange(len(ids)), ids] = 5.0
    return logits


def test_emission_from_canned_logits_fixture():
    """End-to-end: logits → greedy_ids → decode_batch → emission."""
    texts = ["delete delete delete", "hello world", "press delete now"]
    frames = [_logits_for(t) for t in texts]
    T = max(f.shape[0] for f in frames)
    batch = np.stack([
        np.concatenate(
            [f, np.tile(f[-1:], (T - f.shape[0], 1))], axis=0
        )  # pad with blank frames (argmax stays <pad>)
        for f in frames
    ])
    ids = np.asarray(ctc_ops.greedy_ids(batch))
    preds = [t.lower() for t in text_ops.decode_batch(ids)]
    assert preds == texts  # the fixture round-trips through real decode
    m = scoring.emission_metrics(preds, "delete", target_reps=3)
    assert m["emission_rate"] == pytest.approx(2 / 3)
    # first utterance IS the full 3-rep phrase → its wer_to_target is 0;
    # aggregate over the batch is strictly between 0 and 1
    assert 0.0 < m["wer_to_target"] < 1.0
