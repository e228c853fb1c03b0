"""Data pipeline tests: synthetic corpus, length filter, splits, collate."""

import numpy as np
import pytest

from paa_tpu.data import datasets, pipeline, synthetic
from paa_tpu.ops import text


def test_synthetic_deterministic():
    a = list(synthetic.generate_corpus(num_samples=5, seed=7))
    b = list(synthetic.generate_corpus(num_samples=5, seed=7))
    for (wa, sra, ta), (wb, srb, tb) in zip(a, b):
        np.testing.assert_array_equal(wa, wb)
        assert ta == tb and sra == srb == 16000
    c = list(synthetic.generate_corpus(num_samples=5, seed=8))
    assert any(ta != tc for (_, _, ta), (_, _, tc) in zip(a, c))


def test_synthetic_in_range():
    for wav, sr, t in synthetic.generate_corpus(num_samples=10, seed=1):
        assert np.abs(wav).max() <= 1.0
        assert len(t.split()) >= 3
        assert wav.dtype == np.float32


def test_load_dataset_synthetic_small():
    full = datasets.load_dataset_tuples("synthetic", synthetic_samples=128)
    small = datasets.load_dataset_tuples("synthetic", synthetic_samples=128, small_data=True)
    assert len(small) < len(full)


def test_load_dataset_unavailable_sources_raise():
    with pytest.raises(RuntimeError):
        datasets.load_dataset_tuples("LibreeSpeech", data_root="/nonexistent")
    with pytest.raises(ValueError):
        datasets.load_dataset_tuples("bogus")


@pytest.fixture(scope="module")
def pipe():
    samples = datasets.load_dataset_tuples("synthetic", synthetic_samples=200)
    return pipeline.build_pipeline(samples, relative_audio_length=0.8, seed=5)


def test_split_sizes(pipe):
    n = len(pipe.train) + len(pipe.eval) + len(pipe.test)
    assert len(pipe.train) == int(0.8 * n) or abs(len(pipe.train) - 0.8 * n) <= 1
    assert len(pipe.eval) >= 1 and len(pipe.test) >= 1


def test_length_window(pipe):
    # every kept waveform fits within [q10, audio_len]
    for split in (pipe.train, pipe.eval, pipe.test):
        for w in split.waveforms:
            assert len(w) <= pipe.audio_len


def test_collate_shapes_and_padding(pipe):
    B = 16
    batches = list(pipe.eval.batches(B))
    assert len(batches) == pipe.eval.num_batches(B)
    for b in batches:
        assert b.audio.shape == (B, pipe.audio_len)
        assert b.labels.shape[0] == B
        assert set(np.unique(b.weights)) <= {0.0, 1.0}
    # all real rows covered exactly once
    covered = np.concatenate([b.indices[b.weights > 0] for b in batches])
    assert sorted(covered.tolist()) == list(range(len(pipe.eval)))
    # padding rows are silent with zero weight
    last = batches[-1]
    for j in range(B):
        if last.weights[j] == 0.0:
            assert np.all(last.audio[j] == 0.0)


def test_shuffle_changes_order_deterministically(pipe):
    b1 = next(pipe.train.batches(8, shuffle_rng=np.random.default_rng(1)))
    b2 = next(pipe.train.batches(8, shuffle_rng=np.random.default_rng(1)))
    b3 = next(pipe.train.batches(8, shuffle_rng=np.random.default_rng(2)))
    np.testing.assert_array_equal(b1.indices, b2.indices)
    assert not np.array_equal(b1.indices, b3.indices)


def test_labels_pretokenized_match_texts(pipe):
    split = pipe.test
    for i in range(min(5, len(split))):
        ids = split.labels[i][split.label_paddings[i] == 0.0]
        # label ids decode back to the cleaned transcript (uppercased)
        decoded = "".join(
            " " if int(k) == text.WORD_DELIM_ID else text.VOCAB[int(k)] for k in ids
        )
        assert decoded.lower() == split.texts[i]


def test_prefetch_preserves_stream(pipe):
    plain = [b.indices.tolist() for b in pipe.eval.batches(8)]
    pre = [
        np.asarray(b.indices).tolist()
        for b in pipeline.prefetch_to_device(pipe.eval.batches(8))
    ]
    assert plain == pre
