"""Data pipeline tests: synthetic corpus, real-data adapters (fixture
LibriSpeech tree, mocked HF datasets), length filter, splits, collate."""

import importlib.util
import os
import sys
import types
import wave as wave_mod

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


# -- LibriSpeech-layout adapter (fixture tree, no network) --------------------


def _write_wav(path, wav, sr=16000):
    pcm = (np.clip(wav, -1, 1) * 32767.0).astype("<i2")
    with wave_mod.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(pcm.tobytes())


@pytest.fixture
def librispeech_tree(tmp_path):
    """Tiny LibriSpeech-layout tree: speaker/chapter/{*.trans.txt, *.wav}."""
    rng = np.random.default_rng(3)
    expected = {}
    for spk, chap, n_utts in (("19", "198", 3), ("26", "495", 2)):
        d = tmp_path / spk / chap
        d.mkdir(parents=True)
        lines = []
        for u in range(n_utts):
            utt = f"{spk}-{chap}-{u:04d}"
            text_u = f"UTTERANCE {spk} {chap} {u}"
            wav = rng.standard_normal(1600 + 100 * u).astype(np.float32) * 0.1
            _write_wav(str(d / f"{utt}.wav"), wav)
            expected[utt] = (text_u, len(wav))
            lines.append(f"{utt} {text_u}")
        (d / f"{spk}-{chap}.trans.txt").write_text("\n".join(lines) + "\n")
    return tmp_path, expected


def test_iter_librispeech_pairs(librispeech_tree):
    root, expected = librispeech_tree
    pairs = list(datasets._iter_librispeech_pairs(str(root)))
    assert len(pairs) == len(expected) == 5
    for path, text_u in pairs:
        utt = os.path.splitext(os.path.basename(path))[0]
        assert expected[utt][0] == text_u


def test_load_librispeech_decodes_and_caps(librispeech_tree):
    root, expected = librispeech_tree
    samples = datasets._load_librispeech(str(root), target_size=4, seed=5)
    assert len(samples) == 4  # capped below the 5 on disk
    for wav, sr, text_u in samples:
        assert sr == 16000 and wav.dtype == np.float32
        utt_lens = {v[1] for v in expected.values()}
        assert len(wav) in utt_lens


def test_load_dataset_tuples_librispeech_end_to_end(librispeech_tree):
    root, _ = librispeech_tree
    samples = datasets.load_dataset_tuples("LibreeSpeech", data_root=str(root))
    assert len(samples) == 5
    assert all(isinstance(t, str) and len(w) > 0 for (w, _, t) in samples)


def test_synthetic_words_knob_controls_clip_length():
    """--synthetic_words MIN,MAX sets utterance word counts so synthetic
    clips can match the production ~10 s shape (used by the on-chip
    production-shape sweep runs; ~0.46 s/word)."""
    samples = datasets.load_dataset_tuples(
        "synthetic", synthetic_samples=8, synthetic_words=(22, 26)
    )
    for wav, sr, text in samples:
        assert 22 <= len(text.split()) <= 26
        assert 8.0 <= len(wav) / sr <= 13.0


def test_read_flac_error_gate_for_undecodable_stream(tmp_path):
    """Without soundfile, FLAC decodes via the bundled numpy decoder
    (data/flac.py, round-trip tested in test_flac.py); a stream it can't
    parse still fails with a clear gate error naming the soundfile
    escape hatch (never a bare ImportError/parse crash mid-pipeline)."""
    flac = tmp_path / "x.flac"
    flac.write_bytes(b"fLaC....")  # truncated: no valid metadata blocks
    if importlib.util.find_spec("soundfile") is not None:
        pytest.skip("soundfile installed; gate not reachable")
    with pytest.raises(RuntimeError, match="soundfile"):
        datasets._read_audio(str(flac))


# -- HF adapters (CommonVoice / TEDLIUM), mocked datasets module ---------------


class _FakeHFDataset:
    def __init__(self, rows):
        self.rows = rows

    def __len__(self):
        return len(self.rows)

    def __iter__(self):
        return iter(self.rows)

    def shuffle(self, seed):
        rng = np.random.default_rng(seed)
        return _FakeHFDataset([self.rows[i] for i in rng.permutation(len(self.rows))])

    def select(self, idx):
        return _FakeHFDataset([self.rows[i] for i in idx])

    def cast_column(self, name, audio):
        assert name == "audio" and audio.sampling_rate == 16_000
        return self


def _fake_datasets_module(text_key, expected_name):
    rng = np.random.default_rng(0)
    rows = [
        {
            "audio": {
                "array": rng.standard_normal(800).astype(np.float64),
                "sampling_rate": 16_000,
            },
            text_key: f"sentence number {i}",
        }
        for i in range(6)
    ]
    mod = types.ModuleType("datasets")

    class Audio:
        def __init__(self, sampling_rate):
            self.sampling_rate = sampling_rate

    def load_dataset(name, *a, **k):
        assert expected_name in name
        return _FakeHFDataset(rows)

    mod.Audio = Audio
    mod.load_dataset = load_dataset
    return mod


@pytest.mark.parametrize(
    "dataset,text_key,hub_name",
    [("CommonVoice", "sentence", "common_voice"), ("tedlium", "text", "tedlium")],
)
def test_hf_adapters_normalize_tuples(monkeypatch, dataset, text_key, hub_name):
    """The CommonVoice/TEDLIUM adapters (reference: build.py:135-163)
    shuffle, cap, resample-cast and normalize to (float32 wav, sr, text)."""
    monkeypatch.setitem(sys.modules, "datasets", _fake_datasets_module(text_key, hub_name))
    out = datasets._load_hf(dataset, seed=5, target_size=4)
    assert len(out) == 4
    for wav, sr, t in out:
        assert wav.dtype == np.float32 and sr == 16_000
        assert t.startswith("sentence number")


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


def test_pipeline_resamples_to_target_sr():
    """Non-16 kHz corpora are polyphase-resampled at pipeline build time
    instead of silently consumed at the wrong time scale."""
    rng = np.random.default_rng(0)
    t8 = np.linspace(0, 1, 8000, endpoint=False)
    tone8k = np.sin(2 * np.pi * 440 * t8).astype(np.float32)
    samples = [(tone8k.copy(), 8000, f"word{i}") for i in range(12)]
    pipe16 = pipeline.build_pipeline(samples, seed=0, target_sr=16000)
    # 1 s of 8 kHz audio becomes ~2 s at 16 kHz samples
    assert abs(pipe16.audio_len - 16000) <= 16
    # already-matching corpora are untouched
    samples16 = [(rng.standard_normal(16000).astype(np.float32), 16000, f"w{i}")
                 for i in range(12)]
    pipe_same = pipeline.build_pipeline(samples16, seed=0, target_sr=16000)
    assert pipe_same.audio_len == 16000
