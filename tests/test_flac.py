"""Pure-numpy FLAC decoder tests (data/flac.py).

No FLAC encoder exists in this environment, so fixtures are built
byte-exactly by a minimal reference encoder below (the format is fully
bit-specifiable: the encoder writes STREAMINFO + frames with
constant/verbatim/fixed/LPC subframes and Rice residuals, exactly as
laid out in the FLAC format spec). Every test round-trips PCM through
encode → decode_flac and asserts bit-exact recovery — the property that
defines a correct lossless decoder.
"""

import numpy as np
import pytest

from paa_tpu.data import datasets, flac


class BitWriter:
    def __init__(self):
        self.bits = []

    def write(self, value: int, n: int):
        value &= (1 << n) - 1
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def write_signed(self, value: int, n: int):
        self.write(value & ((1 << n) - 1), n)

    def write_unary(self, q: int):
        self.bits.extend([0] * q)
        self.bits.append(1)

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def tobytes(self) -> bytes:
        self.align()
        return np.packbits(np.asarray(self.bits, dtype=np.uint8)).tobytes()


def _streaminfo(sr, channels, bps, total) -> bytes:
    w = BitWriter()
    w.write(4096, 16)  # min blocksize
    w.write(4096, 16)  # max blocksize
    w.write(0, 24)     # min framesize (unknown)
    w.write(0, 24)     # max framesize
    w.write(sr, 20)
    w.write(channels - 1, 3)
    w.write(bps - 1, 5)
    w.write(total, 36)
    for _ in range(16):
        w.write(0, 8)  # md5 (unverified)
    return w.tobytes()


def _rice_write(w: BitWriter, res: np.ndarray, param: int, escape_raw: int | None = None):
    """Residual block: method 0 (4-bit Rice), partition order 0."""
    w.write(0, 2)   # coding method 0
    w.write(0, 4)   # partition order 0
    if escape_raw is not None:
        w.write(0xF, 4)          # escape code
        w.write(escape_raw, 5)   # raw bit width
        for v in res:
            w.write_signed(int(v), escape_raw)
        return
    w.write(param, 4)
    for v in res:
        u = (int(v) << 1) ^ (int(v) >> 63)  # zigzag
        w.write_unary(u >> param)
        if param:
            w.write(u & ((1 << param) - 1), param)


def _subframe_verbatim(w, x, bps):
    w.write(0, 1)
    w.write(1, 6)
    w.write(0, 1)  # no wasted bits
    for v in x:
        w.write_signed(int(v), bps)


def _subframe_constant(w, value, bps):
    w.write(0, 1)
    w.write(0, 6)
    w.write(0, 1)
    w.write_signed(int(value), bps)


def _subframe_fixed(w, x, order, bps, param=4, escape_raw=None):
    w.write(0, 1)
    w.write(8 + order, 6)
    w.write(0, 1)
    for v in x[:order]:
        w.write_signed(int(v), bps)
    res = np.diff(np.asarray(x, np.int64), n=order)
    _rice_write(w, res, param, escape_raw)
    return res


def _subframe_lpc(w, x, coefs, shift, precision, bps, param=4):
    order = len(coefs)
    w.write(0, 1)
    w.write(31 + order, 6)
    w.write(0, 1)
    x = np.asarray(x, np.int64)
    for v in x[:order]:
        w.write_signed(int(v), bps)
    w.write(precision - 1, 4)
    w.write_signed(shift, 5)
    for c in coefs:
        w.write_signed(int(c), precision)
    res = []
    for n in range(order, len(x)):
        pred = sum(int(coefs[j]) * int(x[n - 1 - j]) for j in range(order)) >> shift
        res.append(int(x[n]) - pred)
    _rice_write(w, np.asarray(res), param)
    return res


def _frame(blocksize, channels, subframe_writers, frame_idx=0) -> bytes:
    """One frame: 16-bit blocksize code, sr/bps from STREAMINFO."""
    w = BitWriter()
    w.write(0b11111111111110, 14)
    w.write(0, 1)  # reserved
    w.write(0, 1)  # fixed blocksize strategy
    w.write(7, 4)  # blocksize: 16-bit field
    w.write(0, 4)  # sample rate: from STREAMINFO
    w.write(channels - 1, 4)  # independent channels
    w.write(0, 3)  # sample size: from STREAMINFO
    w.write(0, 1)  # reserved
    w.write(frame_idx, 8)  # UTF-8 number (single byte for idx < 128)
    w.write(blocksize - 1, 16)
    w.write(0, 8)  # header CRC-8 (unverified)
    for sub in subframe_writers:
        sub(w)
    w.align()
    w.write(0, 16)  # frame CRC-16 (unverified)
    return w.tobytes()


def _stream(sr, bps, pcm, frames: list[bytes]) -> bytes:
    channels = pcm.shape[1] if pcm.ndim > 1 else 1
    si = _streaminfo(sr, channels, bps, len(pcm))
    meta = bytes([0x80, 0, 0, len(si)]) + si  # last-block STREAMINFO
    return b"fLaC" + meta + b"".join(frames)


def _mono(x):
    return np.asarray(x, np.int64).reshape(-1)


def test_verbatim_roundtrip():
    rng = np.random.default_rng(0)
    x = _mono(rng.integers(-32768, 32768, size=200))
    frame = _frame(200, 1, [lambda w: _subframe_verbatim(w, x, 16)])
    pcm, sr = flac.decode_flac(_stream(16000, 16, x, [frame]))
    assert sr == 16000
    np.testing.assert_array_equal(pcm[:, 0], x)


def test_constant_subframe():
    x = np.full(64, -1234, np.int64)
    frame = _frame(64, 1, [lambda w: _subframe_constant(w, -1234, 16)])
    pcm, _ = flac.decode_flac(_stream(8000, 16, x, [frame]))
    np.testing.assert_array_equal(pcm[:, 0], x)


@pytest.mark.parametrize("order", [0, 1, 2, 3, 4])
def test_fixed_orders_roundtrip(order):
    # a smooth signal keeps high-order differences small (Rice-friendly)
    t = np.arange(160)
    x = np.round(3000 * np.sin(t / 9.0) + 40 * np.cos(t / 2.0)).astype(np.int64)
    frame = _frame(160, 1, [lambda w: _subframe_fixed(w, x, order, 16, param=6)])
    pcm, _ = flac.decode_flac(_stream(16000, 16, x, [frame]))
    np.testing.assert_array_equal(pcm[:, 0], x)


def test_fixed_with_escape_partition():
    rng = np.random.default_rng(1)
    x = _mono(rng.integers(-2000, 2000, size=96))
    frame = _frame(
        96, 1, [lambda w: _subframe_fixed(w, x, 1, 16, escape_raw=14)]
    )
    pcm, _ = flac.decode_flac(_stream(16000, 16, x, [frame]))
    np.testing.assert_array_equal(pcm[:, 0], x)


def test_lpc_roundtrip():
    t = np.arange(128)
    x = np.round(1000 * np.sin(t / 5.0)).astype(np.int64)
    coefs, shift, precision = [3, -1], 1, 12  # pred = (3·x[n-1] − x[n-2]) >> 1
    frame = _frame(
        128, 1, [lambda w: _subframe_lpc(w, x, coefs, shift, precision, 16, param=8)]
    )
    pcm, _ = flac.decode_flac(_stream(16000, 16, x, [frame]))
    np.testing.assert_array_equal(pcm[:, 0], x)


def test_multi_frame_and_total_truncation():
    rng = np.random.default_rng(2)
    x = _mono(rng.integers(-30000, 30000, size=300))
    f0 = _frame(128, 1, [lambda w: _subframe_verbatim(w, x[:128], 16)], 0)
    f1 = _frame(128, 1, [lambda w: _subframe_verbatim(w, x[128:256], 16)], 1)
    f2 = _frame(44, 1, [lambda w: _subframe_verbatim(w, x[256:], 16)], 2)
    pcm, _ = flac.decode_flac(_stream(16000, 16, x, [f0, f1, f2]))
    np.testing.assert_array_equal(pcm[:, 0], x)


def test_two_channel_independent():
    rng = np.random.default_rng(3)
    x = rng.integers(-32768, 32768, size=(80, 2)).astype(np.int64)
    frame = _frame(
        80, 2,
        [lambda w: _subframe_verbatim(w, x[:, 0], 16),
         lambda w: _subframe_verbatim(w, x[:, 1], 16)],
    )
    pcm, _ = flac.decode_flac(_stream(16000, 16, x, [frame]))
    np.testing.assert_array_equal(pcm, x)


def test_read_flac_file_contract(tmp_path):
    """datasets._read_flac falls back to the numpy decoder (soundfile is
    absent in this environment) and returns the (mono float32 [-1, 1),
    sr) contract of _read_wav — reference: build.py:118-133."""
    x = np.asarray([0, 16384, -16384, -32768, 32767] * 20, np.int64)
    frame = _frame(100, 1, [lambda w: _subframe_verbatim(w, x, 16)])
    path = tmp_path / "utt.flac"
    path.write_bytes(_stream(16000, 16, x, [frame]))
    wav, sr = datasets._read_flac(str(path))
    assert sr == 16000 and wav.dtype == np.float32
    np.testing.assert_allclose(wav, x / 32768.0, atol=0)


def test_unsupported_stream_keeps_error_gate(tmp_path):
    path = tmp_path / "bad.flac"
    path.write_bytes(b"fLaC" + b"\x00" * 16)
    with pytest.raises(RuntimeError, match="soundfile"):
        datasets._read_flac(str(path))


def test_librispeech_tree_with_flac_files(tmp_path):
    """End-to-end: a LibriSpeech-layout tree of FLAC files loads through
    load_dataset_tuples with no optional deps (the reference consumes
    stock FLAC LibriSpeech out of the box, build.py:118-133)."""
    d = tmp_path / "19" / "198"
    d.mkdir(parents=True)
    rng = np.random.default_rng(4)
    for k in range(3):
        x = _mono(rng.integers(-20000, 20000, size=64))
        frame = _frame(64, 1, [lambda w, x=x: _subframe_verbatim(w, x, 16)])
        (d / f"19-198-000{k}.flac").write_bytes(_stream(16000, 16, x, [frame]))
    (d / "19-198.trans.txt").write_text(
        "\n".join(f"19-198-000{k} HELLO WORLD {k}" for k in range(3)) + "\n"
    )
    samples = datasets.load_dataset_tuples(
        "LibreeSpeech", data_root=str(tmp_path), target_size=10
    )
    assert len(samples) == 3
    for wav, sr, text in samples:
        assert sr == 16000 and wav.shape == (64,) and "hello world" in text.lower()


# ---------------------------------------------------------------------------
# Library encoder (flac.encode_flac / write_flac) — the fixture encoder
# above is test-local; the library one backs tools/make_librispeech_flac
# and the stock-corpus end-to-end test below.
# ---------------------------------------------------------------------------


def test_library_encoder_roundtrip_int16():
    rng = np.random.default_rng(11)
    # spans two 4096-sample frames plus a partial tail
    pcm = rng.integers(-32768, 32768, size=9000).astype(np.int64)
    out, sr = flac.decode_flac(flac.encode_flac(pcm, 16000))
    assert sr == 16000
    np.testing.assert_array_equal(out[:, 0], pcm)


def test_library_encoder_roundtrip_float_and_stereo():
    rng = np.random.default_rng(12)
    x = rng.uniform(-0.9, 0.9, size=(5000, 2)).astype(np.float32)
    out, sr = flac.decode_flac(flac.encode_flac(x, 22050))
    assert sr == 22050 and out.shape == (5000, 2)
    expect = np.clip(np.round(x * 32768.0), -32768, 32767)
    np.testing.assert_array_equal(out, expect)


def test_library_encoder_crc_check_values():
    """The emitted CRCs are the real ones (poly 0x07 / 0x8005, init 0, no
    reflection) so external decoders accept the stream — pinned by the
    standard '123456789' check values."""
    assert flac._crc8(b"123456789") == 0xF4
    assert flac._crc16(b"123456789") == 0xFEE8


def test_library_encoder_frame_numbers_decode():
    """Multi-byte UTF-8-coded frame indices survive the round trip (a
    >128-frame stream exercises the 2-byte coding)."""
    br = flac._BitReader(flac._utf8_frame_number(0x7F))
    assert flac._read_utf8_number(br) == 0x7F
    br = flac._BitReader(flac._utf8_frame_number(200))
    assert flac._read_utf8_number(br) == 200
    br = flac._BitReader(flac._utf8_frame_number(70000))
    assert flac._read_utf8_number(br) == 70000


def test_write_flac_read_flac_file_contract(tmp_path):
    x = (np.sin(np.linspace(0, 40, 4000)) * 0.5).astype(np.float32)
    path = tmp_path / "tone.flac"
    flac.write_flac(str(path), x, 16000)
    y, sr = flac.read_flac(str(path))
    assert sr == 16000 and y.dtype == np.float32
    np.testing.assert_allclose(y, np.round(x * 32768.0) / 32768.0, atol=1e-7)


@pytest.mark.slow
def test_stock_flac_corpus_end_to_end(tmp_path):
    """The full stock-corpus path, end to end: a LibriSpeech-layout FLAC
    tree (tools/make_librispeech_flac) consumed by the REAL CLI —
    tree walk → numpy FLAC decode → quantile filter → collate → attack
    loop → artifact bundle (reference consumes stock FLAC LibriSpeech,
    build.py:118-133; this is the E3 path with no optional deps)."""
    import sys

    sys.path.insert(0, "tools")
    try:
        from make_librispeech_flac import build_corpus
    finally:
        sys.path.pop(0)

    corpus = tmp_path / "ls_flac"
    n = build_corpus(str(corpus), num_utterances=48, seed=5, min_words=2,
                     max_words=4)
    assert n == 48

    from paa_tpu.cli import parser as parser_lib, run_attack as cli

    args = parser_lib.create_arg_parser().parse_args([
        "--dataset", "LibreeSpeech", "--data_root", str(corpus),
        "--model", "wav2vec2-tiny", "--batch_size", "8",
        "--num_epochs", "1", "--optimizer_type", "pgd", "--lr", "5e-3",
        "--norm_type", "linf", "--linf_size", "1e-2",
        "--save_root", str(tmp_path / "run"), "--no_resume",
        "--num_items_to_inspect", "2", "--platform", "cpu",
    ])
    assert cli.main(args) == 0

    import json as _json
    results = None
    for dirpath, _dirs, files in __import__("os").walk(tmp_path / "run"):
        if "results.json" in files:
            results = _json.load(open(f"{dirpath}/results.json"))
            break
    assert results is not None and results["finished_training"]
    assert np.isfinite(results["best_train_score"]["ctc"])
    assert np.isfinite(results["final_test_perturbed"]["ctc"])
