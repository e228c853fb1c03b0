"""Pure-numpy FLAC decoder tests (data/flac.py).

No FLAC encoder exists in this environment, so fixtures are built
byte-exactly by a minimal reference encoder below (the format is fully
bit-specifiable: the encoder writes STREAMINFO + frames with
constant/verbatim/fixed/LPC subframes and Rice residuals, exactly as
laid out in the FLAC format spec). Every test round-trips PCM through
encode → decode_flac and asserts bit-exact recovery — the property that
defines a correct lossless decoder.
"""

import os
import subprocess
import sys

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


# -- native C decoder parity (native/flacdec.c) -----------------------------


def _native_or_skip():
    lib = flac._load_native()
    if lib is None:
        pytest.skip("native FLAC decoder unavailable (no C toolchain)")
    return lib


def _parity_streams():
    """One stream per subset feature, built with the fixture writers."""
    rng = np.random.default_rng(11)
    streams = {}

    x = _mono(rng.integers(-32768, 32768, size=200))
    streams["verbatim"] = _stream(
        16000, 16, x, [_frame(200, 1, [lambda w: _subframe_verbatim(w, x, 16)])]
    )
    c = _mono([-1234] * 96)
    streams["constant"] = _stream(
        8000, 16, c, [_frame(96, 1, [lambda w: _subframe_constant(w, -1234, 16)])]
    )
    for order in range(5):
        xs = _mono(np.cumsum(rng.integers(-50, 50, size=160)))
        streams[f"fixed{order}"] = _stream(
            16000, 16, xs,
            [_frame(160, 1, [lambda w, xs=xs, o=order: _subframe_fixed(w, xs, o, 16)])],
        )
    xe = _mono(rng.integers(-2000, 2000, size=128))
    streams["escape"] = _stream(
        16000, 16, xe,
        [_frame(128, 1,
                [lambda w: _subframe_fixed(w, xe, 1, 16, escape_raw=14)])],
    )
    t = np.arange(256)
    xl = _mono(np.round(9000 * np.sin(2 * np.pi * 5 * t / 256)))
    streams["lpc"] = _stream(
        16000, 16, xl,
        [_frame(256, 1,
                [lambda w: _subframe_lpc(w, xl, [3172, -1606], 11, 14, 16)])],
    )
    x3 = _mono(rng.integers(-30000, 30000, size=300))
    streams["multiframe"] = _stream(
        16000, 16, x3,
        [_frame(128, 1, [lambda w: _subframe_verbatim(w, x3[:128], 16)], 0),
         _frame(128, 1, [lambda w: _subframe_verbatim(w, x3[128:256], 16)], 1),
         _frame(44, 1, [lambda w: _subframe_verbatim(w, x3[256:], 16)], 2)],
    )
    x2 = rng.integers(-32768, 32768, size=(80, 2)).astype(np.int64)
    streams["stereo_indep"] = _stream(
        16000, 16, x2,
        [_frame(80, 2,
                [lambda w: _subframe_verbatim(w, x2[:, 0], 16),
                 lambda w: _subframe_verbatim(w, x2[:, 1], 16)])],
    )
    # library-encoder stream (real CRCs, 4096 blocks, UTF-8 frame numbers)
    wav = (rng.standard_normal(9000) * 0.2).clip(-1, 1).astype(np.float32)
    streams["encoder"] = flac.encode_flac(wav, 16000)
    return streams


@pytest.mark.parametrize("name", [
    "verbatim", "constant", "fixed0", "fixed1", "fixed2", "fixed3", "fixed4",
    "escape", "lpc", "multiframe", "stereo_indep", "encoder",
])
def test_native_decoder_matches_python(name):
    """The C kernel reproduces the Python decoder bit-for-bit on every
    subset feature (the Python path is the behavioral oracle)."""
    lib = _native_or_skip()
    stream = _parity_streams()[name]
    want_pcm, want_sr = flac.decode_flac_py(stream)
    got = flac._native_call(lib, stream)
    assert got is not None, "native decoder rejected a supported stream"
    got_pcm, got_sr = got
    assert got_sr == want_sr
    np.testing.assert_array_equal(got_pcm, want_pcm)


def test_native_decoder_rejects_bad_stream_falls_back():
    """Unsupported/corrupt input: native returns an error code and
    decode_flac falls through to the Python decoder's FlacError."""
    lib = _native_or_skip()
    assert flac._native_call(lib, b"fLaC" + b"\x00" * 16) is None
    with pytest.raises(flac.FlacError):
        flac.decode_flac(b"fLaC" + b"\x00" * 16)


# -- stereo decorrelation + wasted bits (previously fixture-less paths) -----


def _frame_assign(blocksize, ch_assign, subframe_writers, frame_idx=0) -> bytes:
    """Like _frame but with an explicit channel-assignment code
    (8=left/side, 9=right/side, 10=mid/side)."""
    w = BitWriter()
    w.write(0b11111111111110, 14)
    w.write(0, 1)
    w.write(0, 1)
    w.write(7, 4)
    w.write(0, 4)
    w.write(ch_assign, 4)
    w.write(0, 3)
    w.write(0, 1)
    w.write(frame_idx, 8)
    w.write(blocksize - 1, 16)
    w.write(0, 8)
    for sub in subframe_writers:
        sub(w)
    w.align()
    w.write(0, 16)
    return w.tobytes()


def _subframe_verbatim_wasted(w, x, bps, wasted):
    """VERBATIM subframe with ``wasted`` wasted bits: stores x >> wasted
    at bps - wasted and the decoder shifts back."""
    w.write(0, 1)
    w.write(1, 6)
    w.write(1, 1)  # wasted-bits flag
    w.write_unary(wasted - 1)
    for v in x:
        assert int(v) % (1 << wasted) == 0
        w.write_signed(int(v) >> wasted, bps - wasted)


def _stereo_cases():
    rng = np.random.default_rng(21)
    l = rng.integers(-16000, 16000, size=120).astype(np.int64)
    r = rng.integers(-16000, 16000, size=120).astype(np.int64)
    side = l - r
    mid = (l + r) >> 1
    pcm = np.stack([l, r], axis=1)
    cases = {
        "left_side": _frame_assign(120, 8, [
            lambda w: _subframe_verbatim(w, l, 16),
            lambda w: _subframe_verbatim(w, side, 17),
        ]),
        "right_side": _frame_assign(120, 9, [
            lambda w: _subframe_verbatim(w, side, 17),
            lambda w: _subframe_verbatim(w, r, 16),
        ]),
        "mid_side": _frame_assign(120, 10, [
            lambda w: _subframe_verbatim(w, mid, 16),
            lambda w: _subframe_verbatim(w, side, 17),
        ]),
    }
    return pcm, cases


@pytest.mark.parametrize("mode", ["left_side", "right_side", "mid_side"])
def test_stereo_decorrelation_roundtrip(mode):
    pcm, cases = _stereo_cases()
    out, sr = flac.decode_flac_py(_stream(16000, 16, pcm, [cases[mode]]))
    assert sr == 16000
    np.testing.assert_array_equal(out, pcm)


@pytest.mark.parametrize("mode", ["left_side", "right_side", "mid_side"])
def test_stereo_decorrelation_native_parity(mode):
    lib = _native_or_skip()
    pcm, cases = _stereo_cases()
    stream = _stream(16000, 16, pcm, [cases[mode]])
    got = flac._native_call(lib, stream)
    assert got is not None
    np.testing.assert_array_equal(got[0], pcm)


def test_wasted_bits_roundtrip_and_native_parity():
    x = _mono(np.arange(-48, 48) * 8)  # divisible by 2^3
    frame = _frame(96, 1, [lambda w: _subframe_verbatim_wasted(w, x, 16, 3)])
    stream = _stream(16000, 16, x, [frame])
    out, _ = flac.decode_flac_py(stream)
    np.testing.assert_array_equal(out[:, 0], x)
    lib = _native_or_skip()
    got = flac._native_call(lib, stream)
    assert got is not None
    np.testing.assert_array_equal(got[0][:, 0], x)


# -- native loader resilience (cached/committed .so gone bad) ----------------


def _reset_native_loader():
    flac._lib = None
    flac._lib_tried = False


def test_corrupt_cached_so_triggers_rebuild(tmp_path):
    """A committed/cached _flacdec.so that cannot even be dlopen'd (wrong
    arch, truncated) must be rebuilt from source, not silently abandoned
    for the ~200x-slower numpy path. Runs in a subprocess: this process
    may already have the good library mapped, and the corruption must be
    swapped in via a NEW inode (os.replace) so that mapping stays valid."""
    _native_or_skip()
    good = open(flac._SO_PATH, "rb").read()
    try:
        bad = os.path.join(os.path.dirname(flac._SO_PATH), "_flacdec.bad")
        with open(bad, "wb") as f:
            f.write(b"\x7fELF garbage, not a shared object")
        os.replace(bad, flac._SO_PATH)
        proc = subprocess.run(
            [sys.executable, "-c",
             "from paa_tpu.data import flac\n"
             "lib = flac._load_native()\n"
             "assert lib is not None, 'loader gave up instead of rebuilding'\n"
             "assert flac._self_test(lib)\n"],
            capture_output=True, text=True, timeout=120,
        )
        assert proc.returncode == 0, proc.stderr
    finally:
        tmp = flac._SO_PATH + ".orig"
        with open(tmp, "wb") as f:
            f.write(good)
        os.replace(tmp, flac._SO_PATH)


def test_self_test_covers_non_verbatim_paths():
    """The self-test probes every subset feature, not just the VERBATIM
    frames our own encoder emits — a stale kernel with a broken LPC or
    Rice path must fail it."""
    streams = flac._golden_parity_streams()
    assert len(streams) >= 8
    # decode each with the oracle; collectively they must exercise FIXED,
    # LPC, stereo decorrelation (2-channel), and multiframe streams
    shapes = [flac.decode_flac_py(s)[0].shape for s in streams]
    assert any(c == 2 for (_, c) in shapes), "no stereo probe"
    assert any(c == 1 for (_, c) in shapes), "no mono probe"

    class _RejectsEverything:
        pass

    bad = _RejectsEverything()
    # load the REAL lib before patching: patching first would make
    # _load_native's own self-test run against the stub, fail, and pin
    # the ~200x-slower numpy path for the whole process
    lib = _native_or_skip()
    orig = flac._native_call
    try:
        calls = {"n": 0}

        def fake_call(_lib, data):
            calls["n"] += 1
            # pass the encoder probe, reject the first golden stream
            return orig(lib, data) if calls["n"] == 1 else None

        flac._native_call = fake_call
        assert not flac._self_test(bad)
    finally:
        flac._native_call = orig
        _reset_native_loader()


def test_wasted_bits_exceeding_bps_is_flac_error():
    """wasted >= bps must raise FlacError (not a bare numpy ValueError
    escaping the datasets._read_flac decode-error gate)."""
    w = BitWriter()
    w.write(0, 1)
    w.write(1, 6)   # VERBATIM
    w.write(1, 1)   # wasted-bits flag
    w.write_unary(15)  # wasted = 16 == bps
    frame_w = BitWriter()
    frame_w.write(0b11111111111110, 14)
    frame_w.write(0, 2)
    frame_w.write(7, 4)
    frame_w.write(0, 4)
    frame_w.write(0, 4)
    frame_w.write(0, 3)
    frame_w.write(0, 1)
    frame_w.write(0, 8)
    frame_w.write(31, 16)  # blocksize 32
    frame_w.write(0, 8)
    frame_w.bits.extend(w.bits)
    frame_w.align()
    frame_w.write(0, 16)
    x = _mono(np.zeros(32))
    stream = _stream(16000, 16, x, [frame_w.tobytes()])
    with pytest.raises(flac.FlacError):
        flac.decode_flac_py(stream)
    with pytest.raises(flac.FlacError):
        flac.decode_flac(stream)  # native path must also reject → gate holds


def test_streaminfo_after_other_metadata_scales_correctly():
    """STREAMINFO may sit behind other metadata blocks; read_flac must
    still find the true bps instead of reading padding bytes as bps=1
    and mis-scaling the audio 32768x."""
    rng = np.random.default_rng(5)
    x = _mono(rng.integers(-32768, 32768, size=64))
    frame = _frame(64, 1, [lambda w: _subframe_verbatim(w, x, 16)])
    si = _streaminfo(16000, 1, 16, len(x))
    padding = bytes([0x01, 0, 0, 4]) + b"\x00" * 4  # PADDING, not last
    stream = (b"fLaC" + padding + bytes([0x80, 0, 0, len(si)]) + si + frame)
    # the decoder itself accepts this layout
    pcm, sr = flac.decode_flac_py(stream)
    np.testing.assert_array_equal(pcm[:, 0], x)
    assert flac._stream_bps(stream) == 16
    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".flac", delete=False) as f:
        f.write(stream)
        path = f.name
    try:
        wave, sr2 = flac.read_flac(path)
        assert sr2 == 16000
        np.testing.assert_allclose(wave, x.astype(np.float32) / 32768.0, atol=0)
    finally:
        os.unlink(path)


def test_fuzz_mutations_keep_the_error_contract_and_parity():
    """Seeded fuzz over byte-mutated, truncated, and garbage streams:
    the Python decoder raises nothing but FlacError (the
    datasets._read_flac gate relies on it), and whenever the C kernel
    ACCEPTS a stream the Python oracle must accept it with bit-identical
    output — a native-accepts/python-rejects divergence would make
    decode_flac's result depend on which path ran."""
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(12000) * 0.2).clip(-1, 1).astype(np.float32)
    base = flac.encode_flac(wav, 16000)
    lib = flac._load_native()

    def check(data: bytes):
        py_out = None
        try:
            py_out = flac.decode_flac_py(data)
        except flac.FlacError:
            pass  # the one allowed exception type
        if lib is not None:
            nat = flac._native_call(lib, data)
            if nat is not None:
                assert py_out is not None, "native accepted, python rejected"
                assert nat[1] == py_out[1]
                np.testing.assert_array_equal(nat[0], py_out[0])

    for _ in range(400):  # byte mutations
        data = bytearray(base)
        for _ in range(int(rng.integers(1, 4))):
            data[int(rng.integers(0, len(data)))] = int(rng.integers(0, 256))
        check(bytes(data))
    for cut in range(0, len(base), 997):  # truncations
        check(base[:cut])
    for t in range(100):  # garbage
        n = int(rng.integers(0, 300))
        data = bytes(rng.integers(0, 256, size=n, dtype=np.uint8))
        check((b"fLaC" + data) if t % 2 else data)
