"""Torch-free checkpoint readers vs real torch.save / safetensors bytes.

The quality-parity gap closed here: the attack can ingest the reference's
actual frozen-model weights (model.safetensors or pytorch_model.bin,
reference: src/training_utils/build.py:225-231) without torch or network
at attack time. torch IS available in the test environment, so we write
genuine ``torch.save`` archives and assert byte-exact recovery.
"""

import numpy as np
import pytest
import torch

from paa_tpu.models import checkpoint_io, convert, wav2vec2


def _tiny_torch_state_dict(seed=0):
    from transformers import Wav2Vec2ForCTC as TorchW2V

    from tests.test_wav2vec2 import _hf_config

    cfg = wav2vec2.get_config("wav2vec2-tiny")
    torch.manual_seed(seed)
    return TorchW2V(_hf_config(cfg)).eval().state_dict(), cfg


def test_torch_bin_roundtrip(tmp_path):
    sd, _ = _tiny_torch_state_dict()
    path = tmp_path / "pytorch_model.bin"
    torch.save(sd, path)

    ours = checkpoint_io.load_state_dict(str(path))
    assert set(ours) == set(sd)
    for k, v in sd.items():
        np.testing.assert_array_equal(ours[k], v.numpy(), err_msg=k)


def test_torch_bin_noncontiguous_and_dtypes(tmp_path):
    sd = {
        "t.f32": torch.randn(3, 5),
        "t.f16": torch.randn(4).half(),
        "t.bf16": torch.randn(2, 3).bfloat16(),
        "t.i64": torch.arange(6).reshape(2, 3),
        "t.transposed": torch.randn(3, 4).t(),  # non-contiguous strides
        "t.scalar": torch.tensor(3.5),
    }
    path = tmp_path / "mixed.bin"
    torch.save(sd, path)
    ours = checkpoint_io.load_torch_bin(str(path))
    np.testing.assert_array_equal(ours["t.f32"], sd["t.f32"].numpy())
    np.testing.assert_array_equal(ours["t.f16"], sd["t.f16"].numpy())
    # bf16 upcast is exact
    np.testing.assert_array_equal(ours["t.bf16"], sd["t.bf16"].float().numpy())
    np.testing.assert_array_equal(ours["t.i64"], sd["t.i64"].numpy())
    np.testing.assert_array_equal(ours["t.transposed"], sd["t.transposed"].numpy())
    assert ours["t.scalar"].shape == ()
    assert float(ours["t.scalar"]) == 3.5


def test_torch_bin_blocks_arbitrary_globals(tmp_path):
    """A malicious pickle inside the zip must be rejected, not executed."""
    import io
    import pickle
    import zipfile

    class Evil:
        def __reduce__(self):
            return (eval, ("1+1",))

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("archive/data.pkl", pickle.dumps({"x": Evil()}))
    path = tmp_path / "evil.bin"
    path.write_bytes(buf.getvalue())
    with pytest.raises(Exception, match="Blocked unpickling"):
        checkpoint_io.load_torch_bin(str(path))


def test_safetensors_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    tensors = {
        "a": rng.standard_normal((4, 7)).astype(np.float32),
        "b": rng.integers(0, 100, (3,)).astype(np.int64),
        "c": rng.standard_normal((2, 2, 2)).astype(np.float16),
    }
    path = tmp_path / "model.safetensors"
    checkpoint_io.save_safetensors(str(path), tensors)
    ours = checkpoint_io.load_state_dict(str(path))
    assert set(ours) == set(tensors)
    for k in tensors:
        np.testing.assert_array_equal(ours[k], tensors[k], err_msg=k)


def test_safetensors_bf16_via_torch(tmp_path):
    """Real bf16 safetensors bytes (hand-laid, matching the spec) decode
    to the exact float32 values."""
    import json
    import struct

    x = torch.randn(3, 4).bfloat16()
    raw = x.view(torch.uint16).numpy().astype("<u2").tobytes()
    header = json.dumps(
        {"w": {"dtype": "BF16", "shape": [3, 4], "data_offsets": [0, len(raw)]}}
    ).encode()
    path = tmp_path / "bf16.safetensors"
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(header)) + header + raw)
    ours = checkpoint_io.load_safetensors(str(path))
    np.testing.assert_array_equal(ours["w"], x.float().numpy())


def test_convert_from_disk_matches_in_memory(tmp_path):
    """torch.save → torch-free read → convert == in-memory convert.

    This is the full quality-parity ingestion path: the moment a real
    model.safetensors/pytorch_model.bin is present, --checkpoint_path
    produces exactly the params tree the verified converter builds."""
    import jax

    sd, cfg = _tiny_torch_state_dict()
    path = tmp_path / "pytorch_model.bin"
    torch.save(sd, path)

    from_disk = convert.convert_hf_state_dict(
        checkpoint_io.load_state_dict(str(path)), cfg
    )
    in_memory = convert.convert_hf_state_dict(sd, cfg)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        from_disk,
        in_memory,
    )


def test_cli_checkpoint_path_flag(tmp_path):
    """load_model_bundle consumes --checkpoint_path torch-free."""
    from paa_tpu.cli import run_attack as cli
    from paa_tpu.cli.parser import create_arg_parser

    sd, cfg = _tiny_torch_state_dict()
    path = tmp_path / "pytorch_model.bin"
    torch.save(sd, path)

    args = create_arg_parser().parse_args(
        ["--model", "wav2vec2-tiny", "--checkpoint_path", str(path),
         "--compute_dtype", "float32"]
    )
    _, params, apply_fn = cli.load_model_bundle(args)
    expected = convert.convert_hf_state_dict(sd, cfg)
    np.testing.assert_array_equal(
        np.asarray(params["lm_head"]["kernel"]),
        np.asarray(expected["lm_head"]["kernel"]),
    )
    logits = apply_fn(params, np.zeros((1, 2000), np.float32))
    assert logits.shape[0] == 1
