"""Dependency-free TensorBoard event writer (train/tb_events.py).

The reference intends but never ships TensorBoard logging (phantom
module + commented-out call, reference: src/run_attack.py:6,245-251);
tb_events.py makes it real with a hand-written TFRecord/protobuf
encoder. These tests verify the framing CRCs and — when the real
``tensorboard`` package happens to be installed (it rides along with
torch in this environment) — that stock TensorBoard parses the file
byte-for-byte.
"""

import glob
import os
import struct

import pytest

from paa_tpu.train import tb_events


def _read_records(path):
    records = []
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if not header:
                return records
            (length,) = struct.unpack("<Q", header)
            (hcrc,) = struct.unpack("<I", f.read(4))
            assert hcrc == tb_events._masked_crc(header)
            payload = f.read(length)
            (pcrc,) = struct.unpack("<I", f.read(4))
            assert pcrc == tb_events._masked_crc(payload)
            records.append(payload)


def test_crc32c_known_vectors():
    # RFC 3720 test vectors for CRC32C
    assert tb_events._crc32c(b"") == 0x0
    assert tb_events._crc32c(b"123456789") == 0xE3069283
    assert tb_events._crc32c(bytes(32)) == 0x8A9136AA


def test_records_are_framed_and_crc_clean(tmp_path):
    with tb_events.EventWriter(str(tmp_path)) as w:
        w.scalar("train/ctc", 123.5, step=0, wall_time=1000.0)
        w.scalars({"eval/ctc": 7.25, "eval/wer": None}, step=1, wall_time=1001.0)
        path = w.path
    records = _read_records(path)
    # version header + 2 scalar records (None skipped)
    assert len(records) == 3
    assert b"brain.Event:2" in records[0]
    assert b"train/ctc" in records[1]
    assert b"eval/ctc" in records[2]


def test_real_tensorboard_parses_the_file(tmp_path):
    tb = pytest.importorskip("tensorboard.backend.event_processing.event_file_loader")
    with tb_events.EventWriter(str(tmp_path)) as w:
        w.scalar("train/ctc", 1540.25, step=0, wall_time=2000.5)
        w.scalar("train/ctc", 1802.0, step=1, wall_time=2001.5)
        w.scalar("eval/wer", 0.41, step=1, wall_time=2001.5)
        path = w.path

    events = list(tb.EventFileLoader(path).Load())
    assert events[0].file_version == "brain.Event:2"

    def _value(v):
        # TB's loader migrates simple_value to the tensor representation
        if v.WhichOneof("value") == "tensor":
            return v.tensor.float_val[0]
        return v.simple_value

    scalars = [
        (e.step, v.tag, _value(v), e.wall_time)
        for e in events[1:]
        for v in e.summary.value
    ]
    assert scalars == [
        (0, "train/ctc", 1540.25, 2000.5),
        (1, "train/ctc", 1802.0, 2001.5),
        (1, "eval/wer", pytest.approx(0.41, rel=1e-6), 2001.5),
    ]


def test_filename_matches_tensorboard_glob(tmp_path):
    with tb_events.EventWriter(str(tmp_path)) as w:
        w.scalar("x", 1.0, 0)
    assert glob.glob(os.path.join(str(tmp_path), "events.out.tfevents.*"))
