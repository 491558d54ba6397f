"""TensorBoard scalar export (utils.tbwriter): byte-level format checks +
trainer integration. The reference documents optional TB scalar logging
(reference README.md:2304-2320); lanetpu writes standard event files with
no tensorboard/tensorflow dependency.
"""

import glob
import struct

import numpy as np

from lanetpu.utils.tbwriter import (
    TBWriter,
    _crc32c,
    _masked_crc,
    _varint,
    read_scalars,
)


def test_crc32c_known_vectors():
    # RFC 3720 / kernel test vectors for CRC32C (Castagnoli)
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(b"") == 0x0
    assert _crc32c(b"\x00" * 32) == 0x8A9136AA


def test_varint():
    assert _varint(0) == b"\x00"
    assert _varint(127) == b"\x7f"
    assert _varint(300) == b"\xac\x02"  # protobuf docs example


def test_writer_roundtrip(tmp_path):
    w = TBWriter(str(tmp_path))
    w.add_scalar("train/loss", 0.5, 1)
    w.add_scalar("val/dice", 0.875, 2)
    w.add_scalars({"a": 1.25, "b": -3.5}, 9)
    w.close()
    rows = read_scalars(w.path)
    assert (1, "train/loss", 0.5) in rows
    assert (2, "val/dice", 0.875) in rows
    assert (9, "a", 1.25) in rows and (9, "b", -3.5) in rows


def test_file_version_header(tmp_path):
    """TensorBoard only loads files whose first event carries the
    brain.Event:2 file_version — check the actual bytes."""
    w = TBWriter(str(tmp_path))
    w.close()
    with open(w.path, "rb") as f:
        data = f.read()
    (n,) = struct.unpack("<Q", data[:8])
    first = data[12:12 + n]
    assert b"brain.Event:2" in first


def test_trainer_writes_events(tmp_path):
    from lanetpu.core.config import TrainConfig
    from lanetpu.train.trainer import Trainer

    cfg = TrainConfig(features=(4, 8), num_train=8, num_val=8, batch_size=8,
                      epochs=2, save_dir="", real_pool=0,
                      early_stopping=False,
                      tensorboard_dir=str(tmp_path / "tb"))
    Trainer(cfg).fit(verbose=False)
    files = glob.glob(str(tmp_path / "tb" / "events.out.tfevents.*"))
    assert len(files) == 1
    rows = read_scalars(files[0])
    tags = {t for _, t, _ in rows}
    assert {"train/loss", "train/dice", "val/loss", "val/dice"} <= tags
    steps = sorted({s for s, t, _ in rows if t == "val/dice"})
    assert steps == [0, 1]
    vals = [v for _, t, v in rows if t == "val/dice"]
    assert all(np.isfinite(v) and 0 <= v <= 1 for v in vals)
