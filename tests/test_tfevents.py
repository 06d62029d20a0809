"""Tests for the no-dependency TensorBoard scalar writer
(tmar/utils/tfevents.py) and its wiring into the Trainer
(reference train_combined.py:536-544,632-633 logs Train/* + Val/*)."""

import glob
import struct

import pytest

from tmar.utils.tfevents import TBWriter, crc32c, read_scalars, _masked_crc


def test_crc32c_known_vectors():
    # RFC 3720 / common test vectors for CRC-32C (Castagnoli)
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0x0
    assert crc32c(b"\x00" * 32) == 0x8A9136AA


def test_scalar_round_trip(tmp_path):
    w = TBWriter(str(tmp_path))
    w.scalar("Train/loss_g", 1.5, step=10)
    w.scalar("Train/loss_d", 0.25, step=10)
    w.scalars({"Val/PSNR": 31.25, "Val/MSE": 0.5}, step=20)
    w.close()
    rows = read_scalars(w.path, check_crc=True)
    assert rows == [
        (10, "Train/loss_g", 1.5),
        (10, "Train/loss_d", 0.25),
        (20, "Val/PSNR", 31.25),
        (20, "Val/MSE", 0.5),
    ]


def test_file_version_header(tmp_path):
    """First record must be the brain.Event:2 version event (what TensorBoard
    checks when deciding whether a file is a valid event stream)."""
    w = TBWriter(str(tmp_path))
    w.close()
    with open(w.path, "rb") as f:
        raw = f.read()
    (n,) = struct.unpack("<Q", raw[:8])
    first = raw[12:12 + n]
    assert b"brain.Event:2" in first


def test_corrupt_crc_detected(tmp_path):
    w = TBWriter(str(tmp_path))
    w.scalar("a", 1.0, 1)
    w.close()
    with open(w.path, "rb") as f:
        raw = bytearray(f.read())
    raw[-6] ^= 0xFF  # flip a payload byte of the last record
    with open(w.path, "wb") as f:
        f.write(raw)
    with pytest.raises(AssertionError):
        read_scalars(w.path, check_crc=True)


@pytest.mark.slow
def test_trainer_emits_tb_scalars(tmp_path):
    """Trainer writes Train/* each log_every and Val/* on validation."""
    from tmar.data import SyntheticMARDataset
    from tmar.train import Trainer, load_config

    cfg = load_config(
        None,
        {
            "data.dataset": "synthetic",
            "data.patch_size": 64,
            "data.batch_size": 8,
            "data.samples_per_epoch": 8,
            "data.num_workers": 0,
            "model.embed_dim": 32,
            "model.depths": [1, 1, 1],
            "model.num_heads": [2, 2, 2],
            "model.dec_dim": 32,
            "model.dec_depths": 1,
            "model.dec_num_heads": 2,
            "disc.num_scales": 2,
            "disc.base_channels": 16,
            "loss.phys": 0.0,
            "radon.enabled": False,
            "run_dir": str(tmp_path),
            "run_name": "tb_test",
            "num_epochs": 1,
            "val_every_n_epochs": 1,
            "log_every": 1,
            "n_devices": 1,
            "bf16": False,
        },
    )
    t = Trainer(cfg, val_dataset=SyntheticMARDataset(size=64, length=8))
    t.fit(num_epochs=1, progress=False)
    files = glob.glob(str(tmp_path / "tb_test" / "tb" / "events.out.tfevents.*"))
    assert len(files) == 1
    rows = read_scalars(files[0])
    tags = {tag for _, tag, _ in rows}
    assert any(tag.startswith("Train/loss") for tag in tags), tags
    assert "Val/psnr" in tags and "Val/ssim" in tags, tags
