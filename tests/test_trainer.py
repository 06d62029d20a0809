"""Trainer end-to-end smoke tests on the 8-device CPU mesh (tiny configs)."""

import json
import os

import numpy as np
import pytest

from tmar.data import SyntheticMARDataset
from tmar.train import Trainer, TrainConfig, resolve_variant


def _tiny_cfg(tmp_path, **kw):
    cfg = TrainConfig()
    cfg.model.embed_dim = 32
    cfg.model.depths = (2, 2, 2)
    cfg.model.num_heads = (2, 2, 2)
    cfg.model.dec_dim = 32
    cfg.model.dec_depths = 2
    cfg.model.dec_num_heads = 2
    cfg.disc.base_channels = 16
    cfg.disc.num_scales = 2
    cfg.data.dataset = "synthetic"
    cfg.data.patch_size = 64
    cfg.data.batch_size = 8
    cfg.data.samples_per_epoch = 16
    cfg.data.num_workers = 1
    cfg.radon.num_angles = 24
    object.__setattr__(cfg.loss, "dilation_radius", 2)
    cfg.num_epochs = 1
    cfg.val_every_n_epochs = 1
    cfg.run_dir = str(tmp_path)
    cfg.run_name = "smoke"
    cfg.bf16 = False
    cfg.log_every = 1
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


@pytest.mark.slow
def test_trainer_fit_full_recipe(tmp_path, mesh8):
    cfg = _tiny_cfg(tmp_path)
    val = SyntheticMARDataset(size=64, length=8, base_seed=777)
    tr = Trainer(cfg, mesh=mesh8, val_dataset=val)
    tr.fit(progress=False)

    run = tr.run_dir
    assert os.path.exists(os.path.join(run, "config.json"))
    assert os.path.exists(os.path.join(run, "logs", "training_history.csv"))
    assert os.path.exists(os.path.join(run, "logs", "validation_history.csv"))
    assert tr.best_psnr > 0  # validation ran and produced a PSNR
    # checkpoint written
    ckpts = os.listdir(os.path.join(run, "checkpoints"))
    assert any(c.startswith("step_") for c in ckpts)
    assert "best" in ckpts

    # resume restores epoch bookkeeping
    tr2 = Trainer(cfg, mesh=mesh8, val_dataset=val)
    assert tr2.resume()
    assert tr2.start_epoch == 1


@pytest.mark.slow
def test_trainer_baseline_variant(tmp_path, mesh8):
    """DCGAN-critic baseline variant (vanilla BCE, no metal weighting)."""
    cfg = _tiny_cfg(tmp_path)
    cfg = resolve_variant(cfg, "baseline")
    cfg.run_name = "baseline_smoke"
    tr = Trainer(cfg, mesh=mesh8)
    tr.fit(progress=False)
    hist = tr.history
    assert hist and np.isfinite(hist[-1]["loss_g"])
    assert "g_rec" in hist[-1]
    assert "g_adv" not in hist[-1]  # baseline has adv weight 0
