"""Dual-domain fine-tune engine tests (tmar/train/finetune.py,
tmar/data/finetune.py): dataset dict semantics and the VERDICT acceptance
criterion — RedCNN fine-tuned with the sinogram loss on synthetic data,
loss decreasing."""

import os

import numpy as np
import pytest

from tmar.data import BenchmarkFinetuneDataset
from tmar.data.finetune import create_li_image, create_metal_mask


@pytest.fixture(scope="module")
def pairs_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ft_pairs")
    art, cln = root / "artifact", root / "clean"
    os.makedirs(art)
    os.makedirs(cln)
    rng = np.random.default_rng(0)
    for i in range(8):
        gt_hu = rng.uniform(-1000, 800, (48, 48)).astype(np.float32)
        ma_hu = gt_hu.copy()
        ma_hu[20:26, 20:26] += 2500.0  # bright metal + streak-ish corruption
        ma_hu += rng.normal(0, 30, ma_hu.shape)
        np.save(art / f"{i}.npy", ma_hu)
        np.save(cln / f"{i}.npy", gt_hu)
    return str(art), str(cln)


def test_dataset_dict_semantics(pairs_root):
    art, cln = pairs_root
    ds = BenchmarkFinetuneDataset(art, cln, patch_size=32, mode="patch")
    s = ds[0]
    assert set(s) == {"Xma", "Xgt", "XLI", "M", "mask"}
    for k in s:
        assert s[k].shape == (32, 32) and s[k].dtype == np.float32
    # M is the non-metal mask = 1 - mask (reference :254)
    np.testing.assert_array_equal(s["M"], 1.0 - s["mask"])
    # LI: metal pixels replaced by the non-metal mean
    if s["mask"].sum():
        fill = s["Xma"][s["mask"] < 0.5].mean()
        np.testing.assert_allclose(
            s["XLI"][s["mask"] > 0.5], fill, atol=1e-6
        )
    # x255 mode scales images
    ds255 = BenchmarkFinetuneDataset(art, cln, patch_size=32, normalize_range="0_255")
    assert ds255[0]["Xma"].max() > 1.5


def test_resize_mode(pairs_root):
    art, cln = pairs_root
    ds = BenchmarkFinetuneDataset(art, cln, patch_size=24, mode="resize")
    s = ds[1]
    assert s["Xma"].shape == (24, 24)


def test_metal_mask_and_li_helpers():
    gt = np.zeros((16, 16), np.float32)
    ma = gt.copy()
    ma[4:6, 4:6] = 1.0
    mask = create_metal_mask(ma, gt)
    assert mask[4, 4] == 1.0 and mask[0, 0] == 0.0
    li = create_li_image(ma, mask)
    assert li[4, 4] == pytest.approx(ma[mask < 0.5].mean())


@pytest.mark.slow
def test_redcnn_sinogram_finetune_loss_decreases(pairs_root):
    """VERDICT round-1 'done' criterion for the dual-domain engine."""
    import jax

    from tmar.nn import RedCNN
    from tmar.ops import Radon
    from tmar.train import FinetuneWeights, finetune

    art, cln = pairs_root
    ds = BenchmarkFinetuneDataset(art, cln, patch_size=32, mode="patch")
    radon = Radon(32, np.linspace(0, np.pi, 24, endpoint=False))
    result = finetune(
        RedCNN(), ds,
        num_epochs=4, batch_size=4, lr=2e-4,
        weights=FinetuneWeights(sino=0.1),
        projector=radon, num_workers=0,
    )
    hist = result["history"]
    assert "sino" in hist[0], "sinogram term must be active"
    assert hist[-1]["loss"] < hist[0]["loss"], hist
    assert hist[-1]["sino"] < hist[0]["sino"] * 1.5  # sino term not exploding
    assert np.isfinite(hist[-1]["loss"])


def test_image_domain_mode_has_no_sino_term(pairs_root):
    from tmar.nn import RedCNN
    from tmar.train import FinetuneWeights, finetune

    art, cln = pairs_root
    ds = BenchmarkFinetuneDataset(art, cln, patch_size=32)
    result = finetune(
        RedCNN(), ds, num_epochs=1, batch_size=4,
        weights=FinetuneWeights(sino=0.0), projector=None, num_workers=0,
    )
    assert "sino" not in result["history"][0]
    assert np.isfinite(result["history"][0]["loss"])
