"""Self-supervised SpineWeb dataset test (pseudo-clean construction)."""

import numpy as np

from tmar.data import SpineWebSelfSupervisedDataset


def test_selfsup_pseudo_clean(tmp_path):
    rng = np.random.default_rng(0)
    # smooth HU slice with a metal insert at >3000 HU
    base = rng.uniform(-200, 400, (64, 64)).astype(np.float32)
    base[28:34, 28:34] = 5000.0
    np.save(tmp_path / "s0.npy", base)
    np.save(tmp_path / "s1.npy", np.zeros((64, 64), np.float32))

    ds = SpineWebSelfSupervisedDataset(str(tmp_path), patch_size=0, train=False)
    assert len(ds) == 2
    s = ds[0]
    assert s["ct"].shape == (64, 64)
    assert s["ct"].min() >= -1 and s["ct"].max() <= 1
    # metal region saturates the artifact input but is inpainted in gt
    assert s["ct"][30, 30] == 1.0
    assert s["gt"][30, 30] < 1.0
    # far from metal, gt == ct
    np.testing.assert_allclose(s["gt"][:10, :10], s["ct"][:10, :10])

    # train mode crops and returns correct size
    ds2 = SpineWebSelfSupervisedDataset(str(tmp_path), patch_size=32, train=True)
    assert ds2[0]["ct"].shape == (32, 32)
