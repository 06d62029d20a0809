"""SynDeepLesion HDF5 pipeline tests against a synthetic on-disk layout
mirroring the reference tree (train_640geo/*/*/gt.h5 + <mask>.h5,
test_640geo + test_640geo_dir.txt)."""

import os

import h5py
import numpy as np
import pytest

from tmar.data import (
    Loader,
    SynDeepLesionTestDataset,
    SynDeepLesionTrainDataset,
    SynDeepLesionValDataset,
)


@pytest.fixture(scope="module")
def syn_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("syndeeplesion")
    rng = np.random.default_rng(0)
    rel_paths = []
    for pid in range(3):
        for sid in range(2):
            d = root / "train_640geo" / f"{pid:03d}" / f"{sid:02d}"
            os.makedirs(d)
            gt = rng.random((64, 64)).astype(np.float32)
            with h5py.File(d / "gt.h5", "w") as f:
                f["image"] = gt
            for mask_id in range(79):
                with h5py.File(d / f"{mask_id}.h5", "w") as f:
                    f["ma_CT"] = np.clip(gt + 0.2, 0, 1)
                    f["LI_CT"] = gt
    # test split
    test_rel = []
    for pid in range(2):
        d = root / "test_640geo" / f"{pid:03d}" / "00"
        os.makedirs(d)
        gt = rng.random((64, 64)).astype(np.float32)
        with h5py.File(d / "gt.h5", "w") as f:
            f["image"] = gt
        for mask_id in range(10):
            with h5py.File(d / f"{mask_id}.h5", "w") as f:
                f["ma_CT"] = np.clip(gt + 0.1, 0, 1)
                f["LI_CT"] = gt
        test_rel.append(f"{pid:03d}/00/gt.h5")
    with open(root / "test_640geo_dir.txt", "w") as f:
        f.write("\n".join(test_rel) + "\n")
    return str(root)


def test_train_dataset(syn_root):
    ds = SynDeepLesionTrainDataset(syn_root, patch_size=32, length=20)
    assert len(ds) == 20
    s = ds[0]
    assert s["ct"].shape == (32, 32) and s["gt"].shape == (32, 32)
    assert -1 <= s["ct"].min() and s["ct"].max() <= 1
    # skip-and-advance fault tolerance: corrupt one gt file, samples still load
    bad = ds.files[0]
    orig = open(bad, "rb").read()
    try:
        with open(bad, "wb") as f:
            f.write(b"not an hdf5 file")
        for i in range(4):
            out = ds[i]
            assert out["ct"].shape == (32, 32)
    finally:
        with open(bad, "wb") as f:
            f.write(orig)


def test_val_dataset_full_slices(syn_root):
    ds = SynDeepLesionValDataset(syn_root, fraction=0.5)
    s = ds[0]
    assert s["ct"].shape == (64, 64)


def test_test_dataset_mask_cycling(syn_root):
    ds = SynDeepLesionTestDataset(syn_root)
    assert len(ds) == 2 * 10
    s0, s10 = ds[0], ds[10]  # same image, different mask id
    assert s0["gt"].shape == (64, 64)
    np.testing.assert_array_equal(s0["gt"], s10["gt"])


def test_loader_over_h5(syn_root):
    ds = SynDeepLesionTrainDataset(syn_root, patch_size=32, length=8)
    loader = Loader(ds, batch_size=4, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["ct"].shape == (4, 32, 32, 1)
    assert batches[0]["gt"].dtype == np.float32
