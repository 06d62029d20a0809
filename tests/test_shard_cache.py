"""Shard-cache round trip: build from a dataset, read back identically,
crop/flip at read time, and serve through the Loader."""

import numpy as np
import pytest

from tmar.data import Loader, ShardCachedDataset, SyntheticMARDataset, build_shard_cache


@pytest.fixture(scope="module")
def cache_dir(tmp_path_factory):
    ds = SyntheticMARDataset(size=64, length=10)
    out = tmp_path_factory.mktemp("shards")
    build_shard_cache(ds, str(out), shard_size=4)
    return str(out)


def test_roundtrip_exact(cache_dir):
    ds = SyntheticMARDataset(size=64, length=10)
    cached = ShardCachedDataset(cache_dir)
    assert len(cached) == 10
    for i in (0, 3, 4, 9):  # spans shard boundaries (sizes 4,4,2)
        ref = ds[i]
        got = cached[i]
        for k in ("ct", "gt", "li"):
            np.testing.assert_array_equal(got[k], ref[k])
            assert got[k].dtype == np.float32


def test_read_time_crop_and_flip(cache_dir):
    cached = ShardCachedDataset(cache_dir, patch_size=32, augment=True, seed=0)
    s = cached[2]
    assert s["ct"].shape == (32, 32)
    # crop/flip applied identically across keys: artifact/clean stay aligned
    # (metal pixels land at the same coordinates)
    m_ct = s["ct"] > 0.6
    m_li = s["li"] > 0.6
    assert m_ct.sum() == 0 or (m_ct & m_li).sum() / max(m_ct.sum(), 1) < 1.01


def test_length_override_wraps(cache_dir):
    cached = ShardCachedDataset(cache_dir, length=25)
    assert len(cached) == 25
    a = cached[3]
    b = cached[13]  # 13 % 10 = 3
    np.testing.assert_array_equal(a["ct"], b["ct"])


def test_loader_serves_cache(cache_dir):
    cached = ShardCachedDataset(cache_dir, patch_size=32)
    loader = Loader(cached, batch_size=4, keys=("ct", "gt"), shuffle=True, seed=1)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["ct"].shape == (4, 32, 32, 1)


def test_cache_syndeeplesion_layout(tmp_path):
    # build a miniature h5 tree matching the reference layout, cache it
    h5py = pytest.importorskip("h5py")
    root = tmp_path / "syn"
    d = root / "train_640geo" / "a" / "b"
    d.mkdir(parents=True)
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (96, 96)).astype(np.float32)
    with h5py.File(d / "gt.h5", "w") as f:
        f["image"] = img
    # write every mask id the frozen rng will pick
    from tmar.data.shard_cache import cache_syndeeplesion

    state = np.random.RandomState(66 + 3)
    ids = [int(state.randint(0, 79)) for _ in range(2)]
    for k in set(ids):
        with h5py.File(d / f"{k}.h5", "w") as f:
            f["ma_CT"] = img * 0.9
            f["LI_CT"] = img * 0.8
    out = tmp_path / "cache"
    cache_syndeeplesion(str(root), str(out), masks_per_image=2, shard_size=8)
    cached = ShardCachedDataset(str(out))
    assert len(cached) == 2
    assert cached[0]["ct"].shape == (96, 96)
    # values ran through the [-1,1] normalisation
    assert cached[0]["gt"].min() >= -1.0 and cached[0]["gt"].max() <= 1.0


def test_synthetic_cache_dataset_config(tmp_path):
    """data.dataset=synthetic_cache materialises the 416² slice cache once
    and serves random crops through ShardCachedDataset (the config-reachable
    fast host path — live synthesis caps below one chip's consumption)."""
    from tmar.train import load_config
    from tmar.train.trainer import build_dataset

    sets = {
        "data.dataset": "synthetic_cache",
        "data.cache_dir": str(tmp_path / "cache"),
        "data.cache_slices": 6,
        "data.patch_size": 64,
        "data.samples_per_epoch": 20,
    }
    ds = build_dataset(load_config(None, dict(sets)))
    assert len(ds) == 20
    s = ds[0]
    assert s["ct"].shape == (64, 64) and s["gt"].shape == (64, 64)
    assert np.isfinite(s["ct"]).all()
    # second construction must REUSE the cache (no rebuild): marker mtime
    import os

    idx = str(tmp_path / "cache" / "index.json")
    m0 = os.path.getmtime(idx)
    ds2 = build_dataset(load_config(None, dict(sets)))
    assert os.path.getmtime(idx) == m0
    # same underlying slices -> crops drawn from identical data
    assert len(ds2) == 20
