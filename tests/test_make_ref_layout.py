"""tools/make_ref_layout.py: the reference-layout materializer must write
trees the PRODUCTION loaders (tmar.data.syndeeplesion / spineweb) read —
the bridge that lets the h5/npy protocols carry program-scale runs
(reference data/datasets.py:37-163,240-304 for the layout)."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytest.importorskip("h5py")

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    out = tmp_path_factory.mktemp("ref_layout")
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "make_ref_layout.py"),
         "--out", str(out), "--train-images", "2", "--test-images", "1",
         "--spineweb-slices", "2", "--size", "32", "--seed", "5"],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    return out


def test_layout_matches_reference_protocol(tree):
    sdl = tree / "syndeeplesion"
    gt_files = sorted(sdl.glob("train_640geo/*/*/gt.h5"))
    assert len(gt_files) == 2
    # 79 train masks per image (loader draws randint(0, 79))
    assert sorted(int(p.stem) for p in gt_files[0].parent.glob("[0-9]*.h5")) \
        == list(range(79))
    test_list = (sdl / "test_640geo_dir.txt").read_text().splitlines()
    assert len(test_list) == 1
    assert (sdl / "test_640geo" / test_list[0]).is_file()
    masks = sorted((sdl / "test_640geo" / test_list[0]).parent.glob("[0-9]*.h5"))
    assert len(masks) == 10


def test_production_loaders_read_tree(tree):
    from tmar.data import (SpineWebDataset, SynDeepLesionTestDataset,
                           SynDeepLesionTrainDataset)

    tr = SynDeepLesionTrainDataset(str(tree / "syndeeplesion"),
                                   patch_size=16, length=4)
    s = tr[0]
    assert s["ct"].shape == (16, 16) and s["ct"].dtype == np.float32
    assert -1.0 <= s["gt"].min() and s["gt"].max() <= 1.0

    te = SynDeepLesionTestDataset(str(tree / "syndeeplesion"))
    assert len(te) == 10  # 1 image x 10 masks
    full = te[0]
    assert full["ct"].shape == (32, 32)
    # deterministic pairing: idx -> (file, mask id) is reproducible
    np.testing.assert_array_equal(te[3]["ct"], te[3]["ct"])

    sw = SpineWebDataset(str(tree / "spineweb" / "artifact"),
                         str(tree / "spineweb" / "clean"),
                         patch_size=16, train=True)
    p = sw[0]
    assert p["ct"].shape == (16, 16)
    # HU round trip: clean slices live in the [-1000, 2000] window, so the
    # windowed values must span more than a degenerate range
    assert p["gt"].min() >= -1.0 and p["gt"].max() <= 1.0


def test_materialization_deterministic(tree, tmp_path):
    """Same seed -> byte-identical gt data (regeneration reproduces runs)."""
    import h5py

    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "make_ref_layout.py"),
         "--out", str(tmp_path), "--train-images", "1", "--test-images", "1",
         "--spineweb-slices", "1", "--size", "32", "--seed", "5"],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    a = tree / "syndeeplesion" / "train_640geo" / "P000" / "S0000" / "gt.h5"
    b = tmp_path / "syndeeplesion" / "train_640geo" / "P000" / "S0000" / "gt.h5"
    with h5py.File(a) as fa, h5py.File(b) as fb:
        np.testing.assert_array_equal(fa["image"][:], fb["image"][:])
