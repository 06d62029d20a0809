"""Materialize reference-layout datasets from the synthetic generator.

Writes the EXACT on-disk trees the production loaders read, so the
reference's real data protocols — not the in-memory synthetic path — can
carry program-scale train/eval runs (VERDICT r4 next #1; reference
data/datasets.py:37-163,240-304 for SynDeepLesion, 307-504 for SpineWeb):

  <out>/syndeeplesion/
    train_640geo/<patient>/<study>/gt.h5          dataset "image"   (416², [0,1])
    train_640geo/<patient>/<study>/<k>.h5         k=0..78, "ma_CT"/"LI_CT"
    test_640geo/<patient>/<study>/{gt.h5,0..9.h5}
    test_640geo_dir.txt                           lines "<patient>/<study>/gt.h5"
  <out>/spineweb/
    artifact/<case>.npy  clean/<case>.npy          float32 HU (window [-1000,2000])

Per-image gt and per-(image, mask) ma/LI are deterministic in --seed;
mask id k reuses tmar.data.synthetic.apply_metal_artifacts with an
independent rng, mirroring SynDeepLesion's 79-masks-per-train-image /
10-masks-per-test-image pairing.

Usage:
  python tools/make_ref_layout.py --out /root/data_ref \
      [--train-images 16] [--test-images 8] [--spineweb-slices 64] [--seed 0]
  python tools/make_ref_layout.py --out /root/data_ref --bench-loader
"""
import _path  # noqa: F401  (repo root on sys.path)

import argparse
import json
import os
import time

import numpy as np


def _h5_write(path: str, arrays: dict) -> None:
    import h5py

    with h5py.File(path, "w") as f:
        for k, v in arrays.items():
            f.create_dataset(k, data=np.asarray(v, np.float32))


def _gt(seed: int, split: int, i: int, size: int) -> np.ndarray:
    from tmar.data.synthetic import SyntheticMARDataset

    ds = SyntheticMARDataset(size=size, length=1, base_seed=0)
    return ds._phantom(np.random.default_rng((seed, split, i)))


def _pair(gt01: np.ndarray, seed: int, split: int, i: int, k: int):
    from tmar.data.synthetic import apply_metal_artifacts

    return apply_metal_artifacts(gt01, np.random.default_rng((seed, split, i, 1000 + k)))


def make_syndeeplesion(root: str, train_images: int, test_images: int,
                       seed: int, size: int) -> None:
    t0 = time.time()
    n_pairs = 0
    for split, n_img, n_masks, sub in ((0, train_images, 79, "train_640geo"),
                                       (1, test_images, 10, "test_640geo")):
        for i in range(n_img):
            d = os.path.join(root, sub, f"P{i // 4:03d}", f"S{i:04d}")
            os.makedirs(d, exist_ok=True)
            gt01 = _gt(seed, split, i, size)
            _h5_write(os.path.join(d, "gt.h5"), {"image": gt01})
            for k in range(n_masks):
                ma01, li01 = _pair(gt01, seed, split, i, k)
                _h5_write(os.path.join(d, f"{k}.h5"), {"ma_CT": ma01, "LI_CT": li01})
                n_pairs += 1
            print(f"[syndeeplesion] {sub} image {i + 1}/{n_img} "
                  f"({n_masks} masks) t={time.time() - t0:.0f}s", flush=True)
    with open(os.path.join(root, "test_640geo_dir.txt"), "w") as f:
        for i in range(test_images):
            f.write(f"P{i // 4:03d}/S{i:04d}/gt.h5\n")
    print(f"[syndeeplesion] done: {n_pairs} (image,mask) pairs "
          f"in {time.time() - t0:.0f}s", flush=True)


def make_spineweb(root: str, n_slices: int, seed: int, size: int) -> None:
    """HU-valued paired npy tree; artifact = metal slice, clean = gt.

    Inverts tmar.data.transforms.hu_window's [-1000, 2000] mapping so the
    production SpineWebDataset windows them back to the [-1,1] the trainer
    consumes (reference datasets.py:373-386).
    """
    art_dir, cln_dir = os.path.join(root, "artifact"), os.path.join(root, "clean")
    os.makedirs(art_dir, exist_ok=True)
    os.makedirs(cln_dir, exist_ok=True)
    t0 = time.time()
    for i in range(n_slices):
        gt01 = _gt(seed, 2, i, size)
        ma01, _ = _pair(gt01, seed, 2, i, 0)
        to_hu = lambda a: (a * 3000.0 - 1000.0).astype(np.float32)
        np.save(os.path.join(art_dir, f"case{i:04d}.npy"), to_hu(ma01))
        np.save(os.path.join(cln_dir, f"case{i:04d}.npy"), to_hu(gt01))
    print(f"[spineweb] done: {n_slices} HU slice pairs in {time.time() - t0:.0f}s",
          flush=True)


def bench_loader(out: str, patch: int, batch: int, seconds: float) -> dict:
    """Measured samples/s of the production loaders over the materialized
    trees (the number PERF.md quotes next to the shard-cache host rate)."""
    from tmar.data import SpineWebDataset, SynDeepLesionTrainDataset
    from tmar.data.loader import Loader

    results = {}
    for name, ds in (
        ("syndeeplesion_h5",
         SynDeepLesionTrainDataset(os.path.join(out, "syndeeplesion"),
                                   patch_size=patch, length=100_000)),
        ("spineweb_npy",
         SpineWebDataset(os.path.join(out, "spineweb", "artifact"),
                         os.path.join(out, "spineweb", "clean"),
                         patch_size=patch, train=True)),
    ):
        # raw per-sample rate (single thread, includes h5 open+read+crop)
        t0 = time.time()
        n = 0
        while time.time() - t0 < seconds:
            ds[n]
            n += 1
        raw = n / (time.time() - t0)

        # batched prefetching Loader rate (the trainer's consumption path)
        loader = Loader(ds, batch_size=batch, shuffle=True, num_workers=2,
                        keys=("ct", "gt", "li"))
        it = iter(loader)
        next(it)  # warm page cache / thread spin-up outside the timed window
        t0 = time.time()
        nb = 0
        for _ in it:
            nb += 1
            if time.time() - t0 >= seconds:
                break
        batched = nb * batch / (time.time() - t0)
        results[name] = {"raw_samples_per_s": round(raw, 1),
                         "loader_samples_per_s": round(batched, 1)}
        print(f"[bench] {name}: raw {raw:.1f} samples/s, "
              f"Loader(b{batch},2w) {batched:.1f} samples/s", flush=True)
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--train-images", type=int, default=16)
    ap.add_argument("--test-images", type=int, default=8)
    ap.add_argument("--spineweb-slices", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--size", type=int, default=416)
    ap.add_argument("--bench-loader", action="store_true",
                    help="measure production-loader throughput over an "
                         "already-materialized tree instead of writing one")
    ap.add_argument("--bench-patch", type=int, default=128)
    ap.add_argument("--bench-batch", type=int, default=8)
    ap.add_argument("--bench-seconds", type=float, default=10.0)
    args = ap.parse_args()

    if args.bench_loader:
        res = bench_loader(args.out, args.bench_patch, args.bench_batch,
                           args.bench_seconds)
        print(json.dumps(res))
        return

    make_syndeeplesion(os.path.join(args.out, "syndeeplesion"),
                       args.train_images, args.test_images, args.seed, args.size)
    make_spineweb(os.path.join(args.out, "spineweb"),
                  args.spineweb_slices, args.seed, args.size)


if __name__ == "__main__":
    main()
