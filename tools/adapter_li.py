"""Out-of-process comparison entry: the classical LI (linear interpolation)
MAR baseline.

Speaks the ``tmar.eval.adapters.SubprocessAdapter`` protocol — reads the
enriched sample dict from ``input.npz`` and writes the [H, W] prediction in
[0, 1] to ``output.npy``.  The LI image is the standard non-learned baseline
every MAR comparison tables (the reference feeds the same XLI to its
dual-domain entries, evaluation/benchmark_comparison_syndeeplesion.py:676-781),
so this entry doubles as a live demonstration that the harness's process
isolation works at program scale: this script runs in its own interpreter
with no tmar/jax imports at all.

Usage: python tools/adapter_li.py <input.npz> <output.npy>
"""

import sys

import numpy as np


def main() -> int:
    in_path, out_path = sys.argv[1], sys.argv[2]
    with np.load(in_path) as data:
        xli = np.asarray(data["XLI"], np.float32)
    np.save(out_path, np.clip(xli, 0.0, 1.0))
    return 0


if __name__ == "__main__":
    sys.exit(main())
