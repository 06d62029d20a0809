"""Element-wise parity of the pure-torch baseline mirrors vs the flax
originals (tools/torch_baselines.py) — the converter evidence that lets a
tmar-finetuned RedCNN / DenoisingTransformer run as an out-of-process
torch consumer of the ×255 / sparse-view comparison protocols
(reference evaluation/benchmark_comparison_syndeeplesion.py:553-875)."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

torch = pytest.importorskip("torch")


def _flax_params(model, shape):
    import jax

    return model.init(jax.random.PRNGKey(3), np.zeros(shape, np.float32))[
        "params"
    ]


def test_redcnn_parity():
    import jax

    from tmar.nn import RedCNN
    from torch_baselines import load_baseline

    model = RedCNN(features=16)
    params = _flax_params(model, (1, 40, 40, 1))
    params_np = jax.tree_util.tree_map(lambda a: np.asarray(a), params)
    tm = load_baseline("redcnn", params_np)

    x = np.random.default_rng(0).uniform(0, 1, (2, 40, 40, 1)).astype(np.float32)
    ref = np.asarray(model.apply({"params": params}, x))
    with torch.no_grad():
        out = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(out.transpose(0, 2, 3, 1), ref, atol=2e-5)


def test_transformer_parity_and_interp():
    import jax

    from tmar.nn import DenoisingTransformer
    from torch_baselines import load_baseline

    model = DenoisingTransformer(dim=32, depth=2, num_heads=4, patch=8)
    params = _flax_params(model, (1, 32, 32, 1))
    params_np = jax.tree_util.tree_map(lambda a: np.asarray(a), params)
    tm = load_baseline("transformer", params_np)

    x = np.random.default_rng(1).uniform(0, 1, (2, 32, 32, 1)).astype(np.float32)
    ref = np.asarray(model.apply({"params": params}, x))
    with torch.no_grad():
        out = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(out.transpose(0, 2, 3, 1), ref, atol=5e-5)

    # larger grid: flax's fixed-size pos_embed cannot run it, the torch
    # mirror interpolates (reference alternative_architectures.py:56) —
    # assert it executes and is finite at a non-training size
    y = np.random.default_rng(2).uniform(0, 1, (1, 64, 64, 1)).astype(np.float32)
    with torch.no_grad():
        out_big = tm(torch.from_numpy(y.transpose(0, 3, 1, 2))).numpy()
    assert out_big.shape == (1, 1, 64, 64) and np.isfinite(out_big).all()
