"""Serving-artifact export (tmar.export): serialize → reload → run must
reproduce the in-process forward bit-for-bit on the same platform, and the
``tmar export`` CLI must produce a loadable artifact from a checkpoint."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tmar.export import export_generator, load_artifact, save_artifact
from tmar.nn import NGswin

TINY = dict(
    ngrams=(2, 2, 2, 2), embed_dim=32, depths=(1, 1, 1), num_heads=(2, 2, 2),
    dec_dim=32, dec_depths=1, dec_num_heads=2, window_size=8,
)


@pytest.fixture(scope="module")
def tiny_model():
    model = NGswin(**TINY)
    x = jnp.zeros((1, 64, 64, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    return model, params


def test_export_roundtrip_matches_forward(tiny_model, tmp_path):
    model, params = tiny_model
    blob = export_generator(model, params, batch=2, size=64)
    path = str(tmp_path / "tiny.tmarx")
    save_artifact(path, blob)

    fn = load_artifact(path)
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2, 64, 64, 1)).astype(np.float32)
    served = np.asarray(fn(x))
    direct = np.asarray(
        jax.jit(lambda xx: model.apply({"params": params}, xx))(x)
    )
    np.testing.assert_array_equal(served, direct)


def test_export_rejects_wrong_shape(tiny_model, tmp_path):
    model, params = tiny_model
    path = str(tmp_path / "tiny.tmarx")
    save_artifact(path, export_generator(model, params, batch=2, size=64))
    fn = load_artifact(path)
    with pytest.raises(Exception):
        fn(np.zeros((1, 64, 64, 1), np.float32))  # wrong batch bucket


def test_export_cli_from_checkpoint(tmp_path, monkeypatch):
    """End-to-end: train 1 tiny step to create an orbax checkpoint, then
    ``tmar export`` it and serve the artifact."""
    import optax

    from tmar.checkpoint.io import CheckpointManager
    from tmar.cli import main as cli_main
    from tmar.train import load_config
    from tmar.train.trainer import build_discriminator, build_generator
    from tmar.train.steps import create_train_state

    overrides = {
        "model.embed_dim": 32, "model.depths": [1, 1, 1],
        "model.num_heads": [2, 2, 2], "model.dec_dim": 32,
        "model.dec_depths": 1, "model.dec_num_heads": 2,
        "data.patch_size": 64, "disc.base_channels": 16,
        "disc.num_scales": 2,
    }
    cfg = load_config(None, overrides)
    gen = build_generator(cfg)
    state = create_train_state(
        jax.random.PRNGKey(0), gen, build_discriminator(cfg),
        optax.adam(1e-4), optax.adam(1e-4), cfg.data.patch_size,
        cfg.model.in_chans,
    )
    ckpt_dir = str(tmp_path / "ckpt")
    CheckpointManager(ckpt_dir).save(state, step=1)

    out = str(tmp_path / "m.tmarx")
    sets = [f"{k}={v}" for k, v in overrides.items()]
    rc = cli_main([
        "export", "--checkpoint", ckpt_dir, "--batch", "1", "--size", "64",
        "--out", out, "--set", *sets,
    ])
    assert rc == 0 and os.path.exists(out)

    fn = load_artifact(out)
    y = np.asarray(fn(np.zeros((1, 64, 64, 1), np.float32)))
    assert y.shape == (1, 64, 64, 1) and np.isfinite(y).all()
