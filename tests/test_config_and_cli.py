"""Config loading, variant resolution, and checkpoint round-trip tests."""

import dataclasses
import os

import numpy as np
import optax
import pytest

import jax

from tmar.train import (
    ABLATIONS,
    VARIANTS,
    TrainConfig,
    create_train_state,
    load_config,
    resolve_variant,
)


CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "tmar", "configs")


def test_default_config_matches_reference_recipe():
    cfg = TrainConfig()
    assert cfg.optim.lr_d == 2 * cfg.optim.lr_g  # TTUR
    assert cfg.loss.adv == 0.1 and cfg.loss.fm == 10.0 and cfg.loss.phys == 0.02
    assert cfg.loss.metal_threshold == 0.6 and cfg.loss.dilation_radius == 5
    assert cfg.radon.num_angles == 180
    assert cfg.model.depths == (6, 4, 4) and cfg.model.window_size == 8


def test_yaml_roundtrip():
    cfg = load_config(os.path.join(CONFIG_DIR, "train_syndeeplesion.yaml"))
    assert cfg.model.embed_dim == 64
    assert cfg.data.dataset == "syndeeplesion"
    assert cfg.loss.gan_mode == "hinge"
    cfg2 = load_config(
        os.path.join(CONFIG_DIR, "train_syndeeplesion.yaml"),
        overrides={"data.batch_size": 8, "loss.phys": 0.0},
    )
    assert cfg2.data.batch_size == 8 and cfg2.loss.phys == 0.0


def test_unknown_key_rejected(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("model:\n  bogus_key: 1\n")
    with pytest.raises(KeyError):
        load_config(str(p))


@pytest.mark.parametrize("name", sorted(VARIANTS))
def test_variants_resolve(name):
    cfg = resolve_variant(TrainConfig(), name)
    if name in ("baseline", "v1"):
        assert cfg.disc.kind == "dcgan"
        assert cfg.loss.gan_mode == "vanilla"
    if name == "full":
        assert cfg.loss.phys == 0.02 and cfg.radon.enabled
    else:
        assert cfg.loss.phys == 0.0 or name == "full"


@pytest.mark.parametrize("name", sorted(ABLATIONS))
def test_ablations_resolve(name):
    cfg = resolve_variant(TrainConfig(), name)
    if name == "B1_single_scale_disc":
        assert cfg.disc.num_scales == 1
    if name == "B2_no_spectral_norm":
        assert not cfg.disc.use_sn
    if name.startswith("B3"):
        assert cfg.loss.dilation_radius == int(name[-1])
    # base config untouched
    assert TrainConfig().disc.num_scales == 3


def test_variant_does_not_mutate_base():
    base = TrainConfig()
    resolve_variant(base, "A0_mse_only")
    assert base.loss.adv == 0.1 and base.radon.enabled


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path, mesh8):
    from tmar.checkpoint.io import CheckpointManager
    from tmar.nn import MultiScaleDiscriminator, NGswin

    gen = NGswin(
        ngrams=(2, 2, 2, 2), embed_dim=32, depths=(2, 2, 2), num_heads=(2, 2, 2),
        dec_dim=32, dec_depths=2, dec_num_heads=2,
    )
    disc = MultiScaleDiscriminator(base_channels=16, num_scales=2)
    g_tx, d_tx = optax.adam(1e-4), optax.adam(2e-4)
    state = create_train_state(jax.random.PRNGKey(0), gen, disc, g_tx, d_tx, 64)

    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep_last_n=2)
    for s in (1, 2, 3, 4):
        mgr.save(state, step=s, meta={"epoch": s})
    # retention pruned to last 2
    assert mgr.latest_step() == 4
    assert len([d for d in os.listdir(tmp_path / "ckpt") if d.startswith("step_")]) == 2

    restored, meta = mgr.restore(state)
    assert meta["epoch"] == 4
    a = jax.tree_util.tree_leaves(state.g_params)[0]
    b = jax.tree_util.tree_leaves(restored.g_params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # best-model path
    mgr.save(state, step=9, meta={"best_psnr": 31.5}, best=True)
    _, best_meta = mgr.restore(state, best=True)
    assert best_meta["best_psnr"] == 31.5


def test_repeated_set_flags_all_apply():
    # regression: argparse nargs="*" without action="append" silently kept
    # only the LAST --set occurrence, so `--set a=1 --set b=2` dropped a=1
    from tmar.cli import _parse_sets

    # repeated occurrences (list-of-lists, as action="append" delivers)
    out = _parse_sets([["num_epochs=1"], ["data.patch_size=32"]])
    assert out == {"num_epochs": 1, "data.patch_size": 32}
    # single occurrence with several pairs
    out = _parse_sets([["a=1", "b=yes"]])
    assert out == {"a": 1, "b": True}
    # and they actually reach the config
    cfg = load_config(None, _parse_sets([["num_epochs=3"], ["data.batch_size=2"]]))
    assert cfg.num_epochs == 3 and cfg.data.batch_size == 2
