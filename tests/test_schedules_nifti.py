"""Tests for LR schedules / LLRD and the NIfTI reader/writer + clinic path."""

import numpy as np
import pytest

from tmar.train.schedules import (
    build_optimizer,
    layerwise_lr_decay,
    multistep,
    ngswin_layer_id,
    step_half,
    warmup_cosine,
)


def test_step_half():
    s = step_half(1.0, 10)
    assert s(0) == 1.0 and s(9) == 1.0
    assert s(10) == 0.5 and s(25) == 0.25


def test_multistep():
    s = multistep(1.0, [5, 10], gamma=0.1)
    assert s(4) == 1.0
    np.testing.assert_allclose(s(5), 0.1)
    np.testing.assert_allclose(s(12), 0.01)


def test_warmup_cosine():
    s = warmup_cosine(1e-3, total_steps=100, warmup_steps=10)
    assert float(s(0)) == 0.0
    np.testing.assert_allclose(float(s(10)), 1e-3, rtol=1e-5)
    assert float(s(100)) < 1e-4


def test_layer_ids_ordering():
    assert ngswin_layer_id("shallow_extract/conv1/kernel") == 0
    e1 = ngswin_layer_id("encoder_layer1/blocks_0/attn/qkv/kernel")
    e3 = ngswin_layer_id("encoder_layer3/blocks_1/attn/qkv/kernel")
    dec = ngswin_layer_id("decoder_layer1/blocks_0/attn/qkv/kernel")
    head = ngswin_layer_id("to_target_before_shuffle/kernel")
    assert 0 < e1 < e3 < dec < head


def test_llrd_scales_updates():
    params = {
        "shallow_extract": {"conv1": {"kernel": np.ones(3, np.float32)}},
        "to_target_before_shuffle": {"kernel": np.ones(3, np.float32)},
    }
    tx = layerwise_lr_decay(params, 1.0, decay=0.5)
    state = tx.init(params)
    updates = {
        "shallow_extract": {"conv1": {"kernel": np.ones(3, np.float32)}},
        "to_target_before_shuffle": {"kernel": np.ones(3, np.float32)},
    }
    scaled, _ = tx.update(updates, state)
    # head (max id) keeps full LR; shallow is decayed
    head = scaled["to_target_before_shuffle"]["kernel"]
    shallow = scaled["shallow_extract"]["conv1"]["kernel"]
    np.testing.assert_allclose(head, 1.0)
    assert shallow[0] < head[0]


def test_build_optimizer_runs():
    import jax.numpy as jnp

    params = {"w": jnp.ones((4,))}
    tx = build_optimizer(1e-3, schedule=step_half(1e-3, 5), grad_clip=1.0)
    state = tx.init(params)
    updates, _ = tx.update({"w": jnp.ones((4,))}, state, params)
    assert float(updates["w"][0]) < 0  # descent direction


# ---------------------------------------------------------------- NIfTI
def test_nifti_roundtrip(tmp_path, rng):
    from tmar.data.nifti import read_nifti, write_nifti

    vol = rng.standard_normal((12, 10, 6)).astype(np.float32)
    affine = np.diag([1.0, 2.0, 3.0, 1.0])
    for name in ("vol.nii", "vol.nii.gz"):
        p = str(tmp_path / name)
        write_nifti(p, vol, affine)
        data, aff = read_nifti(p)
        np.testing.assert_allclose(data, vol, rtol=1e-6)
        np.testing.assert_allclose(aff, affine)


def test_nifti_int16_scaling(tmp_path):
    from tmar.data.nifti import read_nifti, write_nifti

    vol = (np.arange(24).reshape(4, 3, 2) - 10).astype(np.int16)
    p = str(tmp_path / "i16.nii")
    write_nifti(p, vol)
    data, _ = read_nifti(p)
    np.testing.assert_array_equal(data, vol)


def test_restore_volume_clinic(tmp_path):
    from tmar.data.nifti import write_nifti, read_nifti
    from tmar.eval.clinic import restore_nifti_file

    # HU volume: identity model -> output equals HU-windowed input in [0,1]
    vol = np.random.default_rng(0).uniform(-1000, 2000, (16, 16, 5)).astype(np.float32)
    src = str(tmp_path / "in.nii.gz")
    write_nifti(src, vol)
    out_path = restore_nifti_file(lambda x: x, src, str(tmp_path / "out.nii.gz"), batch_size=2)
    restored, _ = read_nifti(out_path)
    assert restored.shape == vol.shape
    expected = (np.clip(vol, -1000, 2000) + 1000) / 3000
    np.testing.assert_allclose(restored, expected, atol=1e-5)
