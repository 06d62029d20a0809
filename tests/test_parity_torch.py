"""Numeric parity: flax models vs the reference PyTorch models.

Randomly initialise the *reference* torch NGswin / MultiScaleDiscriminator,
convert their state_dicts through tmar.checkpoint.torch_import, and verify
the flax forward pass reproduces the torch forward pass element-wise.  This
validates both the architecture re-implementation and the .pth importer
(BASELINE.md checkpoint-parity north-star).

Skipped when /root/reference is not present.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torch_ref import (
    load_reference_discriminator_module,
    load_reference_generator_module,
    reference_available,
)

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not reference_available(), reason="reference repo not available"
    ),
]


@pytest.fixture(scope="module")
def torch_mod():
    import torch

    torch.manual_seed(0)
    return torch


def test_ngswin_parity_small(torch_mod):
    """Small NGswin config (faster): depths (2,2), one decoder block pair."""
    torch = torch_mod
    ref = load_reference_generator_module()
    from tmar.checkpoint import import_ngswin_state_dict
    from tmar.nn import NGswin

    kwargs = dict(
        training_img_size=64,
        ngrams=(2, 2, 2, 2),
        in_chans=1,
        embed_dim=32,
        depths=(2, 2, 2),
        num_heads=(2, 2, 2),
        dec_dim=32,
        dec_depths=2,
        dec_num_heads=2,
        window_size=8,
        mlp_ratio=2.0,
        qkv_bias=True,
    )
    tmodel = ref.NGswin(**kwargs).eval()

    x = np.random.default_rng(1).standard_normal((2, 1, 64, 64)).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x)).numpy()

    params = import_ngswin_state_dict(tmodel.state_dict())
    jmodel = NGswin(
        ngrams=(2, 2, 2, 2),
        in_chans=1,
        embed_dim=32,
        depths=(2, 2, 2),
        num_heads=(2, 2, 2),
        dec_dim=32,
        dec_depths=2,
        dec_num_heads=2,
        window_size=8,
    )
    # verify importer covered every parameter the flax model expects
    ref_shapes = jax.eval_shape(
        jmodel.init, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1))
    )["params"]

    def _flat(tree):
        out = {}
        for path, v in jax.tree_util.tree_flatten_with_path(
            tree, is_leaf=lambda x: hasattr(x, "shape")
        )[0]:
            out["/".join(str(getattr(k, "key", k)) for k in path)] = tuple(v.shape)
        return out

    flat_ref = _flat(ref_shapes)
    flat_got = _flat(params)
    assert flat_ref == flat_got, (
        f"missing: {sorted(set(flat_ref) - set(flat_got))[:5]} "
        f"extra: {sorted(set(flat_got) - set(flat_ref))[:5]} "
        f"mismatched: {[(k, flat_ref[k], flat_got[k]) for k in flat_ref if k in flat_got and flat_ref[k] != flat_got[k]][:5]}"
    )

    j_out = jmodel.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    j_out = np.asarray(j_out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(j_out, t_out, atol=2e-5, rtol=1e-4)


def test_ngswin_parity_nonsquare_eval_shape(torch_mod):
    """Eval-shape path: a 40x56 input exercises padding + dynamic mask."""
    torch = torch_mod
    ref = load_reference_generator_module()
    from tmar.checkpoint import import_ngswin_state_dict
    from tmar.nn import NGswin

    tmodel = ref.NGswin(
        training_img_size=64, ngrams=(2, 2, 2, 2), in_chans=1, embed_dim=32,
        depths=(2, 2, 2), num_heads=(2, 2, 2), dec_dim=32, dec_depths=2,
        dec_num_heads=2, window_size=8,
    ).eval()
    x = np.random.default_rng(3).standard_normal((1, 1, 40, 56)).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x)).numpy()
    params = import_ngswin_state_dict(tmodel.state_dict())
    jmodel = NGswin(
        ngrams=(2, 2, 2, 2), in_chans=1, embed_dim=32, depths=(2, 2, 2),
        num_heads=(2, 2, 2), dec_dim=32, dec_depths=2, dec_num_heads=2, window_size=8,
    )
    j_out = np.asarray(
        jmodel.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    ).transpose(0, 3, 1, 2)
    assert j_out.shape == t_out.shape
    np.testing.assert_allclose(j_out, t_out, atol=2e-5, rtol=1e-4)


def test_discriminator_parity(torch_mod):
    torch = torch_mod
    ref = load_reference_discriminator_module()
    from tmar.checkpoint import import_discriminator_state_dict
    from tmar.nn import MultiScaleDiscriminator

    tmodel = ref.MultiScaleDiscriminator(
        in_channels=2, base_channels=16, num_layers=5, num_scales=3, use_sn=True
    ).eval()
    x = np.random.default_rng(2).standard_normal((2, 2, 128, 128)).astype(np.float32)
    with torch.no_grad():
        t_logits, t_feats = tmodel(torch.from_numpy(x), return_features=True)

    params, sn = import_discriminator_state_dict(tmodel.state_dict())
    jmodel = MultiScaleDiscriminator(base_channels=16)
    j_logits, j_feats = jmodel.apply(
        {"params": params, "sn": sn},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        update_sn=False,
        return_features=True,
    )
    assert len(j_logits) == len(t_logits) == 3

    # Chained f32 convs accumulate implementation-order differences (XLA vs
    # mkldnn); individual elements can suffer cancellation, so compare
    # against the per-tensor dynamic range.
    def _close(j, t, tol=1e-4):
        j = np.asarray(j).transpose(0, 3, 1, 2)
        t = t.numpy()
        scale = np.abs(t).max() + 1e-12
        rel = np.abs(j - t).max() / scale
        assert rel < tol, f"scale-relative error {rel:.2e} (scale {scale:.1f})"

    for jl, tl in zip(j_logits, t_logits):
        _close(jl, tl)
    for js, ts in zip(j_feats, t_feats):
        assert len(js) == len(ts) == 4
        for jf, tf in zip(js, ts):
            _close(jf, tf)
