"""tmar → torch checkpoint export (tmar.checkpoint.torch_export).

Three layers of evidence:
1. torch → flax → torch round-trips the state_dict bit-exactly;
2. flax params exported into the *reference* torch NGswin produce the same
   forward output as the flax model (same-weights cross-framework parity —
   the BASELINE.md north-star, here at unit scale; tools/
   adapter_torch_ngswin.py runs the same check at program scale);
3. save_pth output loads back through our own .pth importer unchanged.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))
from torch_ref import load_reference_generator_module, reference_available  # noqa: E402

from tmar.checkpoint import (  # noqa: E402
    export_ngswin_state_dict,
    import_ngswin_state_dict,
    load_torch_checkpoint,
    save_pth,
)
from tmar.nn import NGswin  # noqa: E402

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="/root/reference not present"
)

TINY_TORCH = dict(
    training_img_size=64, ngrams=(2, 2, 2, 2), in_chans=1, embed_dim=32,
    depths=(2, 2, 2), num_heads=(2, 2, 2), dec_dim=32, dec_depths=2,
    dec_num_heads=2, window_size=8, mlp_ratio=2.0, qkv_bias=True,
)
TINY_FLAX = dict(
    ngrams=(2, 2, 2, 2), in_chans=1, embed_dim=32, depths=(2, 2, 2),
    num_heads=(2, 2, 2), dec_dim=32, dec_depths=2, dec_num_heads=2,
    window_size=8,
)


def test_export_inverts_import():
    import torch

    ref = load_reference_generator_module()
    torch.manual_seed(0)
    tmodel = ref.NGswin(**TINY_TORCH).eval()
    sd0 = {
        k: v.detach().cpu().numpy() for k, v in tmodel.state_dict().items()
        if not (k.endswith("relative_position_index") or k.endswith("attn_mask"))
    }
    sd1 = export_ngswin_state_dict(import_ngswin_state_dict(tmodel.state_dict()))
    assert set(sd0) == set(sd1), (
        sorted(set(sd0) - set(sd1))[:5], sorted(set(sd1) - set(sd0))[:5]
    )
    for k in sd0:
        np.testing.assert_array_equal(sd0[k], sd1[k], err_msg=k)


def test_flax_params_run_in_reference_torch_model():
    import torch

    ref = load_reference_generator_module()
    jmodel = NGswin(**TINY_FLAX)
    params = jmodel.init(
        jax.random.PRNGKey(7), jnp.zeros((1, 64, 64, 1))
    )["params"]

    tmodel = ref.NGswin(**TINY_TORCH).eval()
    sd = {k: torch.from_numpy(v) for k, v in export_ngswin_state_dict(params).items()}
    missing, unexpected = tmodel.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    assert all(
        k.endswith("relative_position_index") or k.endswith("attn_mask")
        for k in missing
    ), missing

    x = np.random.default_rng(11).standard_normal((2, 1, 64, 64)).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x)).numpy()
    j_out = np.asarray(
        jmodel.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(j_out, t_out, atol=2e-5, rtol=1e-4)


def test_save_pth_roundtrips_through_importer(tmp_path):
    jmodel = NGswin(**TINY_FLAX)
    params = jmodel.init(
        jax.random.PRNGKey(3), jnp.zeros((1, 64, 64, 1))
    )["params"]
    pth = str(tmp_path / "exported.pth")
    save_pth(params, pth)
    back = import_ngswin_state_dict(load_torch_checkpoint(pth))

    flat0 = {
        "/".join(str(getattr(k, "key", k)) for k in p): np.asarray(v)
        for p, v in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    flat1 = {
        "/".join(str(getattr(k, "key", k)) for k in p): np.asarray(v)
        for p, v in jax.tree_util.tree_flatten_with_path(back)[0]
    }
    assert set(flat0) == set(flat1)
    for k in flat0:
        np.testing.assert_array_equal(flat0[k], flat1[k], err_msg=k)


def test_adapter_torch_ngswin_subprocess_matches_flax(tmp_path):
    """End-to-end over the real SubprocessAdapter protocol: exported .pth →
    reference torch NGswin in its own interpreter → prediction must match
    the flax forward on the same weights (tiny config, 64² sample)."""
    from tmar.eval.adapters import SubprocessAdapter, make_neg11_runner

    jmodel = NGswin(**TINY_FLAX)
    params = jmodel.init(
        jax.random.PRNGKey(5), jnp.zeros((1, 64, 64, 1))
    )["params"]
    pth = str(tmp_path / "tiny.pth")
    save_pth(params, pth)

    rng = np.random.default_rng(13)
    sample = {"Xma": rng.uniform(0, 1, (64, 64)).astype(np.float32)}

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    adapter = SubprocessAdapter(
        [
            sys.executable, os.path.join(repo, "tools", "adapter_torch_ngswin.py"),
            "--pth", pth, "--embed-dim", "32", "--depths", "2", "2", "2",
            "--num-heads", "2", "2", "2", "--dec-dim", "32", "--dec-depths", "2",
            "--dec-num-heads", "2", "--training-img-size", "64",
        ],
        timeout=600.0,
    )
    t_pred = adapter(sample)

    def fwd(x):
        return np.asarray(jmodel.apply({"params": params}, jnp.asarray(x)))

    j_pred = make_neg11_runner(fwd)(sample)
    assert t_pred.shape == j_pred.shape == (64, 64)
    psnr_gap = -10 * np.log10(np.mean((t_pred - j_pred) ** 2) + 1e-20)
    assert psnr_gap > 60, psnr_gap  # same weights, both frameworks: near-identical
