"""Sharded tiled inference across the 8-device mesh."""

import numpy as np

import jax
import jax.numpy as jnp

from tmar.nn import NGswin
from tmar.parallel import sharded_tiled_eval
from tmar.eval.inference import tiled_eval
import pytest


TINY = dict(
    ngrams=(2, 2, 2, 2), embed_dim=32, depths=(2, 2, 2), num_heads=(2, 2, 2),
    dec_dim=32, dec_depths=2, dec_num_heads=2, window_size=8,
)


@pytest.mark.slow
def test_sharded_tiled_matches_single_device(mesh8, rng):
    gen = NGswin(**TINY)
    ct = rng.uniform(-1, 1, (1, 96, 96, 1)).astype(np.float32)
    params = gen.init(jax.random.PRNGKey(0), jnp.asarray(ct[:, :64, :64]))["params"]

    out_sharded = sharded_tiled_eval(gen, params, mesh8, ct, tile=64, stride=32)

    fwd = jax.jit(lambda t: gen.apply({"params": params}, t))
    out_single = tiled_eval(lambda t: np.asarray(fwd(jnp.asarray(t))), ct, tile=64, stride=32)
    np.testing.assert_allclose(out_sharded, out_single, atol=2e-5, rtol=1e-4)
