"""Multi-device parallel execution helpers.

The reference has no distributed layer at all (SURVEY.md §2.12/5.8); here
parallelism is first-class:

* training: the batch axis is sharded over the mesh inside the jit'd train
  step (tmar.train.steps) — standard data parallelism with XLA-inserted
  gradient psums;
* large-slice inference: ``sharded_tiled_eval`` distributes the overlapping
  tiles of one (or more) full CT slices across every device in the mesh —
  window tiles are embarrassingly parallel, and the coverage-weighted
  average handles the seams (the TPU-native scale-up of the reference's
  single-GPU tiled eval, testing/test_finetuned_model.py:150-235;
  SURVEY.md §5.7).

Re-exports the mesh utilities so ``tmar.parallel`` is the one import for
distributed use.
"""

from __future__ import annotations

from typing import Callable, List

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from tmar.core.mesh import (  # noqa: F401  (re-exports)
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    create_mesh,
    local_mesh_devices,
    replicate,
    replicated_sharding,
    shard_batch,
)
from tmar.eval.inference import _tile_positions


def sharded_tile_forward(generator, params, mesh) -> Callable[[np.ndarray], np.ndarray]:
    """Return a tile-batch forward with tiles sharded over the data axis and
    parameters replicated."""
    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P(DATA_AXIS))
    params = jax.device_put(params, repl)

    fwd = jax.jit(
        lambda p, t: generator.apply({"params": p}, t),
        in_shardings=(repl, data_sh),
        out_shardings=data_sh,
    )
    return lambda tiles: np.asarray(fwd(params, tiles))


def sharded_tiled_eval(
    generator,
    params,
    mesh,
    ct: np.ndarray,
    tile: int = 64,
    stride: int = 32,
) -> np.ndarray:
    """Overlapping tiled inference with tiles spread across the mesh.

    ct: [B, H, W, 1] in [-1, 1] -> restored [B, H, W, 1].
    """
    n_dev = int(np.prod(mesh.devices.shape))
    B, H, W, C = ct.shape
    rows = _tile_positions(H, tile, stride)
    cols = _tile_positions(W, tile, stride)
    coords = [(r, c) for r in rows for c in cols]

    tiles = np.stack(
        [ct[b, r : r + tile, c : c + tile, :] for b in range(B) for (r, c) in coords]
    )
    n = tiles.shape[0]
    pad = (-n) % n_dev
    if pad:
        tiles = np.concatenate([tiles, np.zeros((pad,) + tiles.shape[1:], tiles.dtype)])

    forward = sharded_tile_forward(generator, params, mesh)
    results = forward(tiles)[:n]

    out = np.zeros_like(ct, dtype=np.float64)
    weight = np.zeros((1, H, W, 1), dtype=np.float64)
    k = 0
    for b in range(B):
        for r, c in coords:
            out[b, r : r + tile, c : c + tile, :] += results[k]
            k += 1
    for r, c in coords:
        weight[0, r : r + tile, c : c + tile, :] += 1.0
    return (out / weight).astype(np.float32)
