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

    Implementation: the fully device-side tiled eval (extraction + forward +
    coverage assembly in one jit, tmar.eval.inference.make_tiled_eval_jit)
    with the flat tile batch sharding-constrained over the data axis — XLA
    splits the forward across devices and all-gathers for the assembly.
    """
    from tmar.eval.inference import make_tiled_eval_jit

    return make_tiled_eval_jit(
        generator, params, tile=tile, stride=stride, mesh=mesh
    )(ct)
