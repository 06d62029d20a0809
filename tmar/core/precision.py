"""Mixed-precision policy.

TPU MXU natively computes in bfloat16.  Policy: parameters and optimizer state
in float32, activations/compute optionally bfloat16, losses and metrics always
float32.  The reference trains in float32 everywhere (AMP appears only in its
benchmark fine-tuning, reference scripts/finetune_all_benchmarks.py:79-84);
here bf16 compute is a first-class switch.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.float32
    output_dtype: Any = jnp.float32

    def cast_to_compute(self, tree):
        import jax

        return jax.tree_util.tree_map(
            lambda x: x.astype(self.compute_dtype)
            if hasattr(x, "astype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )

    def cast_to_output(self, tree):
        import jax

        return jax.tree_util.tree_map(
            lambda x: x.astype(self.output_dtype)
            if hasattr(x, "astype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )


DEFAULT_POLICY = Policy()
BF16_POLICY = Policy(compute_dtype=jnp.bfloat16)
