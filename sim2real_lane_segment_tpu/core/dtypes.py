"""Dtype policy: float32 parameters, bfloat16 compute (MXU-native).

The reference ran full float32 through cuDNN.  On TPU the MXU is fed
bfloat16; parameters and optimizer state stay float32 for stability.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    output_dtype: jnp.dtype = jnp.float32

    def cast_input(self, x):
        return x.astype(self.compute_dtype)

    def cast_output(self, x):
        return x.astype(self.output_dtype)


DEFAULT_POLICY = DTypePolicy()
# Full-f32 policy for parity tests against the reference numerics.
F32_POLICY = DTypePolicy(compute_dtype=jnp.float32)
