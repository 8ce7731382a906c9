"""Shared model utilities: mixed-precision policy and output heads.

Design notes (TPU-first):
* Parameters live in float32; matmul compute can run in bfloat16 — on TPU
  the MXU natively accumulates bf16 x bf16 into f32, so ``Policy`` casts
  activations at module entry and restores f32 at the head.
* Every emulator follows the same output contract as the reference zoo:
  linear head for tendencies + non-negative (ReLU/softplus) head for the
  8 surface flux scalars (baseline_models/MLP/.../hpo_baseline_v1.py:99-101,
  online_testing MLP mlp.py:27-67 ReLU on last 8 scalars).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class Policy:
    """Mixed precision policy: cast activations to compute_dtype inside the
    network, emit outputs in output_dtype."""

    compute_dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    output_dtype: jnp.dtype = jnp.float32

    def cast_in(self, x):
        return jnp.asarray(x, self.compute_dtype)

    def cast_out(self, x):
        return jnp.asarray(x, self.output_dtype)


F32 = Policy(jnp.float32, jnp.float32, jnp.float32)
BF16 = Policy()


def split_scalar_head(y: jnp.ndarray, n_scalars: int = 8) -> jnp.ndarray:
    """Apply the reference's non-negativity constraint to the trailing
    surface-flux scalars (ReLU on last ``n_scalars`` features)."""
    lev, sfc = y[..., :-n_scalars], y[..., -n_scalars:]
    return jnp.concatenate([lev, jnp.maximum(sfc, 0.0)], axis=-1)


class PositiveLinear:
    """Weight-clamped linear layer (rnn/layers.py:23-37 PositiveLinear):
    functional form — clamp the kernel at use, not at init, so gradient
    updates stay unconstrained while the forward map is non-negative."""

    @staticmethod
    def apply(kernel, bias, x):
        import jax.numpy as jnp
        return x @ jnp.maximum(kernel, 0.0) + bias
