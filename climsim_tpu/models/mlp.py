"""MLP baseline emulator (flat feature vector in, flat tendencies out).

Capability parity with the reference MLP family:
* NeurIPS v1 baseline: 2-12 dense layers x 128-1024 units, relu/elu, linear
  head for tendencies + ReLU head for the 8 surface scalars
  (baseline_models/MLP/training/HPO/baseline_v1/hpo_baseline_v1.py:58-115).
* ClimSim-Online MLP_v2rh: plain ReLU MLP with stratosphere output pruning
  and ReLU'd scalars (online_testing/baseline_models/MLP_v2rh/training/
  mlp.py:27-67).

TPU-first: batched dense stacks hit the MXU directly; optional bf16 compute
via the shared Policy; output pruning is a static mask multiply fused by XLA
(instead of index assignment).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .. import variables as V
from .common import Policy, F32


def output_prune_mask(vset: V.VariableSet, strato_lev: int = 12,
                      dtype=np.float32) -> np.ndarray:
    """Static mask zeroing stratospheric tendency levels (the reference's
    'aggressive pruning': top ``strato_lev`` levels of non-temperature
    profile outputs, online_testing climsim_datapip.py:11-160 /
    climsim_unet.py:404-409)."""
    mask = np.ones(vset.outputs.total, dtype)
    for name in vset.outputs.lev_names:
        if name == "ptend_t":
            continue
        sl = vset.outputs.slices[name]
        mask[sl.start:sl.start + strato_lev] = 0.0
    return mask


class MLP(nn.Module):
    """Flat MLP emulator.

    features: hidden widths; out_dim: flat target size; n_scalar_head:
    trailing scalars passed through ReLU (non-negative fluxes).
    """

    features: Sequence[int]
    out_dim: int
    n_scalar_head: int = 8
    activation: str = "relu"
    policy: Policy = F32
    prune_mask: tuple | None = None   # static per-feature multiplier

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = {"relu": nn.relu, "elu": nn.elu, "gelu": nn.gelu,
               "leakyrelu": nn.leaky_relu}[self.activation]
        h = self.policy.cast_in(x)
        for i, width in enumerate(self.features):
            h = nn.Dense(width, dtype=self.policy.compute_dtype,
                         param_dtype=self.policy.param_dtype,
                         name=f"dense_{i}")(h)
            h = act(h)
        y = nn.Dense(self.out_dim, dtype=self.policy.compute_dtype,
                     param_dtype=self.policy.param_dtype, name="head")(h)
        y = self.policy.cast_out(y)
        lev = y[..., :-self.n_scalar_head]
        sfc = nn.relu(y[..., -self.n_scalar_head:])
        y = jnp.concatenate([lev, sfc], axis=-1)
        if self.prune_mask is not None:
            y = y * jnp.asarray(np.asarray(self.prune_mask), y.dtype)
        return y


def mlp_for(vset: V.VariableSet, features: Sequence[int] = (768, 640, 512,
            640, 640), policy: Policy = F32, prune: bool = False) -> MLP:
    mask = tuple(output_prune_mask(vset)) if prune else None
    return MLP(features=tuple(features), out_dim=vset.target_feature_len,
               policy=policy, prune_mask=mask)
