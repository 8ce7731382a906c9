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


def input_prune_mask(vset: V.VariableSet, mode: str,
                     strato_lev: int = 15, strato_lev_qc: int = 30,
                     strato_lev_qinput: int | None = None,
                     strato_lev_tinput: int = 0,
                     dtype=np.float32) -> np.ndarray:
    """Static input-feature mask for the online-trainer dataset variants
    (climsim_datapip.py:91-125), declarative over the variable registry
    instead of the reference's literal flat indices:

    * ``decouple_cloud``: zero every cloud-condensate profile (state and
      previous-physics q0002/q0003 channels).
    * ``aggressive``: zero the top stratosphere levels of every profile
      except state temperature and the gas profiles — humidity-like
      channels (rh/q0001/q0003) use ``strato_lev_qinput``, q0002 uses
      ``strato_lev_qc``, everything else ``strato_lev``; also zeros
      SNOWHICE.
    * ``qinput``: zero only the top levels of state_q0002/q0003.

    ``strato_lev_tinput>0`` additionally zeros the top temperature levels.
    """
    qin = strato_lev if strato_lev_qinput is None else strato_lev_qinput
    mask = np.ones(vset.inputs.total, dtype)
    sl_of = vset.inputs.slices
    if mode == "decouple_cloud":
        for n in vset.inputs.lev_names:
            if "q0002" in n or "q0003" in n:
                mask[sl_of[n]] = 0.0
    elif mode == "aggressive":
        for n in vset.inputs.lev_names:
            if n == "state_t" or n.startswith("pbuf"):
                continue
            if "_dyn" in n:
                k = strato_lev
            elif "q0002" in n:
                k = strato_lev_qc
            elif "q0001" in n or "q0003" in n or "rh" in n:
                k = qin
            else:
                k = strato_lev
            s = sl_of[n]
            mask[s.start:s.start + k] = 0.0
        if "cam_in_SNOWHICE" in sl_of:
            mask[sl_of["cam_in_SNOWHICE"]] = 0.0
    elif mode == "qinput":
        for n in ("state_q0002", "state_q0003"):
            if n in sl_of:
                s = sl_of[n]
                mask[s.start:s.start + strato_lev] = 0.0
    else:
        raise ValueError(f"unknown prune mode {mode!r}")
    if strato_lev_tinput > 0 and "state_t" in sl_of:
        s = sl_of["state_t"]
        mask[s.start:s.start + strato_lev_tinput] = 0.0
    return mask
