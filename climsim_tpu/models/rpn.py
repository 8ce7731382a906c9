"""Randomized-prior network (RPN) ensemble emulator.

Capability parity with baseline_models/RPN/training/rpn_model_v1_data.py:
41-259 (itself JAX): an ensemble of MLPs (default 124 -> 768 -> 640 -> 512
-> 640 -> 640 -> 128) where each member's prediction is
``trainable(x) + prior(x)`` with a frozen randomly-initialized prior net.
The whole ensemble trains simultaneously via ``vmap`` over the member axis
— on TPU this becomes one batched matmul per layer (members on a leading
contraction axis), and can be sharded over a mesh 'ensemble' axis.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

import flax.linen as nn

from .common import Policy, F32


class _RPNMLP(nn.Module):
    """The reference RPN's MLP exactly (rpn_model_v1_data.py:37-59):
    leaky-ReLU with slope 0.15 on hidden layers, PLAIN linear output —
    no ReLU'd scalar head (unlike the other MLP baselines)."""

    out_dim: int
    features: tuple
    policy: Policy = F32

    @nn.compact
    def __call__(self, x):
        h = self.policy.cast_in(x)
        for i, w in enumerate(self.features):
            h = nn.Dense(w, dtype=self.policy.compute_dtype,
                         param_dtype=self.policy.param_dtype,
                         name=f"dense_{i}")(h)
            h = jnp.where(h > 0, h, 0.15 * h)
        y = nn.Dense(self.out_dim, dtype=self.policy.compute_dtype,
                     param_dtype=self.policy.param_dtype, name="head")(h)
        return self.policy.cast_out(y)


def _make_mlp(out_dim, features, policy):
    return _RPNMLP(out_dim=out_dim, features=tuple(features),
                   policy=policy)


class RPNEnsemble:
    """Functional ensemble wrapper: params are pytrees with a leading member
    axis; apply/vmap handled internally."""

    def __init__(self, out_dim: int = 128,
                 features=(768, 640, 512, 640, 640),
                 num_members: int = 32, policy: Policy = F32):
        self.net = _make_mlp(out_dim, features, policy)
        self.prior = _make_mlp(out_dim, features, policy)
        self.num_members = num_members

    def init(self, key, x):
        kn, kp = jax.random.split(key)
        net_params = jax.vmap(lambda k: self.net.init(k, x))(
            jax.random.split(kn, self.num_members))
        prior_params = jax.vmap(lambda k: self.prior.init(k, x))(
            jax.random.split(kp, self.num_members))
        return {"net": net_params, "prior": prior_params}

    def apply(self, params, x):
        """[members, B, ny] ensemble predictions (trainable + frozen prior)."""
        def member(pn, pp):
            return self.net.apply(pn, x) + jax.lax.stop_gradient(
                self.prior.apply(pp, x))
        return jax.vmap(member)(params["net"], params["prior"])

    def apply_mean(self, params, x):
        return jnp.mean(self.apply(params, x), axis=0)

    def samples(self, params, x):
        """Members as CRPS samples: [B, ny, members]."""
        return jnp.moveaxis(self.apply(params, x), 0, -1)

    def loss(self, params, x, y):
        preds = self.apply(params, x)      # [M, B, ny]
        return jnp.mean(jnp.square(preds - y[None]))
