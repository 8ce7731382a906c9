"""Heteroskedastic regression (HSR) baseline: MLE mean + log-precision MLPs.

Capability parity with baseline_models/HSR/training/hsr.py:38-154: two
independent MLPs predict mean and log-precision; NLL loss
``prec*(y-mu)^2 - logprec`` after an MSE-only warm phase (first third of
epochs); ``sample`` draws ``mu + eps * prec^-0.5`` for CRPS scoring; the
gamma/rho regularization trade-off maps to separate weight decays on the
two towers (optax.masked adamw in the trainer).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import Policy, F32


class _Tower(nn.Module):
    out_dim: int
    hidden: int
    layers: int
    policy: Policy

    @nn.compact
    def __call__(self, x):
        h = self.policy.cast_in(x)
        for i in range(self.layers):
            # reference tower: Linear -> LayerNorm -> (Dropout) -> ReLU
            # (hsr.py:20-33)
            h = nn.Dense(self.hidden, dtype=self.policy.compute_dtype,
                         param_dtype=self.policy.param_dtype,
                         name=f"hidden_{i}")(h)
            h = nn.relu(nn.LayerNorm(name=f"ln_{i}")(h))
        y = nn.Dense(self.out_dim, dtype=self.policy.compute_dtype,
                     param_dtype=self.policy.param_dtype, name="out")(h)
        return self.policy.cast_out(y)


class HSR(nn.Module):
    out_dim: int = 128
    hidden: int = 512
    layers: int = 1
    policy: Policy = F32

    @nn.compact
    def __call__(self, x):
        mean = _Tower(self.out_dim, self.hidden, self.layers, self.policy,
                      name="mean")(x)
        logprec = _Tower(self.out_dim, self.hidden, self.layers, self.policy,
                         name="logprec")(x)
        return mean, logprec


def hsr_nll(mean, logprec, y, warm: bool = False):
    """MLE loss with MSE warm phase (hsr.py:131-139)."""
    if warm:
        return jnp.mean(jnp.square(y - mean))
    prec = jnp.exp(logprec)
    return jnp.mean(prec * jnp.square(y - mean) - logprec)


def hsr_sample(params, model: HSR, x, key, num_samples: int = 1):
    """Draw samples mu + eps * prec^-0.5; returns [..., num_samples]."""
    mean, logprec = model.apply(params, x)
    std = jnp.exp(-0.5 * logprec)
    eps = jax.random.normal(key, mean.shape + (num_samples,), mean.dtype)
    return mean[..., None] + eps * std[..., None]
