"""Conditional VAE baseline: stochastic emulator with KL-regularized latent.

Capability parity with baseline_models/cVAE/training/cvae.py:88-222:
encoder [y, x] -> (mu, logvar) -> reparameterized z; decoder [z, x] ->
(y_mean, y_std); training loss
``mean(0.5*(y-mean)^2/std + log(std)) + beta * KL``; sampling draws z from
the prior and adds output noise ``mean + eps*std`` for CRPS scoring.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import Policy, F32


class _MLPStack(nn.Module):
    widths: tuple
    policy: Policy

    @nn.compact
    def __call__(self, x):
        h = self.policy.cast_in(x)
        for i, w in enumerate(self.widths):
            # reference stack: Linear -> LayerNorm -> (Dropout) -> ReLU
            # (cvae.py:20-39)
            h = nn.Dense(w, dtype=self.policy.compute_dtype,
                         param_dtype=self.policy.param_dtype,
                         name=f"h{i}")(h)
            h = nn.relu(nn.LayerNorm(name=f"ln{i}")(h))
        return h


class CVAE(nn.Module):
    out_dim: int = 128
    latent_dim: int = 5
    hidden: int = 512
    layers: int = 2
    policy: Policy = F32

    def setup(self):
        widths = (self.hidden,) * self.layers
        self.enc = _MLPStack(widths, self.policy)
        self.enc_mu = nn.Dense(self.latent_dim)
        # sigma = exp(linear_logstd) (cvae.py:44-45, log-STD not log-var)
        self.enc_logstd = nn.Dense(self.latent_dim)
        self.dec = _MLPStack(widths, self.policy)
        self.dec_mean = nn.Dense(self.out_dim)
        self.dec_logstd = nn.Dense(self.out_dim)

    def encode(self, y, x):
        h = self.enc(jnp.concatenate([y, x], axis=-1))
        return self.enc_mu(h), self.enc_logstd(h)

    def decode(self, z, x):
        h = self.dec(jnp.concatenate([z, x], axis=-1))
        # std = exp(final_log_std) (cvae.py:76-78)
        return self.dec_mean(h), jnp.exp(self.dec_logstd(h))

    def __call__(self, y, x, key):
        mu, logstd = self.encode(y, x)
        sigma = jnp.exp(logstd)
        eps = jax.random.normal(key, mu.shape, mu.dtype)
        z = mu + eps * sigma
        mean, std = self.decode(z, x)
        # reference KL form: (sigma^2 + mu^2 - log(sigma) - 1/2).mean()
        # (cvae.py:46)
        kl = jnp.mean(sigma ** 2 + mu ** 2 - logstd - 0.5)
        return mean, std, kl

    def sample(self, x, key, random: bool = True):
        kz, ke = jax.random.split(key)
        z = jax.random.normal(kz, x.shape[:-1] + (self.latent_dim,), x.dtype) \
            if random else jnp.zeros(x.shape[:-1] + (self.latent_dim,), x.dtype)
        mean, std = self.decode(z, x)
        if random:
            return mean + jax.random.normal(ke, mean.shape, mean.dtype) * std
        return mean


def cvae_loss(model: CVAE, params, y, x, key, beta: float = 1.0):
    mean, std, kl = model.apply(params, y, x, key)
    nll = jnp.mean(0.5 * jnp.square(y - mean) / std + jnp.log(std))
    return nll + beta * kl


def cvae_samples(model: CVAE, params, x, key, num_samples: int = 32):
    """[B, ny, S] conditional samples for CRPS."""
    keys = jax.random.split(key, num_samples)
    draws = jax.vmap(lambda k: model.apply(params, x, k, method=CVAE.sample))(keys)
    return jnp.moveaxis(draws, 0, -1)
