"""Probabilistic loss/metric family for ensemble & stochastic training.

jnp re-implementation of the CRPS-family losses and ensemble diagnostics of
rnn/metrics.py: sample-sorted CRPS (:535), L1-kernel CRPS (:628),
anemoi-style almost-fair CRPS (:701), variogram score (:927), energy score
(:959-995), Dawid-Sebastiani score (:997), and the spread-skill ratio
(:487-533). Ensemble members ride on a leading axis [M, B, ...] (matching
the vmap/ensemble batch convention of the trainers).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def crps_sample_sorted(ens: jnp.ndarray, obs: jnp.ndarray,
                       beta: float = 1.0) -> jnp.ndarray:
    """Sorted-sample CRPS estimator, mean over batch/features
    (rnn/metrics.py:535; same estimator as the evaluation-side
    metrics.crps). ens [M, ...], obs [...]. ``beta`` scales the skill
    term (the reference's CRPS beta, rnn/metrics.py:610 — 'should be
    1'; >1 trades spread for skill)."""
    M = ens.shape[0]
    mae = beta * jnp.mean(jnp.abs(ens - obs[None]), axis=0)
    s = jnp.sort(ens, axis=0)
    diff = s[1:] - s[:-1]
    count = (jnp.arange(1, M) * jnp.arange(M - 1, 0, -1))
    count = count.reshape((-1,) + (1,) * obs.ndim)
    spread = jnp.sum(diff * count, axis=0) / (M * (M - 1))
    return jnp.mean(mae - spread)


def crps_kernel(ens: jnp.ndarray, obs: jnp.ndarray,
                fair: bool = True, beta: float = 1.0) -> jnp.ndarray:
    """L1-kernel CRPS: beta*E|X-y| - 0.5*E|X-X'| (rnn/metrics.py:628);
    the 'fair' form divides the spread term by M*(M-1)."""
    M = ens.shape[0]
    term1 = beta * jnp.mean(jnp.abs(ens - obs[None]), axis=0)
    pair = jnp.abs(ens[:, None] - ens[None, :])          # [M, M, ...]
    denom = M * (M - 1) if fair else M * M
    term2 = 0.5 * jnp.sum(pair, axis=(0, 1)) / denom
    return jnp.mean(term1 - term2)


def crps_almost_fair(ens: jnp.ndarray, obs: jnp.ndarray,
                     alpha: float = 0.95, beta: float = 1.0) -> jnp.ndarray:
    """Almost-fair CRPS (anemoi-style, rnn/metrics.py:701): interpolates
    between the biased (1/M^2) and fair (1/(M(M-1))) spread estimators to
    keep gradients bounded for small ensembles."""
    M = ens.shape[0]
    term1 = beta * jnp.mean(jnp.abs(ens - obs[None]), axis=0)
    pair = jnp.abs(ens[:, None] - ens[None, :])
    e_spread = jnp.sum(pair, axis=(0, 1))
    fair = e_spread / (M * (M - 1))
    biased = e_spread / (M * M)
    term2 = 0.5 * (alpha * fair + (1.0 - alpha) * biased)
    return jnp.mean(term1 - term2)


def spread_skill_ratio(ens: jnp.ndarray, obs: jnp.ndarray) -> jnp.ndarray:
    """Ensemble spread / RMSE of the ensemble mean, with the (M+1)/M
    inflation (rnn/metrics.py:487-533). ~1 for a reliable ensemble."""
    M = ens.shape[0]
    mean = jnp.mean(ens, axis=0)
    skill = jnp.sqrt(jnp.mean(jnp.square(mean - obs)))
    spread = jnp.sqrt(jnp.mean(jnp.var(ens, axis=0, ddof=1)))
    return jnp.sqrt((M + 1) / M) * spread / jnp.maximum(skill, 1e-30)


def variogram_score(ens: jnp.ndarray, obs: jnp.ndarray, p: float = 0.5,
                    max_pairs: int = 64) -> jnp.ndarray:
    """Variogram score of order p over the trailing feature axis
    (rnn/metrics.py:927): penalizes mis-represented spatial correlation.
    ens [M, B, D], obs [B, D]; uses a strided subset of feature pairs."""
    D = obs.shape[-1]
    stride = max(1, D // max_pairs)
    idx = jnp.arange(0, D - 1, stride)
    o_d = jnp.abs(obs[..., idx] - obs[..., idx + 1]) ** p
    e_d = jnp.mean(jnp.abs(ens[..., idx] - ens[..., idx + 1]) ** p, axis=0)
    return jnp.mean(jnp.square(o_d - e_d))


def energy_score(ens: jnp.ndarray, obs: jnp.ndarray) -> jnp.ndarray:
    """Multivariate energy score: E||X-y|| - 0.5 E||X-X'||
    (rnn/metrics.py:959-995). ens [M, B, D], obs [B, D]."""
    M = ens.shape[0]

    def safe_norm(x):
        # sqrt with eps so the gradient at the pair diagonal (X_i = X_i,
        # norm 0) stays finite
        return jnp.sqrt(jnp.sum(jnp.square(x), axis=-1) + 1e-24)

    t1 = jnp.mean(safe_norm(ens - obs[None]), axis=0)
    pair = safe_norm(ens[:, None] - ens[None, :])
    t2 = 0.5 * jnp.sum(pair, axis=(0, 1)) / (M * (M - 1))
    return jnp.mean(t1 - t2)


def dawid_sebastiani(ens: jnp.ndarray, obs: jnp.ndarray,
                     eps: float = 1e-12) -> jnp.ndarray:
    """Dawid-Sebastiani score from ensemble mean/std (rnn/metrics.py:997)."""
    mean = jnp.mean(ens, axis=0)
    var = jnp.var(ens, axis=0, ddof=1) + eps
    return jnp.mean(jnp.log(var) + jnp.square(obs - mean) / var)
