"""SOAP optimizer (ShampoO with Adam in the Preconditioner's eigenbasis).

TPU-native optax implementation of the algorithm the reference vendors in
rnn/soap.py:11-430 (arXiv 2409.11321) and recommends as the default for
rollout training (train_rnn_rollout_torchscript_hydra.py:13,683-684).

Per 2-D parameter W [m, n]:
  L <- b2p*L + (1-b2p) * G @ G.T ;  R <- b2p*R + (1-b2p) * G.T @ G
  every ``precondition_frequency`` steps: QL, QR <- eigh(L), eigh(R)
  G' = QL.T @ G @ QR ; Adam moments run on G'
  update = QL @ (m_hat / (sqrt(v_hat)+eps)) @ QR.T

Non-matrix parameters fall back to plain Adam. Higher-rank parameters are
reshaped to 2-D by merging leading axes. The periodic eigendecompositions
run under ``lax.cond`` so the jitted step has a single program; eigh on
(<=1024)^2 matrices is cheap relative to a training step.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class _SoapParamState(NamedTuple):
    exp_avg: jnp.ndarray
    exp_avg_sq: jnp.ndarray
    L: jnp.ndarray | None
    R: jnp.ndarray | None
    QL: jnp.ndarray | None
    QR: jnp.ndarray | None


class SoapState(NamedTuple):
    count: jnp.ndarray
    inner: dict


def _as2d(g):
    if g.ndim < 2:
        return None
    if g.ndim == 2:
        return g.shape
    import math
    return (math.prod(g.shape[:-1]), g.shape[-1])


def soap(learning_rate: float = 3e-3, b1: float = 0.95, b2: float = 0.95,
         shampoo_beta: float = 0.95, eps: float = 1e-8,
         precondition_frequency: int = 10, weight_decay: float = 0.0,
         max_precond_dim: int = 4096) -> optax.GradientTransformation:

    def init_fn(params):
        def init_param(p):
            shape2d = _as2d(p)
            if shape2d is None or max(shape2d) > max_precond_dim:
                return _SoapParamState(jnp.zeros_like(p), jnp.zeros_like(p),
                                       None, None, None, None)
            m, n = shape2d
            return _SoapParamState(
                exp_avg=jnp.zeros(shape2d, p.dtype),
                exp_avg_sq=jnp.zeros(shape2d, p.dtype),
                L=jnp.zeros((m, m), p.dtype), R=jnp.zeros((n, n), p.dtype),
                QL=jnp.eye(m, dtype=p.dtype), QR=jnp.eye(n, dtype=p.dtype))
        inner = jax.tree_util.tree_map(init_param, params)
        return SoapState(count=jnp.zeros([], jnp.int32), inner=inner)

    def update_fn(grads, state, params=None):
        count = state.count + 1
        # optax-style schedule support: callable learning_rate(step)
        lr_t = learning_rate(count) if callable(learning_rate) \
            else learning_rate

        def upd(g, s, p):
            shape2d = _as2d(g)
            if s.L is None:
                # plain Adam path
                m = b1 * s.exp_avg + (1 - b1) * g
                v = b2 * s.exp_avg_sq + (1 - b2) * g * g
                mh = m / (1 - b1 ** count)
                vh = v / (1 - b2 ** count)
                u = mh / (jnp.sqrt(vh) + eps)
                if weight_decay and p is not None:
                    u = u + weight_decay * p
                return -lr_t * u, _SoapParamState(
                    m, v, None, None, None, None)

            g2 = g.reshape(shape2d)
            L = shampoo_beta * s.L + (1 - shampoo_beta) * (g2 @ g2.T)
            R = shampoo_beta * s.R + (1 - shampoo_beta) * (g2.T @ g2)

            def refresh(_):
                # eigh in f32 for stability; eigenvectors sorted ascending
                _, ql = jnp.linalg.eigh(L.astype(jnp.float32))
                _, qr = jnp.linalg.eigh(R.astype(jnp.float32))
                return ql.astype(g2.dtype), qr.astype(g2.dtype)

            QL, QR = jax.lax.cond(
                (count % precondition_frequency) == 1,
                refresh, lambda _: (s.QL, s.QR), operand=None)

            gp = QL.T @ g2 @ QR
            m = b1 * s.exp_avg + (1 - b1) * gp
            v = b2 * s.exp_avg_sq + (1 - b2) * gp * gp
            mh = m / (1 - b1 ** count)
            vh = v / (1 - b2 ** count)
            u2 = QL @ (mh / (jnp.sqrt(vh) + eps)) @ QR.T
            u = u2.reshape(g.shape)
            if weight_decay and p is not None:
                u = u + weight_decay * p
            return -lr_t * u, _SoapParamState(m, v, L, R, QL, QR)

        params_tree = params if params is not None else grads
        flat_g, treedef = jax.tree_util.tree_flatten(grads)
        flat_s = treedef.flatten_up_to(state.inner)
        flat_p = jax.tree_util.tree_leaves(params_tree)
        outs = [upd(g, s, p) for g, s, p in zip(flat_g, flat_s, flat_p)]
        updates = treedef.unflatten([o[0] for o in outs])
        new_inner = treedef.unflatten([o[1] for o in outs])
        return updates, SoapState(count=count, inner=new_inner)

    return optax.GradientTransformation(init_fn, update_fn)
