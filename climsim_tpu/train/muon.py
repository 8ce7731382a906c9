"""Muon optimizer: momentum + Newton-Schulz orthogonalization.

The reference trainer offers 'muon' alongside adam/adamw/schedulefree/soap
(train_rnn_rollout_torchscript_hydra.py:675-698). This is a from-scratch
optax implementation: for matrix parameters the momentum buffer is
orthogonalized with 5 iterations of the quintic Newton-Schulz polynomial
(the standard public Muon recipe); vectors/scalars fall back to Adam.
Newton-Schulz is matmul-only — ideal for the MXU.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

_NS_COEFFS = (3.4445, -4.7750, 2.0315)


def newton_schulz_orthogonalize(G: jnp.ndarray, steps: int = 5) -> jnp.ndarray:
    """Approximately project a matrix onto the nearest orthogonal matrix via
    the odd quintic iteration X <- aX + b(XX^T)X + c(XX^T)^2 X."""
    a, b, c = _NS_COEFFS
    transpose = G.shape[0] > G.shape[1]
    X = G.T if transpose else G
    X = X / (jnp.linalg.norm(X) + 1e-7)

    def body(_, X):
        A = X @ X.T
        B = b * A + c * (A @ A)
        return a * X + B @ X

    X = jax.lax.fori_loop(0, steps, body, X)
    return X.T if transpose else X


class MuonState(NamedTuple):
    count: jnp.ndarray
    momentum: dict
    adam_m: dict
    adam_v: dict


def muon(learning_rate: float = 0.02, momentum: float = 0.95,
         nesterov: bool = True, ns_steps: int = 5,
         adam_lr: float | None = None, b1: float = 0.9, b2: float = 0.999,
         eps: float = 1e-8,
         weight_decay: float = 0.0) -> optax.GradientTransformation:
    if adam_lr is None:
        adam_lr = (lambda t: learning_rate(t) / 20.0) \
            if callable(learning_rate) else learning_rate / 20

    def is_matrix(p):
        return p.ndim >= 2

    def init_fn(params):
        z = jax.tree_util.tree_map(jnp.zeros_like, params)
        return MuonState(jnp.zeros([], jnp.int32), z,
                         jax.tree_util.tree_map(jnp.zeros_like, params),
                         jax.tree_util.tree_map(jnp.zeros_like, params))

    def update_fn(grads, state, params=None):
        count = state.count + 1
        lr_t = learning_rate(count) if callable(learning_rate) \
            else learning_rate
        adam_lr_t = adam_lr(count) if callable(adam_lr) else adam_lr

        def upd(g, mom, am, av, p):
            if is_matrix(g):
                m = momentum * mom + g
                eff = g + momentum * m if nesterov else m
                g2 = eff.reshape(-1, eff.shape[-1]) if eff.ndim > 2 else eff
                o = newton_schulz_orthogonalize(g2, ns_steps)
                o = o.reshape(eff.shape)
                # scale update to RMS comparable with adam (public recipe)
                scale = jnp.sqrt(jnp.maximum(1.0, g2.shape[0] / g2.shape[1]))
                u = o * scale
                if weight_decay and p is not None:
                    u = u + weight_decay * p
                return -lr_t * u, m, am, av
            m = b1 * am + (1 - b1) * g
            v = b2 * av + (1 - b2) * g * g
            mh = m / (1 - b1 ** count)
            vh = v / (1 - b2 ** count)
            u = mh / (jnp.sqrt(vh) + eps)
            if weight_decay and p is not None:
                u = u + weight_decay * p
            return -adam_lr_t * u, mom, m, v

        params_tree = params if params is not None else grads
        flat_g, treedef = jax.tree_util.tree_flatten(grads)
        flat_mom = treedef.flatten_up_to(state.momentum)
        flat_am = treedef.flatten_up_to(state.adam_m)
        flat_av = treedef.flatten_up_to(state.adam_v)
        flat_p = jax.tree_util.tree_leaves(params_tree)
        outs = [upd(*t) for t in zip(flat_g, flat_mom, flat_am, flat_av,
                                     flat_p)]
        return (treedef.unflatten([o[0] for o in outs]),
                MuonState(count,
                          treedef.unflatten([o[1] for o in outs]),
                          treedef.unflatten([o[2] for o in outs]),
                          treedef.unflatten([o[3] for o in outs])))

    return optax.GradientTransformation(init_fn, update_fn)
