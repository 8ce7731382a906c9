"""SOAP optimizer (ShampoO with Adam in the Preconditioner's eigenbasis).

TPU-native optax implementation, step-for-step equivalent to the
reference's vendored torch SOAP (rnn/soap.py:11-430, arXiv 2409.11321),
the default optimizer of the rollout trainer
(train_rnn_rollout_torchscript_hydra.py:13,683-684). Semantics mirrored
exactly (and pinned by tests/test_soap_parity.py):

* the FIRST step only initializes the preconditioner from the gradient
  and applies NO parameter update (soap.py:148-152 "first step is
  skipped so that we never use the current gradients in the projection");
* per step: project the gradient into the eigenbasis, run Adam moments
  there (denom = sqrt(v)+eps, step-size bias correction
  lr*sqrt(1-b2^t)/(1-b1^t)), project the update back, then decoupled
  weight decay (:160-204);
* the preconditioner accumulators L, R are lerped with the RAW gradient
  AFTER the update (:208-213), so the current gradient never enters its
  own projection;
* every ``precondition_frequency`` steps the eigenbases refresh by one
  power iteration + QR (:373-430): estimated eigenvalues sort the old
  basis columns descending, ``exp_avg_sq`` is PERMUTED accordingly, and
  ``exp_avg`` is exactly re-projected (projected back in the old basis
  before the refresh, forward in the new — :268-306);
* the initial eigenbasis is a full eigh with columns flipped to
  descending eigenvalue order (:337-372).

Non-matrix (ndim<2) parameters run plain Adam in the same loop, including
the first-step skip (reference precondition_1d=False default). Higher-rank
parameters are merged to 2-D. The periodic refresh runs under
``lax.cond`` so the jitted step stays a single program.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class _SoapParamState(NamedTuple):
    exp_avg: jnp.ndarray      # stored in eigenbasis coordinates (2-D path)
    exp_avg_sq: jnp.ndarray   # eigenbasis coordinates (2-D path)
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
    return (math.prod(g.shape[:-1]), g.shape[-1])


def _eigh_desc(M):
    """eigh basis with columns in DESCENDING eigenvalue order
    (reference get_orthogonal_matrix, soap.py:337-372)."""
    M32 = M.astype(jnp.float32) + 1e-30 * jnp.eye(M.shape[0],
                                                  dtype=jnp.float32)
    _, Q = jnp.linalg.eigh(M32)
    return jnp.flip(Q, axis=1)


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
        count = state.count + 1            # calls so far (first call = 1)
        step = count - 1                   # reference state["step"]
        live = (step > 0).astype(jnp.float32)
        lr_t = learning_rate(count) if callable(learning_rate) \
            else learning_rate

        # bias corrections use the post-increment reference step counter
        bc1 = 1.0 - b1 ** jnp.maximum(step, 1)
        bc2 = 1.0 - b2 ** jnp.maximum(step, 1)
        step_size = lr_t * jnp.sqrt(bc2) / bc1

        def upd(g, s, p):
            shape2d = _as2d(g)
            if s.L is None:
                # plain-Adam path, same first-step skip (the reference
                # `continue` happens before the moment update too)
                m = live * (b1 * s.exp_avg + (1 - b1) * g) \
                    + (1 - live) * s.exp_avg
                v = live * (b2 * s.exp_avg_sq + (1 - b2) * g * g) \
                    + (1 - live) * s.exp_avg_sq
                u = step_size * (m / (jnp.sqrt(v) + eps))
                if weight_decay and p is not None:
                    # decoupled wd acts on the POST-update parameter
                    # (soap.py:195-204: p.add_(p, alpha=-lr*wd) AFTER the
                    # gradient step)
                    u = u + lr_t * weight_decay * (p - u)
                return -live * u, _SoapParamState(m, v, None, None,
                                                  None, None)

            g2 = g.reshape(shape2d)

            # ---- parameter update with the CURRENT basis (grad never
            # enters its own projection)
            gp = s.QL.T @ g2 @ s.QR
            m = b1 * s.exp_avg + (1 - b1) * gp
            v = b2 * s.exp_avg_sq + (1 - b2) * gp * gp
            m = live * m + (1 - live) * s.exp_avg
            v = live * v + (1 - live) * s.exp_avg_sq
            u2 = s.QL @ (m / (jnp.sqrt(v) + eps)) @ s.QR.T
            u = step_size * u2.reshape(g.shape)
            if weight_decay and p is not None:
                # decoupled wd on the POST-update parameter (soap.py:204)
                u = u + lr_t * weight_decay * (p - u)
            u = -live * u

            # ---- post-update preconditioner accumulation (soap.py:
            # 268-306): exp_avg back to original space, GG lerp, optional
            # basis refresh, exp_avg into the (new) basis
            m_back = s.QL @ m @ s.QR.T
            L = shampoo_beta * s.L + (1 - shampoo_beta) * (g2 @ g2.T)
            R = shampoo_beta * s.R + (1 - shampoo_beta) * (g2.T @ g2)

            def init_basis(_):
                return _eigh_desc(L).astype(g2.dtype), \
                    _eigh_desc(R).astype(g2.dtype), v

            def qr_refresh(_):
                # power iteration + QR with descending eigenvalue sort;
                # exp_avg_sq permuted along each axis (soap.py:373-430)
                L32 = L.astype(jnp.float32)
                R32 = R.astype(jnp.float32)
                QL32 = s.QL.astype(jnp.float32)
                QR32 = s.QR.astype(jnp.float32)
                estL = jnp.diag(QL32.T @ L32 @ QL32)
                sortL = jnp.argsort(-estL)
                estR = jnp.diag(QR32.T @ R32 @ QR32)
                sortR = jnp.argsort(-estR)
                v_perm = v[sortL][:, sortR]
                QLn, _ = jnp.linalg.qr(L32 @ QL32[:, sortL])
                QRn, _ = jnp.linalg.qr(R32 @ QR32[:, sortR])
                return QLn.astype(g2.dtype), QRn.astype(g2.dtype), v_perm

            def keep(_):
                return s.QL, s.QR, v

            is_first = step == 0
            is_refresh = jnp.logical_and(step > 0,
                                         (step % precondition_frequency)
                                         == 0)
            QLn, QRn, v_new = jax.lax.cond(
                is_first, init_basis,
                lambda _: jax.lax.cond(is_refresh, qr_refresh, keep,
                                       operand=None),
                operand=None)
            m_new = QLn.T @ m_back @ QRn
            return u, _SoapParamState(m_new, v_new, L, R, QLn, QRn)

        params_tree = params if params is not None else grads
        flat_g, treedef = jax.tree_util.tree_flatten(grads)
        flat_s = treedef.flatten_up_to(state.inner)
        flat_p = jax.tree_util.tree_leaves(params_tree)
        outs = [upd(g, s, p) for g, s, p in zip(flat_g, flat_s, flat_p)]
        updates = treedef.unflatten([o[0] for o in outs])
        new_inner = treedef.unflatten([o[1] for o in outs])
        return updates, SoapState(count=count, inner=new_inner)

    return optax.GradientTransformation(init_fn, update_fn)
