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
    # per-step LR schedule (reference scheduler subtrees: warmup + cosine/
    # step, config_single.yaml): None | 'cosine' | 'onecycle' | 'step' |
    # 'warmup'
    lr_schedule: str | None = None
    schedule_steps: int = 10000
    warmup_steps: int = 200
    lr_gamma: float = 0.95
    decay_every: int = 1000
    # epoch-level ReduceLROnPlateau on the val loss (reference
    # scheduler_name: plateau with factor/patience/eta_min); adam/adamw
    plateau_patience: int | None = None
    plateau_factor: float = 0.5
    min_lr: float = 0.0
    # stop when the val loss has not improved for N epochs (reference
    # early_stop_step)
    early_stop_patience: int | None = None
    log_path: str | None = None      # JSONL metric log
    seed: int = 0
    var_weights: dict = field(default_factory=dict)


def make_optimizer(cfg: FitConfig) -> optax.GradientTransformation:
    def clipped(tx):
        if cfg.max_grad_norm:
            return optax.chain(
                optax.clip_by_global_norm(cfg.max_grad_norm), tx)
        return tx
    lr = cfg.lr
    if cfg.lr_schedule == "cosine":
        warm = min(cfg.warmup_steps, cfg.schedule_steps // 2)
        lr = optax.warmup_cosine_decay_schedule(
            0.0, cfg.lr, warm, cfg.schedule_steps, end_value=cfg.min_lr)
    elif cfg.lr_schedule == "onecycle":
        from .schedules import one_cycle
        lr = one_cycle(cfg.lr, cfg.schedule_steps)
    elif cfg.lr_schedule == "step":
        from .schedules import step_decay
        lr = step_decay(cfg.lr, cfg.decay_every, cfg.lr_gamma)
    elif cfg.lr_schedule == "warmup":
        from .schedules import warmup_constant
        lr = warmup_constant(cfg.lr, cfg.warmup_steps)
    elif cfg.lr_schedule is not None:
        raise ValueError(cfg.lr_schedule)
    if cfg.plateau_patience:
        # inject the LR as mutable optimizer-state so fit() can scale it
        # on val-loss plateaus without resetting the moments
        if cfg.lr_schedule is not None:
            raise ValueError("plateau excludes a per-step lr_schedule")
        base = {"adam": optax.adam, "adamw": partial(
            optax.adamw, weight_decay=cfg.weight_decay)}.get(cfg.optimizer)
        if base is None:
            raise ValueError(f"plateau supports adam/adamw, "
                             f"not {cfg.optimizer}")
        return clipped(optax.inject_hyperparams(base)(learning_rate=lr))
    if cfg.optimizer == "adam":
        return clipped(optax.adam(lr))
    if cfg.optimizer == "adamw":
        return clipped(optax.adamw(lr, weight_decay=cfg.weight_decay))
    if cfg.optimizer == "soap":
        from .soap import soap
        return clipped(soap(lr, weight_decay=cfg.weight_decay))
    if cfg.optimizer == "muon":
        from .muon import muon
        return clipped(muon(lr, weight_decay=cfg.weight_decay))
    raise ValueError(f"unknown optimizer {cfg.optimizer}")


def _scale_injected_lr(opt_state, factor: float, min_lr: float):
    """Scale the learning_rate inside any inject_hyperparams state
    (plateau semantics: optimizer moments preserved). Duck-typed: optax
    versions name the state Inject[Stateful]HyperparamsState."""
    hp = getattr(opt_state, "hyperparams", None)
    if hp is not None and hasattr(opt_state, "_replace") \
            and "learning_rate" in hp:
        hp = dict(hp)
        hp["learning_rate"] = jnp.maximum(hp["learning_rate"] * factor,
                                          min_lr)
        return opt_state._replace(hyperparams=hp)
    if isinstance(opt_state, tuple) and not hasattr(opt_state, "_fields"):
        return tuple(_scale_injected_lr(o, factor, min_lr)
                     for o in opt_state)
    return opt_state


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
    bad_epochs = 0
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
            if rec["val_loss"] < best_val:
                best_val = rec["val_loss"]
                bad_epochs = 0
                if checkpoint_dir:
                    save_checkpoint(checkpoint_dir, state, epoch)
            else:
                bad_epochs += 1
                if cfg.plateau_patience and \
                        bad_epochs >= cfg.plateau_patience:
                    # ReduceLROnPlateau: scale the injected LR, keep moments
                    state = state.replace(opt_state=_scale_injected_lr(
                        state.opt_state, cfg.plateau_factor, cfg.min_lr))
                    rec["lr_reduced"] = True
                    bad_epochs = 0
        history.append(rec)
        stop = (cfg.early_stop_patience and val_batches is not None
                and len(history) - 1 - int(np.argmin(
                    [h.get("val_loss", np.inf) for h in history]))
                >= cfg.early_stop_patience)
        if stop:
            rec["early_stop"] = True
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
        if stop:
            break
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
