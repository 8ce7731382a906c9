"""Learning-rate schedules matching the reference trainers.

* cyclical triangular LR with per-cycle amplitude halving — the NeurIPS MLP
  baseline (hpo_baseline_v1.py:107-115) and the CNN trainer
  (hpo_train.py:203-212 CyclicalLearningRate with scale 1/2**(x-1)).
* step decay /5 every 7 epochs — ED (ClimSIM_ED_1_3_train.py:97-124).
* OneCycle and StepLR — the RNN rollout driver
  (train_rnn_rollout_torchscript_hydra.py:709-731).
* linear warmup — U-Net trainers (torch_warmup_lr.py:1-90).

All are optax-style schedules (step -> lr), composable with any optimizer.
"""
from __future__ import annotations

import jax.numpy as jnp
import optax


def cyclical(init_lr: float, max_lr: float, step_size: int,
             halve_per_cycle: bool = True):
    """Triangular cyclical LR; amplitude scaled by 1/2**(cycle-1)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        cycle = jnp.floor(1 + step / (2 * step_size))
        x = jnp.abs(step / step_size - 2 * cycle + 1)
        amp = (max_lr - init_lr) * jnp.maximum(0.0, 1 - x)
        if halve_per_cycle:
            amp = amp / (2.0 ** (cycle - 1))
        return init_lr + amp

    return schedule


def step_decay(init_lr: float, every_steps: int, factor: float = 0.2):
    """lr * factor**floor(step/every): the ED /5-every-7-epochs schedule
    (factor 0.2) or the RNN StepLR."""

    def schedule(step):
        k = jnp.floor(jnp.asarray(step, jnp.float32) / every_steps)
        return init_lr * factor ** k

    return schedule


def one_cycle(max_lr: float, total_steps: int, pct_start: float = 0.3,
              div_factor: float = 25.0, final_div_factor: float = 1e4,
              annealing: str = "cos"):
    """OneCycleLR equivalent with the reference's knobs
    (train_rnn_rollout_torchscript_hydra.py:709-723): initial lr =
    max_lr/div_factor, final lr = initial/final_div_factor, warmup fraction
    pct_start, anneal strategy 'cos' or 'linear'."""
    if annealing == "cos":
        return optax.cosine_onecycle_schedule(
            transition_steps=total_steps, peak_value=max_lr,
            pct_start=pct_start, div_factor=div_factor,
            final_div_factor=final_div_factor)
    if annealing != "linear":
        raise ValueError(f"annealing '{annealing}' not in ('cos','linear')")
    init = max_lr / div_factor
    final = init / final_div_factor
    up = max(1, int(round(pct_start * total_steps)))
    return optax.join_schedules(
        [optax.linear_schedule(init, max_lr, up),
         optax.linear_schedule(max_lr, final, max(1, total_steps - up))],
        [up])


def warmup_constant(lr: float, warmup_steps: int):
    """Linear warmup to a constant lr (U-Net warmup_lr)."""
    return optax.join_schedules(
        [optax.linear_schedule(0.0, lr, warmup_steps),
         optax.constant_schedule(lr)], [warmup_steps])
