"""ResNet-style 1-D CNN baseline over the vertical column.

Capability parity with the reference CNN
(baseline_models/CNN/training/hpo_train.py:124-246): 12 residual blocks of
two same-padded Conv1D(406, k=3) + relu + dropout, 1x1-conv residual
projection, elu 1x1 conv to 10 channels, then per-level linear head for the
2 tendency channels and ReLU head for the 8 scalar channels.

The v1 flat <-> (60, channels) image contract follows
data_utils.reshape_{input,target}_for_cnn / reshape_target_from_cnn
(climsim_utils/data_utils.py:2104-2172): scalars broadcast to all levels on
input and are level-averaged on output.

TPU notes: Conv1D over 60 levels with 406 channels maps to the MXU as
batched matmuls; dropout is interleaved via flax deterministic flags.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .. import constants as C
from .common import Policy, F32

NLEV = C.NLEV


def reshape_input_for_cnn(x: jnp.ndarray) -> jnp.ndarray:
    """v1 flat [B,124] -> [B, 60, 6]: (T, q, 4 broadcast scalars)."""
    lev = jnp.stack([x[:, 0:60], x[:, 60:120]], axis=-1)
    sca = jnp.repeat(x[:, None, 120:124], NLEV, axis=1)
    return jnp.concatenate([lev, sca], axis=-1)


def reshape_target_from_cnn(y_img: jnp.ndarray) -> jnp.ndarray:
    """[B, 60, 10] -> v1 flat [B,128]: level channels flattened, scalar
    channels level-averaged."""
    lev = jnp.concatenate([y_img[:, :, 0], y_img[:, :, 1]], axis=1)
    sca = jnp.mean(y_img[:, :, 2:], axis=1)
    return jnp.concatenate([lev, sca], axis=1)


class ResBlock1D(nn.Module):
    channels: int
    kernel: int = 3
    dropout: float = 0.175
    policy: Policy = F32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.Conv(self.channels, (self.kernel,), padding="SAME",
                    dtype=self.policy.compute_dtype,
                    param_dtype=self.policy.param_dtype)(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Conv(self.channels, (self.kernel,), padding="SAME",
                    dtype=self.policy.compute_dtype,
                    param_dtype=self.policy.param_dtype)(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        res = nn.Conv(self.channels, (1,), padding="SAME",
                      dtype=self.policy.compute_dtype,
                      param_dtype=self.policy.param_dtype)(x)
        return h + res


class CNN(nn.Module):
    """1-D residual CNN emulator; input [B, nlev, in_ch], output flat v1."""

    depth: int = 12
    channels: int = 406
    kernel: int = 3
    dropout: float = 0.175
    out_channels: int = 10
    n_lin: int = 2          # per-level tendency channels (linear)
    policy: Policy = F32
    flat_io: bool = True    # accept/return v1 flat vectors

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.flat_io:
            x = reshape_input_for_cnn(x)
        h = self.policy.cast_in(x)
        for i in range(self.depth):
            h = ResBlock1D(self.channels, self.kernel, self.dropout,
                           self.policy, name=f"block_{i}")(h, deterministic)
        h = nn.Conv(self.out_channels, (1,), padding="SAME",
                    dtype=self.policy.compute_dtype,
                    param_dtype=self.policy.param_dtype, name="pre_out")(h)
        h = nn.elu(h)
        lin = nn.Dense(self.n_lin, dtype=self.policy.compute_dtype,
                       param_dtype=self.policy.param_dtype, name="head_lin")(h)
        pos = nn.relu(nn.Dense(self.out_channels - self.n_lin,
                               dtype=self.policy.compute_dtype,
                               param_dtype=self.policy.param_dtype,
                               name="head_relu")(h))
        y = jnp.concatenate([lin, pos], axis=-1)
        y = self.policy.cast_out(y)
        if self.flat_io:
            y = reshape_target_from_cnn(y)
        return y
