"""1-D EDM-style U-Net emulator over the vertical column.

Capability parity with the ClimSim-Online U-Net
(online_testing/baseline_models/Unet_v4/training/climsim_unet.py:35-411 and
its EDM layer library layers.py): profile variables as channels over the
60-level column zero-padded to seq_resolution=64, scalars broadcast over
levels, a learnable 385x8 column-location embedding, encoder/decoder of
residual blocks (GroupNorm-SiLU-Conv) with single-head attention at the
configured resolutions, identity-initialized (optionally trainable) 1x1
skip convolutions, skip_scale=1/sqrt(2), zero-init output convolution,
ReLU'd scalar head averaged over levels, and stratosphere output pruning.

TPU notes: channels-last [B, L, C] layout so convs lower to MXU matmuls;
attention over 64 levels is a tiny einsum — XLA fuses it; all resampling is
factor-2 mean-pool / nearest-neighbor (resample_filter=[1,1]).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .common import Policy, F32

SKIP_SCALE = 0.5 ** 0.5


def _down(x):
    """Factor-2 mean pooling over the level axis ([B, L, C] -> [B, L/2, C])."""
    return 0.5 * (x[:, 0::2, :] + x[:, 1::2, :])


def _up(x):
    """Nearest-neighbor upsample over the level axis."""
    return jnp.repeat(x, 2, axis=1)


class AttnBlock(nn.Module):
    """EDM self-attention: weights softmax(q^T (k/sqrt(c_head))) computed in
    f32 (layers.py AttentionOp:291-327, UNetBlock:486-500). The ClimSim U-Net
    pins num_heads=1 in block_kwargs (climsim_unet.py:125), so single-head is
    the default here; c_head is then the full channel count."""

    channels: int
    policy: Policy = F32
    num_heads: int = 1

    @nn.compact
    def __call__(self, x):
        B, L, C = x.shape
        nh = self.num_heads
        ch = C // nh
        h = nn.GroupNorm(num_groups=min(32, C // 4), epsilon=1e-6)(x)
        qkv = nn.Conv(C * 3, (1,),
                      dtype=self.policy.compute_dtype,
                      param_dtype=self.policy.param_dtype, name="qkv")(h)
        # reference layout: qkv reshaped to [B*heads, C/heads, 3, L]
        # from channel-major [B, 3C, L]; channel-last here, so split
        # heads from the channel axis of each of q/k/v
        q, k, v = jnp.split(qkv, 3, axis=-1)
        split = lambda a: a.reshape(B, L, nh, ch)
        q, k, v = split(q), split(k), split(v)
        w = jnp.einsum("blhc,bmhc->bhlm", q.astype(jnp.float32),
                       k.astype(jnp.float32) / np.sqrt(ch))
        w = jax.nn.softmax(w, axis=-1).astype(x.dtype)
        a = jnp.einsum("bhlm,bmhc->blhc", w, v).reshape(B, L, C)
        a = nn.Conv(C, (1,), kernel_init=nn.initializers.zeros,
                    dtype=self.policy.compute_dtype,
                    param_dtype=self.policy.param_dtype, name="proj")(a)
        return (x + a) * SKIP_SCALE


class UNetBlock(nn.Module):
    """EDM residual block: GN-SiLU-Conv3 x2 with optional resampling and
    attention (layers.py UNetBlock_{noatten,atten} equivalents)."""

    out_channels: int
    up: bool = False
    down: bool = False
    attention: bool = False
    dropout: float = 0.10
    policy: Policy = F32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cin = x.shape[-1]
        h = nn.GroupNorm(num_groups=min(32, cin // 4), epsilon=1e-6)(x)
        h = nn.silu(h)
        if self.up:
            h, x = _up(h), _up(x)
        elif self.down:
            h, x = _down(h), _down(x)
        h = nn.Conv(self.out_channels, (3,), padding="SAME",
                    dtype=self.policy.compute_dtype,
                    param_dtype=self.policy.param_dtype, name="conv0")(h)
        # no activation after norm1: the reference removed the
        # emb-conditioned silu along with adaptive_scale
        # (layers.py UNetBlock_*.forward :474-481, silu commented out)
        h = nn.GroupNorm(num_groups=min(32, self.out_channels // 4),
                         epsilon=1e-6)(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Conv(self.out_channels, (3,), padding="SAME",
                    kernel_init=nn.initializers.zeros,
                    dtype=self.policy.compute_dtype,
                    param_dtype=self.policy.param_dtype, name="conv1")(h)
        # resample_proj=True in the reference's block_kwargs
        # (climsim_unet.py:130): the skip path is a learned 1x1 conv whenever
        # the block resamples, even at unchanged width (layers.py :440-451)
        if cin != self.out_channels or self.up or self.down:
            x = nn.Conv(self.out_channels, (1,),
                        dtype=self.policy.compute_dtype,
                        param_dtype=self.policy.param_dtype, name="skip")(x)
        h = (h + x) * SKIP_SCALE
        if self.attention:
            h = AttnBlock(self.out_channels, self.policy)(h)
        return h


class IdentityConv(nn.Module):
    """1x1 conv initialized to identity; frozen unless trainable
    (climsim_unet.py:209-219 skip_conv)."""

    channels: int
    trainable: bool = False

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            lambda k, s: jnp.eye(self.channels, dtype=jnp.float32)[None],
            (1, self.channels, self.channels))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        if not self.trainable:
            kernel = jax.lax.stop_gradient(kernel)
            bias = jax.lax.stop_gradient(bias)
        kernel = kernel.astype(x.dtype)
        bias = bias.astype(x.dtype)
        return jax.lax.conv_general_dilated(
            x, kernel, (1,), "SAME",
            dimension_numbers=("NLC", "LIO", "NLC")) + bias


class ClimsimUNet(nn.Module):
    """Flat-vector in/out U-Net following the reference's forward contract:
    x = [profiles(nvp*60), scalars(nvs), loc_index(1)] -> y =
    [profiles_out(nvpo*60), scalars_out(nvso)]."""

    num_vars_profile: int
    num_vars_scalar: int
    num_vars_profile_out: int
    num_vars_scalar_out: int
    seq_resolution: int = 64
    model_channels: int = 128
    channel_mult: Sequence[int] = (1, 2, 2, 2)
    num_blocks: int = 4
    attn_resolutions: Sequence[int] = (16,)
    dropout: float = 0.10
    n_model_levels: int = 60
    output_prune: bool = False
    strato_lev: int = 12
    loc_embedding: bool = False
    skip_conv: bool = False
    prev_2d: bool = False
    policy: Policy = F32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        nvp, nvs = self.num_vars_profile, self.num_vars_scalar
        L = self.n_model_levels
        pad = self.seq_resolution - L

        if not self.prev_2d:
            # previous-step 2D surface inputs zeroed by default
            # (climsim_unet.py:284-286, x[:, -8:-3] = 0 unless prev_2d)
            x = x.at[:, -8:-3].set(0.0)

        x_profile = x[:, :nvp * L].reshape(-1, nvp, L)
        x_scalar = x[:, nvp * L:-1]
        x_loc = x[:, -1]

        # 385-entry learnable location embedding; index 0 = "no embedding"
        emb_loc = self.param("emb_loc", nn.initializers.normal(1.0), (385, 8),
                             jnp.float32)
        idx = jnp.where(jnp.asarray(self.loc_embedding),
                        x_loc.astype(jnp.int32), 0)
        loc = emb_loc[jnp.clip(idx, 0, 384)]                    # [B, 8]

        h = jnp.concatenate([
            jnp.moveaxis(x_profile, 1, 2),                      # [B, L, nvp]
            jnp.repeat(x_scalar[:, None, :], L, axis=1),        # [B, L, nvs]
            jnp.repeat(loc[:, None, :], L, axis=1),             # [B, L, 8]
        ], axis=-1)
        h = jnp.pad(h, ((0, 0), (pad, 0), (0, 0)))
        h = self.policy.cast_in(h)

        # ---- encoder
        skips = []
        cout = self.model_channels
        h = nn.Conv(cout, (3,), padding="SAME",
                    dtype=self.policy.compute_dtype,
                    param_dtype=self.policy.param_dtype, name="enc_in")(h)
        skips.append(h)
        for level, mult in enumerate(self.channel_mult):
            res = self.seq_resolution >> level
            if level > 0:
                h = UNetBlock(h.shape[-1], down=True, dropout=self.dropout,
                              policy=self.policy,
                              name=f"enc_{res}_down")(h, deterministic)
                skips.append(h)
            for b in range(self.num_blocks):
                cout = self.model_channels * mult
                attn = res in self.attn_resolutions
                h = UNetBlock(cout, attention=attn, dropout=self.dropout,
                              policy=self.policy,
                              name=f"enc_{res}_block{b}")(h, deterministic)
                skips.append(h)

        skips = [IdentityConv(s.shape[-1], self.skip_conv,
                              name=f"skipconv_{i}")(s)
                 for i, s in enumerate(skips)]

        # ---- decoder
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            res = self.seq_resolution >> level
            if level == len(self.channel_mult) - 1:
                h = UNetBlock(h.shape[-1], attention=True,
                              dropout=self.dropout, policy=self.policy,
                              name=f"dec_{res}_in0")(h, deterministic)
                h = UNetBlock(h.shape[-1], dropout=self.dropout,
                              policy=self.policy,
                              name=f"dec_{res}_in1")(h, deterministic)
            else:
                h = UNetBlock(h.shape[-1], up=True, dropout=self.dropout,
                              policy=self.policy,
                              name=f"dec_{res}_up")(h, deterministic)
            for b in range(self.num_blocks + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                attn = b == self.num_blocks and res in self.attn_resolutions
                h = UNetBlock(self.model_channels * mult, attention=attn,
                              dropout=self.dropout, policy=self.policy,
                              name=f"dec_{res}_block{b}")(h, deterministic)

        out_ch = self.num_vars_profile_out + self.num_vars_scalar_out
        h = nn.GroupNorm(num_groups=min(32, h.shape[-1] // 4),
                         epsilon=1e-6)(h)
        h = nn.Conv(out_ch, (3,), padding="SAME",
                    kernel_init=nn.initializers.zeros,
                    dtype=self.policy.compute_dtype,
                    param_dtype=self.policy.param_dtype, name="out_conv")(
            nn.silu(h))
        h = self.policy.cast_out(h)

        h = h[:, pad:, :]                                      # strip padding
        y_profile = jnp.moveaxis(h[..., :self.num_vars_profile_out], 2, 1)
        y_scalar = nn.relu(h[..., self.num_vars_profile_out:]).mean(axis=1)
        y = jnp.concatenate(
            [y_profile.reshape(-1, self.num_vars_profile_out * L), y_scalar],
            axis=1)

        if self.output_prune:
            mask = np.ones(y.shape[-1], np.float32)
            for v in range(1, self.num_vars_profile_out):  # all but ptend_t
                mask[v * L: v * L + self.strato_lev] = 0.0
            y = y * jnp.asarray(mask, y.dtype)
        return y


def unet_v4(**kw) -> ClimsimUNet:
    """v4 configuration: 25 profile + 24 scalar inputs (+loc idx), v4 outputs
    (6 profile + 8 scalar)."""
    args = dict(num_vars_profile=25, num_vars_scalar=24,
                num_vars_profile_out=6, num_vars_scalar_out=8,
                output_prune=True)
    args.update(kw)
    return ClimsimUNet(**args)


def unet_v5(**kw) -> ClimsimUNet:
    """v5 configuration: 22 profile + 24 scalar inputs (+loc idx), v5 outputs
    (5 profile + 8 scalar)."""
    args = dict(num_vars_profile=22, num_vars_scalar=24,
                num_vars_profile_out=5, num_vars_scalar_out=8,
                output_prune=True)
    args.update(kw)
    return ClimsimUNet(**args)


class ClimsimUNetClassifier(nn.Module):
    """Cloud-state classifier U-Net (Unet_v5 classifier variant,
    online_testing/.../train_unet_h5loader_classifier.py:306-390 +
    climsim_unet_classifier.py): per-level 3-class logits for the cloud
    tendency regime, trained with cross-entropy. Class labels follow
    climsim_datapip_classifier_h5.py:121-122:
      0: |dq| <= threshold_class2 (no change)
      1: next-step q <= threshold_class1 (cloud clears)
      2: otherwise (cloud persists/changes)
    """

    num_vars_profile: int
    num_vars_scalar: int
    num_profile_out: int = 1     # cloud variables classified
    num_classes: int = 3
    seq_resolution: int = 64
    model_channels: int = 64
    channel_mult: Sequence[int] = (1, 2, 2)
    num_blocks: int = 2
    attn_resolutions: Sequence[int] = (16,)
    dropout: float = 0.0
    n_model_levels: int = 60
    loc_embedding: bool = False
    policy: Policy = F32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        backbone = ClimsimUNet(
            num_vars_profile=self.num_vars_profile,
            num_vars_scalar=self.num_vars_scalar,
            num_vars_profile_out=self.num_profile_out * self.num_classes,
            num_vars_scalar_out=1,       # dummy scalar head, ignored
            seq_resolution=self.seq_resolution,
            model_channels=self.model_channels,
            channel_mult=self.channel_mult, num_blocks=self.num_blocks,
            attn_resolutions=self.attn_resolutions, dropout=self.dropout,
            n_model_levels=self.n_model_levels, output_prune=False,
            loc_embedding=self.loc_embedding, policy=self.policy,
            name="backbone")
        y = backbone(x, deterministic)
        L = self.n_model_levels
        logits = y[:, :self.num_profile_out * self.num_classes * L]
        return logits.reshape(-1, self.num_profile_out, self.num_classes, L)


def cloud_class_labels(q_next, dq, threshold_class1: float = 1e-9,
                       threshold_class2: float = 1e-11):
    """3-class cloud labels (climsim_datapip_classifier_h5.py:121-122)."""
    mask = jnp.where(q_next <= threshold_class1, 1, 2)
    return jnp.where(jnp.abs(dq) <= threshold_class2, 0, mask)


def classifier_loss(logits, labels):
    """Cross-entropy over the class axis; logits [B, nvar, ncls, L],
    labels [B, nvar, L] int."""
    logp = jax.nn.log_softmax(logits, axis=2)
    onehot = jax.nn.one_hot(labels, logits.shape[2], axis=2,
                            dtype=logits.dtype)
    return -jnp.mean(jnp.sum(onehot * logp, axis=2))
