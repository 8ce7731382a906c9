"""Encoder-decoder (ED) baseline: bottleneck MLP after Behrens 2022.

Capability parity with baseline_models/ED/training/ClimSIM_ED_1_3_train.py:
56-138: encoder 124 -> d -> d -> d/2 -> d/4 -> d/8 -> d/16 -> latent (all
relu), decoder mirror d/16 -> ... -> d -> d -> 128 with elu output, trained
with mse and a divide-by-5-every-7-epochs LR schedule (the schedule lives in
climsim_tpu.train.schedules).
"""
from __future__ import annotations

import flax.linen as nn

from .common import Policy, F32


class ED(nn.Module):
    out_dim: int = 128
    latent_dim: int = 5
    intermediate_dim: int = 463
    policy: Policy = F32

    @nn.compact
    def __call__(self, x):
        d = self.intermediate_dim
        widths_enc = [d, d, d // 2, d // 4, d // 8, d // 16, self.latent_dim]
        widths_dec = [d // 16, d // 8, d // 4, d // 2, d, d]
        h = self.policy.cast_in(x)
        for i, w in enumerate(widths_enc):
            h = nn.relu(nn.Dense(w, dtype=self.policy.compute_dtype,
                                 param_dtype=self.policy.param_dtype,
                                 name=f"enc_{i}")(h))
        for i, w in enumerate(widths_dec):
            h = nn.relu(nn.Dense(w, dtype=self.policy.compute_dtype,
                                 param_dtype=self.policy.param_dtype,
                                 name=f"dec_{i}")(h))
        y = nn.Dense(self.out_dim, dtype=self.policy.compute_dtype,
                     param_dtype=self.policy.param_dtype, name="out")(h)
        y = nn.elu(y)
        return self.policy.cast_out(y)
