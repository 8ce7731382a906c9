"""Online inference wrapper: the raw-units emulator step for host coupling.

Replaces the reference's TorchScript + FTorch export path
(rnn/save_wrapper_mem_prevtend_ftorch.py:185-427): instead of serializing a
scripted module for a Fortran host, the wrapper here is a pure jittable
function that the JAX host loop (climsim_tpu.online) calls directly in the
same compiled step — no serialization boundary.

Contract (SURVEY.md §7.4 item 5, online_testing/README.md §3.1): forward
takes UN-normalized state and returns UN-normalized tendencies,
    (x_main [B, 60, nx_raw], x_sfc [B, nx_sfc], mem[, eps])
        -> (out_lev [B, 60, 6], out_sfc [B, 8], mem[, eps])
with preprocessing inlined: SNOWHICE>=1e10 -> -1 fix, exponential cloud
transform (v4) or qn+liq_frac conversion (v5), mean/div normalization, RH
clipping, NaN/Inf scrubbing (:199-249); postprocessing is the mp-constraint
split + NaN scrub (:285-329,382-387).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..models.rnn import postprocess_mp, temperature_scaling
from ..physics import transforms


@dataclass(frozen=True)
class WrapperConfig:
    v5_input: bool = False
    mp_mode: int = 1
    snowhice_fix: bool = True
    snowhice_index: int = 15      # SNOWHICE position in x_sfc (v4 sfc order)
    qinput_prune: bool = False
    qinput_prune_lev: int = 15
    rh_prune: bool = True
    # normalized-input clipping of the online trainers
    # (climsim_datapip.py:11-160): dyn forcings to +-clip_dyn, previous
    # physics tendencies to +-clip_phy; channel ranges in the level layout
    clip_dyn: float | None = None
    dyn_slice: tuple = (6, 12)
    clip_phy: float | None = None
    phy_slice: tuple = (12, 20)
    mp_constraint: bool = True


class OnlineWrapper:
    """Bundles model params + normalization into the raw-units step fn."""

    def __init__(self, model, params, norm, lbd_qc, lbd_qi, lbd_qn,
                 cfg: WrapperConfig = WrapperConfig()):
        """norm: LevelNormalizer with mean/div matching the model's input
        layout; lbd_*: per-level exponential-transform coefficients."""
        self.model = model
        self.params = params
        self.norm = norm
        self.lbd_qc = jnp.asarray(lbd_qc)
        self.lbd_qi = jnp.asarray(lbd_qi)
        self.lbd_qn = jnp.asarray(lbd_qn)
        self.cfg = cfg

    def preprocess(self, x_main_raw, x_sfc_raw):
        cfg = self.cfg
        x_main, x_sfc = x_main_raw, x_sfc_raw
        if cfg.snowhice_fix:
            x_sfc = jnp.where(x_sfc >= 1e10, -1.0, x_sfc)
        if cfg.v5_input:
            qn = x_main[:, :, 2] + x_main[:, :, 3]
            if cfg.qinput_prune:
                qn = qn.at[:, :cfg.qinput_prune_lev].set(0.0)
            qn = transforms.cloud_exp_transform(qn, self.lbd_qn)
            x_main = x_main.at[:, :, 2].set(qn)
            x_main = x_main.at[:, :, 3].set(
                temperature_scaling(x_main_raw[:, :, 0]))
        else:
            x_main = x_main.at[:, :, 2].set(
                transforms.cloud_exp_transform(x_main[:, :, 2], self.lbd_qc))
            x_main = x_main.at[:, :, 3].set(
                transforms.cloud_exp_transform(x_main[:, :, 3], self.lbd_qi))
        x_main = (x_main - self.norm.mean_lev) / self.norm.div_lev
        x_sfc = (x_sfc - self.norm.mean_sfc) / self.norm.div_sfc
        if (not cfg.v5_input) and cfg.qinput_prune:
            x_main = x_main.at[:, :cfg.qinput_prune_lev, 2].set(0.0)
        if cfg.rh_prune:
            x_main = x_main.at[:, :, 1].set(
                jnp.clip(x_main[:, :, 1], 0.0, 1.2))
        if cfg.clip_dyn is not None:
            a, b = cfg.dyn_slice
            x_main = x_main.at[:, :, a:b].set(
                jnp.clip(x_main[:, :, a:b], -cfg.clip_dyn, cfg.clip_dyn))
        if cfg.clip_phy is not None:
            a, b = cfg.phy_slice
            x_main = x_main.at[:, :, a:b].set(
                jnp.clip(x_main[:, :, a:b], -cfg.clip_phy, cfg.clip_phy))
        x_main = jnp.where(jnp.isfinite(x_main), x_main, 0.0)
        return x_main, x_sfc

    def __call__(self, x_main_raw, x_sfc_raw, mem, eps_prev=None,
                 noise_key=None):
        """Raw-units step; jit-compatible (wrap in jax.jit or call from a
        jitted host loop).

        Stochastic models use the extended signature
        ``(x, xs, mem, eps_prev, noise_key) -> (out, out_sfc, mem, eps)``
        — the wrapper's forward_eps variant threading AR(1) noise across
        coupled steps (rnn/utils.py:230-294;
        save_wrapper_mem_prevtend_ftorch.py:333-360).
        """
        x_main, x_sfc = self.preprocess(x_main_raw, x_sfc_raw)
        eps_out = None
        if eps_prev is not None:
            outs = self.model.apply(self.params, x_main, x_sfc, mem,
                                    deterministic=False,
                                    eps_prev=eps_prev,
                                    rngs={"noise": noise_key})
            out, out_sfc, mem, eps_out = outs
        else:
            outs = self.model.apply(self.params, x_main, x_sfc, mem)
            # AR-noise models return a 4-tuple even deterministically
            out, out_sfc, mem = outs[:3]
        if self.cfg.mp_constraint:
            yl = self.norm.scale_lev[None]
            ys = self.norm.scale_sfc
            out, out_sfc = postprocess_mp(out, out_sfc, x_main_raw, yl, ys,
                                          mp_mode=self.cfg.mp_mode)
        else:
            out = out / self.norm.scale_lev
            out_sfc = out_sfc / self.norm.scale_sfc
        out = jnp.where(jnp.isfinite(out), out, 0.0)
        out_sfc = jnp.where(jnp.isfinite(out_sfc), out_sfc, 0.0)
        if eps_out is not None:
            return out, out_sfc, mem, eps_out
        return out, out_sfc, mem

    def jitted(self):
        return jax.jit(self.__call__)


def flat_output(out_lev, out_sfc):
    """Flatten (out_lev [B, 60, 6], out_sfc [B, 8]) into the binding
    368-feature layout [ptend_t, ptend_q0001, ptend_q0002, ptend_q0003,
    ptend_u, ptend_v (60 each), NETSW, FLWDS, PRECSC, PRECC, SOLS, SOLL,
    SOLSD, SOLLD] (online_testing/README.md §3.1)."""
    B = out_lev.shape[0]
    lev = jnp.moveaxis(out_lev, 1, 2).reshape(B, -1)
    return jnp.concatenate([lev, out_sfc], axis=1)
