"""Autoregressive bidirectional vertical RNN with latent convective memory.

TPU-native re-design of the fork's core emulator (Ukkonen & Chantry 2025,
Fig 10): rnn/models/models.py:137-342 (Base_RNN_autoreg: mp_mode semantics,
temperature-ramp cloud partitioning, postprocessing) and :345-608
(RNN_autoreg: surface-MLP-initialized upward sweep -> TOA-MLP-initialized
downward sweep -> latent memory head; optional stochastic third RNN;
optional separate radiation BiGRU on all 60 levels; top-12-level output
pruning).

Step signature (the binding online contract, SURVEY.md §7.4 item 5):
    (x_main [B, L, nx], x_sfc [B, nx_sfc], mem [B, L, nh_mem])
        -> (out [B, L, ny], out_sfc [B, ny_sfc], new_mem)

Design differences from the reference (deliberate, TPU-first):
* level sweeps are ``nn.scan`` with hoisted input projections (one fused
  MXU matmul per level) instead of cuDNN LSTM + tensor flips;
* normalization coefficients are *not* module buffers — the model takes
  normalized inputs and emits scaled outputs; the mp-constraint
  postprocessing lives in :func:`postprocess_mp` as a pure function;
* stochastic noise arrives through functional RNG (flax 'noise' rng).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .cells import (RNNLayer, FusedBiGRULayer, FusedBiGRUHeadsLayer,
                    QRNNLayer, needs_cell_state)
from .common import Policy, F32

DT = 1200.0
INV_DT = 1.0 / DT


class _ChannelDense(nn.Module):
    """Dense over the CHANNEL axis of [L, C, B] activations, with the
    same param tree as ``nn.Dense`` ({kernel [C, F], bias [F]}) so
    batch-major checkpoints load unchanged in channel-major serving."""

    features: int
    dtype: object = None
    param_dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (x.shape[1], self.features), self.param_dtype)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       self.param_dtype)
        dt = self.dtype or x.dtype
        return (jnp.einsum("lcb,ch->lhb", x.astype(dt), k.astype(dt))
                + b.astype(dt)[None, :, None])


class RNNAutoreg(nn.Module):
    """Bi-directional vertical RNN emulator with latent convective memory."""

    nx: int                      # level-input features (before pressure)
    nx_sfc: int
    ny: int                      # level outputs (5 for mp_mode 1, else 6)
    ny_sfc: int
    nneur: Sequence[int] = (192, 192)
    nh_mem: int = 16
    # the reference's `memory: None` mode (driver :110-112): no latent
    # memory concatenated to the inputs, the output head reads the RNN
    # stream directly, and the model is NOT autoregressive (the mem
    # argument passes through untouched so signatures stay uniform)
    use_memory: bool = True
    cell: str = "gru"            # gru | lstm | ln_lstm | sru
    use_initial_mlp: bool = True
    add_pres: bool = True
    output_prune: bool = True
    separate_radiation: bool = False
    add_stochastic_layer: bool = False
    stochastic_cell: str = "sgru"
    use_pallas: bool = False     # fused BiGRU kernel (gru cell only)
    # gate arithmetic precision inside the fused kernel; False (bf16
    # gates) lowers on hardware but measured 28% slower than f32 gates
    # (docs/kernels.md), so True stays the default
    pallas_acc32: bool = True
    # with use_pallas, additionally fuse the up-sweep input projection
    # and the mlp_latent/mlp_output heads into the kernel (the v3 kernel,
    # ops/pallas_rnn.fused_bigru_heads_lbh): the [L, B, 3H] projection
    # and [L, B, H] down stream never touch HBM. Round 3 shipped this
    # opt-in because the kernels lowered WITHOUT a Mosaic vmem_limit
    # declaration, which forced the program-wide
    # xla_tpu_scoped_vmem_limit_kib raise and its 2x collateral on the
    # surrounding program; with the declaration (round 4) the kernel
    # compiles under a PLAIN jit like v2 and measures 4.99 ms standalone
    # at B=21,600 (v2 full model: ~15 ms in-context).
    # NOTE the flax param tree differs from the unfused path
    # (bigru_fused owns win1/wlat/wout instead of separate Dense
    # modules); use params_fused_to_unfused/params_unfused_to_fused to
    # convert checkpoints across the flag.
    fuse_heads: bool = False
    # ALSO fold the initial MLP + memory concat into the kernel.
    # Batch-major (v4): measured SLOWER than leaving them to XLA
    # (8.05 vs 4.99 ms kernel standalone at B=21,600) — the narrow
    # [L, Bt, 6]/[L, Bt, 16] operand DMAs are 128-lane padded and the
    # extra serial matmul sits on the level-recurrence critical path.
    # CHANNEL-MAJOR (level_major=True, the v6 kernel): the thin
    # [L, nf, B] feature input costs nothing on the lanes, the init/
    # projection evaluations run as chunked non-dependent phases, and
    # the smaller input buffer lets the lane tile grow — fewer serial
    # chains. Default off; the bench auto-selects.
    fuse_init: bool = False
    # v5 channel-major kernel only: hoist the sweep input projections
    # into a chunked non-dependent phase (VMEM scratch in the input
    # dtype — ~1e-3 relative in bf16). Pin False to isolate bf16 drift
    # against the baseline kernel (ADVICE r4).
    pallas_hoist_proj: bool = True
    # CHANNEL-MAJOR activation layout: x_main and mem arrive [L, C, B]
    # and out/new_mem return [L, ny, B] / [L, nh_mem, B] (x_sfc/out_sfc
    # stay [B, .]). On TPU any narrow [., ., c<128] array is 128-lane
    # padded, so batch-major narrow activations cost ~20x their logical
    # bytes at every producer/consumer that cannot fuse them away —
    # measured 16.4 -> 34.8 ms on the 21,600-column coupled step when
    # the v3 kernel's narrow custom-call outputs forced them to
    # materialize. Channel-major puts the batch dim on the 128-lane axis
    # (zero padding, dense per-channel slices) and runs the v5 kernel.
    # Pair with online.HostLoopConfig(emulator_level_major=True).
    # Requires the fused-heads path; the param tree is identical to the
    # batch-major fused model, so the same checkpoint serves both.
    level_major: bool = False
    # explicit kernel batch tile (None = auto VMEM sizing). Smaller tiles
    # let the whole program compile under a MODEST scoped-vmem limit,
    # which matters: a raised (127 MB) limit lets XLA place scan buffers
    # in VMEM and measurably derails the rest of the step (2x on the
    # flagship online program — PERFORMANCE.md round-3)
    pallas_block_b: int | None = None
    # AR(1) noise threading (rnn/utils.py:940-959 noise modes; the wrapper
    # signature's eps_prev, save_wrapper_mem_prevtend_ftorch.py:333-360):
    # eps_new = rho*eps_prev + sqrt(1-rho^2)*N(0,1) drives the stochastic
    # layer with temporally-correlated noise
    ar_noise_rho: float = 0.0
    # vertical structure of the stochastic noise (reference ar_noise_mode,
    # rnn/utils.py:940-959): True = independent per level (mode 1/2),
    # False = one draw shared by all 60 levels (mode 3)
    ar_noise_vertical: bool = True
    # static hybrid coefficients + ps normalization for the pressure feature
    hyam: tuple = ()
    hybm: tuple = ()
    sp_mean: float = 0.0
    sp_div: float = 1.0
    # level-scan unroll factor (see cells.RNNLayer.unroll)
    scan_unroll: int = 1
    policy: Policy = F32

    @nn.compact
    def __call__(self, x_main, x_sfc, mem, deterministic: bool = True,
                 eps_prev=None):
        if self.level_major:
            L, _, B = x_main.shape
        else:
            B, L, _ = x_main.shape
        nh1, nh2 = self.nneur[0], self.nneur[1]
        pol = self.policy

        x_main = pol.cast_in(x_main)
        x_sfc = pol.cast_in(x_sfc)
        mem = pol.cast_in(mem)

        if self.add_pres:
            # normalized sqrt-pressure feature (rnn/layers.py:101-121)
            sp = x_sfc[:, 0] * self.sp_div + self.sp_mean
            hyam = jnp.asarray(self.hyam, x_main.dtype)
            hybm = jnp.asarray(self.hybm, x_main.dtype)
            if self.level_major:
                pres = hyam[:, None] * 1.0e5 + sp[None, :] * hybm[:, None]
                pres = jnp.sqrt(pres) / 314.0
                x_main = jnp.concatenate([x_main, pres[:, None, :]],
                                         axis=1)
            else:
                pres = hyam * 1.0e5 + sp[:, None] * hybm
                pres = jnp.sqrt(pres) / 314.0
                x_main = jnp.concatenate([x_main, pres[..., None]],
                                         axis=-1)

        if self.separate_radiation:
            # CRM sees non-radiation surface vars and only the bottom 50
            # levels (E3SM-MMF's CRM domain, models.py:177-181); gases are
            # handled by the radiation RNN on all 60 levels
            x_sfc_crm = jnp.concatenate([x_sfc[:, 0:6], x_sfc[:, 12:]], axis=1)
            gases = x_main[:, :, 12:15]
            x_crm_in = jnp.concatenate([x_main[:, :, :12], x_main[:, :, 15:]],
                                       axis=-1)[:, L - mem.shape[1]:, :]
        else:
            x_sfc_crm = x_sfc
            x_crm_in = x_main

        fuse_heads = (self.use_pallas and self.cell == "gru"
                      and not self.add_stochastic_layer
                      and nh1 == nh2 and self.fuse_heads
                      and self.use_memory and self.nh_mem != nh2
                      and not self.separate_radiation)
        if self.level_major and not fuse_heads:
            raise ValueError("level_major requires the fused-heads path "
                             "(use_pallas + fuse_heads with gru cell)")
        # v4: with fuse_init the initial MLP and memory concat run inside
        # the kernel — skip materializing h [B, L, H] here. Default off:
        # measured slower than the XLA init MLP (see the field comment).
        fuse_init = fuse_heads and self.use_initial_mlp and self.fuse_init
        h = x_crm_in
        if self.use_initial_mlp and not fuse_init:
            if self.level_major:
                h = jnp.tanh(_ChannelDense(nh1, dtype=pol.compute_dtype,
                                           param_dtype=pol.param_dtype,
                                           name="mlp_initial")(h))
            else:
                h = jnp.tanh(nn.Dense(nh1, dtype=pol.compute_dtype,
                                      param_dtype=pol.param_dtype,
                                      name="mlp_initial")(h))
        if self.use_memory and not fuse_init and not self.level_major:
            # channel-major passes mem to the kernel UNCONCATENATED (the
            # split up projection): the [L, CH+nm, B] concat is ~1.1 GB
            # of HBM per online step and its K=CH+nm matmul lowers 3x
            # slower than the split K=CH + K=nm pair
            h = jnp.concatenate([h, mem], axis=-1)

        # ---- upward sweep (surface -> TOA): reverse scan, surface MLP init
        hx1 = jnp.tanh(nn.Dense(nh1, dtype=pol.compute_dtype,
                                param_dtype=pol.param_dtype,
                                name="mlp_surface1")(x_sfc_crm))
        # ---- downward init (TOA MLP from SOLIN, COSZRS = aux[1], aux[6],
        # models.py:503-507)
        x_toa = jnp.concatenate([x_sfc[:, 1:2], x_sfc[:, 6:7]], axis=1)
        hx2 = nn.Dense(nh2, dtype=pol.compute_dtype,
                       param_dtype=pol.param_dtype, name="mlp_toa1")(x_toa)

        use_fused = (self.use_pallas and self.cell == "gru"
                     and not self.add_stochastic_layer and nh1 == nh2)
        if fuse_heads:
            out, new_mem, last_h = FusedBiGRUHeadsLayer(
                nh1, self.nh_mem, self.ny,
                init_width=nh1 if fuse_init else 0,
                block_b=self.pallas_block_b,
                acc32=self.pallas_acc32,
                hoist_proj=self.pallas_hoist_proj,
                level_major=self.level_major, name="bigru_fused")(
                h, hx1, hx2,
                mem=mem if (fuse_init or (self.level_major
                                          and self.use_memory)) else None)
            down_out = None
        elif use_fused:
            down_out, last_h = FusedBiGRULayer(
                nh1, block_b=self.pallas_block_b,
                acc32=self.pallas_acc32,
                name="bigru_fused")(h, hx1, hx2)
        elif self.cell == "qrnn":
            # QRNN fo-pooling sweeps (no serial recurrent matmul) — the
            # reference's QRNN cells (models_torch_kernels.py:1358-1546)
            # as the emulator trunk. Measured slower than the GRU on the
            # v5e at all batches (the GRU's recurrent matmul streams the
            # MXU; see PERFORMANCE.md), kept for capability parity
            up_out, _ = QRNNLayer(nh1, reverse=True,
                                  dtype=pol.compute_dtype,
                                  param_dtype=pol.param_dtype,
                                  name="rnn_up")(h, hx1)
            down_out, last_h = QRNNLayer(nh2, reverse=False,
                                         dtype=pol.compute_dtype,
                                         param_dtype=pol.param_dtype,
                                         name="rnn_down")(up_out, hx2)
        else:
            if needs_cell_state(self.cell):
                cx1 = nn.Dense(nh1, dtype=pol.compute_dtype,
                               param_dtype=pol.param_dtype,
                               name="mlp_surface2")(x_sfc_crm)
                carry1 = (hx1, cx1)
            else:
                carry1 = hx1
            up_out, _ = RNNLayer(nh1, self.cell, reverse=True,
                                 dtype=pol.compute_dtype,
                                 unroll=self.scan_unroll,
                                 name="rnn_up")(h, carry1)
            if needs_cell_state(self.cell):
                cx2 = nn.Dense(nh2, dtype=pol.compute_dtype,
                               param_dtype=pol.param_dtype,
                               name="mlp_toa2")(x_toa)
                carry2 = (hx2, cx2)
            else:
                carry2 = hx2
            down_out, carry_dn = RNNLayer(nh2, self.cell, reverse=False,
                                          dtype=pol.compute_dtype,
                                          unroll=self.scan_unroll,
                                          name="rnn_down")(up_out, carry2)
            last_h = carry_dn[0] if needs_cell_state(self.cell) \
                else carry_dn

        # ---- optional stochastic third layer (models.py:405-412,521-534)
        eps_out = eps_prev
        if self.add_stochastic_layer:
            nh3 = self.nneur[-1]
            Le = L if self.ar_noise_vertical else 1
            if deterministic:
                eps = jnp.zeros((Le, B, nh3), down_out.dtype)
            else:
                fresh = jax.random.normal(self.make_rng("noise"),
                                          (Le, B, nh3), down_out.dtype)
                if self.ar_noise_rho > 0.0 and eps_prev is not None:
                    rho = self.ar_noise_rho
                    eps = rho * eps_prev.astype(down_out.dtype) \
                        + (1.0 - rho * rho) ** 0.5 * fresh
                else:
                    eps = fresh
                eps_out = eps
            hx3 = jnp.zeros((B, nh3), down_out.dtype)
            carry3 = (hx3, jnp.zeros_like(hx3)) \
                if needs_cell_state(self.stochastic_cell) else hx3
            eps_lev = eps if self.ar_noise_vertical else \
                jnp.broadcast_to(eps, (L, B, nh3))
            down_out, _ = RNNLayer(nh3, self.stochastic_cell, reverse=False,
                                   noise=True, dtype=pol.compute_dtype,
                                   name="rnn_stoch")(
                down_out, carry3, eps_lev)

        # ---- latent convective memory + output heads. As the reference,
        # the intermediate MLP exists only when the memory width differs
        # from the last RNN's width (models.py:249-252: nh_mem ==
        # nneur[-1] -> the RNN output IS the memory). With fuse_heads the
        # kernel already produced out/new_mem.
        if not fuse_heads:
            if not self.use_memory:
                # memory-None mode: head reads the RNN stream, mem untouched
                head_in = down_out
                new_mem = mem
            elif self.nh_mem == down_out.shape[-1]:
                head_in = new_mem = down_out
            else:
                head_in = new_mem = nn.Dense(self.nh_mem,
                                             dtype=pol.compute_dtype,
                                             param_dtype=pol.param_dtype,
                                             name="mlp_latent")(down_out)
            out = nn.Dense(self.ny, dtype=pol.compute_dtype,
                           param_dtype=pol.param_dtype,
                           name="mlp_output")(head_in)
        # with separate radiation the CRM head predicts only PRECSC/PRECC;
        # the radiative scalars come from the radiation RNN (models.py:380)
        ny_sfc_crm = 2 if self.separate_radiation else self.ny_sfc
        out_sfc = nn.Dense(ny_sfc_crm, dtype=pol.compute_dtype,
                           param_dtype=pol.param_dtype,
                           name="mlp_surface_output")(last_h)

        if self.output_prune and not self.separate_radiation:
            # only dT is nonzero in the top 12 levels (models.py:554-559)
            if self.level_major:
                mask = np.ones((L, self.ny, 1), np.float32)
                mask[:12, 1:, :] = 0.0
            else:
                mask = np.ones((1, L, self.ny), np.float32)
                mask[:, :12, 1:] = 0.0
            out = out * jnp.asarray(mask, out.dtype)

        if self.separate_radiation:
            out, out_sfc = self._radiation(x_sfc, gases, new_mem, out,
                                           out_sfc, pol)

        if self.ar_noise_rho > 0.0 and self.add_stochastic_layer:
            return (pol.cast_out(out), pol.cast_out(out_sfc),
                    pol.cast_out(new_mem), eps_out)
        return pol.cast_out(out), pol.cast_out(out_sfc), pol.cast_out(new_mem)

    def _radiation(self, x_sfc, gases, mem, out_crm, out_sfc_crm, pol):
        """Separate-radiation BiGRU on all 60 levels taking gases + CRM
        latent (models.py:362-388,562-604). The CRM part runs on the bottom
        50 levels; radiation adds dT everywhere and predicts the 6 radiative
        surface scalars; PRECSC/PRECC come from the CRM head."""
        B, L50, _ = mem.shape
        L = gases.shape[1]
        nh_rad = 96
        pad = L - L50 if L != L50 else 10
        mem_padded = jnp.pad(mem, ((0, 0), (pad, 0), (0, 0)))
        x_rad = jnp.concatenate([gases, mem_padded], axis=-1)

        x_sfc_rad = x_sfc[:, 6:12]
        hx = nn.Dense(nh_rad, dtype=pol.compute_dtype,
                      param_dtype=pol.param_dtype, name="mlp_surface_rad")(
            x_sfc_rad)
        up, _ = RNNLayer(nh_rad, "gru", reverse=True, name="rnn1_rad")(
            x_rad, hx)
        x_toa = jnp.concatenate([x_sfc[:, 1:2], x_sfc[:, 6:7]], axis=1)
        hx2 = nn.Dense(nh_rad, dtype=pol.compute_dtype,
                       param_dtype=pol.param_dtype, name="mlp_toa_rad")(x_toa)
        down, last_h = RNNLayer(nh_rad, "gru", reverse=False,
                                name="rnn2_rad")(up, hx2)
        d_t_rad = nn.Dense(1, dtype=pol.compute_dtype,
                           param_dtype=pol.param_dtype,
                           name="mlp_output_rad")(down)
        out_sfc_rad = nn.Dense(self.ny_sfc - 2, dtype=pol.compute_dtype,
                               param_dtype=pol.param_dtype,
                               name="mlp_surface_output_rad")(last_h)

        # CRM output lives on the bottom 50 levels; pad with zeros above
        out = jnp.pad(out_crm, ((0, 0), (pad, 0), (0, 0)))
        out = out.at[:, :, 0:1].add(d_t_rad)
        # surface layout [NETSW, FLWDS, PRECSC, PRECC, SOLS, SOLL, SOLSD,
        # SOLLD]: rad predicts all but PRECSC/PRECC (models.py:600-604)
        out_sfc = jnp.concatenate([out_sfc_rad[:, 0:2], out_sfc_crm,
                                   out_sfc_rad[:, 2:]], axis=1)
        return out, out_sfc


# --------------------------------------------------------------------------
# fused <-> unfused checkpoint conversion
# --------------------------------------------------------------------------
#
# fuse_heads changes the flax param tree: the fused kernel layer
# ("bigru_fused") owns the latent/output head weights (wlat/blat,
# wout/bout) — and with fuse_init also the initial MLP (w_init/b_init) —
# instead of the separate mlp_latent/mlp_output/mlp_initial Dense
# modules. These helpers remap checkpoints across the flag so a model
# trained one way can serve the other (ADVICE round-3).


def params_unfused_to_fused(params, fuse_init: bool = False):
    """Remap a ``fuse_heads=False`` RNNAutoreg param tree to the
    ``fuse_heads=True`` layout (optionally ``fuse_init=True``)."""
    wrapped = "params" in params
    inner = dict(params["params"]) if wrapped else dict(params)
    fused = dict(inner["bigru_fused"])
    lat = inner.pop("mlp_latent")
    out = inner.pop("mlp_output")
    fused["wlat"], fused["blat"] = lat["kernel"], lat["bias"]
    fused["wout"], fused["bout"] = out["kernel"], out["bias"]
    if fuse_init:
        ini = inner.pop("mlp_initial")
        fused["w_init"], fused["b_init"] = ini["kernel"], ini["bias"]
    inner["bigru_fused"] = fused
    return {"params": inner} if wrapped else inner


def params_fused_to_unfused(params):
    """Inverse of :func:`params_unfused_to_fused` (handles both the v3
    and v4 fused layouts)."""
    wrapped = "params" in params
    inner = dict(params["params"]) if wrapped else dict(params)
    fused = dict(inner["bigru_fused"])
    inner["mlp_latent"] = {"kernel": fused.pop("wlat"),
                           "bias": fused.pop("blat")}
    inner["mlp_output"] = {"kernel": fused.pop("wout"),
                           "bias": fused.pop("bout")}
    if "w_init" in fused:
        inner["mlp_initial"] = {"kernel": fused.pop("w_init"),
                                "bias": fused.pop("b_init")}
    inner["bigru_fused"] = fused
    return {"params": inner} if wrapped else inner


# --------------------------------------------------------------------------
# microphysics postprocessing (Base_RNN_autoreg.postprocessing, :273-339)
# --------------------------------------------------------------------------

def temperature_scaling(T_raw):
    """Liquid fraction ramp (T-253.16)*0.05 clamped to [0,1]
    (models.py:260-266)."""
    return jnp.clip((T_raw - 253.16) * 0.05, 0.0, 1.0)


def temperature_scaling_precip(t_sfc):
    """Snow fraction (283.3-T)/14.6 clamped to [0,1] (models.py:268-271)."""
    return jnp.clip((283.3 - t_sfc) / 14.6, 0.0, 1.0)


def postprocess_mp(out, out_sfc, x_denorm, yscale_lev, yscale_sca,
                   mp_mode: int = 0, qv_index: int = -1):
    """Un-scale outputs and re-split qn into (dqliq, dqice).

    out/out_sfc: scaled model outputs [B, L, ny], [B, ny_sfc].
    x_denorm:    raw (un-normalized) level inputs with T at channel 0,
                 qliq at 2, qice at 3 (v4 ordering).
    mp_mode semantics (models.py:200-227):
      0: passthrough un-scaling (6 raw tendency outputs)
      1: 5 outputs [dT, dqv, dqn, du, dv]; liq fraction diagnosed from T_new
     -1: 6 outputs [dT, dqv, dqn, liq_frac, du, dv]; predicted fraction
         clamped to +-0.2 of the T-diagnosed value (Hu et al. Fig 2b).
         (The reference contains a leftover line discarding the clamp,
         models.py:318-320; we implement the documented clamped behavior.)
     -2: [dT, dqtot, cld_water_frac, liq_frac, ...]: total-water split.
    Returns raw-unit (out_denorm [B, L, 6], out_sfc_denorm).
    """
    out_denorm = out / yscale_lev
    out_sfc_denorm = out_sfc / yscale_sca
    if mp_mode == 0:
        return out_denorm, out_sfc_denorm

    T_old = x_denorm[:, :, 0:1]
    qliq_old = x_denorm[:, :, 2:3]
    qice_old = x_denorm[:, :, 3:4]
    qn_old = qliq_old + qice_old

    if mp_mode == -2:
        dqtot = out_denorm[:, :, 1:2]
        cwf = jnp.clip(jnp.square(jnp.square(out_denorm[:, :, 2:3])), 0.0, 1.0)
        qv_old = x_denorm[:, :, qv_index:qv_index + 1] if qv_index >= 0 \
            else x_denorm[:, :, -1:]
        qtot_old = qn_old + qv_old
        qtot_new = qtot_old + dqtot * DT
        qv_new = (1.0 - cwf) * qtot_new
        qn_new_tot = cwf * qtot_new
        dqv = (qv_new - qv_old) * INV_DT
        dqn = (qn_new_tot - qn_old) * INV_DT
        out_denorm = out_denorm.at[:, :, 1:2].set(dqv)
        out_denorm = out_denorm.at[:, :, 2:3].set(dqn)

    T_new = T_old + out_denorm[:, :, 0:1] * DT
    liq_frac = temperature_scaling(T_new)

    if mp_mode in (-1, -2):
        liq_frac_pred = out_denorm[:, :, 3:4]
        max_frac = jnp.minimum(liq_frac + 0.2, 1.0)
        min_frac = jnp.maximum(liq_frac - 0.2, 0.0)
        liq_frac = jnp.clip(liq_frac_pred, min_frac, max_frac)

    qn_new = qn_old + out_denorm[:, :, 2:3] * DT
    qliq_new = liq_frac * qn_new
    qice_new = (1.0 - liq_frac) * qn_new
    dqliq = (qliq_new - qliq_old) * INV_DT
    dqice = (qice_new - qice_old) * INV_DT

    if mp_mode in (-1, -2):
        rest = out_denorm[:, :, 4:]
    else:
        rest = out_denorm[:, :, 3:]
    out_denorm = jnp.concatenate(
        [out_denorm[:, :, 0:2], dqliq, dqice, rest], axis=2)
    return out_denorm, out_sfc_denorm
