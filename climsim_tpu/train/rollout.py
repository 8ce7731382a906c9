"""Autoregressive rollout training engine for the memory-RNN emulator.

TPU-native re-design of the reference epoch engine
(rnn/utils.py:816-1796 ``train_or_eval_one_epoch``) and its driver loop
(train_rnn_rollout_torchscript_hydra.py):

* time-contiguous chunks are split into rollout windows of W coupled steps;
  each window is ONE jitted update: a ``lax.scan`` over the W steps carrying
  the latent memory, with BPTT through the scan (the reference's
  accumulate-then-backward, :1199-1376);
* the memory is detached between windows simply by passing it out of the
  jitted step as data (:1579);
* replay modes 'full'/'mixed' substitute the model's previous predictions
  into the previous-physics input channels — 'mixed' for a random column
  subset whose fraction ramps with ``gradual_mixing_end_epoch``
  (:1078-1095, 1582-1590);
* the hybrid loss = weighted huber/mse + energy-conservation +
  water-conservation + precip-accumulation terms with the reference's
  weights (w_hcon/w_wcon/..., rnn/conf/autoreg_LSTM.yaml);
* the curriculum ``rollout_schedule`` maps epoch -> W; each distinct W
  compiles once (bucketed jit).
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..physics import conservation
from ..constants import DT_STEP
from . import losses as L


@dataclass
class RolloutConfig:
    # rollout curriculum: epoch thresholds -> window length, reference
    # `timestep_schedule` (driver :703-707). E.g. {0:1, 2:2, 4:3, 8:5}
    rollout_schedule: dict = field(default_factory=lambda: {0: 1, 2: 2, 4: 3})
    loss: str = "huber"
    lr: float = 1e-3
    optimizer: str = "adam"
    weight_decay: float = 0.0
    # loss term weights (autoreg_LSTM.yaml loss switches)
    w_main: float = 1.0
    w_energy: float = 0.0
    w_water: float = 0.0
    w_precip: float = 0.0
    # GEL (gamma-exponentiated) loss on window-accumulated precipitation
    # (rnn/metrics.py:1035-1066; losses.gel_loss is the per-output form)
    w_gel_precip: float = 0.0
    gel_lambda: float = 1.0
    # absolute batch-mean bias penalty over the window outputs
    # (reference use_bias_loss/w_bias; rnn/utils.py:1322-1334)
    w_bias: float = 0.0
    # RH-consistency (supersaturation) penalty on the updated state
    # (rnn/metrics.py:318-476; use_rh_loss/w_rh, utils.py:1342-1343);
    # requires raw level state in the window (x_lev_raw)
    w_rh: float = 0.0
    rh_max: float = 1.05
    # positivity penalties on the tendency-updated water state
    # (utils.py:1284-1307,1347-1352): qv_new = qv + dt*dqv and
    # qn_new = (qc+qi) + dt*dqn must stay >= 0; require x_lev_raw
    w_qvpos: float = 0.0
    w_qnpos: float = 0.0
    # mp_mode for assembling dqn in the qn positivity term
    # (utils.py:1286-1296): modes 1/-1 read output channel 2, mode 0
    # sums channels 2+3 (separate qliq/qice tendencies)
    mp_mode: int = 1
    # cloud-water-path MSE between predicted and true tendencies
    # (utils.py:1256-1259,1345-1346)
    w_cld: float = 0.0
    # negative-precipitation penalty for flux-predicting models that
    # return aux['prec_negative'] (models_phys.py:1785; utils.py:1354-1356)
    w_precip_neg: float = 0.0
    # deterministic-skill penalty for ensemble training:
    # w_det * (ensemble-mean RMSE over concatenated lev+sfc features)^2
    # (use_det_loss/w_det, utils.py:1358-1359; metrics.py:510-533)
    w_det: float = 0.0
    # static loss-weight factors (driver :308-315): heating tendencies in
    # the top strat_weight_levels levels x strat_temp_weight_factor; all
    # surface scalars x scalar_weight_factor
    strat_temp_weight_factor: float = 1.0
    scalar_weight_factor: float = 1.0
    strat_weight_levels: int = 10
    # LR schedule (reference OneCycleLR / StepLR, driver :709-731):
    # None | 'onecycle' | 'step' | 'warmup'
    lr_schedule: str | None = None
    schedule_steps: int = 10000       # total steps (onecycle)
    lr_gamma: float = 0.95            # step-decay factor
    decay_every: int = 1000           # step-decay interval (steps)
    warmup_steps: int = 200
    # OneCycle fine knobs (driver :709-723): peak lr (None -> lr is the
    # peak), floor lr (None -> peak/div/1e4), warmup fraction, anneal shape
    scheduler_max_lr: float | None = None
    scheduler_min_lr: float | None = None
    scheduler_pct_start: float = 0.3
    scheduler_annealing: str = "cos"
    # replay: None | 'full' | 'mixed'
    replay: str | None = None
    replay_slice: tuple = (15, 20)   # input channels holding prev tendencies
    pred_slice: tuple = (0, 5)       # output channels substituted in
    gradual_mixing_end_epoch: int = 10
    # semi-online training (rnn/utils.py:994-1060): reconstruct the
    # prognostic input state from the model's own previous predictions plus
    # the dynamics increment diagnosed from the true time series:
    #   X_pred[k] = X_pred[k-1] + dt*y_pred[k-1] + dX_dyn[k],
    #   dX_dyn[k] = (X_true[k] - X_true[k-1]) - dt*y_true[k-1]
    # Requires raw-state window entries 'x_lev_raw' [W,B,L,6] and raw true
    # tendencies 'y_lev_raw' [W,B,L,6], plus a state normalizer.
    semi_online: bool = False
    # pass the raw (denormalized) level state to the model each step — the
    # physics-constrained emulator consumes it (models/phys_rnn.py);
    # requires window entry 'x_lev_raw'
    pass_x_raw: bool = False
    # teacher-force the radiation state update during TRAINING: pass the
    # true normalized tendencies to the model as y_true (the reference's
    # update_states_for_rad + out_new_true, models_phys.py:1552-1556,
    # 1722-1741); eval always uses the model's own outputs. Requires a
    # custom apply_fn accepting a 6th y_true argument.
    pass_y_true: bool = False
    n_prog: int = 6                  # prognostic channels (T,qv,qc,qi,u,v)
    # stochastic/ensemble training: replicate each batch ensemble_size
    # times (the reference's repeat_interleave, rnn/utils.py:1064-1072),
    # drive the model with distinct noise RNGs per member, and train with a
    # CRPS-family loss over members ('crps' | 'crps_af' | 'energy')
    ensemble_size: int = 1
    ens_loss: str = "crps"
    # reference crps_sumvar: sum CRPS over features before the batch mean
    # (metrics.py:854-905); False = plain mean over all elements
    ens_sumvar: bool = False
    # skill-term weight in the CRPS family (reference beta,
    # rnn/metrics.py:610 — 'should be 1'; >1 trades spread for skill)
    ens_beta: float = 1.0
    # start the probabilistic loss only after this epoch; before it the
    # ensemble trains deterministically on the member mean (reference
    # crps_start_epoch, autoreg_LSTM.yaml)
    crps_start_epoch: int = 0
    # when the curriculum lengthens the window, scale the LR by the
    # window ratio and reset the optimizer state (reference
    # timestepped_optimizer, train_..._detref.py:599-615)
    timestepped_optimizer: bool = False
    # gradient checkpointing over the rollout window (SURVEY.md §5: the
    # window maps to lax.scan over time WITH rematerialisation): BPTT
    # stores only the per-step carries and recomputes each step's
    # internals in the backward pass — activation memory scales O(1)
    # instead of O(W) in the window length, trading ~1 extra forward
    remat: bool = False
    seed: int = 0

    def window_for_epoch(self, epoch: int) -> int:
        w = 1
        for e, t in sorted(self.rollout_schedule.items()):
            if epoch >= e:
                w = t
        return w

    def mix_fraction(self, epoch: int) -> float:
        if self.replay != "mixed":
            return 1.0 if self.replay == "full" else 0.0
        return min(1.0, (epoch + 1) / max(1, self.gradual_mixing_end_epoch))


def make_optimizer(cfg: RolloutConfig):
    lr = cfg.lr
    if cfg.lr_schedule == "onecycle":
        from .schedules import one_cycle
        # reference wiring (driver :711-716): initial lr = cfg.lr, peak =
        # scheduler_max_lr, final = scheduler_min_lr
        peak = cfg.scheduler_max_lr or cfg.lr
        div = (peak / cfg.lr) if cfg.scheduler_max_lr else 25.0
        fdiv = (cfg.lr / cfg.scheduler_min_lr) if cfg.scheduler_min_lr \
            else 1e4
        lr = one_cycle(peak, cfg.schedule_steps,
                       pct_start=cfg.scheduler_pct_start, div_factor=div,
                       final_div_factor=fdiv,
                       annealing=cfg.scheduler_annealing)
    elif cfg.lr_schedule == "step":
        from .schedules import step_decay
        lr = step_decay(cfg.lr, cfg.decay_every, cfg.lr_gamma)
    elif cfg.lr_schedule == "warmup":
        from .schedules import warmup_constant
        lr = warmup_constant(cfg.lr, cfg.warmup_steps)
    elif cfg.lr_schedule is not None:
        raise ValueError(cfg.lr_schedule)
    if cfg.optimizer == "adam":
        return optax.adam(lr)
    if cfg.optimizer == "adamw":
        return optax.adamw(lr, weight_decay=cfg.weight_decay)
    if cfg.optimizer in ("adamwschedulefree", "schedulefree"):
        # the reference's schedulefree.AdamWScheduleFree option (driver
        # :679-681) — the true Defazio et al. schedule-free algorithm.
        # NOTE: for evaluation/checkpointing at the averaged iterate use
        # optax.contrib.schedule_free_eval_params(state, params).
        import optax.contrib as oc
        return oc.schedule_free_adamw(
            lr if not callable(lr) else cfg.lr,
            weight_decay=cfg.weight_decay)
    if cfg.optimizer == "soap":
        from .soap import soap
        return soap(lr, weight_decay=cfg.weight_decay)
    if cfg.optimizer == "muon":
        from .muon import muon
        return muon(lr, weight_decay=cfg.weight_decay)
    raise ValueError(cfg.optimizer)


def _vmem_jit_kwargs(model) -> dict:
    """jit kwargs shared by every step that may embed the fused pallas
    BiGRU: inside a large XLA program the custom call gets the default
    ~16 MB scoped VMEM (the standalone kernel limit does not propagate),
    which can OOM the 256-512-row auto tiles. Raise it whenever the model
    runs the pallas path on a real TPU."""
    from ..ops import on_tpu
    if on_tpu() and getattr(model, "use_pallas", False):
        return {"compiler_options": {"xla_tpu_scoped_vmem_limit_kib": 130048}}
    return {}


class RolloutTrainer:
    """Drives window-scan updates of an RNNAutoreg-style model.

    model apply contract: apply(params, x_lev, x_sfc, mem) ->
    (out [B,L,ny], out_sfc [B,ny_sfc], new_mem).
    Data windows are dicts of arrays with leading window axis W:
      x_lev [W,B,L,nx], x_sfc [W,B,ns], y_lev [W,B,L,ny], y_sfc [W,B,nys],
      sp [W,B] raw surface pressure.
    """

    def __init__(self, model, cfg: RolloutConfig, hyai, hybi,
                 yscale_lev=None, yscale_sca=None,
                 xmean_prog=None, xdiv_prog=None, lbd_qc=None, lbd_qi=None,
                 apply_fn=None, mem_shape=None):
        self.model = model
        # apply_fn(params, x_lev, x_sfc, mem, x_raw) -> (out, out_sfc, mem);
        # default ignores x_raw (standard RNNAutoreg); the physics model
        # passes it through (e.g. lambda p,xl,xs,m,xr:
        # model.apply(p, xl, xs, m, xr)[:3])
        self._apply = apply_fn or (
            lambda p, xl, xs, m, xr: self.model.apply(p, xl, xs, m))
        # pass_x_raw may be on only for the raw-state loss terms
        # (rh/positivity); the model itself consumes x_raw only when a
        # custom apply_fn threads it through
        self._model_takes_raw = apply_fn is not None
        # mem_shape(B, nlev) -> per-sample memory shape; default follows the
        # standard RNNAutoreg layout
        self._mem_shape = mem_shape or (
            lambda B, nlev: (B, 50 if getattr(self.model,
                                              "separate_radiation", False)
                             else nlev,
                             getattr(self.model, "nh_mem", 16)))
        self.cfg = cfg
        self.hyai = jnp.asarray(hyai)
        self.hybi = jnp.asarray(hybi)
        # canonicalize to broadcast against out [B, L, ny]: accept [ny],
        # [L, ny], or already-leading-1 shapes
        if yscale_lev is not None:
            yscale_lev = jnp.asarray(yscale_lev)
            yscale_lev = yscale_lev.reshape(
                (1,) * (3 - yscale_lev.ndim) + yscale_lev.shape) \
                if yscale_lev.ndim < 3 else yscale_lev.reshape(
                    yscale_lev.shape[-3:])
            assert yscale_lev.ndim == 3 and yscale_lev.shape[0] == 1, \
                f"yscale_lev shape {yscale_lev.shape}"
        self.yscale_lev = yscale_lev   # [1, L or 1, ny] or None
        if yscale_sca is not None:
            yscale_sca = jnp.asarray(yscale_sca).reshape(-1)
        self.yscale_sca = yscale_sca
        # semi-online state normalization: [L or 1, n_prog] mean/div for the
        # prognostic input channels + exp-transform lambdas for qc/qi
        self.xmean_prog = None if xmean_prog is None else jnp.asarray(xmean_prog)
        self.xdiv_prog = None if xdiv_prog is None else jnp.asarray(xdiv_prog)
        self.lbd_qc = None if lbd_qc is None else jnp.asarray(lbd_qc)
        self.lbd_qi = None if lbd_qi is None else jnp.asarray(lbd_qi)
        self.tx = make_optimizer(cfg)
        self._step_cache: dict = {}
        self._eval_cache: dict = {}
        self._fused_cache: dict = {}
        # static per-epoch knobs (values key the jit caches, so at most a
        # couple of compilations each): probabilistic-loss weight for
        # crps_start_epoch, last window length for timestepped_optimizer
        self._ens_w: float = 1.0
        self._last_W: int | None = None

    def _set_epoch_state(self, epoch: int):
        self._ens_w = 0.0 if epoch < self.cfg.crps_start_epoch else 1.0

    def maybe_rescale_optimizer(self, W: int, params, opt_state):
        """timestepped_optimizer semantics (train_..._detref.py:599-615):
        when the curriculum changes the window length, scale the LR by the
        window ratio and rebuild the optimizer (fresh state)."""
        if (self.cfg.timestepped_optimizer and self._last_W is not None
                and W != self._last_W):
            self.cfg.lr = self.cfg.lr * (W / self._last_W)
            self.tx = make_optimizer(self.cfg)
            opt_state = self.tx.init(params)
            self._step_cache.clear()
            self._fused_cache.clear()
        self._last_W = W
        return opt_state

    def init(self, key, sample_window):
        x_lev, x_sfc = sample_window["x_lev"][0], sample_window["x_sfc"][0]
        B, Llev = x_lev.shape[0], x_lev.shape[1]
        mem_lev = getattr(self.model, "nh_mem", 16)
        nlev_mem = 50 if getattr(self.model, "separate_radiation", False) \
            else Llev
        mem = jnp.zeros((B, nlev_mem, mem_lev), x_lev.dtype)
        if self.cfg.pass_x_raw and self._model_takes_raw:
            params = self.model.init(key, x_lev, x_sfc, mem,
                                     sample_window["x_lev_raw"][0])
            if self.cfg.ensemble_size > 1:
                mem = jnp.broadcast_to(
                    mem[None],
                    (self.cfg.ensemble_size,) + mem.shape).copy()
            return params, self.tx.init(params), mem
        if getattr(self.model, "add_stochastic_layer", False):
            params = self.model.init({"params": key,
                                      "noise": jax.random.fold_in(key, 1)},
                                     x_lev, x_sfc, mem, deterministic=False)
        else:
            params = self.model.init(key, x_lev, x_sfc, mem)
        if self.cfg.ensemble_size > 1:
            mem = jnp.broadcast_to(
                mem[None], (self.cfg.ensemble_size,) + mem.shape).copy()
        return params, self.tx.init(params), mem

    # ------------------------------------------------------------------

    def _window_loss(self, params, window, mem, mix_mask,
                     train: bool = True):
        """Scan over W coupled steps; returns (total loss, aux)."""
        cfg = self.cfg
        r0, r1 = cfg.replay_slice
        p0, p1 = cfg.pred_slice

        np_ = cfg.n_prog

        # static per-feature loss weights (driver :308-315); None when both
        # factors are 1 so the unweighted fast path is untouched
        w_lev_arr = w_sfc_arr = None
        if cfg.strat_temp_weight_factor != 1.0 \
                or cfg.scalar_weight_factor != 1.0:
            Lw, nyw = window["y_lev"].shape[2], window["y_lev"].shape[3]
            wl = np.ones((Lw, nyw), np.float32)
            wl[:cfg.strat_weight_levels, 0] *= cfg.strat_temp_weight_factor
            w_lev_arr = jnp.asarray(wl)
            w_sfc_arr = jnp.full((window["y_sfc"].shape[-1],),
                                 cfg.scalar_weight_factor, jnp.float32)

        def main_loss(out, y_lev, out_sfc, y_sfc):
            if w_lev_arr is None:
                return L.LOSS_FNS[cfg.loss](out, y_lev) \
                    + L.LOSS_FNS[cfg.loss](out_sfc, y_sfc)
            return L.weighted_loss(out, y_lev, w_lev_arr, kind=cfg.loss) \
                + L.weighted_loss(out_sfc, y_sfc, w_sfc_arr, kind=cfg.loss)

        def normalize_prog(x_raw):
            """Raw prognostic state -> normalized input channels, with the
            exp cloud transform on qc/qi (rnn/utils.py:1038-1050)."""
            x = jnp.maximum(x_raw, 0.0)
            if self.lbd_qc is not None:
                x = x.at[..., 2].set(
                    1.0 - jnp.exp(-x[..., 2] * self.lbd_qc))
                x = x.at[..., 3].set(
                    1.0 - jnp.exp(-x[..., 3] * self.lbd_qi))
            if self.xmean_prog is not None:
                x = (x - self.xmean_prog) / self.xdiv_prog
            return x

        # AR(1) noise threading across the window (rnn/utils.py:940-959):
        # stochastic models with ar_noise_rho carry eps through the scan
        ar_noise = (cfg.ensemble_size > 1
                    and getattr(self.model, "ar_noise_rho", 0.0) > 0.0
                    and getattr(self.model, "add_stochastic_layer", False))

        def step(carry, inp):
            (mem, prev_out, have_prev, x_pred, x_true_prev, y_true_prev,
             eps_c) = carry
            step_idx = inp[-1]
            inp = inp[:-1]
            if cfg.semi_online:
                x_lev, x_sfc, y_lev, y_sfc, sp, x_raw, y_raw = inp
            elif cfg.pass_x_raw:
                x_lev, x_sfc, y_lev, y_sfc, sp, x_raw = inp
                y_raw = None
            else:
                x_lev, x_sfc, y_lev, y_sfc, sp = inp
                x_raw = y_raw = None

            if cfg.semi_online:
                # dynamics increment from the true series, applied to the
                # model-advanced state (rnn/utils.py:1014-1056):
                #   dX_dyn = (X_true[k]-X_true[k-1]) - dt*y_true[k-1]
                dx_dyn = (x_raw[..., :np_] - x_true_prev) \
                    - DT_STEP * y_true_prev
                ysl = self.yscale_lev[..., :np_] \
                    if self.yscale_lev is not None else 1.0
                y_pred_raw = prev_out[..., :np_] / ysl
                x_adv = x_pred + DT_STEP * y_pred_raw + dx_dyn
                use = have_prev * (mix_mask[:, None, None]
                                   if cfg.replay == "mixed" else 1.0)
                x_pred = use * x_adv + (1.0 - use) * x_raw[..., :np_]
                x_lev = jnp.concatenate(
                    [normalize_prog(x_pred), x_lev[..., np_:]], axis=-1)
            elif cfg.replay in ("full", "mixed"):
                sub = prev_out[..., p0:p1]
                use = have_prev * (mix_mask[:, None, None]
                                   if cfg.replay == "mixed" else 1.0)
                repl = use * sub + (1.0 - use) * x_lev[..., r0:r1]
                x_lev = jnp.concatenate(
                    [x_lev[..., :r0], repl, x_lev[..., r1:]], axis=-1)

            if cfg.ensemble_size > 1:
                # members as a vmapped axis with distinct noise streams;
                # memory is per-member [M, B, ...]
                keys = jax.random.split(
                    jax.random.fold_in(jax.random.PRNGKey(cfg.seed),
                                       step_idx[0]), cfg.ensemble_size)

                if ar_noise:
                    def member(m, k, e):
                        return self.model.apply(
                            params, x_lev, x_sfc, m, deterministic=False,
                            eps_prev=e, rngs={"noise": k})

                    out_e, out_sfc_e, mem, eps_c = jax.vmap(member)(
                        mem, keys, eps_c)
                else:
                    def member(m, k):
                        return self.model.apply(
                            params, x_lev, x_sfc, m, deterministic=False,
                            rngs={"noise": k})

                    out_e, out_sfc_e, mem = jax.vmap(member)(mem, keys)
                from . import probabilistic as P
                bb = cfg.ens_beta
                flat = lambda a: a.reshape(a.shape[0],
                                           a.shape[1], -1) if a.ndim > 3 \
                    else a
                ens_fn = {"crps": lambda e, o: P.crps_kernel(e, o, beta=bb),
                          "crps_af": lambda e, o: P.crps_almost_fair(
                              e, o, beta=bb),
                          "crps_sorted": lambda e, o: P.crps_sample_sorted(
                              e, o, beta=bb),
                          "energy": lambda e, o: P.energy_score(
                              e.reshape(e.shape[0], -1, e.shape[-1]),
                              o.reshape(-1, o.shape[-1])),
                          # variogram / Dawid-Sebastiani over the flattened
                          # per-sample feature vector (driver :662-667
                          # loss_fn_type variogram_score / ds_score)
                          "variogram": lambda e, o: P.variogram_score(
                              flat(e), o.reshape(o.shape[0], -1)),
                          "ds": lambda e, o: P.dawid_sebastiani(e, o),
                          }[cfg.ens_loss]
                if cfg.ens_sumvar:
                    # reference crps_sumvar: CRPS summed over features
                    # before the batch mean (metrics.py:902-905) — a
                    # features-count rescale of the per-element mean
                    base_fn = ens_fn
                    ens_fn = lambda e, o: base_fn(e, o) \
                        * (o.size // o.shape[0])
                out = jnp.mean(out_e, axis=0)
                out_sfc = jnp.mean(out_sfc_e, axis=0)
                if self._ens_w < 1.0:
                    # pre-crps_start_epoch: deterministic loss on the
                    # ensemble mean (reference crps_start_epoch)
                    main = main_loss(out, y_lev, out_sfc, y_sfc)
                else:
                    main = ens_fn(out_e, y_lev) + ens_fn(out_sfc_e, y_sfc)
                aux = None
            else:
                if cfg.pass_y_true and train:
                    res = self._apply(params, x_lev, x_sfc, mem, x_raw,
                                      y_lev)
                else:
                    res = self._apply(params, x_lev, x_sfc, mem, x_raw)
                out, out_sfc, mem = res[:3]
                aux = res[3] if len(res) > 3 else None
                main = main_loss(out, y_lev, out_sfc, y_sfc)

            extra = 0.0
            if cfg.ensemble_size > 1 and cfg.w_det > 0:
                # deterministic-skill term: MSE of the ensemble mean over
                # concatenated lev+sfc features (= det_skill^2,
                # metrics.py:510-533)
                se = jnp.sum(jnp.square(out - y_lev)) \
                    + jnp.sum(jnp.square(out_sfc - y_sfc))
                cnt = y_lev.size + y_sfc.size
                extra += cfg.w_det * se / cnt
            if aux is not None and cfg.w_precip_neg > 0 \
                    and "prec_negative" in aux:
                extra += cfg.w_precip_neg * jnp.mean(
                    jnp.square(aux["prec_negative"]))
            if (cfg.w_energy > 0 or cfg.w_water > 0 or cfg.w_cld > 0
                    or cfg.w_qvpos > 0 or cfg.w_qnpos > 0 or cfg.w_rh > 0):
                od = out / self.yscale_lev if self.yscale_lev is not None \
                    else out
                osd = out_sfc / self.yscale_sca \
                    if self.yscale_sca is not None else out_sfc
                td = y_lev / self.yscale_lev if self.yscale_lev is not None \
                    else y_lev
                tsd = y_sfc / self.yscale_sca \
                    if self.yscale_sca is not None else y_sfc
                if cfg.w_energy > 0:
                    extra += cfg.w_energy * conservation.energy_conservation_mse(
                        td, tsd, od, osd, sp, self.hyai, self.hybi)
                if cfg.w_water > 0:
                    extra += cfg.w_water * conservation.water_conservation_mse(
                        od, osd, sp, self.hyai, self.hybi)
                if cfg.w_cld > 0:
                    # cloud-water-path error (utils.py:1256-1259)
                    cwp_p = conservation.cloud_water_path(
                        od, sp, self.hyai, self.hybi)
                    cwp_t = conservation.cloud_water_path(
                        td, sp, self.hyai, self.hybi)
                    extra += cfg.w_cld * jnp.mean(jnp.square(cwp_p - cwp_t))
                if x_raw is not None and (cfg.w_qvpos > 0 or cfg.w_qnpos > 0
                                          or cfg.w_rh > 0):
                    # raw prognostic channels [T, qv, qc, qi, u, v]
                    if cfg.w_qvpos > 0:
                        qv_new = x_raw[..., 1] + DT_STEP * od[..., 1]
                        extra += cfg.w_qvpos * jnp.mean(
                            jnp.square(jax.nn.relu(-qv_new)))
                    if cfg.w_qnpos > 0:
                        dqn = od[..., 2] if cfg.mp_mode in (1, -1) \
                            else od[..., 2] + od[..., 3]
                        qn_new = x_raw[..., 2] + x_raw[..., 3] \
                            + DT_STEP * dqn
                        extra += cfg.w_qnpos * jnp.mean(
                            jnp.square(jax.nn.relu(-qn_new)))
                    if cfg.w_rh > 0:
                        p_int = 1e5 * self.hyai[None] \
                            + self.hybi[None] * sp[:, None]
                        pmid = 0.5 * (p_int[:, 1:] + p_int[:, :-1])
                        extra += cfg.w_rh * L.rh_consistency_loss(
                            od[..., 1], od[..., 0], x_raw[..., 1],
                            x_raw[..., 0], pmid, rh_max=cfg.rh_max)

            if cfg.semi_online:
                x_true_prev = x_raw[..., :np_]
                y_true_prev = y_raw[..., :np_]
                # keep the carry dtype stable (scale division may promote)
                x_pred = x_pred.astype(x_true_prev.dtype)
            new_carry = (mem, out, jnp.ones(()), x_pred, x_true_prev,
                         y_true_prev, eps_c)
            lev_out = out if cfg.w_bias > 0 else jnp.zeros((0,), out.dtype)
            return new_carry, (cfg.w_main * main + extra, out_sfc, lev_out)

        W = window["x_lev"].shape[0]
        B_, Llev = window["x_lev"].shape[1], window["x_lev"].shape[2]
        dtp = window["x_lev"].dtype
        prev0 = jnp.zeros_like(window["y_lev"][0])
        zprog = jnp.zeros((B_, Llev, np_), dtp)
        if ar_noise:
            Le = Llev if getattr(self.model, "ar_noise_vertical", True) \
                else 1
            nh3 = self.model.nneur[-1]
            eps0 = jnp.zeros((cfg.ensemble_size, Le, B_, nh3), dtp)
        else:
            eps0 = jnp.zeros((), dtp)
        carry0 = (mem, prev0, jnp.zeros(()), zprog, zprog, zprog, eps0)
        steps_idx = jnp.arange(W, dtype=jnp.int32)[:, None]
        if cfg.semi_online:
            xs = (window["x_lev"], window["x_sfc"], window["y_lev"],
                  window["y_sfc"], window["sp"], window["x_lev_raw"],
                  window["y_lev_raw"], steps_idx)
        elif cfg.pass_x_raw:
            xs = (window["x_lev"], window["x_sfc"], window["y_lev"],
                  window["y_sfc"], window["sp"], window["x_lev_raw"],
                  steps_idx)
        else:
            xs = (window["x_lev"], window["x_sfc"], window["y_lev"],
                  window["y_sfc"], window["sp"], steps_idx)
        if cfg.remat:
            # prevent_cse=False is safe (and faster) under lax.scan
            step = jax.checkpoint(step, prevent_cse=False)
        carry_out, (losses, out_sfcs, out_levs) = jax.lax.scan(step, carry0,
                                                               xs)
        mem = carry_out[0]

        loss = jnp.mean(losses)
        if cfg.w_bias > 0:
            from .losses import absolute_bias_loss
            loss = loss + cfg.w_bias * absolute_bias_loss(
                out_levs.reshape((-1,) + out_levs.shape[2:]),
                window["y_lev"].reshape((-1,) + window["y_lev"].shape[2:]),
                out_sfcs.reshape(W * B_, -1),
                window["y_sfc"].reshape(W * B_, -1))
        if cfg.w_gel_precip > 0:
            from .losses import gel_precip_loss
            loss = loss + cfg.w_gel_precip * gel_precip_loss(
                window["y_sfc"].reshape(W * B_, -1),
                out_sfcs.reshape(W * B_, -1), W, lam=cfg.gel_lambda)
        if cfg.w_precip > 0:
            # accumulated-precipitation MSE over the window
            # (rnn/metrics.py:184-190)
            prec_pred = out_sfcs[..., 3].sum(0)
            prec_true = window["y_sfc"][..., 3].sum(0)
            loss = loss + cfg.w_precip * jnp.mean(
                jnp.square(prec_pred - prec_true)) / (W * W)
        return loss, mem

    def _get_step(self, W: int):
        key = (W, self._ens_w)
        if key in self._step_cache:
            return self._step_cache[key]

        @partial(jax.jit, donate_argnums=(0, 1), static_argnums=(),
                 **_vmem_jit_kwargs(self.model))
        def step(params, opt_state, mem, window, mix_mask):
            def loss_fn(p):
                return self._window_loss(p, window, mem, mix_mask)
            (loss, new_mem), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            # memory detaches here: it exits the jit as data (:1579)
            return params, opt_state, jax.lax.stop_gradient(new_mem), loss

        self._step_cache[key] = step
        return step

    def _get_eval(self, W: int):
        key = (W, self._ens_w)
        if key in self._eval_cache:
            return self._eval_cache[key]

        @partial(jax.jit, **_vmem_jit_kwargs(self.model))
        def step(params, mem, window, mix_mask):
            loss, new_mem = self._window_loss(params, window, mem, mix_mask,
                                              train=False)
            return new_mem, loss

        self._eval_cache[key] = step
        return step

    # ------------------------------------------------------------------

    def run_epoch(self, params, opt_state, mem, chunks, epoch: int,
                  train: bool = True, key=None):
        """chunks: iterable of window dicts with time-major arrays
        [T, B, ...]; consecutive windows inside a chunk share memory."""
        cfg = self.cfg
        W = cfg.window_for_epoch(epoch)
        frac = cfg.mix_fraction(epoch)
        key = key if key is not None else jax.random.PRNGKey(cfg.seed + epoch)
        self._set_epoch_state(epoch)
        if train:
            opt_state = self.maybe_rescale_optimizer(W, params, opt_state)
        tstep = self._get_step(W) if train else None
        estep = self._get_eval(W) if not train else None

        tot, n = 0.0, 0
        t0 = time.time()
        for chunk in chunks:
            T = chunk["x_lev"].shape[0]
            B = chunk["x_lev"].shape[1]
            want_lead = self.cfg.ensemble_size if \
                self.cfg.ensemble_size > 1 else B
            if mem is None or mem.shape[0] != want_lead or \
                    (self.cfg.ensemble_size > 1 and mem.shape[1] != B):
                shape = self._mem_shape(B, chunk["x_lev"].shape[2])
                if self.cfg.ensemble_size > 1:
                    shape = (self.cfg.ensemble_size,) + shape
                mem = jnp.zeros(shape, jnp.float32)
            for s in range(0, T - W + 1, W):
                window = {k: jnp.asarray(v[s:s + W]) for k, v in
                          chunk.items()}
                key, km = jax.random.split(key)
                mix_mask = (jax.random.uniform(km, (B,)) < frac).astype(
                    jnp.float32)
                if train:
                    params, opt_state, mem, loss = tstep(
                        params, opt_state, mem, window, mix_mask)
                else:
                    mem, loss = estep(params, mem, window, mix_mask)
                tot += float(loss)
                n += 1
        rec = {"epoch": epoch, "window": W, "mix_frac": frac,
               "loss": tot / max(n, 1), "updates": n,
               "seconds": time.time() - t0}
        return params, opt_state, mem, rec


# ---------------------------------------------------------------- checkpoint

def save_rollout_checkpoint(path: str, params, opt_state, mem, epoch: int,
                            val_loss: float | None = None,
                            keep_top_k: int = 3):
    """Best-K checkpoint retention for rollout training (the Modulus
    top-K .mdlus scheme, train_mlp_h5loader.py:482-506, and the RNN
    driver's best-val torch.save, driver :986-1007). The autoregressive
    memory is saved with the state so resumed simulations continue
    seamlessly."""
    import json
    import os
    import shutil
    import orbax.checkpoint as ocp

    os.makedirs(path, exist_ok=True)
    name = f"ep{epoch}"
    c = ocp.StandardCheckpointer()
    c.save(os.path.abspath(os.path.join(path, name)),
           {"params": params, "opt_state": opt_state, "mem": mem},
           force=True)
    c.wait_until_finished()

    index_path = os.path.join(path, "index.json")
    index = []
    if os.path.exists(index_path):
        with open(index_path) as f:
            index = json.load(f)
    index = [e for e in index if e["name"] != name]
    index.append({"name": name, "epoch": epoch,
                  "val_loss": val_loss if val_loss is not None else 1e30})
    index.sort(key=lambda e: e["val_loss"])
    for stale in index[keep_top_k:]:
        shutil.rmtree(os.path.join(path, stale["name"]),
                      ignore_errors=True)
    index = index[:keep_top_k]
    with open(index_path, "w") as f:
        json.dump(index, f)
    return name


def restore_rollout_checkpoint(path: str, params, opt_state, mem,
                               name: str | None = None):
    """Restore the best (or named) checkpoint; returns
    (params, opt_state, mem, epoch)."""
    import json
    import os
    import orbax.checkpoint as ocp

    with open(os.path.join(path, "index.json")) as f:
        index = json.load(f)
    entry = index[0] if name is None else \
        next(e for e in index if e["name"] == name)
    c = ocp.StandardCheckpointer()
    ref = {"params": params, "opt_state": opt_state, "mem": mem}
    restored = c.restore(os.path.abspath(os.path.join(path, entry["name"])),
                         ref)
    return (restored["params"], restored["opt_state"], restored["mem"],
            entry["epoch"])


# ------------------------------------------------------------- fused epochs

def make_fused_chunk_step(trainer: RolloutTrainer, W: int, mesh=None,
                          axis: str = "data"):
    """One jitted update for an ENTIRE chunk: lax.scan over its rollout
    windows with (params, opt_state, mem) carried and the optimizer update
    applied inside the scan. Removes the per-window host dispatch — on the
    TPU tunnel each dispatch costs ~0.1-0.5 s of latency, so a fused epoch
    is dominated by device time instead.

    Window-boundary semantics are identical to the per-window path: the
    loss is per-window, gradients stop at window edges (the memory is
    stop_gradient'ed in the carry).
    Chunk arrays must be [n_windows, W, B, ...].
    """
    import functools

    if mesh is not None:
        # data-parallel over the column batch: params/opt replicated,
        # windows sharded on the batch axis (dim 2 of [nw, W, B, ...]),
        # memory on its leading batch dim. XLA inserts the gradient psum
        # over ICI automatically (the DDP/NCCL role).
        from jax.sharding import NamedSharding, PartitionSpec as P
        rep = NamedSharding(mesh, P())
        win_shard = NamedSharding(mesh, P(None, None, axis))
        mem_shard = NamedSharding(mesh, P(axis))
        jit_kwargs = dict(
            in_shardings=(rep, rep, mem_shard,
                          jax.tree_util.tree_map(lambda _: win_shard,
                                                 {"x_lev": 0, "x_sfc": 0,
                                                  "y_lev": 0, "y_sfc": 0,
                                                  "sp": 0}),
                          NamedSharding(mesh, P(axis))),
            out_shardings=(rep, rep, mem_shard, rep),
            donate_argnums=(0, 1, 2))
    else:
        jit_kwargs = dict(donate_argnums=(0, 1, 2))

    jit_kwargs.update(_vmem_jit_kwargs(trainer.model))

    @functools.partial(jax.jit, **jit_kwargs)
    def chunk_step(params, opt_state, mem, windows, mix_mask):
        def body(carry, window):
            params, opt_state, mem = carry

            def loss_fn(p):
                return trainer._window_loss(p, window, mem, mix_mask)

            (loss, new_mem), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = trainer.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state,
                    jax.lax.stop_gradient(new_mem)), loss

        (params, opt_state, mem), losses = jax.lax.scan(
            body, (params, opt_state, mem), windows)
        return params, opt_state, mem, jnp.mean(losses)

    return chunk_step


def run_epoch_fused(trainer: RolloutTrainer, params, opt_state, mem,
                    chunks, epoch: int, key=None, mesh=None):
    """Epoch driver using one dispatch per chunk; pass a Mesh for
    data-parallel training over the column batch."""
    cfg = trainer.cfg
    W = cfg.window_for_epoch(epoch)
    frac = cfg.mix_fraction(epoch)
    key = key if key is not None else jax.random.PRNGKey(cfg.seed + epoch)
    trainer._set_epoch_state(epoch)
    opt_state = trainer.maybe_rescale_optimizer(W, params, opt_state)
    step = trainer._fused_cache.setdefault(
        (W, id(mesh), trainer._ens_w), make_fused_chunk_step(trainer, W,
                                                             mesh))

    tot, n = 0.0, 0
    t0 = time.time()
    for chunk in chunks:
        T = chunk["x_lev"].shape[0]
        B = chunk["x_lev"].shape[1]
        nw = T // W
        if nw == 0:
            continue
        want_lead = cfg.ensemble_size if cfg.ensemble_size > 1 else B
        if mem is None or mem.shape[0] != want_lead or \
                (cfg.ensemble_size > 1 and mem.shape[1] != B):
            shape = trainer._mem_shape(B, chunk["x_lev"].shape[2])
            if cfg.ensemble_size > 1:
                # per-member memory [M, B, ...] (repeat_interleave analog)
                shape = (cfg.ensemble_size,) + shape
            mem = jnp.zeros(shape, jnp.float32)
        windows = {k: jnp.asarray(v[:nw * W]).reshape(
            (nw, W) + v.shape[1:]) for k, v in chunk.items()}
        key, km = jax.random.split(key)
        mix_mask = (jax.random.uniform(km, (B,)) < frac).astype(jnp.float32)
        params, opt_state, mem, loss = step(params, opt_state, mem,
                                            windows, mix_mask)
        tot += float(loss)
        n += 1
    rec = {"epoch": epoch, "window": W, "mix_frac": frac,
           "loss": tot / max(n, 1), "updates": n * max(nw, 1),
           "dispatches": n, "seconds": time.time() - t0}
    return params, opt_state, mem, rec
