"""Offline baseline trainer CLI — the NeurIPS/online-baseline trainer
equivalents (baseline_models/*/training, online_testing/.../train_*.py)
driven by one YAML config + dotted overrides.

Usage:
    python -m climsim_tpu.cli.train_offline conf/mlp_v1.yaml \
        [model.name=cnn optimizer.lr=3e-4 data.steps=100 ...]

Data: synthetic by default (the real HF dataset is not in this image);
``data.h5_path`` switches to a keeplev H5 file flattened to the flat
contract.
"""
from __future__ import annotations

import json
import sys
import os

import numpy as np


def build_model(name: str, vset, cfg):
    import jax.numpy as jnp
    from .. import models as M

    policy = M.BF16 if cfg.get("bf16", False) else M.F32
    if name == "mlp":
        return M.mlp_for(vset, features=tuple(cfg.get("features",
                                                      (768, 640, 512, 640,
                                                       640))), policy=policy)
    if name == "cnn":
        return M.CNN(depth=cfg.get("depth", 12),
                     channels=cfg.get("channels", 406), policy=policy)
    if name == "ed":
        return M.ED(out_dim=vset.target_feature_len,
                    latent_dim=cfg.get("latent_dim", 5),
                    intermediate_dim=cfg.get("intermediate_dim", 463),
                    policy=policy)
    if name == "unet":
        # flat v4/v5 contract + trailing loc index column appended by the
        # wrapper below
        return M.ClimsimUNet(
            num_vars_profile=vset.inputs.n_lev_vars,
            num_vars_scalar=vset.inputs.n_sfc_vars,
            num_vars_profile_out=vset.outputs.n_lev_vars,
            num_vars_scalar_out=vset.outputs.n_sfc_vars,
            model_channels=cfg.get("model_channels", 128),
            channel_mult=tuple(cfg.get("channel_mult", (1, 2, 2, 2))),
            num_blocks=cfg.get("num_blocks", 4),
            output_prune=cfg.get("output_prune", True),
            loc_embedding=cfg.get("loc_embedding", False),
            policy=policy)
    raise ValueError(f"unknown offline model {name}")


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__)
        return 1
    import jax
    import jax.numpy as jnp
    from .. import variables as V
    from ..grid import Grid
    from ..data import synthetic as S, Normalizer, flat_batches
    from ..train import FitConfig, fit
    from ..train.config import load_config
    from ..metrics import evaluate

    cfg = load_config(argv[0], argv[1:])
    if cfg.get("platform"):
        # must precede the first backend use (e.g. 'cpu' for local smoke
        # runs; the sitecustomize hook otherwise pins the TPU tunnel)
        jax.config.update("jax_platforms", cfg["platform"])
    vset = V.get(cfg.get("vset", "v1"))
    grid = Grid.from_file(cfg.get(
        "grid_path", "/root/reference/grid_info/ClimSim_low-res_grid-info.nc"))

    dcfg = cfg.get("data", {})
    steps = dcfg.get("steps", 40)
    xs, ys = S.make_timeseries(
        jax.random.PRNGKey(dcfg.get("seed", 0)),
        S.SyntheticConfig(vset_name=vset.name), grid, steps)
    x = np.asarray(xs).reshape(-1, vset.input_feature_len)
    y = np.asarray(ys).reshape(-1, vset.target_feature_len)
    nz = Normalizer.from_arrays(x.mean(0), x.max(0), x.min(0),
                                1.0 / (np.abs(y).std(0) + 1e-12))
    xn = np.asarray(nz.normalize_input(jnp.asarray(x)))
    yn = np.asarray(nz.scale_output(jnp.asarray(y)))

    val_frac = dcfg.get("val_frac", 0.2)
    ntr = int(len(xn) * (1 - val_frac)) // 384 * 384

    ocfg = cfg.get("optimizer", {})
    fc = FitConfig(lr=ocfg.get("lr", 1e-3),
                   optimizer=ocfg.get("name", "adam"),
                   weight_decay=ocfg.get("weight_decay", 0.0),
                   loss=cfg.get("loss", "huber"),
                   epochs=cfg.get("epochs", 10),
                   batch_size=cfg.get("batch_size", 1536),
                   log_path=cfg.get("log_path"),
                   max_grad_norm=ocfg.get("max_grad_norm"),
                   lr_schedule=ocfg.get("schedule"),
                   schedule_steps=ocfg.get("schedule_steps", 10000),
                   warmup_steps=ocfg.get("warmup_steps", 200),
                   lr_gamma=ocfg.get("lr_gamma", 0.95),
                   decay_every=ocfg.get("decay_every", 1000),
                   plateau_patience=ocfg.get("plateau_patience"),
                   plateau_factor=ocfg.get("plateau_factor", 0.5),
                   min_lr=ocfg.get("min_lr", 0.0),
                   early_stop_patience=cfg.get("early_stop_patience"),
                   var_weights=cfg.get("var_weights", {}))

    name = cfg.get("model", {}).get("name", "mlp")
    if name in ("hsr", "rpn", "cvae"):
        return train_stochastic(name, cfg, vset, grid, xn, yn, x, nz, ntr,
                                fc)
    if name in ("classifier", "classifier_gradout"):
        return train_classifier(cfg, vset, grid, xn, x, y, ntr, fc,
                                gradout=(name == "classifier_gradout"))
    model = build_model(name, vset, cfg.get("model", {}))
    if name == "unet":
        xn = _unet_flat_remap(vset, xn)
        outl = vset.outputs
        ylev_idx = np.concatenate([np.arange(outl.slices[n].start,
                                             outl.slices[n].stop)
                                   for n in outl.lev_names])
        ysfc_idx = np.asarray([outl.slices[n].start
                               for n in outl.sfc_names])
        yn = np.concatenate([yn[:, ylev_idx], yn[:, ysfc_idx]], axis=1)

    def tb():
        return flat_batches(xn[:ntr], yn[:ntr], fc.batch_size,
                            seed=np.random.randint(1 << 31))

    def vb():
        return flat_batches(xn[ntr:], yn[ntr:], fc.batch_size,
                            shuffle=False, drop_remainder=False)

    state, hist = fit(model, vset, fc, tb, vb,
                      checkpoint_dir=cfg.get("checkpoint_dir"))
    for h in hist:
        print(json.dumps(h))

    # final weighted scoreboard on the validation block
    nval = (len(xn) - ntr) // 384 * 384
    if nval > 0:
        pred = np.asarray(state.apply_fn(state.params,
                                         jnp.asarray(xn[ntr:ntr + nval])))
        T = nval // 384
        df = evaluate(jnp.asarray(pred.reshape(T, 384, -1)),
                      jnp.asarray(yn[ntr:ntr + nval].reshape(T, 384, -1)),
                      jnp.asarray(x[ntr:ntr + nval, vset.ps_index]
                                  .reshape(T, 384)),
                      vset, grid, scale=nz.scale)
        out_csv = cfg.get("metrics_csv")
        if out_csv:
            df.to_csv(out_csv)
        print(df.round(4).to_string())
    return 0




def _unet_flat_remap(vset, xn):
    """Registry interleaved flat layout -> the UNet input layout
    [profiles-flat, scalars, loc_idx]."""
    inl = vset.inputs
    lev_idx = np.concatenate([np.arange(inl.slices[n].start,
                                        inl.slices[n].stop)
                              for n in inl.lev_names])
    sfc_idx = np.asarray([inl.slices[n].start for n in inl.sfc_names])
    loc = np.tile(np.arange(1, 385, dtype=np.float32),
                  len(xn) // 384 + 1)[:len(xn), None]
    return np.concatenate([xn[:, lev_idx], xn[:, sfc_idx], loc], axis=1)


def train_classifier(cfg, vset, grid, xn, x_raw, y_raw, ntr, fc,
                     gradout: bool = False):
    """Cloud-state classifier U-Net trainer (Unet_v5
    train_unet_h5loader_classifier.py) and its '_gradout' variant
    (train_unet_h5loader_classifier_gradout.py:301-406): eager steps with
    global-norm gradient clipping and per-minibatch gradient
    observability (max |g|, mean per-tensor L2, total norm), plus
    restart-from-checkpoint of a previously trained classifier.

    Labels derive from RAW cloud water + its tendency
    (climsim_datapip_classifier_h5.py:121-122): 0 no-change,
    1 cloud clears next step, 2 changes."""
    import jax
    import jax.numpy as jnp
    import optax
    from .. import models as M
    from ..data import flat_batches
    from ..models.unet import (ClimsimUNetClassifier, classifier_loss,
                               cloud_class_labels)

    mcfg = cfg.get("model", {})
    thr1 = mcfg.get("threshold_class1", 1e-9)
    thr2 = mcfg.get("threshold_class2", 1e-11)
    # raw cloud water + tendency: v5 carries qn/ptend_qn directly; v4
    # sums the separate liquid/ice channels
    inl, outl = vset.inputs, vset.outputs
    if "state_qn" in inl.lev_names:
        qn = x_raw[:, inl.slices["state_qn"]]
        dq = y_raw[:, outl.slices["ptend_qn"]]
    else:
        qn = (x_raw[:, inl.slices["state_q0002"]]
              + x_raw[:, inl.slices["state_q0003"]])
        dq = (y_raw[:, outl.slices["ptend_q0002"]]
              + y_raw[:, outl.slices["ptend_q0003"]])
    q_next = qn + 1200.0 * dq
    labels = np.asarray(cloud_class_labels(jnp.asarray(q_next),
                                           jnp.asarray(dq), thr1, thr2))
    labels = labels[:, None, :]          # [N, nvar=1, L]

    xn = _unet_flat_remap(vset, xn)
    model = ClimsimUNetClassifier(
        num_vars_profile=inl.n_lev_vars, num_vars_scalar=inl.n_sfc_vars,
        model_channels=mcfg.get("model_channels", 64),
        channel_mult=tuple(mcfg.get("channel_mult", (1, 2, 2))),
        num_blocks=mcfg.get("num_blocks", 2),
        loc_embedding=mcfg.get("loc_embedding", False))
    key = jax.random.PRNGKey(cfg.get("seed", 0))
    params = model.init(key, jnp.asarray(xn[:2]))

    if cfg.get("init_from"):
        # restart from a previous classifier checkpoint (the reference's
        # cfg.restart_path + modulus.Module.from_checkpoint, :188-201)
        import orbax.checkpoint as ocp
        from ..train.finetune import partial_load
        donor = ocp.PyTreeCheckpointer().restore(
            os.path.abspath(cfg["init_from"]))
        params, nl, ns = partial_load(params, donor.get("params", donor))
        print(f"init_from: loaded {nl} tensors, kept {ns}")

    base = optax.adam(fc.lr)
    if fc.max_grad_norm:
        base = optax.chain(optax.clip_by_global_norm(fc.max_grad_norm),
                           base)
    opt_state = base.init(params)

    @jax.jit
    def step(p, st, xb, lb):
        def loss_fn(p):
            return classifier_loss(model.apply(p, xb), lb)
        l, g = jax.value_and_grad(loss_fn)(p)
        leaves = jax.tree_util.tree_leaves(g)
        gstats = {
            "max_grad": jnp.max(jnp.stack(
                [jnp.max(jnp.abs(t)) for t in leaves])),
            "mean_grad_l2": jnp.mean(jnp.stack(
                [jnp.linalg.norm(t.ravel()) for t in leaves])),
            "total_norm": optax.global_norm(g),
        }
        up, st = base.update(g, st, p)
        return optax.apply_updates(p, up), st, l, gstats

    @jax.jit
    def eval_loss(p, xb, lb):
        return classifier_loss(model.apply(p, xb), lb)

    hist = []
    for ep in range(fc.epochs):
        tot, n = 0.0, 0
        gacc = {"max_grad": 0.0, "mean_grad_l2": 0.0, "total_norm": 0.0}
        for i in range(0, ntr - fc.batch_size + 1, fc.batch_size):
            xb = jnp.asarray(xn[i:i + fc.batch_size])
            lb = jnp.asarray(labels[i:i + fc.batch_size])
            params, opt_state, l, gs = step(params, opt_state, xb, lb)
            tot += float(l)
            n += 1
            if gradout:
                gacc = {k: max(gacc[k], float(v)) if k == "max_grad"
                        else gacc[k] + float(v) for k, v in gs.items()}
        vtot, vn = 0.0, 0
        for i in range(ntr, len(xn) - fc.batch_size + 1, fc.batch_size):
            vtot += float(eval_loss(params, jnp.asarray(xn[i:i + fc.
                                                           batch_size]),
                                    jnp.asarray(labels[i:i + fc.
                                                       batch_size])))
            vn += 1
        rec = {"epoch": ep, "train_ce": tot / max(n, 1),
               "val_ce": vtot / max(vn, 1)}
        if gradout and n:
            rec.update(max_grad=gacc["max_grad"],
                       mean_grad_l2=gacc["mean_grad_l2"] / n,
                       total_norm=gacc["total_norm"] / n)
        hist.append(rec)
        print(json.dumps(rec))

    if cfg.get("checkpoint_dir"):
        import orbax.checkpoint as ocp
        ocp.PyTreeCheckpointer().save(
            os.path.abspath(os.path.join(cfg["checkpoint_dir"],
                                         "classifier")),
            {"params": params})

    # per-class accuracy scoreboard on the validation block
    nval = min(len(xn) - ntr, 4 * fc.batch_size)
    if nval > 0:
        import jax.numpy as jnp
        logits = model.apply(params, jnp.asarray(xn[ntr:ntr + nval]))
        pred = np.asarray(jnp.argmax(logits, axis=2))
        lab = labels[ntr:ntr + nval]
        acc = float((pred == lab).mean())
        per = {int(c): float((pred == lab)[lab == c].mean())
               for c in np.unique(lab)}
        print(json.dumps({"val_accuracy": acc, "per_class": per}))
    return 0


def train_stochastic(name, cfg, vset, grid, xn, yn, x, nz, ntr, fc):
    """HSR / RPN / cVAE training paths (their reference trainers each have
    bespoke losses: NLL with warm phase, ensemble MSE, beta-ELBO) + CRPS
    scoreboard."""
    import jax
    import jax.numpy as jnp
    import optax
    from .. import models as M
    from ..metrics import evaluate
    from ..data import flat_batches

    mcfg = cfg.get("model", {})
    ny = vset.target_feature_len
    key = jax.random.PRNGKey(cfg.get("seed", 0))
    opt = optax.adam(fc.lr)
    num_samples = cfg.get("num_crps_samples", 16)

    if name == "hsr":
        model = M.HSR(out_dim=ny, hidden=mcfg.get("hidden", 512),
                      layers=mcfg.get("layers", 1))
        params = model.init(key, jnp.asarray(xn[:2]))

        def loss_fn(p, xb, yb, warm):
            mean, logprec = model.apply(p, xb)
            return M.hsr_nll(mean, logprec, yb, warm=warm)

        def sample_fn(p, xb, k):
            return M.hsr_sample(p, model, xb, k, num_samples)

    elif name == "rpn":
        ens = M.RPNEnsemble(out_dim=ny,
                            features=tuple(mcfg.get("features",
                                                    (768, 640, 512, 640,
                                                     640))),
                            num_members=mcfg.get("members", 8))
        params = ens.init(key, jnp.asarray(xn[:2]))

        def loss_fn(p, xb, yb, warm):
            return ens.loss(p, xb, yb)

        def sample_fn(p, xb, k):
            return ens.samples(p, xb)

    else:  # cvae
        model = M.CVAE(out_dim=ny, latent_dim=mcfg.get("latent_dim", 5),
                       hidden=mcfg.get("hidden", 512),
                       layers=mcfg.get("layers", 2))
        params = model.init(key, jnp.asarray(yn[:2]), jnp.asarray(xn[:2]),
                            key)

        def loss_fn(p, xb, yb, kb):
            return M.cvae_loss(model, p, yb, xb, kb,
                               beta=mcfg.get("beta", 1.0))

        def sample_fn(p, xb, k):
            return M.cvae_samples(model, p, xb, k, num_samples)

    opt_state = opt.init(params)
    is_cvae = name == "cvae"

    from functools import partial

    @partial(jax.jit, static_argnums=(4,) if name == "hsr" else ())
    def step(p, st, xb, yb, k_or_warm):
        l, g = jax.value_and_grad(loss_fn)(p, xb, yb, k_or_warm)
        up, st = opt.update(g, st, p)
        return optax.apply_updates(p, up), st, l

    import json as _json
    epochs = fc.epochs
    for ep in range(epochs):
        tot, n = 0.0, 0
        key, ke = jax.random.split(key)
        for xb, yb in flat_batches(xn[:ntr], yn[:ntr], fc.batch_size,
                                   seed=ep):
            ke, kb = jax.random.split(ke)
            extra = kb if is_cvae else (ep < epochs // 3)
            params, opt_state, l = step(params, opt_state,
                                        jnp.asarray(xb), jnp.asarray(yb),
                                        extra)
            tot += float(l)
            n += 1
        print(_json.dumps({"epoch": ep, "train_loss": tot / max(n, 1)}))

    # CRPS scoreboard on validation block
    nval = (len(xn) - ntr) // 384 * 384
    if nval > 0:
        key, ks = jax.random.split(key)
        sp = sample_fn(params, jnp.asarray(xn[ntr:ntr + nval]), ks)
        T = nval // 384
        mean_pred = jnp.mean(sp, -1)
        df = evaluate(mean_pred.reshape(T, 384, ny),
                      jnp.asarray(yn[ntr:ntr + nval].reshape(T, 384, ny)),
                      jnp.asarray(x[ntr:ntr + nval, vset.ps_index]
                                  .reshape(T, 384)),
                      vset, grid, scale=nz.scale,
                      samplepreds=sp.reshape(T, 384, ny, -1))
        print(df.round(4).to_string())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
