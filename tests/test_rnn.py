"""RNN emulator + rollout engine tests (SURVEY.md §2.2 parity)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climsim_tpu.grid import Grid
from climsim_tpu.models.rnn import (RNNAutoreg, postprocess_mp,
                                    temperature_scaling,
                                    temperature_scaling_precip)
from climsim_tpu.train.rollout import RolloutTrainer, RolloutConfig
from climsim_tpu.data import keeplev_chunks

GRID_PATH = "/root/reference/grid_info/ClimSim_low-res_grid-info.nc"
K = jax.random.PRNGKey


def _grid_tuples():
    g = Grid.from_file(GRID_PATH)
    return (tuple(float(x) for x in np.asarray(g.hyam)),
            tuple(float(x) for x in np.asarray(g.hybm)), g)


@pytest.mark.parametrize("cell", ["gru", "lstm", "sru", "ln_lstm", "qrnn"])
def test_rnn_autoreg_cells(cell):
    hyam, hybm, _ = _grid_tuples()
    m = RNNAutoreg(nx=15, nx_sfc=24, ny=6, ny_sfc=8, nneur=(32, 32),
                   nh_mem=8, cell=cell, hyam=hyam, hybm=hybm,
                   sp_mean=9.8e4, sp_div=1e4)
    B, L = 4, 60
    xm = jax.random.normal(K(0), (B, L, 15))
    xs = jax.random.normal(K(1), (B, 24))
    mem = jnp.zeros((B, L, 8))
    p = m.init(K(2), xm, xs, mem)
    out, out_sfc, new_mem = m.apply(p, xm, xs, mem)
    assert out.shape == (B, L, 6)
    assert out_sfc.shape == (B, 8)
    assert new_mem.shape == (B, L, 8)
    # output pruning: only dT nonzero in top 12 levels
    assert np.all(np.asarray(out[:, :12, 1:]) == 0)
    assert np.any(np.asarray(out[:, :12, 0]) != 0)


def test_memory_feeds_back():
    """The latent memory must influence the next step's output — the core
    autoregressive mechanism (models.py:461,547-552)."""
    hyam, hybm, _ = _grid_tuples()
    m = RNNAutoreg(nx=15, nx_sfc=24, ny=6, ny_sfc=8, nneur=(32, 32),
                   nh_mem=8, hyam=hyam, hybm=hybm)
    B, L = 4, 60
    xm = jax.random.normal(K(0), (B, L, 15))
    xs = jax.random.normal(K(1), (B, 24))
    p = m.init(K(2), xm, xs, jnp.zeros((B, L, 8)))
    out0, _, mem1 = m.apply(p, xm, xs, jnp.zeros((B, L, 8)))
    out1, _, _ = m.apply(p, xm, xs, mem1)
    assert float(jnp.abs(out0 - out1).max()) > 1e-7
    # memory itself is input-dependent
    assert float(jnp.abs(mem1).max()) > 1e-7


def test_stochastic_layer_rng():
    hyam, hybm, _ = _grid_tuples()
    m = RNNAutoreg(nx=15, nx_sfc=24, ny=6, ny_sfc=8, nneur=(32, 32, 32),
                   nh_mem=8, add_stochastic_layer=True, hyam=hyam, hybm=hybm)
    B, L = 4, 60
    xm = jax.random.normal(K(0), (B, L, 15))
    xs = jax.random.normal(K(1), (B, 24))
    mem = jnp.zeros((B, L, 8))
    p = m.init({"params": K(2), "noise": K(3)}, xm, xs, mem,
               deterministic=False)
    o1, _, _ = m.apply(p, xm, xs, mem, deterministic=False,
                       rngs={"noise": K(4)})
    o2, _, _ = m.apply(p, xm, xs, mem, deterministic=False,
                       rngs={"noise": K(5)})
    o3, _, _ = m.apply(p, xm, xs, mem, deterministic=False,
                       rngs={"noise": K(4)})
    assert float(jnp.abs(o1 - o2).max()) > 1e-8      # different noise
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o3))  # same key
    # deterministic mode ignores noise
    d1, _, _ = m.apply(p, xm, xs, mem, deterministic=True)
    d2, _, _ = m.apply(p, xm, xs, mem, deterministic=True)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))


def test_separate_radiation_shapes():
    hyam, hybm, _ = _grid_tuples()
    m = RNNAutoreg(nx=15, nx_sfc=24, ny=6, ny_sfc=8, nneur=(32, 32),
                   nh_mem=8, separate_radiation=True, hyam=hyam, hybm=hybm)
    B, L = 4, 60
    xm = jax.random.normal(K(0), (B, L, 15))
    xs = jax.random.normal(K(1), (B, 24))
    mem = jnp.zeros((B, 50, 8))
    p = m.init(K(2), xm, xs, mem)
    out, out_sfc, new_mem = m.apply(p, xm, xs, mem)
    assert out.shape == (B, 60, 6)
    assert out_sfc.shape == (B, 8)
    assert new_mem.shape == (B, 50, 8)


# ---------------------------------------------------------------- mp modes

def test_temperature_scalings():
    T = jnp.asarray([233.16, 253.16, 263.16, 273.16, 300.0])
    np.testing.assert_allclose(np.asarray(temperature_scaling(T)),
                               [0, 0, 0.5, 1, 1], atol=1e-6)
    Ts = jnp.asarray([260.0, 268.7, 283.3, 300.0])
    sf = np.asarray(temperature_scaling_precip(Ts))
    assert sf[0] == 1.0 and sf[-1] == 0.0
    np.testing.assert_allclose(sf[1], 1.0, atol=1e-6)


def test_postprocess_mp1_numpy_parity():
    """mp_mode=1: dqn split by T-ramp; matches independent numpy impl of
    Base_RNN_autoreg.postprocessing (models.py:273-339)."""
    rng = np.random.default_rng(0)
    B, L = 6, 60
    out = rng.normal(0, 1, (B, L, 5)).astype(np.float32)
    ysl = np.abs(rng.normal(1, 0.1, (1, 1, 5))).astype(np.float32)
    yss = np.abs(rng.normal(1, 0.1, 8)).astype(np.float32)
    out_sfc = rng.normal(0, 1, (B, 8)).astype(np.float32)
    x_den = np.stack([rng.uniform(220, 300, (B, L)),
                      rng.uniform(0, 1, (B, L)),
                      np.abs(rng.normal(0, 1e-5, (B, L))),
                      np.abs(rng.normal(0, 1e-5, (B, L)))], -1).astype(np.float32)
    od, osd = postprocess_mp(jnp.asarray(out), jnp.asarray(out_sfc),
                             jnp.asarray(x_den), jnp.asarray(ysl),
                             jnp.asarray(yss), mp_mode=1)
    # numpy reference
    d = out / ysl
    T_new = x_den[:, :, 0] + d[:, :, 0] * 1200
    lf = np.clip((T_new - 253.16) * 0.05, 0, 1)
    qn_old = x_den[:, :, 2] + x_den[:, :, 3]
    qn_new = qn_old + d[:, :, 2] * 1200
    dql = (lf * qn_new - x_den[:, :, 2]) / 1200
    dqi = ((1 - lf) * qn_new - x_den[:, :, 3]) / 1200
    exp = np.concatenate([d[:, :, 0:2], dql[..., None], dqi[..., None],
                          d[:, :, 3:]], axis=2)
    np.testing.assert_allclose(np.asarray(od), exp, rtol=2e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(osd), out_sfc / yss, rtol=1e-5)
    # water closure: dql+dqi == dqn
    np.testing.assert_allclose(np.asarray(od[:, :, 2] + od[:, :, 3]),
                               d[:, :, 2], rtol=2e-3, atol=1e-7)


def test_postprocess_mp_neg1_clamp():
    """mp_mode=-1: predicted liquid fraction clamped to +-0.2 of diagnosed."""
    B, L = 2, 60
    out = np.zeros((B, L, 6), np.float32)
    out[:, :, 3] = 5.0  # absurd liq_frac prediction -> must clamp
    x_den = np.zeros((B, L, 4), np.float32)
    x_den[:, :, 0] = 300.0  # warm: diagnosed frac = 1
    x_den[:, :, 2] = 1e-5
    ysl = np.ones((1, 1, 6), np.float32)
    od, _ = postprocess_mp(jnp.asarray(out), jnp.zeros((B, 8)),
                           jnp.asarray(x_den), jnp.asarray(ysl),
                           jnp.ones(8), mp_mode=-1)
    # clamp to max 1.0 -> all condensate change goes to liquid
    qn_new = 1e-5  # qn_old + 0
    np.testing.assert_allclose(np.asarray(od[:, :, 2]),
                               (1.0 * qn_new - 1e-5) / 1200, atol=1e-12)


# ------------------------------------------------------------- rollout

def _make_training_setup(replay=None, w_energy=0.0):
    g = Grid.from_file(GRID_PATH)
    rng = np.random.default_rng(0)
    T, B, L = 8, 32, 60
    x_lev = rng.normal(0, 1, (T, B, L, 15)).astype(np.float32)
    x_sfc = rng.normal(0, 1, (T, B, 24)).astype(np.float32)
    # target = smooth function of inputs so the model can learn
    y_lev = np.tanh(x_lev[..., :6]) * 0.5
    y_sfc = np.abs(x_sfc[..., :8]) * 0.5
    sp = rng.uniform(9.6e4, 1.03e5, (T, B)).astype(np.float32)
    hyam = tuple(float(x) for x in np.asarray(g.hyam))
    hybm = tuple(float(x) for x in np.asarray(g.hybm))
    model = RNNAutoreg(nx=15, nx_sfc=24, ny=6, ny_sfc=8, nneur=(32, 32),
                       nh_mem=8, hyam=hyam, hybm=hybm, add_pres=False,
                       output_prune=False)
    cfg = RolloutConfig(rollout_schedule={0: 1, 1: 2}, lr=3e-3,
                        replay=replay, replay_slice=(9, 14),
                        pred_slice=(0, 5), w_energy=w_energy,
                        gradual_mixing_end_epoch=2)
    tr = RolloutTrainer(model, cfg, np.asarray(g.hyai), np.asarray(g.hybi),
                        yscale_lev=jnp.ones((1, 1, 6)),
                        yscale_sca=jnp.ones(8))
    data = (x_lev, x_sfc, y_lev, y_sfc, sp)
    return tr, data


def _chunks(data):
    return keeplev_chunks(*data, chunk_size=4, shuffle=False)


def test_rollout_loss_decreases():
    tr, data = _make_training_setup()
    params, opt, mem = tr.init(K(0), next(iter(_chunks(data))))
    recs = []
    for ep in range(3):
        params, opt, mem, rec = tr.run_epoch(params, opt, mem,
                                             _chunks(data), ep)
        recs.append(rec)
    assert recs[-1]["loss"] < 0.7 * recs[0]["loss"], recs
    assert recs[0]["window"] == 1 and recs[1]["window"] == 2


def test_rollout_replay_mixed_runs():
    tr, data = _make_training_setup(replay="mixed")
    params, opt, mem = tr.init(K(0), next(iter(_chunks(data))))
    for ep in range(2):
        params, opt, mem, rec = tr.run_epoch(params, opt, mem,
                                             _chunks(data), ep)
        assert np.isfinite(rec["loss"])
    assert tr.cfg.mix_fraction(0) == 0.5 and tr.cfg.mix_fraction(1) == 1.0


def test_rollout_conservation_term():
    tr, data = _make_training_setup(w_energy=1e-10)
    params, opt, mem = tr.init(K(0), next(iter(_chunks(data))))
    params, opt, mem, rec = tr.run_epoch(params, opt, mem, _chunks(data), 0)
    assert np.isfinite(rec["loss"])


def test_rollout_eval_mode_no_update():
    tr, data = _make_training_setup()
    params, opt, mem = tr.init(K(0), next(iter(_chunks(data))))
    p_before = jax.tree_util.tree_map(lambda a: np.asarray(a).copy(), params)
    params, opt, mem, rec = tr.run_epoch(params, opt, mem, _chunks(data), 0,
                                         train=False)
    for a, b in zip(jax.tree_util.tree_leaves(p_before),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ------------------------------------------------------------- wrapper

def test_online_wrapper_contract():
    """Raw-in/raw-out wrapper: snowhice fix, exp transform, NaN scrub,
    368-feature flattening (save_wrapper_mem_prevtend_ftorch.py:199-387)."""
    from climsim_tpu.export import OnlineWrapper, WrapperConfig, flat_output
    from climsim_tpu.data import LevelNormalizer
    from climsim_tpu import variables as V

    hyam, hybm, g = _grid_tuples()
    vs = V.get("v4_rnn")
    model = RNNAutoreg(nx=15, nx_sfc=24, ny=5, ny_sfc=8, nneur=(32, 32),
                       nh_mem=8, hyam=hyam, hybm=hybm, add_pres=False)
    B, L = 4, 60
    rngnp = np.random.default_rng(0)
    x_main = np.abs(rngnp.normal(0.5, 0.2, (B, L, 15))).astype(np.float32)
    x_main[:, :, 0] = rngnp.uniform(220, 300, (B, L))   # T
    x_main[:, :, 2:4] = np.abs(rngnp.normal(0, 1e-5, (B, L, 2)))
    x_main[0, 0, 5] = np.nan                            # NaN input
    x_sfc = np.abs(rngnp.normal(0.5, 0.2, (B, 24))).astype(np.float32)
    x_sfc[1, 15] = 1e12                                 # broken SNOWHICE
    mem = jnp.zeros((B, L, 8))

    norm = LevelNormalizer.identity(vs)
    # 5-output model: scale_lev must be [*, 5]
    norm = LevelNormalizer(norm.mean_lev, norm.div_lev, norm.mean_sfc,
                           norm.div_sfc, jnp.ones((1, 5)), norm.scale_sfc)
    params = model.init(K(0), jnp.asarray(x_main), jnp.asarray(x_sfc), mem)
    lbd = np.full(60, 1e4, np.float32)
    w = OnlineWrapper(model, params, norm, lbd, lbd, lbd,
                      WrapperConfig(mp_mode=1))
    out, out_sfc, new_mem = w.jitted()(jnp.asarray(x_main),
                                       jnp.asarray(x_sfc), mem)
    assert out.shape == (B, L, 6)       # mp split: 5 outputs -> 6 raw
    assert out_sfc.shape == (B, 8)
    assert np.isfinite(np.asarray(out)).all()
    assert np.isfinite(np.asarray(out_sfc)).all()
    flat = flat_output(out, out_sfc)
    assert flat.shape == (B, 368)
    # flat layout: ptend_t block first, NETSW at 360
    np.testing.assert_array_equal(np.asarray(flat[:, :60]),
                                  np.asarray(out[:, :, 0]))
    np.testing.assert_array_equal(np.asarray(flat[:, 360]),
                                  np.asarray(out_sfc[:, 0]))


def test_rollout_semi_online():
    """Semi-online training: input state reconstructed from the model's own
    previous predictions + true dynamics increments (rnn/utils.py:994-1060).
    """
    g = Grid.from_file(GRID_PATH)
    rng = np.random.default_rng(0)
    T, B, L = 8, 16, 60
    x_lev = rng.normal(0, 1, (T, B, L, 15)).astype(np.float32)
    x_sfc = rng.normal(0, 1, (T, B, 24)).astype(np.float32)
    y_lev = np.tanh(x_lev[..., :6]) * 0.5
    y_sfc = np.abs(x_sfc[..., :8]) * 0.5
    sp = rng.uniform(9.6e4, 1.03e5, (T, B)).astype(np.float32)
    x_raw = np.abs(rng.normal(1.0, 0.1, (T, B, L, 6))).astype(np.float32)
    y_raw = rng.normal(0, 1e-5, (T, B, L, 6)).astype(np.float32)
    hyam = tuple(float(x) for x in np.asarray(g.hyam))
    hybm = tuple(float(x) for x in np.asarray(g.hybm))
    model = RNNAutoreg(nx=15, nx_sfc=24, ny=6, ny_sfc=8, nneur=(16, 16),
                       nh_mem=4, hyam=hyam, hybm=hybm, add_pres=False,
                       output_prune=False)
    cfg = RolloutConfig(rollout_schedule={0: 2}, lr=1e-3, semi_online=True,
                        n_prog=6)
    tr = RolloutTrainer(model, cfg, np.asarray(g.hyai), np.asarray(g.hybi),
                        yscale_lev=jnp.ones((1, 1, 6)),
                        yscale_sca=jnp.ones(8),
                        xmean_prog=np.zeros((1, 6), np.float32),
                        xdiv_prog=np.ones((1, 6), np.float32),
                        lbd_qc=np.full(L, 100.0, np.float32),
                        lbd_qi=np.full(L, 100.0, np.float32))

    def chunks():
        return keeplev_chunks(x_lev, x_sfc, y_lev, y_sfc, sp, chunk_size=4,
                              shuffle=False)

    # chunks need the raw entries too
    def chunks_raw():
        for i, c in enumerate(chunks()):
            s = i * 4
            c["x_lev_raw"] = x_raw[s:s + 4]
            c["y_lev_raw"] = y_raw[s:s + 4]
            yield c

    params, opt, mem = tr.init(K(0), next(iter(chunks_raw())))
    losses = []
    for ep in range(2):
        params, opt, mem, rec = tr.run_epoch(params, opt, mem, chunks_raw(),
                                             ep)
        losses.append(rec["loss"])
        assert np.isfinite(rec["loss"]), rec
    assert losses[1] < losses[0]


def test_rollout_ensemble_crps():
    """Stochastic ensemble rollout training: members vmapped with distinct
    noise, CRPS loss over members (rnn/utils.py:940-959, 1064-1072)."""
    g = Grid.from_file(GRID_PATH)
    rng = np.random.default_rng(0)
    T, B, L = 4, 8, 60
    x_lev = rng.normal(0, 1, (T, B, L, 15)).astype(np.float32)
    x_sfc = rng.normal(0, 1, (T, B, 24)).astype(np.float32)
    y_lev = np.tanh(x_lev[..., :6]) * 0.5
    y_sfc = np.abs(x_sfc[..., :8]) * 0.5
    sp = rng.uniform(9.6e4, 1.03e5, (T, B)).astype(np.float32)
    hyam = tuple(float(x) for x in np.asarray(g.hyam))
    hybm = tuple(float(x) for x in np.asarray(g.hybm))
    model = RNNAutoreg(nx=15, nx_sfc=24, ny=6, ny_sfc=8,
                       nneur=(16, 16, 16), nh_mem=4,
                       add_stochastic_layer=True, hyam=hyam, hybm=hybm,
                       add_pres=False, output_prune=False)
    cfg = RolloutConfig(rollout_schedule={0: 2}, lr=1e-3, ensemble_size=3,
                        ens_loss="crps")
    tr = RolloutTrainer(model, cfg, np.asarray(g.hyai), np.asarray(g.hybi),
                        yscale_lev=jnp.ones((1, 1, 6)),
                        yscale_sca=jnp.ones(8))

    def chunks():
        return keeplev_chunks(x_lev, x_sfc, y_lev, y_sfc, sp,
                              chunk_size=4, shuffle=False)

    params, opt, mem = tr.init(K(0), next(iter(chunks())))
    assert mem.shape[0] == 3                       # member axis
    losses = []
    for ep in range(2):
        params, opt, mem, rec = tr.run_epoch(params, opt, mem, chunks(), ep)
        losses.append(rec["loss"])
        assert np.isfinite(rec["loss"])
    assert losses[1] < losses[0]


def test_rollout_checkpoint_topk(tmp_path):
    """Top-K retention + resume incl. the autoregressive memory."""
    from climsim_tpu.train.rollout import (save_rollout_checkpoint,
                                           restore_rollout_checkpoint)
    import os
    tr, data = _make_training_setup()
    params, opt, mem = tr.init(K(0), next(iter(_chunks(data))))
    p = str(tmp_path / "ck")
    save_rollout_checkpoint(p, params, opt, mem, 0, val_loss=1.0,
                            keep_top_k=2)
    save_rollout_checkpoint(p, params, opt, mem, 1, val_loss=0.5,
                            keep_top_k=2)
    save_rollout_checkpoint(p, params, opt, mem, 2, val_loss=2.0,
                            keep_top_k=2)
    # worst (ep2) evicted; best is ep1
    names = {d for d in os.listdir(p) if d.startswith("ep")}
    assert names == {"ep0", "ep1"}
    p2, o2, m2, ep = restore_rollout_checkpoint(p, params, opt, mem)
    assert ep == 1
    for a, b in zip(jax.tree_util.tree_leaves(p2),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ar_noise_threading():
    """AR(1) eps threading: the model returns eps and reuses it with
    correlation rho (the wrapper's eps_prev contract)."""
    hyam, hybm, _ = _grid_tuples()
    m = RNNAutoreg(nx=15, nx_sfc=24, ny=6, ny_sfc=8, nneur=(16, 16, 16),
                   nh_mem=4, add_stochastic_layer=True, ar_noise_rho=0.9,
                   hyam=hyam, hybm=hybm)
    B, L = 4, 60
    xm = jax.random.normal(K(0), (B, L, 15))
    xs = jax.random.normal(K(1), (B, 24))
    mem = jnp.zeros((B, L, 4))
    eps0 = jnp.zeros((L, B, 16))
    p = m.init({"params": K(2), "noise": K(3)}, xm, xs, mem,
               deterministic=False, eps_prev=eps0)
    out1, _, _, eps1 = m.apply(p, xm, xs, mem, deterministic=False,
                               eps_prev=eps0, rngs={"noise": K(4)})
    out2, _, _, eps2 = m.apply(p, xm, xs, mem, deterministic=False,
                               eps_prev=eps1, rngs={"noise": K(5)})
    # eps2 correlated with eps1 (rho=0.9)
    # cold start from eps0=0: corr = rho*std(eps1)/std(eps2) ~= 0.67
    c = np.corrcoef(np.asarray(eps1).ravel(), np.asarray(eps2).ravel())[0, 1]
    assert c > 0.6, c
    assert eps1.shape == eps0.shape


def test_freeze_and_partial_load():
    from climsim_tpu.train.finetune import partial_load, freeze
    import optax
    hyam, hybm, _ = _grid_tuples()
    m = RNNAutoreg(nx=15, nx_sfc=24, ny=6, ny_sfc=8, nneur=(16, 16),
                   nh_mem=4, hyam=hyam, hybm=hybm)
    B, L = 4, 60
    xm = jax.random.normal(K(0), (B, L, 15))
    xs = jax.random.normal(K(1), (B, 24))
    mem = jnp.zeros((B, L, 4))
    p1 = m.init(K(2), xm, xs, mem)
    p2 = m.init(K(3), xm, xs, mem)
    merged, loaded, skipped = partial_load(p1, p2)
    assert loaded > 0 and skipped == 0
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(merged)[0]),
        np.asarray(jax.tree_util.tree_leaves(p2)[0]))

    tx = freeze(optax.adam(1e-3), p1, ["*rnn_up*"])
    st = tx.init(p1)

    def loss(p):
        out, _, _ = m.apply(p, xm, xs, mem)
        return jnp.sum(jnp.square(out))

    g = jax.grad(loss)(p1)
    up, _ = tx.update(g, st, p1)
    froz = sum(float(jnp.abs(a).sum()) for kp, a in
               jax.tree_util.tree_flatten_with_path(up)[0]
               if "rnn_up" in jax.tree_util.keystr(kp))
    live = sum(float(jnp.abs(a).sum()) for kp, a in
               jax.tree_util.tree_flatten_with_path(up)[0]
               if "rnn_up" not in jax.tree_util.keystr(kp))
    assert froz == 0.0 and live > 0.0


def test_fused_epoch_matches_per_window():
    """The one-dispatch-per-chunk fused epoch produces the same parameters
    as the per-window path (identical update order and detach semantics)."""
    from climsim_tpu.train.rollout import run_epoch_fused
    tr, data = _make_training_setup()
    params, opt, mem = tr.init(K(0), next(iter(_chunks(data))))
    p2 = jax.tree_util.tree_map(lambda a: a.copy(), params)
    o2 = jax.tree_util.tree_map(lambda a: a.copy(), opt)
    m2 = mem.copy()

    params, opt, mem, rec1 = tr.run_epoch(params, opt, mem,
                                          _chunks(data), 0)
    p2, o2, m2, rec2 = run_epoch_fused(tr, p2, o2, m2, _chunks(data), 0)
    np.testing.assert_allclose(rec1["loss"], rec2["loss"], rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=1e-6)
    np.testing.assert_allclose(np.asarray(mem), np.asarray(m2), rtol=2e-3,
                               atol=1e-5)


def test_fused_epoch_data_parallel_mesh():
    """Fused rollout training sharded over the 8-device mesh matches the
    single-device run (params replicated, batch sharded, grads psum'd)."""
    from climsim_tpu.train.rollout import run_epoch_fused
    from climsim_tpu.parallel import make_mesh
    tr, data = _make_training_setup()
    params, opt, mem = tr.init(K(0), next(iter(_chunks(data))))
    p1 = jax.tree_util.tree_map(lambda a: a.copy(), params)
    o1 = jax.tree_util.tree_map(lambda a: a.copy(), opt)
    mesh = make_mesh(8, axis="data")
    p2, o2, m2, rec2 = run_epoch_fused(tr, params, opt, mem,
                                       _chunks(data), 0, mesh=mesh)
    p1, o1, m1, rec1 = run_epoch_fused(tr, p1, o1, mem.copy(),
                                       _chunks(data), 0)
    np.testing.assert_allclose(rec1["loss"], rec2["loss"], rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-4,
                                   atol=1e-6)


def test_rollout_gel_precip_term():
    """w_gel_precip adds a finite term and changes the loss value vs the
    plain config on identical data/params."""
    tr0, data = _make_training_setup()
    tr1, _ = _make_training_setup()
    tr1.cfg.w_gel_precip = 0.1
    params, opt, mem = tr0.init(K(0), next(iter(_chunks(data))))
    _, _, _, rec0 = tr0.run_epoch(params, opt, mem, _chunks(data), 0,
                                  train=False)
    _, _, _, rec1 = tr1.run_epoch(params, opt, mem, _chunks(data), 0,
                                  train=False)
    assert np.isfinite(rec1["loss"])
    assert rec1["loss"] != rec0["loss"]


def test_ar_noise_vertical_modes():
    """ar_noise_vertical=False (reference mode 3): one noise draw shared
    by all levels — the carried eps has a singleton level axis and two
    forward passes with the same rng agree; the per-level mode carries
    [L, B, nh] noise."""
    hyam, hybm, _ = _grid_tuples()
    kw = dict(nx=10, nx_sfc=24, ny=6, ny_sfc=8, nneur=(16, 16), nh_mem=4,
              add_stochastic_layer=True, ar_noise_rho=0.9,
              hyam=hyam, hybm=hybm, sp_mean=9.8e4, sp_div=1.0,
              add_pres=False, output_prune=False)
    rng = np.random.default_rng(0)
    B, L = 4, 60
    xm = jnp.asarray(rng.normal(0, 1, (B, L, 10)).astype(np.float32))
    xs = jnp.asarray(rng.normal(0, 1, (B, 24)).astype(np.float32))
    mem = jnp.zeros((B, L, 4))
    for vertical, lev_dim in ((True, 60), (False, 1)):
        m = RNNAutoreg(ar_noise_vertical=vertical, **kw)
        p = m.init({"params": K(0), "noise": K(1)}, xm, xs, mem,
                   deterministic=False)
        eps0 = jnp.asarray(rng.normal(0, 1, (lev_dim, B, 16))
                           .astype(np.float32))
        out, osfc, nm, eps = m.apply(p, xm, xs, mem, deterministic=False,
                                     eps_prev=eps0, rngs={"noise": K(2)})
        assert eps.shape == (lev_dim, B, 16)
        assert np.isfinite(np.asarray(out)).all()


def test_online_wrapper_eps_contract():
    """Stochastic wrapper signature (x, xs, mem, eps_prev, key) ->
    (out, out_sfc, mem, eps): AR noise threads across coupled steps and
    the returned eps feeds the next call (forward_eps contract)."""
    from climsim_tpu.export import OnlineWrapper, WrapperConfig
    from climsim_tpu.data import LevelNormalizer
    from climsim_tpu import variables as V

    hyam, hybm, g = _grid_tuples()
    vs = V.get("v4_rnn")
    model = RNNAutoreg(nx=15, nx_sfc=24, ny=5, ny_sfc=8, nneur=(16, 16),
                       nh_mem=4, hyam=hyam, hybm=hybm, add_pres=False,
                       add_stochastic_layer=True, ar_noise_rho=0.9)
    B, L = 3, 60
    rngnp = np.random.default_rng(1)
    x_main = np.abs(rngnp.normal(0.5, 0.2, (B, L, 15))).astype(np.float32)
    x_main[:, :, 0] = rngnp.uniform(220, 300, (B, L))
    x_sfc = np.abs(rngnp.normal(0.5, 0.2, (B, 24))).astype(np.float32)
    mem = jnp.zeros((B, L, 4))
    norm = LevelNormalizer.identity(vs)
    norm = LevelNormalizer(norm.mean_lev, norm.div_lev, norm.mean_sfc,
                           norm.div_sfc, jnp.ones((1, 5)), norm.scale_sfc)
    params = model.init({"params": K(0), "noise": K(9)},
                        jnp.asarray(x_main), jnp.asarray(x_sfc), mem,
                        deterministic=False)
    lbd = np.full(60, 1e4, np.float32)
    w = OnlineWrapper(model, params, norm, lbd, lbd, lbd,
                      WrapperConfig(mp_mode=1))
    eps = jnp.zeros((L, B, 16))
    outs = []
    for t in range(3):
        out, osfc, mem, eps = w(jnp.asarray(x_main), jnp.asarray(x_sfc),
                                mem, eps_prev=eps, noise_key=K(t))
        outs.append(np.asarray(out))
        assert eps.shape == (L, B, 16)
        assert np.isfinite(outs[-1]).all()
    assert not np.allclose(outs[0], outs[1])   # stochastic across steps


def test_rollout_bias_term():
    """w_bias adds a finite term and changes the eval loss."""
    tr0, data = _make_training_setup()
    tr1, _ = _make_training_setup()
    tr1.cfg.w_bias = 1.0
    params, opt, mem = tr0.init(K(0), next(iter(_chunks(data))))
    _, _, _, rec0 = tr0.run_epoch(params, opt, mem, _chunks(data), 0,
                                  train=False)
    _, _, _, rec1 = tr1.run_epoch(params, opt, mem, _chunks(data), 0,
                                  train=False)
    assert np.isfinite(rec1["loss"]) and rec1["loss"] != rec0["loss"]


def test_intermediate_mlp_auto():
    """nh_mem == nneur[-1]: the RNN output is the memory directly (no
    mlp_latent params), as the reference's auto-derived
    use_intermediate_mlp (models.py:249-252)."""
    hyam, hybm, _ = _grid_tuples()
    kw = dict(nx=10, nx_sfc=24, ny=6, ny_sfc=8, hyam=hyam, hybm=hybm,
              add_pres=False, output_prune=False)
    B, L = 2, 60
    rng = np.random.default_rng(0)
    xm = jnp.asarray(rng.normal(0, 1, (B, L, 10)).astype(np.float32))
    xs = jnp.asarray(rng.normal(0, 1, (B, 24)).astype(np.float32))
    m_eq = RNNAutoreg(nneur=(16, 16), nh_mem=16, **kw)
    p_eq = m_eq.init(K(0), xm, xs, jnp.zeros((B, L, 16)))
    assert "mlp_latent" not in p_eq["params"]
    out, osfc, nm = m_eq.apply(p_eq, xm, xs, jnp.zeros((B, L, 16)))
    assert nm.shape == (B, L, 16)
    m_ne = RNNAutoreg(nneur=(16, 16), nh_mem=8, **kw)
    p_ne = m_ne.init(K(0), xm, xs, jnp.zeros((B, L, 8)))
    assert "mlp_latent" in p_ne["params"]


def test_rollout_remat_matches_plain():
    """Gradient checkpointing over the window scan (cfg.remat) gives the
    same loss and (numerically) the same parameter updates — it only
    changes what the backward pass stores vs recomputes."""
    from climsim_tpu.grid import Grid
    g = Grid.from_file(GRID_PATH)
    results = {}
    for remat in (False, True):
        tr, data = _make_training_setup(w_energy=0.1)
        tr.cfg.remat = remat
        params, opt, mem = tr.init(K(0), next(iter(_chunks(data))))
        # epoch 1 -> window length 2 so the scan really spans steps
        params, opt, mem, rec = tr.run_epoch(params, opt, mem,
                                             _chunks(data), epoch=1)
        results[remat] = (rec["loss"], params)
    assert np.isclose(results[True][0], results[False][0], rtol=1e-6)
    flat_t = jax.tree_util.tree_leaves(results[True][1])
    flat_f = jax.tree_util.tree_leaves(results[False][1])
    for a, b in zip(flat_t, flat_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-7)


def test_crps_start_epoch_delays_probabilistic_loss():
    """crps_start_epoch: before it the ensemble trains deterministically
    on the member mean; at/after it the CRPS loss kicks in (reference
    autoreg_LSTM.yaml crps_start_epoch)."""
    g = Grid.from_file(GRID_PATH)
    rng = np.random.default_rng(0)
    T, B, L = 4, 8, 60
    x_lev = rng.normal(0, 1, (T, B, L, 15)).astype(np.float32)
    x_sfc = rng.normal(0, 1, (T, B, 24)).astype(np.float32)
    y_lev = np.tanh(x_lev[..., :6]) * 0.5
    y_sfc = np.abs(x_sfc[..., :8]) * 0.5
    sp = rng.uniform(9.6e4, 1.03e5, (T, B)).astype(np.float32)
    hyam = tuple(float(x) for x in np.asarray(g.hyam))
    hybm = tuple(float(x) for x in np.asarray(g.hybm))
    model = RNNAutoreg(nx=15, nx_sfc=24, ny=6, ny_sfc=8,
                       nneur=(16, 16, 16), nh_mem=4,
                       add_stochastic_layer=True, hyam=hyam, hybm=hybm,
                       add_pres=False, output_prune=False)

    def chunks():
        return keeplev_chunks(x_lev, x_sfc, y_lev, y_sfc, sp,
                              chunk_size=4, shuffle=False)

    ep0 = {}
    for start in (0, 2):
        cfg = RolloutConfig(rollout_schedule={0: 2}, lr=1e-3,
                            ensemble_size=3, crps_start_epoch=start)
        tr = RolloutTrainer(model, cfg, np.asarray(g.hyai),
                            np.asarray(g.hybi),
                            yscale_lev=jnp.ones((1, 1, 6)),
                            yscale_sca=jnp.ones(8))
        params, opt, mem = tr.init(K(0), next(iter(chunks())))
        params, opt, mem, rec = tr.run_epoch(params, opt, mem, chunks(), 0)
        ep0[start] = rec["loss"]
        assert np.isfinite(rec["loss"])
    # epoch 0: deterministic-mean loss != CRPS loss
    assert not np.isclose(ep0[0], ep0[2], rtol=1e-3), ep0


def test_timestepped_optimizer_rescales_lr():
    """timestepped_optimizer: the LR scales by the window ratio and the
    optimizer state resets when the curriculum lengthens the window
    (train_..._detref.py:599-615)."""
    tr, data = _make_training_setup()
    tr.cfg.timestepped_optimizer = True
    lr0 = tr.cfg.lr
    params, opt, mem = tr.init(K(0), next(iter(_chunks(data))))
    params, opt, mem, _ = tr.run_epoch(params, opt, mem, _chunks(data), 0)
    assert tr.cfg.lr == lr0                      # W unchanged (1)
    params, opt, mem, rec = tr.run_epoch(params, opt, mem, _chunks(data), 1)
    # schedule {0:1, 1:2}: window doubled -> lr doubled
    assert np.isclose(tr.cfg.lr, 2 * lr0)
    assert rec["window"] == 2 and np.isfinite(rec["loss"])


def test_memory_none_mode():
    """The reference's `memory: None` (driver :110-112): no latent memory
    in the inputs, output head reads the RNN stream, mem passes through
    untouched — the model is not autoregressive."""
    g = Grid.from_file(GRID_PATH)
    tt = lambda a: tuple(float(x) for x in np.asarray(a))
    model = RNNAutoreg(nx=15, nx_sfc=24, ny=6, ny_sfc=8, nneur=(16, 16),
                       nh_mem=8, use_memory=False, hyam=tt(g.hyam),
                       hybm=tt(g.hybm), add_pres=False, output_prune=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (4, 60, 15)).astype(np.float32))
    s = jnp.asarray(rng.normal(0, 1, (4, 24)).astype(np.float32))
    mem = jnp.asarray(rng.normal(0, 1, (4, 60, 8)).astype(np.float32))
    p = model.init(K(0), x, s, mem)
    out, osfc, nm = model.apply(p, x, s, mem)
    # memory untouched AND has no influence on the outputs
    np.testing.assert_array_equal(np.asarray(nm), np.asarray(mem))
    out2, _, _ = model.apply(p, x, s, mem * 100.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2))


def test_ar_noise_eps_carried_through_window_scan():
    """AR(1) noise threading (rnn/utils.py:940-959): stochastic ensemble
    training with ar_noise_rho carries eps across the window scan."""
    from climsim_tpu.data import keeplev_chunks
    g = Grid.from_file(GRID_PATH)
    tt = lambda a: tuple(float(x) for x in np.asarray(a))
    rng = np.random.default_rng(5)
    T, B = 4, 4
    x_lev = rng.normal(0, 1, (T, B, 60, 15)).astype(np.float32)
    x_sfc = rng.normal(0, 1, (T, B, 24)).astype(np.float32)
    y_lev = np.tanh(x_lev[..., :6]) * 0.5
    y_sfc = np.abs(x_sfc[..., :8]) * 0.5
    sp = rng.uniform(9.6e4, 1.03e5, (T, B)).astype(np.float32)
    model = RNNAutoreg(nx=15, nx_sfc=24, ny=6, ny_sfc=8, nneur=(12, 12),
                       nh_mem=4, add_stochastic_layer=True,
                       ar_noise_rho=0.5, ar_noise_vertical=False,
                       add_pres=False, output_prune=False)
    cfg = RolloutConfig(rollout_schedule={0: 2}, ensemble_size=2, lr=1e-3)
    tr = RolloutTrainer(model, cfg, np.asarray(g.hyai), np.asarray(g.hybi))
    chunks = lambda: keeplev_chunks(x_lev, x_sfc, y_lev, y_sfc, sp,
                                    chunk_size=4, shuffle=False)
    params, opt, mem = tr.init(K(0), next(iter(chunks())))
    params, opt, mem, rec = tr.run_epoch(params, opt, mem, chunks(), 0)
    assert np.isfinite(rec["loss"])
