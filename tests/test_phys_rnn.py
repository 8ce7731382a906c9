"""Physics-constrained RNN tests: positivity-by-construction, conservation
of the subgrid decomposition, precip storage semantics."""
import jax
import jax.numpy as jnp
import numpy as np

from climsim_tpu.grid import Grid
from climsim_tpu.models.phys_rnn import PhysicalRNNAutoreg

GRID_PATH = "/root/reference/grid_info/ClimSim_low-res_grid-info.nc"
K = jax.random.PRNGKey
YS_T, YS_QV, YS_QN, YS_PREC = 1e5, 1e8, 1e8, 1e7


def _setup(seed=0, **kw):
    g = Grid.from_file(GRID_PATH)
    tt = lambda a: tuple(float(x) for x in np.asarray(a))
    args = dict(nx=15, nx_sfc=24, ny=5, ny_sfc=8, nneur=(32, 32), nh_mem=8,
                nreg=6, hyai=tt(g.hyai), hybi=tt(g.hybi), hyam=tt(g.hyam),
                hybm=tt(g.hybm), sp_mean=9.8e4, sp_div=1.0,
                yscale_t=YS_T, yscale_qv=YS_QV, yscale_qn=YS_QN,
                yscale_precc=YS_PREC)
    args.update(kw)
    m = PhysicalRNNAutoreg(**args)
    B, L = 6, 60
    rng = np.random.default_rng(seed)
    xm = jnp.asarray(rng.normal(0, 1, (B, L, 15)).astype(np.float32))
    xs = jnp.asarray(rng.normal(0, 1, (B, 24)).astype(np.float32))
    mem = jnp.zeros((B, 50, args["nh_mem"] + 1))
    xd = np.zeros((B, L, 6), np.float32)
    xd[:, :, 0] = rng.uniform(200, 300, (B, L))
    xd[:, :, 2] = np.abs(rng.normal(0, 1e-5, (B, L)))
    xd[:, :, 3] = np.abs(rng.normal(0, 1e-5, (B, L)))
    xd[:, :, -1] = np.abs(rng.normal(1e-3, 3e-4, (B, L)))
    xd = jnp.asarray(xd)
    p = m.init(K(1), xm, xs, mem, xd)
    return m, p, xm, xs, mem, xd


def test_shapes_and_finiteness():
    m, p, xm, xs, mem, xd = _setup()
    out, osfc, nm, aux = m.apply(p, xm, xs, mem, xd)
    assert out.shape == (6, 60, 5)
    assert osfc.shape == (6, 8)
    assert nm.shape == (6, 50, 9)
    assert np.isfinite(np.asarray(out)).all()
    assert np.isfinite(np.asarray(osfc)).all()


def test_fused_trunk_runs_and_differentiates():
    """use_pallas=True swaps the trunk sweeps for the fused BiGRU layer
    (reference fallback off-TPU); forward finite, grads flow."""
    m, p, xm, xs, mem, xd = _setup(use_pallas=True)
    out, osfc, nm, aux = m.apply(p, xm, xs, mem, xd)
    assert out.shape == (6, 60, 5)
    assert np.isfinite(np.asarray(out)).all()
    assert "bigru_fused" in p["params"]

    def loss(p):
        out, osfc, nm, aux = m.apply(p, xm, xs, mem, xd)
        return jnp.mean(out ** 2) + jnp.mean(osfc ** 2)

    g = jax.grad(loss)(p)
    gn = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.sum(jnp.square(x))), g, 0.0)
    assert np.isfinite(gn) and gn > 0


def test_positivity_by_construction():
    """The ordered clamp chain guarantees qv/qn stay non-negative after one
    timestep (models_phys.py:535-559 semantics)."""
    m, p, xm, xs, mem, xd = _setup(seed=3)
    out, _, _, _ = m.apply(p, xm, xs, mem, xd)
    qn_new = (xd[:, 10:, 2] + xd[:, 10:, 3]) \
        + 1200 * out[:, 10:, 2] / YS_QN
    qv_new = xd[:, 10:, -1] + 1200 * out[:, 10:, 1] / YS_QV
    assert float(qn_new.min()) > -1e-8
    assert float(qv_new.min()) > -1e-8


def test_subgrid_decomposition_preserves_mean():
    m, p, xm, xs, mem, xd = _setup()
    _, _, _, aux = m.apply(p, xm, xs, mem, xd)
    af, qv_crm = aux["area_frac"], aux["qv_crm"]
    np.testing.assert_allclose(np.asarray(af.sum(-1)), 1.0, atol=1e-5)
    qv_mean = np.asarray(jnp.sum(af * qv_crm, -1))
    np.testing.assert_allclose(qv_mean, np.asarray(xd[:, 10:, -1]),
                               rtol=1e-4)


def test_precip_nonnegative_and_snow_split():
    m, p, xm, xs, mem, xd = _setup(seed=5)
    _, osfc, _, _ = m.apply(p, xm, xs, mem, xd)
    precsc, precc = np.asarray(osfc[:, 2]), np.asarray(osfc[:, 3])
    assert np.all(precc >= 0)
    assert np.all(precsc >= -1e-12)
    assert np.all(precsc <= precc + 1e-12)   # snow <= total


def test_precip_storage_carries_in_memory():
    """Stored water appears in the last memory slot and feeds the next
    step's release (models_phys.py:647-677, rnn_mem[-1] slot)."""
    m, p, xm, xs, mem, xd = _setup(seed=7)
    _, osfc1, nm1, aux1 = m.apply(p, xm, xs, mem, xd)
    stored = np.asarray(aux1["water_stored"])
    np.testing.assert_allclose(np.asarray(nm1[:, 0, -1]), stored, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(nm1[:, -1, -1]), stored, rtol=1e-6)
    # feeding the memory back changes precip
    _, osfc2, _, _ = m.apply(p, xm, xs, nm1, xd)
    if stored.max() > 0:
        assert not np.allclose(np.asarray(osfc1[:, 3]),
                               np.asarray(osfc2[:, 3]))


def test_no_store_precip_mode():
    m, p, xm, xs, mem, xd = _setup(store_precip=False)
    out, osfc, nm, aux = m.apply(p, xm, xs, mem, xd)
    assert np.all(np.asarray(osfc[:, 3]) >= 0)
    np.testing.assert_allclose(np.asarray(nm[..., -1]), 0.0, atol=1e-12)


def test_differentiable():
    m, p, xm, xs, mem, xd = _setup()
    g = jax.grad(lambda p: jnp.sum(jnp.square(
        m.apply(p, xm, xs, mem, xd)[0])))(p)
    assert all(np.isfinite(np.asarray(a)).all()
               for a in jax.tree_util.tree_leaves(g))


# ------------------------------------------------------------- radiation

def _rad_setup():
    from climsim_tpu.models.phys_rad import RadiationModule
    g = Grid.from_file(GRID_PATH)
    B, L = 4, 60
    rng = np.random.default_rng(11)
    sp = jnp.asarray(rng.uniform(9.6e4, 1.02e5, B).astype(np.float32))
    plev = np.asarray(g.interface_pressure(sp))
    play = np.asarray(g.mid_pressure(sp))
    T = jnp.asarray(np.linspace(220, 290, L)[None].repeat(B, 0)
                    .astype(np.float32))
    gases = {"o3": jnp.full((B, L), 2e-6), "ch4": jnp.full((B, L), 9e-7),
             "n2o": jnp.full((B, L), 5e-7)}
    clouds = {"lwp": jnp.asarray(np.abs(rng.normal(5, 3, (B, L)))
                                 .astype(np.float32)),
              "iwp": jnp.asarray(np.abs(rng.normal(3, 2, (B, L)))
                                 .astype(np.float32)),
              "landfrac": jnp.full((B,), 0.3),
              "icefrac": jnp.zeros((B,)), "snowh": jnp.zeros((B,))}
    sfc = {"coszrs": jnp.asarray(rng.uniform(0.1, 1.0, B).astype(np.float32)),
           "solin": jnp.asarray(rng.uniform(400, 1300, B).astype(np.float32)),
           "lwup": jnp.asarray((5.67e-8 * 290 ** 4)
                               * np.ones(B, np.float32)),
           "aldif": jnp.full((B,), 0.3), "aldir": jnp.full((B,), 0.3),
           "asdif": jnp.full((B,), 0.3), "asdir": jnp.full((B,), 0.3)}
    m = RadiationModule(ng_lw=8, ng_sw=8, hidden=(32, 32))
    p = m.init(K(0), T, jnp.asarray(play), jnp.asarray(plev), gases,
               clouds, sfc)
    return m, p, (T, jnp.asarray(play), jnp.asarray(plev), gases, clouds,
                  sfc)


def test_radiation_module_outputs():
    m, p, args = _rad_setup()
    heating, scalars = m.apply(p, *args)
    B, L = args[0].shape
    assert heating.shape == (B, L)
    assert np.isfinite(np.asarray(heating)).all()
    for k in ("NETSW", "FLWDS", "SOLS", "SOLL", "SOLSD", "SOLLD", "OLR"):
        v = np.asarray(scalars[k])
        assert v.shape == (B,) and np.isfinite(v).all(), k
    # physical sanity: downward LW at surface positive, OLR positive,
    # surface SW components non-negative and bounded by SOLIN
    assert np.all(np.asarray(scalars["FLWDS"]) > 0)
    assert np.all(np.asarray(scalars["OLR"]) > 0)
    sw_sum = sum(np.asarray(scalars[k]) for k in
                 ("SOLS", "SOLL", "SOLSD", "SOLLD"))
    assert np.all(sw_sum >= 0)
    assert np.all(sw_sum <= np.asarray(args[5]["solin"]) + 1e-3)


def test_radiation_module_differentiable():
    m, p, args = _rad_setup()

    def loss(p):
        heating, scalars = m.apply(p, *args)
        return jnp.sum(jnp.square(heating)) + jnp.sum(scalars["NETSW"])

    g = jax.grad(loss)(p)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(a)).all() for a in leaves)
    assert sum(float(jnp.abs(a).sum()) for a in leaves) > 0


def test_phys_rnn_rollout_training():
    """The physics-constrained emulator trains through the rollout engine
    via pass_x_raw (the reference drives it from the same epoch engine,
    rnn/utils.py:1130 inp_list with x_raw)."""
    from climsim_tpu.train.rollout import RolloutTrainer, RolloutConfig
    from climsim_tpu.data import keeplev_chunks
    g = Grid.from_file(GRID_PATH)
    tt = lambda a: tuple(float(x) for x in np.asarray(a))
    model = PhysicalRNNAutoreg(
        nx=15, nx_sfc=24, ny=5, ny_sfc=8, nneur=(16, 16), nh_mem=4,
        nreg=4, hyai=tt(g.hyai), hybi=tt(g.hybi), hyam=tt(g.hyam),
        hybm=tt(g.hybm), sp_mean=9.8e4, sp_div=1.0,
        yscale_t=YS_T, yscale_qv=YS_QV, yscale_qn=YS_QN,
        yscale_precc=YS_PREC)
    rng = np.random.default_rng(0)
    T, B, L = 4, 8, 60
    x_lev = rng.normal(0, 1, (T, B, L, 15)).astype(np.float32)
    x_sfc = rng.normal(0, 1, (T, B, 24)).astype(np.float32)
    y_lev = (np.tanh(x_lev[..., :5]) * 0.1).astype(np.float32)
    y_sfc = np.abs(x_sfc[..., :8]).astype(np.float32) * 0.1
    sp = rng.uniform(9.6e4, 1.03e5, (T, B)).astype(np.float32)
    x_raw = np.zeros((T, B, L, 6), np.float32)
    x_raw[..., 0] = rng.uniform(220, 300, (T, B, L))
    x_raw[..., 2] = np.abs(rng.normal(0, 1e-5, (T, B, L)))
    x_raw[..., 3] = np.abs(rng.normal(0, 1e-5, (T, B, L)))
    x_raw[..., -1] = np.abs(rng.normal(1e-3, 3e-4, (T, B, L)))

    cfg = RolloutConfig(rollout_schedule={0: 2}, lr=1e-3, pass_x_raw=True)
    tr = RolloutTrainer(
        model, cfg, np.asarray(g.hyai), np.asarray(g.hybi),
        yscale_lev=jnp.ones((1, 1, 5)), yscale_sca=jnp.ones(8),
        apply_fn=lambda p, xl, xs, m, xr: model.apply(p, xl, xs, m, xr)[:3])

    def chunks():
        for i, c in enumerate(keeplev_chunks(x_lev, x_sfc, y_lev, y_sfc,
                                             sp, chunk_size=4,
                                             shuffle=False)):
            c["x_lev_raw"] = x_raw[i * 4:(i + 1) * 4]
            yield c

    # physics model memory carries the precip slot: nh_mem+1
    first = next(iter(chunks()))
    mem = jnp.zeros((B, 50, 5), jnp.float32)
    params = model.init(K(0), jnp.asarray(first["x_lev"][0]),
                        jnp.asarray(first["x_sfc"][0]), mem,
                        jnp.asarray(first["x_lev_raw"][0]))
    opt = tr.tx.init(params)
    losses = []
    for ep in range(2):
        params, opt, mem, rec = tr.run_epoch(params, opt, mem, chunks(), ep)
        losses.append(rec["loss"])
        assert np.isfinite(rec["loss"])
    assert losses[1] < losses[0]


def test_physrad_integration():
    """use_physrad: radiation heating added on all 60 levels, the 6
    radiative surface scalars predicted physically (FLWDS/OLR positive),
    gradients flow through solvers + gas-optics MLPs."""
    m, p, xm, xs, mem, xd = _setup(use_physrad=True, ng_lw=4, ng_sw=4,
                                   nreg=4)
    out, osfc, nm, aux = m.apply(p, xm, xs, mem, xd)
    assert np.isfinite(np.asarray(out)).all()
    assert np.isfinite(np.asarray(osfc)).all()
    # FLWDS physically positive; NETSW non-negative
    assert np.all(np.asarray(osfc[:, 1]) > 0)
    assert np.all(np.asarray(osfc[:, 0]) >= 0)
    # heating reaches the top 10 (non-CRM) levels through radiation
    assert float(jnp.abs(out[:, :10, 0]).max()) > 0
    g = jax.grad(lambda p: jnp.sum(jnp.square(
        m.apply(p, xm, xs, mem, xd)[1])))(p)
    rad_grads = sum(float(jnp.abs(a).sum()) for kp, a in
                    jax.tree_util.tree_flatten_with_path(g)[0]
                    if "radiation" in jax.tree_util.keystr(kp))
    assert np.isfinite(rad_grads) and rad_grads > 0


def test_physrad_mcica():
    """use_mcica: per-g-point subgrid-sampled cloud paths flow through
    radiation; forward finite, grads flow, and the sampled paths differ
    from the grid-mean path (subgrid variability visible to radiation)."""
    m, p, xm, xs, mem, xd = _setup(use_physrad=True, use_mcica=True,
                                   ng_lw=4, ng_sw=4, nreg=4)
    out, osfc, nm, aux = m.apply(p, xm, xs, mem, xd)
    assert np.isfinite(np.asarray(out)).all()
    assert np.isfinite(np.asarray(osfc)).all()
    assert np.all(np.asarray(osfc[:, 1]) > 0)
    g = jax.grad(lambda p: jnp.sum(jnp.square(
        m.apply(p, xm, xs, mem, xd)[1])))(p)
    rad_grads = sum(float(jnp.abs(a).sum()) for kp, a in
                    jax.tree_util.tree_flatten_with_path(g)[0]
                    if "radiation" in jax.tree_util.keystr(kp))
    assert np.isfinite(rad_grads) and rad_grads > 0
    # mcica output differs from the grid-mean-cloud variant
    m2, *_ = _setup(use_physrad=True, use_mcica=False, ng_lw=4, ng_sw=4,
                    nreg=4)
    out2, osfc2, *_ = m2.apply(p, xm, xs, mem, xd)
    assert not np.allclose(np.asarray(osfc), np.asarray(osfc2))


def test_physrad_tripleclouds():
    """use_tc: region-resolved SW with overlap-matrix mixing runs forward
    + backward; fluxes finite; TC output differs from grid-mean clouds;
    the overlap-predictor parameters receive gradient."""
    m, p, xm, xs, mem, xd = _setup(use_physrad=True, use_tc=True,
                                   ng_lw=4, ng_sw=4, nreg=3)
    out, osfc, nm, aux = m.apply(p, xm, xs, mem, xd)
    assert np.isfinite(np.asarray(out)).all()
    assert np.isfinite(np.asarray(osfc)).all()
    assert np.all(np.asarray(osfc[:, 0]) >= 0)   # NETSW
    g = jax.grad(lambda p: jnp.sum(jnp.square(
        m.apply(p, xm, xs, mem, xd)[1])))(p)
    ov_grads = sum(float(jnp.abs(a).sum()) for kp, a in
                   jax.tree_util.tree_flatten_with_path(g)[0]
                   if "mlp_overlap" in jax.tree_util.keystr(kp))
    assert np.isfinite(ov_grads) and ov_grads > 0
    m2, *_ = _setup(use_physrad=True, use_tc=False, ng_lw=4, ng_sw=4,
                    nreg=3)
    p2 = {"params": {k: v for k, v in p["params"].items()
                     if k != "mlp_overlap"}}
    out2, osfc2, *_ = m2.apply(p2, xm, xs, mem, xd)
    assert not np.allclose(np.asarray(osfc), np.asarray(osfc2))


def test_physrad_qv_variability():
    """use_qv_variability: two-pass SW gas optics on top-2 subgrid vapor
    states; finite fwd/bwd; differs from the single-pass model with the
    same params; random per-g-point merge differs from the 50/50 mean
    when a qvvar rng is supplied."""
    m, p, xm, xs, mem, xd = _setup(use_physrad=True,
                                   use_qv_variability=True,
                                   ng_lw=4, ng_sw=4, nreg=4)
    out, osfc, nm, aux = m.apply(p, xm, xs, mem, xd)
    assert np.isfinite(np.asarray(out)).all()
    assert np.isfinite(np.asarray(osfc)).all()
    m2, *_ = _setup(use_physrad=True, use_qv_variability=False,
                    ng_lw=4, ng_sw=4, nreg=4)
    out2, osfc2, *_ = m2.apply(p, xm, xs, mem, xd)
    assert not np.allclose(np.asarray(osfc), np.asarray(osfc2))
    # stochastic merge path
    outr, osfcr, *_ = m.apply(p, xm, xs, mem, xd,
                              rngs={"qvvar": K(3)})
    assert np.isfinite(np.asarray(osfcr)).all()
    assert not np.allclose(np.asarray(osfcr), np.asarray(osfc))
    g = jax.grad(lambda p: jnp.sum(jnp.square(
        m.apply(p, xm, xs, mem, xd)[1])))(p)
    assert all(np.isfinite(np.asarray(a)).all()
               for a in jax.tree_util.tree_leaves(g))


def test_physrad_learned_cloud_optics():
    """learned_cloud_optics: MLP cloud optics replace the E3SM tables;
    finite fwd/bwd; cld_sw/cld_lw parameters exist and receive gradient;
    output differs from the table-based model."""
    m, p, xm, xs, mem, xd = _setup(use_physrad=True,
                                   learned_cloud_optics=True,
                                   ng_lw=4, ng_sw=4, nreg=4)
    out, osfc, nm, aux = m.apply(p, xm, xs, mem, xd)
    assert np.isfinite(np.asarray(out)).all()
    assert np.isfinite(np.asarray(osfc)).all()
    rad_p = p["params"]["radiation"]
    assert "cld_sw1" in rad_p and "cld_sw2" in rad_p and "cld_lw" in rad_p
    g = jax.grad(lambda p: jnp.sum(jnp.square(
        m.apply(p, xm, xs, mem, xd)[1])))(p)
    cld_g = sum(float(jnp.abs(a).sum()) for kp, a in
                jax.tree_util.tree_flatten_with_path(g)[0]
                if "cld_" in jax.tree_util.keystr(kp))
    assert np.isfinite(cld_g) and cld_g > 0


def test_pred_subgrid_liq_frac():
    """MLP-predicted subgrid liquid fraction feeds the radiation cloud
    split; params exist, grads flow, output differs from T-diagnosed."""
    m, p, xm, xs, mem, xd = _setup(use_physrad=True,
                                   pred_subgrid_liq_frac=True,
                                   ng_lw=4, ng_sw=4, nreg=4)
    out, osfc, nm, aux = m.apply(p, xm, xs, mem, xd)
    assert np.isfinite(np.asarray(osfc)).all()
    lf = np.asarray(aux["liq_frac_crm"])
    assert lf.shape[-1] == 4 and np.all((lf >= 0) & (lf <= 1))
    assert "mlp_liq_frac_crm" in p["params"]
    g = jax.grad(lambda p: jnp.sum(jnp.square(
        m.apply(p, xm, xs, mem, xd)[1])))(p)
    lf_g = sum(float(jnp.abs(a).sum()) for kp, a in
               jax.tree_util.tree_flatten_with_path(g)[0]
               if "mlp_liq_frac_crm" in jax.tree_util.keystr(kp))
    assert np.isfinite(lf_g) and lf_g > 0


def test_radiation_map_bands():
    """map_bands: trainable PositiveLinear band expansion initialized to
    the static RRTMGP band allocation — heating matches the table path at
    init, and the expansion kernel receives gradient."""
    from climsim_tpu.models.phys_rad import RadiationModule
    rng = np.random.default_rng(0)
    B, L = 4, 60
    T = jnp.asarray(rng.uniform(200, 300, (B, L)).astype(np.float32))
    play = jnp.asarray(np.tile(np.linspace(1e3, 1e5, L), (B, 1))
                       .astype(np.float32))
    plev = jnp.asarray(np.tile(np.linspace(9e2, 1.01e5, L + 1), (B, 1))
                       .astype(np.float32))
    gases = {k: jnp.full((B, L), v) for k, v in
             (("o3", 2e-6), ("ch4", 9.7e-7), ("n2o", 4.8e-7))}
    clouds = {"lwp": jnp.asarray(np.abs(rng.normal(5, 3, (B, L)))
                                 .astype(np.float32)),
              "iwp": jnp.asarray(np.abs(rng.normal(5, 3, (B, L)))
                                 .astype(np.float32)),
              "landfrac": jnp.zeros(B), "icefrac": jnp.zeros(B),
              "snowh": jnp.zeros(B)}
    sfc = {"coszrs": jnp.full(B, 0.7), "solin": jnp.full(B, 1000.0),
           "lwup": jnp.full(B, 390.0), "aldif": jnp.full(B, 0.2),
           "aldir": jnp.full(B, 0.2), "asdif": jnp.full(B, 0.2),
           "asdir": jnp.full(B, 0.2)}
    m0 = RadiationModule(ng_lw=4, ng_sw=8)
    m1 = RadiationModule(ng_lw=4, ng_sw=8, map_bands=True)
    p1 = m1.init(K(0), T, play, plev, gases, clouds, sfc)
    h1, _ = m1.apply(p1, T, play, plev, gases, clouds, sfc)
    p0 = {"params": {k: v for k, v in p1["params"].items()
                     if not k.startswith("band_expand")}}
    h0, _ = m0.apply(p0, T, play, plev, gases, clouds, sfc)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h0),
                               rtol=1e-4, atol=1e-8)
    g = jax.grad(lambda p: jnp.sum(jnp.square(
        m1.apply(p, T, play, plev, gases, clouds, sfc)[0])))(p1)
    gk = np.asarray(g["params"]["band_expand_kernel"])
    assert np.isfinite(gk).all() and np.abs(gk).sum() > 0


def test_update_states_for_rad_teacher_forcing():
    """y_true teacher-forces the radiation state update (the reference's
    update_states_for_rad + out_new_true, models_phys.py:1722-1741):
    passing different true tendencies must change the radiative heating,
    and update_states_for_rad=False must ignore the model tendencies."""
    import jax.numpy as jnp

    m, p, xm, xs, mem, xd = _setup(use_physrad=True, ng_lw=4, ng_sw=4,
                                   nreg=4)
    out0, osfc0, _, _ = m.apply(p, xm, xs, mem, xd)
    yt = jnp.zeros(out0.shape, out0.dtype)
    out_t0, _, _, _ = m.apply(p, xm, xs, mem, xd, yt)
    yt_warm = yt.at[:, :, 0].set(5.0)       # large true heating tendency
    out_t1, _, _, _ = m.apply(p, xm, xs, mem, xd, yt_warm)
    # different forced states -> different radiative heating in the
    # non-CRM levels (which only radiation touches)
    assert not np.allclose(np.asarray(out_t0[:, :10, 0]),
                           np.asarray(out_t1[:, :10, 0]))

    m_off = m.clone(update_states_for_rad=False)
    a, _, _, _ = m_off.apply(p, xm, xs, mem, xd)
    b, _, _, _ = m_off.apply(p, xm, xs, mem, xd, yt_warm)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_nonphysrad_ml_radiation_emulation():
    """Without physical radiation the reference still predicts radiative
    heating on ALL 60 levels (mlp_output_rad over the 60-level trunk) and
    ReLU'd radiation scalars (models_phys.py:1585-1599,1664-1690): the
    top-10 non-CRM levels must get non-zero heating, and the non-precip
    surface scalars must be non-negative."""
    m, p, xm, xs, mem, xd = _setup()          # use_physrad=False default
    out, osfc, nm, aux = m.apply(p, xm, xs, mem, xd)
    assert float(jnp.abs(out[:, :10, 0]).max()) > 0, \
        "non-CRM levels must receive ML radiative heating"
    # radiation scalars around the precip pair are ReLU'd
    o = np.asarray(osfc)
    assert np.all(o[:, 0:2] >= 0) and np.all(o[:, 4:] >= 0)
    # non-heating tendencies still zero above the CRM
    assert float(jnp.abs(out[:, :10, 1:3]).max()) == 0.0


def test_separate_radiation_phys_model():
    """separate_radiation (models_phys.py:1665-1690): CRM trunk on 50
    levels, a radiation BiGRU on gases + padded latent produces heating on
    all 60 levels and ReLU'd radiation scalars."""
    m, p, xm, xs, mem, xd = _setup(separate_radiation=True)
    out, osfc, nm, aux = m.apply(p, xm, xs, mem, xd)
    assert out.shape[1] == 60
    assert float(jnp.abs(out[:, :10, 0]).max()) > 0
    o = np.asarray(osfc)
    assert np.all(o[:, 0:2] >= 0) and np.all(o[:, 4:] >= 0)
    assert np.isfinite(np.asarray(out)).all()
    # grads flow through the radiation RNN
    g = jax.grad(lambda q: jnp.sum(jnp.square(
        m.apply(q, xm, xs, mem, xd)[0][:, :10, 0])))(p)
    rad = sum(float(jnp.abs(a).sum()) for kp, a in
              jax.tree_util.tree_flatten_with_path(g)[0]
              if "rnn1_rad" in jax.tree_util.keystr(kp)
              or "rnn2_rad" in jax.tree_util.keystr(kp))
    assert rad > 0
