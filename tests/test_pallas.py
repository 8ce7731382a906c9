"""Pallas kernel tests (interpret mode on CPU): fused BiGRU vs the scan
reference, forward + gradients."""
import jax
import jax.numpy as jnp
import numpy as np

from climsim_tpu.ops.pallas_rnn import fused_bigru, _bigru_reference

K = jax.random.PRNGKey


def _make(B=16, L=60, H=32, dtype=jnp.float32, seed=0):
    ks = jax.random.split(K(seed), 9)
    s = 0.3
    return (jax.random.normal(ks[0], (B, L, 3 * H), dtype) * s,
            jax.random.normal(ks[1], (B, H), dtype) * s,
            jax.random.normal(ks[2], (B, H), dtype) * s,
            jax.random.normal(ks[3], (H, 3 * H), dtype) * s,
            jax.random.normal(ks[4], (3 * H,), dtype) * s,
            jax.random.normal(ks[5], (H, 3 * H), dtype) * s,
            jax.random.normal(ks[6], (3 * H,), dtype) * s,
            jax.random.normal(ks[7], (H, 3 * H), dtype) * s,
            jax.random.normal(ks[8], (3 * H,), dtype) * s)


def test_fused_bigru_matches_reference():
    args = _make()
    down_k, last_k = fused_bigru(*args, 8, True)   # interpret mode
    down_r, last_r = _bigru_reference(*args)
    np.testing.assert_allclose(np.asarray(down_k), np.asarray(down_r),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(last_k), np.asarray(last_r),
                               rtol=2e-5, atol=1e-6)


def test_fused_bigru_ragged_batch():
    # B not divisible by block_b: last tile padded by pallas
    args = _make(B=20)
    down_k, last_k = fused_bigru(*args, 8, True)
    down_r, last_r = _bigru_reference(*args)
    np.testing.assert_allclose(np.asarray(down_k), np.asarray(down_r),
                               rtol=2e-5, atol=1e-6)


def test_fused_bigru_bf16():
    """bf16 storage path (the serving dtype): kernel == reference in the
    same dtype regime (f32 carried hidden, bf16 matmul inputs)."""
    args = _make(B=16, dtype=jnp.bfloat16)
    down_k, last_k = fused_bigru(*args, 8, True)
    down_r, last_r = _bigru_reference(*args)
    assert down_k.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(down_k, np.float32),
                               np.asarray(down_r, np.float32),
                               rtol=0.05, atol=0.02)
    np.testing.assert_allclose(np.asarray(last_k, np.float32),
                               np.asarray(last_r, np.float32),
                               rtol=0.05, atol=0.02)


def test_fused_bigru_bf16_gates():
    """acc32=False (bf16 gate arithmetic, the serving fast path) stays
    close to the f32-gate kernel."""
    from climsim_tpu.ops.pallas_rnn import fused_bigru_lbh
    args = _make(B=16, dtype=jnp.bfloat16)
    xp = jnp.swapaxes(args[0], 0, 1)
    down_f, last_f = fused_bigru_lbh(xp, *args[1:], 8, True, True)
    down_h, last_h = fused_bigru_lbh(xp, *args[1:], 8, True, False)
    np.testing.assert_allclose(np.asarray(down_h, np.float32),
                               np.asarray(down_f, np.float32),
                               rtol=0.1, atol=0.05)
    np.testing.assert_allclose(np.asarray(last_h, np.float32),
                               np.asarray(last_f, np.float32),
                               rtol=0.1, atol=0.05)


def test_fused_layer_fallback_matches_scan_path():
    """RNNAutoreg(use_pallas=True) falls back to the lbh reference off-TPU
    and must agree with the plain scan path's BiGRU math given the same
    weights (structure differs, so compare the layer directly)."""
    from climsim_tpu.models.cells import FusedBiGRULayer
    B, L, nx, H = 4, 60, 24, 32
    ks = jax.random.split(K(3), 3)
    x = jax.random.normal(ks[0], (B, L, nx)) * 0.3
    h0u = jax.random.normal(ks[1], (B, H)) * 0.3
    h0d = jax.random.normal(ks[2], (B, H)) * 0.3
    layer = FusedBiGRULayer(H)
    p = layer.init(K(4), x, h0u, h0d)
    down, lasth = layer.apply(p, x, h0u, h0d)
    w = p["params"]
    xp = jnp.einsum("blx,xh->blh", x, w["win1"]) + w["bin1"]
    down_r, last_r = _bigru_reference(
        xp, h0u, h0d, w["whh_up"], w["bhh_up"], w["win2"], w["bin2"],
        w["whh_dn"], w["bhh_dn"])
    np.testing.assert_allclose(np.asarray(down), np.asarray(down_r),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(lasth), np.asarray(last_r),
                               rtol=2e-5, atol=1e-6)


def test_fused_bigru_gradients():
    args = _make(B=8, H=16)

    def loss_k(*a):
        d, l = fused_bigru(*a, 8, True)
        return jnp.sum(jnp.square(d)) + jnp.sum(l)

    def loss_r(*a):
        d, l = _bigru_reference(*a)
        return jnp.sum(jnp.square(d)) + jnp.sum(l)

    gk = jax.grad(loss_k, argnums=tuple(range(9)))(*args)
    gr = jax.grad(loss_r, argnums=tuple(range(9)))(*args)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_fused_bigru_gradients_ragged_batch():
    """Backward kernel with a ragged last tile: the weight-grad reductions
    must mask the padding rows (B=20 with 8-row tiles -> 4 valid rows in
    the last tile)."""
    args = _make(B=20, H=16)

    def loss_k(*a):
        d, l = fused_bigru(*a, 8, True)
        return jnp.sum(jnp.square(d)) + jnp.sum(l * l)

    def loss_r(*a):
        d, l = _bigru_reference(*a)
        return jnp.sum(jnp.square(d)) + jnp.sum(l * l)

    gk = jax.grad(loss_k, argnums=tuple(range(9)))(*args)
    gr = jax.grad(loss_r, argnums=tuple(range(9)))(*args)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_fv_stencil_kernel_matches_reference():
    """Pallas FV kernel (interpret mode) == the jnp fv_advect_2d per level,
    incl. mass conservation."""
    from climsim_tpu.ops.pallas_stencil import fv_advect_levels
    from climsim_tpu.online.advection import fv_advect_2d
    rng = np.random.default_rng(0)
    nlev, nlat, nlon = 5, 16, 24
    q = jnp.asarray(np.abs(rng.normal(1, 0.3, (nlev, nlat, nlon))))
    u = jnp.asarray(rng.normal(0, 0.3, (nlev, nlat, nlon)))
    v = jnp.asarray(rng.normal(0, 0.3, (nlev, nlat, nlon)))
    got = fv_advect_levels(q, u, v, 0.4, 0.4, interpret=True)
    exp = jax.vmap(lambda a, b, c: fv_advect_2d(a, b, c, 0.4, 0.4))(q, u, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp),
                               rtol=1e-6, atol=1e-8)
    # advective form: approximate conservation under compressible winds
    # (see online/advection.py docstring) + exact constancy preservation
    np.testing.assert_allclose(np.asarray(got.sum((1, 2))),
                               np.asarray(q.sum((1, 2))), rtol=0.02)
    qc = jnp.full_like(q, 1.9)
    gc = fv_advect_levels(qc, u, v, 0.4, 0.4, interpret=True)
    np.testing.assert_allclose(np.asarray(gc), 1.9, rtol=1e-6)


def test_pallas_adding_sw_parity():
    """Fused VMEM SW adding kernel == the scan solver (interpret mode)."""
    from climsim_tpu.physics import radiation as R
    from climsim_tpu.ops import pallas_radiation as PR

    rng = np.random.default_rng(0)
    B, L, ng = 256, 30, 8
    mu0 = rng.uniform(0.2, 1.0, (B, 1, 1))
    od = rng.uniform(0.01, 2.0, (B, L, ng))
    ssa = rng.uniform(0.3, 0.999, (B, L, ng))
    g = rng.uniform(0.0, 0.8, (B, L, ng))
    rd, td, rdir, tdd, tdir = R.calc_ref_trans_sw(mu0, od, ssa, g)
    toa = jnp.asarray(rng.uniform(100, 1300, (B, ng)))
    ad = jnp.asarray(rng.uniform(0.05, 0.8, (B, ng)))
    adir = jnp.asarray(rng.uniform(0.05, 0.8, (B, ng)))
    ref = R.adding_sw(toa, ad, adir, rd, td, rdir, tdd, tdir)
    got = PR.adding_sw_fused(toa, ad, adir, rd, td, rdir, tdd, tdir,
                             block_b=128, interpret=True)
    for a, b, name in zip(got, ref, ("fup", "fdiff", "fdir")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-8, err_msg=name)


def test_pallas_lw_noscat_parity():
    """Fused VMEM LW no-scattering kernel == the scan solver."""
    from climsim_tpu.physics import radiation as R
    from climsim_tpu.ops import pallas_radiation as PR

    rng = np.random.default_rng(1)
    B, L, ng = 200, 25, 4
    pt = np.abs(rng.normal(50, 10, (B, L, ng))).astype(np.float32)
    pb = np.abs(rng.normal(50, 10, (B, L, ng))).astype(np.float32)
    od = np.abs(rng.normal(0.3, 0.1, (B, L, ng))).astype(np.float32)
    sup, sdn, trans = R.reftrans_lw(jnp.asarray(pt), jnp.asarray(pb),
                                    jnp.asarray(od))
    sfc = jnp.asarray(np.abs(rng.normal(400, 20, (B, ng)))
                      .astype(np.float32))
    emis = jnp.asarray(rng.uniform(0.9, 1.0, (B, ng)).astype(np.float32))
    fdn_r, fup_r = R.lw_solver_noscat(trans, sdn, sup, sfc, emis)
    fdn_g, fup_g = PR.lw_solver_noscat_fused(trans, sdn, sup, sfc, emis,
                                             block_b=128, interpret=True)
    np.testing.assert_allclose(np.asarray(fdn_g), np.asarray(fdn_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fup_g), np.asarray(fup_r),
                               rtol=1e-5, atol=1e-5)


def test_pallas_adding_sw_backward_kernel():
    """Hand-written SW adding backward kernel (interpret) == the scan
    solver's VJP for all eight inputs."""
    from climsim_tpu.physics import radiation as R
    from climsim_tpu.ops.pallas_radiation import adding_sw_bwd_fused

    rng = np.random.default_rng(3)
    B, L, ng = 24, 20, 4
    mu0 = rng.uniform(0.2, 1.0, (B, 1, 1))
    od = jnp.asarray(rng.uniform(0.01, 2.0, (B, L, ng)))
    ssa = rng.uniform(0.3, 0.999, (B, L, ng))
    g = rng.uniform(0.0, 0.8, (B, L, ng))
    rd, td, rdir, tdd, tdir = R.calc_ref_trans_sw(mu0, od, ssa, g)
    args = (jnp.asarray(rng.uniform(100, 1300, (B, ng))),
            jnp.asarray(rng.uniform(0.05, 0.8, (B, ng))),
            jnp.asarray(rng.uniform(0.05, 0.8, (B, ng))),
            rd, td, rdir, tdd, tdir)
    cts = tuple(jnp.asarray(rng.normal(0, 1, (B, L + 1, ng)))
                for _ in range(3))
    got = adding_sw_bwd_fused(args, cts, block_b=16, interpret=True)
    _, vjp = jax.vjp(R.adding_sw, *args)
    exp = vjp(cts)
    names = "toa ad adir R T rd tdd tdir".split()
    for nm, a, b in zip(names, got, exp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7, err_msg=nm)


def test_pallas_lw_backward_kernel():
    """Hand-written LW no-scat backward kernel (interpret) == scan VJP."""
    from climsim_tpu.physics import radiation as R
    from climsim_tpu.ops.pallas_radiation import lw_solver_noscat_bwd_fused

    rng = np.random.default_rng(4)
    B, L, ng = 20, 15, 3
    args = (jnp.asarray(rng.uniform(0.3, 0.99, (B, L, ng))),
            jnp.asarray(np.abs(rng.normal(10, 3, (B, L, ng)))),
            jnp.asarray(np.abs(rng.normal(10, 3, (B, L, ng)))),
            jnp.asarray(np.abs(rng.normal(400, 20, (B, ng)))),
            jnp.asarray(rng.uniform(0.9, 1.0, (B, ng))))
    cts = (jnp.asarray(rng.normal(0, 1, (B, L + 1, ng))),
           jnp.asarray(rng.normal(0, 1, (B, L + 1, ng))))
    got = lw_solver_noscat_bwd_fused(args, cts, block_b=8, interpret=True)
    _, vjp = jax.vjp(R.lw_solver_noscat, *args)
    exp = vjp(cts)
    names = "trans sdn sup ssfc emis".split()
    for nm, a, b in zip(names, got, exp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7, err_msg=nm)


def test_fast_solvers_differentiable():
    """The custom-VJP fast solvers fall back to the scan primal off-TPU
    and differentiate through the scan VJP; grads match direct scan
    grads."""
    from climsim_tpu.physics import radiation as R
    from climsim_tpu.ops.pallas_radiation import (adding_sw_fast,
                                                  lw_solver_noscat_fast)

    rng = np.random.default_rng(2)
    B, L, ng = 16, 12, 4
    mu0 = rng.uniform(0.2, 1.0, (B, 1, 1))
    od = jnp.asarray(rng.uniform(0.01, 2.0, (B, L, ng)))
    ssa = rng.uniform(0.3, 0.999, (B, L, ng))
    g = rng.uniform(0.0, 0.8, (B, L, ng))
    toa = jnp.asarray(rng.uniform(100, 1300, (B, ng)))
    ad = jnp.asarray(rng.uniform(0.05, 0.8, (B, ng)))

    def loss(od, fn):
        rd, td, rdir, tdd, tdir = R.calc_ref_trans_sw(mu0, od, ssa, g)
        fup, fdiff, fdir = fn(toa, ad, ad, rd, td, rdir, tdd, tdir)
        return jnp.sum(fup ** 2) + jnp.sum(fdiff[:, -1] ** 2)

    g_fast = jax.grad(lambda o: loss(o, adding_sw_fast))(od)
    g_scan = jax.grad(lambda o: loss(o, R.adding_sw))(od)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_scan),
                               rtol=1e-5, atol=1e-8)

    trans = jnp.asarray(rng.uniform(0.3, 0.99, (B, L, ng)))
    sdn = jnp.asarray(np.abs(rng.normal(10, 3, (B, L, ng))))
    sup = jnp.asarray(np.abs(rng.normal(10, 3, (B, L, ng))))
    sfc = jnp.asarray(np.abs(rng.normal(400, 20, (B, ng))))
    emis = jnp.ones((B, ng))

    def lloss(t, fn):
        fdn, fup = fn(t, sdn, sup, sfc, emis)
        return jnp.sum(fdn ** 2) + jnp.sum(fup[:, 0] ** 2)

    gl_fast = jax.grad(lambda t: lloss(t, lw_solver_noscat_fast))(trans)
    gl_scan = jax.grad(lambda t: lloss(t, R.lw_solver_noscat))(trans)
    np.testing.assert_allclose(np.asarray(gl_fast), np.asarray(gl_scan),
                               rtol=1e-5, atol=1e-8)


def test_fv_tracers_kernel_matches_per_field():
    """Fused multi-tracer FV kernel (interpret mode) == vmapped per-field
    reference, and its custom-vjp gradients == reference gradients."""
    from climsim_tpu.ops.pallas_stencil import (
        _fv_advect_tracers_fwd_impl, _fv_reference, fv_advect_tracers)
    rng = np.random.default_rng(1)
    ntrac, nlev, nlat, nlon = 4, 3, 16, 24
    qs = jnp.asarray(np.abs(rng.normal(1, 0.3, (ntrac, nlev, nlat, nlon))))
    u = jnp.asarray(rng.normal(0, 0.3, (nlev, nlat, nlon)))
    v = jnp.asarray(rng.normal(0, 0.3, (nlev, nlat, nlon)))
    got = _fv_advect_tracers_fwd_impl(qs, u, v, 0.4, 0.4, True)
    exp = _fv_reference(qs, u, v, 0.4, 0.4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp),
                               rtol=1e-6, atol=1e-8)
    # advective form: approximate conservation per (tracer, level) under
    # compressible winds + exact constancy preservation
    np.testing.assert_allclose(np.asarray(got.sum((2, 3))),
                               np.asarray(qs.sum((2, 3))), rtol=0.02)
    qcst = jnp.full_like(qs, 0.7)
    gcst = _fv_advect_tracers_fwd_impl(qcst, u, v, 0.4, 0.4, True)
    np.testing.assert_allclose(np.asarray(gcst), 0.7, rtol=1e-6)
    # gradient flows through the custom_vjp (backward = jnp reference VJP)
    loss = lambda a, b, c: jnp.sum(fv_advect_tracers(a, b, c, 0.4, 0.4) ** 2)
    ref_loss = lambda a, b, c: jnp.sum(_fv_reference(a, b, c, 0.4, 0.4) ** 2)
    g = jax.grad(loss, argnums=(0, 1, 2))(qs, u, v)
    ge = jax.grad(ref_loss, argnums=(0, 1, 2))(qs, u, v)
    for a, b in zip(g, ge):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-8)


def _make_heads(B=16, L=60, nx=26, H=32, nm=8, ny=6, dtype=jnp.float32,
                seed=3):
    ks = jax.random.split(K(seed), 15)
    s = 0.25
    shp = [(L, B, nx), (B, H), (B, H), (nx, 3 * H), (3 * H,),
           (H, 3 * H), (3 * H,), (H, 3 * H), (3 * H,), (H, 3 * H),
           (3 * H,), (H, nm), (nm,), (nm, ny), (ny,)]
    return tuple(jax.random.normal(k, sh, dtype) * s
                 for k, sh in zip(ks, shp))


def test_fused_bigru_heads_matches_compose():
    """v3 (in-kernel input projection + latent/output heads, interpret
    mode) == the einsum + scan-reference composition, incl. a ragged
    batch exercising the pad path."""
    from climsim_tpu.ops.pallas_rnn import (_bigru_heads_pallas_lbh,
                                            _heads_compose)
    for B in (16, 20):
        args = _make_heads(B=B)
        got = _bigru_heads_pallas_lbh(*args, 8, True, True)
        ref = _heads_compose(*args, None, False, True, False)
        for g, r, nm_ in zip(got, ref, ("out", "mem", "lasth")):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=2e-5, atol=2e-6,
                                       err_msg=f"B={B} {nm_}")


def test_fused_bigru_heads_grad():
    """custom_vjp of v3 (compose backward) == autodiff of the pure
    composition."""
    from climsim_tpu.ops.pallas_rnn import (fused_bigru_heads_lbh,
                                            _heads_compose)
    args = _make_heads(B=8, L=12, H=16)

    def loss_v3(a):
        o, m, h = fused_bigru_heads_lbh(*a)
        return jnp.sum(o ** 2) + jnp.sum(m ** 2) + jnp.sum(h ** 2)

    def loss_ref(a):
        o, m, h = _heads_compose(*a, None, False, True, False)
        return jnp.sum(o ** 2) + jnp.sum(m ** 2) + jnp.sum(h ** 2)

    g3 = jax.grad(loss_v3)(args)
    gr = jax.grad(loss_ref)(args)
    for a, b, i in zip(g3, gr, range(len(g3))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5, err_msg=str(i))


def test_rnn_autoreg_fuse_heads_model():
    """RNNAutoreg with use_pallas (fuse_heads path off-TPU = compose
    fallback): output shapes, finiteness, and gradient flow through a
    training-style loss."""
    from climsim_tpu.models.rnn import RNNAutoreg
    m = RNNAutoreg(nx=6, nx_sfc=24, ny=6, ny_sfc=8, nneur=(32, 32),
                   nh_mem=8, add_pres=False, use_pallas=True,
                   fuse_heads=True)
    xm = jax.random.normal(K(0), (4, 60, 6)) * 0.3
    xs = jax.random.normal(K(1), (4, 24)) * 0.3
    mem = jnp.zeros((4, 60, 8))
    p = m.init(K(2), xm, xs, mem)
    out, out_sfc, new_mem = m.apply(p, xm, xs, mem)
    assert out.shape == (4, 60, 6) and out_sfc.shape == (4, 8)
    assert new_mem.shape == (4, 60, 8)
    # the fused layer owns the head params
    assert "wlat" in p["params"]["bigru_fused"]
    assert "wout" in p["params"]["bigru_fused"]

    def loss(p):
        o, s, mm_ = m.apply(p, xm, xs, mem)
        return jnp.mean(o ** 2) + jnp.mean(s ** 2) + jnp.mean(mm_ ** 2)

    g = jax.grad(loss)(p)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def _make_heads_init(B=16, L=24, nf=26, nmi=8, H=32, nm=8, ny=6,
                     dtype=jnp.float32, seed=7):
    ks = jax.random.split(K(seed), 18)
    s = 0.25
    shp = [(L, B, nf), (L, B, nmi), (B, H), (B, H), (nf, H), (H,),
           (H + nmi, 3 * H), (3 * H,), (H, 3 * H), (3 * H,), (H, 3 * H),
           (3 * H,), (H, 3 * H), (3 * H,), (H, nm), (nm,), (nm, ny),
           (ny,)]
    return tuple(jax.random.normal(k, sh, dtype) * s
                 for k, sh in zip(ks, shp))


def test_fused_bigru_heads_init_matches_compose():
    """v4 (in-kernel initial MLP + memory concat + heads, interpret
    mode) == the composition, incl. a ragged batch."""
    from climsim_tpu.ops.pallas_rnn import (_bigru_heads_init_pallas_lbh,
                                            _heads_init_compose)
    for B in (16, 20):
        args = _make_heads_init(B=B)
        got = _bigru_heads_init_pallas_lbh(*args, 8, True, True)
        ref = _heads_init_compose(*args, None, False, True, False)
        for g, r, nm_ in zip(got, ref, ("out", "mem", "lasth")):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=2e-5, atol=2e-6,
                                       err_msg=f"B={B} {nm_}")


def test_fused_bigru_heads_init_grad():
    from climsim_tpu.ops.pallas_rnn import (fused_bigru_heads_init_lbh,
                                            _heads_init_compose)
    args = _make_heads_init(B=8, L=12, H=16)

    def loss_v4(a):
        o, m, h = fused_bigru_heads_init_lbh(*a)
        return jnp.sum(o ** 2) + jnp.sum(m ** 2) + jnp.sum(h ** 2)

    def loss_ref(a):
        o, m, h = _heads_init_compose(*a, None, False, True, False)
        return jnp.sum(o ** 2) + jnp.sum(m ** 2) + jnp.sum(h ** 2)

    g4 = jax.grad(loss_v4)(args)
    gr = jax.grad(loss_ref)(args)
    for a, b, i in zip(g4, gr, range(len(g4))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5, err_msg=str(i))


def _make_heads_cm(B=16, L=12, CH=10, nm_in=4, H=16, nm=8, ny=6,
                   dtype=jnp.float32, seed=5):
    ks = jax.random.split(K(seed), 17)
    s = 0.25
    shp = [(L, CH, B), (L, nm_in, B), (H, B), (H, B),
           (3 * H, CH), (3 * H, nm_in), (3 * H, 1),
           (3 * H, H), (3 * H, 1), (3 * H, H), (3 * H, 1),
           (3 * H, H), (3 * H, 1), (nm, H), (nm, 1), (ny, nm), (ny, 1)]
    return tuple(jax.random.normal(k, sh, dtype) * s
                 for k, sh in zip(ks, shp))


def test_fused_bigru_heads_cm_matches_compose():
    """v5 channel-major kernel (interpret mode) == the transposed v3
    composition, for both the baseline and the projection-hoisted
    variants, incl. a lane-padded batch (B=144 at block 128)."""
    from climsim_tpu.ops.pallas_rnn import (_bigru_heads_cm_pallas,
                                            _heads_cm_compose)
    for B, block in ((16, 16), (144, 128)):
        args = _make_heads_cm(B=B)
        ref = _heads_cm_compose(*args, None, False, True, False)
        for hoist in (False, True):
            got = _bigru_heads_cm_pallas(*args, block, True, True, hoist)
            for g, r, nm_ in zip(got, ref, ("outmem", "lasth")):
                np.testing.assert_allclose(
                    np.asarray(g), np.asarray(r), rtol=2e-5, atol=2e-6,
                    err_msg=f"B={B} hoist={hoist} {nm_}")


def test_fused_bigru_heads_cm_grad():
    """custom_vjp of the cm op (compose backward) == autodiff of the
    composition."""
    from climsim_tpu.ops.pallas_rnn import (fused_bigru_heads_cm,
                                            _heads_cm_compose)
    args = _make_heads_cm(B=8)

    def loss_cm(a):
        om, h = fused_bigru_heads_cm(*a)
        return jnp.sum(om ** 2) + jnp.sum(h ** 2)

    def loss_ref(a):
        om, h = _heads_cm_compose(*a, None, False, True, False)
        return jnp.sum(om ** 2) + jnp.sum(h ** 2)

    gc = jax.grad(loss_cm)(args)
    gr = jax.grad(loss_ref)(args)
    for a, b, i in zip(gc, gr, range(len(gc))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5, err_msg=str(i))


def test_rnn_autoreg_level_major_matches_batch_major():
    """RNNAutoreg(level_major=True) consumes/produces channel-major
    [L, C, B] arrays but shares the batch-major fused model's param tree
    (one checkpoint serves both, round-4 contract)."""
    from climsim_tpu.models.rnn import RNNAutoreg

    B, L, nx, ns, ny, nm = 12, 8, 6, 5, 6, 4
    kw = dict(nx=nx, nx_sfc=ns, ny=ny, ny_sfc=8, nneur=(16, 16),
              nh_mem=nm, add_pres=False, output_prune=False,
              fuse_heads=True, use_pallas=True)
    m_bm = RNNAutoreg(**kw)
    m_lm = RNNAutoreg(level_major=True, **kw)
    xm = jax.random.normal(K(0), (B, L, nx)) * 0.3
    xs = jax.random.normal(K(1), (B, ns)) * 0.3
    mem = jax.random.normal(K(2), (B, L, nm)) * 0.3
    params = m_bm.init(K(3), xm, xs, mem)
    out, osfc, mem_o = m_bm.apply(params, xm, xs, mem)
    cm = lambda a: jnp.moveaxis(a, 0, -1)       # [B,L,C] -> [L,C,B]
    out2, osfc2, mem2 = m_lm.apply(params, cm(xm), xs, cm(mem))
    np.testing.assert_allclose(np.asarray(out2), np.asarray(cm(out)),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(osfc2), np.asarray(osfc),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(mem2), np.asarray(cm(mem_o)),
                               rtol=2e-5, atol=2e-6)


def test_fused_bigru_heads_cm_bwd_kernel_matches_autodiff():
    """The HAND-WRITTEN channel-major backward kernel (round 5; replay +
    BPTT + head VJPs in VMEM, interpret mode) == autodiff of the
    composition, incl. a lane-padded batch (pad lanes carry zero inputs
    AND zero cotangents, so the weight-grad lane reductions are
    unchanged)."""
    from climsim_tpu.ops.pallas_rnn import (fused_bigru_heads_cm,
                                            _heads_cm_compose)
    for B in (16, 144):
        args = _make_heads_cm(B=B)

        def loss_k(a):
            # interpret=True routes BOTH directions through the pallas
            # kernels (fwd interpret + _bigru_heads_cm_bwd_pallas)
            om, h = fused_bigru_heads_cm(*a, None, True, True, True)
            return jnp.sum(om ** 2) + jnp.sum(h ** 2)

        def loss_ref(a):
            om, h = _heads_cm_compose(*a, None, False, True, False)
            return jnp.sum(om ** 2) + jnp.sum(h ** 2)

        gk = jax.grad(loss_k)(args)
        gr = jax.grad(loss_ref)(args)
        names = ("x", "mem_in", "h0_up", "h0_dn", "win1h", "win1m",
                 "bin1", "whh_up", "bhh_up", "win2", "bin2", "whh_dn",
                 "bhh_dn", "wlat", "blat", "wout", "bout")
        for a, b, n in zip(gk, gr, names):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=3e-4, atol=2e-5,
                                       err_msg=f"B={B} d{n}")


def test_fused_bigru_heads_init_cm_bwd_kernel_matches_autodiff():
    """v6 backward (init-MLP recompute + cm backward kernel + init VJP,
    interpret mode) == autodiff of the composition."""
    from climsim_tpu.ops.pallas_rnn import (fused_bigru_heads_init_cm,
                                            _heads_init_cm_compose)
    args = _make_heads_init_cm(B=16)

    def loss_k(a):
        om, h = fused_bigru_heads_init_cm(*a, None, True, True)
        return jnp.sum(om ** 2) + jnp.sum(h ** 2)

    def loss_ref(a):
        om, h = _heads_init_cm_compose(*a, None, False, True, False)
        return jnp.sum(om ** 2) + jnp.sum(h ** 2)

    gk = jax.grad(loss_k)(args)
    gr = jax.grad(loss_ref)(args)
    for a, b, i in zip(gk, gr, range(len(gk))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=2e-5, err_msg=str(i))


def _make_heads_init_cm(B=16, L=12, nf=7, nm_in=4, H=16, nm=8, ny=6,
                        dtype=jnp.float32, seed=7):
    ks = jax.random.split(K(seed), 19)
    s = 0.25
    shp = [(L, nf, B), (L, nm_in, B), (H, B), (H, B),
           (H, nf), (H, 1),
           (3 * H, H), (3 * H, nm_in), (3 * H, 1),
           (3 * H, H), (3 * H, 1), (3 * H, H), (3 * H, 1),
           (3 * H, H), (3 * H, 1), (nm, H), (nm, 1), (ny, nm), (ny, 1)]
    return tuple(jax.random.normal(k, sh, dtype) * s
                 for k, sh in zip(ks, shp))


def test_fused_bigru_heads_init_cm_matches_compose():
    """v6 channel-major init-fused kernel (interpret mode) == the
    transposed v4 composition, incl. a lane-padded batch."""
    from climsim_tpu.ops.pallas_rnn import (_bigru_heads_init_cm_pallas,
                                            _heads_init_cm_compose)
    for B, block in ((16, 16), (144, 128)):
        args = _make_heads_init_cm(B=B)
        ref = _heads_init_cm_compose(*args, None, False, True, False)
        got = _bigru_heads_init_cm_pallas(*args, block, True, True)
        for g, r, nm_ in zip(got, ref, ("outmem", "lasth")):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(r), rtol=2e-5, atol=2e-6,
                err_msg=f"B={B} {nm_}")


def test_fused_bigru_heads_init_cm_grad():
    from climsim_tpu.ops.pallas_rnn import (fused_bigru_heads_init_cm,
                                            _heads_init_cm_compose)
    args = _make_heads_init_cm(B=8)

    def loss_cm(a):
        om, h = fused_bigru_heads_init_cm(*a)
        return jnp.sum(om ** 2) + jnp.sum(h ** 2)

    def loss_ref(a):
        om, h = _heads_init_cm_compose(*a, None, False, True, False)
        return jnp.sum(om ** 2) + jnp.sum(h ** 2)

    gc = jax.grad(loss_cm)(args)
    gr = jax.grad(loss_ref)(args)
    for a, b, i in zip(gc, gr, range(len(gc))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5, err_msg=str(i))


def test_rnn_autoreg_level_major_fuse_init_matches_batch_major():
    """RNNAutoreg(level_major=True, fuse_init=True) — the v6 raw-feature
    path — matches the batch-major fuse_init model on the same params."""
    from climsim_tpu.models.rnn import RNNAutoreg

    B, L, nx, ns, ny, nm = 12, 8, 6, 5, 6, 4
    kw = dict(nx=nx, nx_sfc=ns, ny=ny, ny_sfc=8, nneur=(16, 16),
              nh_mem=nm, add_pres=False, output_prune=False,
              fuse_heads=True, fuse_init=True, use_pallas=True)
    m_bm = RNNAutoreg(**kw)
    m_lm = RNNAutoreg(level_major=True, **kw)
    xm = jax.random.normal(K(0), (B, L, nx)) * 0.3
    xs = jax.random.normal(K(1), (B, ns)) * 0.3
    mem = jax.random.normal(K(2), (B, L, nm)) * 0.3
    params = m_bm.init(K(3), xm, xs, mem)
    out, osfc, mem_o = m_bm.apply(params, xm, xs, mem)
    cm = lambda a: jnp.moveaxis(a, 0, -1)       # [B,L,C] -> [L,C,B]
    out2, osfc2, mem2 = m_lm.apply(params, cm(xm), xs, cm(mem))
    np.testing.assert_allclose(np.asarray(out2), np.asarray(cm(out)),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(osfc2), np.asarray(osfc),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(mem2), np.asarray(cm(mem_o)),
                               rtol=2e-5, atol=2e-6)
