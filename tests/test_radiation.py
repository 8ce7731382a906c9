"""Radiation solver tests: energy conservation, analytic limits, numpy
reference parity for the adding recursions."""
import jax
import jax.numpy as jnp
import numpy as np

from climsim_tpu.physics import radiation as R
from climsim_tpu.physics import cloud_optics as CO


def test_interpolate_tlev_matches_numpy():
    """Vectorized interpolation equals a per-level numpy transcription of
    the reference loop (physics_rad.py:17-49)."""
    rng = np.random.default_rng(7)
    B, L = 4, 20
    play = np.sort(rng.uniform(1e4, 1e5, (B, L)), axis=1)
    plev = np.zeros((B, L + 1))
    plev[:, 1:-1] = 0.5 * (play[:, :-1] + play[:, 1:])
    plev[:, 0] = play[:, 0] - 500
    plev[:, -1] = play[:, -1] + 500
    tlay = rng.uniform(200, 300, (B, L))
    tlev = np.asarray(R.interpolate_tlev(jnp.asarray(tlay),
                                         jnp.asarray(play),
                                         jnp.asarray(plev)))
    exp = np.zeros((B, L + 1))
    exp[:, 0] = tlay[:, 0] + (plev[:, 0] - play[:, 0]) * \
        (tlay[:, 1] - tlay[:, 0]) / (play[:, 1] - play[:, 0])
    for i in range(1, L):
        exp[:, i] = (play[:, i - 1] * tlay[:, i - 1]
                     * (plev[:, i] - play[:, i])
                     + play[:, i] * tlay[:, i]
                     * (play[:, i - 1] - plev[:, i])) \
            / (plev[:, i] * (play[:, i - 1] - play[:, i]))
    exp[:, L] = tlay[:, L - 1] + (plev[:, L] - play[:, L - 1]) * \
        (tlay[:, L - 1] - tlay[:, L - 2]) / (play[:, L - 1] - play[:, L - 2])
    np.testing.assert_allclose(tlev, exp, rtol=1e-10)


def test_lw_solver_transparent_atmosphere():
    """od=0: downward flux stays 0, upward flux = surface emission at all
    levels."""
    B, L = 3, 60
    od = jnp.zeros((B, L))
    planck = jnp.full((B, L), 100.0)
    sup, sdn, trans = R.reftrans_lw(planck, planck, od)
    np.testing.assert_allclose(np.asarray(trans), 1.0)
    np.testing.assert_allclose(np.asarray(sup), 0.0, atol=1e-12)
    sfc = jnp.full((B,), 390.0)
    emis = jnp.ones((B,))
    fdn, fup = R.lw_solver_noscat(trans, sdn, sup, sfc, emis)
    np.testing.assert_allclose(np.asarray(fdn), 0.0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(fup), 390.0, rtol=1e-6)


def test_lw_solver_opaque_atmosphere():
    """Large od: each level emits its own Planck source; TOA upward flux
    approaches the top layer's source."""
    B, L = 2, 10
    od = jnp.full((B, L), 50.0)
    planck = jnp.asarray(np.linspace(150, 350, L))[None].repeat(B, 0)
    sup, sdn, trans = R.reftrans_lw(planck, planck, od)
    fdn, fup = R.lw_solver_noscat(trans, sdn, sup, jnp.full((B,), 400.0),
                                  jnp.ones((B,)))
    # at TOA, upward flux ~ top layer emission (trans ~ 0)
    np.testing.assert_allclose(np.asarray(fup[:, 0]),
                               np.asarray(sup[:, 0]), rtol=1e-6)


def test_lw_matches_numpy_recursion():
    rng = np.random.default_rng(0)
    B, L = 5, 30
    trans = rng.uniform(0.3, 0.99, (B, L))
    sdn = rng.uniform(0, 20, (B, L))
    sup = rng.uniform(0, 20, (B, L))
    sfc = rng.uniform(300, 450, B)
    emis = rng.uniform(0.9, 1.0, B)
    fdn, fup = R.lw_solver_noscat(jnp.asarray(trans), jnp.asarray(sdn),
                                  jnp.asarray(sup), jnp.asarray(sfc),
                                  jnp.asarray(emis))
    # independent numpy recursion
    fdn_np = np.zeros((B, L + 1))
    for j in range(L):
        fdn_np[:, j + 1] = trans[:, j] * fdn_np[:, j] + sdn[:, j]
    fup_np = np.zeros((B, L + 1))
    fup_np[:, L] = emis * sfc + (1 - emis) * fdn_np[:, L]
    for j in range(L - 1, -1, -1):
        fup_np[:, j] = trans[:, j] * fup_np[:, j + 1] + sup[:, j]
    np.testing.assert_allclose(np.asarray(fdn), fdn_np, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(fup), fup_np, rtol=1e-6)


def test_sw_adding_conserves_energy():
    """Non-absorbing atmosphere (ssa=1): flux in = flux out + absorbed(0) ->
    TOA net = surface net absorbed."""
    rng = np.random.default_rng(1)
    B, L = 4, 24
    mu0 = jnp.asarray(rng.uniform(0.2, 1.0, (B, L)))
    od = jnp.asarray(rng.uniform(0.01, 0.5, (B, L)))
    ssa = jnp.ones((B, L)) * 0.999999
    g = jnp.asarray(rng.uniform(0.0, 0.8, (B, L)))
    rd, td, rdir, tdd, tdir = R.calc_ref_trans_sw(mu0, od, ssa, g)
    toa = jnp.full((B,), 1000.0)
    alb_d = jnp.asarray(rng.uniform(0.1, 0.5, B))
    alb_dir = alb_d
    fup, fdiff, fdir = R.adding_sw(toa, alb_d, alb_dir, rd, td, rdir, tdd,
                                   tdir)
    net_toa = np.asarray(toa - fup[:, 0])
    sfc_abs = np.asarray((fdir[:, -1] + fdiff[:, -1]) * (1 - alb_d))
    # near-conservative scattering (the k>=1e-2 numerical clamp injects a
    # little artificial absorption at ssa->1, as in the reference)
    np.testing.assert_allclose(net_toa, sfc_abs, rtol=0.05)
    assert np.all(net_toa - sfc_abs > -1e-3)  # no spurious energy creation
    # fluxes positive and finite
    assert np.isfinite(np.asarray(fup)).all()
    assert np.all(np.asarray(fdiff) >= -1e-6)


def test_sw_adding_matches_numpy():
    rng = np.random.default_rng(2)
    B, L = 3, 12
    Rm = rng.uniform(0.0, 0.3, (B, L))
    Tm = rng.uniform(0.4, 0.7, (B, L))
    rdir = rng.uniform(0.0, 0.2, (B, L))
    tdd = rng.uniform(0.0, 0.2, (B, L))
    tdir = rng.uniform(0.3, 0.9, (B, L))
    toa = rng.uniform(800, 1200, B)
    ad = rng.uniform(0.1, 0.4, B)
    adir = rng.uniform(0.1, 0.4, B)
    fup, fdiff, fdir = R.adding_sw(jnp.asarray(toa), jnp.asarray(ad),
                                   jnp.asarray(adir), jnp.asarray(Rm),
                                   jnp.asarray(Tm), jnp.asarray(rdir),
                                   jnp.asarray(tdd), jnp.asarray(tdir))
    # numpy reference (reference algorithm transcribed independently)
    alb = np.zeros((B, L + 1)); albd = np.zeros((B, L + 1))
    alb[:, L] = ad; albd[:, L] = adir
    for j in range(L - 1, -1, -1):
        inv = 1 / (1 - alb[:, j + 1] * Rm[:, j])
        albd[:, j] = rdir[:, j] + (tdir[:, j] * albd[:, j + 1]
                                   + tdd[:, j] * alb[:, j + 1]) * Tm[:, j] * inv
        alb[:, j] = Rm[:, j] + Tm[:, j] ** 2 * alb[:, j + 1] * inv
    fup_np = np.zeros((B, L + 1)); fdf = np.zeros((B, L + 1))
    fdr = np.zeros((B, L + 1))
    fdr[:, 0] = toa; fup_np[:, 0] = toa * albd[:, 0]
    for j in range(L):
        fdf[:, j + 1] = (Tm[:, j] * fdf[:, j] + fdr[:, j]
                         * (tdir[:, j] * albd[:, j + 1] * Rm[:, j]
                            + tdd[:, j])) / (1 - Rm[:, j] * alb[:, j + 1])
        fdr[:, j + 1] = fdr[:, j] * tdir[:, j]
        fup_np[:, j + 1] = fdr[:, j + 1] * albd[:, j + 1] \
            + fdf[:, j + 1] * alb[:, j + 1]
    np.testing.assert_allclose(np.asarray(fup), fup_np, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(fdiff), fdf, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(fdir), fdr, rtol=1e-6)


def test_heating_rate_sign():
    """Absorbing layer: net flux convergence -> warming."""
    B, L = 2, 5
    fnet = jnp.asarray(np.array([[500, 480, 460, 450, 445, 444]] * B,
                                np.float64))
    dp = jnp.full((B, L), 2000.0)
    hr = R.heating_rate(fnet, dp)
    assert np.all(np.asarray(hr) > 0)


def test_radiation_differentiable():
    """Gradients flow through the full LW+SW chain (BPTT requirement)."""
    B, L = 2, 10

    def loss(od):
        planck = jnp.full((B, L), 100.0)
        sup, sdn, trans = R.reftrans_lw(planck, planck, od)
        fdn, fup = R.lw_solver_noscat(trans, sdn, sup, jnp.full((B,), 390.0),
                                      jnp.ones((B,)))
        return jnp.sum(fup)

    g = jax.grad(loss)(jnp.full((B, L), 0.5))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


# ------------------------------------------------------------- cloud optics

def test_effective_radii():
    # table domain before the index clamp kicks in (~272 K)
    T = jnp.asarray(np.linspace(180.0, 270.0, 50))
    rei = np.asarray(CO.reitab(T))
    assert np.all(rei > 0) and np.all(np.diff(rei) >= -1e-6)  # monotone-ish
    rel = np.asarray(CO.reltab(T, jnp.zeros(50), jnp.zeros(50),
                               jnp.zeros(50)))
    np.testing.assert_allclose(rel, 14.0, atol=1e-6)  # pure ocean
    rel_land = np.asarray(CO.reltab(jnp.full((1,), 300.0), jnp.ones(1),
                                    jnp.zeros(1), jnp.zeros(1)))
    np.testing.assert_allclose(rel_land, 8.0, atol=1e-6)  # warm land


def test_cloud_optics_shapes_and_ranges():
    rng = np.random.default_rng(3)
    shape = (8, 60)
    lwp = jnp.asarray(np.abs(rng.normal(20, 10, shape)))
    iwp = jnp.asarray(np.abs(rng.normal(10, 5, shape)))
    T = jnp.asarray(rng.uniform(200, 290, shape))
    zero = jnp.zeros(shape)
    for ng in (4, 16, 112):
        tau, ssa, g = CO.cloud_optics_sw(lwp, iwp, T, zero, zero, zero, ng)
        assert tau.shape == shape + (ng,)
        assert np.all(np.asarray(tau) >= 0)
        assert np.all((np.asarray(ssa) > 0) & (np.asarray(ssa) < 1))
        assert np.all((np.asarray(g) > 0) & (np.asarray(g) < 1))


def _random_region_fracs(rng, B, L, nreg=3):
    f = rng.uniform(0.01, 1.0, (B, L, nreg))
    return f / f.sum(-1, keepdims=True)


def test_overlap_matrices_parity_vs_reference():
    """Vectorized calc_overlap_matrices == the reference's per-interface
    torch loop (rnn/models/physics_rad.py:688-872)."""
    import sys
    import torch
    sys.path.insert(0, "/root/reference/rnn/models")
    import physics_rad as ref_rad

    rng = np.random.default_rng(11)
    B, L = 6, 12
    fr = _random_region_fracs(rng, B, L).astype(np.float64)
    op = rng.uniform(-0.2, 1.0, (B, L - 1)).astype(np.float64)

    # reference wants (nlev, nreg, nbatch) and (nlev-1, nbatch);
    # torch.compile falls back to eager on this CPU image.
    ref_fn = getattr(ref_rad.calc_overlap_matrices, "_torchdynamo_orig_callable",
                     ref_rad.calc_overlap_matrices)
    v_ref = ref_fn(torch.from_numpy(fr.transpose(1, 2, 0)),
                   torch.from_numpy(op.T))          # (3,3,L+1,B)
    v_ours = np.asarray(R.calc_overlap_matrices(jnp.asarray(fr),
                                                jnp.asarray(op)))
    np.testing.assert_allclose(v_ours, v_ref.numpy().transpose(3, 2, 0, 1),
                               rtol=1e-12, atol=1e-12)


def test_overlap_matrices_limits():
    """op=1 with identical adjacent fractions -> identity (maximum
    overlap); op=0 -> columns of V equal the lower-layer fractions
    (random overlap)."""
    B, L, nreg = 2, 5, 3
    fr = np.tile(np.array([0.6, 0.3, 0.1]), (B, L, 1))
    v_max = np.asarray(R.calc_overlap_matrices(
        jnp.asarray(fr), jnp.ones((B, L - 1))))
    eye = np.eye(nreg)
    for j in range(1, L):   # interior interfaces
        np.testing.assert_allclose(v_max[:, j], np.tile(eye, (B, 1, 1)),
                                   atol=1e-12)
    v_rand = np.asarray(R.calc_overlap_matrices(
        jnp.asarray(fr), jnp.zeros((B, L - 1))))
    for j in range(1, L):
        # v[jlower, jupper] = frac_lower[jlower] for every jupper
        np.testing.assert_allclose(
            v_rand[:, j], np.tile(fr[:, 0][:, :, None], (1, 1, nreg)),
            atol=1e-12)
    # interior interfaces: columns sum to 1 (flux conservation across V;
    # at TOA/surface the empty upper regions have all-zero columns)
    np.testing.assert_allclose(v_max[:, 1:L].sum(-2), 1.0, atol=1e-10)
    np.testing.assert_allclose(v_rand[:, 1:L].sum(-2), 1.0, atol=1e-10)


def test_adding_sw_tc_parity_vs_reference():
    """Our region-axis TripleClouds solver == the reference's flattened
    adding_tc_sw_batchlast_opt (physics_rad.py:421-532) on identical
    random optics + overlap matrices."""
    import sys
    import torch
    sys.path.insert(0, "/root/reference/rnn/models")
    import physics_rad as ref_rad

    rng = np.random.default_rng(3)
    B, L, nreg = 5, 10, 3
    mu0 = rng.uniform(0.2, 1.0, (B, 1, 1))
    od = rng.uniform(0.01, 2.0, (B, L, nreg))
    ssa = rng.uniform(0.3, 0.999, (B, L, nreg))
    g = rng.uniform(0.0, 0.8, (B, L, nreg))
    rd, td, rdir, tdd, tdir = (np.asarray(a, np.float64) for a in
                               R.calc_ref_trans_sw(mu0, od, ssa, g))
    fr = _random_region_fracs(rng, B, L)
    op = rng.uniform(0.0, 1.0, (B, L - 1))
    V = np.asarray(R.calc_overlap_matrices(jnp.asarray(fr),
                                           jnp.asarray(op)), np.float64)
    toa = np.zeros((B, nreg)); toa[:, 0] = 1360.0 * mu0[:, 0, 0]
    alb_diff = np.tile(rng.uniform(0.05, 0.8, (B, 1)), (1, nreg))
    alb_dir = np.tile(rng.uniform(0.05, 0.8, (B, 1)), (1, nreg))

    fup_o, fdiff_o, fdir_o = (np.asarray(a) for a in R.adding_sw_tc(
        jnp.asarray(toa), jnp.asarray(alb_diff), jnp.asarray(alb_dir),
        jnp.asarray(rd), jnp.asarray(td), jnp.asarray(rdir),
        jnp.asarray(tdd), jnp.asarray(tdir), jnp.asarray(V)))

    # reference layout: layer arrays [nlev, B*nreg] (region innermost),
    # V [nlev(+1), B, nreg*nreg] viewed as (-1, nreg, nreg)
    def flat(a):  # [B, L, R] -> [L, B*R]
        return torch.from_numpy(a.transpose(1, 0, 2).reshape(L, B * nreg))
    ref_fn = getattr(ref_rad.adding_tc_sw_batchlast_opt,
                     "_torchdynamo_orig_callable",
                     ref_rad.adding_tc_sw_batchlast_opt)
    fup_r, fdiff_r, fdir_r = ref_fn(
        torch.from_numpy(toa.reshape(-1)),
        torch.from_numpy(alb_diff.reshape(-1)),
        torch.from_numpy(alb_dir.reshape(-1)),
        flat(rd), flat(td), flat(rdir), flat(tdd), flat(tdir),
        torch.from_numpy(V[:, :-1].transpose(1, 0, 2, 3).reshape(L, -1)),
        nreg)
    for ours, theirs in ((fup_o, fup_r), (fdiff_o, fdiff_r),
                         (fdir_o, fdir_r)):
        np.testing.assert_allclose(
            ours, theirs.numpy().reshape(L + 1, B, nreg).transpose(1, 0, 2),
            rtol=1e-10, atol=1e-10)


def test_adding_sw_tc_identity_reduces_to_ica():
    """V = I at every interface makes the TC solver equal nreg
    independent ICA columns."""
    rng = np.random.default_rng(9)
    B, L, nreg = 4, 8, 3
    mu0 = rng.uniform(0.2, 1.0, (B, 1, 1))
    od = rng.uniform(0.01, 2.0, (B, L, nreg))
    ssa = rng.uniform(0.3, 0.999, (B, L, nreg))
    g = rng.uniform(0.0, 0.8, (B, L, nreg))
    rd, td, rdir, tdd, tdir = R.calc_ref_trans_sw(mu0, od, ssa, g)
    toa = jnp.asarray(rng.uniform(100, 1300, (B, nreg)))
    ad = jnp.asarray(rng.uniform(0.05, 0.8, (B, nreg)))
    adir = jnp.asarray(rng.uniform(0.05, 0.8, (B, nreg)))
    V = jnp.tile(jnp.eye(nreg), (B, L + 1, 1, 1))
    fup_tc, fdiff_tc, fdir_tc = R.adding_sw_tc(
        toa, ad, adir, rd, td, rdir, tdd, tdir, V)
    # ICA path treats the region axis as a trailing batch axis, but uses
    # the conservative direct-reflection form; rebuild the reference form
    # by passing V=I through the TC solver vs per-region ICA via the TC
    # solver with nreg=1 per slice.
    for r in range(nreg):
        Vr = jnp.ones((B, L + 1, 1, 1))
        fup_r, fdiff_r, fdir_r = R.adding_sw_tc(
            toa[:, r:r + 1], ad[:, r:r + 1], adir[:, r:r + 1],
            rd[:, :, r:r + 1], td[:, :, r:r + 1], rdir[:, :, r:r + 1],
            tdd[:, :, r:r + 1], tdir[:, :, r:r + 1], Vr)
        np.testing.assert_allclose(np.asarray(fup_tc[:, :, r]),
                                   np.asarray(fup_r[:, :, 0]), rtol=1e-10)
        np.testing.assert_allclose(np.asarray(fdir_tc[:, :, r]),
                                   np.asarray(fdir_r[:, :, 0]), rtol=1e-10)


def test_stratified_sample_parity_and_properties():
    """Largest-remainder g-point assignment matches the reference torch
    implementation and is exactly proportional for exact multiples."""
    import sys
    import torch
    sys.path.insert(0, "/root/reference/rnn/models")
    import physics_rad as ref_rad

    rng = np.random.default_rng(5)
    B, N, G = 64, 3, 16
    p = rng.uniform(0.01, 1.0, (B, N))
    p = p / p.sum(-1, keepdims=True)
    ours = np.asarray(R.stratified_sample(jnp.asarray(p), G))
    ref = ref_rad.stratified_sample(torch.from_numpy(p), G).numpy()
    np.testing.assert_array_equal(ours, ref)
    # counts proportional within 1 of p*G
    for b in range(B):
        counts = np.bincount(ours[b], minlength=N)
        assert counts.sum() == G
        assert np.all(np.abs(counts - p[b] * G) <= 1.0 + 1e-9)
    # exact multiples: deterministic exact split
    p_exact = np.tile(np.array([[0.5, 0.25, 0.25]]), (2, 1))
    idx = np.asarray(R.stratified_sample(jnp.asarray(p_exact), 8))
    np.testing.assert_array_equal(np.bincount(idx[0], minlength=3),
                                  [4, 2, 2])
