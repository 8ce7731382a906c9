"""Differentiable radiative-transfer solvers (LW no-scattering + SW
two-stream adding), TPU-native.

Re-implements the reference's torch.compile'd solvers
(rnn/models/physics_rad.py) as jnp + ``lax.scan`` over levels:

* level-temperature interpolation           (:17-49)
* Stefan-Boltzmann OLR                      (:51-57)
* Pade linear-in-tau LW source/transmittance (:60-92, Clough et al. 1992)
* no-scattering LW adding solver             (:96-131)
* Meador-Weaver two-stream SW ref/trans      (:139-245)
* ecRad-TripleClouds-style two-sweep SW
  adding solver                              (:250-420)
* flux divergence -> heating rate

Shapes are batch-first: layers [B, nlev(, ng)], half-levels [B, nlev+1(, ng)]
with level 0 = TOA. The spectral dimension ng rides along as a trailing
batch axis — on TPU the scans vectorize over (B, ng) tiles on the VPU/MXU.
All solvers are pure and differentiable (BPTT through the rollout crosses
them).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

SIGMA_SB = 5.670374419e-8
LW_DIFFUSIVITY = 1.66


def interpolate_tlev(tlay: jnp.ndarray, play: jnp.ndarray,
                     plev: jnp.ndarray) -> jnp.ndarray:
    """Interpolate layer temperatures to the nlay+1 half-levels
    (physics_rad.py:17-49), vectorized over columns. tlay/play [B, nlay],
    plev [B, nlay+1]."""
    t_top = tlay[:, 0] + (plev[:, 0] - play[:, 0]) * \
        (tlay[:, 1] - tlay[:, 0]) / (play[:, 1] - play[:, 0])
    interior = (play[:, :-1] * tlay[:, :-1] * (plev[:, 1:-1] - play[:, 1:])
                + play[:, 1:] * tlay[:, 1:] * (play[:, :-1] - plev[:, 1:-1])) \
        / (plev[:, 1:-1] * (play[:, :-1] - play[:, 1:]))
    t_sfc = tlay[:, -1] + (plev[:, -1] - play[:, -1]) * \
        (tlay[:, -1] - tlay[:, -2]) / (play[:, -1] - play[:, -2])
    return jnp.concatenate([t_top[:, None], interior, t_sfc[:, None]], axis=1)


def outgoing_lw(temp: jnp.ndarray) -> jnp.ndarray:
    """Blackbody OLR sigma*T^4 (physics_rad.py:51-57)."""
    return SIGMA_SB * jnp.power(temp, 4)


def reftrans_lw(planck_top, planck_bot, od):
    """Pade-approximant linear-in-tau LW source terms
    (physics_rad.py:60-92). Returns (source_up, source_dn, trans_lw)."""
    od = LW_DIFFUSIVITY * od
    trans_lw = jnp.exp(-od)
    coeff = 0.2 * od
    planck_fl = 0.5 * (planck_top + planck_bot)
    source_dn = (1.0 - trans_lw) * (planck_fl + coeff * planck_bot) \
        / (1.0 + coeff)
    source_up = (1.0 - trans_lw) * (planck_fl + coeff * planck_top) \
        / (1.0 + coeff)
    return source_up, source_dn, trans_lw


def lw_solver_noscat(trans_lw, source_dn, source_up, source_sfc,
                     emissivity_surf):
    """No-scattering LW adding solver (physics_rad.py:96-131).

    trans_lw/source_* : [B, nlev(, ng)], source_sfc/emissivity: [B(, ng)].
    Returns (flux_dn, flux_up) at the nlev+1 half-levels, TOA first.
    """
    # promote to a common dtype so the scan carry is stable
    dt = jnp.result_type(trans_lw, source_dn, source_up, source_sfc,
                         emissivity_surf)
    trans_lw, source_dn, source_up, source_sfc, emissivity_surf = (
        a.astype(dt) for a in (trans_lw, source_dn, source_up, source_sfc,
                               emissivity_surf))
    t = jnp.swapaxes(trans_lw, 0, 1)   # [nlev, B, ...]
    sdn = jnp.swapaxes(source_dn, 0, 1)
    sup = jnp.swapaxes(source_up, 0, 1)

    def down(fdn, inp):
        tl, s = inp
        fdn = tl * fdn + s
        return fdn, fdn

    fdn0 = jnp.zeros_like(source_sfc)
    fdn_sfc, fdn_rest = jax.lax.scan(down, fdn0, (t, sdn))
    flux_dn = jnp.concatenate([fdn0[None], fdn_rest], axis=0)

    fup_sfc = emissivity_surf * source_sfc + \
        (1.0 - emissivity_surf) * fdn_sfc

    def up(fup, inp):
        tl, s = inp
        fup = tl * fup + s
        return fup, fup

    _, fup_rest = jax.lax.scan(up, fup_sfc, (t, sup), reverse=True)
    flux_up = jnp.concatenate([fup_rest, fup_sfc[None]], axis=0)
    return jnp.swapaxes(flux_dn, 0, 1), jnp.swapaxes(flux_up, 0, 1)


def calc_ref_trans_sw(mu0, od, ssa, asymmetry):
    """Meador & Weaver (1980) two-stream SW reflectance/transmittance
    (physics_rad.py:139-245). All elementwise.

    Returns (ref_diff, trans_diff, ref_dir, trans_dir_diff, trans_dir_dir).
    """
    eps = 1.0e-7
    trans_dir_dir = jnp.exp(-od / mu0)

    gamma1 = (8.0 - ssa * (5.0 + 3.0 * asymmetry)) * 0.25
    gamma2 = 3.0 * (ssa * (1.0 - asymmetry)) * 0.25
    gamma3 = (2.0 - 3.0 * mu0 * asymmetry) * 0.25
    gamma4 = 1.0 - gamma3
    alpha1 = gamma1 * gamma4 + gamma2 * gamma3
    alpha2 = gamma1 * gamma3 + gamma2 * gamma4

    k = jnp.sqrt(jnp.maximum((gamma1 - gamma2) * (gamma1 + gamma2), 1.0e-4))
    expo = jnp.exp(-k * od)
    expo2 = expo ** 2
    k_2_exp = 2.0 * k * expo
    rf = 1.0 / (k + gamma1 + (k - gamma1) * expo2)

    ref_diff = gamma2 * (1.0 - expo2) * rf
    trans_diff = jnp.clip(k_2_exp * rf, 0.0, 1.0 - ref_diff)
    trans_diff = jnp.maximum(trans_diff, 0.0)

    k_mu0 = k * mu0
    one_minus = 1.0 - k_mu0 ** 2
    safe_denom = jnp.where(jnp.abs(one_minus) > eps, one_minus, eps)
    rf2 = ssa * rf / safe_denom

    ref_dir = rf2 * ((1.0 - k_mu0) * (alpha2 + k * gamma3)
                     - (1.0 + k_mu0) * (alpha2 - k * gamma3) * expo2
                     - k_2_exp * (gamma3 - alpha2 * mu0) * trans_dir_dir)
    trans_dir_diff = rf2 * (k_2_exp * (gamma4 + alpha1 * mu0)
                            - trans_dir_dir
                            * ((1.0 + k_mu0) * (alpha1 + k * gamma4)
                               - (1.0 - k_mu0) * (alpha1 - k * gamma4)
                               * expo2))

    max_direct = 1.0 - trans_dir_dir
    ref_dir = jnp.clip(ref_dir, 0.0, max_direct)
    trans_dir_diff = jnp.clip(trans_dir_diff, 0.0, max_direct - ref_dir)
    return ref_diff, trans_diff, ref_dir, trans_dir_diff, trans_dir_dir


def adding_sw(incoming_toa, albedo_surf_diffuse, albedo_surf_direct,
              R, T, ref_dir, T_dir_diff, T_dir_dir):
    """Two-sweep SW adding solver (ecRad-TripleClouds form,
    physics_rad.py:250-420). Layer arrays [B, nlev(, ng)], TOA first;
    surface scalars [B(, ng)].

    Returns (flux_up, flux_dn_diffuse, flux_dn_direct) at half-levels.
    """
    dtc = jnp.result_type(incoming_toa, albedo_surf_diffuse,
                          albedo_surf_direct, R, T)
    (incoming_toa, albedo_surf_diffuse, albedo_surf_direct, R, T, ref_dir,
     T_dir_diff, T_dir_dir) = (
        a.astype(dtc) for a in (incoming_toa, albedo_surf_diffuse,
                                albedo_surf_direct, R, T, ref_dir,
                                T_dir_diff, T_dir_dir))
    Rl = jnp.swapaxes(R, 0, 1)
    Tl = jnp.swapaxes(T, 0, 1)
    rdir = jnp.swapaxes(ref_dir, 0, 1)
    tdd = jnp.swapaxes(T_dir_diff, 0, 1)
    tdir = jnp.swapaxes(T_dir_dir, 0, 1)

    # upward sweep: albedo of the system below each half-level
    def up(carry, inp):
        alb, albdir = carry
        Rj, Tj, rdj, tddj, tdj = inp
        inv = 1.0 / (1.0 - alb * Rj)
        albdir_new = rdj + (tdj * albdir + tddj * alb) * Tj * inv
        alb_new = Rj + Tj * Tj * alb * inv
        return (alb_new, albdir_new), (alb_new, albdir_new)

    carry0 = (albedo_surf_diffuse, albedo_surf_direct)
    (_, _), (albs, albdirs) = jax.lax.scan(
        up, carry0, (Rl, Tl, rdir, tdd, tdir), reverse=True)
    # albs[j] = albedo of system below half-level j (for j = 0..nlev-1);
    # append the surface albedo as half-level nlev
    albs = jnp.concatenate([albs, albedo_surf_diffuse[None]], axis=0)
    albdirs = jnp.concatenate([albdirs, albedo_surf_direct[None]], axis=0)

    # downward sweep. NOTE: the reference writes the direct-reflection
    # term as T*albedodir*R (physics_rad.py:312-315), which creates ~10%
    # energy at the surface; the energy-consistent term (ecRad
    # radiation_mcica_sw) uses the DIRECT transmittance, tdir*albedodir*R.
    # We implement the conservative form.
    def down(carry, inp):
        fdndir, fdndiff = carry
        Rj, Tj, rdj, tddj, tdj, alb1, adir1 = inp
        fdndiff = (Tj * fdndiff + fdndir * (tdj * adir1 * Rj + tddj)) \
            / (1.0 - Rj * alb1)
        fdndir = fdndir * tdj
        fup = fdndir * adir1 + fdndiff * alb1
        return (fdndir, fdndiff), (fup, fdndiff, fdndir)

    zeros = jnp.zeros_like(incoming_toa)
    (_, _), (fups, fdiffs, fdirs) = jax.lax.scan(
        down, (incoming_toa, zeros),
        (Rl, Tl, rdir, tdd, tdir, albs[1:], albdirs[1:]))

    flux_up = jnp.concatenate([(incoming_toa * albdirs[0])[None], fups],
                              axis=0)
    flux_dn_diffuse = jnp.concatenate([zeros[None], fdiffs], axis=0)
    flux_dn_direct = jnp.concatenate([incoming_toa[None], fdirs], axis=0)
    return (jnp.swapaxes(flux_up, 0, 1),
            jnp.swapaxes(flux_dn_diffuse, 0, 1),
            jnp.swapaxes(flux_dn_direct, 0, 1))


def calc_overlap_matrices(region_fracs: jnp.ndarray,
                          overlap_param: jnp.ndarray,
                          cloud_fraction_threshold: float = 1.0e-20
                          ) -> jnp.ndarray:
    """Directional TripleClouds overlap matrices (Shonk et al. 2010).

    Re-implements the reference's ``calc_overlap_matrices``
    (rnn/models/physics_rad.py:688-872) without its Python loop over
    interfaces: each interface only needs the region fractions of the two
    adjacent layers, so the whole construction vectorizes over levels —
    one fused elementwise pass on the VPU instead of nlev+1 sequential
    kernel launches.

    Args:
      region_fracs: [B, nlev, nreg] area fraction of each subgrid region
        per layer (region 0 = clear sky), TOA first.
      overlap_param: [B, nlev-1] beta overlap parameter per interior
        interface.

    Returns:
      v_matrix [B, nlev+1, nreg, nreg] with ``v[..., jlower, jupper]`` =
      fraction of downwelling flux leaving region ``jupper`` of the layer
      above interface ``jlev`` that enters region ``jlower`` below it.
      Interface 0 = TOA, interface nlev = surface (single clear region on
      the far side of both).
    """
    th = cloud_fraction_threshold
    B, nlev, nreg = region_fracs.shape
    dt = region_fracs.dtype

    # single clear-sky region outside the atmosphere (TOA above / sfc below)
    clear = jnp.zeros((B, 1, nreg), dt).at[:, :, 0].set(1.0)
    frac_upper = jnp.concatenate([clear, region_fracs], axis=1)  # [B,L+1,R]
    frac_lower = jnp.concatenate([region_fracs, clear], axis=1)

    # overlap parameter per interface: TOA and surface get op=1 (single
    # upper region makes it irrelevant); cloudy regions use op0^2 when
    # op0>=0 else op0 (physics_rad.py:768-773).
    op0 = jnp.pad(overlap_param, ((0, 0), (1, 1)), constant_values=1.0)
    op_cld = jnp.where(op0 >= 0.0, op0 * op0, op0)
    op = jnp.concatenate(
        [op0[..., None], jnp.repeat(op_cld[..., None], nreg - 1, -1)],
        axis=-1)                                                # [B,L+1,R]

    oxm = op * jnp.minimum(frac_upper, frac_lower)
    denom = 1.0 - oxm.sum(-1)
    factor = jnp.where(denom >= th, 1.0 / jnp.maximum(denom, th), 0.0)
    ru = frac_upper - oxm
    rl = frac_lower - oxm
    # overlap[jupper, jlower] = factor*ru[jupper]*rl[jlower] + diag(oxm)
    overlap = factor[..., None, None] * ru[..., :, None] * rl[..., None, :] \
        + oxm[..., :, None] * jnp.eye(nreg, dtype=dt)
    # v[jlower, jupper] = overlap[jupper, jlower] / max(frac_upper, th)
    inv_fu = 1.0 / jnp.maximum(frac_upper, th)
    return jnp.swapaxes(overlap, -1, -2) * inv_fu[..., None, :]


def adding_sw_tc(incoming_toa, albedo_surf_diffuse, albedo_surf_direct,
                 R, T, ref_dir, T_dir_diff, T_dir_dir, V):
    """TripleClouds SW adding solver with inter-region overlap mixing
    (rnn/models/physics_rad.py:421-532 ``adding_tc_sw_batchlast_opt``).

    Region-resolved fluxes are mixed through the directional overlap
    matrix ``V`` at the interface above every layer: the up sweep maps
    below-interface albedos into the regions of the layer above
    (energy-weighted adjoint, ``a·V``), the down sweep redistributes the
    downwelling direct/diffuse fluxes into the regions of the layer below
    (``V·f``). With ``V = I`` per region this reduces exactly to the ICA
    solver.

    Args:
      incoming_toa, albedo_surf_*: [B, nreg] (fold g-points into B).
      R, T, ref_dir, T_dir_diff, T_dir_dir: [B, nlev, nreg], TOA first.
      V: [B, nlev+1, nreg, nreg] from :func:`calc_overlap_matrices`
         (interface ``nlev`` is unused, matching the reference).

    Returns (flux_up, flux_dn_diffuse, flux_dn_direct), each
    [B, nlev+1, nreg].
    """
    dtc = jnp.result_type(incoming_toa, albedo_surf_diffuse,
                          albedo_surf_direct, R, T)
    (incoming_toa, albedo_surf_diffuse, albedo_surf_direct, R, T, ref_dir,
     T_dir_diff, T_dir_dir, V) = (
        a.astype(dtc) for a in (incoming_toa, albedo_surf_diffuse,
                                albedo_surf_direct, R, T, ref_dir,
                                T_dir_diff, T_dir_dir, V))
    Rl = jnp.swapaxes(R, 0, 1)          # [nlev, B, nreg]
    Tl = jnp.swapaxes(T, 0, 1)
    rdir = jnp.swapaxes(ref_dir, 0, 1)
    tdd = jnp.swapaxes(T_dir_diff, 0, 1)
    tdir = jnp.swapaxes(T_dir_dir, 0, 1)
    Vl = jnp.swapaxes(V[:, :-1], 0, 1)  # [nlev, B, nreg, nreg]

    def up(carry, inp):
        alb, albdir = carry
        Rj, Tj, rdj, tddj, tdj, Vj = inp
        inv = 1.0 / (1.0 - alb * Rj)
        albdir_new = rdj + (tdj * albdir + tddj * alb) * Tj * inv
        alb_new = Rj + Tj * Tj * alb * inv
        # map "albedo of everything below" across the interface above this
        # layer: new[jupper] = sum_jlower a[jlower] * V[jlower, jupper]
        albdir_new = jnp.einsum('bl,blu->bu', albdir_new, Vj)
        alb_new = jnp.einsum('bl,blu->bu', alb_new, Vj)
        return (alb_new, albdir_new), (alb_new, albdir_new)

    carry0 = (albedo_surf_diffuse, albedo_surf_direct)
    _, (albs, albdirs) = jax.lax.scan(
        up, carry0, (Rl, Tl, rdir, tdd, tdir, Vl), reverse=True)
    albs = jnp.concatenate([albs, albedo_surf_diffuse[None]], axis=0)
    albdirs = jnp.concatenate([albdirs, albedo_surf_direct[None]], axis=0)

    def down(carry, inp):
        fdndir, fdndiff = carry
        Rj, Tj, rdj, tddj, tdj, Vj, alb1, adir1 = inp
        fdndiff = (Tj * fdndiff + fdndir * (Tj * adir1 * Rj + tddj)) \
            / (1.0 - Rj * alb1)
        fdndir = fdndir * tdj
        # redistribute into the regions of the layer below:
        # new[jlower] = sum_jupper V[jlower, jupper] * f[jupper]
        fdndir = jnp.einsum('blu,bu->bl', Vj, fdndir)
        fdndiff = jnp.einsum('blu,bu->bl', Vj, fdndiff)
        fup = fdndir * adir1 + fdndiff * alb1
        return (fdndir, fdndiff), (fup, fdndiff, fdndir)

    zeros = jnp.zeros_like(incoming_toa)
    _, (fups, fdiffs, fdirs) = jax.lax.scan(
        down, (incoming_toa, zeros),
        (Rl, Tl, rdir, tdd, tdir, Vl, albs[1:], albdirs[1:]))

    flux_up = jnp.concatenate([(incoming_toa * albdirs[0])[None], fups],
                              axis=0)
    flux_dn_diffuse = jnp.concatenate([zeros[None], fdiffs], axis=0)
    flux_dn_direct = jnp.concatenate([incoming_toa[None], fdirs], axis=0)
    return (jnp.swapaxes(flux_up, 0, 1),
            jnp.swapaxes(flux_dn_diffuse, 0, 1),
            jnp.swapaxes(flux_dn_direct, 0, 1))


def stratified_sample(p: jnp.ndarray, G: int) -> jnp.ndarray:
    """Deterministically assign ``G`` spectral points among N subgrid
    states proportional to area fractions ``p`` [B, N] (largest-remainder
    apportionment) — the McICA-with-zero-bias trick of the reference
    (rnn/models/physics_rad.py:533-589, used at models_phys.py:868).

    Returns int32 indices [B, G]: gather ``x[B, N] -> x[B, G]``. Static
    shapes and sort-based ranking keep it jit/TPU friendly.
    """
    B, N = p.shape
    exact = p * G
    floors = jnp.floor(exact).astype(jnp.int32)
    remainders = exact - floors
    deficit = G - floors.sum(-1, keepdims=True)
    order = jnp.argsort(-remainders, axis=-1)          # descending
    rank = jnp.argsort(order, axis=-1)
    counts = floors + (rank < deficit).astype(jnp.int32)
    # state index of spectral point g = #states whose cumulative count <= g
    ends = jnp.cumsum(counts, axis=-1)                 # [B, N]
    g = jnp.arange(G, dtype=ends.dtype)
    return (g[None, :, None] >= ends[:, None, :]).sum(-1).astype(jnp.int32)


def take_small_axis(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather along the (small) last axis as a one-hot contraction:
    x [..., N] at idx [..., G] -> [..., G].

    XLA:TPU lowers per-element gathers (and, worse, their scatter-add
    VJPs) catastrophically — the McICA take_along_axis calls dominated
    the physics-training epoch. For small N (subgrid regions ~8) a
    select-and-reduce is exact, rides the VPU, and its VJP is the same
    masked reduction (no scatter). jnp.where (not a 0/1 multiply) keeps
    it NaN-safe: non-selected lanes may legitimately hold non-finite
    values (degenerate zero-area subgrid regions) that a one-hot matmul
    would propagate as 0*NaN."""
    N = x.shape[-1]
    ids = jnp.arange(N, dtype=jnp.int32)
    oh = idx[..., None] == ids                         # bool [..., G, N]
    return jnp.sum(jnp.where(oh, x[..., None, :],
                             jnp.zeros((), x.dtype)), axis=-1)


def heating_rate(flux_net: jnp.ndarray, dp: jnp.ndarray,
                 grav: float = 9.80616,
                 cp: float = 1.00464e3) -> jnp.ndarray:
    """Convert net downward flux at half-levels [B, nlev+1] to a layer
    temperature tendency [K/s]: absorbed = F_net(top) - F_net(bottom);
    dT/dt = g/cp * absorbed/dp."""
    dF = flux_net[:, :-1] - flux_net[:, 1:]
    return grav / cp * dF / dp
