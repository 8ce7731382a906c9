"""Fused Pallas kernels for the radiative adding solvers.

The two-sweep SW adding method and the LW no-scattering solver
(physics/radiation.py) are 60-step sequential recurrences over tiny
per-level tensors. As ``lax.scan`` the carries round-trip HBM every
iteration and the online path (384 columns x ng<=16 g-points) is pure
latency; here each kernel runs BOTH sweeps for a column tile entirely in
VMEM — per-half-level albedos live in scratch, never in HBM.

Layout: level-leading ``[nlev, ng, B]`` inside the kernel so the batch
rides the 128-wide lane axis and the dynamic level index hits the cheap
leading dimension; the public wrappers accept the solver-standard
batch-first ``[B, nlev(, ng)]`` and transpose at the boundary.

Numerics are pinned to the scan solvers by parity tests
(tests/test_pallas.py) — including the reference's direct-reflection
form in the down sweep (adding_sw's conservative variant is matched by
passing the same inputs the scan path uses).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _adding_sw_kernel(toa_ref, ad_ref, adir_ref, R_ref, T_ref, rd_ref,
                      tdd_ref, tdir_ref, fup_ref, fdiff_ref, fdir_ref,
                      albs_ref, albdirs_ref, *, nlev: int,
                      conservative: bool):
    # ---- up sweep: system albedo below every half-level
    alb0 = ad_ref[:, :]              # [ng, bB]
    albdir0 = adir_ref[:, :]
    albs_ref[nlev] = alb0
    albdirs_ref[nlev] = albdir0

    def up(i, carry):
        alb, albdir = carry
        j = nlev - 1 - i
        Rj = R_ref[j]
        Tj = T_ref[j]
        inv = 1.0 / (1.0 - alb * Rj)
        albdir_new = rd_ref[j] + (tdir_ref[j] * albdir
                                  + tdd_ref[j] * alb) * Tj * inv
        alb_new = Rj + Tj * Tj * alb * inv
        albs_ref[j] = alb_new
        albdirs_ref[j] = albdir_new
        return alb_new, albdir_new

    jax.lax.fori_loop(0, nlev, up, (alb0, albdir0))

    # ---- down sweep
    fdndir0 = toa_ref[:, :]
    fdndiff0 = jnp.zeros_like(fdndir0)
    fup_ref[0] = fdndir0 * albdirs_ref[0]
    fdiff_ref[0] = fdndiff0
    fdir_ref[0] = fdndir0

    def down(j, carry):
        fdndir, fdndiff = carry
        Rj = R_ref[j]
        Tj = T_ref[j]
        tdj = tdir_ref[j]
        alb1 = albs_ref[j + 1]
        adir1 = albdirs_ref[j + 1]
        tref = tdj if conservative else Tj
        fdndiff = (Tj * fdndiff + fdndir * (tref * adir1 * Rj
                                            + tdd_ref[j])) \
            / (1.0 - Rj * alb1)
        fdndir = fdndir * tdj
        fup_ref[j + 1] = fdndir * adir1 + fdndiff * alb1
        fdiff_ref[j + 1] = fdndiff
        fdir_ref[j + 1] = fdndir
        return fdndir, fdndiff

    jax.lax.fori_loop(0, nlev, down, (fdndir0, fdndiff0))


def adding_sw_fused(incoming_toa, albedo_surf_diffuse, albedo_surf_direct,
                    R, T, ref_dir, T_dir_diff, T_dir_dir,
                    block_b: int = 128, conservative: bool = True,
                    interpret: bool = False):
    """Drop-in for :func:`climsim_tpu.physics.radiation.adding_sw` with a
    trailing g-point axis folded into the batch: layer args [B, nlev, ng],
    surface args [B, ng]; returns (flux_up, flux_dn_diffuse,
    flux_dn_direct) [B, nlev+1, ng]."""
    B, nlev, ng = R.shape
    dt = jnp.result_type(incoming_toa, R, T)

    def to_k(a):     # [B, nlev, ng] -> [nlev, ng, B]
        return jnp.transpose(a.astype(dt), (1, 2, 0))

    def sfc_k(a):    # [B, ng] -> [ng, B]
        return jnp.transpose(a.astype(dt), (1, 0))

    nb = -(-B // block_b)
    bB = min(block_b, B)
    lay = pl.BlockSpec((nlev, ng, bB), lambda i: (0, 0, i))
    sfc = pl.BlockSpec((ng, bB), lambda i: (0, i))
    out = pl.BlockSpec((nlev + 1, ng, bB), lambda i: (0, 0, i))

    kern = functools.partial(_adding_sw_kernel, nlev=nlev,
                             conservative=conservative)
    shape = jax.ShapeDtypeStruct((nlev + 1, ng, B), dt)
    fup, fdiff, fdir = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[sfc, sfc, sfc, lay, lay, lay, lay, lay],
        out_specs=[out, out, out],
        out_shape=[shape, shape, shape],
        scratch_shapes=[pltpu.VMEM((nlev + 1, ng, bB), dt)] * 2,
        interpret=interpret,
    )(sfc_k(incoming_toa), sfc_k(albedo_surf_diffuse),
      sfc_k(albedo_surf_direct), to_k(R), to_k(T), to_k(ref_dir),
      to_k(T_dir_diff), to_k(T_dir_dir))
    back = lambda a: jnp.transpose(a, (2, 0, 1))
    return back(fup), back(fdiff), back(fdir)


def _lw_noscat_kernel(trans_ref, sdn_ref, sup_ref, ssfc_ref, emis_ref,
                      fdn_ref, fup_ref, *, nlev: int):
    # ---- downward accumulation
    fdn0 = jnp.zeros_like(ssfc_ref[:, :])
    fdn_ref[0] = fdn0

    def down(j, fdn):
        fdn = trans_ref[j] * fdn + sdn_ref[j]
        fdn_ref[j + 1] = fdn
        return fdn

    fdn_sfc = jax.lax.fori_loop(0, nlev, down, fdn0)

    # ---- surface reflection + upward accumulation
    fup = emis_ref[:, :] * ssfc_ref[:, :] \
        + (1.0 - emis_ref[:, :]) * fdn_sfc
    fup_ref[nlev] = fup

    def up(i, fup):
        j = nlev - 1 - i
        fup = trans_ref[j] * fup + sup_ref[j]
        fup_ref[j] = fup
        return fup

    jax.lax.fori_loop(0, nlev, up, fup)


def lw_solver_noscat_fused(trans_lw, source_dn, source_up, source_sfc,
                           emissivity_surf, block_b: int = 128,
                           interpret: bool = False):
    """Drop-in for radiation.lw_solver_noscat with an explicit g axis:
    layer args [B, nlev, ng], surface [B, ng]; returns (flux_dn, flux_up)
    [B, nlev+1, ng]."""
    B, nlev, ng = trans_lw.shape
    dt = jnp.result_type(trans_lw, source_dn, source_up, source_sfc)
    to_k = lambda a: jnp.transpose(a.astype(dt), (1, 2, 0))
    sfc_k = lambda a: jnp.transpose(a.astype(dt), (1, 0))

    nb = -(-B // block_b)
    bB = min(block_b, B)
    lay = pl.BlockSpec((nlev, ng, bB), lambda i: (0, 0, i))
    sfc = pl.BlockSpec((ng, bB), lambda i: (0, i))
    out = pl.BlockSpec((nlev + 1, ng, bB), lambda i: (0, 0, i))
    shape = jax.ShapeDtypeStruct((nlev + 1, ng, B), dt)
    fdn, fup = pl.pallas_call(
        functools.partial(_lw_noscat_kernel, nlev=nlev),
        grid=(nb,),
        in_specs=[lay, lay, lay, sfc, sfc],
        out_specs=[out, out],
        out_shape=[shape, shape],
        interpret=interpret,
    )(to_k(trans_lw), to_k(source_dn), to_k(source_up),
      sfc_k(source_sfc), sfc_k(emissivity_surf))
    back = lambda a: jnp.transpose(a, (2, 0, 1))
    return back(fdn), back(fup)


# ------------------------------------------------------- backward kernels
#
# Hand-written VJPs for both solvers: replay the forward recurrences for
# the tile in VMEM scratch, then walk them backward accumulating input
# gradients — the whole BPTT stays on the VPU with zero HBM round-trips.
# No batch reductions (no weight grads), so ragged tiles need no masking:
# padding rows produce garbage grads that the block crop discards.


def _adding_sw_bwd_kernel(toa_ref, ad_ref, adir_ref, R_ref, T_ref, rd_ref,
                          tdd_ref, tdir_ref, dfup_ref, dfdiff_ref,
                          dfdir_ref,
                          dtoa_ref, dad_ref, dadir_ref, dR_ref, dT_ref,
                          drd_ref, dtdd_ref, dtdir_ref,
                          albs, albdirs, fdir_s, fdiff_s, galb, galbdir,
                          *, nlev: int):
    one = jnp.asarray(1.0, R_ref.dtype)

    # ---- replay up sweep (albedos below every half-level)
    albs[nlev] = ad_ref[:, :]
    albdirs[nlev] = adir_ref[:, :]

    def up(i, carry):
        alb, albdir = carry
        j = nlev - 1 - i
        Rj, Tj = R_ref[j], T_ref[j]
        inv = one / (one - alb * Rj)
        albdir_new = rd_ref[j] + (tdir_ref[j] * albdir
                                  + tdd_ref[j] * alb) * Tj * inv
        alb_new = Rj + Tj * Tj * alb * inv
        albs[j] = alb_new
        albdirs[j] = albdir_new
        return alb_new, albdir_new

    jax.lax.fori_loop(0, nlev, up, (ad_ref[:, :], adir_ref[:, :]))

    # ---- replay down sweep (direct/diffuse downwelling fluxes)
    fdir_s[0] = toa_ref[:, :]
    fdiff_s[0] = jnp.zeros_like(toa_ref[:, :])

    def down(j, carry):
        fdndir, fdndiff = carry
        Rj, Tj, tdj = R_ref[j], T_ref[j], tdir_ref[j]
        fdndiff = (Tj * fdndiff + fdndir * (tdj * albdirs[j + 1] * Rj
                                            + tdd_ref[j])) \
            / (one - Rj * albs[j + 1])
        fdndir = fdndir * tdj
        fdir_s[j + 1] = fdndir
        fdiff_s[j + 1] = fdndiff
        return fdndir, fdndiff

    jax.lax.fori_loop(0, nlev, down, (fdir_s[0], fdiff_s[0]))

    # ---- half-level albedo grads from fup[j] = fdir[j]*albdir[j]
    #      + fdiff[j]*alb[j] (whole-array, no loop)
    galb[...] = dfup_ref[...] * fdiff_s[...]
    galbdir[...] = dfup_ref[...] * fdir_s[...]

    # ---- down sweep backward (j = nlev-1 .. 0); carry = total grads on
    #      (fdndir[j+1], fdndiff[j+1])
    gdir0 = dfdir_ref[nlev] + dfup_ref[nlev] * albdirs[nlev]
    gdiff0 = dfdiff_ref[nlev] + dfup_ref[nlev] * albs[nlev]

    def dnb(i, carry):
        gdir, gdiff = carry
        j = nlev - 1 - i
        Rj, Tj, tdj, tddj = R_ref[j], T_ref[j], tdir_ref[j], tdd_ref[j]
        alb1, adir1 = albs[j + 1], albdirs[j + 1]
        denom = one - Rj * alb1
        fdirj, fdiffj = fdir_s[j], fdiff_s[j]
        fdiff1 = fdiff_s[j + 1]
        K = tdj * adir1 * Rj + tddj
        dN = gdiff / denom
        dT_ref[j] = dN * fdiffj
        dtdd_ref[j] = dN * fdirj
        dtdir_ref[j] = gdir * fdirj + dN * fdirj * adir1 * Rj
        dR_ref[j] = dN * fdirj * tdj * adir1 \
            + gdiff * fdiff1 * alb1 / denom
        galb[j + 1] += gdiff * fdiff1 * Rj / denom
        galbdir[j + 1] += dN * fdirj * tdj * Rj
        gdir_next = gdir * tdj + dN * K \
            + dfdir_ref[j] + dfup_ref[j] * albdirs[j]
        gdiff_next = dN * Tj + dfdiff_ref[j] + dfup_ref[j] * albs[j]
        return gdir_next, gdiff_next

    gdir, gdiff = jax.lax.fori_loop(0, nlev, dnb, (gdir0, gdiff0))
    dtoa_ref[:, :] = gdir      # fdndiff[0] == 0 (constant): grad dropped

    # ---- up sweep backward (j = 0 .. nlev-1); carry = total grads on
    #      (alb[j], albdir[j])
    def upb(j, carry):
        ga, gd = carry
        Rj, Tj, tdj, tddj = R_ref[j], T_ref[j], tdir_ref[j], tdd_ref[j]
        A1, Adir1 = albs[j + 1], albdirs[j + 1]
        inv = one / (one - A1 * Rj)
        M = tdj * Adir1 + tddj * A1
        drd_ref[j] = gd
        dtdir_ref[j] += gd * Adir1 * Tj * inv
        dtdd_ref[j] += gd * A1 * Tj * inv
        dT_ref[j] += ga * 2.0 * Tj * A1 * inv + gd * M * inv
        TAinv = Tj * A1 * inv
        dR_ref[j] += ga * (one + TAinv * TAinv) \
            + gd * M * Tj * A1 * inv * inv
        Tinv = Tj * inv
        gA1 = ga * Tj * Tinv * inv \
            + gd * (tddj * Tinv + M * Tinv * Rj * inv)
        gAdir1 = gd * tdj * Tinv
        return gA1 + galb[j + 1], gAdir1 + galbdir[j + 1]

    ga, gd = jax.lax.fori_loop(0, nlev, upb, (galb[0], galbdir[0]))
    dad_ref[:, :] = ga
    dadir_ref[:, :] = gd


def adding_sw_bwd_fused(args, cts, block_b: int = 128,
                        interpret: bool = False):
    """Gradients of adding_sw w.r.t. all eight inputs via the fused VMEM
    backward kernel. args = the forward inputs; cts = (dfup, dfdiff,
    dfdir) [B, nlev+1, ng]."""
    (toa, ad, adir, R, T, rd, tdd, tdir) = args
    dfup, dfdiff, dfdir = cts
    B, nlev, ng = R.shape
    dt = jnp.result_type(toa, R, T)
    to_k = lambda a: jnp.transpose(a.astype(dt), (1, 2, 0))
    sfc_k = lambda a: jnp.transpose(a.astype(dt), (1, 0))

    nb = -(-B // block_b)
    bB = min(block_b, B)
    lay = pl.BlockSpec((nlev, ng, bB), lambda i: (0, 0, i))
    sfc = pl.BlockSpec((ng, bB), lambda i: (0, i))
    half = pl.BlockSpec((nlev + 1, ng, bB), lambda i: (0, 0, i))
    lay_shape = jax.ShapeDtypeStruct((nlev, ng, B), dt)
    sfc_shape = jax.ShapeDtypeStruct((ng, B), dt)
    scr = pltpu.VMEM((nlev + 1, ng, bB), dt)
    outs = pl.pallas_call(
        functools.partial(_adding_sw_bwd_kernel, nlev=nlev),
        grid=(nb,),
        in_specs=[sfc, sfc, sfc, lay, lay, lay, lay, lay,
                  half, half, half],
        out_specs=[sfc, sfc, sfc, lay, lay, lay, lay, lay],
        out_shape=[sfc_shape, sfc_shape, sfc_shape,
                   lay_shape, lay_shape, lay_shape, lay_shape, lay_shape],
        scratch_shapes=[scr] * 6,
        interpret=interpret,
    )(sfc_k(toa), sfc_k(ad), sfc_k(adir), to_k(R), to_k(T), to_k(rd),
      to_k(tdd), to_k(tdir), to_k(dfup), to_k(dfdiff), to_k(dfdir))
    back_l = lambda a: jnp.transpose(a, (2, 0, 1))
    back_s = lambda a: jnp.transpose(a, (1, 0))
    (dtoa, dad, dadir, dR, dT, drd, dtdd, dtdir) = outs
    return (back_s(dtoa).astype(toa.dtype), back_s(dad).astype(ad.dtype),
            back_s(dadir).astype(adir.dtype), back_l(dR).astype(R.dtype),
            back_l(dT).astype(T.dtype), back_l(drd).astype(rd.dtype),
            back_l(dtdd).astype(tdd.dtype),
            back_l(dtdir).astype(tdir.dtype))


def _lw_noscat_bwd_kernel(trans_ref, sdn_ref, sup_ref, ssfc_ref, emis_ref,
                          dfdn_ref, dfup_ref,
                          dtrans_ref, dsdn_ref, dsup_ref, dssfc_ref,
                          demis_ref, fdn_s, fup_s, *, nlev: int):
    one = jnp.asarray(1.0, trans_ref.dtype)
    # ---- replay both accumulations
    fdn_s[0] = jnp.zeros_like(ssfc_ref[:, :])

    def down(j, fdn):
        fdn = trans_ref[j] * fdn + sdn_ref[j]
        fdn_s[j + 1] = fdn
        return fdn

    fdn_sfc = jax.lax.fori_loop(0, nlev, down, fdn_s[0])
    fup = emis_ref[:, :] * ssfc_ref[:, :] + (one - emis_ref[:, :]) * fdn_sfc
    fup_s[nlev] = fup

    def up(i, fup):
        j = nlev - 1 - i
        fup = trans_ref[j] * fup + sup_ref[j]
        fup_s[j] = fup
        return fup

    jax.lax.fori_loop(0, nlev, up, fup)

    # ---- up accumulation backward (ascending)
    def upb(j, g):
        dsup_ref[j] = g
        dtrans_ref[j] = g * fup_s[j + 1]
        return dfup_ref[j + 1] + g * trans_ref[j]

    g = jax.lax.fori_loop(0, nlev, upb, dfup_ref[0])
    demis_ref[:, :] = g * (ssfc_ref[:, :] - fdn_s[nlev])
    dssfc_ref[:, :] = g * emis_ref[:, :]

    # ---- down accumulation backward (descending)
    def dnb(i, h):
        j = nlev - 1 - i
        dsdn_ref[j] = h
        dtrans_ref[j] += h * fdn_s[j]
        return dfdn_ref[j] + h * trans_ref[j]

    jax.lax.fori_loop(0, nlev, dnb,
                      dfdn_ref[nlev] + g * (one - emis_ref[:, :]))


def lw_solver_noscat_bwd_fused(args, cts, block_b: int = 128,
                               interpret: bool = False):
    """Gradients of lw_solver_noscat w.r.t. all five inputs."""
    (trans, sdn, sup, ssfc, emis) = args
    dfdn, dfup = cts
    B, nlev, ng = trans.shape
    dt = jnp.result_type(trans, sdn, sup, ssfc)
    to_k = lambda a: jnp.transpose(a.astype(dt), (1, 2, 0))
    sfc_k = lambda a: jnp.transpose(a.astype(dt), (1, 0))

    nb = -(-B // block_b)
    bB = min(block_b, B)
    lay = pl.BlockSpec((nlev, ng, bB), lambda i: (0, 0, i))
    sfc = pl.BlockSpec((ng, bB), lambda i: (0, i))
    half = pl.BlockSpec((nlev + 1, ng, bB), lambda i: (0, 0, i))
    lay_shape = jax.ShapeDtypeStruct((nlev, ng, B), dt)
    sfc_shape = jax.ShapeDtypeStruct((ng, B), dt)
    outs = pl.pallas_call(
        functools.partial(_lw_noscat_bwd_kernel, nlev=nlev),
        grid=(nb,),
        in_specs=[lay, lay, lay, sfc, sfc, half, half],
        out_specs=[lay, lay, lay, sfc, sfc],
        out_shape=[lay_shape, lay_shape, lay_shape, sfc_shape, sfc_shape],
        scratch_shapes=[pltpu.VMEM((nlev + 1, ng, bB), dt)] * 2,
        interpret=interpret,
    )(to_k(trans), to_k(sdn), to_k(sup), sfc_k(ssfc), sfc_k(emis),
      to_k(dfdn), to_k(dfup))
    back_l = lambda a: jnp.transpose(a, (2, 0, 1))
    back_s = lambda a: jnp.transpose(a, (1, 0))
    (dtrans, dsdn, dsup, dssfc, demis) = outs
    return (back_l(dtrans).astype(trans.dtype),
            back_l(dsdn).astype(sdn.dtype),
            back_l(dsup).astype(sup.dtype),
            back_s(dssfc).astype(ssfc.dtype),
            back_s(demis).astype(emis.dtype))


# ---------------------------------------------------------------- fast paths

def _on_tpu() -> bool:
    from . import on_tpu
    return on_tpu()


@jax.custom_vjp
def adding_sw_fast(incoming_toa, albedo_surf_diffuse, albedo_surf_direct,
                   R, T, ref_dir, T_dir_diff, T_dir_dir):
    """SW adding solver with the fused VMEM kernel on the forward pass
    (5.3x over the scan at online shapes, PERFORMANCE.md) and the scan
    solver's VJP on the backward — fully differentiable drop-in for
    physics.radiation.adding_sw with an explicit g axis
    ([B, nlev, ng] layers / [B, ng] surface)."""
    return _sw_primal(incoming_toa, albedo_surf_diffuse, albedo_surf_direct,
                      R, T, ref_dir, T_dir_diff, T_dir_dir)


def _sw_primal(*args):
    if _on_tpu():
        return adding_sw_fused(*args)
    from ..physics.radiation import adding_sw
    return adding_sw(*args)


def _sw_fwd(*args):
    return _sw_primal(*args), args


def _sw_bwd(args, cts):
    if _on_tpu():
        return adding_sw_bwd_fused(args, cts)
    from ..physics.radiation import adding_sw
    _, vjp = jax.vjp(adding_sw, *args)
    return vjp(cts)


adding_sw_fast.defvjp(_sw_fwd, _sw_bwd)


@jax.custom_vjp
def lw_solver_noscat_fast(trans_lw, source_dn, source_up, source_sfc,
                          emissivity_surf):
    """LW no-scattering solver: fused VMEM kernel forward, scan VJP
    backward ([B, nlev, ng] / [B, ng])."""
    return _lw_primal(trans_lw, source_dn, source_up, source_sfc,
                      emissivity_surf)


def _lw_primal(*args):
    if _on_tpu():
        return lw_solver_noscat_fused(*args)
    from ..physics.radiation import lw_solver_noscat
    return lw_solver_noscat(*args)


def _lw_fwd(*args):
    return _lw_primal(*args), args


def _lw_bwd(args, cts):
    if _on_tpu():
        return lw_solver_noscat_bwd_fused(args, cts)
    from ..physics.radiation import lw_solver_noscat
    _, vjp = jax.vjp(lw_solver_noscat, *args)
    return vjp(cts)


lw_solver_noscat_fast.defvjp(_lw_fwd, _lw_bwd)
