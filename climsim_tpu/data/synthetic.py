"""Physically-plausible synthetic ClimSim data, generated on device.

The real E3SM-MMF dataset (HuggingFace netCDF, ~744 GB low-res) is not
present in this environment, and the reference repo's data blobs are
stripped. This module generates synthetic column states and targets with
the right shapes, magnitudes, and cross-variable structure so that every
downstream component (normalization, training, rollout, metrics, online
loop) can run end-to-end and learn a non-trivial mapping.

The synthetic "physics" is a smooth nonlinear function of the inputs (plus
controlled noise), so emulators can fit it and R2/MAE behave like real
training curves. Water/energy source terms are constructed to near-balance
so conservation diagnostics exercise realistically.

Layout matches the keeplev contract of the reference H5 pipeline
(data_utils.generator_keeplev:859, save_as_h5_keeplev_new:1039):
  x_lev [N, nlev, nx_lev], x_sfc [N, nx_sfc],
  y_lev [N, nlev, ny_lev], y_sfc [N, ny_sfc].
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from .. import variables as V
from ..grid import Grid
from ..physics import thermo


def _profile(key, ncol, nlev, sfc_val, top_val, rel_noise, dtype):
    """Smooth vertical profile from top_val (lev 0 = TOA) to sfc_val plus
    column-correlated noise."""
    s = jnp.linspace(0.0, 1.0, nlev, dtype=dtype)
    base = top_val + (sfc_val - top_val) * s ** 1.2
    k1, k2 = jax.random.split(key)
    colnoise = jax.random.normal(k1, (ncol, 1), dtype) * rel_noise
    levnoise = jax.random.normal(k2, (ncol, nlev), dtype) * rel_noise * 0.3
    return base[None, :] * (1.0 + colnoise + levnoise)


@dataclass(frozen=True)
class SyntheticConfig:
    vset_name: str = "v1"
    ncol: int = C.NCOL_LOWRES
    nlev: int = C.NLEV
    noise: float = 0.05
    target_noise: float = 0.02
    dtype: str = "float32"


def generate_state(key, cfg: SyntheticConfig, grid: Grid):
    """One 'timestep' of raw un-normalized inputs for all columns.

    Returns dict var -> [ncol(, nlev)] raw arrays for the union of v1..v5
    input variables actually needed by cfg's variable set.
    """
    vset = V.get(cfg.vset_name)
    dt = jnp.dtype(cfg.dtype)
    ncol, nlev = cfg.ncol, cfg.nlev
    keys = jax.random.split(key, 32)
    lat = grid.lat[:ncol] if grid.ncol >= ncol else jnp.linspace(-88, 88, ncol)

    coslat = jnp.cos(jnp.deg2rad(lat)).astype(dt)
    T_sfc = 255.0 + 45.0 * coslat
    T = _profile(keys[0], ncol, nlev, 1.0, 0.82, cfg.noise, dt) \
        * T_sfc[:, None]  # ~ 210 K aloft to T_sfc
    ps = (9.8e4 + 6e3 * coslat
          + 800.0 * jax.random.normal(keys[1], (ncol,), dt))
    pmid = grid.mid_pressure(ps)
    q_scale = 1.6e-2 * coslat + 1e-4
    q = q_scale[:, None] * jnp.exp(-4.0 * jnp.linspace(1.0, 0.0, nlev,
                                                       dtype=dt))[None, :]
    q = q * (1.0 + cfg.noise * jax.random.normal(keys[2], (ncol, nlev), dt))
    q = jnp.clip(q, 1e-9, None)
    qc = jnp.clip(2e-5 * jnp.exp(-((jnp.linspace(0, 1, nlev) - 0.75) / 0.12) ** 2)[None, :]
                  * (1.0 + jax.random.normal(keys[3], (ncol, nlev), dt)), 0, None)
    qi = jnp.clip(1e-5 * jnp.exp(-((jnp.linspace(0, 1, nlev) - 0.45) / 0.15) ** 2)[None, :]
                  * (1.0 + jax.random.normal(keys[4], (ncol, nlev), dt)), 0, None)
    u = 20.0 * jnp.sin(2 * jnp.deg2rad(lat))[:, None] \
        + 5.0 * jax.random.normal(keys[5], (ncol, nlev), dt)
    v = 3.0 * jax.random.normal(keys[6], (ncol, nlev), dt)
    rh = thermo.specific_to_relative_humidity(q, T, pmid)

    ozone = 5e-6 * jnp.exp(-((jnp.linspace(0, 1, nlev) - 0.15) / 0.12) ** 2)[None, :] \
        * jnp.ones((ncol, 1), dt)
    ch4 = jnp.full((ncol, nlev), 9.7e-7, dt)
    n2o = jnp.full((ncol, nlev), 4.8e-7, dt)

    solin = jnp.clip(1360.0 * coslat
                     + 30 * jax.random.normal(keys[7], (ncol,), dt), 0, None)
    state = {
        "state_t": T, "state_q0001": q, "state_q0002": qc, "state_q0003": qi,
        "state_rh": rh, "state_qn": qc + qi,
        "liq_partition": thermo.liquid_fraction(T),
        "state_u": u, "state_v": v,
        "state_ps": ps, "pbuf_SOLIN": solin,
        "pbuf_LHFLX": jnp.clip(80 * coslat + 20 * jax.random.normal(keys[8], (ncol,), dt), 0, None),
        "pbuf_SHFLX": jnp.clip(25 * coslat + 10 * jax.random.normal(keys[9], (ncol,), dt), 0, None),
        "pbuf_TAUX": 0.05 * jax.random.normal(keys[10], (ncol,), dt),
        "pbuf_TAUY": 0.05 * jax.random.normal(keys[11], (ncol,), dt),
        "pbuf_COSZRS": jnp.clip(coslat + 0.2 * jax.random.normal(keys[12], (ncol,), dt), 0, 1),
        "cam_in_ALDIF": jnp.clip(0.3 + 0.2 * jax.random.normal(keys[13], (ncol,), dt), 0.02, 0.95),
        "cam_in_ALDIR": jnp.clip(0.3 + 0.2 * jax.random.normal(keys[14], (ncol,), dt), 0.02, 0.95),
        "cam_in_ASDIF": jnp.clip(0.3 + 0.2 * jax.random.normal(keys[15], (ncol,), dt), 0.02, 0.95),
        "cam_in_ASDIR": jnp.clip(0.3 + 0.2 * jax.random.normal(keys[16], (ncol,), dt), 0.02, 0.95),
        "cam_in_LWUP": 5.67e-8 * T_sfc ** 4,
        "cam_in_ICEFRAC": jnp.clip(1 - 2 * coslat, 0, 1),
        "cam_in_LANDFRAC": jnp.clip(0.3 + 0.4 * jax.random.normal(keys[17], (ncol,), dt), 0, 1),
        "cam_in_OCNFRAC": jnp.clip(0.7 - 0.4 * jax.random.normal(keys[17], (ncol,), dt), 0, 1),
        "cam_in_SNOWHICE": jnp.clip(-0.1 + 0.2 * jax.random.normal(keys[18], (ncol,), dt), 0, None),
        "cam_in_SNOWHLAND": jnp.clip(0.05 * jax.random.normal(keys[19], (ncol,), dt), 0, None),
        "pbuf_ozone": ozone, "pbuf_CH4": ch4, "pbuf_N2O": n2o,
        "clat": jnp.cos(jnp.deg2rad(lat)).astype(dt),
        "slat": jnp.sin(jnp.deg2rad(lat)).astype(dt),
        "icol": jnp.arange(1, ncol + 1, dtype=dt),
    }
    # dynamics/previous-step features default to small tendencies
    zero_lev = 1e-6 * jax.random.normal(keys[20], (ncol, nlev), dt)
    for name in vset.inputs.names:
        if name not in state:
            if V.var_len(name) == nlev:
                state[name] = zero_lev * (1.0 + 0.1 * hash(name) % 7)
            else:
                base = {"tm_state_ps": ps, "tm_pbuf_SOLIN": solin}.get(name)
                state[name] = base if base is not None else \
                    0.01 * jax.random.normal(keys[21], (ncol,), dt)
    return state


def synthetic_physics(state: dict, grid: Grid, key, cfg: SyntheticConfig):
    """Deterministic nonlinear 'CRM' producing targets from inputs.

    A smooth surrogate: heating from shortwave absorption + latent heating
    proportional to moisture convergence-like terms; moistening opposing the
    humidity anomaly; condensate tendencies from a saturation-adjustment-like
    relaxation; winds damped. Surface fluxes derived from the column result,
    with precipitation balancing the column water sink so the water budget
    closes approximately.
    """
    dt = jnp.dtype(cfg.dtype)
    T, q = state["state_t"], state["state_q0001"]
    qc, qi = state["state_q0002"], state["state_q0003"]
    ps, solin = state["state_ps"], state["pbuf_SOLIN"]
    pmid = grid.mid_pressure(ps)
    rh = thermo.specific_to_relative_humidity(q, T, pmid)

    s = jnp.linspace(0.0, 1.0, cfg.nlev, dtype=dt)[None, :]
    sw_heat = (solin[:, None] / 1360.0) * 2e-5 * jnp.exp(-2 * (1 - s))
    lat_heat = 4e-5 * jnp.tanh(3 * (rh - 0.7)) * s
    dT = sw_heat + lat_heat \
        + 1e-5 * jnp.sin(3 * s) * (T / 280.0 - 1.0)
    dq = -2e-8 * jnp.tanh(3 * (rh - 0.7)) * s \
        - 5e-9 * (rh - 0.5)
    dqc = 5e-9 * jnp.tanh(5 * (rh - 0.9)) * thermo.liquid_fraction(T) * s
    dqi = 5e-9 * jnp.tanh(5 * (rh - 0.9)) * (1 - thermo.liquid_fraction(T)) * s
    du = -state["state_u"] * 1e-6
    dv = -state["state_v"] * 1e-6

    noise = cfg.target_noise
    if noise > 0:
        ks = jax.random.split(key, 4)
        dT = dT * (1 + noise * jax.random.normal(ks[0], dT.shape, dt))
        dq = dq * (1 + noise * jax.random.normal(ks[1], dq.shape, dt))
        dqc = dqc * (1 + noise * jax.random.normal(ks[2], dqc.shape, dt))
        dqi = dqi * (1 + noise * jax.random.normal(ks[3], dqi.shape, dt))

    # column water sink -> precip (closes the water budget by construction)
    dp_g = grid.mass_weights(ps)
    sink = -jnp.sum(dp_g * (dq + dqc + dqi), axis=1)        # kg m-2 s-1
    precc = jnp.clip(sink / C.RHO_H2O, 0.0, None)           # m s-1
    snow_frac = thermo.snow_fraction(T[:, -1])
    precsc = precc * snow_frac

    coszrs = state["pbuf_COSZRS"]
    netsw = solin * (1.0 - 0.3) * coszrs
    flwds = 5.67e-8 * (T[:, -1] ** 4) * 0.8
    sols = netsw * 0.3
    soll = netsw * 0.35
    solsd = netsw * 0.15
    solld = netsw * 0.2

    return {
        "ptend_t": dT, "ptend_q0001": dq, "ptend_q0002": dqc,
        "ptend_q0003": dqi, "ptend_qn": dqc + dqi,
        "ptend_u": du, "ptend_v": dv,
        "cam_out_NETSW": netsw, "cam_out_FLWDS": flwds,
        "cam_out_PRECSC": precsc, "cam_out_PRECC": precc,
        "cam_out_SOLS": sols, "cam_out_SOLL": soll,
        "cam_out_SOLSD": solsd, "cam_out_SOLLD": solld,
    }


def pack_keeplev(state: dict, target: dict, vset: V.VariableSet):
    """Pack per-variable dicts into the keeplev 4-tuple
    (x_lev, x_sfc, y_lev, y_sfc)."""
    x_lev = jnp.stack([state[n] for n in vset.inputs.lev_names], axis=-1)
    x_sfc = jnp.stack([state[n] for n in vset.inputs.sfc_names], axis=-1)
    y_lev = jnp.stack([target[n] for n in vset.outputs.lev_names], axis=-1)
    y_sfc = jnp.stack([target[n] for n in vset.outputs.sfc_names], axis=-1)
    return x_lev, x_sfc, y_lev, y_sfc


def pack_flat(state: dict, target: dict, vset: V.VariableSet):
    """Pack into flat (x [N, nx], y [N, ny]) vectors in registry order."""
    xs = [state[n] if V.var_len(n) == V.NLEV else state[n][:, None]
          for n in vset.inputs.names]
    ys = [target[n] if V.var_len(n) == V.NLEV else target[n][:, None]
          for n in vset.outputs.names]
    return jnp.concatenate(xs, axis=1), jnp.concatenate(ys, axis=1)


def make_timeseries(key, cfg: SyntheticConfig, grid: Grid, nsteps: int,
                    flat: bool = True):
    """Generate nsteps of (x, y) with temporal correlation (states evolve by
    applying the synthetic tendencies), jit-compiled as a lax.scan."""
    vset = V.get(cfg.vset_name)

    def step(carry, k):
        state = carry
        k1, k2 = jax.random.split(k)
        target = synthetic_physics(state, grid, k1, cfg)
        if flat:
            out = pack_flat(state, target, vset)
        else:
            out = pack_keeplev(state, target, vset)
        # advance prognostic state by the tendencies (+ small dynamics noise)
        new = dict(state)
        new["state_t"] = state["state_t"] + C.DT_STEP * target["ptend_t"] \
            + 0.1 * jax.random.normal(k2, state["state_t"].shape)
        new["state_q0001"] = jnp.clip(
            state["state_q0001"] + C.DT_STEP * target["ptend_q0001"], 1e-9, None)
        if "state_q0002" in state:
            new["state_q0002"] = jnp.clip(
                state["state_q0002"] + C.DT_STEP * target["ptend_q0002"], 0, None)
            new["state_q0003"] = jnp.clip(
                state["state_q0003"] + C.DT_STEP * target["ptend_q0003"], 0, None)
        pmid = grid.mid_pressure(new["state_ps"])
        new["state_rh"] = thermo.specific_to_relative_humidity(
            new["state_q0001"], new["state_t"], pmid)
        if "state_qn" in state:
            new["state_qn"] = new["state_q0002"] + new["state_q0003"]
            new["liq_partition"] = thermo.liquid_fraction(new["state_t"])
        return new, out

    k0, kscan = jax.random.split(key)
    state0 = generate_state(k0, cfg, grid)
    keys = jax.random.split(kscan, nsteps)
    _, outs = jax.lax.scan(step, state0, keys)
    return outs
