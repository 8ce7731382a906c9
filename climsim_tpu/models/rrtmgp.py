"""RRTMGP-NN gas optics: schema-faithful weight loading, fabrication, and
the frozen-base / retrained-reduction training flow.

The reference rebuilds frozen gas-optics MLPs from netCDF weight files and
optionally retrains ONLY a replacement output layer that reduces the native
128 (LW) / 112 (SW) g-points to a smaller custom-band set, with Slingo-band
mapping and solar-source band weights (rnn/utils.py:314-645
``mlp_gasopt_inlined_processing`` / ``load_gas_optics_model``;
rnn/layers.py:170-281 ``gasopt_mlp``). The real weight files ARE present
in the snapshot under NN_GCM_NWP names
(rnn/data/rrtmgp-data-*-NN_GCM_NWP*.nc — see DEFAULT_LW/DEFAULT_SW below;
loading is parity-tested against the reference's own gasopt_mlp in
tests/test_rrtmgp.py); :func:`write_gas_optics_weights` additionally
fabricates schema-identical files for round-trip tests and for users who
regenerate weights elsewhere.

Schema (RRTMGP-NN convention, matching the reference loader
rnn/utils.py:616-645):
    nn_weights_1 [nx, nh], nn_weights_2 [nh, nh], nn_weights_3 [nh, ny]
    nn_bias_1 [nh], nn_bias_2 [nh], nn_bias_3 [ny]
    nn_input_coeffs_min / _max [nx]         (input normalization)
    nn_output_coeffs_mean / _std [ny or ng] (output de-scaling)
    nn_inputs: list of gas/feature names; 'cfc11' present => longwave
LW heads emit ny = 2*ng (tau || planck-fraction); SW emit ny = ng.
"""
from __future__ import annotations

import os
from typing import Sequence

import numpy as np

_REF_DATA = "/root/reference/rnn/data"
DEFAULT_LW = f"{_REF_DATA}/rrtmgp-data-lw-g128-210809_NN_GCM_NWP.nc"
DEFAULT_SW = f"{_REF_DATA}/rrtmgp-data-sw-g112-210809_NN_GCM_NWP_absorption.nc"
DEFAULT_SW_RAY = \
    f"{_REF_DATA}/rrtmgp-data-sw-g112-210809_NN_GCM_NWP_rayleigh.nc"

# RRTMGP's 14 SW bands (physical constants of the correlated-k model;
# rnn/utils.py:521-523)
RRTMGP_WAVENUM_LOW = [820, 2680, 3250, 4000, 4650, 5150, 6150, 7700, 8050,
                      12850, 16000, 22650, 29000, 38000]
RRTMGP_WAVENUM_HIGH = [2680, 3250, 4000, 4650, 5150, 6150, 7700, 8050,
                       12850, 16000, 22650, 29000, 38000, 50000]
RRTMGP_GPT_BOUNDS = [0, 10, 18, 29, 37, 46, 56, 67, 71, 80, 89, 96, 102,
                     109, 112]


# Native RRTMGP SW solar source per g-point (W/m2; physical data of the
# correlated-k distribution, total ~1360.4 — rnn/norm_coefficients.py:148)
RRTMGP_SW_SOLAR_SOURCE = np.array([
    6.12496233e+00, 1.93416357e+00, 1.54202783e+00, 1.27604854e+00,
    1.40585101e+00, 1.16409123e+00, 7.08588421e-01, 2.38161907e-01,
    2.80633457e-02, 1.17647192e-02, 4.77236032e+00, 1.41260576e+00,
    1.27267337e+00, 1.10027778e+00, 9.01670992e-01, 6.75989628e-01,
    5.17114103e-01, 1.23600028e-01, 2.81340289e+00, 3.00515079e+00,
    5.66785860e+00, 2.44188213e+00, 2.09266114e+00, 1.71121204e+00,
    1.28693295e+00, 8.72636437e-01, 2.37112761e-01, 7.54697174e-02,
    1.25168161e-02, 1.40388412e+01, 2.73778558e+00, 2.34644890e+00,
    1.90880454e+00, 1.42339087e+00, 9.49046195e-01, 1.84368953e-01,
    1.53579384e-01, 1.25842094e+01, 2.71192098e+00, 2.37346220e+00,
    1.95650840e+00, 1.47565520e+00, 1.00127935e+00, 2.00756401e-01,
    1.24308534e-01, 4.75310981e-02, 2.67146435e+01, 7.31047630e+00,
    6.03680420e+00, 5.62099934e+00, 4.40638685e+00, 3.24467373e+00,
    2.19979000e+00, 5.95967412e-01, 1.87873006e-01, 3.18016969e-02,
    3.11399059e+01, 1.48087206e+01, 1.36782532e+01, 1.23425665e+01,
    1.07046766e+01, 8.77752304e+00, 6.60841894e+00, 4.48445177e+00,
    1.21470773e+00, 3.84841442e-01, 6.44010156e-02, 2.31922035e+01,
    1.04592717e+00, 3.37244779e-01, 4.99117821e-02, 1.98145676e+02,
    4.06918793e+01, 3.51424675e+01, 2.87645893e+01, 2.16718941e+01,
    1.47965593e+01, 2.95515990e+00, 1.83591473e+00, 7.06192613e-01,
    6.58608856e+01, 1.23497276e+02, 1.37219658e+01, 9.39462662e+00,
    1.87920797e+00, 6.74776673e-01, 4.97130632e-01, 3.21763933e-01,
    1.38897270e-01, 6.36205292e+01, 5.73208961e+01, 5.15562134e+01,
    4.37227135e+01, 6.95342178e+01, 2.47825108e+01, 3.38733940e+01,
    3.04849205e+01, 2.82836380e+01, 2.06528168e+01, 2.52860794e+01,
    9.46283913e+00, 1.57151060e+01, 1.47029314e+01, 1.06884203e+01,
    7.67680740e+00, 5.14239740e+00, 3.29607511e+00, 1.44944358e+00,
    2.80638266e+00, 6.16410017e-01, 6.90493107e-01, 1.48562384e+00,
], np.float64)


def available(path: str = DEFAULT_LW) -> bool:
    """True when the RRTMGP weight netCDF is actually present (absent or
    truncated-placeholder files are rejected; full schema validation
    happens in :func:`read_gas_optics_schema`)."""
    try:
        return os.path.getsize(path) > 1 << 12
    except OSError:
        return False


# ----------------------------------------------------------------- schema IO

def write_gas_optics_weights(path: str, nx: int = 7, nh: int = 58,
                             ng: int = 112, lw: bool = False,
                             seed: int = 0,
                             inputs: Sequence[str] | None = None):
    """Fabricate an RRTMGP-NN-schema weight file (HDF5 container, the same
    netCDF4 flavor as the real blobs). Weight magnitudes follow the real
    models' regime: softsign activations, outputs y with
    tau = col_dry * (ystd*y + ymean)^8 staying O(1e-2..1e2) optical depth
    for col_dry ~ 1e2."""
    import h5py

    rng = np.random.default_rng(seed)
    ny = 2 * ng if lw else ng
    if inputs is None:
        inputs = (["tlay", "play", "h2o", "o3", "co2", "n2o", "ch4"]
                  if not lw else
                  ["tlay", "play", "h2o", "o3", "co2", "n2o", "ch4",
                   "cfc11", "cfc12"][:max(nx, 8)])
        inputs = list(inputs)[:nx]
        while len(inputs) < nx:
            inputs.append(f"gas{len(inputs)}")
        if lw and "cfc11" not in inputs:
            inputs[-1] = "cfc11"
    glorot = lambda nin, nout: rng.normal(
        0, np.sqrt(2.0 / (nin + nout)), (nin, nout)).astype(np.float32)
    with h5py.File(path, "w") as f:
        f["nn_weights_1"] = glorot(nx, nh)
        f["nn_weights_2"] = glorot(nh, nh)
        f["nn_weights_3"] = glorot(nh, ny)
        f["nn_bias_1"] = np.zeros(nh, np.float32)
        f["nn_bias_2"] = np.zeros(nh, np.float32)
        f["nn_bias_3"] = rng.normal(0, 0.05, ny).astype(np.float32)
        f["nn_input_coeffs_min"] = np.zeros(nx, np.float32)
        f["nn_input_coeffs_max"] = np.ones(nx, np.float32)
        f["nn_output_coeffs_mean"] = np.full(ng, 0.4, np.float32)
        f["nn_output_coeffs_std"] = np.full(ng, 0.1, np.float32)
        f["nn_inputs"] = np.asarray([s.encode() for s in inputs])
    return path


def read_gas_optics_schema(path: str) -> dict | None:
    """Parse an RRTMGP-NN weight file into raw arrays + metadata; None when
    the blob is unavailable (gate for callers)."""
    if not available(path):
        return None
    from ..io import read_netcdf

    try:
        raw = read_netcdf(path)
    except Exception:
        return None       # truncated/garbage placeholder
    need = ["nn_weights_1", "nn_weights_2", "nn_weights_3",
            "nn_bias_1", "nn_bias_2", "nn_bias_3",
            "nn_input_coeffs_min", "nn_input_coeffs_max",
            "nn_output_coeffs_mean", "nn_output_coeffs_std"]
    if any(k not in raw for k in need):
        return None
    names = [s.decode() if isinstance(s, bytes) else str(s)
             for s in np.ravel(raw.get("nn_inputs", []))]
    lw = any("cfc11" in s for s in names)
    ny = raw["nn_weights_3"].shape[-1]
    out = {k: np.asarray(raw[k], np.float32) for k in need}
    out.update(inputs=names, lw=lw, ny=int(ny),
               ng=int(ny // 2 if lw else ny),
               nx=int(raw["nn_weights_1"].shape[0]),
               nh=int(raw["nn_weights_1"].shape[1]))
    return out


# --------------------------------------------------------------- flax module

def _module():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    class RRTMGPGasOptics(nn.Module):
        """Pre-trained RRTMGP-NN gas-optics MLP with the reference's
        inlined postprocessing (rnn/layers.py:253-281): 3-layer softsign
        MLP; LW output splits into (tau_raw, planck_raw) with
        pfrac = planck_raw^2 (softmax-normalized when reduced); optical
        depth tau = col_dry * (ystd*tau_raw + ymean)^8.

        ``reduce_to`` replaces the output layer with a fresh trainable
        Dense of the reduced width (and, for LW, trainable ymean/ystd —
        gasopt_mlp's change_last_layer mode) while mlp1/mlp2 keep the
        frozen pre-trained weights; freeze them in the optimizer with
        :func:`reduced_retrain_tx`.
        """
        nx: int
        nh: int
        ng: int
        lw: bool = False
        reduce_to: int | None = None
        xmin: tuple = ()
        xdiv: tuple = ()
        ymean: tuple = ()
        ystd: tuple = ()

        @nn.compact
        def __call__(self, x_raw, col_dry):
            ng = self.reduce_to or self.ng
            ny = 2 * ng if self.lw else ng
            xmin = jnp.asarray(self.xmin, jnp.float32)
            xdiv = jnp.asarray(self.xdiv, jnp.float32)
            x = (x_raw - xmin) / xdiv
            h = jax.nn.soft_sign(nn.Dense(self.nh, name="mlp1")(x))
            h = jax.nn.soft_sign(nn.Dense(self.nh, name="mlp2")(h))
            y = nn.Dense(ny, name="mlp3")(h)
            if self.lw:
                tau_raw, planck = jnp.split(y, 2, axis=-1)
                pfrac = jnp.square(planck)
                if self.reduce_to is not None:
                    pfrac = jax.nn.softmax(pfrac, axis=-1)
            else:
                tau_raw = y
            if self.lw and self.reduce_to is not None:
                # adaptable normalization for the retrained head
                ymean = self.param("ymean",
                                   nn.initializers.constant(0.4), (ng,))
                ystd = self.param("ystd",
                                  nn.initializers.constant(0.1), (ng,))
            else:
                ymean = jnp.asarray(self.ymean[:ng], jnp.float32)
                ystd = jnp.asarray(self.ystd[:ng], jnp.float32)
            tau = col_dry[..., None] * jnp.power(ystd * tau_raw + ymean, 8)
            if self.lw:
                return tau, pfrac
            return tau

    return RRTMGPGasOptics


def load_gas_optics_weights(path: str, reduce_to: int | None = None,
                            seed: int = 0):
    """Build an :class:`RRTMGPGasOptics` module + parameter tree from a
    weight file. Returns None when the blob is unavailable.

    With ``reduce_to``, mlp3 (and LW ymean/ystd) are freshly initialized
    for retraining while mlp1/mlp2 carry the frozen pre-trained weights —
    the reference's reduced-gas-optics flow (rnn/utils.py:553-613)."""
    schema = read_gas_optics_schema(path)
    if schema is None:
        return None
    import jax
    import jax.numpy as jnp

    RRTMGPGasOptics = _module()
    xmin = schema["nn_input_coeffs_min"]
    xdiv = schema["nn_input_coeffs_max"] - xmin
    mod = RRTMGPGasOptics(
        nx=schema["nx"], nh=schema["nh"], ng=schema["ng"],
        lw=schema["lw"], reduce_to=reduce_to,
        xmin=tuple(float(v) for v in xmin),
        xdiv=tuple(float(v) for v in np.maximum(xdiv, 1e-12)),
        ymean=tuple(float(v) for v in schema["nn_output_coeffs_mean"]),
        ystd=tuple(float(v) for v in schema["nn_output_coeffs_std"]))
    params = mod.init(jax.random.PRNGKey(seed),
                      jnp.zeros((1, 1, schema["nx"])), jnp.ones((1, 1)))
    p = params["params"]
    lay = {"mlp1": ("nn_weights_1", "nn_bias_1"),
           "mlp2": ("nn_weights_2", "nn_bias_2")}
    if reduce_to is None:
        lay["mlp3"] = ("nn_weights_3", "nn_bias_3")
    new = dict(p)
    for name, (wk, bk) in lay.items():
        new[name] = {"kernel": jnp.asarray(schema[wk]),
                     "bias": jnp.asarray(schema[bk])}
    return mod, {"params": new}, schema


def load_reduced_checkpoint(path: str, native_ng: int = 112):
    """Load one of the reference's RETRAINED reduced gas-optics
    checkpoints (torch .pt from rnn/utils.py:553-613
    ``load_reduced_gas_optics_model``; e.g.
    rnn/data/sw_gasopt_bnd29-71-80-89-102_ng4-3-4-2-1-2_nh32_alpha0.10_abs.pt)
    into an :class:`RRTMGPGasOptics` module + params. Band boundaries in
    native g-space come from the ``bndA-B-..._ng`` filename convention.
    Returns None when the file is absent or torch is unavailable."""
    if not os.path.exists(path):
        return None
    import re

    import jax.numpy as jnp
    import torch

    ck = torch.load(path, map_location="cpu", weights_only=False)
    state = ck["model_state_dict"]
    t2n = lambda k: np.asarray(state[k].detach().cpu().numpy(), np.float32)
    ng = state["mlp3.weight"].shape[0]
    nh = state["mlp1.weight"].shape[0]
    nx = state["mlp1.weight"].shape[1]
    xmin = t2n("xmin")
    xdiv = t2n("xdiv") if "xdiv" in state else t2n("xmax") - xmin
    band_bounds = ck.get("band_bounds")
    native_bounds = ck.get("rrtmgp_band_bounds")
    if native_bounds is None:
        m = re.search(r"bnd([0-9-]+)_ng", os.path.basename(path))
        native_bounds = ([0] + [int(v) for v in m.group(1).split("-")]
                         + [native_ng]) if m else []

    RRTMGPGasOptics = _module()
    # reduced checkpoints with do_norm=False bake the scaling into the
    # head: tau = col_dry * y^8 => ymean 0, ystd 1
    do_norm = bool(ck.get("do_norm", False))
    mod = RRTMGPGasOptics(
        nx=nx, nh=nh, ng=ng, lw=False, reduce_to=None,
        xmin=tuple(float(v) for v in xmin),
        xdiv=tuple(float(v) for v in np.maximum(xdiv, 1e-12)),
        ymean=tuple([0.0] * ng) if not do_norm else tuple(
            float(v) for v in t2n("ymean")),
        ystd=tuple([1.0] * ng) if not do_norm else tuple(
            float(v) for v in t2n("ystd")))
    params = {"params": {
        "mlp1": {"kernel": jnp.asarray(t2n("mlp1.weight").T),
                 "bias": jnp.asarray(t2n("mlp1.bias"))},
        "mlp2": {"kernel": jnp.asarray(t2n("mlp2.weight").T),
                 "bias": jnp.asarray(t2n("mlp2.bias"))},
        "mlp3": {"kernel": jnp.asarray(t2n("mlp3.weight").T),
                 "bias": jnp.asarray(t2n("mlp3.bias"))},
    }}
    meta = {"band_bounds": band_bounds, "native_bounds": native_bounds,
            "sw_solar_weights_raw": t2n("sw_solar_weights").ravel()
            if "sw_solar_weights" in state else None,
            # the checkpoint carries its own native solar-source table
            # (slightly different vintage than RRTMGP_SW_SOLAR_SOURCE)
            "rrtmgp_solar": t2n("rrtmgp_sw_solar_weights").ravel()
            if "rrtmgp_sw_solar_weights" in state else None,
            "do_norm": do_norm, "ng": int(ng), "nh": int(nh),
            "nx": int(nx),
            # the inlined reference forward multiplies a fixed 1e-17 after
            # col_dry * y^8 when do_norm=False (rnn/utils.py:487-494)
            "coeff": 1e-17 if not do_norm else 1.0}
    return mod, params, meta


def reduced_retrain_tx(tx, params):
    """Optimizer wrapper for the reduce-retrain flow: zero updates for the
    frozen pre-trained trunk (mlp1/mlp2), train only the reduction head
    (mlp3 + LW ymean/ystd) — the reference's lock_weights semantics
    (rnn/layers.py:245-250)."""
    from ..train.finetune import freeze
    return freeze(tx, params, ["mlp1", "mlp2"])


# -------------------------------------------------- band mapping + solar src

def band_gpt_bounds(num_bands: int, gpt_bounds=None):
    """Split the native RRTMGP band list into ``num_bands`` contiguous
    custom bands along g-points; returns their g-point boundaries."""
    gb = list(gpt_bounds or RRTMGP_GPT_BOUNDS)
    nb = len(gb) - 1
    per = nb // num_bands
    idx = [0] + [gb[min((i + 1) * per, nb)] for i in range(num_bands)]
    idx[-1] = gb[-1]
    return idx


def slingo_band_weights(wavenum_bounds: Sequence[float]) -> np.ndarray:
    """Overlap weights mapping custom wavenumber bands onto the 4 Slingo
    cloud-optics coefficient sets (rnn/utils.py:414-432): weights[b, s] is
    the fraction of band b's wavenumber extent covered by Slingo band s
    (expressed in Slingo COEFFS index order)."""
    SLINGO_BOUNDS = [0.0, 4200.0, 8000.0, 14286.0, 50000.0]
    SLINGO_TO_COEFFS = [3, 2, 1, 0]
    nb = len(wavenum_bounds) - 1
    w = np.zeros((nb, 4), np.float32)
    for b in range(nb):
        wlo_b, whi_b = float(wavenum_bounds[b]), float(wavenum_bounds[b + 1])
        tot = 0.0
        for s in range(4):
            ov = max(0.0, min(whi_b, SLINGO_BOUNDS[s + 1])
                     - max(wlo_b, SLINGO_BOUNDS[s]))
            if ov > 0:
                w[b, SLINGO_TO_COEFFS[s]] += ov
                tot += ov
        if tot > 0:
            w[b] /= tot
    return w


def rrtmgp_bounds_to_wavenum_bounds(gpt_bounds: Sequence[int]):
    """Wavenumber edges of custom bands defined by g-point boundaries on
    the native RRTMGP SW grid (rnn/utils.py rrtmgp_bounds_to_wavenum
    _bounds)."""
    edges = [RRTMGP_WAVENUM_LOW[0]]
    native = list(RRTMGP_GPT_BOUNDS)
    for g in gpt_bounds[1:]:
        b = native.index(g)      # custom bounds align with native bands
        edges.append(RRTMGP_WAVENUM_HIGH[b - 1])
    return edges


def reduced_solar_weights(raw_weights, band_bounds: Sequence[int],
                          native_bounds: Sequence[int],
                          rrtmgp_solar: np.ndarray):
    """Solar-source weights for a reduced g-point set (the reference's
    get_solar_weights, rnn/utils.py:494-518): per custom band, softmax the
    learned raw weights within the band (``band_bounds`` indexes the
    REDUCED g-space), then scale each band so it sums to its fraction of
    the native RRTMGP solar source (``native_bounds`` indexes the NATIVE
    112-g space). Differentiable in ``raw_weights`` (trained alongside
    the reduction head); the result sums to 1."""
    import jax
    import jax.numpy as jnp

    src = jnp.asarray(rrtmgp_solar, jnp.float32).reshape(-1)
    total = jnp.sum(src)
    raw = jnp.asarray(raw_weights).reshape(-1)
    nb = len(band_bounds) - 1
    parts = []
    for b in range(nb):
        p_b = jnp.sum(src[native_bounds[b]:native_bounds[b + 1]]) / total
        seg = raw[band_bounds[b]:band_bounds[b + 1]]
        parts.append(jax.nn.softmax(seg) * p_b)
    return jnp.concatenate(parts)
