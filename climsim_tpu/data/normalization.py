"""Normalization statistics: loading, assembly, and device-side application.

The reference spreads normalization across three places:
* netCDF stat files (``preprocessing/normalizations/{inputs,outputs}/*.nc``)
  with per-variable scalar or per-level entries;
* the hydra trainer assembling per-feature coefficient matrices, including
  exponential cloud-transform lambdas and a zero-division fix for gases
  (rnn/train_rnn_rollout_torchscript_hydra.py:323-456);
* host-side numba loops applying them per batch (rnn/utils.py:1826-1865).

Here stats are assembled once on host into dense arrays matching a
:class:`~climsim_tpu.variables.VariableSet` layout, then applied on device as
fused jnp ops:  input ``(x - mean) / (max - min)``, output ``y * scale``
(data_utils.py:874-875, 1097-1099).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .. import variables as V
from ..io import read_netcdf

NLEV = V.NLEV


def _per_feature(stats: dict[str, np.ndarray], layout: V.FeatureLayout,
                 default: float) -> np.ndarray:
    """Flatten per-variable stats (scalar or [lev]) to a flat feature vector."""
    out = np.full(layout.total, default, np.float64)
    for name in layout.names:
        sl = layout.slices[name]
        if name not in stats:
            continue
        v = np.asarray(stats[name], np.float64).ravel()
        n = sl.stop - sl.start
        if v.size == 1:
            out[sl] = v[0]
        elif v.size == n:
            out[sl] = v
        else:  # per-level stat for a scalar var or vice versa: broadcast mean
            out[sl] = v.mean()
    return out


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class Normalizer:
    """Flat-feature normalization for one variable set.

    x_norm = (x - mean) / div,  y_norm = y * scale  (div = max - min with a
    zero-division guard mirroring the trainer's CH4/N2O fix,
    train_rnn_rollout_torchscript_hydra.py:410-421).
    """

    mean: jnp.ndarray    # [nx]
    div: jnp.ndarray     # [nx]
    scale: jnp.ndarray   # [ny]

    def tree_flatten(self):
        return (self.mean, self.div, self.scale), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # ---- application (device, fuses under jit) ----

    def normalize_input(self, x: jnp.ndarray) -> jnp.ndarray:
        return (x - self.mean) / self.div

    def denormalize_input(self, x: jnp.ndarray) -> jnp.ndarray:
        return x * self.div + self.mean

    def scale_output(self, y: jnp.ndarray) -> jnp.ndarray:
        return y * self.scale

    def unscale_output(self, y: jnp.ndarray) -> jnp.ndarray:
        return y / self.scale

    # ---- construction ----

    @classmethod
    def from_arrays(cls, mean, maxv, minv, scale, eps: float = 0.0,
                    dtype=jnp.float32) -> "Normalizer":
        mean = np.asarray(mean, np.float64)
        div = np.asarray(maxv, np.float64) - np.asarray(minv, np.float64)
        # zero-range guard: features with max==min carry no signal; divide by 1
        div = np.where(np.abs(div) < 1e-30, 1.0, div)
        return cls(jnp.asarray(mean, dtype), jnp.asarray(div, dtype),
                   jnp.asarray(np.asarray(scale, np.float64), dtype))

    @classmethod
    def from_files(cls, vset: V.VariableSet, input_mean: str, input_max: str,
                   input_min: str, output_scale: str,
                   dtype=jnp.float32) -> "Normalizer":
        """Build from the reference normalization netCDF files."""
        m = read_netcdf(input_mean)
        mx = read_netcdf(input_max)
        mn = read_netcdf(input_min)
        sc = read_netcdf(output_scale)
        mean = _per_feature(m, vset.inputs, 0.0)
        maxv = _per_feature(mx, vset.inputs, 1.0)
        minv = _per_feature(mn, vset.inputs, 0.0)
        scale = _per_feature(sc, vset.outputs, 1.0)
        return cls.from_arrays(mean, maxv, minv, scale, dtype=dtype)

    @classmethod
    def identity(cls, vset: V.VariableSet, dtype=jnp.float32) -> "Normalizer":
        nx, ny = vset.input_feature_len, vset.target_feature_len
        return cls(jnp.zeros(nx, dtype), jnp.ones(nx, dtype),
                   jnp.ones(ny, dtype))


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class LevelNormalizer:
    """Keeplev-layout normalization: separate (lev, sfc) coefficient matrices,
    the layout the rnn/ stack trains from (rnn/utils.py:2252-2277).

    x_lev: [..., nlev, n_lev_vars], x_sfc: [..., n_sfc_vars].
    Coefficients may be per-level ([nlev, n]) or scalar-per-var ([1, n]).
    """

    mean_lev: jnp.ndarray   # [nlev or 1, nx_lev]
    div_lev: jnp.ndarray
    mean_sfc: jnp.ndarray   # [nx_sfc]
    div_sfc: jnp.ndarray
    scale_lev: jnp.ndarray  # [nlev or 1, ny_lev]
    scale_sfc: jnp.ndarray  # [ny_sfc]

    def tree_flatten(self):
        return ((self.mean_lev, self.div_lev, self.mean_sfc, self.div_sfc,
                 self.scale_lev, self.scale_sfc), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def normalize(self, x_lev, x_sfc):
        return ((x_lev - self.mean_lev) / self.div_lev,
                (x_sfc - self.mean_sfc) / self.div_sfc)

    def denormalize(self, x_lev, x_sfc):
        return (x_lev * self.div_lev + self.mean_lev,
                x_sfc * self.div_sfc + self.mean_sfc)

    def scale_output(self, y_lev, y_sfc):
        return y_lev * self.scale_lev, y_sfc * self.scale_sfc

    def unscale_output(self, y_lev, y_sfc):
        return y_lev / self.scale_lev, y_sfc / self.scale_sfc

    @classmethod
    def from_var_stats(cls, vset: V.VariableSet, mean: dict, maxv: dict,
                       minv: dict, scale: dict, per_level: bool = True,
                       dtype=jnp.float32) -> "LevelNormalizer":
        """Assemble from per-variable stat dicts (numpy scalars or [lev])."""
        inl, outl = vset.inputs, vset.outputs

        def mat(stats, names, default, rows):
            out = np.full((rows, len(names)), default, np.float64)
            for j, n in enumerate(names):
                if n not in stats:
                    continue
                v = np.asarray(stats[n], np.float64).ravel()
                if v.size == rows:
                    out[:, j] = v
                else:
                    out[:, j] = v.mean()
            return out

        rows = NLEV if per_level else 1
        mean_lev = mat(mean, inl.lev_names, 0.0, rows)
        div_lev = (mat(maxv, inl.lev_names, 1.0, rows)
                   - mat(minv, inl.lev_names, 0.0, rows))
        div_lev = np.where(np.abs(div_lev) < 1e-30, 1.0, div_lev)
        mean_sfc = mat(mean, inl.sfc_names, 0.0, 1)[0]
        div_sfc = (mat(maxv, inl.sfc_names, 1.0, 1)[0]
                   - mat(minv, inl.sfc_names, 0.0, 1)[0])
        div_sfc = np.where(np.abs(div_sfc) < 1e-30, 1.0, div_sfc)
        scale_lev = mat(scale, outl.lev_names, 1.0, rows)
        scale_sfc = mat(scale, outl.sfc_names, 1.0, 1)[0]
        j = lambda a: jnp.asarray(a, dtype)
        return cls(j(mean_lev), j(div_lev), j(mean_sfc), j(div_sfc),
                   j(scale_lev), j(scale_sfc))

    @classmethod
    def from_files(cls, vset: V.VariableSet, input_mean: str, input_max: str,
                   input_min: str, output_scale: str, per_level: bool = True,
                   dtype=jnp.float32) -> "LevelNormalizer":
        return cls.from_var_stats(
            vset, read_netcdf(input_mean), read_netcdf(input_max),
            read_netcdf(input_min), read_netcdf(output_scale),
            per_level=per_level, dtype=dtype)

    @classmethod
    def identity(cls, vset: V.VariableSet, dtype=jnp.float32):
        inl, outl = vset.inputs, vset.outputs
        return cls(jnp.zeros((1, inl.n_lev_vars), dtype),
                   jnp.ones((1, inl.n_lev_vars), dtype),
                   jnp.zeros(inl.n_sfc_vars, dtype),
                   jnp.ones(inl.n_sfc_vars, dtype),
                   jnp.ones((1, outl.n_lev_vars), dtype),
                   jnp.ones(outl.n_sfc_vars, dtype))


REF_NORM_DIR = "/root/reference/preprocessing/normalizations"


def reference_norm_paths(input_mean=None, input_max=None, input_min=None,
                         output_scale=None) -> dict:
    """Resolve the norm-file paths :func:`reference_level_normalizer` will
    load (defaults included). Exposed so callers can RECORD them next to
    checkpoints/configs: the v5-lowerthred output scale became the default
    in round 3, and a checkpoint trained under a different output_scale
    decodes to wrong raw units if evaluated under another (ADVICE r4)."""
    return {
        "input_mean": input_mean
        or f"{REF_NORM_DIR}/inputs/input_mean_v4_pervar.nc",
        "input_max": input_max
        or f"{REF_NORM_DIR}/inputs/input_max_v4_pervar.nc",
        "input_min": input_min
        or f"{REF_NORM_DIR}/inputs/input_min_v4_pervar.nc",
        "output_scale": output_scale
        or f"{REF_NORM_DIR}/outputs/output_scale_std_lowerthred_v5.nc",
    }


def reference_level_normalizer(vset: V.VariableSet,
                               input_mean: str | None = None,
                               input_max: str | None = None,
                               input_min: str | None = None,
                               output_scale: str | None = None,
                               snowhice_fix: bool = True,
                               remove_past_sfc: bool = False,
                               dtype=jnp.float32) -> "LevelNormalizer":
    """Assemble coefficients EXACTLY as the reference hydra driver does
    (rnn/train_rnn_rollout_torchscript_hydra.py:323-456) from the shipped
    per-variable norm files (input_{mean,max,min}_v4_pervar.nc,
    output_scale_std_lowerthred_v5.nc — the file the reference driver
    unconditionally loads at :137; pass ``output_scale`` to use the plain
    output_scale.nc instead):

    * per-level mean and (max - min) div for every level variable, scalar
      mean/div for surface variables, y scale from output_scale;
    * zero-division fix for channels whose div vanishes in part of the
      column (CH4/N2O in the lower atmosphere): zeros replaced by the
      channel's smallest positive div (driver :410-421);
    * ``snowhice_fix``: SNOWHICE is overwritten upstream by the >=1e10
      sentinel rewrite, so its normalization is neutralized
      (mean 0, div 1; driver :452-455);
    * ``remove_past_sfc``: drop the five tm_* previous-step surface
      channels (driver :433-437) to match data.remove_past_sfc_inputs.
    """
    paths = reference_norm_paths(input_mean, input_max, input_min,
                                 output_scale)
    mean = read_netcdf(paths["input_mean"])
    maxv = read_netcdf(paths["input_max"])
    minv = read_netcdf(paths["input_min"])
    scale = read_netcdf(paths["output_scale"])
    inl, outl = vset.inputs, vset.outputs

    def mat(stats, names, rows):
        out = np.zeros((rows, len(names)), np.float64)
        for j, n in enumerate(names):
            if n not in stats:
                raise KeyError(f"variable {n!r} missing from norm file")
            v = np.asarray(stats[n], np.float64).ravel()
            out[:, j] = v if v.size == rows else v.mean()
        return out

    mean_lev = mat(mean, inl.lev_names, NLEV)
    div_lev = mat(maxv, inl.lev_names, NLEV) - mat(minv, inl.lev_names, NLEV)
    # zero-division fix (CH4/N2O vanish below ~the tropopause in the files)
    for j in range(div_lev.shape[1]):
        col = div_lev[:, j]
        if (col == 0.0).any():
            pos = col[col > 0.0]
            col[col == 0.0] = pos.min() if pos.size else 1.0
    mean_sfc = mat(mean, inl.sfc_names, 1)[0]
    div_sfc = (mat(maxv, inl.sfc_names, 1)[0]
               - mat(minv, inl.sfc_names, 1)[0])
    div_sfc = np.where(div_sfc == 0.0, 1.0, div_sfc)
    if snowhice_fix and "cam_in_SNOWHICE" in inl.sfc_names:
        i = inl.sfc_names.index("cam_in_SNOWHICE")
        mean_sfc[i], div_sfc[i] = 0.0, 1.0
    if remove_past_sfc:
        keep = [i for i, n in enumerate(inl.sfc_names)
                if n not in ("tm_state_ps", "tm_pbuf_SOLIN",
                             "tm_pbuf_LHFLX", "tm_pbuf_SHFLX",
                             "tm_pbuf_COSZRS")]
        mean_sfc, div_sfc = mean_sfc[keep], div_sfc[keep]
    scale_lev = mat(scale, outl.lev_names, NLEV)
    scale_sfc = mat(scale, outl.sfc_names, 1)[0]
    j = lambda a: jnp.asarray(a, dtype)
    return LevelNormalizer(j(mean_lev), j(div_lev), j(mean_sfc), j(div_sfc),
                           j(scale_lev), j(scale_sfc))


def load_exp_lambdas(path: str) -> np.ndarray:
    """Per-level lambda for the exponential cloud transform from the
    reference's txt files (qc/qi/qn_exp_lambda_large.txt — one
    comma-separated row; whitespace-separated files also accepted)."""
    with open(path) as f:
        head = f.read(4096)
    delim = "," if "," in head else None
    return np.loadtxt(path, delimiter=delim).ravel()


def save_norm_txt(normalizer: Normalizer, save_path: str = "",
                  write_input: bool = True, write_output: bool = True):
    """Export flat normalization vectors as text files — the artifact the
    E3SM-side coupling consumes (data_utils.save_norm:1365-1399 writes
    inp_sub.txt, inp_div.txt, out_scale.txt)."""
    import os
    if write_input:
        np.savetxt(os.path.join(save_path, "inp_sub.txt"),
                   np.asarray(normalizer.mean)[None], fmt="%.18e",
                   delimiter=",")
        np.savetxt(os.path.join(save_path, "inp_div.txt"),
                   np.asarray(normalizer.div)[None], fmt="%.18e",
                   delimiter=",")
    if write_output:
        np.savetxt(os.path.join(save_path, "out_scale.txt"),
                   np.asarray(normalizer.scale)[None], fmt="%.18e",
                   delimiter=",")


def fit_exp_lambdas(q: np.ndarray, threshold: float = 1e-7,
                    fill: float = 1e7) -> np.ndarray:
    """Derive the per-level exponential cloud-transform coefficients from
    data: lambda_l = 1/mean(q_l | q_l > threshold), levels with no cloud
    above threshold get ``fill`` (the reference's
    cloud_exponential_transformation notebook). q: [..., nlev] raw
    condensate."""
    nlev = q.shape[-1]
    flat = q.reshape(-1, nlev)
    lbd = np.full(nlev, np.nan)
    for i in range(nlev):
        col = flat[:, i]
        sel = col[col > threshold]
        if sel.size:
            lbd[i] = 1.0 / sel.mean()
    lbd[~np.isfinite(lbd)] = fill
    return lbd


def save_exp_lambdas(lbd: np.ndarray, path: str) -> None:
    """Write lambdas in the reference txt layout (one comma-separated
    row, consumed by :func:`load_exp_lambdas`)."""
    np.savetxt(path, np.asarray(lbd).reshape(1, -1), fmt="%e",
               delimiter=",")
