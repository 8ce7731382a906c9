"""Quickstart: train + score an MLP emulator in ~a minute on CPU.

The script-form equivalent of the reference's demo_notebooks/
quickstart_example.ipynb. Run: python examples/quickstart.py
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", os.environ.get("CLIMSIM_PLATFORM", "cpu"))
import jax.numpy as jnp
import numpy as np

from climsim_tpu import variables as V
from climsim_tpu.grid import Grid
from climsim_tpu.data import synthetic as S, Normalizer, flat_batches
from climsim_tpu.models import mlp_for
from climsim_tpu.train import FitConfig, fit
from climsim_tpu.metrics import evaluate

grid = Grid.from_file(
    "/root/reference/grid_info/ClimSim_low-res_grid-info.nc")
vset = V.get("v1")

# 1. data (synthetic stand-in for the HF low-res set)
xs, ys = S.make_timeseries(jax.random.PRNGKey(0),
                           S.SyntheticConfig(vset_name="v1"), grid, 30)
x = np.asarray(xs).reshape(-1, 124)
y = np.asarray(ys).reshape(-1, 128)
nz = Normalizer.from_arrays(x.mean(0), x.max(0), x.min(0),
                            1 / (np.abs(y).std(0) + 1e-12))
xn = np.asarray(nz.normalize_input(jnp.asarray(x)))
yn = np.asarray(nz.scale_output(jnp.asarray(y)))
ntr = 24 * 384

# 2. train
model = mlp_for(vset, features=(256, 256))
state, hist = fit(
    model, vset, FitConfig(epochs=8, lr=1e-3),
    lambda: flat_batches(xn[:ntr], yn[:ntr], 1536),
    lambda: flat_batches(xn[ntr:], yn[ntr:], 1536, shuffle=False,
                         drop_remainder=False))
print("final:", hist[-1])

# 3. standardized weighted scoreboard
T = (len(xn) - ntr) // 384
pred = np.asarray(state.apply_fn(state.params,
                                 jnp.asarray(xn[ntr:ntr + T * 384])))
df = evaluate(jnp.asarray(pred.reshape(T, 384, 128)),
              jnp.asarray(yn[ntr:ntr + T * 384].reshape(T, 384, 128)),
              jnp.asarray(x[ntr:ntr + T * 384, vset.ps_index]
                          .reshape(T, 384)),
              vset, grid, scale=nz.scale)
print(df.round(3).to_string())
