"""Water-budget closure demo: the physics check the reference teaches in
demo_notebooks/water_conservation.ipynb, on the framework's residuals.
Run: python examples/water_conservation.py
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", os.environ.get("CLIMSIM_PLATFORM", "cpu"))
import jax.numpy as jnp
import numpy as np

from climsim_tpu.grid import Grid
from climsim_tpu.data import synthetic as S
from climsim_tpu.physics import conservation
from climsim_tpu import variables as V

grid = Grid.from_file(
    "/root/reference/grid_info/ClimSim_low-res_grid-info.nc")
cfg = S.SyntheticConfig(vset_name="v4_rnn")
x_lev, x_sfc, y_lev, y_sfc = S.make_timeseries(
    jax.random.PRNGKey(0), cfg, grid, 8, flat=False)

# residual W = sum(dp/g * (dqv+dql+dqi)) + 1000*PRECC per column
sp = x_sfc[..., 0].reshape(-1)
res = conservation.water_residual(
    jnp.asarray(np.asarray(y_lev).reshape(-1, 60, 6)),
    jnp.asarray(np.asarray(y_sfc).reshape(-1, 8)),
    sp, grid.hyai, grid.hybi)
res = np.asarray(res)
sink = np.asarray(1000.0 * y_sfc.reshape(-1, 8)[:, 3])
print(f"water residual: mean {res.mean():.3e}, rms {np.sqrt((res**2).mean()):.3e} kg/m2/s")
print(f"precip magnitude (rms): {np.sqrt((sink**2).mean()):.3e} kg/m2/s")
print(f"relative closure: {np.sqrt((res**2).mean())/max(np.sqrt((sink**2).mean()),1e-30):.3f}")
print("(the synthetic physics closes the column water budget by construction;")
print(" snow-only imbalance remains because PRECSC overlaps PRECC)")
