"""RNN training example: the full rollout-training chain as a script.

The script-form equivalent of the reference's
demo_notebooks/RNN_training_example_new.ipynb: build the memory-BiRNN
emulator, store a keeplev time series in the byte-compatible H5 format,
load it back in time-contiguous chunks, train with autoregressive rollout
windows + mixed replay, and print the monitored validation scoreboard.

Run: python examples/rnn_training_example.py            (CPU, ~2 min)
     CLIMSIM_PLATFORM=axon python examples/rnn_training_example.py  (TPU)
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax

jax.config.update("jax_platforms",
                  os.environ.get("CLIMSIM_PLATFORM", "cpu"))
import jax.numpy as jnp
import numpy as np

from climsim_tpu.grid import Grid
from climsim_tpu.data import synthetic as S
from climsim_tpu.data.h5store import write_timeseries, KeeplevReader
from climsim_tpu.data.loader import keeplev_chunks
from climsim_tpu.models.rnn import RNNAutoreg
from climsim_tpu.train.rollout import RolloutTrainer, RolloutConfig
from climsim_tpu.train.epoch_metrics import epoch_metrics

GRID = "/root/reference/grid_info/ClimSim_low-res_grid-info.nc"

grid = Grid.from_file(GRID)
rng = np.random.default_rng(0)

# ---- 1. a synthetic v4_rnn-shaped time series, stored as keeplev H5
# (the storage format the whole reference rnn/ stack trains from,
# climsim_utils/data_utils.py:859-1199)
T, B, L, nx, nx_sfc, ny, ny_sfc = 24, 384, 60, 15, 24, 6, 8
x_lev = rng.normal(0, 1, (T, B, L, nx)).astype(np.float32)
x_sfc = rng.normal(0, 1, (T, B, nx_sfc)).astype(np.float32)
# targets in physical tendency units (~1e-5 K/s etc.); the trainer sees
# them scaled by yscale (the reference's output_scale contract)
y_lev = (np.tanh(x_lev[..., :ny]) * 0.5e-5).astype(np.float32)
y_sfc = (np.abs(x_sfc[..., :ny_sfc]) * 0.5e-5).astype(np.float32)
YSCALE = 1.0e5
sp = rng.uniform(9.6e4, 1.03e5, (T, B)).astype(np.float32)

h5path = os.path.join(tempfile.mkdtemp(), "data_v4_rnn_demo.h5")
write_timeseries(h5path, x_lev, x_sfc, y_lev, y_sfc)
data = KeeplevReader(h5path).load_all()
print(f"wrote + reloaded {h5path}:",
      {k: v.shape for k, v in data.items()})
xl = data["input_lev"].reshape(T, B, L, nx)
xs = data["input_sca"].reshape(T, B, nx_sfc)
yl = data["output_lev"].reshape(T, B, L, ny)
ysc = data["output_sca"].reshape(T, B, ny_sfc)

# ---- 2. the flagship emulator: surface-init upward sweep, TOA-init
# downward sweep, latent convective memory fed back each coupled step
hyam = tuple(float(v) for v in np.asarray(grid.hyam))
hybm = tuple(float(v) for v in np.asarray(grid.hybm))
model = RNNAutoreg(nx=nx, nx_sfc=nx_sfc, ny=ny, ny_sfc=ny_sfc,
                   nneur=(64, 64), nh_mem=8, cell="gru",
                   hyam=hyam, hybm=hybm, sp_mean=9.8e4, sp_div=1e4,
                   add_pres=False, output_prune=False)

# ---- 3. rollout training: window curriculum 1->2->3 steps, mixed
# replay, energy-conservation penalty, remat for long windows
cfg = RolloutConfig(rollout_schedule={0: 1, 2: 2, 4: 3}, lr=3e-3,
                    replay="mixed", replay_slice=(9, 14),
                    pred_slice=(0, 5), gradual_mixing_end_epoch=4,
                    w_energy=1e-12, remat=True)
trainer = RolloutTrainer(model, cfg, np.asarray(grid.hyai),
                         np.asarray(grid.hybi),
                         yscale_lev=jnp.full((1, 1, ny), YSCALE),
                         yscale_sca=jnp.full(ny_sfc, YSCALE))

chunks = lambda: keeplev_chunks(xl, xs, yl * YSCALE, ysc * YSCALE, sp,
                                chunk_size=6, shuffle=True)
params, opt, mem = trainer.init(jax.random.PRNGKey(0),
                                next(iter(chunks())))
for epoch in range(6):
    params, opt, mem, rec = trainer.run_epoch(params, opt, mem, chunks(),
                                              epoch)
    print(f"epoch {epoch}: window={rec['window']} "
          f"mix={rec['mix_frac']:.2f} loss={rec['loss']:.4f}")

# ---- 4. validation scoreboard (the reference's ~40 wandb metrics)
mem_v = jnp.zeros((B, L, 8), jnp.float32)
preds_l, preds_s = [], []
for t in range(T):
    out, osfc, mem_v = model.apply(params, jnp.asarray(xl[t]),
                                   jnp.asarray(xs[t]), mem_v)
    preds_l.append(np.asarray(out))
    preds_s.append(np.asarray(osfc))
met = epoch_metrics(jnp.asarray(np.concatenate(preds_l)) / YSCALE,
                    jnp.asarray(np.concatenate(preds_s)) / YSCALE,
                    jnp.asarray(yl.reshape(-1, L, ny)),
                    jnp.asarray(ysc.reshape(-1, ny_sfc)),
                    jnp.asarray(sp.reshape(-1)), grid.hyai, grid.hybi)
print({k: round(v, 4) for k, v in met.items()
       if k.startswith("R2_d") or k in ("h_conservation",
                                        "water_conservation")})
