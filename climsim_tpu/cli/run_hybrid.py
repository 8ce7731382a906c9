"""Online hybrid simulation CLI — run the coupled emulator + advection host
loop (the ClimSim-Online 'run the hybrid simulation' step,
online_testing/README.md §5, without the Fortran host).

Usage:
    python -m climsim_tpu.cli.run_hybrid [--steps 48] [--scheme fv]
        [--checkpoint DIR] [--platform cpu] [--out diags.npz]

Without a checkpoint a randomly-initialized emulator runs (smoke mode).
"""
from __future__ import annotations

import argparse
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=48)
    p.add_argument("--scheme", default="fv",
                   choices=["fv", "semi_lagrangian", "none"])
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--nneur", type=int, default=192)
    p.add_argument("--nh-mem", type=int, default=16)
    p.add_argument("--out", default=None)
    p.add_argument("--platform", default=None)
    p.add_argument("--grid", default="/root/reference/grid_info/"
                   "ClimSim_low-res_grid-info.nc")
    args = p.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from ..grid import Grid
    from ..models.rnn import RNNAutoreg
    from ..online import HybridLoop, HostLoopConfig
    from ..data import synthetic as S

    grid = Grid.from_file(args.grid)
    tt = lambda a: tuple(float(x) for x in np.asarray(a))
    model = RNNAutoreg(nx=6, nx_sfc=24, ny=6, ny_sfc=8,
                       nneur=(args.nneur, args.nneur), nh_mem=args.nh_mem,
                       hyam=tt(grid.hyam), hybm=tt(grid.hybm),
                       sp_mean=0.0, sp_div=1.0, add_pres=False,
                       output_prune=True)

    # initial state from the synthetic generator (raw units)
    cfg = S.SyntheticConfig(vset_name="v1")
    state0 = S.generate_state(jax.random.PRNGKey(0), cfg, grid)
    state = {"T": state0["state_t"], "qv": state0["state_q0001"],
             "qc": state0["state_q0002"], "qi": state0["state_q0003"],
             "u": state0["state_u"], "v": state0["state_v"]}
    x_sfc = jnp.stack([state0["state_ps"], state0["pbuf_SOLIN"],
                       state0["pbuf_LHFLX"], state0["pbuf_SHFLX"],
                       state0["pbuf_TAUX"], state0["pbuf_TAUY"],
                       state0["pbuf_COSZRS"]] +
                      [jnp.zeros_like(state0["state_ps"])] * 17, axis=1)

    mem0 = jnp.zeros((grid.ncol, grid.nlev, args.nh_mem), jnp.float32)
    xm = jnp.stack([state[k] for k in ("T", "qv", "qc", "qi", "u", "v")],
                   axis=-1)
    params = model.init(jax.random.PRNGKey(1), xm, x_sfc, mem0)
    if args.checkpoint:
        import orbax.checkpoint as ocp
        import os
        c = ocp.StandardCheckpointer()
        params = c.restore(os.path.abspath(
            os.path.join(args.checkpoint, "final")), {"params": params}
        )["params"]

    # tendencies in raw units: the random emulator's outputs are O(1); damp
    # to physically-plausible magnitudes in smoke mode
    damp = 1e-6 if not args.checkpoint else 1.0

    def emulator(x_main, x_sfc_in, mem):
        out, out_sfc, mem = model.apply(params, x_main, x_sfc_in, mem)
        return out * damp, out_sfc * damp, mem

    loop = HybridLoop(emulator, grid, HostLoopConfig(scheme=args.scheme))
    roll = jax.jit(lambda s, m: loop.rollout(s, m, x_sfc, args.steps))
    t0 = time.time()
    final, mem, diags = roll(state, mem0)
    jax.block_until_ready(diags["mean_T"])
    dt = time.time() - t0
    mt = np.asarray(diags["mean_T"])
    print(f"hybrid rollout: {args.steps} coupled steps "
          f"({args.steps * 20 / 60:.1f} sim-hours), wall {dt:.2f}s")
    print(f"mean T trajectory: start={mt[0]:.3f} K end={mt[-1]:.3f} K")
    print(f"finite: {all(np.isfinite(np.asarray(v)).all() for v in final.values())}")
    if args.out:
        np.savez(args.out, mean_T=mt,
                 precc=np.asarray(diags["precc"]),
                 **{k: np.asarray(v) for k, v in final.items()})
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
