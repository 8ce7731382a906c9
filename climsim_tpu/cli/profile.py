"""Profiling CLI: capture a TensorBoard/xprof device trace of a training
or inference step (the structured-profiler integration SURVEY.md §5 says
the reference lacks).

Usage:
    python -m climsim_tpu.cli.profile --what rollout --logdir /tmp/tb
    python -m climsim_tpu.cli.profile --what forward --steps 5
"""
from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--what", default="forward",
                   choices=["forward", "rollout", "hybrid"])
    p.add_argument("--logdir", default="/tmp/climsim_trace")
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--batch", type=int, default=1536)
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from ..utils import trace, annotate, device_memory_stats
    from ..grid import Grid
    from ..models.rnn import RNNAutoreg

    g = Grid.from_file(
        "/root/reference/grid_info/ClimSim_low-res_grid-info.nc")
    tt = lambda a: tuple(float(x) for x in np.asarray(a))
    model = RNNAutoreg(nx=15, nx_sfc=24, ny=6, ny_sfc=8, nneur=(192, 192),
                       nh_mem=16, hyam=tt(g.hyam), hybm=tt(g.hybm),
                       sp_mean=9.8e4, sp_div=1e4)
    B, L = args.batch, 60
    xm = jnp.ones((B, L, 15), jnp.float32)
    xs = jnp.ones((B, 24), jnp.float32)
    mem = jnp.zeros((B, L, 16), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), xm, xs, mem)
    fwd = jax.jit(model.apply)
    fwd(params, xm, xs, mem)  # compile outside the trace

    with trace(args.logdir):
        for i in range(args.steps):
            with annotate(f"step_{i}"):
                out = fwd(params, xm, xs, mem)
        jax.block_until_ready(out)

    print(f"trace written to {args.logdir} (view: tensorboard --logdir ...)")
    for rec in device_memory_stats():
        print(rec)
    from ..utils.observability import achieved_flops
    res = achieved_flops(model.apply, params, xm, xs, mem,
                         iters=args.steps)
    if res:
        print({k: (f"{v:.3e}" if isinstance(v, float) else v)
               for k, v in res.items()})
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
