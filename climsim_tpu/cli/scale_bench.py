"""Scaling benchmark: grid-points/s of the sharded hybrid step at 1..N
devices (the BASELINE.json scaling-efficiency metric).

Usage:
    python -m climsim_tpu.cli.scale_bench [--devices 1 2 4 8]
        [--nlat 64 --nlon 128 --nlev 60] [--steps 10] [--platform cpu]

On real multi-chip hardware this measures ICI halo-exchange overlap
efficiency; on the CPU virtual mesh it validates the collective paths and
reports relative scaling (not absolute speed).
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--nlat", type=int, default=64)
    p.add_argument("--nlon", type=int, default=128)
    p.add_argument("--nlev", type=int, default=60)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)

    import os
    maxdev = max(args.devices)
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={maxdev}"
        ).strip()
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from ..grid import Grid
    from ..online import HybridLoop, HostLoopConfig
    from ..online.host_loop import sharded_hybrid_step
    from ..parallel import make_mesh

    grid = Grid.from_file(
        "/root/reference/grid_info/ClimSim_low-res_grid-info.nc")

    def emulator(x_main, x_sfc, mem):
        B, L, _ = x_main.shape
        pt = jnp.zeros((B, L, 6)).at[:, :, 0].set(1e-5)
        return pt, jnp.zeros((B, 8)), mem

    rng = np.random.default_rng(0)
    nlat, nlon, nlev = args.nlat, args.nlon, args.nlev
    state_g = {
        "T": jnp.asarray(rng.uniform(230, 300, (nlat, nlon, nlev)),
                         jnp.float32),
        "qv": jnp.asarray(np.abs(rng.normal(1e-3, 1e-4,
                                            (nlat, nlon, nlev))),
                          jnp.float32),
        "qc": jnp.zeros((nlat, nlon, nlev), jnp.float32),
        "qi": jnp.zeros((nlat, nlon, nlev), jnp.float32),
        "u": jnp.asarray(rng.normal(0, 5, (nlat, nlon, nlev)), jnp.float32),
        "v": jnp.asarray(rng.normal(0, 2, (nlat, nlon, nlev)), jnp.float32),
    }
    x_sfc_g = jnp.concatenate(
        [jnp.full((nlat, nlon, 1), 1e5, jnp.float32),
         jnp.ones((nlat, nlon, 23), jnp.float32)], axis=-1)
    mem_g = jnp.zeros((nlat * nlon, nlev, 4), jnp.float32)

    gridpoints = nlat * nlon * nlev
    results = {}
    for nd in args.devices:
        cfg = HostLoopConfig(scheme="fv", fix_water=False, nlat=nlat,
                             nlon=nlon)
        # a fake ncol grid matching nlat*nlon for the proxy mapping
        class _G:
            lat = jnp.repeat(jnp.linspace(-88, 88, nlat), nlon)
            lon = jnp.tile(jnp.linspace(0, 360, nlon, endpoint=False), nlat)
            ncol = nlat * nlon
            nlev_ = nlev
            hyai = grid.hyai; hybi = grid.hybi
            hyam = grid.hyam; hybm = grid.hybm
            mass_weights = grid.mass_weights
        loop = HybridLoop(emulator, _G, cfg)
        mesh = make_mesh(nd, axis="col")
        step = sharded_hybrid_step(loop, mesh)
        out = step(state_g, mem_g, x_sfc_g)
        jax.block_until_ready(out[2]["mean_T"])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            out = step(state_g, mem_g, x_sfc_g)
        jax.block_until_ready(out[2]["mean_T"])
        dt = time.perf_counter() - t0
        gps = gridpoints * args.steps / dt
        results[nd] = gps
        eff = gps / (results[args.devices[0]] * nd / args.devices[0])
        print(json.dumps({"devices": nd, "gridpoints_per_s": round(gps),
                          "scaling_efficiency": round(eff, 3)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
