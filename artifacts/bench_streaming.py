"""Out-of-core streaming bench: epoch throughput + bounded host memory.

Two measurements (run on the real TPU chip; CPU backend with
--platform=cpu for the architecture-proof numbers without the tunnel):

1. HBM-fitting comparison: fused rollout training epochs on an H5 series
   that fits on device — device-resident path (round-1 default) vs the
   bounded-memory stream (stream_keeplev_chunks, background reader +
   double-buffered device_put). Reports the throughput ratio.
2. Big stream: a synthetic keeplev H5 of --big-gb (default 50 GB ~ one
   full ClimSim low-res decade at 384 cols x ~26k steps) streamed through
   one training epoch with peak-RSS tracking — demonstrating training on
   data far larger than HBM with host memory bounded at
   O(prefetch x chunk), i.e. independent of dataset size.

Usage: python artifacts/bench_streaming.py [--platform=cpu] [--big-gb=50]
       [--skip-big]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def enable_cache():
    import jax
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


B, L, NX, NS, NY, NYS = 384, 60, 9, 24, 6, 8
ROW_BYTES = 4 * (L * NX + NS + L * NY + NYS)


def write_h5(path, n_steps, seed=0, block=256):
    """Synthetic keeplev H5 written in bounded blocks (no full-RAM copy)."""
    from climsim_tpu.data.h5store import KeeplevWriter
    rng = np.random.default_rng(seed)
    t0 = time.time()
    with KeeplevWriter(path) as w:
        done = 0
        while done < n_steps:
            n = min(block, n_steps - done)
            rows = n * B
            w.append(rng.normal(0, 1, (rows, L, NX)).astype(np.float32),
                     rng.normal(0, 1, (rows, NS)).astype(np.float32),
                     rng.normal(0, 1e-5, (rows, L, NY)).astype(np.float32),
                     rng.normal(0, 1, (rows, NYS)).astype(np.float32))
            done += n
    gb = n_steps * B * ROW_BYTES / 1e9
    print(f"# wrote {path}: {n_steps} steps, {gb:.1f} GB in "
          f"{time.time()-t0:.0f}s", flush=True)
    return gb


def build_trainer(nneur=128):
    import jax
    import jax.numpy as jnp
    from climsim_tpu.grid import Grid
    from climsim_tpu.models.rnn import RNNAutoreg
    from climsim_tpu.models import BF16
    from climsim_tpu.train.rollout import RolloutTrainer, RolloutConfig

    g = Grid.from_file(
        "/root/reference/grid_info/ClimSim_low-res_grid-info.nc")
    model = RNNAutoreg(nx=NX, nx_sfc=NS, ny=NY, ny_sfc=NYS,
                       nneur=(nneur, nneur), nh_mem=8, add_pres=False,
                       policy=BF16)
    cfg = RolloutConfig(rollout_schedule={0: 1}, lr=1e-3)
    tr = RolloutTrainer(model, cfg, np.asarray(g.hyai), np.asarray(g.hybi),
                        yscale_lev=jnp.ones((1, 1, NY)),
                        yscale_sca=jnp.ones(NYS))
    mem = jnp.zeros((B, L, 8), jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((B, L, NX)), jnp.zeros((B, NS)), mem)
    return tr, params, mem


def run_epoch(tr, params, mem, chunks_iter):
    import jax
    import jax.numpy as jnp
    # the trainer donates params/opt_state; keep the caller's copy alive
    p = jax.tree_util.tree_map(jnp.copy, params)
    opt_state = tr.tx.init(p)
    p, o, m, rec = tr.run_epoch(p, opt_state, mem, chunks_iter,
                                epoch=0)
    jax.block_until_ready(p)
    return rec


def stream_chunks(path, n_steps, cs, prefetch=3):
    from climsim_tpu.data.h5store import KeeplevReader
    from climsim_tpu.data.loader import stream_keeplev_chunks
    r = KeeplevReader(path)
    return stream_keeplev_chunks(r.load_slice, n_steps, B, cs,
                                 shuffle=True, seed=1, prefetch=prefetch,
                                 to_device=True)


def resident_chunks(path, n_steps, cs):
    import jax
    import jax.numpy as jnp
    from climsim_tpu.data.h5store import KeeplevReader
    from climsim_tpu.data.loader import keeplev_chunks
    d = KeeplevReader(path).load_all()
    resh = lambda a: jax.device_put(jnp.asarray(
        a.reshape((n_steps, B) + a.shape[1:])))
    xl, xs = resh(d["input_lev"]), resh(d["input_sca"])
    yl, ys = resh(d["output_lev"]), resh(d["output_sca"])
    return keeplev_chunks(xl, xs, yl, ys, xs[..., 0], cs, shuffle=True,
                          seed=1)


def rss_gb():
    import psutil
    return psutil.Process().memory_info().rss / 1e9


def peak_rss_gb():
    """High-water-mark RSS (VmHWM) — the honest 'bounded memory' number."""
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmHWM:"):
                return float(line.split()[1]) / 1e6   # kB -> GB
    return float("nan")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--big-gb", type=float, default=50.0)
    ap.add_argument("--skip-big", action="store_true")
    ap.add_argument("--skip-small", action="store_true")
    ap.add_argument("--nneur", type=int, default=128)
    ap.add_argument("--small-steps", type=int, default=2048)
    ap.add_argument("--chunk-size", type=int, default=64)
    ap.add_argument("--workdir", default="/tmp/stream_bench")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    enable_cache()
    os.makedirs(args.workdir, exist_ok=True)

    tr, params, mem = build_trainer(args.nneur)
    cs = args.chunk_size

    # ---------------- phase 1: resident vs streamed at HBM-fitting size
    if not args.skip_small:
        small = os.path.join(args.workdir, f"small_{args.small_steps}.h5")
        if not os.path.exists(small):
            write_h5(small, args.small_steps)

        # warm both paths (compile)
        warm = stream_chunks(small, min(args.small_steps, 2 * cs), cs)
        run_epoch(tr, params, mem, warm)

        t0 = time.time()
        rec = run_epoch(tr, params, mem,
                        resident_chunks(small, args.small_steps, cs))
        t_res = time.time() - t0
        t0 = time.time()
        rec2 = run_epoch(tr, params, mem,
                         stream_chunks(small, args.small_steps, cs))
        t_str = time.time() - t0
        cols = args.small_steps * B
        print(json.dumps({
            "phase": "resident_vs_stream",
            "steps": args.small_steps,
            "nneur": args.nneur,
            "resident_s": round(t_res, 2),
            "stream_s": round(t_str, 2),
            "stream_over_resident": round(t_str / t_res, 3),
            "stream_cols_per_s": round(cols / t_str, 1),
            "loss_equal": abs(rec["loss"] - rec2["loss"]) < 1e-5,
        }), flush=True)

    # ---------------- phase 2: stream >> HBM with bounded RSS
    if args.skip_big:
        return
    n_big = int(args.big_gb * 1e9 / (B * ROW_BYTES))
    big = os.path.join(args.workdir, f"big_{n_big}.h5")
    if not os.path.exists(big) or \
            os.path.getsize(big) < 0.9 * args.big_gb * 1e9:
        write_h5(big, n_big, block=512)
    rss0 = rss_gb()
    # warm-compile on a short prefix so the epoch timing is pure pipeline
    run_epoch(tr, params, mem, stream_chunks(big, 2 * cs, cs))
    t0 = time.time()
    rec = run_epoch(tr, params, mem, stream_chunks(big, n_big, cs))
    t_big = time.time() - t0
    print(json.dumps({
        "phase": "big_stream",
        "dataset_gb": round(n_big * B * ROW_BYTES / 1e9, 1),
        "steps": n_big,
        "nneur": args.nneur,
        "epoch_s": round(t_big, 1),
        "cols_per_s": round(n_big * B / t_big, 1),
        "gb_per_s": round(n_big * B * ROW_BYTES / 1e9 / t_big, 3),
        "rss_before_gb": round(rss0, 2),
        "rss_after_gb": round(rss_gb(), 2),
        "peak_rss_gb": round(peak_rss_gb(), 2),
        "loss": rec["loss"],
    }), flush=True)


if __name__ == "__main__":
    main()
