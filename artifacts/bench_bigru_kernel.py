"""On-chip sweep: fused Pallas BiGRU kernel vs XLA scan at flagship shapes.

Level-major layout, hoisted up projection precomputed (both paths see the
same [L, B, 3H] input, so this isolates the recurrent sweeps + fused down
projection). bench.py methodology: N on-device iterations serialized in
one jitted lax.scan, scalar fetch as the sync, trivial-fetch subtracted.

Run serialized on the one chip:  timeout 1800 python artifacts/bench_bigru_kernel.py
"""
import functools
import os
import sys
import time

os.environ.setdefault("PALLAS_AXON_REMOTE_COMPILE", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tests", ".jax_cache")
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from climsim_tpu.ops.pallas_rnn import fused_bigru_lbh, _bigru_reference_lbh

B, L, H = 6144, 60, 192
N = 30


def make_args(dtype):
    ks = jax.random.split(jax.random.PRNGKey(0), 9)
    s = 0.3
    shapes = [(L, B, 3 * H), (B, H), (B, H), (H, 3 * H), (3 * H,),
              (H, 3 * H), (3 * H,), (H, 3 * H), (3 * H,)]
    return tuple(jax.random.normal(k, sh, jnp.float32).astype(dtype) * s
                 for k, sh in zip(ks, shapes))


def measure(fn, args, label):
    @jax.jit
    def loop(args):
        def body(carry, _):
            h0u = carry
            down, lasth = fn(args[0], h0u, *args[2:])
            return lasth, ()
        lasth, _ = jax.lax.scan(body, args[1], None, length=N)
        return jnp.sum(lasth[0].astype(jnp.float32))

    triv = jax.jit(lambda a: jnp.sum(a[1][0].astype(jnp.float32)))
    t0 = time.perf_counter()
    float(triv(args))
    float(loop(args))
    print(f"# {label}: compiled in {time.perf_counter()-t0:.1f}s",
          flush=True)

    t0 = time.perf_counter()
    for _ in range(3):
        float(triv(args))
    fetch = (time.perf_counter() - t0) / 3

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(loop(args))
        times.append(time.perf_counter() - t0)
    dt = max(min(times) - fetch, 1e-9)
    cols = B * N / dt
    print(f"{label}: {cols:,.0f} cols/s  ({dt/N*1e3:.3f} ms/fwd)",
          flush=True)
    return cols


def measure_grad(fn, args, label, n=10):
    """fwd+bwd: value_and_grad of a scalar loss over the op."""
    def loss(a):
        down, lasth = fn(*a)
        return (jnp.sum(down.astype(jnp.float32) ** 2)
                + jnp.sum(lasth.astype(jnp.float32) ** 2))

    @jax.jit
    def loop(args):
        # serialize iterations via a real data dependency: each step's
        # h0_up is the previous step's d_h0u (prevents loop-invariant
        # hoisting of the whole grad computation)
        def body(h0u, _):
            a = (args[0], h0u) + args[2:]
            l, g = jax.value_and_grad(loss)(a)
            return g[1].astype(h0u.dtype), l
        h0u, ls = jax.lax.scan(body, args[1], None, length=n)
        return jnp.sum(h0u.astype(jnp.float32)[0]) + ls[-1]

    triv = jax.jit(lambda a: jnp.sum(a[1][0].astype(jnp.float32)))
    t0 = time.perf_counter()
    float(triv(args))
    float(loop(args))
    print(f"# {label}: compiled in {time.perf_counter()-t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(3):
        float(triv(args))
    fetch = (time.perf_counter() - t0) / 3
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(loop(args))
        times.append(time.perf_counter() - t0)
    dt = max(min(times) - fetch, 1e-9)
    cols = B * n / dt
    print(f"{label}: {cols:,.0f} cols/s fwd+bwd ({dt/n*1e3:.3f} ms/step)",
          flush=True)
    return cols


def main():
    print(f"devices: {jax.devices()}", flush=True)
    results = {}
    args = make_args(jnp.bfloat16)
    try:
        results["scan-bf16"] = measure(
            _bigru_reference_lbh, args, "scan-bf16")
    except Exception as e:
        print(f"scan-bf16 FAILED: {type(e).__name__}: {e}", flush=True)
    # acc32=True (f32 gates) is the production default; acc32=False runs
    # the gate arithmetic in bf16 (2x VPU packing) — measured here since
    # commit 36982a4 made the explicitly-typed transcendentals lower
    # (VERDICT round-2 item 6)
    for bb, acc32 in ((None, True), (None, False)):
        label = f"pallas-bf16-bb{bb or 'auto'}-{'f32' if acc32 else 'bf16'}g"
        try:
            results[label] = measure(
                lambda xp, h0u, h0d, *w, _bb=bb, _a=acc32: fused_bigru_lbh(
                    xp, h0u, h0d, *w, _bb, False, _a),
                args, label)
        except Exception as e:
            print(f"{label} FAILED: {type(e).__name__}: {e}", flush=True)

    # ---- fwd+bwd (training path)
    try:
        results["grad-scan-bf16"] = measure_grad(
            _bigru_reference_lbh, args, "grad-scan-bf16")
    except Exception as e:
        print(f"grad-scan-bf16 FAILED: {type(e).__name__}: {e}",
              flush=True)
    try:
        results["grad-pallas-bf16"] = measure_grad(
            lambda *a: fused_bigru_lbh(*a, None, False, True),
            args, "grad-pallas-bf16")
    except Exception as e:
        print(f"grad-pallas-bf16 FAILED: {type(e).__name__}: {e}",
              flush=True)
    # ---- v3 fused-heads kernel at the flagship ONLINE batch (in-kernel
    # input projection + latent/output heads; round-3)
    from climsim_tpu.ops.pallas_rnn import fused_bigru_heads_lbh
    import time as _time
    import statistics as _stats
    B3, nx, nm, ny = 21600, 26, 16, 6
    ks = jax.random.split(jax.random.PRNGKey(1), 15)
    s = 0.3
    shp = [(L, B3, nx), (B3, H), (B3, H), (nx, 3 * H), (3 * H,),
           (H, 3 * H), (3 * H,), (H, 3 * H), (3 * H,), (H, 3 * H),
           (3 * H,), (H, nm), (nm,), (nm, ny), (ny,)]
    args3 = tuple(jax.random.normal(k, sh, jnp.float32).astype(jnp.bfloat16)
                  * s for k, sh in zip(ks, shp))
    jkw = {"compiler_options": {"xla_tpu_scoped_vmem_limit_kib": 130048}}

    @functools.partial(jax.jit, **jkw)
    def loop_v3(a):
        def body(h0u, _):
            out, mem, lasth = fused_bigru_heads_lbh(a[0], h0u, *a[2:])
            return lasth, jnp.sum(out[0, 0].astype(jnp.float32))
        lasth, accs = jax.lax.scan(body, a[1], None, length=N)
        return jnp.sum(accs)

    try:
        float(loop_v3(args3))
        times = []
        for _ in range(5):
            t0 = _time.perf_counter()
            float(loop_v3(args3))
            times.append(_time.perf_counter() - t0)
        med = _stats.median(times) / N
        results[f"pallas-v3-heads-B{B3}"] = B3 / med
        print(f"pallas-v3-heads B={B3}: {med*1e3:.2f} ms "
              f"({B3/med:,.0f} cols/s)", flush=True)
    except Exception as e:
        print(f"pallas-v3-heads FAILED: {type(e).__name__}: {e}",
              flush=True)

    print("\nsummary:")
    for k, v in sorted(results.items(), key=lambda kv: -kv[1]):
        print(f"  {k:26s} {v:>12,.0f} cols/s")


if __name__ == "__main__":
    main()
