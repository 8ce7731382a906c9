"""Round-4 probe D: v5 channel-major kernel standalone vs v3, at the
real flagship input width (CX=208 = H+nm after init MLP + mem concat)
and at the thin width (26) the earlier probes used.

Run: timeout 1750 python artifacts/exp_vmem_r4d.py
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tests", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from climsim_tpu.ops.pallas_rnn import (fused_bigru_heads_cm,
                                        fused_bigru_heads_lbh)

B, L, H, nm, ny = 21600, 60, 192, 16, 6
N = 20


def timeit(loop, args, label):
    jloop = jax.jit(loop)
    triv = jax.jit(lambda a: jnp.sum(a[0][0, 0].astype(jnp.float32)))
    t0 = time.time()
    float(jloop(args))
    print(f"# {label}: compiled {time.time()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(3):
        float(triv(args))
    fetch = (time.perf_counter() - t0) / 3
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(jloop(args))
        times.append(max(time.perf_counter() - t0 - fetch, 1e-9))
    med = statistics.median(times) / N
    print(f"{label}: {med*1e3:.2f} ms/iter ({B/med:,.0f} cols/s)",
          flush=True)


def run_cm(CX, label):
    ks = jax.random.split(jax.random.PRNGKey(0), 16)
    s = 0.3
    bf = jnp.bfloat16
    mk = lambda k, sh: (jax.random.normal(k, sh, jnp.float32) * s).astype(bf)
    a = (mk(ks[0], (L, CX, B)), mk(ks[1], (H, B)), mk(ks[2], (H, B)),
         mk(ks[3], (3 * H, CX)), mk(ks[4], (3 * H, 1)),
         mk(ks[5], (3 * H, H)), mk(ks[6], (3 * H, 1)),
         mk(ks[7], (3 * H, H)), mk(ks[8], (3 * H, 1)),
         mk(ks[9], (3 * H, H)), mk(ks[10], (3 * H, 1)),
         mk(ks[11], (nm, H)), mk(ks[12], (nm, 1)),
         mk(ks[13], (ny, nm)), mk(ks[14], (ny, 1)))

    def loop(a):
        def body(h, _):
            outmem, lasth = fused_bigru_heads_cm(a[0], h, *a[2:])
            return lasth, jnp.sum(outmem[0, 0].astype(jnp.float32))
        h, accs = jax.lax.scan(body, a[1], None, length=N)
        return jnp.sum(accs)
    try:
        timeit(loop, a, label)
    except Exception as e:
        print(f"{label} FAILED: {type(e).__name__}: {str(e)[:600]}",
              flush=True)


def run_v3(CX, label):
    ks = jax.random.split(jax.random.PRNGKey(1), 16)
    s = 0.3
    bf = jnp.bfloat16
    mk = lambda k, sh: (jax.random.normal(k, sh, jnp.float32) * s).astype(bf)
    a = (mk(ks[0], (L, B, CX)), mk(ks[1], (B, H)), mk(ks[2], (B, H)),
         mk(ks[3], (CX, 3 * H)), mk(ks[4], (3 * H,)),
         mk(ks[5], (H, 3 * H)), mk(ks[6], (3 * H,)),
         mk(ks[7], (H, 3 * H)), mk(ks[8], (3 * H,)),
         mk(ks[9], (H, 3 * H)), mk(ks[10], (3 * H,)),
         mk(ks[11], (H, nm)), mk(ks[12], (nm,)),
         mk(ks[13], (nm, ny)), mk(ks[14], (ny,)))

    def loop(a):
        def body(h, _):
            out, mem, lasth = fused_bigru_heads_lbh(a[0], h, *a[2:])
            return lasth, jnp.sum(out[0, 0].astype(jnp.float32))
        h, accs = jax.lax.scan(body, a[1], None, length=N)
        return jnp.sum(accs)
    try:
        timeit(loop, a, label)
    except Exception as e:
        print(f"{label} FAILED: {type(e).__name__}: {str(e)[:600]}",
              flush=True)


if __name__ == "__main__":
    run_cm(26, "k5cm_CX26")
    run_cm(208, "k5cm_CX208")
    run_v3(208, "k3lbh_CX208")
