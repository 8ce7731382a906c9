"""Round-4 probe E: validate the standalone-kernel timing methodology.

The CX=26 standalone number (2.46 ms/iter) implies >350 TFLOP/s — above
bf16 peak — so either the chip is not what we think or the scan-probe
methodology undercounts. Arms (v5 cm kernel, single-input form via
nm_in=8 dummy, B=21,600, CX=208):
  N20 / N60 / N5   scan-probe at different lengths (per-iter must agree)
  pyloop           20 dependent dispatches from Python, total time
Run: timeout 1750 python artifacts/exp_vmem_r4e.py
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

from climsim_tpu.ops.pallas_rnn import fused_bigru_heads_cm

B, L, H, nm, ny = 21600, 60, 192, 16, 6
CH, nm_in = 192, 16


def make_args():
    ks = jax.random.split(jax.random.PRNGKey(0), 18)
    s = 0.3
    bf = jnp.bfloat16
    mk = lambda k, sh: (jax.random.normal(k, sh, jnp.float32) * s).astype(bf)
    return (mk(ks[0], (L, CH, B)), mk(ks[15], (L, nm_in, B)),
            mk(ks[1], (H, B)), mk(ks[2], (H, B)),
            mk(ks[3], (3 * H, CH)), mk(ks[16], (3 * H, nm_in)),
            mk(ks[4], (3 * H, 1)),
            mk(ks[5], (3 * H, H)), mk(ks[6], (3 * H, 1)),
            mk(ks[7], (3 * H, H)), mk(ks[8], (3 * H, 1)),
            mk(ks[9], (3 * H, H)), mk(ks[10], (3 * H, 1)),
            mk(ks[11], (nm, H)), mk(ks[12], (nm, 1)),
            mk(ks[13], (ny, nm)), mk(ks[14], (ny, 1)))


def scan_probe(a, N):
    def loop(a):
        def body(carry, _):
            h, memin = carry
            outmem, lasth = fused_bigru_heads_cm(a[0], memin, h, *a[3:])
            return (lasth, outmem[:, :nm, :]), \
                jnp.sum(outmem[0, 0].astype(jnp.float32))
        (h, m), accs = jax.lax.scan(body, (a[2], a[1]), None, length=N)
        return jnp.sum(accs)

    jloop = jax.jit(loop)
    triv = jax.jit(lambda a: jnp.sum(a[2][0, 0].astype(jnp.float32)))
    float(jloop(a))
    t0 = time.perf_counter()
    for _ in range(3):
        float(triv(a))
    fetch = (time.perf_counter() - t0) / 3
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(jloop(a))
        times.append(max(time.perf_counter() - t0 - fetch, 1e-9))
    med = statistics.median(times) / N
    print(f"scan N={N}: {med*1e3:.2f} ms/iter (fetch {fetch*1e3:.1f} ms)",
          flush=True)


def pyloop_probe(a, N=20):
    step = jax.jit(lambda memin, h, rest: fused_bigru_heads_cm(
        rest[0], memin, h, *rest[3:]))
    rest = a
    outmem, lasth = step(a[1], a[2], rest)
    outmem.block_until_ready()
    # timed: N dependent dispatches, then fetch a scalar
    fin = jax.jit(lambda o: jnp.sum(o[0, 0].astype(jnp.float32)))
    t0 = time.perf_counter()
    m, h = a[1], a[2]
    for _ in range(N):
        outmem, h = step(m, h, rest)
        m = outmem[:, :nm, :]
    v = float(fin(outmem))
    dt = time.perf_counter() - t0
    print(f"pyloop N={N}: {dt/N*1e3:.2f} ms/iter (incl dispatch+fetch)",
          flush=True)


if __name__ == "__main__":
    a = make_args()
    scan_probe(a, 20)
    scan_probe(a, 60)
    scan_probe(a, 5)
    pyloop_probe(a)
