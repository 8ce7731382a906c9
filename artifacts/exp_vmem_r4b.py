"""Round-4 probe B: where do v4's 33 ms go?

Arms (B=21,600, flagship shapes, plain jit now that the kernels declare
their Mosaic vmem_limit):
  k3   v3 kernel standalone (in-kernel up-proj + heads; x [L,B,26])
  k4   v4 kernel standalone (+ init MLP + mem concat; feat [L,B,6])
  m4   full model apply fuse_heads=True (v4 + surrounding transposes)
  m2   full model apply fuse_heads=False (v2 control)
  tr   the narrow-array transposes alone ([B,L,6]->[L,B,6] etc.)
Run: timeout 1750 python artifacts/exp_vmem_r4b.py
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

from climsim_tpu.ops.pallas_rnn import (fused_bigru_heads_lbh,
                                        fused_bigru_heads_init_lbh)

B, L, H, nm, ny = 21600, 60, 192, 16, 6
N = 20


def timeit(fn, args, label):
    loop = jax.jit(fn)
    triv = jax.jit(lambda a: jnp.sum(a[0][0, 0].astype(jnp.float32))
                   if args[0].ndim > 2 else jnp.sum(a[0][0]))
    t0 = time.time()
    float(loop(args))
    print(f"# {label}: compiled {time.time()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(3):
        float(triv(args))
    fetch = (time.perf_counter() - t0) / 3
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(loop(args))
        times.append(max(time.perf_counter() - t0 - fetch, 1e-9))
    med = statistics.median(times) / N
    print(f"{label}: {med*1e3:.2f} ms/iter ({B/med:,.0f} cols/s)",
          flush=True)
    return med


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 20)
    s = 0.3
    bf = jnp.bfloat16
    mk = lambda k, sh: (jax.random.normal(k, sh, jnp.float32) * s).astype(bf)

    # ---- k3: v3 kernel standalone, x [L,B,26]
    nx3 = 26
    a3 = (mk(ks[0], (L, B, nx3)), mk(ks[1], (B, H)), mk(ks[2], (B, H)),
          mk(ks[3], (nx3, 3 * H)), mk(ks[4], (3 * H,)),
          mk(ks[5], (H, 3 * H)), mk(ks[6], (3 * H,)),
          mk(ks[7], (H, 3 * H)), mk(ks[8], (3 * H,)),
          mk(ks[9], (H, 3 * H)), mk(ks[10], (3 * H,)),
          mk(ks[11], (H, nm)), mk(ks[12], (nm,)),
          mk(ks[13], (nm, ny)), mk(ks[14], (ny,)))

    def k3(a):
        def body(h0u, _):
            out, mem, lasth = fused_bigru_heads_lbh(a[0], h0u, *a[2:])
            return lasth, jnp.sum(out[0, 0].astype(jnp.float32))
        lasth, accs = jax.lax.scan(body, a[1], None, length=N)
        return jnp.sum(accs)

    try:
        timeit(k3, a3, "k3_v3_kernel_plain")
    except Exception as e:
        print(f"k3 FAILED: {type(e).__name__}: {str(e)[:500]}", flush=True)

    # ---- k4: v4 kernel standalone, feat [L,B,6] + mem [L,B,16]
    nf = 6
    a4 = (mk(ks[0], (L, B, nf)), mk(ks[15], (L, B, nm)),
          mk(ks[1], (B, H)), mk(ks[2], (B, H)),
          mk(ks[16], (nf, H)), mk(ks[17], (H,)),
          mk(ks[3], (H + nm, 3 * H)), mk(ks[4], (3 * H,)),
          mk(ks[5], (H, 3 * H)), mk(ks[6], (3 * H,)),
          mk(ks[7], (H, 3 * H)), mk(ks[8], (3 * H,)),
          mk(ks[9], (H, 3 * H)), mk(ks[10], (3 * H,)),
          mk(ks[11], (H, nm)), mk(ks[12], (nm,)),
          mk(ks[13], (nm, ny)), mk(ks[14], (ny,)))

    def k4(a):
        def body(carry, _):
            h0u, memin = carry
            out, mem, lasth = fused_bigru_heads_init_lbh(
                a[0], memin, h0u, *a[3:])
            return (lasth, mem), jnp.sum(out[0, 0].astype(jnp.float32))
        (lasth, _), accs = jax.lax.scan(body, (a[2], a[1]), None, length=N)
        return jnp.sum(accs)

    try:
        timeit(k4, a4, "k4_v4_kernel_plain")
    except Exception as e:
        print(f"k4 FAILED: {type(e).__name__}: {str(e)[:500]}", flush=True)

    # ---- tr: the narrow transposes alone (what the model adds around v4)
    xm = mk(ks[0], (B, L, nf))
    mm = mk(ks[15], (B, L, nm))

    def tr(a):
        x, m = a
        def body(carry, _):
            x, m = carry
            xt = jnp.swapaxes(x, 0, 1)          # [L,B,6]
            mt = jnp.swapaxes(m, 0, 1)          # [L,B,16]
            # output transposes back
            o1 = jnp.swapaxes(xt, 0, 1)
            o2 = jnp.swapaxes(mt, 0, 1)
            return (o1 + jnp.asarray(1e-3, o1.dtype), o2), ()
        (x, m), _ = jax.lax.scan(body, (x, m), None, length=N)
        return jnp.sum(x[0, 0].astype(jnp.float32))

    try:
        timeit(tr, (xm, mm), "tr_transposes")
    except Exception as e:
        print(f"tr FAILED: {type(e).__name__}: {str(e)[:500]}", flush=True)

    # ---- m4 / m2: full model apply
    from climsim_tpu.models.rnn import RNNAutoreg
    from climsim_tpu.models import BF16
    for label, fh in (("m4_model_fused", True), ("m2_model_v2", False)):
        model = RNNAutoreg(nx=6, nx_sfc=24, ny=6, ny_sfc=8,
                           nneur=(192, 192), nh_mem=16, add_pres=False,
                           policy=BF16, use_pallas=True, fuse_heads=fh)
        xmain = jnp.ones((B, L, 6), jnp.float32) * 0.1
        xsfc = jnp.ones((B, 24), jnp.float32) * 0.1
        mem0 = jnp.zeros((B, L, nm), jnp.float32)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), xmain, xsfc,
                                     mem0)

        def mfull(a, _params=params, _model=model):
            x, s, m = a
            def body(m, _):
                out, osfc, m2 = _model.apply(_params, x, s, m)
                return m2, jnp.sum(out[0, 0].astype(jnp.float32))
            m2, accs = jax.lax.scan(body, m, None, length=N)
            return jnp.sum(accs)

        try:
            timeit(mfull, (xmain, xsfc, mem0), label)
        except Exception as e:
            print(f"{label} FAILED: {type(e).__name__}: {str(e)[:500]}",
                  flush=True)


if __name__ == "__main__":
    main()
