"""Round-4 probe C: why is the v3 kernel 5 ms standalone but ~36 ms
inside the coupled step?

All arms run the v3 fused-heads kernel at B=21,600 inside a 20-step
lax.scan, adding one step-context ingredient at a time:
  D1  mem carry only, x fixed, consume sum(out)          (= standalone)
  D2  + consume out via 6 channel slices (out[:,:,j].T)
  D3  + rebuild x each step from 6 carried [B,L] fields
  D4  full emulator context: state carried as 6 [B,L] fields, updated
      with dt*pt(j); x restacked; mem carried  (no stencil, no fixers)
Run: timeout 1750 python artifacts/exp_vmem_r4c.py
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

from climsim_tpu.ops.pallas_rnn import fused_bigru_heads_lbh

B, L, H, nm, ny = 21600, 60, 192, 16, 6
NX = 26          # post-init-MLP-free x width proxy (like probe B's k3)
N = 20


def timeit(loop, args, label):
    jloop = jax.jit(loop)
    triv = jax.jit(lambda a: jnp.sum(
        jax.tree_util.tree_leaves(a)[0][(0,) * 2].astype(jnp.float32)))
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
    print(f"{label}: {med*1e3:.2f} ms/iter", flush=True)
    return med


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 20)
    s = 0.3
    bf = jnp.bfloat16
    mk = lambda k, sh: (jax.random.normal(k, sh, jnp.float32) * s).astype(bf)

    w = (mk(ks[3], (NX, 3 * H)), mk(ks[4], (3 * H,)),
         mk(ks[5], (H, 3 * H)), mk(ks[6], (3 * H,)),
         mk(ks[7], (H, 3 * H)), mk(ks[8], (3 * H,)),
         mk(ks[9], (H, 3 * H)), mk(ks[10], (3 * H,)),
         mk(ks[11], (H, nm)), mk(ks[12], (nm,)),
         mk(ks[13], (nm, ny)), mk(ks[14], (ny,)))
    x0 = mk(ks[0], (L, B, NX))
    h0u = mk(ks[1], (B, H))
    h0d = mk(ks[2], (B, H))
    mem0 = mk(ks[15], (L, B, nm))

    def kernel(x, h0u_, h0d_):
        return fused_bigru_heads_lbh(x, h0u_, h0d_, *w)

    # D1: mem carry via lasth proxy, consume sum(out)
    def d1(a):
        x, = a
        def body(h, _):
            out, mem, lasth = kernel(x, h, h0d)
            return lasth, jnp.sum(out[0, 0].astype(jnp.float32))
        hh, accs = jax.lax.scan(body, h0u, None, length=N)
        return jnp.sum(accs)
    timeit(d1, (x0,), "D1_fixed_x_sum_out")

    # D2: consume out via 6 channel slices + transpose
    def d2(a):
        x, = a
        def body(h, _):
            out, mem, lasth = kernel(x, h, h0d)
            acc = sum(jnp.sum(out[:, :, j].T.astype(jnp.float32))
                      for j in range(ny))
            return lasth, acc
        hh, accs = jax.lax.scan(body, h0u, None, length=N)
        return jnp.sum(accs)
    timeit(d2, (x0,), "D2_slice_consume")

    # D3: rebuild x each step from 6 carried [B, L] fields (fields held
    # constant — isolates the stack/broadcast cost)
    f0 = tuple(mk(ks[16], (B, L)) for _ in range(6))
    pad_extra = mk(ks[17], (L, B, NX - 6))

    def d3(a):
        fields = a
        def body(h, _):
            x = jnp.concatenate(
                [jnp.stack([f.T for f in fields], axis=-1).astype(bf),
                 pad_extra], axis=-1)
            out, mem, lasth = kernel(x, h, h0d)
            return lasth, jnp.sum(out[0, 0].astype(jnp.float32))
        hh, accs = jax.lax.scan(body, h0u, None, length=N)
        return jnp.sum(accs)
    timeit(d3, f0, "D3_rebuild_x")

    # D4: full emulator context — state fields carried and updated
    def d4(a):
        fields, mem = a
        def body(carry, _):
            fs, mem = carry
            x = jnp.concatenate(
                [jnp.stack([f.T for f in fs], axis=-1).astype(bf),
                 pad_extra], axis=-1)
            out, mem2, lasth = kernel(x, h0u, h0d)
            dt = jnp.asarray(1e-3, jnp.float32)
            fs2 = tuple(f + dt * out[:, :, j].T.astype(jnp.float32)
                        for j, f in enumerate(fs))
            return (fs2, mem2), jnp.sum(out[0, 0].astype(jnp.float32))
        (fs, mem), accs = jax.lax.scan(body, (fields, mem), None, length=N)
        return jnp.sum(accs)
    f32_fields = tuple(f.astype(jnp.float32) for f in f0)
    timeit(d4, (f32_fields, mem0), "D4_full_emulator_context")


if __name__ == "__main__":
    main()
