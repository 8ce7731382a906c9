"""Round-4 probe: can interleaving two INDEPENDENT GRU chains overlap
the MXU (recurrent matmul) with the VPU (gates)?

The flagship emulator kernel is a serial 60-level chain per sweep: each
level's recurrent dot feeds gates feeds the next dot, so the MXU idles
during gate arithmetic and vice versa — the round-4 N-scaling probe
showed the fused kernel is MXU-LATENCY-bound (exp_vmem_r4e), and the
roofline (docs/kernels.md) puts pure-MXU time at ~6 ms vs ~15.7 ms
measured. If Mosaic schedules two independent chains' ops concurrently,
a software-pipelined kernel (down-sweep of tile k interleaved with
up-sweep of tile k+1) recovers the serialization loss.

Arms (identical total work: 2 chains x NSTEP GRU steps, H=192, Bt=1408
lanes, bf16 weights / f32 gates — the flagship cm-kernel shapes):
  seq   chain A fully, then chain B fully
  int   one loop, each iteration does one step of A and one of B
Run: timeout 1200 python artifacts/exp_interleave_r4.py
"""
import functools
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tests", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from climsim_tpu.ops.pallas_rnn import _gru_step_cm  # noqa: E402

H, BT, NSTEP = 192, 1408, 60


def _seq_kernel(ha_ref, hb_ref, whh_ref, bhh_ref, oa_ref, ob_ref):
    whh = whh_ref[:]
    bhh = bhh_ref[:].astype(jnp.float32)
    ha = ha_ref[:].astype(jnp.float32)
    hb = hb_ref[:].astype(jnp.float32)
    zeros = jnp.zeros((3 * H, BT), jnp.float32)
    step = lambda _, h: _gru_step_cm(h, zeros, whh, bhh, H)
    ha = jax.lax.fori_loop(0, NSTEP, step, ha)
    hb = jax.lax.fori_loop(0, NSTEP, step, hb)
    oa_ref[:] = ha.astype(oa_ref.dtype)
    ob_ref[:] = hb.astype(ob_ref.dtype)


def _int_kernel(ha_ref, hb_ref, whh_ref, bhh_ref, oa_ref, ob_ref):
    whh = whh_ref[:]
    bhh = bhh_ref[:].astype(jnp.float32)
    ha = ha_ref[:].astype(jnp.float32)
    hb = hb_ref[:].astype(jnp.float32)
    zeros = jnp.zeros((3 * H, BT), jnp.float32)

    def step(_, hs):
        ha, hb = hs
        ha = _gru_step_cm(ha, zeros, whh, bhh, H)
        hb = _gru_step_cm(hb, zeros, whh, bhh, H)
        return ha, hb

    ha, hb = jax.lax.fori_loop(0, NSTEP, step, (ha, hb))
    oa_ref[:] = ha.astype(oa_ref.dtype)
    ob_ref[:] = hb.astype(ob_ref.dtype)


def build(kernel):
    full = lambda shape: pl.BlockSpec(shape, lambda: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        in_specs=[full((H, BT)), full((H, BT)), full((3 * H, H)),
                  full((3 * H, 1))],
        out_specs=[full((H, BT)), full((H, BT))],
        out_shape=[jax.ShapeDtypeStruct((H, BT), jnp.bfloat16)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )

    @jax.jit
    def loop(ha, hb, whh, bhh):
        def body(carry, _):
            ha, hb = carry
            ha, hb = call(ha, hb, whh, bhh)
            return (ha, hb), ()
        (ha, hb), _ = jax.lax.scan(body, (ha, hb), None, length=20)
        return jnp.sum(ha[0, :8].astype(jnp.float32))
    return loop


def main():
    k = jax.random.PRNGKey(0)
    ha = jax.random.normal(k, (H, BT), jnp.bfloat16)
    hb = ha + jnp.asarray(0.1, jnp.bfloat16)
    whh = 0.05 * jax.random.normal(k, (3 * H, H)).astype(jnp.bfloat16)
    bhh = jnp.zeros((3 * H, 1), jnp.bfloat16)

    triv = jax.jit(lambda a: jnp.sum(a[0, :8].astype(jnp.float32)))
    float(triv(ha))
    t0 = time.perf_counter()
    for _ in range(3):
        float(triv(ha))
    fetch = (time.perf_counter() - t0) / 3

    for name, kern in (("seq", _seq_kernel), ("int", _int_kernel)):
        loop = build(kern)
        float(loop(ha, hb, whh, bhh))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(loop(ha, hb, whh, bhh))
            ts.append(max(time.perf_counter() - t0 - fetch, 1e-9))
        med = statistics.median(ts) / 20
        # per chain-step time: 2 chains x NSTEP steps per call
        print(f"{name}: {med*1e3:.3f} ms/call = "
              f"{med/(2*NSTEP)*1e6:.2f} us per GRU step "
              f"(spread {(max(ts)-min(ts))/statistics.median(ts):.0%})",
              flush=True)


if __name__ == "__main__":
    main()
