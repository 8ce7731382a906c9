"""Multi-host execution, simulated: 2 localhost processes rendezvous via
jax.distributed.initialize, build a global mesh with make_global_mesh, and
run a psum'd data-parallel training step (the reference only ever ran DDP
on real Slurm GPU allocations, train_mlp_h5loader.py:28-37 — this runs the
same path in CI with no hardware).

Each worker gets 2 virtual CPU devices -> a 4-device global mesh across
2 processes. Both ranks must agree on the (all-reduced) loss, and the
loss must equal a single-process run over the same global batch.
"""
import os
import re
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["REPO"])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")

from climsim_tpu.parallel.mesh import (init_distributed, make_global_mesh,
                                       data_parallel_step, replicate,
                                       shard_batch)

rank = int(sys.argv[1])
pid, n = init_distributed(coordinator_address="localhost:%PORT%",
                          num_processes=2, process_id=rank)
assert n == 2, n
assert jax.device_count() == 4, jax.device_count()

import jax.numpy as jnp
import numpy as np

mesh = make_global_mesh({"data": 4})

# tiny linear-regression step; params replicated, batch sharded
rng = np.random.default_rng(0)
W_true = rng.normal(0, 1, (8, 3)).astype(np.float32)
X = rng.normal(0, 1, (16, 8)).astype(np.float32)
Y = X @ W_true

def step(W, x, y):
    def loss_fn(W):
        return jnp.mean((x @ W - y) ** 2)
    l, g = jax.value_and_grad(loss_fn)(W)
    return W - 0.1 * g, l

dp = data_parallel_step(step, mesh)
W = replicate(mesh, jnp.zeros((8, 3), jnp.float32))
# multi-process arrays: assemble the global sharded batch from
# process-local shards (each process owns its addressable slice)
from jax.sharding import NamedSharding, PartitionSpec as P
sh = NamedSharding(mesh, P("data"))
def put_global(a):
    return jax.make_array_from_callback(
        a.shape, sh, lambda idx: a[idx])
Xs, Ys = put_global(X), put_global(Y)
losses = []
for i in range(5):
    W, l = dp(W, Xs, Ys)
    # the loss is replicated; fetching it is the implicit all-reduce check
    losses.append(float(np.asarray(jax.device_get(l))))
print("RANK", rank, "LOSSES", " ".join(f"{v:.8f}" for v in losses),
      flush=True)
"""


def test_two_process_localhost_training_step(tmp_path):
    import socket
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    script = tmp_path / "worker.py"
    script.write_text(WORKER.replace("%PORT%", str(port)))
    env = dict(os.environ, REPO=os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    # the worker must manage its own platform/flags
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen([sys.executable, str(script), str(r)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env, text=True)
             for r in (0, 1)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for r, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {r} failed:\n{out[-3000:]}"

    losses = {}
    for out in outs:
        mres = re.search(r"RANK (\d) LOSSES (.+)", out)
        assert mres, out[-2000:]
        losses[int(mres.group(1))] = [float(v)
                                      for v in mres.group(2).split()]
    # both ranks see the identical all-reduced loss trajectory
    np.testing.assert_allclose(losses[0], losses[1], rtol=0, atol=0)
    assert losses[0][-1] < losses[0][0]    # it actually trains

    # and the distributed trajectory equals a single-process run on the
    # same global batch
    rng = np.random.default_rng(0)
    W_true = rng.normal(0, 1, (8, 3)).astype(np.float32)
    X = rng.normal(0, 1, (16, 8)).astype(np.float32)
    Y = X @ W_true
    W = np.zeros((8, 3), np.float32)
    ref = []
    for _ in range(5):
        pred = X @ W
        ref.append(float(np.mean((pred - Y) ** 2)))
        # dL/dW for mean over all elements: 2/(N*K) X^T (XW - Y)
        g = 2 * X.T @ (pred - Y) / (X.shape[0] * W.shape[1])
        W = W - 0.1 * g
    np.testing.assert_allclose(losses[0], ref, rtol=2e-5)
