"""Device mesh + sharding helpers: the framework's DDP/NCCL replacement.

The reference scales with torch DDP over NCCL (Modulus DistributedManager,
online_testing train_mlp_h5loader.py:28-37,195-207). Here the same role is
played by a `jax.sharding.Mesh` with named axes and sharding annotations:
XLA inserts the gradient all-reduce over ICI automatically when parameters
are replicated and the batch is sharded.

Axes convention (SURVEY.md §2.6 TPU-native targets):
  'data'     — batch/column data parallelism (DDP equivalent)
  'ensemble' — model-replica axis for RPN-style ensembles
  'col'      — domain-decomposed columns with halo exchange (online stencils)
"""
from __future__ import annotations

from functools import partial

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def make_mesh_2d(n_data: int, n_ens: int) -> Mesh:
    devs = np.asarray(jax.devices()[:n_data * n_ens]).reshape(n_data, n_ens)
    return Mesh(devs, ("data", "ensemble"))


def shard_batch(mesh: Mesh, *arrays, axis: str = "data"):
    """Place arrays with their leading dim sharded over ``axis``."""
    out = []
    for a in arrays:
        spec = P(axis, *([None] * (a.ndim - 1)))
        out.append(jax.device_put(a, NamedSharding(mesh, spec)))
    return out[0] if len(out) == 1 else tuple(out)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (parameters/optimizer state) on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def data_parallel_step(step_fn, mesh: Mesh, axis: str = "data"):
    """Wrap a (state, x, y) -> (state, loss) step for data parallelism: state
    replicated, batch sharded on ``axis``. jit partitions automatically and
    emits psum over ICI for the gradient reduction."""
    state_sharding = NamedSharding(mesh, P())
    batch_sharding = NamedSharding(mesh, P(axis))

    jitted = jax.jit(
        step_fn,
        in_shardings=(state_sharding, batch_sharding, batch_sharding),
        out_shardings=(state_sharding, NamedSharding(mesh, P())),
        donate_argnums=0,
    )
    return jitted


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None):
    """Multi-host initialization: wraps jax.distributed.initialize (the
    torch.distributed/Slurm-rendezvous role). No-ops when already
    initialized or when env-based auto-detection applies."""
    import jax

    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (RuntimeError, ValueError):
        pass  # already initialized or single-process
    return jax.process_index(), jax.process_count()


def make_global_mesh(axes: dict[str, int] | None = None):
    """Mesh over ALL devices across hosts. axes: name->size (product must
    equal total device count); default one 'data' axis."""
    import jax
    from jax.experimental import mesh_utils

    devs = jax.devices()
    if axes is None:
        axes = {"data": len(devs)}
    shape = tuple(axes.values())
    mesh_devs = mesh_utils.create_device_mesh(shape, devices=devs)
    return Mesh(mesh_devs, tuple(axes.keys()))
