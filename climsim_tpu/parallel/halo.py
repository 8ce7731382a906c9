"""Halo exchange for domain-decomposed stencils over the device mesh.

The genuinely new parallel machinery of this framework (SURVEY.md §2.6,
§5 "long context"): the reference's online path runs advection inside the
Fortran host model with MPI; here the horizontal grid is decomposed over a
mesh axis and stencils get their ghost cells via ``jax.lax.ppermute`` inside
``shard_map`` — neighbor transfers ride the ICI ring and XLA overlaps them
with independent compute.

Convention: arrays are [rows, ...] inside each shard, decomposed along the
leading (row/latitude) axis of a structured proxy grid; the halo is
``width`` rows from each neighbor. The global domain is non-periodic in
rows (poles) — edge shards get their own boundary rows replicated
(clamped boundary), matching the advection scheme's pole treatment.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def exchange_halo(x: jnp.ndarray, axis_name: str, width: int = 1,
                  periodic: bool = False) -> jnp.ndarray:
    """Return x extended with ``width`` ghost rows on both ends of axis 0,
    filled from the neighboring shards via ppermute.

    Must be called inside shard_map with ``axis_name`` bound. For edge
    shards of a non-periodic domain the ghost rows clamp to the shard's own
    boundary row.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)

    top = x[:width]        # rows sent to the next shard's... see perms below
    bot = x[-width:]

    # ppermute pairs are (source, dest): our top halo receives the BOTTOM
    # rows of shard idx-1 -> pairs (i, i+1); our bottom halo receives the
    # TOP rows of shard idx+1 -> pairs (i, i-1)
    perm_fwd = [(i, (i + 1) % n) for i in range(n)] if periodic else \
        [(i, i + 1) for i in range(n - 1)]
    perm_bwd = [(i, (i - 1) % n) for i in range(n)] if periodic else \
        [(i, i - 1) for i in range(1, n)]

    from_prev = jax.lax.ppermute(bot, axis_name, perm_fwd)
    from_next = jax.lax.ppermute(top, axis_name, perm_bwd)

    if not periodic:
        # clamped boundary at global edges
        first = idx == 0
        last = idx == n - 1
        from_prev = jnp.where(first, jnp.broadcast_to(x[:1], top.shape),
                              from_prev)
        from_next = jnp.where(last, jnp.broadcast_to(x[-1:], bot.shape),
                              from_next)
    return jnp.concatenate([from_prev, x, from_next], axis=0)


def sharded_stencil(fn, mesh: Mesh, axis: str = "col", width: int = 1,
                    periodic: bool = False):
    """Lift ``fn(x_with_halo) -> y`` (shape [rows, ...] -> [rows, ...]) to a
    mesh-sharded operator over axis 0. ``fn`` receives the shard extended by
    the halo and must return the interior result (same rows as the shard)."""
    from jax import shard_map

    def local(x):
        xh = exchange_halo(x, axis, width, periodic)
        return fn(xh)

    return shard_map(local, mesh=mesh, in_specs=P(axis),
                     out_specs=P(axis))


def global_sum(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """psum over the mesh axis (conservation checks across shards)."""
    return jax.lax.psum(x, axis_name)
