"""Serialized deployment artifacts: the TorchScript-export equivalent.

The reference ships every best checkpoint as TorchScript .pt (cpu+gpu,
wrapped+unwrapped, driver :1012-1034) for FTorch consumption. The
TPU-native artifact is a ``jax.export`` StableHLO payload of the jitted
raw-units wrapper step: portable across JAX versions/devices, loadable
without the model code, and callable from C++ via the XLA runtime (PJRT) —
the role FTorch plays for the Fortran host.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def export_step(fn, example_args, path: str):
    """Serialize jit(fn) for the example argument shapes to ``path``
    (StableHLO bytes via jax.export). Returns the byte size."""
    from jax import export as jexport

    exported = jexport.export(jax.jit(fn))(*example_args)
    blob = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    return len(blob)


def load_step(path: str):
    """Deserialize an exported step; returns a callable."""
    from jax import export as jexport

    with open(path, "rb") as f:
        blob = f.read()
    exported = jexport.deserialize(bytearray(blob))
    return exported.call


def export_wrapper(wrapper, batch: int, nlev: int, nx: int, nx_sfc: int,
                   nh_mem: int, path: str):
    """Export an OnlineWrapper's raw-units step for fixed shapes (the
    384-column ne4 contract)."""
    x_main = jnp.zeros((batch, nlev, nx), jnp.float32)
    x_sfc = jnp.zeros((batch, nx_sfc), jnp.float32)
    mem = jnp.zeros((batch, nlev, nh_mem), jnp.float32)
    return export_step(wrapper.__call__, (x_main, x_sfc, mem), path)
