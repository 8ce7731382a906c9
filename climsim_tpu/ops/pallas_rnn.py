"""Fused bidirectional GRU Pallas kernel — the emulator's hot op.

The RNNAutoreg column sweeps (models/rnn.py) are 2x60 sequential GRU steps.
Under plain XLA each step's recurrent matmul round-trips activations
through HBM; this kernel keeps the whole working set — both recurrent
weight matrices, the level-projected inputs, and the intermediate upward
hidden states — resident in VMEM for a batch tile, and additionally FUSES
the downward sweep's input projection (up_out @ W_in2) into the same
kernel, so the [B, 60, H] intermediate never touches HBM.

Layout: batch tiled over the pallas grid; per level the recurrent update is
one [Bt, H] x [H, 3H] MXU matmul + VPU gates. GRU algebra matches
cells.GRUCell exactly (r,z,n gates, h' = (1-z)n + zh).

Gradients: the op carries a custom VJP whose backward recomputes the
sweeps with the scan-based reference implementation (jax.vjp) — forward
inference/serving runs at kernel speed, training gets correct gradients;
a hand-written backward kernel is the follow-up optimization.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gru_step(h, x_proj, w_hh, b_hh, H: int):
    """One GRU update; x_proj [Bt, 3H] already includes the input bias."""
    hh = jnp.dot(h, w_hh, preferred_element_type=jnp.float32) + b_hh
    xr, xz, xn = x_proj[:, :H], x_proj[:, H:2 * H], x_proj[:, 2 * H:]
    hr, hz, hn = hh[:, :H], hh[:, H:2 * H], hh[:, 2 * H:]
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return (1.0 - z) * n + z * h


def _bigru_kernel(xp_ref, h0u_ref, h0d_ref, whh_u_ref, bhh_u_ref,
                  win2_ref, bin2_ref, whh_d_ref, bhh_d_ref,
                  down_ref, lasth_ref, up_scratch, *, L: int, H: int):
    """One batch tile: upward sweep (level L-1 -> 0) then downward sweep
    (0 -> L-1) with the down input projection fused."""
    whh_u = whh_u_ref[:]
    bhh_u = bhh_u_ref[:].astype(jnp.float32)
    whh_d = whh_d_ref[:]
    bhh_d = bhh_d_ref[:].astype(jnp.float32)
    win2 = win2_ref[:]
    bin2 = bin2_ref[:].astype(jnp.float32)

    h = h0u_ref[:].astype(jnp.float32)

    def up_body(i, h):
        l = L - 1 - i
        xp = xp_ref[:, l, :].astype(jnp.float32)
        h = _gru_step(h, xp, whh_u, bhh_u, H)
        up_scratch[:, l, :] = h.astype(up_scratch.dtype)
        return h

    jax.lax.fori_loop(0, L, up_body, h)

    h2 = h0d_ref[:].astype(jnp.float32)

    def down_body(l, h2):
        up_l = up_scratch[:, l, :].astype(jnp.float32)
        xp2 = jnp.dot(up_l, win2,
                      preferred_element_type=jnp.float32) + bin2
        h2 = _gru_step(h2, xp2, whh_d, bhh_d, H)
        down_ref[:, l, :] = h2.astype(down_ref.dtype)
        return h2

    h2 = jax.lax.fori_loop(0, L, down_body, h2)
    lasth_ref[:] = h2.astype(lasth_ref.dtype)


def _bigru_pallas(x_proj_up, h0_up, h0_dn, whh_up, bhh_up, win2, bin2,
                  whh_dn, bhh_dn, block_b: int = 64,
                  interpret: bool = False):
    B, L, threeH = x_proj_up.shape
    H = threeH // 3
    nb = pl.cdiv(B, block_b)

    kernel = functools.partial(_bigru_kernel, L=L, H=H)
    in_specs = [
            pl.BlockSpec((block_b, L, threeH), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, threeH), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((threeH,), lambda i: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, threeH), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((threeH,), lambda i: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, threeH), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((threeH,), lambda i: (0,),
                         memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((block_b, L, H), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_b, H), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    down, lasth = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((B, L, H), x_proj_up.dtype),
            jax.ShapeDtypeStruct((B, H), x_proj_up.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((block_b, L, H), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x_proj_up, h0_up, h0_dn, whh_up, bhh_up, win2, bin2, whh_dn, bhh_dn)
    return down, lasth


def _bigru_reference(x_proj_up, h0_up, h0_dn, whh_up, bhh_up, win2, bin2,
                     whh_dn, bhh_dn):
    """Scan-based reference (identical math; used for VJP + testing)."""
    H = h0_up.shape[-1]

    def up_step(h, xp):
        h = _gru_step(h, xp, whh_up, bhh_up, H)
        return h, h

    xs = jnp.swapaxes(x_proj_up, 0, 1)            # [L, B, 3H]
    _, up = jax.lax.scan(up_step, h0_up, xs, reverse=True)

    def down_step(h2, up_l):
        xp2 = jnp.dot(up_l, win2,
                      preferred_element_type=jnp.float32) + bin2
        h2 = _gru_step(h2, xp2, whh_dn, bhh_dn, H)
        return h2, h2

    lasth, down = jax.lax.scan(down_step, h0_dn, up)
    return jnp.swapaxes(down, 0, 1), lasth


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def fused_bigru(x_proj_up, h0_up, h0_dn, whh_up, bhh_up, win2, bin2,
                whh_dn, bhh_dn, block_b: int = 64, interpret: bool = False):
    """Fused bidirectional GRU: returns (down_out [B,L,H], last_h [B,H])."""
    return _bigru_pallas(x_proj_up, h0_up, h0_dn, whh_up, bhh_up, win2,
                         bin2, whh_dn, bhh_dn, block_b, interpret)


def _fwd(x_proj_up, h0_up, h0_dn, whh_up, bhh_up, win2, bin2, whh_dn,
         bhh_dn, block_b, interpret):
    out = _bigru_pallas(x_proj_up, h0_up, h0_dn, whh_up, bhh_up, win2,
                        bin2, whh_dn, bhh_dn, block_b, interpret)
    return out, (x_proj_up, h0_up, h0_dn, whh_up, bhh_up, win2, bin2,
                 whh_dn, bhh_dn)


def _bwd(block_b, interpret, res, g):
    _, vjp = jax.vjp(_bigru_reference, *res)
    return vjp(g)


fused_bigru.defvjp(_fwd, _bwd)


class PallasBiGRU:
    """Parameter container + apply logic for the fused kernel, usable from
    flax modules. Owns the same matmuls as two RNNLayer('gru') sweeps:
    up input projection (hoisted, XLA), fused up/down recurrences (pallas),
    down input projection fused into the kernel."""

    @staticmethod
    def init_params(key, nx: int, H: int, dtype=jnp.float32):
        import math
        ks = jax.random.split(key, 8)
        glorot = lambda k, shape: jax.random.normal(k, shape, dtype) \
            * math.sqrt(2.0 / sum(shape))
        return {
            "win1": glorot(ks[0], (nx, 3 * H)),
            "bin1": jnp.zeros((3 * H,), dtype),
            "whh_up": glorot(ks[1], (H, 3 * H)),
            "bhh_up": jnp.zeros((3 * H,), dtype),
            "win2": glorot(ks[2], (H, 3 * H)),
            "bin2": jnp.zeros((3 * H,), dtype),
            "whh_dn": glorot(ks[3], (H, 3 * H)),
            "bhh_dn": jnp.zeros((3 * H,), dtype),
        }

    @staticmethod
    def apply(p, x, h0_up, h0_dn, use_pallas: bool = True,
              block_b: int = 64, interpret: bool = False):
        """x [B, L, nx] -> (down_out [B, L, H], last_h [B, H])."""
        xp = jnp.einsum("blx,xh->blh", x, p["win1"]) + p["bin1"]
        if use_pallas:
            return fused_bigru(xp, h0_up, h0_dn, p["whh_up"], p["bhh_up"],
                               p["win2"], p["bin2"], p["whh_dn"],
                               p["bhh_dn"], block_b, interpret)
        return _bigru_reference(xp, h0_up, h0_dn, p["whh_up"], p["bhh_up"],
                                p["win2"], p["bin2"], p["whh_dn"],
                                p["bhh_dn"])
