"""Fused bidirectional GRU Pallas kernel — the emulator's hot op.

The RNNAutoreg column sweeps (models/rnn.py) are 2x60 sequential GRU steps.
Under plain XLA each step's recurrent matmul round-trips activations
through HBM (projected inputs re-read per level, the upward sweep's
[B, 60, H] output written and re-read by the downward sweep); this kernel
keeps the whole working set — both recurrent weight matrices, the
level-projected inputs for a batch tile, and the intermediate upward
hidden states — resident in VMEM, and additionally FUSES the downward
sweep's input projection (up_out @ W_in2) into the same kernel, so the
[B, 60, H] intermediate never touches HBM.

Layout: LEVEL-MAJOR [L, B, ...] everywhere inside the kernel so every
per-level access indexes the leading (untiled) axis — Mosaic then sees
clean (batch, feature) tiles regardless of dtype; batch is tiled over the
pallas grid (DMA of the next tile's projections overlaps compute). Per
level the recurrent update is one [Bt, H] x [H, 3H] MXU matmul + VPU
gates; gate algebra matches cells.GRUCell exactly (r,z,n gates,
h' = (1-z)n + zh). Matmuls run in the input dtype (bf16 streams the MXU
at full rate) with f32 accumulation; the carried hidden state stays f32.

Tile sizing: the old default (block_b=64) left the MXU latency-bound —
96 grid steps x 120 serial [64,192]x[192,576] matmuls. ``block_b=None``
now auto-picks the largest tile that fits the VMEM budget (xp tile is
double-buffered by the pipeline), which on the v5e lands at 256-384 rows.

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

# VMEM working-set budget for auto tile sizing (bytes). The v5e exposes
# 128 MiB; leave headroom for Mosaic's own buffers. (block_b=512 at the
# flagship bf16 shapes = ~107 MB measured compiling fine at the 127 MB
# scoped limit and is the fastest tested tile.)
_VMEM_BUDGET = 112 * 1024 * 1024


def _gru_step(h, x_proj, w_hh, b_hh, H: int):
    """One GRU update; x_proj [Bt, 3H] already includes the input bias.

    h arrives in the accumulation dtype (f32, or f64 under x64 test
    mode); the recurrent matmul runs in the weight dtype (bf16 on the
    bf16 path) with accumulation-width results; gates are evaluated in
    the accumulation dtype.
    """
    acc = h.dtype
    # Mosaic requires 32-bit matmul accumulation; sub-f32 gate dtypes
    # apply from the elementwise stage on (cast after the dot)
    mm = jnp.promote_types(acc, jnp.float32)
    hh = (jnp.dot(h.astype(w_hh.dtype), w_hh,
                  preferred_element_type=mm)
          + b_hh.astype(mm)).astype(acc)
    xr, xz, xn = x_proj[:, :H], x_proj[:, H:2 * H], x_proj[:, 2 * H:]
    hr, hz, hn = hh[:, :H], hh[:, H:2 * H], hh[:, 2 * H:]
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    # explicit-dtype constant: Mosaic rejects weak-f32 scalar broadcasts
    # into sub-f32 vectors
    one = jnp.asarray(1.0, z.dtype)
    return (one - z) * n + z * h


def _bigru_kernel(xp_ref, h0u_ref, h0d_ref, whh_u_ref, bhh_u_ref,
                  win2_ref, bin2_ref, whh_d_ref, bhh_d_ref,
                  down_ref, lasth_ref, up_scratch, *, L: int, H: int,
                  acc32: bool = True):
    """One batch tile: upward sweep (level L-1 -> 0) then downward sweep
    (0 -> L-1) with the down input projection fused. All level-indexed
    refs are [L, Bt, ...] (leading-axis indexing). ``acc32=False`` runs
    the gate arithmetic in the input dtype (bf16 packs the VPU 2x — the
    sweep is gate-VPU-bound at large tiles; matches the XLA bf16 scan's
    numerics, which also carries bf16 hidden state)."""
    acc = jnp.float32 if acc32 else xp_ref.dtype
    whh_u = whh_u_ref[:]
    bhh_u = bhh_u_ref[:].astype(acc)
    whh_d = whh_d_ref[:]
    bhh_d = bhh_d_ref[:].astype(acc)
    win2 = win2_ref[:]
    bin2 = bin2_ref[:].astype(acc)

    h = h0u_ref[:].astype(acc)

    def up_body(i, h):
        l = L - 1 - i
        xp = xp_ref[l].astype(acc)
        h = _gru_step(h, xp, whh_u, bhh_u, H)
        up_scratch[l] = h.astype(up_scratch.dtype)
        return h

    jax.lax.fori_loop(0, L, up_body, h)

    h2 = h0d_ref[:].astype(acc)

    def down_body(l, h2):
        up_l = up_scratch[l]
        mm = jnp.promote_types(acc, jnp.float32)
        xp2 = (jnp.dot(up_l, win2, preferred_element_type=mm)
               + bin2.astype(mm)).astype(acc)
        h2 = _gru_step(h2, xp2, whh_d, bhh_d, H)
        down_ref[l] = h2.astype(down_ref.dtype)
        return h2

    h2 = jax.lax.fori_loop(0, L, down_body, h2)
    lasth_ref[:] = h2.astype(lasth_ref.dtype)


def _auto_block_b(B: int, L: int, H: int, itemsize: int) -> int:
    """Largest power-of-two-ish tile whose VMEM working set fits the
    budget: double-buffered xp [L, Bt, 3H] + scratch [L, Bt, H] +
    double-buffered down [L, Bt, H] (all in the input dtype; the carried
    h is registers/f32 and negligible)."""
    for bt in (512, 384, 256, 192, 128, 96, 64, 32, 16, 8):
        if bt > B and bt != 8:
            continue
        per_row = L * (2 * 3 * H + H + 2 * H) * itemsize
        if bt * per_row <= _VMEM_BUDGET:
            return min(bt, max(B, 8))
    return 8


def _bigru_pallas_lbh(xp, h0_up, h0_dn, whh_up, bhh_up, win2, bin2,
                      whh_dn, bhh_dn, block_b=None, interpret=False,
                      acc32=True):
    """Level-major entry: xp [L, B, 3H] -> (down [L, B, H], last_h [B, H])."""
    L, B, threeH = xp.shape
    H = threeH // 3
    if block_b is None:
        block_b = _auto_block_b(B, L, H, xp.dtype.itemsize)
    nb = pl.cdiv(B, block_b)

    kernel = functools.partial(_bigru_kernel, L=L, H=H, acc32=acc32)
    in_specs = [
            pl.BlockSpec((L, block_b, threeH), lambda i: (0, i, 0),
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
        pl.BlockSpec((L, block_b, H), lambda i: (0, i, 0),
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
            jax.ShapeDtypeStruct((L, B, H), xp.dtype),
            jax.ShapeDtypeStruct((B, H), xp.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((L, block_b, H), xp.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        interpret=interpret,
    )(xp, h0_up, h0_dn, whh_up, bhh_up, win2, bin2, whh_dn, bhh_dn)
    return down, lasth


def _bigru_reference_lbh(xp, h0_up, h0_dn, whh_up, bhh_up, win2, bin2,
                         whh_dn, bhh_dn):
    """Scan-based reference in level-major layout (identical math; used
    for VJP + testing). Carries f32 hidden state like the kernel."""
    H = h0_up.shape[-1]
    out_dt = xp.dtype
    acc = jnp.promote_types(out_dt, jnp.float32)

    def up_step(h, xp_l):
        h = _gru_step(h, xp_l.astype(acc), whh_up, bhh_up, H)
        return h, h.astype(out_dt)

    _, up = jax.lax.scan(up_step, h0_up.astype(acc), xp,
                         reverse=True)

    def down_step(h2, up_l):
        xp2 = jnp.dot(up_l.astype(win2.dtype), win2,
                      preferred_element_type=acc) + bin2.astype(acc)
        h2 = _gru_step(h2, xp2, whh_dn, bhh_dn, H)
        return h2, h2.astype(out_dt)

    lasth, down = jax.lax.scan(down_step, h0_dn.astype(acc), up)
    return down, lasth.astype(out_dt)


def _bigru_reference(x_proj_up, h0_up, h0_dn, whh_up, bhh_up, win2, bin2,
                     whh_dn, bhh_dn):
    """Batch-major reference: x_proj_up [B, L, 3H] -> ([B, L, H], [B, H])."""
    down, lasth = _bigru_reference_lbh(
        jnp.swapaxes(x_proj_up, 0, 1), h0_up, h0_dn, whh_up, bhh_up,
        win2, bin2, whh_dn, bhh_dn)
    return jnp.swapaxes(down, 0, 1), lasth


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def fused_bigru_lbh(xp, h0_up, h0_dn, whh_up, bhh_up, win2, bin2,
                    whh_dn, bhh_dn, block_b=None, interpret: bool = False,
                    acc32: bool = True):
    """Fused bidirectional GRU, level-major: xp [L, B, 3H] ->
    (down_out [L, B, H], last_h [B, H])."""
    return _bigru_pallas_lbh(xp, h0_up, h0_dn, whh_up, bhh_up, win2,
                             bin2, whh_dn, bhh_dn, block_b, interpret,
                             acc32)


def _fwd(xp, h0_up, h0_dn, whh_up, bhh_up, win2, bin2, whh_dn,
         bhh_dn, block_b, interpret, acc32):
    out = _bigru_pallas_lbh(xp, h0_up, h0_dn, whh_up, bhh_up, win2,
                            bin2, whh_dn, bhh_dn, block_b, interpret,
                            acc32)
    return out, (xp, h0_up, h0_dn, whh_up, bhh_up, win2, bin2,
                 whh_dn, bhh_dn)


def _bwd(block_b, interpret, acc32, res, g):
    _, vjp = jax.vjp(_bigru_reference_lbh, *res)
    return vjp(g)


fused_bigru_lbh.defvjp(_fwd, _bwd)


def fused_bigru(x_proj_up, h0_up, h0_dn, whh_up, bhh_up, win2, bin2,
                whh_dn, bhh_dn, block_b=None, interpret: bool = False):
    """Batch-major wrapper: x_proj_up [B, L, 3H] ->
    (down_out [B, L, H], last_h [B, H]). Prefer feeding the level-major
    entry directly (produce the projection with einsum '...->lbh') so no
    HBM transpose sits in front of the kernel."""
    down, lasth = fused_bigru_lbh(
        jnp.swapaxes(x_proj_up, 0, 1), h0_up, h0_dn, whh_up, bhh_up,
        win2, bin2, whh_dn, bhh_dn, block_b, interpret)
    return jnp.swapaxes(down, 0, 1), lasth


class PallasBiGRU:
    """Parameter container + apply logic for the fused kernel, usable from
    flax modules. Owns the same matmuls as two RNNLayer('gru') sweeps:
    up input projection (hoisted, XLA, written level-major so the kernel
    reads it without a transpose), fused up/down recurrences (pallas),
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
              block_b=None, interpret: bool = False):
        """x [B, L, nx] -> (down_out [B, L, H], last_h [B, H])."""
        xp = jnp.einsum("blx,xh->lbh", x, p["win1"]) + p["bin1"]
        if use_pallas:
            down, lasth = fused_bigru_lbh(
                xp, h0_up, h0_dn, p["whh_up"], p["bhh_up"], p["win2"],
                p["bin2"], p["whh_dn"], p["bhh_dn"], block_b, interpret)
        else:
            down, lasth = _bigru_reference_lbh(
                xp, h0_up, h0_dn, p["whh_up"], p["bhh_up"], p["win2"],
                p["bin2"], p["whh_dn"], p["bhh_dn"])
        return jnp.swapaxes(down, 0, 1), lasth
