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

Gradients: the op carries a custom VJP. On TPU the backward is a
hand-written Pallas kernel (`_bigru_bwd_kernel`): phase A replays both
sweeps for the batch tile storing hidden states + gate bundles in VMEM,
phase B runs BPTT through the down then up sweep — activations never
round-trip HBM and weight gradients accumulate across grid tiles in
revisiting f32 output blocks. Off-TPU the backward falls back to the
scan reference's VJP (identical math).
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


def _sigmoid_typed(x):
    """Sigmoid with every constant explicitly typed: jax.nn.sigmoid's
    lowering materializes weak-f32 scalar broadcasts that Mosaic rejects
    inside sub-f32 vectors; 1/(1+exp(-x)) built from typed constants
    dodges that (round-1 'bf16 gate arithmetic blocked' workaround)."""
    if x.dtype == jnp.float32 or x.dtype == jnp.float64:
        return jax.nn.sigmoid(x)
    one = jnp.asarray(1.0, x.dtype)
    return one / (one + jnp.exp(-x))


def _tanh_typed(x):
    """tanh via the typed sigmoid: tanh(x) = 2*sigmoid(2x) - 1."""
    if x.dtype == jnp.float32 or x.dtype == jnp.float64:
        return jnp.tanh(x)
    one = jnp.asarray(1.0, x.dtype)
    two = jnp.asarray(2.0, x.dtype)
    return two * _sigmoid_typed(two * x) - one


def _gru_step(h, x_proj, w_hh, b_hh, H: int):
    """One GRU update; x_proj [Bt, 3H] already includes the input bias.

    h arrives in the accumulation dtype (f32, or f64 under x64 test
    mode, or bf16 under acc32=False); the recurrent matmul runs in the
    weight dtype with 32-bit accumulation (Mosaic requirement); gates
    are evaluated in the accumulation dtype with explicitly-typed
    transcendentals so bf16 gate arithmetic lowers cleanly.
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
    r = _sigmoid_typed(xr + hr)
    z = _sigmoid_typed(xz + hz)
    n = _tanh_typed(xn + r * hn)
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


def _divisor_tile(B: int, cap: int, gran: int) -> int:
    """Largest tile <= cap that DIVIDES B and is a multiple of ``gran``
    (the sublane granularity). Full tiles without padding: the pad path
    round-trips the whole [L, B, 3H] projected series through HBM twice
    (jnp.pad + output slice), which measured ~25% of the flagship
    emulator forward at B=21,600 (round-2 bench regression)."""
    start = min(cap, B) // gran * gran
    for bt in range(start, gran - 1, -gran):
        if B % bt == 0:
            return bt
    return 0


def _auto_block_b(B: int, L: int, H: int, itemsize: int) -> int:
    """Largest tile whose VMEM working set fits the budget:
    double-buffered xp [L, Bt, 3H] + scratch [L, Bt, H] + double-buffered
    down [L, Bt, H] (all in the input dtype; the carried h is
    registers/f32 and negligible). Prefers a tile that divides B exactly
    (no pad copy); falls back to fixed power-of-two-ish tiles + in-op
    padding for batches without a usable divisor."""
    per_row = L * (2 * 3 * H + H + 2 * H) * itemsize
    cap = int(_VMEM_BUDGET // max(per_row, 1))
    gran = 16 if itemsize == 2 else 8
    div = _divisor_tile(B, min(cap, 512), gran)
    if div >= 128 or (div > 0 and div == B):
        return div
    for bt in (512, 384, 256, 192, 128, 96, 64, 32, 16, 8):
        if bt > B and bt != 8:
            continue
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
    # pad ragged batches to a tile multiple: Mosaic never sees a ragged
    # tile (a ragged-f32 backward config once faulted the TPU worker —
    # padding makes every tile full; the pad rows are zeros and their
    # outputs are sliced away)
    B0 = B
    if B % block_b:
        pad = block_b * pl.cdiv(B, block_b) - B
        padB = lambda a, ax: jnp.pad(a, [(0, pad) if i == ax else (0, 0)
                                         for i in range(a.ndim)])
        xp = padB(xp, 1)
        h0_up, h0_dn = padB(h0_up, 0), padB(h0_dn, 0)
        B = B + pad
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
    if B != B0:
        down, lasth = down[:, :B0], lasth[:B0]
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
    # NOTE: both backward paths linearize the f32-gate forward. With
    # acc32=False the primal ran bf16 gates, so the gradients belong to
    # the f32-gate function — a grad-of-nearby-function approximation
    # (standard for bf16 training; on hardware the mode is measurably
    # slower than f32 gates anyway, see FusedBiGRULayer.acc32).
    d_down, d_lasth = g
    xp = res[0]
    from . import on_tpu
    if interpret:
        return _bigru_bwd_pallas_lbh(res, d_down, d_lasth, None, interpret)
    if on_tpu():
        # hand-written BPTT kernel (replay + both backward sweeps in
        # VMEM; weight grads accumulate across tiles): 2.08x over the
        # scan VJP at flagship shapes. On-chip parity verified for f32
        # (<=5e-4) and bf16 (precision-class) with contractive weights.
        # Ragged batches are zero-padded to a full tile INSIDE the
        # wrapper (a ragged f32 tile once faulted the v5e worker — with
        # padding Mosaic only ever compiles full tiles, so there is no
        # scan-VJP fallback path anymore).
        return _bigru_bwd_pallas_lbh(res, d_down, d_lasth, None,
                                     interpret)
    _, vjp = jax.vjp(_bigru_reference_lbh, *res)
    return vjp(g)


fused_bigru_lbh.defvjp(_fwd, _bwd)


# --------------------------------------------------------------------------
# hand-written backward kernel (BPTT through both sweeps in VMEM)
# --------------------------------------------------------------------------
#
# Phase A replays both sweeps for the batch tile, storing per-level hidden
# states and gate values (r, z, n, hn) in VMEM scratch. Phase B walks the
# down sweep backward (producing d_up, accumulating dWin2/dWhh_dn), then
# the up sweep backward (producing d_xp, accumulating dWhh_up). Weight
# gradients accumulate across grid tiles in revisiting f32 output blocks
# (constant index map -> the block stays resident; zero-initialized at
# tile 0). GRU backward algebra, given stored gates and h_prev:
#   dz = dh(h_prev - n); dn = dh(1-z); dan = dn(1-n^2)
#   dar = (dan*hn) r(1-r); daz = dz z(1-z); dhn = dan*r
#   d_hh = [dar, daz, dhn];  d_xp = [dar, daz, dan]
#   dh_prev = dh*z + d_hh @ Whh^T
#   dWhh += h_prev^T @ d_hh; dbhh += sum_batch d_hh


def _gru_fwd_store(h, x_proj, w_hh, b_hh, H: int):
    """Forward step that also returns the gate bundle (r, z, n, hn)."""
    acc = h.dtype
    mm = jnp.promote_types(acc, jnp.float32)
    hh = (jnp.dot(h.astype(w_hh.dtype), w_hh,
                  preferred_element_type=mm)
          + b_hh.astype(mm)).astype(acc)
    xr, xz, xn = x_proj[:, :H], x_proj[:, H:2 * H], x_proj[:, 2 * H:]
    hr, hz, hn = hh[:, :H], hh[:, H:2 * H], hh[:, 2 * H:]
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    one = jnp.asarray(1.0, z.dtype)
    h_new = (one - z) * n + z * h
    return h_new, jnp.concatenate([r, z, n, hn], axis=-1)


def _gru_bwd_step(dh, gates, h_prev, w_hh, H: int):
    """One GRU backward step. dh/h_prev in f32; gates as stored.
    Returns (d_xp [Bt,3H] f32, dh_prev [Bt,H] f32, d_hh [Bt,3H] f32)."""
    f32 = jnp.float32
    r = gates[:, :H].astype(f32)
    z = gates[:, H:2 * H].astype(f32)
    n = gates[:, 2 * H:3 * H].astype(f32)
    hn = gates[:, 3 * H:].astype(f32)
    one = jnp.asarray(1.0, f32)
    dz = dh * (h_prev - n)
    dan = dh * (one - z) * (one - n * n)
    dar = dan * hn * r * (one - r)
    daz = dz * z * (one - z)
    dhn = dan * r
    d_hh = jnp.concatenate([dar, daz, dhn], axis=-1)
    d_xp = jnp.concatenate([dar, daz, dan], axis=-1)
    # d_hh @ Whh^T (contract the 3H axis)
    dh_prev = dh * z + jax.lax.dot_general(
        d_hh.astype(w_hh.dtype), w_hh, (((1,), (1,)), ((), ())),
        preferred_element_type=f32)
    return d_xp, dh_prev, d_hh


def _outer(a, b):
    """a [Bt, M] x b [Bt, N] -> [M, N] f32 (contract the batch axis)."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _bigru_bwd_kernel(xp_ref, h0u_ref, h0d_ref, whh_u_ref, bhh_u_ref,
                      win2_ref, bin2_ref, whh_d_ref, bhh_d_ref,
                      ddown_ref, dlasth_ref,
                      dxp_ref, dh0u_ref, dh0d_ref, dwhhu_ref, dbhhu_ref,
                      dwin2_ref, dbin2_ref, dwhhd_ref, dbhhd_ref,
                      up_h, g_h, gates_u, gates_d, dup_s,
                      *, L: int, H: int, B: int, block_b: int):
    f32 = jnp.float32
    # Ragged-tile masking: weight grads REDUCE over the batch, so padding
    # rows of the last tile (undefined memory) must be zeroed at load
    # (jnp.where, not *0 — NaN-safe).
    rem = B - pl.program_id(0) * block_b
    valid = jax.lax.broadcasted_iota(jnp.int32, (block_b, 1), 0) < rem

    def load(ref_slice):
        return jnp.where(valid, ref_slice,
                         jnp.zeros_like(ref_slice))

    whh_u = whh_u_ref[:]
    bhh_u = bhh_u_ref[:]
    whh_d = whh_d_ref[:]
    bhh_d = bhh_d_ref[:]
    win2 = win2_ref[:]
    bin2 = bin2_ref[:]
    wdt = whh_u.dtype

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwhhu_ref[:] = jnp.zeros_like(dwhhu_ref)
        dbhhu_ref[:] = jnp.zeros_like(dbhhu_ref)
        dwin2_ref[:] = jnp.zeros_like(dwin2_ref)
        dbin2_ref[:] = jnp.zeros_like(dbin2_ref)
        dwhhd_ref[:] = jnp.zeros_like(dwhhd_ref)
        dbhhd_ref[:] = jnp.zeros_like(dbhhd_ref)

    # ---- phase A: replay up sweep (L-1 -> 0), store outputs + gates
    h = load(h0u_ref[:]).astype(f32)

    def up_replay(i, h):
        l = L - 1 - i
        h, gates = _gru_fwd_store(h, load(xp_ref[l]).astype(f32), whh_u,
                                  bhh_u, H)
        up_h[l] = h.astype(up_h.dtype)
        gates_u[l] = gates.astype(gates_u.dtype)
        return h

    jax.lax.fori_loop(0, L, up_replay, h)

    # ---- replay down sweep (0 -> L-1), store outputs + gates
    h2 = load(h0d_ref[:]).astype(f32)

    def dn_replay(l, h2):
        mm = f32
        xp2 = (jnp.dot(up_h[l], win2, preferred_element_type=mm)
               + bin2.astype(mm))
        h2, gates = _gru_fwd_store(h2, xp2, whh_d, bhh_d, H)
        g_h[l] = h2.astype(g_h.dtype)
        gates_d[l] = gates.astype(gates_d.dtype)
        return h2

    jax.lax.fori_loop(0, L, dn_replay, h2)

    # ---- phase B1: down sweep backward (L-1 -> 0)
    h0d = load(h0d_ref[:]).astype(f32)

    def dn_bwd(i, carry):
        dg, dwin2, dbin2, dwhhd, dbhhd = carry
        l = L - 1 - i
        dg = dg + load(ddown_ref[l]).astype(f32)
        g_prev = jnp.where(l == 0, h0d,
                           g_h[jnp.maximum(l - 1, 0)].astype(f32))
        dxp2, dg_prev, d_hh = _gru_bwd_step(dg, gates_d[l], g_prev,
                                            whh_d, H)
        # d_up[l] = dxp2 @ Win2^T
        dup_s[l] = jax.lax.dot_general(
            dxp2.astype(wdt), win2, (((1,), (1,)), ((), ())),
            preferred_element_type=f32).astype(dup_s.dtype)
        dwin2 = dwin2 + _outer(up_h[l], dxp2.astype(wdt))
        dbin2 = dbin2 + jnp.sum(dxp2, axis=0)
        dwhhd = dwhhd + _outer(g_prev.astype(wdt), d_hh.astype(wdt))
        dbhhd = dbhhd + jnp.sum(d_hh, axis=0)
        return dg_prev, dwin2, dbin2, dwhhd, dbhhd

    zeros_w = jnp.zeros((H, 3 * H), f32)
    zeros_b = jnp.zeros((3 * H,), f32)
    dg, dwin2, dbin2, dwhhd, dbhhd = jax.lax.fori_loop(
        0, L, dn_bwd,
        (load(dlasth_ref[:]).astype(f32), zeros_w, zeros_b, zeros_w,
         zeros_b))
    dh0d_ref[:] = dg.astype(dh0d_ref.dtype)

    # ---- phase B2: up sweep backward (0 -> L-1; reverse of its
    # computation order L-1 -> 0). The up sweep's final carry is unused
    # by the forward, so its incoming gradient is zero.
    h0u = load(h0u_ref[:]).astype(f32)

    def up_bwd(l, carry):
        du, dwhhu, dbhhu = carry
        du = du + dup_s[l].astype(f32)
        h_prev = jnp.where(l == L - 1, h0u,
                           up_h[jnp.minimum(l + 1, L - 1)].astype(f32))
        d_xp, du_prev, d_hh = _gru_bwd_step(du, gates_u[l], h_prev,
                                            whh_u, H)
        dxp_ref[l] = d_xp.astype(dxp_ref.dtype)
        dwhhu = dwhhu + _outer(h_prev.astype(wdt), d_hh.astype(wdt))
        dbhhu = dbhhu + jnp.sum(d_hh, axis=0)
        return du_prev, dwhhu, dbhhu

    du, dwhhu, dbhhu = jax.lax.fori_loop(
        0, L, up_bwd, (jnp.zeros_like(h0u), zeros_w, zeros_b))
    dh0u_ref[:] = du.astype(dh0u_ref.dtype)

    dwhhu_ref[:] += dwhhu
    dbhhu_ref[:] += dbhhu
    dwin2_ref[:] += dwin2
    dbin2_ref[:] += dbin2
    dwhhd_ref[:] += dwhhd
    dbhhd_ref[:] += dbhhd


def _auto_block_b_bwd(B: int, L: int, H: int, itemsize: int) -> int:
    """Backward working set per batch row: double-buffered xp + d_xp
    [L, 3H], d_down [L, H], five [L, H]-ish scratches (up_h, g_h, dup f32)
    and two [L, 4H] gate stores."""
    per_row = L * itemsize * (2 * 3 * H + 2 * 3 * H + 2 * H
                              + 2 * H + 2 * 4 * H) + L * 4 * H
    # the estimate undercounts ~15% (h0/d_lasth windows, dW blocks,
    # extra buffering): 192 rows at flagship bf16 shapes measured 130.8M
    # on the v5e (128M cap), 128 rows fits
    budget = 96 * 1024 * 1024
    cap = int(budget // max(per_row, 1))
    gran = 16 if itemsize == 2 else 8
    div = _divisor_tile(B, min(cap, 256), gran)
    if div >= 96 or (div > 0 and div == B):
        return div
    for bt in (256, 192, 128, 96, 64, 32, 16, 8):
        if bt > B and bt != 8:
            continue
        if bt * per_row <= budget:
            return min(bt, max(B, 8))
    return 8


def _bigru_bwd_pallas_lbh(res, d_down, d_lasth, block_b=None,
                          interpret=False):
    (xp, h0_up, h0_dn, whh_up, bhh_up, win2, bin2, whh_dn, bhh_dn) = res
    L, B, threeH = xp.shape
    H = threeH // 3
    if block_b is None:
        block_b = _auto_block_b_bwd(B, L, H, xp.dtype.itemsize)
    # pad ragged batches so Mosaic only ever sees full tiles (a ragged
    # f32 tile once faulted the v5e worker). Pad rows carry zero inputs
    # AND zero cotangents, so every padded row's per-step gradient
    # bundle d_hh is exactly zero and the weight-gradient reductions are
    # unchanged; the sliced-away d_xp/d_h0 rows are the only artifacts.
    B0 = B
    if B % block_b:
        pad = block_b * pl.cdiv(B, block_b) - B
        padB = lambda a, ax: jnp.pad(a, [(0, pad) if i == ax else (0, 0)
                                         for i in range(a.ndim)])
        xp, d_down = padB(xp, 1), padB(d_down, 1)
        h0_up, h0_dn = padB(h0_up, 0), padB(h0_dn, 0)
        d_lasth = padB(d_lasth, 0)
        B = B + pad
    nb = pl.cdiv(B, block_b)
    f32 = jnp.float32

    kernel = functools.partial(_bigru_bwd_kernel, L=L, H=H, B=B,
                               block_b=block_b)
    batch_lbh = pl.BlockSpec((L, block_b, threeH), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
    batch_lbH = pl.BlockSpec((L, block_b, H), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
    batch_bH = pl.BlockSpec((block_b, H), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((H, threeH), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((threeH,), lambda i: (0,),
                          memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[batch_lbh, batch_bH, batch_bH, w_spec, b_spec, w_spec,
                  b_spec, w_spec, b_spec, batch_lbH, batch_bH],
        out_specs=[batch_lbh, batch_bH, batch_bH,
                   w_spec, b_spec, w_spec, b_spec, w_spec, b_spec],
        out_shape=[
            jax.ShapeDtypeStruct((L, B, threeH), xp.dtype),
            jax.ShapeDtypeStruct((B, H), h0_up.dtype),
            jax.ShapeDtypeStruct((B, H), h0_dn.dtype),
            jax.ShapeDtypeStruct((H, threeH), f32),
            jax.ShapeDtypeStruct((threeH,), f32),
            jax.ShapeDtypeStruct((H, threeH), f32),
            jax.ShapeDtypeStruct((threeH,), f32),
            jax.ShapeDtypeStruct((H, threeH), f32),
            jax.ShapeDtypeStruct((threeH,), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((L, block_b, H), xp.dtype),       # up_h
            pltpu.VMEM((L, block_b, H), xp.dtype),       # g_h
            pltpu.VMEM((L, block_b, 4 * H), xp.dtype),   # gates_u
            pltpu.VMEM((L, block_b, 4 * H), xp.dtype),   # gates_d
            pltpu.VMEM((L, block_b, H), f32),            # d_up
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        interpret=interpret,
    )(xp, h0_up, h0_dn, whh_up, bhh_up, win2, bin2, whh_dn, bhh_dn,
      d_down, d_lasth)
    (d_xp, d_h0u, d_h0d, dwhhu, dbhhu, dwin2, dbin2, dwhhd, dbhhd) = outs
    if B != B0:
        d_xp, d_h0u, d_h0d = d_xp[:, :B0], d_h0u[:B0], d_h0d[:B0]
    return (d_xp, d_h0u, d_h0d,
            dwhhu.astype(whh_up.dtype), dbhhu.astype(bhh_up.dtype),
            dwin2.astype(win2.dtype), dbin2.astype(bin2.dtype),
            dwhhd.astype(whh_dn.dtype), dbhhd.astype(bhh_dn.dtype))


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


# --------------------------------------------------------------------------
# v3: input projection + latent/output heads fused into the kernel
# --------------------------------------------------------------------------
#
# At the flagship online shapes (B=21,600, H=192) the v2 kernel is fed a
# materialized xp [60, B, 576] (~1.5 GB bf16) and emits down [60, B, 192]
# (~0.5 GB) that tiny head matmuls immediately reduce to 6+16 channels —
# ~3 GB of pure HBM round-trip per coupled step, measured as most of the
# kernel->full-model throughput gap (VERDICT round-2 weak #3). v3 moves
# the up-sweep input projection and the latent/output heads inside the
# kernel: it streams x [60, B, nx~26] in and (out [.., ny], mem [.., nm])
# out, ~0.2 GB total.


def _bigru_heads_kernel(x_ref, h0u_ref, h0d_ref, win1_ref, bin1_ref,
                        whh_u_ref, bhh_u_ref, win2_ref, bin2_ref,
                        whh_d_ref, bhh_d_ref, wlat_ref, blat_ref,
                        wout_ref, bout_ref, out_ref, mem_ref, lasth_ref,
                        up_scratch, *, L: int, H: int, acc32: bool = True):
    acc = jnp.float32 if acc32 else x_ref.dtype
    mm = jnp.promote_types(acc, jnp.float32)
    win1 = win1_ref[:]
    bin1 = bin1_ref[:].astype(mm)
    whh_u = whh_u_ref[:]
    bhh_u = bhh_u_ref[:].astype(acc)
    whh_d = whh_d_ref[:]
    bhh_d = bhh_d_ref[:].astype(acc)
    win2 = win2_ref[:]
    bin2 = bin2_ref[:].astype(acc)
    wlat = wlat_ref[:]
    blat = blat_ref[:].astype(mm)
    wout = wout_ref[:]
    bout = bout_ref[:].astype(mm)

    h = h0u_ref[:].astype(acc)

    def up_body(i, h):
        l = L - 1 - i
        xp = (jnp.dot(x_ref[l], win1, preferred_element_type=mm)
              + bin1).astype(acc)
        h = _gru_step(h, xp, whh_u, bhh_u, H)
        up_scratch[l] = h.astype(up_scratch.dtype)
        return h

    jax.lax.fori_loop(0, L, up_body, h)

    h2 = h0d_ref[:].astype(acc)

    def down_body(l, h2):
        up_l = up_scratch[l]
        xp2 = (jnp.dot(up_l, win2, preferred_element_type=mm)
               + bin2.astype(mm)).astype(acc)
        h2 = _gru_step(h2, xp2, whh_d, bhh_d, H)
        hd = h2.astype(wlat.dtype)
        mem_l = (jnp.dot(hd, wlat, preferred_element_type=mm)
                 + blat).astype(mem_ref.dtype)
        out_l = (jnp.dot(mem_l.astype(wout.dtype), wout,
                         preferred_element_type=mm) + bout)
        mem_ref[l] = mem_l
        out_ref[l] = out_l.astype(out_ref.dtype)
        return h2

    h2 = jax.lax.fori_loop(0, L, down_body, h2)
    lasth_ref[:] = h2.astype(lasth_ref.dtype)


def _auto_block_b_heads(B: int, L: int, nx: int, H: int, nm: int, ny: int,
                        itemsize: int) -> int:
    """VMEM working set per row counts 128-lane padding of the narrow
    x/mem/out blocks; without the fat xp block tiles grow to ~1k rows."""
    pl128 = lambda n: -(-n // 128) * 128
    per_row = L * itemsize * (2 * pl128(nx) + H + 2 * pl128(nm)
                              + 2 * pl128(ny))
    cap = int(_VMEM_BUDGET // max(per_row, 1))
    gran = 16 if itemsize == 2 else 8
    div = _divisor_tile(B, min(cap, 1024), gran)
    if div >= 128 or (div > 0 and div == B):
        return div
    for bt in (1024, 512, 384, 256, 192, 128, 96, 64, 32, 16, 8):
        if bt > B and bt != 8:
            continue
        if bt * per_row <= _VMEM_BUDGET:
            return min(bt, max(B, 8))
    return 8


def _bigru_heads_pallas_lbh(x, h0_up, h0_dn, win1, bin1, whh_up, bhh_up,
                            win2, bin2, whh_dn, bhh_dn, wlat, blat, wout,
                            bout, block_b=None, interpret=False,
                            acc32=True):
    """x [L, B, nx] -> (out [L, B, ny], mem [L, B, nm], last_h [B, H])."""
    L, B, nx = x.shape
    H = whh_up.shape[0]
    nm = wlat.shape[1]
    ny = wout.shape[1]
    if block_b is None:
        block_b = _auto_block_b_heads(B, L, nx, H, nm, ny,
                                      x.dtype.itemsize)
    B0 = B
    if B % block_b:
        pad = block_b * pl.cdiv(B, block_b) - B
        padB = lambda a, ax: jnp.pad(a, [(0, pad) if i == ax else (0, 0)
                                         for i in range(a.ndim)])
        x = padB(x, 1)
        h0_up, h0_dn = padB(h0_up, 0), padB(h0_dn, 0)
        B = B + pad
    nb = pl.cdiv(B, block_b)

    kernel = functools.partial(_bigru_heads_kernel, L=L, H=H, acc32=acc32)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((L, block_b, nx), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_b, H), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_b, H), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        full((nx, 3 * H)), full((3 * H,)),
        full((H, 3 * H)), full((3 * H,)),
        full((H, 3 * H)), full((3 * H,)),
        full((H, 3 * H)), full((3 * H,)),
        full((H, nm)), full((nm,)),
        full((nm, ny)), full((ny,)),
    ]
    out_specs = [
        pl.BlockSpec((L, block_b, ny), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((L, block_b, nm), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_b, H), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    out, mem, lasth = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((L, B, ny), x.dtype),
            jax.ShapeDtypeStruct((L, B, nm), x.dtype),
            jax.ShapeDtypeStruct((B, H), x.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((L, block_b, H), x.dtype)],
        # Same Mosaic VMEM declaration as the v2 kernels. Round 3 shipped
        # v3/v4 WITHOUT compiler_params — the custom call then lowered
        # with no vmem_limit, which is what forced the program-wide
        # xla_tpu_scoped_vmem_limit_kib raise (and its 2x collateral on
        # the surrounding program). With the declaration the kernel
        # compiles under a PLAIN jit, like v2 (round-4 fix).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        interpret=interpret,
    )(x, h0_up, h0_dn, win1, bin1, whh_up, bhh_up, win2, bin2, whh_dn,
      bhh_dn, wlat, blat, wout, bout)
    if B0 != B:
        out, mem, lasth = out[:, :B0], mem[:, :B0], lasth[:B0]
    return out, mem, lasth


def _heads_compose(x, h0_up, h0_dn, win1, bin1, whh_up, bhh_up, win2,
                   bin2, whh_dn, bhh_dn, wlat, blat, wout, bout,
                   block_b, interpret, acc32, use_kernel):
    """Reference composition of v3 = einsum projection + (v2 kernel | scan
    reference) + head einsums. Differentiable; the kernel path reuses the
    v2 hand-written backward."""
    dt = x.dtype
    xp = (jnp.einsum("lbn,nh->lbh", x, win1) + bin1).astype(dt)
    if use_kernel:
        down, lasth = fused_bigru_lbh(xp, h0_up, h0_dn, whh_up, bhh_up,
                                      win2, bin2, whh_dn, bhh_dn,
                                      block_b, interpret, acc32)
    else:
        down, lasth = _bigru_reference_lbh(xp, h0_up, h0_dn, whh_up,
                                           bhh_up, win2, bin2, whh_dn,
                                           bhh_dn)
    mem = (jnp.einsum("lbh,hm->lbm", down, wlat) + blat).astype(dt)
    out = (jnp.einsum("lbm,mo->lbo", mem, wout) + bout).astype(dt)
    return out, mem, lasth


@functools.partial(jax.custom_vjp, nondiff_argnums=(15, 16, 17))
def fused_bigru_heads_lbh(x, h0_up, h0_dn, win1, bin1, whh_up, bhh_up,
                          win2, bin2, whh_dn, bhh_dn, wlat, blat, wout,
                          bout, block_b=None, interpret: bool = False,
                          acc32: bool = True):
    """v3 fused BiGRU with in-kernel input projection and latent/output
    heads: x [L, B, nx] -> (out [L, B, ny], mem [L, B, nm], last_h [B, H]).
    Off-TPU (and not interpret) falls back to the differentiable
    composition."""
    from . import on_tpu
    if on_tpu() or interpret:
        return _bigru_heads_pallas_lbh(x, h0_up, h0_dn, win1, bin1,
                                       whh_up, bhh_up, win2, bin2,
                                       whh_dn, bhh_dn, wlat, blat, wout,
                                       bout, block_b, interpret, acc32)
    return _heads_compose(x, h0_up, h0_dn, win1, bin1, whh_up, bhh_up,
                          win2, bin2, whh_dn, bhh_dn, wlat, blat, wout,
                          bout, block_b, interpret, acc32, False)


def _heads_fwd(x, h0_up, h0_dn, win1, bin1, whh_up, bhh_up, win2, bin2,
               whh_dn, bhh_dn, wlat, blat, wout, bout, block_b, interpret,
               acc32):
    out = fused_bigru_heads_lbh(x, h0_up, h0_dn, win1, bin1, whh_up,
                                bhh_up, win2, bin2, whh_dn, bhh_dn, wlat,
                                blat, wout, bout, block_b, interpret,
                                acc32)
    return out, (x, h0_up, h0_dn, win1, bin1, whh_up, bhh_up, win2, bin2,
                 whh_dn, bhh_dn, wlat, blat, wout, bout)


def _heads_bwd(block_b, interpret, acc32, res, g):
    # differentiate the composition: the projection/head einsums get XLA
    # VJPs, the recurrent core gets the v2 hand-written backward kernel
    # (on TPU) or the scan VJP elsewhere — one extra v2 forward replay
    from . import on_tpu
    use_kernel = on_tpu() and not interpret
    _, vjp = jax.vjp(
        lambda *a: _heads_compose(*a, block_b, interpret, acc32,
                                  use_kernel), *res)
    return vjp(g)


fused_bigru_heads_lbh.defvjp(_heads_fwd, _heads_bwd)


# --------------------------------------------------------------------------
# v5: channel-major fused BiGRU + heads ([L, C, B] activations)
# --------------------------------------------------------------------------
#
# The v3/v4 kernels stream narrow [L, B, c] arrays (c = 6..26 features,
# 16 memory, 6 outputs). XLA:TPU pads the minor dimension to the
# 128-lane tile, so each such array occupies ~128/c times its logical
# bytes and every producer/consumer pays that physical traffic — and a
# custom call CANNOT be fused into its consumers the way the v2 path's
# XLA head matmuls are. Measured on the 21,600-column coupled step the
# v3/v4 emulator cost ~36 ms in context against ~5 ms standalone.
#
# v5 flips the activation layout to channel-major [L, C, B]: the batch
# dim (21,600) rides the 128-lane axis with no padding, channels sit on
# sublanes (pad 22 -> 24, nothing), and per-channel host consumption
# (ptend[:, j, :]) is a dense sublane slice. Inside the kernel every
# tile is [C, Bt]; matmuls take PRE-TRANSPOSED weights ([out_ch, in_ch])
# so Mosaic sees standard (m,k)x(k,n) contractions. Gradients go through
# the differentiable batch-major composition (training runs the
# batch-major path anyway; this op serves the online/serving path).


def _gru_step_cm(h, xp, whh_t, b_hh, H: int):
    """Channel-major GRU update: h [H, Bt], xp [3H, Bt] (input bias
    already added), whh_t [3H, H] pre-transposed; bias [3H, 1]."""
    acc = h.dtype
    mm = jnp.promote_types(acc, jnp.float32)
    hh = (jnp.dot(whh_t, h.astype(whh_t.dtype),
                  preferred_element_type=mm)
          + b_hh.astype(mm)).astype(acc)
    xr, xz, xn = xp[:H], xp[H:2 * H], xp[2 * H:]
    hr, hz, hn = hh[:H], hh[H:2 * H], hh[2 * H:]
    r = _sigmoid_typed(xr + hr)
    z = _sigmoid_typed(xz + hz)
    n = _tanh_typed(xn + r * hn)
    one = jnp.asarray(1.0, z.dtype)
    return (one - z) * n + z * h


def _bigru_heads_cm_kernel(x_ref, mem_ref, h0u_ref, h0d_ref, win1h_ref,
                           win1m_ref, bin1_ref, whh_u_ref, bhh_u_ref,
                           win2_ref, bin2_ref, whh_d_ref, bhh_d_ref,
                           wlat_ref, blat_ref, wout_ref, bout_ref,
                           outmem_ref, lasth_ref, up_scratch, *, L: int,
                           H: int, nm: int, acc32: bool = True):
    """x_ref [L, CH, Bt] (init-MLP stream), mem_ref [L, nm_in, Bt]; the
    up projection is SPLIT (xp = W_h x_l + W_m mem_l + b) instead of
    projecting a concat: the concatenated K=CH+nm matmul measured 3x
    slower than the K=CH one in this orientation, and the concat itself
    is ~1.1 GB/step of HBM at the online batch. Weights pre-transposed
    [out_ch, in_ch]; biases [ch, 1]; outmem_ref [L, nm+ny, Bt]
    (mem || out); lasth [H, Bt]."""
    acc = jnp.float32 if acc32 else x_ref.dtype
    mm = jnp.promote_types(acc, jnp.float32)
    win1h = win1h_ref[:]
    win1m = win1m_ref[:]
    bin1 = bin1_ref[:].astype(mm)
    whh_u = whh_u_ref[:]
    bhh_u = bhh_u_ref[:].astype(acc)
    whh_d = whh_d_ref[:]
    bhh_d = bhh_d_ref[:].astype(acc)
    win2 = win2_ref[:]
    bin2 = bin2_ref[:].astype(mm)
    wlat = wlat_ref[:]
    blat = blat_ref[:].astype(mm)
    wout = wout_ref[:]
    bout = bout_ref[:].astype(mm)

    h = h0u_ref[:].astype(acc)

    def up_body(i, h):
        l = L - 1 - i
        xp = (jnp.dot(win1h, x_ref[l], preferred_element_type=mm)
              + jnp.dot(win1m, mem_ref[l], preferred_element_type=mm)
              + bin1).astype(acc)
        h = _gru_step_cm(h, xp, whh_u, bhh_u, H)
        up_scratch[l] = h.astype(up_scratch.dtype)
        return h

    jax.lax.fori_loop(0, L, up_body, h)

    h2 = h0d_ref[:].astype(acc)

    def down_body(l, h2):
        up_l = up_scratch[l]
        xp2 = (jnp.dot(win2, up_l, preferred_element_type=mm)
               + bin2).astype(acc)
        h2 = _gru_step_cm(h2, xp2, whh_d, bhh_d, H)
        hd = h2.astype(wlat.dtype)
        mem_l = (jnp.dot(wlat, hd, preferred_element_type=mm)
                 + blat).astype(outmem_ref.dtype)
        out_l = (jnp.dot(wout, mem_l.astype(wout.dtype),
                         preferred_element_type=mm) + bout)
        outmem_ref[l] = jnp.concatenate(
            [mem_l, out_l.astype(outmem_ref.dtype)], axis=0)
        return h2

    h2 = jax.lax.fori_loop(0, L, down_body, h2)
    lasth_ref[:] = h2.astype(lasth_ref.dtype)


def _bigru_heads_cm_hoist_kernel(x_ref, mem_ref, h0u_ref, h0d_ref,
                                 win1h_ref, win1m_ref, bin1_ref,
                                 whh_u_ref, bhh_u_ref, win2_ref, bin2_ref,
                                 whh_d_ref, bhh_d_ref, wlat_ref, blat_ref,
                                 wout_ref, bout_ref, outmem_ref,
                                 lasth_ref, xp_scratch, up_scratch, *,
                                 L: int, H: int, nm: int,
                                 acc32: bool = True):
    """Chunked projection-hoisted variant of
    :func:`_bigru_heads_cm_kernel`.

    The baseline kernel evaluates the input projections INSIDE the
    dependent level chain, so every serial step carries 2-3 MXU dots +
    gates — and the chain is what sets the kernel's floor (the
    recurrence cannot pipeline across levels). Here each sweep runs in
    level BLOCKS of ``_HOIST_NB``: per block, (1) the block's
    projections as independent back-to-back dots (MXU at throughput, no
    dependency stalls) into a small ring of VMEM xp scratch, then
    (2) the chain steps reduced to the recurrent dot + gates. The small
    block keeps the xp scratch tiny so the LANE TILE stays large — a
    full-L hoist halves the tile and LOSES (measured 18.2 vs 15.3 ms at
    B=21,600: the serial chain count doubles with the tile count). The
    xp scratch is stored in the input dtype (bf16 in production): ~1e-3
    relative rounding vs the baseline's f32-resident xp, inside the
    bf16 matmul noise the parity tests already allow."""
    acc = jnp.float32 if acc32 else x_ref.dtype
    mm = jnp.promote_types(acc, jnp.float32)
    NB = _hoist_nb(L)
    win1h = win1h_ref[:]
    win1m = win1m_ref[:]
    bin1 = bin1_ref[:].astype(mm)
    whh_u = whh_u_ref[:]
    bhh_u = bhh_u_ref[:].astype(acc)
    whh_d = whh_d_ref[:]
    bhh_d = bhh_d_ref[:].astype(acc)
    win2 = win2_ref[:]
    bin2 = bin2_ref[:].astype(mm)
    wlat = wlat_ref[:]
    blat = blat_ref[:].astype(mm)
    wout = wout_ref[:]
    bout = bout_ref[:].astype(mm)

    h = h0u_ref[:].astype(acc)

    def up_block(b, h):
        base = L - (b + 1) * NB

        def proj(j, c):
            l = base + j
            xp_scratch[j] = (jnp.dot(win1h, x_ref[l],
                                     preferred_element_type=mm)
                             + jnp.dot(win1m, mem_ref[l],
                                       preferred_element_type=mm)
                             + bin1).astype(xp_scratch.dtype)
            return c

        jax.lax.fori_loop(0, NB, proj, 0)

        def chain(i, h):
            j = NB - 1 - i
            h = _gru_step_cm(h, xp_scratch[j].astype(acc), whh_u,
                             bhh_u, H)
            up_scratch[base + j] = h.astype(up_scratch.dtype)
            return h

        return jax.lax.fori_loop(0, NB, chain, h)

    jax.lax.fori_loop(0, L // NB, up_block, h)

    h2 = h0d_ref[:].astype(acc)

    def down_block(b, h2):
        base = b * NB

        def proj(j, c):
            xp_scratch[j] = (jnp.dot(win2, up_scratch[base + j],
                                     preferred_element_type=mm)
                             + bin2).astype(xp_scratch.dtype)
            return c

        jax.lax.fori_loop(0, NB, proj, 0)

        def chain(j, h2):
            h2 = _gru_step_cm(h2, xp_scratch[j].astype(acc), whh_d,
                              bhh_d, H)
            hd = h2.astype(wlat.dtype)
            mem_l = (jnp.dot(wlat, hd, preferred_element_type=mm)
                     + blat).astype(outmem_ref.dtype)
            out_l = (jnp.dot(wout, mem_l.astype(wout.dtype),
                             preferred_element_type=mm) + bout)
            outmem_ref[base + j] = jnp.concatenate(
                [mem_l, out_l.astype(outmem_ref.dtype)], axis=0)
            return h2

        return jax.lax.fori_loop(0, NB, chain, h2)

    h2 = jax.lax.fori_loop(0, L // NB, down_block, h2)
    lasth_ref[:] = h2.astype(lasth_ref.dtype)


def _hoist_nb(L: int) -> int:
    """Level-block size for the chunked hoist: the largest divisor of L
    <= 16 (block xp scratch stays ~14 kB/lane at H=192 bf16, so the
    lane tile is barely reduced)."""
    for nb in range(min(16, L), 0, -1):
        if L % nb == 0:
            return nb
    return 1


def _auto_block_b_cm(B: int, L: int, CH: int, nm_in: int, H: int,
                     nm: int, ny: int, itemsize: int,
                     hoist_proj: bool = False) -> int:
    """Lane-tile sizing. Mosaic requires the lane (minor) block dim to
    be a multiple of 128, so the tile is the largest 128-multiple whose
    VMEM working set (double-buffered x rows + scratch + double-buffered
    merged output per lane) fits the budget; a divisor of B is preferred
    (no pad), otherwise the wrapper pads the batch lanes to a tile
    multiple (<=0.8% at the 21,600-column online batch)."""
    per_lane = L * itemsize * (2 * (CH + nm_in) + H + 2 * (nm + ny)) \
        + 6 * H * itemsize      # double-buffered h0_up/h0_dn + lasth
    if hoist_proj:
        per_lane += _hoist_nb(L) * itemsize * 3 * H   # xp block scratch
    cap = int(_VMEM_BUDGET // max(per_lane, 1))
    cap = max(cap // 128 * 128, 128)
    div = _divisor_tile(B, cap, 128)
    if div:
        return div
    # No 128-multiple divides B. The serial level chain runs once per
    # TILE, so tile COUNT dominates (a pad-minimizing 128-lane tile at
    # B=21,600 meant 169 tiles x 120 chain steps and ~2x the kernel
    # time): take the fewest tiles the budget allows, then the smallest
    # tile giving that count (minimizes pad as the secondary objective)
    n_tiles = -(-B // cap)
    bt = -(-(-(-B // n_tiles)) // 128) * 128
    return min(max(bt, 128), cap)


def _bigru_heads_cm_pallas(x, mem_in, h0_up, h0_dn, win1h_t, win1m_t,
                           bin1, whh_up_t, bhh_up, win2_t, bin2,
                           whh_dn_t, bhh_dn, wlat_t, blat, wout_t, bout,
                           block_b=None, interpret=False, acc32=True,
                           hoist_proj=False):
    """Channel-major v5: x [L, CH, B] + mem_in [L, nm_in, B], h0 [H, B],
    weights pre-transposed [out_ch, in_ch], biases [ch, 1] ->
    (outmem [L, nm+ny, B], lasth [H, B])."""
    L, CH, B = x.shape
    nm_in = mem_in.shape[1]
    H = whh_up_t.shape[1]
    nm = wlat_t.shape[0]
    ny = wout_t.shape[0]
    if block_b is None:
        block_b = _auto_block_b_cm(B, L, CH, nm_in, H, nm, ny,
                                   x.dtype.itemsize, hoist_proj)
    B0 = B
    if B % block_b:
        # pad the batch LANES to a tile multiple (Mosaic lane blocks
        # must be 128-multiples and 21,600 has none as divisor). The pad
        # copy touches each operand once (~0.7% extra lanes at
        # B=21,600) — unlike the round-2 batch-major pad regression this
        # is a single minor-dim pad of arrays the kernel reads anyway.
        pad = block_b * pl.cdiv(B, block_b) - B
        padB = lambda a: jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)])
        x, mem_in = padB(x), padB(mem_in)
        h0_up, h0_dn = padB(h0_up), padB(h0_dn)
        B = B + pad
    nb = pl.cdiv(B, block_b)

    kernel = functools.partial(
        _bigru_heads_cm_hoist_kernel if hoist_proj
        else _bigru_heads_cm_kernel, L=L, H=H, nm=nm, acc32=acc32)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    lane = lambda *lead: pl.BlockSpec(lead + (block_b,),
                                      lambda i: (0,) * len(lead) + (i,),
                                      memory_space=pltpu.VMEM)
    in_specs = [
        lane(L, CH), lane(L, nm_in), lane(H), lane(H),
        full((3 * H, CH)), full((3 * H, nm_in)), full((3 * H, 1)),
        full((3 * H, H)), full((3 * H, 1)),
        full((3 * H, H)), full((3 * H, 1)),
        full((3 * H, H)), full((3 * H, 1)),
        full((nm, H)), full((nm, 1)),
        full((ny, nm)), full((ny, 1)),
    ]
    out_specs = [lane(L, nm + ny), lane(H)]
    outmem, lasth = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((L, nm + ny, B), x.dtype),
            jax.ShapeDtypeStruct((H, B), x.dtype),
        ],
        scratch_shapes=(
            ([pltpu.VMEM((_hoist_nb(L), 3 * H, block_b), x.dtype)]
             if hoist_proj else [])
            + [pltpu.VMEM((L, H, block_b), x.dtype)]),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        interpret=interpret,
    )(x, mem_in, h0_up, h0_dn, win1h_t, win1m_t, bin1, whh_up_t, bhh_up,
      win2_t, bin2, whh_dn_t, bhh_dn, wlat_t, blat, wout_t, bout)
    if B0 != B:
        outmem, lasth = outmem[..., :B0], lasth[..., :B0]
    return outmem, lasth


def _heads_cm_compose(x, mem_in, h0_up, h0_dn, win1h_t, win1m_t, bin1,
                      whh_up_t, bhh_up, win2_t, bin2, whh_dn_t, bhh_dn,
                      wlat_t, blat, wout_t, bout, block_b, interpret,
                      acc32, use_kernel):
    """Differentiable channel-major reference: transpose to the
    level-major batch form, run the v3 composition on the concatenated
    stream, transpose back."""
    tT = lambda a: jnp.swapaxes(a, -1, -2)
    sq = lambda b: b[:, 0]
    xcat = jnp.concatenate([tT(x), tT(mem_in)], axis=-1)
    win1 = jnp.concatenate([tT(win1h_t), tT(win1m_t)], axis=0)
    out, mem, lasth = _heads_compose(
        xcat, tT(h0_up), tT(h0_dn),
        win1, sq(bin1), tT(whh_up_t), sq(bhh_up), tT(win2_t),
        sq(bin2), tT(whh_dn_t), sq(bhh_dn), tT(wlat_t), sq(blat),
        tT(wout_t), sq(bout), block_b, interpret, acc32, use_kernel)
    outmem = jnp.concatenate([tT(mem), tT(out)], axis=1)
    return outmem, tT(lasth)


@functools.partial(jax.custom_vjp, nondiff_argnums=(17, 18, 19, 20))
def fused_bigru_heads_cm(x, mem_in, h0_up, h0_dn, win1h_t, win1m_t, bin1,
                         whh_up_t, bhh_up, win2_t, bin2, whh_dn_t,
                         bhh_dn, wlat_t, blat, wout_t, bout,
                         block_b=None, interpret: bool = False,
                         acc32: bool = True, hoist_proj: bool = True):
    """v5 channel-major fused BiGRU + heads with split up projection.
    x [L, CH, B] (init-MLP stream), mem_in [L, nm_in, B], h0 [H, B],
    weights pre-transposed [out_ch, in_ch], biases [ch, 1] ->
    (outmem [L, nm+ny, B] = mem || out, lasth [H, B]).

    ``hoist_proj`` (default on) runs each sweep's input projections as a
    separate non-dependent phase into VMEM scratch so the serial level
    chain carries only the recurrent dot + gates (see
    :func:`_bigru_heads_cm_hoist_kernel`)."""
    from . import on_tpu
    if on_tpu() or interpret:
        return _bigru_heads_cm_pallas(x, mem_in, h0_up, h0_dn, win1h_t,
                                      win1m_t, bin1, whh_up_t, bhh_up,
                                      win2_t, bin2, whh_dn_t, bhh_dn,
                                      wlat_t, blat, wout_t, bout,
                                      block_b, interpret, acc32,
                                      hoist_proj)
    return _heads_cm_compose(x, mem_in, h0_up, h0_dn, win1h_t, win1m_t,
                             bin1, whh_up_t, bhh_up, win2_t, bin2,
                             whh_dn_t, bhh_dn, wlat_t, blat, wout_t,
                             bout, block_b, interpret, acc32, False)


def _heads_cm_fwd(x, mem_in, h0_up, h0_dn, win1h_t, win1m_t, bin1,
                  whh_up_t, bhh_up, win2_t, bin2, whh_dn_t, bhh_dn,
                  wlat_t, blat, wout_t, bout, block_b, interpret, acc32,
                  hoist_proj):
    out = fused_bigru_heads_cm(x, mem_in, h0_up, h0_dn, win1h_t, win1m_t,
                               bin1, whh_up_t, bhh_up, win2_t, bin2,
                               whh_dn_t, bhh_dn, wlat_t, blat, wout_t,
                               bout, block_b, interpret, acc32,
                               hoist_proj)
    return out, (x, mem_in, h0_up, h0_dn, win1h_t, win1m_t, bin1,
                 whh_up_t, bhh_up, win2_t, bin2, whh_dn_t, bhh_dn,
                 wlat_t, blat, wout_t, bout)


# ---- hand-written channel-major backward (round-5: the v5/v6 training
# path previously composed the v2 batch-major backward with XLA head
# VJPs plus an extra forward replay through HBM; this kernel replays
# both sweeps in VMEM and walks heads + BPTT backward in the channel-
# major layout, mirroring _bigru_bwd_kernel)


def _gru_fwd_store_cm(h, xp, whh_t, b_hh, H: int):
    """Channel-major forward step that also returns the gate bundle
    (r, z, n, hn) stacked on the sublane axis [4H, Bt]."""
    f32 = jnp.float32
    hh = (jnp.dot(whh_t, h.astype(whh_t.dtype),
                  preferred_element_type=f32) + b_hh.astype(f32))
    xr, xz, xn = xp[:H], xp[H:2 * H], xp[2 * H:]
    hr, hz, hn = hh[:H], hh[H:2 * H], hh[2 * H:]
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    one = jnp.asarray(1.0, z.dtype)
    h_new = (one - z) * n + z * h
    return h_new, jnp.concatenate([r, z, n, hn], axis=0)


def _gru_bwd_step_cm(dh, gates, h_prev, whh_t, H: int):
    """One channel-major GRU backward step. dh/h_prev [H, Bt] f32,
    gates [4H, Bt] as stored, whh_t [3H, H] pre-transposed. Returns
    (d_xp [3H, Bt] f32, dh_prev [H, Bt] f32, d_hh [3H, Bt] f32)."""
    f32 = jnp.float32
    r = gates[:H].astype(f32)
    z = gates[H:2 * H].astype(f32)
    n = gates[2 * H:3 * H].astype(f32)
    hn = gates[3 * H:].astype(f32)
    one = jnp.asarray(1.0, f32)
    dz = dh * (h_prev - n)
    dan = dh * (one - z) * (one - n * n)
    dar = dan * hn * r * (one - r)
    daz = dz * z * (one - z)
    dhn = dan * r
    d_hh = jnp.concatenate([dar, daz, dhn], axis=0)
    d_xp = jnp.concatenate([dar, daz, dan], axis=0)
    # dh_prev = dh*z + Whh^T d_hh  (whh_t is [3H, H]: contract dim 0)
    dh_prev = dh * z + jax.lax.dot_general(
        whh_t, d_hh.astype(whh_t.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=f32)
    return d_xp, dh_prev, d_hh


def _outer_cm(a, b):
    """a [M, Bt] x b [N, Bt] -> [M, N] f32 (contract the lane axis)."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _tcontract0(w, d):
    """w [K, M] x d [K, Bt] -> [M, Bt] f32 (w^T @ d, contract dim 0)."""
    return jax.lax.dot_general(w, d.astype(w.dtype),
                               (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _bigru_heads_cm_bwd_kernel(
        x_ref, mem_ref, h0u_ref, h0d_ref, win1h_ref, win1m_ref, bin1_ref,
        whh_u_ref, bhh_u_ref, win2_ref, bin2_ref, whh_d_ref, bhh_d_ref,
        wlat_ref, blat_ref, wout_ref, bout_ref, doutmem_ref, dlasth_ref,
        dx_ref, dmem_ref, dh0u_ref, dh0d_ref,
        dwin1h_ref, dwin1m_ref, dbin1_ref, dwhhu_ref, dbhhu_ref,
        dwin2_ref, dbin2_ref, dwhhd_ref, dbhhd_ref,
        dwlat_ref, dblat_ref, dwout_ref, dbout_ref,
        up_h, g_h, gates_u, gates_d, dup_s,
        *, L: int, H: int, nm: int, B: int, block_b: int):
    """Channel-major backward: phase A replays both sweeps for the lane
    tile storing hidden states + gate bundles in VMEM; phase B walks the
    heads + down sweep backward (d_up, dWin2/dWhh_dn/dWlat/dWout);
    phase C the up sweep backward (d_x/d_mem, dWin1h/dWin1m/dWhh_up).
    Weight grads accumulate across grid tiles in revisiting f32 output
    blocks. Padded lanes carry zero inputs AND zero cotangents, so their
    per-step gradient bundles are exactly zero and the lane-reductions
    are unchanged (same argument as _bigru_bwd_pallas_lbh)."""
    f32 = jnp.float32
    rem = B - pl.program_id(0) * block_b
    valid = jax.lax.broadcasted_iota(jnp.int32, (1, block_b), 1) < rem

    def load(ref_slice):
        # NaN-safe masking of potentially-undefined pad lanes
        return jnp.where(valid, ref_slice, jnp.zeros_like(ref_slice))

    win1h = win1h_ref[:]
    win1m = win1m_ref[:]
    whh_u = whh_u_ref[:]
    bhh_u = bhh_u_ref[:]
    whh_d = whh_d_ref[:]
    bhh_d = bhh_d_ref[:]
    win2 = win2_ref[:]
    bin2 = bin2_ref[:]
    bin1 = bin1_ref[:]
    wlat = wlat_ref[:]
    blat = blat_ref[:]
    wout = wout_ref[:]
    wdt = whh_u.dtype

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in (dwin1h_ref, dwin1m_ref, dbin1_ref, dwhhu_ref,
                    dbhhu_ref, dwin2_ref, dbin2_ref, dwhhd_ref,
                    dbhhd_ref, dwlat_ref, dblat_ref, dwout_ref,
                    dbout_ref):
            ref[:] = jnp.zeros_like(ref)

    # ---- phase A: replay up sweep (L-1 -> 0), store outputs + gates
    h = load(h0u_ref[:]).astype(f32)

    def up_replay(i, h):
        l = L - 1 - i
        xp = (jnp.dot(win1h, load(x_ref[l]), preferred_element_type=f32)
              + jnp.dot(win1m, load(mem_ref[l]),
                        preferred_element_type=f32)
              + bin1.astype(f32))
        h, gates = _gru_fwd_store_cm(h, xp, whh_u, bhh_u, H)
        up_h[l] = h.astype(up_h.dtype)
        gates_u[l] = gates.astype(gates_u.dtype)
        return h

    jax.lax.fori_loop(0, L, up_replay, h)

    # ---- replay down sweep (0 -> L-1)
    h2 = load(h0d_ref[:]).astype(f32)

    def dn_replay(l, h2):
        xp2 = (jnp.dot(win2, up_h[l], preferred_element_type=f32)
               + bin2.astype(f32))
        h2, gates = _gru_fwd_store_cm(h2, xp2, whh_d, bhh_d, H)
        g_h[l] = h2.astype(g_h.dtype)
        gates_d[l] = gates.astype(gates_d.dtype)
        return h2

    jax.lax.fori_loop(0, L, dn_replay, h2)

    # ---- phase B: heads + down sweep backward (L-1 -> 0)
    h0d = load(h0d_ref[:]).astype(f32)

    def dn_bwd(i, carry):
        (dg, dwin2a, dbin2a, dwhhda, dbhhda, dwlata, dblata, dwouta,
         dbouta) = carry
        l = L - 1 - i
        dmo = load(doutmem_ref[l]).astype(f32)       # [nm+ny, Bt]
        dmem_head, dout = dmo[:nm], dmo[nm:]
        # recompute mem_l for dWout (cast as the forward does)
        hd = g_h[l].astype(wlat.dtype)
        mem_l = (jnp.dot(wlat, hd, preferred_element_type=f32)
                 + blat.astype(f32)).astype(g_h.dtype)
        dwouta = dwouta + _outer_cm(dout.astype(wdt), mem_l)
        dbouta = dbouta + jnp.sum(dout, axis=1, keepdims=True)
        dmem_tot = dmem_head + _tcontract0(wout, dout)    # [nm, Bt]
        dwlata = dwlata + _outer_cm(dmem_tot.astype(wdt), hd)
        dblata = dblata + jnp.sum(dmem_tot, axis=1, keepdims=True)
        dg = dg + _tcontract0(wlat, dmem_tot)             # [H, Bt]
        g_prev = jnp.where(l == 0, h0d,
                           g_h[jnp.maximum(l - 1, 0)].astype(f32))
        dxp2, dg_prev, d_hh = _gru_bwd_step_cm(dg, gates_d[l], g_prev,
                                               whh_d, H)
        dup_s[l] = _tcontract0(win2, dxp2).astype(dup_s.dtype)
        dwin2a = dwin2a + _outer_cm(dxp2.astype(wdt), up_h[l])
        dbin2a = dbin2a + jnp.sum(dxp2, axis=1, keepdims=True)
        dwhhda = dwhhda + _outer_cm(d_hh.astype(wdt), g_prev.astype(wdt))
        dbhhda = dbhhda + jnp.sum(d_hh, axis=1, keepdims=True)
        return (dg_prev, dwin2a, dbin2a, dwhhda, dbhhda, dwlata, dblata,
                dwouta, dbouta)

    ny = wout.shape[0]
    zw = lambda *s: jnp.zeros(s, f32)
    carry0 = (load(dlasth_ref[:]).astype(f32),
              zw(3 * H, H), zw(3 * H, 1), zw(3 * H, H), zw(3 * H, 1),
              zw(nm, H), zw(nm, 1), zw(ny, nm), zw(ny, 1))
    (dg, dwin2a, dbin2a, dwhhda, dbhhda, dwlata, dblata, dwouta,
     dbouta) = jax.lax.fori_loop(0, L, dn_bwd, carry0)
    dh0d_ref[:] = dg.astype(dh0d_ref.dtype)

    # ---- phase C: up sweep backward (0 -> L-1)
    h0u = load(h0u_ref[:]).astype(f32)
    CH = win1h.shape[1]
    nm_in = win1m.shape[1]

    def up_bwd(l, carry):
        du, dw1h, dw1m, db1, dwhhua, dbhhua = carry
        du = du + dup_s[l].astype(f32)
        h_prev = jnp.where(l == L - 1, h0u,
                           up_h[jnp.minimum(l + 1, L - 1)].astype(f32))
        d_xp, du_prev, d_hh = _gru_bwd_step_cm(du, gates_u[l], h_prev,
                                               whh_u, H)
        dx_ref[l] = _tcontract0(win1h, d_xp).astype(dx_ref.dtype)
        dmem_ref[l] = _tcontract0(win1m, d_xp).astype(dmem_ref.dtype)
        dw1h = dw1h + _outer_cm(d_xp.astype(wdt), load(x_ref[l]))
        dw1m = dw1m + _outer_cm(d_xp.astype(wdt), load(mem_ref[l]))
        db1 = db1 + jnp.sum(d_xp, axis=1, keepdims=True)
        dwhhua = dwhhua + _outer_cm(d_hh.astype(wdt),
                                    h_prev.astype(wdt))
        dbhhua = dbhhua + jnp.sum(d_hh, axis=1, keepdims=True)
        return du_prev, dw1h, dw1m, db1, dwhhua, dbhhua

    du, dw1h, dw1m, db1, dwhhua, dbhhua = jax.lax.fori_loop(
        0, L, up_bwd, (jnp.zeros_like(h0u), zw(3 * H, CH),
                       zw(3 * H, nm_in), zw(3 * H, 1), zw(3 * H, H),
                       zw(3 * H, 1)))
    dh0u_ref[:] = du.astype(dh0u_ref.dtype)

    dwin1h_ref[:] += dw1h
    dwin1m_ref[:] += dw1m
    dbin1_ref[:] += db1
    dwhhu_ref[:] += dwhhua
    dbhhu_ref[:] += dbhhua
    dwin2_ref[:] += dwin2a
    dbin2_ref[:] += dbin2a
    dwhhd_ref[:] += dwhhda
    dbhhd_ref[:] += dbhhda
    dwlat_ref[:] += dwlata
    dblat_ref[:] += dblata
    dwout_ref[:] += dwouta
    dbout_ref[:] += dbouta


def _auto_block_b_cm_bwd(B: int, L: int, CH: int, nm_in: int, H: int,
                         nm: int, ny: int, itemsize: int) -> int:
    """Lane tile for the cm backward: per lane the scratch holds
    up_h/g_h [L, H] + two gate stores [L, 4H] (input dtype) + dup
    [L, H] f32, plus double-buffered x/mem/doutmem ins and dx/dmem
    outs."""
    per_lane = L * itemsize * (10 * H + 2 * (2 * CH + 2 * nm_in
                                             + nm + ny)) \
        + L * H * 4 + 10 * H * itemsize
    budget = 100 * 1024 * 1024
    cap = int(budget // max(per_lane, 1))
    cap = max(cap // 128 * 128, 128)
    div = _divisor_tile(B, cap, 128)
    if div:
        return div
    n_tiles = -(-B // cap)
    bt = -(-(-(-B // n_tiles)) // 128) * 128
    return min(max(bt, 128), cap)


def _bigru_heads_cm_bwd_pallas(res, d_outmem, d_lasth, block_b=None,
                               interpret=False):
    (x, mem_in, h0_up, h0_dn, win1h_t, win1m_t, bin1, whh_up_t, bhh_up,
     win2_t, bin2, whh_dn_t, bhh_dn, wlat_t, blat, wout_t, bout) = res
    L, CH, B = x.shape
    nm_in = mem_in.shape[1]
    H = whh_up_t.shape[1]
    nm = wlat_t.shape[0]
    ny = wout_t.shape[0]
    if block_b is None:
        block_b = _auto_block_b_cm_bwd(B, L, CH, nm_in, H, nm, ny,
                                       x.dtype.itemsize)
    B0 = B
    if B % block_b:
        pad = block_b * pl.cdiv(B, block_b) - B
        padB = lambda a: jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)])
        x, mem_in = padB(x), padB(mem_in)
        h0_up, h0_dn = padB(h0_up), padB(h0_dn)
        d_outmem, d_lasth = padB(d_outmem), padB(d_lasth)
        B = B + pad
    nb = pl.cdiv(B, block_b)
    f32 = jnp.float32

    kernel = functools.partial(_bigru_heads_cm_bwd_kernel, L=L, H=H,
                               nm=nm, B=B0, block_b=block_b)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    lane = lambda *lead: pl.BlockSpec(lead + (block_b,),
                                      lambda i: (0,) * len(lead) + (i,),
                                      memory_space=pltpu.VMEM)
    in_specs = [
        lane(L, CH), lane(L, nm_in), lane(H), lane(H),
        full((3 * H, CH)), full((3 * H, nm_in)), full((3 * H, 1)),
        full((3 * H, H)), full((3 * H, 1)),
        full((3 * H, H)), full((3 * H, 1)),
        full((3 * H, H)), full((3 * H, 1)),
        full((nm, H)), full((nm, 1)),
        full((ny, nm)), full((ny, 1)),
        lane(L, nm + ny), lane(H),
    ]
    out_specs = [
        lane(L, CH), lane(L, nm_in), lane(H), lane(H),
        full((3 * H, CH)), full((3 * H, nm_in)), full((3 * H, 1)),
        full((3 * H, H)), full((3 * H, 1)),
        full((3 * H, H)), full((3 * H, 1)),
        full((3 * H, H)), full((3 * H, 1)),
        full((nm, H)), full((nm, 1)),
        full((ny, nm)), full((ny, 1)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((L, CH, B), x.dtype),
        jax.ShapeDtypeStruct((L, nm_in, B), mem_in.dtype),
        jax.ShapeDtypeStruct((H, B), h0_up.dtype),
        jax.ShapeDtypeStruct((H, B), h0_dn.dtype),
        jax.ShapeDtypeStruct((3 * H, CH), f32),
        jax.ShapeDtypeStruct((3 * H, nm_in), f32),
        jax.ShapeDtypeStruct((3 * H, 1), f32),
        jax.ShapeDtypeStruct((3 * H, H), f32),
        jax.ShapeDtypeStruct((3 * H, 1), f32),
        jax.ShapeDtypeStruct((3 * H, H), f32),
        jax.ShapeDtypeStruct((3 * H, 1), f32),
        jax.ShapeDtypeStruct((3 * H, H), f32),
        jax.ShapeDtypeStruct((3 * H, 1), f32),
        jax.ShapeDtypeStruct((nm, H), f32),
        jax.ShapeDtypeStruct((nm, 1), f32),
        jax.ShapeDtypeStruct((ny, nm), f32),
        jax.ShapeDtypeStruct((ny, 1), f32),
    ]
    outs = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((L, H, block_b), x.dtype),       # up_h
            pltpu.VMEM((L, H, block_b), x.dtype),       # g_h
            pltpu.VMEM((L, 4 * H, block_b), x.dtype),   # gates_u
            pltpu.VMEM((L, 4 * H, block_b), x.dtype),   # gates_d
            pltpu.VMEM((L, H, block_b), f32),           # d_up
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        interpret=interpret,
    )(x, mem_in, h0_up, h0_dn, win1h_t, win1m_t, bin1, whh_up_t, bhh_up,
      win2_t, bin2, whh_dn_t, bhh_dn, wlat_t, blat, wout_t, bout,
      d_outmem, d_lasth)
    (dx, dmem, dh0u, dh0d, dw1h, dw1m, db1, dwhhu, dbhhu, dwin2, dbin2,
     dwhhd, dbhhd, dwlat, dblat, dwout, dbout) = outs
    if B != B0:
        dx, dmem = dx[..., :B0], dmem[..., :B0]
        dh0u, dh0d = dh0u[..., :B0], dh0d[..., :B0]
    cast = lambda d, p: d.astype(p.dtype)
    return (dx, dmem, dh0u, dh0d,
            cast(dw1h, win1h_t), cast(dw1m, win1m_t), cast(db1, bin1),
            cast(dwhhu, whh_up_t), cast(dbhhu, bhh_up),
            cast(dwin2, win2_t), cast(dbin2, bin2),
            cast(dwhhd, whh_dn_t), cast(dbhhd, bhh_dn),
            cast(dwlat, wlat_t), cast(dblat, blat),
            cast(dwout, wout_t), cast(dbout, bout))


def _heads_cm_bwd(block_b, interpret, acc32, hoist_proj, res, g):
    from . import on_tpu
    if (on_tpu() or interpret) and res[1].shape[1] > 0:
        return _bigru_heads_cm_bwd_pallas(res, g[0], g[1],
                                          interpret=interpret)
    use_kernel = on_tpu() and not interpret
    _, vjp = jax.vjp(
        lambda *a: _heads_cm_compose(*a, block_b, interpret, acc32,
                                     use_kernel), *res)
    return vjp(g)


fused_bigru_heads_cm.defvjp(_heads_cm_fwd, _heads_cm_bwd)


# --------------------------------------------------------------------------
# v4: + in-kernel initial MLP and memory concat
# --------------------------------------------------------------------------
#
# The flagship model computes h = tanh(mlp_initial(x)) [L, B, H] and
# concatenates the latent memory before the up projection — another
# ~1 GB/step of HBM intermediates at B=21,600. v4 takes the raw features
# [L, B, nf] and memory [L, B, nm] and evaluates the initial MLP, the
# concat, and the up projection per tile in VMEM.


def _bigru_heads_init_kernel(feat_ref, memin_ref, h0u_ref, h0d_ref,
                             winit_ref, binit_ref, win1_ref, bin1_ref,
                             whh_u_ref, bhh_u_ref, win2_ref, bin2_ref,
                             whh_d_ref, bhh_d_ref, wlat_ref, blat_ref,
                             wout_ref, bout_ref, out_ref, mem_ref,
                             lasth_ref, up_scratch, *, L: int, H: int,
                             acc32: bool = True):
    acc = jnp.float32 if acc32 else feat_ref.dtype
    mm = jnp.promote_types(acc, jnp.float32)
    dt = feat_ref.dtype
    winit = winit_ref[:]
    binit = binit_ref[:].astype(mm)
    win1 = win1_ref[:]
    bin1 = bin1_ref[:].astype(mm)
    whh_u = whh_u_ref[:]
    bhh_u = bhh_u_ref[:].astype(acc)
    whh_d = whh_d_ref[:]
    bhh_d = bhh_d_ref[:].astype(acc)
    win2 = win2_ref[:]
    bin2 = bin2_ref[:].astype(acc)
    wlat = wlat_ref[:]
    blat = blat_ref[:].astype(mm)
    wout = wout_ref[:]
    bout = bout_ref[:].astype(mm)

    h = h0u_ref[:].astype(acc)

    def up_body(i, h):
        l = L - 1 - i
        xi = _tanh_typed((jnp.dot(feat_ref[l], winit,
                                  preferred_element_type=mm)
                          + binit).astype(dt))
        xcat = jnp.concatenate([xi, memin_ref[l]], axis=-1)
        xp = (jnp.dot(xcat, win1, preferred_element_type=mm)
              + bin1).astype(acc)
        h = _gru_step(h, xp, whh_u, bhh_u, H)
        up_scratch[l] = h.astype(up_scratch.dtype)
        return h

    jax.lax.fori_loop(0, L, up_body, h)

    h2 = h0d_ref[:].astype(acc)

    def down_body(l, h2):
        up_l = up_scratch[l]
        xp2 = (jnp.dot(up_l, win2, preferred_element_type=mm)
               + bin2.astype(mm)).astype(acc)
        h2 = _gru_step(h2, xp2, whh_d, bhh_d, H)
        hd = h2.astype(wlat.dtype)
        mem_l = (jnp.dot(hd, wlat, preferred_element_type=mm)
                 + blat).astype(mem_ref.dtype)
        out_l = (jnp.dot(mem_l.astype(wout.dtype), wout,
                         preferred_element_type=mm) + bout)
        mem_ref[l] = mem_l
        out_ref[l] = out_l.astype(out_ref.dtype)
        return h2

    h2 = jax.lax.fori_loop(0, L, down_body, h2)
    lasth_ref[:] = h2.astype(lasth_ref.dtype)


def _bigru_heads_init_kernel_merged(feat_ref, memin_ref, h0u_ref,
                                    h0d_ref, winit_ref, binit_ref,
                                    win1_ref, bin1_ref, whh_u_ref,
                                    bhh_u_ref, win2_ref, bin2_ref,
                                    whh_d_ref, bhh_d_ref, wlat_ref,
                                    blat_ref, wout_ref, bout_ref,
                                    outmem_ref, lasth_ref, up_scratch,
                                    *, L: int, H: int,
                                    acc32: bool = True):
    """v4 with a MERGED [L, Bt, nm+ny] level output (mem || out): one
    store per level instead of two. (Tried and disproved: merging the
    outputs into one large buffer does NOT stop XLA's scoped-VMEM stack
    placement of the custom-call results — the raised
    xla_tpu_scoped_vmem_limit_kib jit option is still required; see
    PERFORMANCE.md round-3.)"""
    acc = jnp.float32 if acc32 else feat_ref.dtype
    mm = jnp.promote_types(acc, jnp.float32)
    dt = feat_ref.dtype
    winit = winit_ref[:]
    binit = binit_ref[:].astype(mm)
    win1 = win1_ref[:]
    bin1 = bin1_ref[:].astype(mm)
    whh_u = whh_u_ref[:]
    bhh_u = bhh_u_ref[:].astype(acc)
    whh_d = whh_d_ref[:]
    bhh_d = bhh_d_ref[:].astype(acc)
    win2 = win2_ref[:]
    bin2 = bin2_ref[:].astype(acc)
    wlat = wlat_ref[:]
    blat = blat_ref[:].astype(mm)
    wout = wout_ref[:]
    bout = bout_ref[:].astype(mm)

    h = h0u_ref[:].astype(acc)

    def up_body(i, h):
        l = L - 1 - i
        xi = _tanh_typed((jnp.dot(feat_ref[l], winit,
                                  preferred_element_type=mm)
                          + binit).astype(dt))
        xcat = jnp.concatenate([xi, memin_ref[l]], axis=-1)
        xp = (jnp.dot(xcat, win1, preferred_element_type=mm)
              + bin1).astype(acc)
        h = _gru_step(h, xp, whh_u, bhh_u, H)
        up_scratch[l] = h.astype(up_scratch.dtype)
        return h

    jax.lax.fori_loop(0, L, up_body, h)

    h2 = h0d_ref[:].astype(acc)

    def down_body(l, h2):
        up_l = up_scratch[l]
        xp2 = (jnp.dot(up_l, win2, preferred_element_type=mm)
               + bin2.astype(mm)).astype(acc)
        h2 = _gru_step(h2, xp2, whh_d, bhh_d, H)
        hd = h2.astype(wlat.dtype)
        mem_l = (jnp.dot(hd, wlat, preferred_element_type=mm)
                 + blat).astype(outmem_ref.dtype)
        out_l = (jnp.dot(mem_l.astype(wout.dtype), wout,
                         preferred_element_type=mm) + bout)
        outmem_ref[l] = jnp.concatenate(
            [mem_l, out_l.astype(outmem_ref.dtype)], axis=-1)
        return h2

    h2 = jax.lax.fori_loop(0, L, down_body, h2)
    lasth_ref[:] = h2.astype(lasth_ref.dtype)


def _auto_block_b_heads_init(B, L, nf, nm_in, H, nm, ny, itemsize):
    pl128 = lambda n: -(-n // 128) * 128
    per_row = L * itemsize * (2 * pl128(nf) + 2 * pl128(nm_in) + H
                              + 2 * pl128(nm) + 2 * pl128(ny))
    cap = int(_VMEM_BUDGET // max(per_row, 1))
    gran = 16 if itemsize == 2 else 8
    div = _divisor_tile(B, min(cap, 1024), gran)
    if div >= 128 or (div > 0 and div == B):
        return div
    for bt in (512, 384, 256, 192, 128, 96, 64, 32, 16, 8):
        if bt > B and bt != 8:
            continue
        if bt * per_row <= _VMEM_BUDGET:
            return min(bt, max(B, 8))
    return 8


def _bigru_heads_init_pallas_lbh(feat, mem_in, h0_up, h0_dn, w_init,
                                 b_init, win1, bin1, whh_up, bhh_up,
                                 win2, bin2, whh_dn, bhh_dn, wlat, blat,
                                 wout, bout, block_b=None, interpret=False,
                                 acc32=True):
    """feat [L,B,nf], mem_in [L,B,nm_in] ->
    (out [L,B,ny], mem [L,B,nm], last_h [B,H])."""
    L, B, nf = feat.shape
    nm_in = mem_in.shape[-1]
    H = whh_up.shape[0]
    nm = wlat.shape[1]
    ny = wout.shape[1]
    if block_b is None:
        block_b = _auto_block_b_heads_init(B, L, nf, nm_in, H, nm, ny,
                                           feat.dtype.itemsize)
    B0 = B
    if B % block_b:
        pad = block_b * pl.cdiv(B, block_b) - B
        padB = lambda a, ax: jnp.pad(a, [(0, pad) if i == ax else (0, 0)
                                         for i in range(a.ndim)])
        feat, mem_in = padB(feat, 1), padB(mem_in, 1)
        h0_up, h0_dn = padB(h0_up, 0), padB(h0_dn, 0)
        B = B + pad
    nb = pl.cdiv(B, block_b)

    # merged level output (mem || out): one store per level; the scoped
    # VMEM placement caveat is unchanged (see kernel docstring)
    kernel = functools.partial(_bigru_heads_init_kernel_merged, L=L, H=H,
                               acc32=acc32)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    lb = lambda w: pl.BlockSpec((L, block_b, w), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)
    bh = pl.BlockSpec((block_b, H), lambda i: (i, 0),
                      memory_space=pltpu.VMEM)
    in_specs = [
        lb(nf), lb(nm_in), bh, bh,
        full((nf, w_init.shape[1])), full((w_init.shape[1],)),
        full(win1.shape), full((3 * H,)),
        full((H, 3 * H)), full((3 * H,)),
        full((H, 3 * H)), full((3 * H,)),
        full((H, 3 * H)), full((3 * H,)),
        full((H, nm)), full((nm,)),
        full((nm, ny)), full((ny,)),
    ]
    out_specs = [lb(nm + ny), bh]
    outmem, lasth = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((L, B, nm + ny), feat.dtype),
            jax.ShapeDtypeStruct((B, H), feat.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((L, block_b, H), feat.dtype)],
        # see _bigru_heads_pallas_lbh: the missing vmem_limit declaration
        # was the round-3 scoped-VMEM conflict (round-4 fix)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        interpret=interpret,
    )(feat, mem_in, h0_up, h0_dn, w_init, b_init, win1, bin1, whh_up,
      bhh_up, win2, bin2, whh_dn, bhh_dn, wlat, blat, wout, bout)
    if B0 != B:
        outmem, lasth = outmem[:, :B0], lasth[:B0]
    return outmem[..., nm:], outmem[..., :nm], lasth


def _heads_init_compose(feat, mem_in, h0_up, h0_dn, w_init, b_init, win1,
                        bin1, whh_up, bhh_up, win2, bin2, whh_dn, bhh_dn,
                        wlat, blat, wout, bout, block_b, interpret, acc32,
                        use_kernel):
    dt = feat.dtype
    xi = jnp.tanh((jnp.einsum("lbn,nh->lbh", feat, w_init)
                   + b_init).astype(dt))
    x = jnp.concatenate([xi, mem_in], axis=-1)
    return _heads_compose(x, h0_up, h0_dn, win1, bin1, whh_up, bhh_up,
                          win2, bin2, whh_dn, bhh_dn, wlat, blat, wout,
                          bout, block_b, interpret, acc32, use_kernel)


@functools.partial(jax.custom_vjp, nondiff_argnums=(18, 19, 20))
def fused_bigru_heads_init_lbh(feat, mem_in, h0_up, h0_dn, w_init, b_init,
                               win1, bin1, whh_up, bhh_up, win2, bin2,
                               whh_dn, bhh_dn, wlat, blat, wout, bout,
                               block_b=None, interpret: bool = False,
                               acc32: bool = True):
    """v4: v3 + in-kernel initial MLP and memory concat. feat [L, B, nf],
    mem_in [L, B, nm_in] -> (out, mem, last_h)."""
    from . import on_tpu
    if on_tpu() or interpret:
        return _bigru_heads_init_pallas_lbh(
            feat, mem_in, h0_up, h0_dn, w_init, b_init, win1, bin1,
            whh_up, bhh_up, win2, bin2, whh_dn, bhh_dn, wlat, blat,
            wout, bout, block_b, interpret, acc32)
    return _heads_init_compose(feat, mem_in, h0_up, h0_dn, w_init, b_init,
                               win1, bin1, whh_up, bhh_up, win2, bin2,
                               whh_dn, bhh_dn, wlat, blat, wout, bout,
                               block_b, interpret, acc32, False)


def _heads_init_fwd(feat, mem_in, h0_up, h0_dn, w_init, b_init, win1,
                    bin1, whh_up, bhh_up, win2, bin2, whh_dn, bhh_dn,
                    wlat, blat, wout, bout, block_b, interpret, acc32):
    out = fused_bigru_heads_init_lbh(feat, mem_in, h0_up, h0_dn, w_init,
                                     b_init, win1, bin1, whh_up, bhh_up,
                                     win2, bin2, whh_dn, bhh_dn, wlat,
                                     blat, wout, bout, block_b, interpret,
                                     acc32)
    return out, (feat, mem_in, h0_up, h0_dn, w_init, b_init, win1, bin1,
                 whh_up, bhh_up, win2, bin2, whh_dn, bhh_dn, wlat, blat,
                 wout, bout)


def _heads_init_bwd(block_b, interpret, acc32, res, g):
    from . import on_tpu
    use_kernel = on_tpu() and not interpret
    _, vjp = jax.vjp(
        lambda *a: _heads_init_compose(*a, block_b, interpret, acc32,
                                       use_kernel), *res)
    return vjp(g)


fused_bigru_heads_init_lbh.defvjp(_heads_init_fwd, _heads_init_bwd)


# --------------------------------------------------------------------------
# v6: channel-major + in-kernel initial MLP + chunked projection hoist
# --------------------------------------------------------------------------
#
# The v5 cm kernel's lane tile is capped by its widest input: the
# init-MLP stream [L, CH=H, B] (double-buffered, ~50 kB/lane at the
# flagship shapes). Taking the RAW features [L, nf~7-13, B] instead and
# evaluating the initial MLP inside the kernel shrinks the input buffer
# ~8x, so the tile grows (16 -> ~12 tiles at B=21,600) — and the serial
# level chain, which runs once per tile, is the kernel's floor. The
# init + projection evaluations run as chunked non-dependent phases
# (the _bigru_heads_cm_hoist_kernel scheme); the [L, H, B] init stream
# never exists in HBM (~0.5 GB/step at the online batch).


def _bigru_heads_init_cm_kernel(feat_ref, mem_ref, h0u_ref, h0d_ref,
                                winit_ref, binit_ref, win1h_ref,
                                win1m_ref, bin1_ref, whh_u_ref, bhh_u_ref,
                                win2_ref, bin2_ref, whh_d_ref, bhh_d_ref,
                                wlat_ref, blat_ref, wout_ref, bout_ref,
                                outmem_ref, lasth_ref, xi_scratch,
                                xp_scratch, up_scratch, *, L: int, H: int,
                                nm: int, acc32: bool = True):
    """feat_ref [L, nf, Bt] raw features, mem_ref [L, nm_in, Bt];
    winit_t [H, nf]; the up projection splits win1 rows (xi | mem) like
    the v5 kernel; v4 numerics: xi = tanh((winit@feat + binit) cast to
    the input dtype)."""
    acc = jnp.float32 if acc32 else feat_ref.dtype
    mm = jnp.promote_types(acc, jnp.float32)
    dt = feat_ref.dtype
    NB = _hoist_nb(L)
    winit = winit_ref[:]
    binit = binit_ref[:].astype(mm)
    win1h = win1h_ref[:]
    win1m = win1m_ref[:]
    bin1 = bin1_ref[:].astype(mm)
    whh_u = whh_u_ref[:]
    bhh_u = bhh_u_ref[:].astype(acc)
    whh_d = whh_d_ref[:]
    bhh_d = bhh_d_ref[:].astype(acc)
    win2 = win2_ref[:]
    bin2 = bin2_ref[:].astype(mm)
    wlat = wlat_ref[:]
    blat = blat_ref[:].astype(mm)
    wout = wout_ref[:]
    bout = bout_ref[:].astype(mm)

    h = h0u_ref[:].astype(acc)

    def up_block(b, h):
        base = L - (b + 1) * NB

        def init_phase(j, c):
            xi_scratch[j] = _tanh_typed(
                (jnp.dot(winit, feat_ref[base + j],
                         preferred_element_type=mm)
                 + binit).astype(dt))
            return c

        jax.lax.fori_loop(0, NB, init_phase, 0)

        def proj_phase(j, c):
            xp_scratch[j] = (jnp.dot(win1h, xi_scratch[j],
                                     preferred_element_type=mm)
                             + jnp.dot(win1m, mem_ref[base + j],
                                       preferred_element_type=mm)
                             + bin1).astype(xp_scratch.dtype)
            return c

        jax.lax.fori_loop(0, NB, proj_phase, 0)

        def chain(i, h):
            j = NB - 1 - i
            h = _gru_step_cm(h, xp_scratch[j].astype(acc), whh_u,
                             bhh_u, H)
            up_scratch[base + j] = h.astype(up_scratch.dtype)
            return h

        return jax.lax.fori_loop(0, NB, chain, h)

    jax.lax.fori_loop(0, L // NB, up_block, h)

    h2 = h0d_ref[:].astype(acc)

    def down_block(b, h2):
        base = b * NB

        def proj_phase(j, c):
            xp_scratch[j] = (jnp.dot(win2, up_scratch[base + j],
                                     preferred_element_type=mm)
                             + bin2).astype(xp_scratch.dtype)
            return c

        jax.lax.fori_loop(0, NB, proj_phase, 0)

        def chain(j, h2):
            h2 = _gru_step_cm(h2, xp_scratch[j].astype(acc), whh_d,
                              bhh_d, H)
            hd = h2.astype(wlat.dtype)
            mem_l = (jnp.dot(wlat, hd, preferred_element_type=mm)
                     + blat).astype(outmem_ref.dtype)
            out_l = (jnp.dot(wout, mem_l.astype(wout.dtype),
                             preferred_element_type=mm) + bout)
            outmem_ref[base + j] = jnp.concatenate(
                [mem_l, out_l.astype(outmem_ref.dtype)], axis=0)
            return h2

        return jax.lax.fori_loop(0, NB, chain, h2)

    h2 = jax.lax.fori_loop(0, L // NB, down_block, h2)
    lasth_ref[:] = h2.astype(lasth_ref.dtype)


def _auto_block_b_init_cm(B: int, L: int, nf: int, nm_in: int, H: int,
                          nm: int, ny: int, itemsize: int) -> int:
    per_lane = L * itemsize * (2 * (nf + nm_in) + H + 2 * (nm + ny)) \
        + _hoist_nb(L) * itemsize * 4 * H \
        + 6 * H * itemsize      # double-buffered h0_up/h0_dn + lasth
    cap = int(_VMEM_BUDGET // max(per_lane, 1))
    cap = max(cap // 128 * 128, 128)
    div = _divisor_tile(B, cap, 128)
    if div:
        return div
    n_tiles = -(-B // cap)
    bt = -(-(-(-B // n_tiles)) // 128) * 128
    return min(max(bt, 128), cap)


def _bigru_heads_init_cm_pallas(feat, mem_in, h0_up, h0_dn, winit_t,
                                binit, win1h_t, win1m_t, bin1, whh_up_t,
                                bhh_up, win2_t, bin2, whh_dn_t, bhh_dn,
                                wlat_t, blat, wout_t, bout, block_b=None,
                                interpret=False, acc32=True):
    """v6: feat [L, nf, B] raw features + mem_in [L, nm_in, B], h0
    [H, B], weights pre-transposed [out_ch, in_ch], biases [ch, 1] ->
    (outmem [L, nm+ny, B] = mem || out, lasth [H, B])."""
    L, nf, B = feat.shape
    nm_in = mem_in.shape[1]
    H = whh_up_t.shape[1]
    nm = wlat_t.shape[0]
    ny = wout_t.shape[0]
    if block_b is None:
        block_b = _auto_block_b_init_cm(B, L, nf, nm_in, H, nm, ny,
                                        feat.dtype.itemsize)
    B0 = B
    if B % block_b:
        pad = block_b * pl.cdiv(B, block_b) - B
        padB = lambda a: jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)])
        feat, mem_in = padB(feat), padB(mem_in)
        h0_up, h0_dn = padB(h0_up), padB(h0_dn)
        B = B + pad
    nb = pl.cdiv(B, block_b)

    kernel = functools.partial(_bigru_heads_init_cm_kernel, L=L, H=H,
                               nm=nm, acc32=acc32)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    lane = lambda *lead: pl.BlockSpec(lead + (block_b,),
                                      lambda i: (0,) * len(lead) + (i,),
                                      memory_space=pltpu.VMEM)
    in_specs = [
        lane(L, nf), lane(L, nm_in), lane(H), lane(H),
        full((H, nf)), full((H, 1)),
        full((3 * H, H)), full((3 * H, nm_in)), full((3 * H, 1)),
        full((3 * H, H)), full((3 * H, 1)),
        full((3 * H, H)), full((3 * H, 1)),
        full((3 * H, H)), full((3 * H, 1)),
        full((nm, H)), full((nm, 1)),
        full((ny, nm)), full((ny, 1)),
    ]
    out_specs = [lane(L, nm + ny), lane(H)]
    NB = _hoist_nb(L)
    outmem, lasth = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((L, nm + ny, B), feat.dtype),
            jax.ShapeDtypeStruct((H, B), feat.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((NB, H, block_b), feat.dtype),
                        pltpu.VMEM((NB, 3 * H, block_b), feat.dtype),
                        pltpu.VMEM((L, H, block_b), feat.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        interpret=interpret,
    )(feat, mem_in, h0_up, h0_dn, winit_t, binit, win1h_t, win1m_t, bin1,
      whh_up_t, bhh_up, win2_t, bin2, whh_dn_t, bhh_dn, wlat_t, blat,
      wout_t, bout)
    if B0 != B:
        outmem, lasth = outmem[..., :B0], lasth[..., :B0]
    return outmem, lasth


def _heads_init_cm_compose(feat, mem_in, h0_up, h0_dn, winit_t, binit,
                           win1h_t, win1m_t, bin1, whh_up_t, bhh_up,
                           win2_t, bin2, whh_dn_t, bhh_dn, wlat_t, blat,
                           wout_t, bout, block_b, interpret, acc32,
                           use_kernel):
    """Differentiable channel-major v6 reference: transpose to the
    batch-major v4 composition, transpose back."""
    tT = lambda a: jnp.swapaxes(a, -1, -2)
    sq = lambda b: b[:, 0]
    win1 = jnp.concatenate([tT(win1h_t), tT(win1m_t)], axis=0)
    out, mem, lasth = _heads_init_compose(
        tT(feat), tT(mem_in), tT(h0_up), tT(h0_dn), tT(winit_t),
        sq(binit), win1, sq(bin1), tT(whh_up_t), sq(bhh_up), tT(win2_t),
        sq(bin2), tT(whh_dn_t), sq(bhh_dn), tT(wlat_t), sq(blat),
        tT(wout_t), sq(bout), block_b, interpret, acc32, use_kernel)
    outmem = jnp.concatenate([tT(mem), tT(out)], axis=1)
    return outmem, tT(lasth)


@functools.partial(jax.custom_vjp, nondiff_argnums=(19, 20, 21))
def fused_bigru_heads_init_cm(feat, mem_in, h0_up, h0_dn, winit_t, binit,
                              win1h_t, win1m_t, bin1, whh_up_t, bhh_up,
                              win2_t, bin2, whh_dn_t, bhh_dn, wlat_t,
                              blat, wout_t, bout, block_b=None,
                              interpret: bool = False, acc32: bool = True):
    """v6 channel-major fused initial-MLP + BiGRU + heads (see the
    section comment). feat [L, nf, B] RAW features, mem_in
    [L, nm_in, B] -> (outmem [L, nm+ny, B] = mem || out, lasth [H, B])."""
    from . import on_tpu
    if on_tpu() or interpret:
        return _bigru_heads_init_cm_pallas(
            feat, mem_in, h0_up, h0_dn, winit_t, binit, win1h_t, win1m_t,
            bin1, whh_up_t, bhh_up, win2_t, bin2, whh_dn_t, bhh_dn,
            wlat_t, blat, wout_t, bout, block_b, interpret, acc32)
    return _heads_init_cm_compose(feat, mem_in, h0_up, h0_dn, winit_t,
                                  binit, win1h_t, win1m_t, bin1, whh_up_t,
                                  bhh_up, win2_t, bin2, whh_dn_t, bhh_dn,
                                  wlat_t, blat, wout_t, bout, block_b,
                                  interpret, acc32, False)


def _heads_init_cm_fwd(feat, mem_in, h0_up, h0_dn, winit_t, binit,
                       win1h_t, win1m_t, bin1, whh_up_t, bhh_up, win2_t,
                       bin2, whh_dn_t, bhh_dn, wlat_t, blat, wout_t,
                       bout, block_b, interpret, acc32):
    out = fused_bigru_heads_init_cm(feat, mem_in, h0_up, h0_dn, winit_t,
                                    binit, win1h_t, win1m_t, bin1,
                                    whh_up_t, bhh_up, win2_t, bin2,
                                    whh_dn_t, bhh_dn, wlat_t, blat,
                                    wout_t, bout, block_b, interpret,
                                    acc32)
    return out, (feat, mem_in, h0_up, h0_dn, winit_t, binit, win1h_t,
                 win1m_t, bin1, whh_up_t, bhh_up, win2_t, bin2, whh_dn_t,
                 bhh_dn, wlat_t, blat, wout_t, bout)


def _heads_init_cm_bwd(block_b, interpret, acc32, res, g):
    """v6 backward = init-MLP recompute (one batched einsum; the
    [L, H, B] init stream exists only transiently for the backward) +
    the hand-written channel-major backward kernel on the v5 core +
    the init-MLP VJP (XLA einsums). Round-5: replaces the composition
    that replayed the whole forward through HBM."""
    from . import on_tpu
    (feat, mem_in, h0_up, h0_dn, winit_t, binit) = res[:6]
    rest = res[6:]
    if (on_tpu() or interpret) and mem_in.shape[1] > 0:
        dt = feat.dtype
        f32 = jnp.float32
        pre = (jnp.einsum("hf,lfb->lhb", winit_t, feat,
                          preferred_element_type=f32)
               + binit.astype(f32)).astype(dt)
        xi = jnp.tanh(pre)
        res5 = (xi, mem_in, h0_up, h0_dn) + tuple(rest)
        (dxi, dmem, dh0u, dh0d, *wgrads) = _bigru_heads_cm_bwd_pallas(
            res5, g[0], g[1], interpret=interpret)
        dpre = dxi.astype(f32) * (1.0 - xi.astype(f32) ** 2)
        dfeat = jnp.einsum("hf,lhb->lfb", winit_t.astype(f32), dpre,
                           preferred_element_type=f32).astype(feat.dtype)
        dwinit = jnp.einsum("lhb,lfb->hf", dpre, feat.astype(f32),
                            preferred_element_type=f32
                            ).astype(winit_t.dtype)
        dbinit = dpre.sum(axis=(0, 2))[:, None].astype(binit.dtype)
        return (dfeat, dmem, dh0u, dh0d, dwinit, dbinit) + tuple(wgrads)
    use_kernel = on_tpu() and not interpret
    _, vjp = jax.vjp(
        lambda *a: _heads_init_cm_compose(*a, block_b, interpret, acc32,
                                          use_kernel), *res)
    return vjp(g)


fused_bigru_heads_init_cm.defvjp(_heads_init_cm_fwd, _heads_init_cm_bwd)


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
