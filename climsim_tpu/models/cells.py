"""RNN cells for vertical-column scans (lax.scan-compatible flax modules).

TPU-native re-design of the reference's custom cell zoo
(rnn/models_torch_kernels.py): GRU/LSTM (cuDNN in the reference), SRU (:25),
LayerNorm-LSTM (:718), stochastic GRU/LSTM layers (VAE-style noise
perturbing the gates, :565-624, :1034-1328 incl. AR(1) `_ar` variants).

Each cell follows the flax RNNCellBase calling convention
``(carry, x) -> (carry, y)``; :func:`scan_rnn` lifts a cell over the level
axis with batch on the leading axis, so a whole column batch advances one
level per step via one fused [B, nx+nh] x [nx+nh, k*nh] matmul on the MXU.
The input projection for the full sequence is hoisted out of the scan
(the reference's v5 trick, models_torch_kernels.py:565-622) so the scan
body contains only the recurrent matmul.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class GRUCell(nn.Module):
    hidden: int
    dtype: Any = None

    @nn.compact
    def __call__(self, h, x_proj):
        """x_proj: precomputed input projection [B, 3*hidden] (+bias)."""
        hh = nn.Dense(3 * self.hidden, use_bias=True, dtype=self.dtype,
                      name="hh")(h)
        xr, xz, xn = jnp.split(x_proj, 3, axis=-1)
        hr, hz, hn = jnp.split(hh, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    @staticmethod
    def proj_width(hidden):
        return 3 * hidden


class LSTMCell(nn.Module):
    hidden: int
    dtype: Any = None

    @nn.compact
    def __call__(self, carry, x_proj):
        h, c = carry
        hh = nn.Dense(4 * self.hidden, use_bias=True, dtype=self.dtype,
                      name="hh")(h)
        g = x_proj + hh
        i, f, gg, o = jnp.split(g, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        c_new = f * c + i * jnp.tanh(gg)
        h_new = o * jnp.tanh(c_new)
        return (h_new, c_new), h_new

    @staticmethod
    def proj_width(hidden):
        return 4 * hidden


class LayerNormLSTMCell(nn.Module):
    """LSTM with layer-normalized gates — the DETERMINISTIC analog of the
    reference's noise-conditioned StochasticLayerNormLSTMLayer
    (models_torch_kernels.py:718; the reference has no plain LN-LSTM, so
    this uses standard per-feature LayerNorm; the exact noise-conditioned
    variant is StochasticLayerNormLSTMCell / 'sln_lstm')."""

    hidden: int
    dtype: Any = None

    @nn.compact
    def __call__(self, carry, x_proj):
        h, c = carry
        hh = nn.Dense(4 * self.hidden, use_bias=False, dtype=self.dtype,
                      name="hh")(h)
        g = nn.LayerNorm(name="ln_g")(x_proj + hh)
        i, f, gg, o = jnp.split(g, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        c_new = f * c + i * jnp.tanh(gg)
        h_new = o * jnp.tanh(nn.LayerNorm(name="ln_c")(c_new))
        return (h_new, c_new), h_new

    @staticmethod
    def proj_width(hidden):
        return 4 * hidden


class StochasticLayerNormLSTMCell(nn.Module):
    """The reference's stochastic-LayerNorm LSTM
    (models_torch_kernels.py:698-785 StochasticLayerNormLSTMLayer): each
    normalization's gain and bias are PRODUCED FROM THE NOISE vector via
    learned maps (gain = eps @ G [eps_size, nf], bias = eps @ B), with
    separate noise-LNs on the input and hidden projections and on the cell
    state before the output gate. Normalization uses the unbiased std
    (torch.std default) with eps added to std, matching the reference."""

    hidden: int
    eps_size: int = 16
    dtype: Any = None

    def _sln(self, x, eps, name, nf):
        gain = self.param(f"{name}_gain", nn.initializers.ones,
                          (self.eps_size, nf), jnp.float32).astype(x.dtype)
        bias = self.param(f"{name}_bias", nn.initializers.zeros,
                          (self.eps_size, nf), jnp.float32).astype(x.dtype)
        mean = x.mean(-1, keepdims=True)
        std = x.std(-1, keepdims=True, ddof=1)
        return (x - mean) / (std + 1e-5) * (eps @ gain) + eps @ bias

    @nn.compact
    def __call__(self, carry, inp):
        h, c = carry
        x_proj, eps = inp                # eps: [B, eps_size]
        hh = nn.Dense(4 * self.hidden, use_bias=True, dtype=self.dtype,
                      name="hh")(h)
        gates = self._sln(x_proj, eps, "ln_ih", 4 * self.hidden) \
            + self._sln(hh, eps, "ln_hh", 4 * self.hidden)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(
            self._sln(c_new, eps, "ln_ho", self.hidden))
        return (h_new, c_new), h_new

    @staticmethod
    def proj_width(hidden):
        return 4 * hidden


class SRUCell(nn.Module):
    """Simple Recurrent Unit, the reference's variant
    (models_torch_kernels.py:25-63 SRU): gates are x-only
    (f, r = sigmoid(LayerNorm(gate(x)))), elementwise cell recurrence
    c' = f*c + (1-f)*x_tilde, highway output
    h = r*act(LayerNorm(c')) + (1-r)*x with sigmoid activation (the
    reference default). The raw-x highway requires nx == hidden (as in the
    reference); for rectangular inputs the residual falls back to x_tilde.
    All matmuls are hoisted (x-only) — the recurrence itself is
    elementwise."""

    hidden: int
    dtype: Any = None
    activation: str = "sigmoid"

    # RNNLayer threads the raw input alongside the projection
    needs_raw_x = True

    @nn.compact
    def __call__(self, c, inp):
        x_proj, x = inp
        x_tilde = x_proj[..., :self.hidden]
        gate = jax.nn.sigmoid(
            nn.LayerNorm(name="gate_ln")(x_proj[..., self.hidden:]))
        f = gate[..., :self.hidden]
        r = gate[..., self.hidden:]
        c_new = f * c + (1.0 - f) * x_tilde
        act = {"sigmoid": jax.nn.sigmoid, "tanh": jnp.tanh}[self.activation]
        resid = x if x.shape[-1] == self.hidden else x_tilde
        y = r * act(nn.LayerNorm(name="act_ln")(c_new)) + (1.0 - r) * resid
        return c_new, y

    @staticmethod
    def proj_width(hidden):
        return 3 * hidden


class StochasticGRUCell(nn.Module):
    """VAE-style stochastic GRU, the reference's v5 design
    (models_torch_kernels.py:565-622 MyStochasticGRULayer5): the hidden
    state parameterizes (mean, logvar) via a 2H encoder; the sampled
    z = mean + eps*exp(logvar/2) drives ALL THREE gate contributions
    through weight_zh (the hidden enters the gates only through z):
      r = sigmoid(x_r + z_r); zg = sigmoid(x_z + z_z);
      n = tanh(x_n + r*z_n); h' = n + zg*(h - n).
    Noise comes in via the input stream (functional RNG). noise_scale
    scales eps (0 = deterministic z = mean)."""

    hidden: int
    noise_scale: float = 1.0
    dtype: Any = None

    @nn.compact
    def __call__(self, h, inp):
        x_proj, eps = inp     # eps: [B, hidden] standard normal
        enc = nn.Dense(2 * self.hidden, use_bias=False, dtype=self.dtype,
                       name="encoder")(h)
        mean, logvar = jnp.split(enc, 2, axis=-1)
        z = mean + jnp.exp(0.5 * logvar) * (self.noise_scale * eps)
        zh = nn.Dense(3 * self.hidden, use_bias=False, dtype=self.dtype,
                      name="zh")(z)
        xr, xz, xn = jnp.split(x_proj, 3, axis=-1)
        zr, zz, zn = jnp.split(zh, 3, axis=-1)
        r = jax.nn.sigmoid(xr + zr)
        zg = jax.nn.sigmoid(xz + zz)
        n = jnp.tanh(xn + r * zn)
        h_new = n + zg * (h - n)
        return h_new, h_new

    @staticmethod
    def proj_width(hidden):
        return 3 * hidden


class StochasticLSTMCell(nn.Module):
    """Stochastic LSTM, the reference's v4 design used by the stochastic
    3rd layer (models_torch_kernels.py:1204-1261 MyStochasticLSTMLayer4):
    one encoder over cat(x, h) yields (mean, logvar, ingate, forgetgate,
    cellgate); the OUTPUT GATE is the stochastic part,
      out = sigmoid(mean + eps*exp(logvar/2));
      c' = sigmoid(f)*c + sigmoid(i)*tanh(g); h' = out*tanh(c').
    The reference's single [nx+H, 5H] matmul decomposes exactly into the
    hoisted x-projection (proj_width 5H, no bias) plus the in-cell
    h-projection. noise_scale scales eps (0 = deterministic out gate)."""

    hidden: int
    noise_scale: float = 1.0
    dtype: Any = None

    @nn.compact
    def __call__(self, carry, inp):
        h, c = carry
        x_proj, eps = inp
        hh = nn.Dense(5 * self.hidden, use_bias=False, dtype=self.dtype,
                      name="hh")(h)
        yy = x_proj + hh
        mean, logvar, i, f, g = jnp.split(yy, 5, axis=-1)
        out = jax.nn.sigmoid(mean + jnp.exp(0.5 * logvar)
                             * (self.noise_scale * eps))
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = out * jnp.tanh(c_new)
        return (h_new, c_new), h_new

    @staticmethod
    def proj_width(hidden):
        return 5 * hidden


CELL_TYPES = {"gru": GRUCell, "lstm": LSTMCell, "ln_lstm": LayerNormLSTMCell,
              "sru": SRUCell, "sgru": StochasticGRUCell,
              "slstm": StochasticLSTMCell,
              "sln_lstm": StochasticLayerNormLSTMCell}


def needs_cell_state(kind: str) -> bool:
    return kind in ("lstm", "ln_lstm", "slstm")


class RNNLayer(nn.Module):
    """One directional RNN over the level axis: hoisted input projection +
    nn.scan of the cell. Input [B, L, nx] -> outputs [B, L, hidden].

    ``reverse=True`` scans from the last level (surface, since TOA is level
    0) upward — the reference's flip-then-scan (models.py:478-496).
    """

    hidden: int
    kind: str = "gru"
    reverse: bool = False
    noise: bool = False    # feed per-level noise (stochastic cells)
    dtype: Any = None      # compute dtype (bf16 for MXU-native matmuls)
    # lax.scan unroll factor for the level loop: >1 fuses consecutive
    # levels into one loop body (fewer while-loop iterations, better MXU
    # scheduling for the small [B,H]x[H,kH] recurrent matmuls)
    unroll: int = 1
    # noise-vector width for the stochastic-LayerNorm cell (sln_lstm)
    eps_size: int = 16

    @nn.compact
    def __call__(self, xs, h0, eps=None):
        cell_cls = CELL_TYPES[self.kind]
        proj = nn.Dense(cell_cls.proj_width(self.hidden), dtype=self.dtype,
                        name="input_proj")
        xs_proj = proj(xs)                       # [B, L, k*hidden]
        # lax.scan requires carry dtype stability; unify on the projection's
        # dtype (guards x64 test mode and mixed-precision policies)
        h0 = jax.tree_util.tree_map(lambda a: a.astype(xs_proj.dtype), h0)
        if eps is not None:
            eps = eps.astype(xs_proj.dtype)
        xs_scan = jnp.swapaxes(xs_proj, 0, 1)    # [L, B, k*hidden]
        if self.noise:
            assert eps is not None, "stochastic cell needs eps [L, B, hidden]"
            stream: Any = (xs_scan, eps)
        elif getattr(cell_cls, "needs_raw_x", False):
            # cells with a raw-input highway (SRU) see (proj, x) per level
            stream = (xs_scan,
                      jnp.swapaxes(xs.astype(xs_proj.dtype), 0, 1))
        else:
            stream = xs_scan

        scan = nn.scan(cell_cls, variable_broadcast="params",
                       split_rngs={"params": False}, in_axes=0, out_axes=0,
                       reverse=self.reverse, unroll=self.unroll)
        kw = {"eps_size": self.eps_size} \
            if cell_cls is StochasticLayerNormLSTMCell else {}
        carry, ys = scan(self.hidden, dtype=self.dtype,
                         name="cell", **kw)(h0, stream)
        return jnp.swapaxes(ys, 0, 1), carry     # [B, L, hidden], final carry


class FusedBiGRULayer(nn.Module):
    """Both column sweeps as one fused Pallas kernel (ops.pallas_rnn).

    Drop-in for the rnn_up + rnn_down pair of RNNAutoreg when the cell is a
    GRU: up sweep surface->TOA (reverse), down sweep TOA->surface, down
    input projection fused. Falls back to the scan reference off-TPU.
    """

    hidden: int
    block_b: Any = None      # None = auto VMEM-budget tile sizing
    # f32 gate arithmetic inside the kernel. False runs the gates in the
    # input dtype — it lowers on hardware since the explicitly-typed
    # transcendentals, but measures 28% SLOWER than f32 gates
    # (docs/kernels.md), so True stays the default.
    acc32: bool = True
    force_reference: bool = False

    @nn.compact
    def __call__(self, x, h0_up, h0_dn):
        from ..ops.pallas_rnn import fused_bigru_lbh, _bigru_reference_lbh

        H = self.hidden
        nx = x.shape[-1]
        init = nn.initializers.lecun_normal()
        zeros = nn.initializers.zeros
        win1 = self.param("win1", init, (nx, 3 * H), jnp.float32)
        bin1 = self.param("bin1", zeros, (3 * H,), jnp.float32)
        whh_up = self.param("whh_up", init, (H, 3 * H), jnp.float32)
        bhh_up = self.param("bhh_up", zeros, (3 * H,), jnp.float32)
        win2 = self.param("win2", init, (H, 3 * H), jnp.float32)
        bin2 = self.param("bin2", zeros, (3 * H,), jnp.float32)
        whh_dn = self.param("whh_dn", init, (H, 3 * H), jnp.float32)
        bhh_dn = self.param("bhh_dn", zeros, (3 * H,), jnp.float32)

        dt = x.dtype
        # hoisted up-sweep projection, written level-major so the kernel
        # streams it without an HBM transpose in front
        xp = (jnp.einsum("blx,xh->lbh", x, win1.astype(dt))
              + bin1.astype(dt))
        args = (xp, h0_up.astype(dt), h0_dn.astype(dt), whh_up.astype(dt),
                bhh_up.astype(dt), win2.astype(dt), bin2.astype(dt),
                whh_dn.astype(dt), bhh_dn.astype(dt))
        from ..ops import on_tpu
        use_kernel = (not self.force_reference) and on_tpu()
        if use_kernel:
            down, lasth = fused_bigru_lbh(*args, self.block_b, False,
                                          self.acc32)
        else:
            down, lasth = _bigru_reference_lbh(*args)
        return jnp.swapaxes(down, 0, 1), lasth


class FusedBiGRUHeadsLayer(nn.Module):
    """FusedBiGRULayer with the up-sweep input projection AND the
    latent-memory + output heads inside the kernel (ops.pallas_rnn v3):
    the kernel streams x [B, L, nx] in and (out [B, L, ny],
    mem [B, L, nh_mem]) out instead of materializing the [L, B, 3H]
    projection and [L, B, H] down stream in HBM (~3 GB/step at the
    flagship 21,600-column online shapes). Replaces the rnn_up/rnn_down
    pair plus mlp_latent/mlp_output of RNNAutoreg (models.py:461-552)
    when the memory width differs from the RNN width."""

    hidden: int
    nh_mem: int
    ny: int
    # >0: additionally fuse the initial MLP (tanh Dense of width
    # init_width) and the memory concat into the kernel (v4); the layer
    # is then called as (feat, h0_up, h0_dn, mem) with raw features
    init_width: int = 0
    block_b: Any = None
    acc32: bool = True
    # v5 channel-major only: run the sweep input projections as a
    # separate non-dependent phase into VMEM scratch (default on; the
    # hoisted kernel stores its xp scratch in the input dtype, a ~1e-3
    # relative change in bf16 — pin False to isolate bf16 drift,
    # ADVICE r4)
    hoist_proj: bool = True
    force_reference: bool = False
    # True: CHANNEL-MAJOR contract — x arrives [L, CX, B] and
    # (out [L, ny, B], mem [L, nh_mem, B]) return channel-major (h0s
    # stay [B, H]; last_h returns [B, H]). On TPU a narrow [., ., c<128]
    # array is 128-lane padded, so batch-major narrow activations cost
    # ~20x their logical bytes at every producer/consumer; channel-major
    # puts the big batch dim on the lanes with zero padding (the v5
    # kernel, ops.pallas_rnn.fused_bigru_heads_cm). With init_width > 0
    # the v6 kernel additionally evaluates the initial MLP in VMEM from
    # raw features [L, nf, B] (fused_bigru_heads_init_cm) — the thin
    # feature input lets the lane tile grow, and the [L, H, B] init
    # stream never exists in HBM.
    level_major: bool = False

    @nn.compact
    def __call__(self, x, h0_up, h0_dn, mem=None):
        from ..ops.pallas_rnn import (fused_bigru_heads_lbh,
                                      fused_bigru_heads_init_lbh,
                                      fused_bigru_heads_cm,
                                      _heads_compose, _heads_init_compose,
                                      _heads_cm_compose)

        H = self.hidden
        if self.level_major:
            # channel-major: x [L, CH, B] is the init-MLP stream (or the
            # RAW features when init_width > 0 — the v6 kernel evaluates
            # the initial MLP in VMEM) and mem [L, nm_in, B] stays a
            # SEPARATE kernel input (split up projection); win1 keeps
            # the concatenated [CH+nm_in, 3H] shape so the param tree
            # matches the batch-major model
            if self.init_width > 0:
                nx = x.shape[1]
            else:
                nx = x.shape[1] + (mem.shape[1] if mem is not None else 0)
        else:
            nx = x.shape[-1]
        init = nn.initializers.lecun_normal()
        zeros = nn.initializers.zeros
        use_init = self.init_width > 0 and mem is not None
        if use_init:
            w_init = self.param("w_init", init, (nx, self.init_width),
                                jnp.float32)
            b_init = self.param("b_init", zeros, (self.init_width,),
                                jnp.float32)
            nx_up = self.init_width + (mem.shape[1] if self.level_major
                                       else mem.shape[-1])
        else:
            nx_up = nx
        win1 = self.param("win1", init, (nx_up, 3 * H), jnp.float32)
        bin1 = self.param("bin1", zeros, (3 * H,), jnp.float32)
        whh_up = self.param("whh_up", init, (H, 3 * H), jnp.float32)
        bhh_up = self.param("bhh_up", zeros, (3 * H,), jnp.float32)
        win2 = self.param("win2", init, (H, 3 * H), jnp.float32)
        bin2 = self.param("bin2", zeros, (3 * H,), jnp.float32)
        whh_dn = self.param("whh_dn", init, (H, 3 * H), jnp.float32)
        bhh_dn = self.param("bhh_dn", zeros, (3 * H,), jnp.float32)
        wlat = self.param("wlat", init, (H, self.nh_mem), jnp.float32)
        blat = self.param("blat", zeros, (self.nh_mem,), jnp.float32)
        wout = self.param("wout", init, (self.nh_mem, self.ny),
                          jnp.float32)
        bout = self.param("bout", zeros, (self.ny,), jnp.float32)

        dt = x.dtype
        a = lambda t: t.astype(dt)
        from ..ops import on_tpu
        use_kernel = (not self.force_reference) and on_tpu()
        if self.level_major:
            # channel-major v5/v6: pre-transposed weights, [ch, 1]
            # biases, split up projection (win1 rows CH | nm_in)
            from ..ops.pallas_rnn import (fused_bigru_heads_init_cm,
                                          _heads_init_cm_compose)
            tw = lambda t: a(t).T
            tb = lambda t: a(t)[:, None]
            CH = self.init_width if use_init else x.shape[1]
            mem_in = a(mem) if mem is not None else \
                jnp.zeros((x.shape[0], 0, x.shape[2]), x.dtype)
            args = (x, mem_in, a(h0_up).T, a(h0_dn).T,
                    tw(win1[:CH]), tw(win1[CH:]), tb(bin1),
                    tw(whh_up), tb(bhh_up), tw(win2), tb(bin2),
                    tw(whh_dn), tb(bhh_dn), tw(wlat), tb(blat),
                    tw(wout), tb(bout))
            if use_init:
                # v6: raw features in, initial MLP inside the kernel
                args = args[:4] + (tw(w_init), tb(b_init)) + args[4:]
                op, ref = fused_bigru_heads_init_cm, _heads_init_cm_compose
                extra = ()
            else:
                op, ref = fused_bigru_heads_cm, _heads_cm_compose
                extra = (self.hoist_proj,)   # v5-only knob
            if use_kernel:
                outmem, lasth = op(*args, self.block_b, False, self.acc32,
                                   *extra)
            else:
                outmem, lasth = ref(*args, self.block_b, False,
                                    self.acc32, False)
            nm = self.nh_mem
            return outmem[:, nm:, :], outmem[:, :nm, :], lasth.T
        lm = lambda t: jnp.swapaxes(t, 0, 1)
        w_args = (a(win1), a(bin1), a(whh_up), a(bhh_up), a(win2),
                  a(bin2), a(whh_dn), a(bhh_dn), a(wlat), a(blat),
                  a(wout), a(bout))
        if use_init:
            args = (lm(x), lm(a(mem)),
                    a(h0_up), a(h0_dn), a(w_init), a(b_init)) + w_args
            if use_kernel:
                out, mem_o, lasth = fused_bigru_heads_init_lbh(
                    *args, self.block_b, False, self.acc32)
            else:
                out, mem_o, lasth = _heads_init_compose(
                    *args, self.block_b, False, self.acc32, False)
        else:
            args = (lm(x), a(h0_up), a(h0_dn)) + w_args
            if use_kernel:
                out, mem_o, lasth = fused_bigru_heads_lbh(
                    *args, self.block_b, False, self.acc32)
            else:
                out, mem_o, lasth = _heads_compose(
                    *args, self.block_b, False, self.acc32, False)
        return (lm(out), lm(mem_o), lasth)


class GLU(nn.Module):
    """S4-style GLU block (models_torch_kernels.py:1329-1355): optional
    pre-LayerNorm -> dropout(GELU(x)) -> Linear(features ->
    expand_factor*features) -> gated split h1 * sigmoid(h2). With
    ``block=False`` only the gating op itself runs (two-Dense split — the
    same partitioned matmul)."""

    features: int
    block: bool = False
    layernorm: bool = True
    expand_factor: int = 2
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.block:
            if self.layernorm:
                # the reference LayerNorm((nseq, nneur)) normalizes over
                # BOTH the level and feature axes jointly
                x = nn.LayerNorm(reduction_axes=(-2, -1),
                                 feature_axes=(-2, -1), name="norm")(x)
            # exact (erf) GELU: the torch nn.GELU default
            x = nn.Dropout(self.dropout, deterministic=deterministic)(
                nn.gelu(x, approximate=False))
            h = nn.Dense(self.expand_factor * self.features,
                         name="expand")(x)
            a, b = jnp.split(h, 2, axis=-1)
            return a * jax.nn.sigmoid(b)
        a = nn.Dense(self.features, name="lin")(x)
        b = nn.Dense(self.features, name="gate")(x)
        return a * jax.nn.sigmoid(b)


class QRNNLayer(nn.Module):
    """Quasi-RNN over the level axis (models_torch_kernels.py:1358-1546):
    a (causal or centered) convolution produces (z, f, o) gate streams, and
    the only recurrence is the elementwise fo-pooling
        c_l = f_l * c_{l-1} + (1 - f_l) * z_l,  h_l = o_l * c_l
    — all matmuls hoisted, the scan body is pure VPU work.
    x [B, L, nx] -> (h [B, L, hidden], c_last [B, hidden])."""

    hidden: int
    kernel: int = 2
    causal: bool = True
    reverse: bool = False
    # candidate activation: the reference uses SIGMOID for z
    # (log_z = logsigmoid(raw_z), models_torch_kernels.py:1404) — not the
    # original QRNN paper's tanh, which stays available as an option
    z_activation: str = "sigmoid"
    # fo-pooling is a first-order LINEAR recurrence c_l = f_l*c_{l-1} +
    # (1-f_l)*z_l, so it admits a parallel prefix (associative_scan,
    # log2(L) whole-tensor steps). Measured on the v5e it LOSES to the
    # sequential scan at every tested batch (280k vs 798k cols/s at
    # B=6144, 1.22M vs 1.34M at B=384): the prefix combine rereads the
    # full [L,B,H] tensor per step, so it is HBM-traffic-bound where the
    # scan writes each output once (PERFORMANCE.md). Kept as an option;
    # sequential is the default.
    assoc: bool = False
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, c0=None):
        B, L, _ = x.shape
        if self.causal:
            # pad so position l sees levels [l-kernel+1 .. l] (flip for
            # reverse scans so causality follows scan direction)
            if self.reverse:
                x_p = jnp.pad(x, ((0, 0), (0, self.kernel - 1), (0, 0)))
            else:
                x_p = jnp.pad(x, ((0, 0), (self.kernel - 1, 0), (0, 0)))
            pad = "VALID"
        else:
            x_p, pad = x, "SAME"
        gates = nn.Conv(3 * self.hidden, (self.kernel,), padding=pad,
                        dtype=self.dtype, param_dtype=self.param_dtype,
                        name="conv")(x_p)
        z, f, o = jnp.split(jnp.swapaxes(gates, 0, 1), 3, axis=-1)
        z = {"sigmoid": jax.nn.sigmoid,
             "tanh": jnp.tanh}[self.z_activation](z)
        f = jax.nn.sigmoid(f)
        o = jax.nn.sigmoid(o)

        c0 = jnp.zeros((B, self.hidden), gates.dtype) if c0 is None \
            else c0.astype(gates.dtype)

        if self.assoc:
            # compose affine maps c -> f*c + g: (fa,ga) then (fb,gb) gives
            # (fa*fb, gb + fb*ga); prefix-combine yields c_l = F_l*c0 + G_l
            g = (1.0 - f) * z

            def combine(a, b):
                fa, ga = a
                fb, gb = b
                return fa * fb, gb + fb * ga

            F, G = jax.lax.associative_scan(combine, (f, g), axis=0,
                                            reverse=self.reverse)
            cs = F * c0[None] + G
            c_last = cs[0] if self.reverse else cs[-1]
        else:
            def body(c, inp):
                zl, fl = inp
                c = fl * c + (1.0 - fl) * zl
                return c, c

            c_last, cs = jax.lax.scan(body, c0, (z, f),
                                      reverse=self.reverse)
        h = o * cs
        return jnp.swapaxes(h, 0, 1), c_last
