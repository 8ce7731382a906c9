"""Int8 quantized serving path for the flagship emulator.

The v5e MXU runs int8 x int8 -> int32 at twice the bf16 FLOP rate, so a
weight+activation quantized forward is the speed-of-light serving
configuration when accuracy allows. This module provides:

* :func:`quantize_params` — per-output-channel symmetric int8 weight
  quantization of every 2-D kernel in a parameter tree (biases and
  non-matmul parameters stay float).
* :func:`qdot` — dynamic per-tensor activation quantization + int8
  ``dot_general`` with int32 accumulation, rescaled to float.
* :class:`QuantGRUForward` — an int8 forward for the memory-BiGRU
  emulator (RNNAutoreg-compatible parameter tree): hoisted input
  projections and the recurrent 3H matmuls all run int8; gates/carries
  stay bf16 on the VPU.

The reference has no quantized path (TorchScript fp32/amp only) — this
is a TPU-native serving addition. Accuracy is characterized by
tests/test_infra.py::test_quantized_forward_accuracy.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _quant_kernel(k: jnp.ndarray):
    """Per-output-channel symmetric int8: k [in, out] -> (q int8, scale
    [out] f32)."""
    amax = jnp.max(jnp.abs(k), axis=0)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(k / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def quantize_params(params):
    """Quantize every rank-2 'kernel' leaf; returns a tree of
    {'q','scale'} dicts in place of kernels, other leaves unchanged."""
    def walk(p):
        if isinstance(p, dict):
            out = {}
            for k, v in p.items():
                if k == "kernel" and getattr(v, "ndim", 0) == 2:
                    q, s = _quant_kernel(v)
                    out[k] = {"q": q, "scale": s}
                else:
                    out[k] = walk(v)
            return out
        return p
    return walk(params)


def qdot(x: jnp.ndarray, qk: dict, bias=None):
    """Dynamic per-tensor activation int8 quantization + int8 matmul.

    x [..., in] float; qk {'q' int8 [in, out], 'scale' [out]}.
    """
    xmax = jnp.maximum(jnp.max(jnp.abs(x)), 1e-12)
    xs = xmax / 127.0
    xq = jnp.clip(jnp.round(x / xs), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, qk["q"], (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (xs * qk["scale"])
    if bias is not None:
        out = out + bias
    return out


class QuantGRUForward:
    """Int8 forward for an RNNAutoreg parameter tree (gru cell, no
    stochastic layer / separate radiation). Mirrors the model's compute
    graph; all big matmuls go through :func:`qdot`."""

    def __init__(self, model, params):
        self.model = model
        self.p = params["params"]
        self.qp = quantize_params(params)["params"]

    def _dense(self, name, x):
        qk = self.qp[name]["kernel"]
        b = self.p[name].get("bias")
        return qdot(x, qk, b)

    def _gru_sweep(self, layer, xs, h0, reverse):
        """Hoisted int8 input projection + scan of int8 recurrent GRU."""
        proj = self._dense_path((layer, "input_proj"), xs)
        whh = self.qp[layer]["cell"]["hh"]["kernel"]
        bhh = self.p[layer]["cell"]["hh"].get("bias")
        H = h0.shape[-1]

        def step(h, xp):
            hh = qdot(h, whh, bhh)
            rx, zx, nx_ = jnp.split(xp, 3, -1)
            rh, zh, nh_ = jnp.split(hh, 3, -1)
            r = jax.nn.sigmoid(rx + rh)
            z = jax.nn.sigmoid(zx + zh)
            n = jnp.tanh(nx_ + r * nh_)
            h = (1.0 - z) * n + z * h
            return h, h

        xp = jnp.swapaxes(proj, 0, 1)
        h_last, hs = jax.lax.scan(step, h0, xp, reverse=reverse)
        return jnp.swapaxes(hs, 0, 1), h_last

    def _dense_path(self, path, x):
        node_q, node_p = self.qp, self.p
        for k in path:
            node_q = node_q[k]
            node_p = node_p[k]
        return qdot(x, node_q["kernel"], node_p.get("bias"))

    def __call__(self, x_main, x_sfc, mem):
        m = self.model
        L = x_main.shape[1]
        feats = x_main
        if m.add_pres:
            hyam = jnp.asarray(m.hyam, x_main.dtype)
            hybm = jnp.asarray(m.hybm, x_main.dtype)
            sp = x_sfc[:, 0] * m.sp_div + m.sp_mean
            pres = (1e5 * hyam + sp[:, None] * hybm)
            feats = jnp.concatenate(
                [feats, (jnp.sqrt(pres) / 314.0)[..., None]], axis=-1)
        h = jnp.tanh(self._dense("mlp_initial", feats)) \
            if m.use_initial_mlp else feats
        h = jnp.concatenate([h, mem], axis=-1)
        hx1 = jnp.tanh(self._dense("mlp_surface1", x_sfc))
        up, _ = self._gru_sweep("rnn_up", h, hx1, reverse=True)
        x_toa = jnp.concatenate([x_sfc[:, 1:2], x_sfc[:, 6:7]], axis=1)
        hx2 = self._dense("mlp_toa1", x_toa)
        down, last_h = self._gru_sweep("rnn_down", up, hx2, reverse=False)
        if "mlp_latent" in self.p:
            new_mem = self._dense("mlp_latent", down)
        else:
            new_mem = down
        out = self._dense("mlp_output", new_mem)
        out_sfc = self._dense("mlp_surface_output", last_h)
        if m.output_prune:
            mask = np.ones((1, L, m.ny), np.float32)
            mask[:, :12, 1:] = 0.0
            out = out * jnp.asarray(mask, out.dtype)
        return out, out_sfc, new_mem
