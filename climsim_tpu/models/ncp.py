"""Neural Circuit Policies: sparse NCP wirings + Closed-form
Continuous-time (CfC / liquid) cells, TPU-native.

Capability equivalent of the reference's vendored ncps library
(rnn/ncp.py: ``Wiring`` :24, ``NCP`` :299, ``AutoNCP`` :507, ``CfCCell``
:577, ``WiredCfCCell`` :710, ``LSTMCell`` :809, ``CfC`` :847 — legacy /
not wired into the reference trainer, carried here for parity).

TPU-native design notes:

* Wirings are built host-side with numpy (identical RandomState call
  sequence to the reference, so the adjacency matrices are bit-identical
  for the same seed) and baked into the compiled program as constant
  sparsity masks — on the MXU a masked dense matmul beats any scatter
  formulation at these sizes.
* The sequence loop is ``nn.scan`` (single compiled level/time scan),
  not a Python loop.
* Cells are flax modules usable standalone or through
  :class:`CfC`, which mirrors the reference's module surface
  (mixed_memory LSTM, proj head, return_sequences, timespans).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# Wirings (host-side numpy; construction parity with rnn/ncp.py)
# --------------------------------------------------------------------------

class Wiring:
    """Sparse synapse bookkeeping: adjacency [units, units] and sensory
    adjacency [input_dim, units] with ±1 polarities (rnn/ncp.py:24-138)."""

    def __init__(self, units: int):
        self.units = units
        self.adjacency_matrix = np.zeros([units, units], dtype=np.int32)
        self.sensory_adjacency_matrix: Optional[np.ndarray] = None
        self.input_dim: Optional[int] = None
        self.output_dim: Optional[int] = None

    @property
    def num_layers(self) -> int:
        return 1

    def get_neurons_of_layer(self, layer_id: int):
        return list(range(self.units))

    def is_built(self) -> bool:
        return self.input_dim is not None

    def build(self, input_dim: int) -> None:
        if self.input_dim is not None and self.input_dim != input_dim:
            raise ValueError(
                f"Conflicting input dimensions: built with {self.input_dim}"
                f", got {input_dim}")
        if self.input_dim is None:
            self.set_input_dim(input_dim)

    def erev_initializer(self, shape=None, dtype=None) -> np.ndarray:
        return np.copy(self.adjacency_matrix)

    def sensory_erev_initializer(self, shape=None, dtype=None) -> np.ndarray:
        return np.copy(self.sensory_adjacency_matrix)

    def set_input_dim(self, input_dim: int) -> None:
        self.input_dim = input_dim
        self.sensory_adjacency_matrix = np.zeros(
            [input_dim, self.units], dtype=np.int32)

    def set_output_dim(self, output_dim: int) -> None:
        self.output_dim = output_dim

    def get_type_of_neuron(self, neuron_id: int) -> str:
        return "motor" if neuron_id < self.output_dim else "inter"

    def add_synapse(self, src: int, dest: int, polarity: int) -> None:
        if not (0 <= src < self.units and 0 <= dest < self.units):
            raise ValueError(f"synapse {src}->{dest} out of range "
                             f"(units={self.units})")
        if polarity not in (-1, 1):
            raise ValueError(f"polarity must be ±1, got {polarity}")
        self.adjacency_matrix[src, dest] = polarity

    def add_sensory_synapse(self, src: int, dest: int,
                            polarity: int) -> None:
        if self.input_dim is None:
            raise ValueError("call build() before adding sensory synapses")
        if not (0 <= src < self.input_dim and 0 <= dest < self.units):
            raise ValueError(f"sensory synapse {src}->{dest} out of range")
        if polarity not in (-1, 1):
            raise ValueError(f"polarity must be ±1, got {polarity}")
        self.sensory_adjacency_matrix[src, dest] = polarity

    @property
    def synapse_count(self) -> int:
        return int(np.sum(np.abs(self.adjacency_matrix)))

    @property
    def sensory_synapse_count(self) -> int:
        return int(np.sum(np.abs(self.sensory_adjacency_matrix)))

    def get_config(self) -> dict:
        return {
            "units": self.units,
            "adjacency_matrix": self.adjacency_matrix.tolist(),
            "sensory_adjacency_matrix":
                None if self.sensory_adjacency_matrix is None
                else self.sensory_adjacency_matrix.tolist(),
            "input_dim": self.input_dim,
            "output_dim": self.output_dim,
        }

    @classmethod
    def from_config(cls, config: dict) -> "Wiring":
        w = Wiring(config["units"])
        w.adjacency_matrix = np.array(config["adjacency_matrix"],
                                      dtype=np.int32)
        if config["sensory_adjacency_matrix"] is not None:
            w.sensory_adjacency_matrix = np.array(
                config["sensory_adjacency_matrix"], dtype=np.int32)
        w.input_dim = config["input_dim"]
        w.output_dim = config["output_dim"]
        return w


class NCP(Wiring):
    """4-layer sensory→inter→command→motor random sparse wiring
    (rnn/ncp.py:299-505). Same RandomState consumption order as the
    reference, so identical seeds give identical wirings."""

    def __init__(self, inter_neurons: int, command_neurons: int,
                 motor_neurons: int, sensory_fanout: int, inter_fanout: int,
                 recurrent_command_synapses: int, motor_fanin: int,
                 seed: int = 22222):
        super().__init__(inter_neurons + command_neurons + motor_neurons)
        self.set_output_dim(motor_neurons)
        self._rng = np.random.RandomState(seed)
        self._num_inter_neurons = inter_neurons
        self._num_command_neurons = command_neurons
        self._num_motor_neurons = motor_neurons
        self._sensory_fanout = sensory_fanout
        self._inter_fanout = inter_fanout
        self._recurrent_command_synapses = recurrent_command_synapses
        self._motor_fanin = motor_fanin

        # neuron IDs: [motor..., command..., inter...]
        self._motor_ids = list(range(motor_neurons))
        self._command_ids = list(range(motor_neurons,
                                       motor_neurons + command_neurons))
        self._inter_ids = list(range(
            motor_neurons + command_neurons,
            motor_neurons + command_neurons + inter_neurons))

        if motor_fanin > command_neurons:
            raise ValueError(f"motor_fanin {motor_fanin} > "
                             f"{command_neurons} command neurons")
        if sensory_fanout > inter_neurons:
            raise ValueError(f"sensory_fanout {sensory_fanout} > "
                             f"{inter_neurons} inter neurons")
        if inter_fanout > command_neurons:
            raise ValueError(f"inter_fanout {inter_fanout} > "
                             f"{command_neurons} command neurons")

    @property
    def num_layers(self) -> int:
        return 3

    def get_neurons_of_layer(self, layer_id: int):
        return [self._inter_ids, self._command_ids,
                self._motor_ids][layer_id]

    def get_type_of_neuron(self, neuron_id: int) -> str:
        if neuron_id < self._num_motor_neurons:
            return "motor"
        if neuron_id < self._num_motor_neurons + self._num_command_neurons:
            return "command"
        return "inter"

    def _connect_layer(self, srcs, dests, fanout, sensory: bool) -> None:
        """Fan each src out to `fanout` random dests, then reconnect any
        dest left unreached (ncp.py:393-446,455-479)."""
        add = self.add_sensory_synapse if sensory else self.add_synapse
        unreachable = list(dests)
        for src in srcs:
            for dest in self._rng.choice(dests, size=fanout, replace=False):
                if dest in unreachable:
                    unreachable.remove(dest)
                polarity = self._rng.choice([-1, 1])
                add(src, int(dest), int(polarity))
        mean_fanin = int(np.clip(len(srcs) * fanout / len(dests),
                                 1, len(srcs)))
        for dest in unreachable:
            for src in self._rng.choice(srcs, size=mean_fanin,
                                        replace=False):
                polarity = self._rng.choice([-1, 1])
                add(int(src), dest, int(polarity))

    def build(self, input_dim: int) -> None:
        super().build(input_dim)
        self._sensory_ids = list(range(self.input_dim))
        # sensory -> inter (reconnect clips fanin at num_sensory)
        self._connect_layer(self._sensory_ids, self._inter_ids,
                            self._sensory_fanout, sensory=True)
        # inter -> command. NOTE: the reference clips the reconnect fanin
        # at num_command (not num_inter; ncp.py:437-439) — reproduced.
        unreachable = list(self._command_ids)
        for src in self._inter_ids:
            for dest in self._rng.choice(self._command_ids,
                                         size=self._inter_fanout,
                                         replace=False):
                if dest in unreachable:
                    unreachable.remove(dest)
                polarity = self._rng.choice([-1, 1])
                self.add_synapse(src, int(dest), int(polarity))
        mean_fanin = int(np.clip(
            self._num_inter_neurons * self._inter_fanout
            / self._num_command_neurons, 1, self._num_command_neurons))
        for dest in unreachable:
            for src in self._rng.choice(self._inter_ids, size=mean_fanin,
                                        replace=False):
                polarity = self._rng.choice([-1, 1])
                self.add_synapse(int(src), dest, int(polarity))
        # recurrent command synapses
        for _ in range(self._recurrent_command_synapses):
            src = self._rng.choice(self._command_ids)
            dest = self._rng.choice(self._command_ids)
            polarity = self._rng.choice([-1, 1])
            self.add_synapse(int(src), int(dest), int(polarity))
        # command -> motor (fanin per motor; reconnect clips at num_motor)
        unreachable = list(self._command_ids)
        for dest in self._motor_ids:
            for src in self._rng.choice(self._command_ids,
                                        size=self._motor_fanin,
                                        replace=False):
                if src in unreachable:
                    unreachable.remove(src)
                polarity = self._rng.choice([-1, 1])
                self.add_synapse(int(src), dest, int(polarity))
        mean_fanout = int(np.clip(
            self._num_motor_neurons * self._motor_fanin
            / self._num_command_neurons, 1, self._num_motor_neurons))
        for src in unreachable:
            for dest in self._rng.choice(self._motor_ids, size=mean_fanout,
                                         replace=False):
                polarity = self._rng.choice([-1, 1])
                self.add_synapse(src, int(dest), int(polarity))


class AutoNCP(NCP):
    """NCP wiring derived from (units, output_size, sparsity_level)
    (rnn/ncp.py:507-564)."""

    def __init__(self, units: int, output_size: int,
                 sparsity_level: float = 0.5, seed: int = 22222):
        if output_size >= units - 2:
            raise ValueError("output_size must be < units-2")
        if sparsity_level < 0.1 or sparsity_level > 1.0:
            raise ValueError("sparsity_level must be in [0.1, 1.0]")
        density = 1.0 - sparsity_level
        inter_and_command = units - output_size
        command = max(int(0.4 * inter_and_command), 1)
        inter = inter_and_command - command
        super().__init__(
            inter, command, output_size,
            sensory_fanout=max(int(inter * density), 1),
            inter_fanout=max(int(command * density), 1),
            recurrent_command_synapses=max(int(command * density * 2), 1),
            motor_fanin=max(int(command * density), 1),
            seed=seed)


# --------------------------------------------------------------------------
# Cells (flax)
# --------------------------------------------------------------------------

def _lecun_tanh(x):
    return 1.7159 * jnp.tanh(0.666 * x)


_ACTIVATIONS = {
    "lecun_tanh": _lecun_tanh,
    "silu": jax.nn.silu,
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "gelu": jax.nn.gelu,
}


class CfCCell(nn.Module):
    """Closed-form Continuous-time cell (Hasani et al. 2021,
    arXiv:2106.13898; rnn/ncp.py:577-708). Modes: 'default' (gated
    interpolation), 'pure' (direct closed-form solution), 'no_gate'.

    ``sparsity_mask`` (tuple-of-tuples, [in+hidden, hidden]) applies the
    NCP wiring to ff1/ff2 kernels as a constant 0/1 mask — dense masked
    matmul, MXU-friendly.
    """

    hidden_size: int
    mode: str = "default"
    backbone_activation: str = "lecun_tanh"
    backbone_units: int = 128
    backbone_layers: int = 1
    sparsity_mask: Optional[Tuple[Tuple[float, ...], ...]] = None
    dtype: Any = None

    def _masked_dense(self, x, name):
        if self.sparsity_mask is None:
            return nn.Dense(self.hidden_size, dtype=self.dtype,
                            name=name)(x)
        dt = x.dtype if self.dtype is None else self.dtype
        # flax kernel layout [in, out] — mask directly (the reference
        # stores the transpose for torch's [out, in])
        mask = jnp.abs(jnp.asarray(self.sparsity_mask, dt))
        kernel = self.param(f"{name}_kernel",
                            nn.initializers.xavier_uniform(),
                            (x.shape[-1], self.hidden_size))
        bias = self.param(f"{name}_bias", nn.initializers.zeros,
                          (self.hidden_size,))
        return x.astype(dt) @ (kernel.astype(dt) * mask) + bias.astype(dt)

    @nn.compact
    def __call__(self, inputs, hx, ts=1.0):
        """inputs [B, nx], hx [B, H], ts scalar or [B]/[B,1] timespan.
        Returns (output, new_hidden) — both the new hidden state."""
        x = jnp.concatenate([inputs, hx], axis=-1)
        act = _ACTIVATIONS[self.backbone_activation]
        for i in range(self.backbone_layers):
            x = act(nn.Dense(self.backbone_units, dtype=self.dtype,
                             name=f"backbone{i}")(x))
        ts = jnp.asarray(ts, x.dtype)
        if ts.ndim == 1:
            ts = ts[:, None]
        ff1 = self._masked_dense(x, "ff1")
        if self.mode == "pure":
            w_tau = self.param("w_tau", nn.initializers.zeros,
                               (1, self.hidden_size))
            A = self.param("A", nn.initializers.ones,
                           (1, self.hidden_size))
            new_h = -A * jnp.exp(-ts * (jnp.abs(w_tau) + jnp.abs(ff1))) \
                * ff1 + A
        else:
            ff2 = self._masked_dense(x, "ff2")
            ff1 = jnp.tanh(ff1)
            ff2 = jnp.tanh(ff2)
            t_a = nn.Dense(self.hidden_size, dtype=self.dtype,
                           name="time_a")(x)
            t_b = nn.Dense(self.hidden_size, dtype=self.dtype,
                           name="time_b")(x)
            t_interp = jax.nn.sigmoid(t_a * ts + t_b)
            if self.mode == "no_gate":
                new_h = ff1 + t_interp * ff2
            else:
                new_h = ff1 * (1.0 - t_interp) + t_interp * ff2
        return new_h, new_h


class WiredCfCCell(nn.Module):
    """CfC cell over an NCP wiring: one masked CfCCell per wiring layer,
    chained inter→command→motor (rnn/ncp.py:710-807). State is the
    concatenation of all layers' hiddens [B, wiring.units]; output is the
    motor layer [B, output_dim]."""

    layer_sizes: Tuple[int, ...]
    layer_masks: Tuple[Tuple[Tuple[float, ...], ...], ...]
    output_dim: int
    mode: str = "default"
    dtype: Any = None

    @classmethod
    def from_wiring(cls, wiring: Wiring, input_size: Optional[int] = None,
                    mode: str = "default", dtype: Any = None
                    ) -> "WiredCfCCell":
        if input_size is not None:
            wiring.build(input_size)
        if not wiring.is_built():
            raise ValueError("wiring not built: pass input_size")
        sizes, masks = [], []
        for layer in range(wiring.num_layers):
            neurons = wiring.get_neurons_of_layer(layer)
            if layer == 0:
                in_sp = wiring.sensory_adjacency_matrix[:, neurons]
            else:
                prev = wiring.get_neurons_of_layer(layer - 1)
                in_sp = wiring.adjacency_matrix[:, neurons][prev, :]
            in_sp = np.concatenate(
                [in_sp, np.ones((len(neurons), len(neurons)))], axis=0)
            sizes.append(len(neurons))
            masks.append(tuple(tuple(float(v) for v in row)
                               for row in np.abs(in_sp)))
        return cls(layer_sizes=tuple(sizes), layer_masks=tuple(masks),
                   output_dim=int(wiring.output_dim), mode=mode,
                   dtype=dtype)

    @property
    def state_size(self) -> int:
        return sum(self.layer_sizes)

    @nn.compact
    def __call__(self, inputs, hx, ts=1.0):
        splits = np.cumsum(self.layer_sizes)[:-1]
        h_states = jnp.split(hx, splits, axis=-1)
        new_h = []
        h = inputs
        for i, (size, mask) in enumerate(zip(self.layer_sizes,
                                             self.layer_masks)):
            h, _ = CfCCell(hidden_size=size, mode=self.mode,
                           backbone_layers=0, sparsity_mask=mask,
                           dtype=self.dtype,
                           name=f"layer_{i}")(h, h_states[i], ts)
            new_h.append(h)
        return h, jnp.concatenate(new_h, axis=-1)


class MixedMemoryLSTMCell(nn.Module):
    """The auxiliary LSTM of CfC(mixed_memory=True)
    (rnn/ncp.py:809-846): forget-gate bias +1, tanh cell output."""

    hidden_size: int
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs, states):
        h, c = states
        z = nn.Dense(4 * self.hidden_size, dtype=self.dtype,
                     name="input_map")(inputs) \
            + nn.Dense(4 * self.hidden_size, use_bias=False,
                       dtype=self.dtype, name="recurrent_map")(h)
        i, ig, fg, og = jnp.split(z, 4, axis=-1)
        new_c = c * jax.nn.sigmoid(fg + 1.0) \
            + jnp.tanh(i) * jax.nn.sigmoid(ig)
        new_h = jnp.tanh(new_c) * jax.nn.sigmoid(og)
        return new_h, new_c


class CfC(nn.Module):
    """CfC sequence model (rnn/ncp.py:847-1010): dense or NCP-wired cell,
    optional mixed LSTM memory and projection head, scanned over the
    sequence axis with ``nn.scan`` (single compiled loop).

    Call: ``(x [B, T, nx], hx=None, timespans=None)`` →
    ``(outputs, final_state)`` where outputs is [B, T, out] if
    return_sequences else [B, out]; state is h or (h, c) with
    mixed_memory.
    """

    units: int                           # total state size
    # wired mode: (layer_sizes, layer_masks, output_dim, mode) — hashable
    wiring: Optional[Tuple[Tuple[int, ...], Any, int, str]] = None
    proj_size: Optional[int] = None
    return_sequences: bool = True
    mixed_memory: bool = False
    mode: str = "default"
    activation: str = "lecun_tanh"
    backbone_units: int = 128
    backbone_layers: int = 1
    dtype: Any = None

    @classmethod
    def wired(cls, wiring: Wiring, input_size: int, **kw) -> "CfC":
        """Construct from a (possibly unbuilt) NCP wiring."""
        cell = WiredCfCCell.from_wiring(wiring, input_size,
                                        mode=kw.pop("mode", "default"))
        return cls(units=cell.state_size,
                   wiring=(cell.layer_sizes, cell.layer_masks,
                           cell.output_dim, cell.mode), **kw)

    @property
    def state_size(self) -> int:
        return self.units

    @nn.compact
    def __call__(self, x, hx=None, timespans=None):
        B, T, _ = x.shape
        dt = x.dtype
        if hx is None:
            h0 = jnp.zeros((B, self.units), dt)
            c0 = jnp.zeros((B, self.units), dt) if self.mixed_memory \
                else None
        else:
            h0, c0 = hx if self.mixed_memory else (hx, None)

        if self.wiring is not None:
            sizes, masks, out_dim, wmode = self.wiring
            cell = WiredCfCCell(
                layer_sizes=tuple(sizes), layer_masks=tuple(masks),
                output_dim=out_dim, mode=wmode,
                dtype=self.dtype, name="cell")
        else:
            cell = CfCCell(hidden_size=self.units, mode=self.mode,
                           backbone_activation=self.activation,
                           backbone_units=self.backbone_units,
                           backbone_layers=self.backbone_layers,
                           dtype=self.dtype, name="cell")
        lstm = MixedMemoryLSTMCell(self.units, dtype=self.dtype,
                                   name="lstm") if self.mixed_memory \
            else None
        proj = nn.Dense(self.proj_size, dtype=self.dtype, name="fc") \
            if self.proj_size is not None else None

        ts = timespans if timespans is not None \
            else jnp.ones((B, T), dt)

        def step(mdl_unused, carry, inp):
            del mdl_unused
            h, c = carry
            x_t, ts_t = inp
            if lstm is not None:
                h, c = lstm(x_t, (h, c))
            out, h = cell(x_t, h, ts_t)
            if proj is not None:
                out = proj(out)
            return (h, c), out

        scan = nn.scan(step, variable_broadcast="params",
                       split_rngs={"params": False},
                       in_axes=1, out_axes=1)
        (h_f, c_f), outs = scan(self, (h0, c0 if c0 is not None
                                       else jnp.zeros((B, 0), dt)),
                                (x, ts))
        final = (h_f, c_f) if self.mixed_memory else h_f
        if self.return_sequences:
            return outs, final
        return outs[:, -1], final
