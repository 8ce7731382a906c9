"""NCP/CfC (liquid networks) tests: wiring parity with the reference's
RandomState construction, cell semantics, scan training."""
import sys

import jax
import jax.numpy as jnp
import numpy as np

from climsim_tpu.models import ncp

K = jax.random.key


def test_ncp_wiring_parity_vs_reference():
    """Same seed -> bit-identical adjacency matrices to the reference's
    NCP builder (rnn/ncp.py:299-505)."""
    sys.path.insert(0, "/root/reference/rnn")
    import ncp as ref_ncp

    for seed in (22222, 7):
        ours = ncp.NCP(inter_neurons=12, command_neurons=8,
                       motor_neurons=4, sensory_fanout=4, inter_fanout=4,
                       recurrent_command_synapses=6, motor_fanin=4,
                       seed=seed)
        ours.build(10)
        ref = ref_ncp.NCP(inter_neurons=12, command_neurons=8,
                          motor_neurons=4, sensory_fanout=4,
                          inter_fanout=4, recurrent_command_synapses=6,
                          motor_fanin=4, seed=seed)
        ref.build(10)
        np.testing.assert_array_equal(ours.adjacency_matrix,
                                      ref.adjacency_matrix)
        np.testing.assert_array_equal(ours.sensory_adjacency_matrix,
                                      ref.sensory_adjacency_matrix)


def test_autoncp_parity_vs_reference():
    sys.path.insert(0, "/root/reference/rnn")
    import ncp as ref_ncp

    ours = ncp.AutoNCP(28, 6, sparsity_level=0.5, seed=3)
    ours.build(9)
    ref = ref_ncp.AutoNCP(28, 6, sparsity_level=0.5, seed=3)
    ref.build(9)
    np.testing.assert_array_equal(ours.adjacency_matrix,
                                  ref.adjacency_matrix)
    np.testing.assert_array_equal(ours.sensory_adjacency_matrix,
                                  ref.sensory_adjacency_matrix)
    assert ours.synapse_count == np.sum(np.abs(ref.adjacency_matrix))


def test_wiring_config_roundtrip():
    w = ncp.AutoNCP(20, 4, seed=1)
    w.build(5)
    w2 = ncp.Wiring.from_config(w.get_config())
    np.testing.assert_array_equal(w.adjacency_matrix, w2.adjacency_matrix)
    assert w2.input_dim == 5 and w2.output_dim == 4


def test_cfc_cell_modes():
    """All three CfC modes produce finite [B,H] states; 'pure' differs
    from 'default'."""
    B, nx, H = 4, 7, 16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (B, nx)).astype(np.float32))
    h = jnp.zeros((B, H))
    outs = {}
    for mode in ("default", "pure", "no_gate"):
        cell = ncp.CfCCell(hidden_size=H, mode=mode)
        p = cell.init(K(0), x, h)
        out, new_h = cell.apply(p, x, h)
        assert out.shape == (B, H)
        assert np.isfinite(np.asarray(out)).all()
        outs[mode] = np.asarray(out)
    assert not np.allclose(outs["default"], outs["pure"])


def test_cfc_cell_timespan_dependence():
    """ts enters the gate: different timespans -> different states."""
    B, nx, H = 3, 5, 8
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (B, nx)).astype(np.float32))
    h = jnp.asarray(rng.normal(0, 1, (B, H)).astype(np.float32))
    cell = ncp.CfCCell(hidden_size=H)
    p = cell.init(K(0), x, h)
    o1, _ = cell.apply(p, x, h, 1.0)
    o2, _ = cell.apply(p, x, h, 0.1)
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_wired_cell_respects_sparsity():
    """Zeroed synapses carry no gradient: d output / d masked-out input
    weight is exactly zero (mask multiplies the kernel)."""
    w = ncp.AutoNCP(24, 4, seed=5)
    cell = ncp.WiredCfCCell.from_wiring(w, input_size=6)
    B = 2
    x = jnp.ones((B, 6))
    h = jnp.ones((B, cell.state_size))
    p = cell.init(K(0), x, h)

    def loss(p):
        out, nh = cell.apply(p, x, h)
        return jnp.sum(out ** 2) + jnp.sum(nh ** 2)

    g = jax.grad(loss)(p)
    mask0 = np.abs(np.asarray(cell.layer_masks[0]))
    g0 = np.asarray(g["params"]["layer_0"]["ff1_kernel"])
    assert np.all(g0[mask0 == 0] == 0.0)
    assert np.any(g0[mask0 == 1] != 0.0)


def test_cfc_sequence_and_training():
    """Dense CfC with mixed memory + projection trains on a toy
    sequence-regression task (loss decreases)."""
    import optax
    B, T, nx = 8, 12, 5
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 1, (B, T, nx)).astype(np.float32))
    y = jnp.asarray(np.cumsum(np.asarray(x)[..., :2], axis=1)
                    .astype(np.float32))
    m = ncp.CfC(units=24, proj_size=2, mixed_memory=True,
                backbone_units=32)
    p = m.init(K(0), x)
    outs, (h, c) = m.apply(p, x)
    assert outs.shape == (B, T, 2) and h.shape == (B, 24)
    opt = optax.adam(1e-2)
    ost = opt.init(p)

    @jax.jit
    def step(p, ost):
        l, g = jax.value_and_grad(
            lambda p: jnp.mean((m.apply(p, x)[0] - y) ** 2))(p)
        up, ost = opt.update(g, ost)
        return optax.apply_updates(p, up), ost, l

    losses = []
    for _ in range(40):
        p, ost, l = step(p, ost)
        losses.append(float(l))
    assert losses[-1] < 0.5 * losses[0]


def test_cfc_wired_sequence():
    """NCP-wired CfC: outputs are motor-sized, runs under jit, grads
    finite."""
    w = ncp.AutoNCP(30, 5, seed=11)
    m = ncp.CfC.wired(w, input_size=7)
    B, T = 4, 9
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (B, T, 7)).astype(np.float32))
    p = m.init(K(0), x)
    outs, h = jax.jit(m.apply)(p, x)
    assert outs.shape == (B, T, 5)
    assert h.shape == (B, 30)
    g = jax.grad(lambda p: jnp.sum(m.apply(p, x)[0] ** 2))(p)
    assert all(np.isfinite(np.asarray(a)).all()
               for a in jax.tree_util.tree_leaves(g))


def test_cfc_return_last():
    m = ncp.CfC(units=10, return_sequences=False, backbone_layers=0)
    x = jnp.ones((2, 6, 3))
    p = m.init(K(0), x)
    out, h = m.apply(p, x)
    assert out.shape == (2, 10)
