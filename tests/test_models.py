"""Model-zoo tests: shapes, gradients, stochastic sampling, and a small
learning check per family (SURVEY.md §2.4 parity)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from climsim_tpu.models import (MLP, mlp_for, CNN, ED, HSR, hsr_nll,
                                hsr_sample, RPNEnsemble, CVAE, cvae_loss,
                                cvae_samples, reshape_input_for_cnn,
                                reshape_target_from_cnn)
from climsim_tpu import variables as V

K = jax.random.PRNGKey


def test_mlp_shapes_and_relu_head():
    vs = V.get("v1")
    m = mlp_for(vs, features=(64, 64))
    x = jax.random.normal(K(0), (8, 124))
    p = m.init(K(1), x)
    y = m.apply(p, x)
    assert y.shape == (8, 128)
    assert np.all(np.asarray(y[:, -8:]) >= 0)  # ReLU scalar head


def test_mlp_prune_mask():
    vs = V.get("v2")
    m = mlp_for(vs, features=(32,), prune=True)
    x = jax.random.normal(K(0), (4, 557))
    y = np.asarray(m.apply(m.init(K(1), x), x))
    # stratosphere (top 12 levels) of ptend_q0001 (block 60:120) zeroed
    assert np.all(y[:, 60:72] == 0)
    # ptend_t untouched by prune
    assert np.any(y[:, 0:12] != 0)


def test_cnn_reshapes_roundtrip_contract():
    x = jax.random.normal(K(0), (4, 124))
    img = reshape_input_for_cnn(x)
    assert img.shape == (4, 60, 6)
    np.testing.assert_array_equal(np.asarray(img[:, :, 0]), np.asarray(x[:, :60]))
    np.testing.assert_array_equal(np.asarray(img[:, 7, 2]), np.asarray(x[:, 120]))
    yimg = jax.random.normal(K(1), (4, 60, 10))
    yflat = reshape_target_from_cnn(yimg)
    assert yflat.shape == (4, 128)
    np.testing.assert_allclose(np.asarray(yflat[:, 120]),
                               np.asarray(yimg[:, :, 2].mean(1)), rtol=1e-6)


def test_cnn_forward():
    m = CNN(depth=2, channels=32)
    x = jax.random.normal(K(0), (4, 124))
    p = m.init(K(1), x)
    y = m.apply(p, x)
    assert y.shape == (4, 128)
    assert np.all(np.asarray(y[:, 120:]) >= 0)


def test_ed_forward():
    m = ED(out_dim=128, latent_dim=5, intermediate_dim=64)
    x = jax.random.normal(K(0), (4, 124))
    y = m.apply(m.init(K(1), x), x)
    assert y.shape == (4, 128)
    assert np.all(np.asarray(y) >= -1.0)  # elu lower bound


def test_hsr_loss_and_sampling():
    m = HSR(out_dim=16, hidden=32, layers=1)
    x = jax.random.normal(K(0), (8, 10))
    y = jax.random.normal(K(1), (8, 16))
    p = m.init(K(2), x)
    mean, logprec = m.apply(p, x)
    assert mean.shape == (8, 16) and logprec.shape == (8, 16)
    l_warm = hsr_nll(mean, logprec, y, warm=True)
    l_full = hsr_nll(mean, logprec, y, warm=False)
    assert np.isfinite(float(l_warm)) and np.isfinite(float(l_full))
    s = hsr_sample(p, m, x, K(3), num_samples=5)
    assert s.shape == (8, 16, 5)
    # grads flow through both towers
    g = jax.grad(lambda p: hsr_nll(*m.apply(p, x), y))(p)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(a)).all() for a in flat)


def test_rpn_ensemble():
    ens = RPNEnsemble(out_dim=16, features=(32, 32), num_members=4)
    x = jax.random.normal(K(0), (8, 10))
    y = jax.random.normal(K(1), (8, 16))
    p = ens.init(K(2), x)
    preds = ens.apply(p, x)
    assert preds.shape == (4, 8, 16)
    # members differ (random priors)
    assert float(jnp.std(preds, axis=0).mean()) > 1e-4
    # prior params receive zero gradient (stop_gradient)
    g = jax.grad(ens.loss)(p, x, y)
    prior_norm = sum(float(jnp.abs(a).sum())
                     for a in jax.tree_util.tree_leaves(g["prior"]))
    net_norm = sum(float(jnp.abs(a).sum())
                   for a in jax.tree_util.tree_leaves(g["net"]))
    assert prior_norm == 0.0 and net_norm > 0.0
    s = ens.samples(p, x)
    assert s.shape == (8, 16, 4)


def test_cvae_loss_and_samples():
    m = CVAE(out_dim=16, latent_dim=3, hidden=32, layers=1)
    x = jax.random.normal(K(0), (8, 10))
    y = jax.random.normal(K(1), (8, 16))
    p = m.init(K(2), y, x, K(3))
    loss = cvae_loss(m, p, y, x, K(4), beta=1.0)
    assert np.isfinite(float(loss))
    s = cvae_samples(m, p, x, K(5), num_samples=6)
    assert s.shape == (8, 16, 6)
    assert float(jnp.std(s, axis=-1).mean()) > 1e-5


@pytest.mark.parametrize("maker", [
    lambda: ("mlp", mlp_for(V.get("v1"), features=(64, 64))),
    lambda: ("cnn", CNN(depth=1, channels=16)),
    lambda: ("ed", ED(out_dim=128, latent_dim=32, intermediate_dim=64)),
])
def test_family_learns(maker):
    """Each deterministic family fits a small synthetic mapping."""
    name, m = maker()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (256, 124)).astype(np.float32))
    w = rng.normal(0, 0.2, (124, 128)).astype(np.float32)
    y = jnp.asarray(np.tanh(np.asarray(x) @ w))
    p = m.init(K(0), x[:2])
    tx = optax.adam(1e-3)
    st = tx.init(p)

    @jax.jit
    def step(p, st):
        def lf(p):
            return jnp.mean(jnp.square(m.apply(p, x) - y))
        l, g = jax.value_and_grad(lf)(p)
        up, st = tx.update(g, st, p)
        return optax.apply_updates(p, up), st, l

    l0 = None
    steps = 200 if name == "ed" else 60   # tight latent bottleneck trains slowly
    for i in range(steps):
        p, st, l = step(p, st)
        if l0 is None:
            l0 = float(l)
    assert float(l) < 0.85 * l0, f"{name} did not learn: {l0} -> {float(l)}"


def test_unet_forward_and_prune():
    from climsim_tpu.models import ClimsimUNet
    m = ClimsimUNet(num_vars_profile=3, num_vars_scalar=2,
                    num_vars_profile_out=2, num_vars_scalar_out=8,
                    model_channels=16, channel_mult=(1, 2), num_blocks=1,
                    attn_resolutions=(32,), output_prune=True, strato_lev=12)
    B, L = 4, 60
    x = jnp.concatenate([
        jax.random.normal(K(0), (B, 3 * L + 2)),
        jnp.arange(1, B + 1, dtype=jnp.float32)[:, None],  # loc index
    ], axis=1)
    p = m.init(K(1), x)
    y = m.apply(p, x)
    assert y.shape == (B, 2 * L + 8)
    # scalar head non-negative
    assert np.all(np.asarray(y[:, -8:]) >= 0)
    # stratosphere of 2nd profile output pruned
    assert np.all(np.asarray(y[:, L:L + 12]) == 0)
    # gradients finite
    g = jax.grad(lambda p: jnp.sum(jnp.square(m.apply(p, x))))(p)
    assert all(np.isfinite(np.asarray(a)).all()
               for a in jax.tree_util.tree_leaves(g))


def test_unet_identity_skip_frozen():
    from climsim_tpu.models import ClimsimUNet
    m = ClimsimUNet(num_vars_profile=2, num_vars_scalar=1,
                    num_vars_profile_out=1, num_vars_scalar_out=8,
                    model_channels=8, channel_mult=(1,), num_blocks=1,
                    attn_resolutions=(), skip_conv=False)
    B, L = 2, 60
    x = jnp.concatenate([jax.random.normal(K(0), (B, 2 * L + 1)),
                         jnp.zeros((B, 1))], axis=1)
    p = m.init(K(1), x)
    g = jax.grad(lambda p: jnp.sum(jnp.square(m.apply(p, x))))(p)
    # frozen identity skip convs receive zero gradient
    for name, sub in g["params"].items():
        if name.startswith("skipconv_"):
            for leaf in jax.tree_util.tree_leaves(sub):
                assert float(jnp.abs(leaf).sum()) == 0.0


def test_unet_classifier():
    from climsim_tpu.models.unet import (ClimsimUNetClassifier,
                                         cloud_class_labels,
                                         classifier_loss)
    m = ClimsimUNetClassifier(num_vars_profile=3, num_vars_scalar=2,
                              model_channels=8, channel_mult=(1,),
                              num_blocks=1, attn_resolutions=())
    B, L = 4, 60
    x = jnp.concatenate([jax.random.normal(K(0), (B, 3 * L + 2)),
                         jnp.zeros((B, 1))], axis=1)
    p = m.init(K(1), x)
    logits = m.apply(p, x)
    assert logits.shape == (B, 1, 3, L)
    q_next = jnp.asarray([[0.0, 1e-10, 1e-6]])
    dq = jnp.asarray([[1e-12, 1e-8, 1e-8]])
    labels = np.asarray(cloud_class_labels(q_next, dq))
    np.testing.assert_array_equal(labels, [[0, 1, 2]])
    lab = jax.random.randint(K(2), (B, 1, L), 0, 3)
    loss = classifier_loss(logits, lab)
    assert np.isfinite(float(loss)) and float(loss) > 0
    g = jax.grad(lambda p: classifier_loss(m.apply(p, x), lab))(p)
    assert all(np.isfinite(np.asarray(a)).all()
               for a in jax.tree_util.tree_leaves(g))


def test_qrnn_and_glu():
    from climsim_tpu.models.cells import QRNNLayer, GLU
    B, L, nx, H = 4, 60, 10, 16
    x = jax.random.normal(K(0), (B, L, nx))
    for reverse in (False, True):
        m = QRNNLayer(H, kernel=2, causal=True, reverse=reverse)
        p = m.init(K(1), x)
        h, c = m.apply(p, x)
        assert h.shape == (B, L, H) and c.shape == (B, H)
        assert np.isfinite(np.asarray(h)).all()
    # causality: forward-causal QRNN output at level l must not depend on
    # levels > l
    m = QRNNLayer(H, kernel=2, causal=True, reverse=False)
    p = m.init(K(1), x)
    h1, _ = m.apply(p, x)
    x2 = x.at[:, 30:, :].set(0.0)
    h2, _ = m.apply(p, x2)
    np.testing.assert_allclose(np.asarray(h1[:, :29]),
                               np.asarray(h2[:, :29]), rtol=1e-5)
    g = GLU(8)
    pg = g.init(K(2), x)
    y = g.apply(pg, x)
    assert y.shape == (B, L, 8)


def test_input_prune_masks_match_reference_indices():
    """Declarative input masks reproduce the reference's literal flat
    indices on the v4 layout (climsim_datapip.py:91-125)."""
    from climsim_tpu.models.mlp import input_prune_mask
    vs = V.get("v4")
    sl, qc, qin = 15, 30, 22

    m = input_prune_mask(vs, "decouple_cloud")
    exp = np.ones(1525, np.float32)
    exp[120:240] = 0
    exp[60 * 14:60 * 16] = 0
    exp[60 * 19:60 * 21] = 0
    np.testing.assert_array_equal(m, exp)

    m = input_prune_mask(vs, "aggressive", strato_lev=sl,
                         strato_lev_qc=qc, strato_lev_qinput=qin)
    exp = np.ones(1525, np.float32)
    for start, k in ((60, qin), (120, qc), (180, qin), (240, sl),
                     (300, sl), (360, sl), (420, sl), (480, sl),
                     (540, sl), (600, sl), (660, sl), (720, sl),
                     (780, qin), (840, qc), (900, qin), (960, sl),
                     (1020, sl), (1080, qin), (1140, qc), (1200, qin),
                     (1260, sl)):
        exp[start:start + k] = 0
    exp[1515] = 0
    np.testing.assert_array_equal(m, exp)

    m = input_prune_mask(vs, "qinput", strato_lev=sl)
    exp = np.ones(1525, np.float32)
    exp[120:120 + sl] = 0
    exp[180:180 + sl] = 0
    np.testing.assert_array_equal(m, exp)


def test_qrnn_associative_scan_matches_sequential():
    """The parallel-prefix fo-pooling (assoc=True) == the sequential scan,
    forward and gradients, with and without an initial carry."""
    from climsim_tpu.models.cells import QRNNLayer
    B, L, nx, H = 4, 60, 10, 16
    x = jax.random.normal(K(0), (B, L, nx))
    c0 = jax.random.normal(K(3), (B, H)) * 0.3
    for reverse in (False, True):
        ma = QRNNLayer(H, reverse=reverse, assoc=True)
        ms = QRNNLayer(H, reverse=reverse, assoc=False)
        p = ma.init(K(1), x)
        for init in (None, c0):
            ha, ca = ma.apply(p, x, init)
            hs, cs = ms.apply(p, x, init)
            np.testing.assert_allclose(np.asarray(ha), np.asarray(hs),
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(np.asarray(ca), np.asarray(cs),
                                       rtol=1e-5, atol=1e-6)
        ga = jax.grad(lambda xx: jnp.sum(ma.apply(p, xx, c0)[0] ** 2))(x)
        gs = jax.grad(lambda xx: jnp.sum(ms.apply(p, xx, c0)[0] ** 2))(x)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gs),
                                   rtol=1e-4, atol=1e-6)
