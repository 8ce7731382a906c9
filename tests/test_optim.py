"""Optimizer + schedule tests: SOAP and Muon reduce loss on a quadratic and
a small net; schedules match hand-computed values."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from climsim_tpu.train.soap import soap
from climsim_tpu.train.muon import muon, newton_schulz_orthogonalize
from climsim_tpu.train import schedules


def _rosenbrock_net(opt, steps=150, lr_tag=""):
    """Fit y = xW* with a 2-layer net; return initial/final loss."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (128, 16)).astype(np.float32))
    Wt = jnp.asarray(rng.normal(0, 1, (16, 8)).astype(np.float32))
    y = x @ Wt
    params = {"w1": jnp.asarray(rng.normal(0, 0.1, (16, 32)).astype(np.float32)),
              "b1": jnp.zeros(32),
              "w2": jnp.asarray(rng.normal(0, 0.1, (32, 8)).astype(np.float32))}

    def loss_fn(p):
        h = jnp.tanh(x @ p["w1"] + p["b1"])
        return jnp.mean(jnp.square(h @ p["w2"] - y))

    st = opt.init(params)

    @jax.jit
    def step(p, st):
        l, g = jax.value_and_grad(loss_fn)(p)
        up, st = opt.update(g, st, p)
        return optax.apply_updates(p, up), st, l

    l0 = None
    for _ in range(steps):
        params, st, l = step(params, st)
        if l0 is None:
            l0 = float(l)
    return l0, float(l)


def test_soap_learns():
    l0, l = _rosenbrock_net(soap(learning_rate=3e-2,
                                 precondition_frequency=5))
    assert np.isfinite(l) and l < 0.3 * l0, (l0, l)


def test_muon_learns():
    l0, l = _rosenbrock_net(muon(learning_rate=0.02))
    assert np.isfinite(l) and l < 0.3 * l0, (l0, l)


def test_newton_schulz_flattens_spectrum():
    # Muon's quintic NS iteration lands singular values near 1 (in ~[0.7,1.3]
    # by design), not exactly at 1 — check the spectrum flattens hard.
    rng = np.random.default_rng(1)
    G = np.asarray(rng.normal(0, 1, (32, 16)).astype(np.float32))
    G[:, 0] *= 50.0  # strong anisotropy
    O = newton_schulz_orthogonalize(jnp.asarray(G), steps=5)
    sv_in = np.linalg.svd(G, compute_uv=False)
    sv_out = np.linalg.svd(np.asarray(O), compute_uv=False)
    assert sv_in.max() / sv_in.min() > 50
    assert sv_out.max() / sv_out.min() < 3
    assert 0.3 < sv_out.min() and sv_out.max() < 1.8


def test_cyclical_schedule():
    s = schedules.cyclical(1e-4, 1e-3, step_size=100)
    assert abs(float(s(0)) - 1e-4) < 1e-9
    assert abs(float(s(100)) - 1e-3) < 1e-9       # peak of first cycle
    assert abs(float(s(200)) - 1e-4) < 1e-9       # back to floor
    # second cycle peaks at half amplitude
    assert abs(float(s(300)) - (1e-4 + 0.45e-3)) < 1e-9


def test_step_decay():
    s = schedules.step_decay(1e-4, every_steps=7, factor=0.2)
    np.testing.assert_allclose(float(s(0)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(s(7)), 2e-5, rtol=1e-6)
    np.testing.assert_allclose(float(s(14)), 4e-6, rtol=1e-6)


def test_warmup():
    s = schedules.warmup_constant(1e-3, 10)
    assert float(s(0)) == 0.0
    assert abs(float(s(10)) - 1e-3) < 1e-9
    assert abs(float(s(1000)) - 1e-3) < 1e-9
