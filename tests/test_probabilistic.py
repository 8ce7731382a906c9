"""CRPS-family loss tests: estimator identities and known analytic limits."""
import jax
import jax.numpy as jnp
import numpy as np

from climsim_tpu.train import probabilistic as P

K = jax.random.PRNGKey


def _ens(M=16, B=64, D=8, seed=0, spread=1.0, bias=0.0):
    """Calibrated setup: obs and members are draws from the same
    distribution around a latent center."""
    rng = np.random.default_rng(seed)
    center = rng.normal(0, 1, (B, D))
    obs = center + spread * rng.normal(0, 1, (B, D))
    ens = center[None] + bias + spread * rng.normal(0, 1, (M, B, D))
    return jnp.asarray(ens), jnp.asarray(obs)


def test_crps_sorted_equals_kernel_fair():
    """The sorted-sample estimator and the fair L1-kernel estimator are
    algebraically identical."""
    ens, obs = _ens()
    a = float(P.crps_sample_sorted(ens, obs))
    b = float(P.crps_kernel(ens, obs, fair=True))
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_crps_perfect_ensemble_zero():
    obs = jnp.asarray(np.random.default_rng(1).normal(0, 1, (32, 4)))
    ens = jnp.repeat(obs[None], 8, axis=0)
    assert abs(float(P.crps_sample_sorted(ens, obs))) < 1e-10
    assert abs(float(P.crps_kernel(ens, obs))) < 1e-10


def test_crps_decreases_with_better_forecast():
    good, obs = _ens(spread=0.5)
    bad, _ = _ens(spread=3.0)
    assert float(P.crps_sample_sorted(good, obs)) < \
        float(P.crps_sample_sorted(bad, obs))


def test_almost_fair_between_fair_and_biased():
    ens, obs = _ens()
    fair = float(P.crps_kernel(ens, obs, fair=True))
    biased = float(P.crps_kernel(ens, obs, fair=False))
    af = float(P.crps_almost_fair(ens, obs, alpha=0.5))
    lo, hi = min(fair, biased), max(fair, biased)
    assert lo - 1e-9 <= af <= hi + 1e-9


def test_spread_skill_calibrated_near_one():
    ens, obs = _ens(M=64, B=512, D=4, spread=1.0)
    r = float(P.spread_skill_ratio(ens, obs))
    assert 0.85 < r < 1.15, r


def test_energy_and_variogram_finite_and_ordered():
    good, obs = _ens(spread=0.3)
    bad, _ = _ens(spread=0.3, bias=2.0)
    assert float(P.energy_score(good, obs)) < float(P.energy_score(bad, obs))
    assert np.isfinite(float(P.variogram_score(good, obs)))


def test_dawid_sebastiani_prefers_unbiased():
    good, obs = _ens(spread=1.0)
    bad, _ = _ens(spread=1.0, bias=3.0)
    assert float(P.dawid_sebastiani(good, obs)) < \
        float(P.dawid_sebastiani(bad, obs))


def test_all_differentiable():
    ens, obs = _ens(M=8, B=16, D=4)
    for fn in (P.crps_sample_sorted, P.crps_kernel, P.crps_almost_fair,
               P.energy_score, P.dawid_sebastiani):
        g = jax.grad(lambda e: fn(e, obs))(ens)
        assert np.isfinite(np.asarray(g)).all(), fn.__name__


def test_crps_beta_scales_skill_term():
    """beta scales only the skill (MAE) term (rnn/metrics.py:610)."""
    from climsim_tpu.train import probabilistic as P
    rng = np.random.default_rng(0)
    ens = jnp.asarray(rng.normal(0, 1, (4, 32)))
    obs = jnp.asarray(rng.normal(0, 1, 32))
    for fn in (P.crps_sample_sorted,
               lambda e, o, beta: P.crps_kernel(e, o, beta=beta),
               lambda e, o, beta: P.crps_almost_fair(e, o, beta=beta)):
        c1 = float(fn(ens, obs, 1.0))
        c2 = float(fn(ens, obs, 2.0))
        mae = float(jnp.mean(jnp.abs(ens - obs[None])))
        np.testing.assert_allclose(c2 - c1, mae, rtol=1e-5)
