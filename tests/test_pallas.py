"""Pallas kernel tests (interpret mode on CPU): fused BiGRU vs the scan
reference, forward + gradients."""
import jax
import jax.numpy as jnp
import numpy as np

from climsim_tpu.ops.pallas_rnn import fused_bigru, _bigru_reference

K = jax.random.PRNGKey


def _make(B=16, L=60, H=32, dtype=jnp.float32, seed=0):
    ks = jax.random.split(K(seed), 9)
    s = 0.3
    return (jax.random.normal(ks[0], (B, L, 3 * H), dtype) * s,
            jax.random.normal(ks[1], (B, H), dtype) * s,
            jax.random.normal(ks[2], (B, H), dtype) * s,
            jax.random.normal(ks[3], (H, 3 * H), dtype) * s,
            jax.random.normal(ks[4], (3 * H,), dtype) * s,
            jax.random.normal(ks[5], (H, 3 * H), dtype) * s,
            jax.random.normal(ks[6], (3 * H,), dtype) * s,
            jax.random.normal(ks[7], (H, 3 * H), dtype) * s,
            jax.random.normal(ks[8], (3 * H,), dtype) * s)


def test_fused_bigru_matches_reference():
    args = _make()
    down_k, last_k = fused_bigru(*args, 8, True)   # interpret mode
    down_r, last_r = _bigru_reference(*args)
    np.testing.assert_allclose(np.asarray(down_k), np.asarray(down_r),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(last_k), np.asarray(last_r),
                               rtol=2e-5, atol=1e-6)


def test_fused_bigru_ragged_batch():
    # B not divisible by block_b: last tile padded by pallas
    args = _make(B=20)
    down_k, last_k = fused_bigru(*args, 8, True)
    down_r, last_r = _bigru_reference(*args)
    np.testing.assert_allclose(np.asarray(down_k), np.asarray(down_r),
                               rtol=2e-5, atol=1e-6)


def test_fused_bigru_gradients():
    args = _make(B=8, H=16)

    def loss_k(*a):
        d, l = fused_bigru(*a, 8, True)
        return jnp.sum(jnp.square(d)) + jnp.sum(l)

    def loss_r(*a):
        d, l = _bigru_reference(*a)
        return jnp.sum(jnp.square(d)) + jnp.sum(l)

    gk = jax.grad(loss_k, argnums=tuple(range(9)))(*args)
    gr = jax.grad(loss_r, argnums=tuple(range(9)))(*args)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_fv_stencil_kernel_matches_reference():
    """Pallas FV kernel (interpret mode) == the jnp fv_advect_2d per level,
    incl. mass conservation."""
    from climsim_tpu.ops.pallas_stencil import fv_advect_levels
    from climsim_tpu.online.advection import fv_advect_2d
    rng = np.random.default_rng(0)
    nlev, nlat, nlon = 5, 16, 24
    q = jnp.asarray(np.abs(rng.normal(1, 0.3, (nlev, nlat, nlon))))
    u = jnp.asarray(rng.normal(0, 0.3, (nlev, nlat, nlon)))
    v = jnp.asarray(rng.normal(0, 0.3, (nlev, nlat, nlon)))
    got = fv_advect_levels(q, u, v, 0.4, 0.4, interpret=True)
    exp = jax.vmap(lambda a, b, c: fv_advect_2d(a, b, c, 0.4, 0.4))(q, u, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(got.sum((1, 2))),
                               np.asarray(q.sum((1, 2))), rtol=1e-10)
