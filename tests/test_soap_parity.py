"""SOAP optimizer parity: our optax soap vs the reference's vendored torch
SOAP (rnn/soap.py:11-430) on identical parameter/gradient sequences —
pins the first-step skip, the post-update preconditioner accumulation,
the Adam-in-eigenbasis update with step-size bias correction, decoupled
weight decay, and the periodic power-iteration QR basis refresh with
exp_avg_sq permutation and exact exp_avg re-projection."""
import importlib.util
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


def _load_ref_soap():
    spec = importlib.util.spec_from_file_location(
        "ref_soap", "/root/reference/rnn/soap.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def _grad_fn(p2, p1):
    """Deterministic, state-dependent 'gradients' for both frameworks."""
    g2 = np.tanh(p2) + 0.1 * p2 ** 2 - 0.05
    g1 = np.sin(p1) + 0.2 * p1
    return g2.astype(np.float32), g1.astype(np.float32)


@pytest.mark.parametrize("weight_decay", [0.0, 0.01])
def test_soap_update_parity(weight_decay):
    from climsim_tpu.train.soap import soap

    ref_mod = _load_ref_soap()
    rng = np.random.default_rng(0)
    W2 = rng.standard_normal((6, 5)).astype(np.float32)
    W1 = rng.standard_normal(7).astype(np.float32)

    # eps dominates matmul round-off: with the reference eps=1e-8 the
    # Adam sign-normalization amplifies ~1e-8 BLAS accumulation noise in
    # the near-null projected-gradient entries into O(lr) trajectory
    # differences (the reference is not reproducible across BLAS builds
    # there); eps=1e-4 pins the ALGORITHM rather than FP chaos
    lr, b1, b2, sb, eps_, freq = 3e-2, 0.95, 0.95, 0.95, 1e-4, 5

    # ---- torch reference
    tp2 = torch.nn.Parameter(torch.from_numpy(W2.copy()))
    tp1 = torch.nn.Parameter(torch.from_numpy(W1.copy()))
    opt = ref_mod.SOAP([tp2, tp1], lr=lr, betas=(b1, b2), shampoo_beta=sb,
                       eps=eps_, weight_decay=weight_decay,
                       precondition_frequency=freq)

    # ---- ours
    params = {"w2": jnp.asarray(W2), "w1": jnp.asarray(W1)}
    tx = soap(learning_rate=lr, b1=b1, b2=b2, shampoo_beta=sb, eps=eps_,
              precondition_frequency=freq, weight_decay=weight_decay)
    st = tx.init(params)

    @jax.jit
    def ours_step(params, st, g2, g1):
        up, st = tx.update({"w2": g2, "w1": g1}, st, params)
        import optax
        return optax.apply_updates(params, up), st

    for i in range(17):
        if i == 1:
            # After the init step the preconditioner is RANK-1, so its
            # null-space eigenbasis is an arbitrary LAPACK choice — the
            # reference trajectory itself is solver-dependent there. Sync
            # our basis to the reference's once (moments are still zero);
            # every subsequent step, INCLUDING the power-iteration QR
            # refreshes, must then agree exactly.
            sref = opt.state[tp2]
            inner = dict(st.inner)
            w2s = inner["w2"]
            inner["w2"] = w2s._replace(
                QL=jnp.asarray(sref["Q"][0].numpy()),
                QR=jnp.asarray(sref["Q"][1].numpy()))
            st = st._replace(inner=inner)
        g2, g1 = _grad_fn(np.asarray(params["w2"]),
                          np.asarray(params["w1"]))
        g2_t, g1_t = _grad_fn(tp2.detach().numpy(), tp1.detach().numpy())
        # both sides see their own state-dependent grads; trajectories
        # agree only if every preceding update agreed
        tp2.grad = torch.from_numpy(g2_t.copy())
        tp1.grad = torch.from_numpy(g1_t.copy())
        opt.step()
        params, st = ours_step(params, st, jnp.asarray(g2),
                               jnp.asarray(g1))
        np.testing.assert_allclose(
            np.asarray(params["w2"]), tp2.detach().numpy(),
            rtol=2e-3, atol=2e-4, err_msg=f"w2 at step {i}")
        np.testing.assert_allclose(
            np.asarray(params["w1"]), tp1.detach().numpy(),
            rtol=2e-3, atol=2e-4, err_msg=f"w1 at step {i}")

    # sanity: the parameters actually moved
    assert not np.allclose(np.asarray(params["w2"]), W2)
