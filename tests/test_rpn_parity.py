"""RPN parity: our _RPNMLP and ensemble math vs the reference's own JAX
implementation run in place (baseline_models/RPN/training/
rpn_model_v1_data.py:37-110) — leaky-ReLU(0.15) hidden layers, plain
linear head, and trainable+frozen-prior member predictions."""
import ast

import numpy as np
import jax
import jax.numpy as jnp


def _load_ref_mlp():
    """exec only the defs before the module's data-loading section."""
    src = open("/root/reference/baseline_models/RPN/training/"
               "rpn_model_v1_data.py").read()
    tree = ast.parse(src)
    keep = [n for n in tree.body
            if isinstance(n, (ast.FunctionDef,))
            and n.name in ("leakyRELU", "RELU", "MLP")]
    mod = ast.Module(body=keep, type_ignores=[])
    import jax.numpy as jnumpy
    from jax import random
    ns = {"np": jnumpy, "random": random}
    exec(compile(mod, "<ref_rpn>", "exec"), ns)
    return ns["MLP"]


def test_rpn_mlp_forward_parity():
    from climsim_tpu.models.rpn import _RPNMLP

    MLP_ref = _load_ref_mlp()
    layers = [10, 16, 12, 8]
    init, apply = MLP_ref(layers)
    ref_params = init(jax.random.PRNGKey(0))

    ours = _RPNMLP(out_dim=8, features=(16, 12))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((5, 10)), jnp.float32)
    fp = {}
    for i, (W, b) in enumerate(ref_params[:-1]):
        fp[f"dense_{i}"] = {"kernel": W, "bias": b}
    fp["head"] = {"kernel": ref_params[-1][0], "bias": ref_params[-1][1]}

    y_o = ours.apply({"params": fp}, x)
    y_r = apply(ref_params, x)
    np.testing.assert_allclose(np.asarray(y_o), np.asarray(y_r),
                               rtol=1e-6, atol=1e-7)


def test_rpn_ensemble_member_is_trainable_plus_prior():
    from climsim_tpu.models.rpn import RPNEnsemble

    ens = RPNEnsemble(out_dim=8, features=(16, 12), num_members=3)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((5, 10)), jnp.float32)
    params = ens.init(jax.random.PRNGKey(0), x)
    y = ens.apply(params, x)
    assert y.shape == (3, 5, 8)
    # member k equals net_k(x) + prior_k(x) exactly
    from climsim_tpu.models.rpn import _RPNMLP
    mlp = _RPNMLP(out_dim=8, features=(16, 12))
    for k in range(3):
        pk = jax.tree_util.tree_map(lambda a: a[k], params["net"])
        qk = jax.tree_util.tree_map(lambda a: a[k], params["prior"])
        yk = mlp.apply(pk, x) + mlp.apply(qk, x)
        np.testing.assert_allclose(np.asarray(y[k]), np.asarray(yk),
                                   rtol=1e-6, atol=1e-6)
