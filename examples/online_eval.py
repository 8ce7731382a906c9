"""Online evaluation of a hybrid run — script form of the reference's
online_testing/evaluation notebooks (error growth, zonal-mean bias,
precipitation statistics, spread-skill; Hu et al. 2024 figure set).

Runs two hybrid simulations with the on-device coupled loop — a
"reference" emulator and a perturbed one standing in for the ML model
under test — then scores the second against the first:

* error-growth curves: global RMSE(T), RMSE(qv) vs coupled step
  (online_testing/evaluation error-growth notebook)
* zonal-mean temperature bias by latitude band (5-yr-bias notebook)
* precipitation distribution: mean ratio + 99.9th-percentile ratio
  (precip-statistics notebook; rnn/utils.py:1313-1324)
* ensemble spread-skill from a noise-perturbed member set
  (spread_skill notebook)

Usage: python examples/online_eval.py [out.png]
"""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms",
                  os.environ.get("CLIMSIM_PLATFORM", "cpu"))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from climsim_tpu.grid import Grid  # noqa: E402
from climsim_tpu.online import HybridLoop, HostLoopConfig  # noqa: E402
from climsim_tpu.train.probabilistic import spread_skill_ratio  # noqa: E402

GRID = "/root/reference/grid_info/ClimSim_low-res_grid-info.nc"
N_STEPS = 36          # 12 simulated hours
N_MEMBERS = 4


def make_emulator(warm: float, dry: float, noise: float = 0.0, seed: int = 0):
    """Columnwise linear 'physics' with tunable biases; noise>0 gives a
    stochastic member for the spread-skill analysis."""
    key = jax.random.PRNGKey(seed)

    def emulator(x_main, x_sfc, mem):
        B, L, _ = x_main.shape
        pt = jnp.zeros((B, L, 6))
        pt = pt.at[:, :, 0].set(warm * (1.0 + 0.3 * jnp.sin(
            jnp.linspace(0, np.pi, L))[None, :]))
        pt = pt.at[:, :, 1].set(-dry * x_main[:, :, 1] / 1e-3)
        if noise:
            pt = pt + noise * jax.random.normal(
                jax.random.fold_in(key, jnp.int32(jnp.sum(mem[0, 0]))),
                pt.shape)
        sfc = jnp.zeros((B, 8)).at[:, 3].set(
            1e-8 * (1.0 + x_main[:, -1, 1] / 1e-3))
        return pt, sfc, mem + 1.0

    return emulator


def run(loop, state, mem, x_sfc, n):
    st, mem, diags = jax.jit(lambda s, m: loop.rollout(s, m, x_sfc, n))(
        state, mem)
    return st, diags


def main(out_png="artifacts/online_eval.png"):
    g = Grid.from_file(GRID)
    cfg = HostLoopConfig(scheme="fv", fix_water=True)
    rng = np.random.default_rng(0)
    ncol, nlev = 384, 60
    state = {
        "T": jnp.asarray(rng.uniform(230, 300, (ncol, nlev))),
        "qv": jnp.asarray(np.abs(rng.normal(1e-3, 2e-4, (ncol, nlev)))),
        "qc": jnp.zeros((ncol, nlev)), "qi": jnp.zeros((ncol, nlev)),
        "u": jnp.asarray(rng.normal(0, 8, (ncol, nlev))),
        "v": jnp.asarray(rng.normal(0, 3, (ncol, nlev))),
    }
    mem = jnp.zeros((ncol, nlev, 4))
    x_sfc = jnp.concatenate([jnp.full((ncol, 1), 1e5),
                             jnp.ones((ncol, 23))], axis=1)

    ref_loop = HybridLoop(make_emulator(1e-5, 1e-9), g, cfg)
    mdl_loop = HybridLoop(make_emulator(1.3e-5, 0.8e-9), g, cfg)

    # step-by-step error growth: scan both and compare the T trajectory
    def traj(loop):
        def step(carry, _):
            st, m = carry
            st, m, d = loop.coupled_step(st, m, x_sfc)
            return (st, m), (st["T"], st["qv"], d["precc"])
        (_, _), (Ts, qvs, pr) = jax.lax.scan(step, (state, mem), None,
                                             length=N_STEPS)
        return np.asarray(Ts), np.asarray(qvs), np.asarray(pr)

    T_ref, qv_ref, pr_ref = traj(ref_loop)
    T_mdl, qv_mdl, pr_mdl = traj(mdl_loop)

    rmse_T = np.sqrt(((T_mdl - T_ref) ** 2).mean((1, 2)))
    rmse_qv = np.sqrt(((qv_mdl - qv_ref) ** 2).mean((1, 2)))

    # zonal-mean T bias at the final step
    lat = np.asarray(g.lat)
    bands = np.linspace(-90, 90, 17)
    band_idx = np.digitize(lat, bands) - 1
    bias = np.array([
        (T_mdl[-1] - T_ref[-1])[band_idx == b].mean()
        if np.any(band_idx == b) else np.nan for b in range(16)])

    # precipitation statistics
    pr_stats = {
        "mean_ratio": float(pr_mdl.mean() / max(pr_ref.mean(), 1e-30)),
        "p999_ratio": float(np.percentile(pr_mdl, 99.9)
                            / max(np.percentile(pr_ref, 99.9), 1e-30)),
    }

    # ensemble spread-skill: noise-perturbed members vs the reference
    members = []
    for m in range(N_MEMBERS):
        lp = HybridLoop(make_emulator(1e-5, 1e-9, noise=2e-6, seed=m), g,
                        cfg)
        Ts, _, _ = traj(lp)
        members.append(Ts[-1])
    ens = jnp.asarray(np.stack(members))          # [M, ncol, nlev]
    ss = float(spread_skill_ratio(ens.reshape(N_MEMBERS, -1),
                                  jnp.asarray(T_ref[-1]).reshape(-1)))

    report = {
        "rmse_T_growth": [float(x) for x in rmse_T[::6]],
        "rmse_qv_growth": [float(x) for x in rmse_qv[::6]],
        "zonal_bias_K": [None if np.isnan(b) else float(b) for b in bias],
        **pr_stats,
        "spread_skill": ss,
    }
    import json
    print(json.dumps(report, indent=1))

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 3, figsize=(12, 3.2))
        axes[0].plot(rmse_T, label="T [K]")
        axes[0].plot(rmse_qv * 1e3, label="qv [g/kg]")
        axes[0].set_xlabel("coupled step"); axes[0].set_ylabel("RMSE")
        axes[0].set_title("error growth"); axes[0].legend()
        centers = 0.5 * (bands[:-1] + bands[1:])
        axes[1].plot(centers, bias); axes[1].axhline(0, ls=":")
        axes[1].set_xlabel("latitude"); axes[1].set_title("zonal T bias [K]")
        axes[2].hist([pr_ref.ravel(), pr_mdl.ravel()], bins=30,
                     label=["ref", "model"], density=True)
        axes[2].set_yscale("log"); axes[2].legend()
        axes[2].set_title("precip distribution")
        fig.tight_layout()
        os.makedirs(os.path.dirname(out_png) or ".", exist_ok=True)
        fig.savefig(out_png, dpi=110)
        print(f"wrote {out_png}")
    except Exception as e:  # matplotlib optional
        print(f"(no plot: {e})")
    return report


if __name__ == "__main__":
    main(*sys.argv[1:])
