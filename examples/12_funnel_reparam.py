"""Example 12: funnel geometry and the non-centered remedy.

The centered eight-schools model is the textbook funnel: tau's scale
multiplies the posterior width of every theta, so NUTS trajectories entering
the funnel neck overshoot and diverge no matter how the step size adapts.
The remedy is a *model* change, not a sampler knob — the non-centered
parameterization ``theta = mu + tau * theta_raw`` samples the same posterior
with funnel-free geometry (a lesson the reference's PROGRESS.md:119 records
but never implements; SURVEY.md §7 "numerics at support boundaries").

This example runs both forms with identical sampler settings and reports
divergence counts and min-ESS side by side. Measured on a TPU v5e chip
(256 chains, 500 warmup + 500 draws, target_accept=0.9):

    centered:      3,774/128,000 draws divergent (2.95%), min-ESS ~1,023
    non-centered:  1/128,000 divergent (0.00%),          min-ESS ~222,434
    E[mu] 6.55 vs 6.59, E[tau] 1.44 vs 1.41 — same posterior.
"""

import numpy as np

from mlx_mcmc_tpu import sample
from mlx_mcmc_tpu.diagnostics import effective_sample_size
from mlx_mcmc_tpu.models.hierarchical import eight_schools


def run(centered: bool, num_chains: int = 256):
    spec = eight_schools(centered=centered)
    res = sample(
        spec.log_prob,
        spec.initial_params,
        num_warmup=500,
        num_samples=500,
        num_chains=num_chains,
        kernel="nuts",
        max_tree_depth=10,
        target_accept=0.9,
        seed=7,
    )
    total = num_chains * 500
    ndiv = res.divergences
    ess = {
        name: float(np.min(effective_sample_size(np.asarray(draws))))
        for name, draws in res.samples.items()
    }
    mu = float(np.asarray(res.samples["mu"]).mean())
    tau = float(np.exp(np.asarray(res.samples["log_tau"])).mean())
    return ndiv, total, min(ess.values()), mu, tau


def main():
    print("=" * 70)
    print("Example 12: centered vs non-centered eight schools (funnel remedy)")
    print("=" * 70)

    for label, centered in [("centered (funnel)", True), ("non-centered", False)]:
        ndiv, total, min_ess, mu, tau = run(centered)
        print(
            f"  {label:20s}: divergences {ndiv:6d}/{total} "
            f"({100.0 * ndiv / total:.2f}%), min-ESS {min_ess:8.1f}, "
            f"E[mu]={mu:.2f}, E[tau]={tau:.2f}"
        )

    print(
        "\n  Same posterior, different geometry: the non-centered form removes"
        "\n  the funnel that generates divergences in the centered form."
    )


if __name__ == "__main__":
    main()
