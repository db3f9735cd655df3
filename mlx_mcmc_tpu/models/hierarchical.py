"""Hierarchical models: random-intercept normal and eight schools.

The "1000-param hierarchical benchmark" of BASELINE.md maps to
``make_hierarchical_normal(num_groups=998)`` (mu + log_tau + 998 group
effects). Non-centered parameterization throughout — the funnel geometry of
the centered form needs it for NUTS to mix (a lesson the reference's
PROGRESS.md:119 records but never implements).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mlx_mcmc_tpu.distributions import Normal


class HierarchicalSpec(NamedTuple):
    log_prob: callable
    initial_params: dict
    y: jnp.ndarray
    truth: dict


def make_hierarchical_normal(
    num_groups: int = 100,
    obs_per_group: int = 100,
    seed: int = 0,
    true_mu: float = 1.0,
    true_tau: float = 0.5,
    noise_scale: float = 1.0,
) -> HierarchicalSpec:
    """Random-intercept model, non-centered:

        mu ~ N(0, 5);  log_tau ~ N(0, 1);  theta_raw_g ~ N(0, 1)
        y_{g,i} ~ N(mu + tau * theta_raw_g, noise_scale),  tau = exp(log_tau)
    """
    key = jax.random.PRNGKey(seed)
    key_theta, key_y = jax.random.split(key)
    true_theta = true_mu + true_tau * jax.random.normal(key_theta, (num_groups,))
    y = true_theta[:, None] + noise_scale * jax.random.normal(
        key_y, (num_groups, obs_per_group)
    )

    def log_prob(params):
        mu, log_tau, theta_raw = params["mu"], params["log_tau"], params["theta_raw"]
        tau = jnp.exp(log_tau)
        theta = mu + tau * theta_raw  # (G,)
        lp = Normal(0.0, 5.0).log_prob(mu)
        lp += Normal(0.0, 1.0).log_prob(log_tau)
        lp += jnp.sum(Normal(0.0, 1.0).log_prob(theta_raw))
        lp += jnp.sum(Normal(theta[:, None], noise_scale).log_prob(y))
        return lp

    return HierarchicalSpec(
        log_prob=log_prob,
        initial_params={
            "mu": 0.0,
            "log_tau": 0.0,
            "theta_raw": jnp.zeros(num_groups),
        },
        y=y,
        truth={"mu": true_mu, "tau": true_tau},
    )


def eight_schools(centered: bool = False) -> HierarchicalSpec:
    """The classic eight-schools meta-analysis.

    ``centered=False`` (default): non-centered parameterization, the clean
    geometry. ``centered=True``: the textbook funnel — tau's scale multiplies
    the theta posterior width, producing the divergence-generating geometry
    used as the honest stress benchmark (a sampler that only reports
    well-conditioned GLM numbers is hiding; divergence counts here are part
    of the benchmark contract).
    """
    y = jnp.asarray([28.0, 8.0, -3.0, 7.0, -1.0, 1.0, 18.0, 12.0])
    sigma = jnp.asarray([15.0, 10.0, 16.0, 11.0, 9.0, 11.0, 10.0, 18.0])

    if centered:

        def log_prob(params):
            mu, log_tau, theta = (
                params["mu"], params["log_tau"], params["theta"]
            )
            tau = jnp.exp(log_tau)
            lp = Normal(0.0, 10.0).log_prob(mu)
            lp += Normal(0.0, 1.0).log_prob(log_tau)
            lp += jnp.sum(Normal(mu, tau).log_prob(params["theta"]))
            lp += jnp.sum(Normal(theta, sigma).log_prob(y))
            return lp

        return HierarchicalSpec(
            log_prob=log_prob,
            initial_params={"mu": 0.0, "log_tau": 0.0, "theta": jnp.zeros(8)},
            y=y,
            truth={},
        )

    def log_prob(params):
        mu, log_tau, theta_raw = params["mu"], params["log_tau"], params["theta_raw"]
        tau = jnp.exp(log_tau)
        theta = mu + tau * theta_raw
        lp = Normal(0.0, 10.0).log_prob(mu)
        lp += Normal(0.0, 1.0).log_prob(log_tau)
        lp += jnp.sum(Normal(0.0, 1.0).log_prob(theta_raw))
        lp += jnp.sum(Normal(theta, sigma).log_prob(y))
        return lp

    return HierarchicalSpec(
        log_prob=log_prob,
        initial_params={"mu": 0.0, "log_tau": 0.0, "theta_raw": jnp.zeros(8)},
        y=y,
        truth={},
    )
