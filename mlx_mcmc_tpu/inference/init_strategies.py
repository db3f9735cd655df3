"""Chain initialization strategies.

The reference starts every run exactly at the user's ``initial_params``.
Beyond tiling + Gaussian jitter (engine ``prepare_initial_positions``), this
module adds optimization-based initialization: a short compiled Adam ascent
on the log-density per chain ("MAP init"), which drops chains into the
typical set before warmup — often the difference between warmup converging
or wandering for hard posteriors.

All strategies operate on flat positions and are fully jitted (optax is the
optimizer substrate).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def map_initialize(
    flat_log_prob: Callable[[jnp.ndarray], jnp.ndarray],
    z0_batch: jnp.ndarray,
    key,
    *,
    num_steps: int = 200,
    learning_rate: float = 0.05,
    jitter: float = 1.0,
    data=None,
) -> jnp.ndarray:
    """Per-chain Adam ascent on the log-density from jittered starts.

    Args:
        flat_log_prob: unary (or binary, with ``data``) flat log-density.
        z0_batch: (chains, D) starting points (typically tiled user inits).
        key: PRNG key for the initial jitter (distinct per chain).
        num_steps: Adam steps (one compiled scan).
        jitter: std of the Gaussian jitter applied before optimizing —
            distinct chains land in distinct modes/basins when there are any.
        data: optional data pytree for binary models.

    Returns:
        (chains, D) optimized positions. Non-finite outcomes (e.g. a chain
        jittered outside the support) fall back to the unoptimized start.
    """
    import optax

    if data is not None:
        base_lp = flat_log_prob
        flat_log_prob = lambda z: base_lp(z, data)  # noqa: E731

    z0_batch = jnp.asarray(z0_batch)
    noise = jax.random.normal(key, z0_batch.shape, z0_batch.dtype)
    starts = z0_batch + jitter * noise

    opt = optax.adam(learning_rate)
    grad_fn = jax.grad(lambda z: -flat_log_prob(z))

    def optimize_one(z):
        state = opt.init(z)

        def body(carry, _):
            z, state = carry
            g = grad_fn(z)
            g = jnp.where(jnp.isfinite(g), g, 0.0)
            updates, state = opt.update(g, state, z)
            return (optax.apply_updates(z, updates), state), None

        (z, _), _ = jax.lax.scan(body, (z, state), None, length=num_steps)
        return z

    optimized = jax.vmap(optimize_one)(starts)
    lp = jax.vmap(flat_log_prob)(optimized)
    ok = jnp.isfinite(lp)
    return jnp.where(ok[:, None], optimized, z0_batch)
