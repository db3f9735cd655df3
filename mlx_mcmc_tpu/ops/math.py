"""Numerics helpers: NaN-safe support masking and Welford streaming moments.

Welford accumulators drive the diagonal mass-matrix adaptation (a capability
the reference only lists on its roadmap: README.md:166,
docs/NUTS_IMPLEMENTATION_PLAN.md:324-327). They are written as pure pytree
updates so they compose with ``lax.scan`` and with cross-chain ``lax.pmean``
pooling on a sharded chain axis.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


def safe_where_log_prob(
    in_support: jnp.ndarray,
    value: jnp.ndarray,
    safe_value,
    log_prob_fn: Callable[[jnp.ndarray], jnp.ndarray],
) -> jnp.ndarray:
    """Evaluate ``log_prob_fn`` only on in-support values, ``-inf`` elsewhere.

    The "double-where" trick: out-of-support inputs are replaced by a safe
    dummy before calling ``log_prob_fn`` so reverse-mode gradients at the
    boundary are zero instead of NaN. The reference's plain ``mx.where``
    masking (e.g. mlx_mcmc/distributions/halfnormal.py:63) produces NaN
    gradients at masked points under autodiff, which poisons HMC; this
    formulation does not.
    """
    value = jnp.asarray(value)
    safe = jnp.where(in_support, value, safe_value)
    return jnp.where(in_support, log_prob_fn(safe), -jnp.inf)


class WelfordState(NamedTuple):
    """Streaming mean/variance accumulator over position vectors.

    ``count`` is a float scalar (so ``pmean`` pooling stays exact), ``mean``
    and ``m2`` have the shape of the observed vector.
    """

    count: jnp.ndarray
    mean: jnp.ndarray
    m2: jnp.ndarray


def welford_init(dim: int, dtype=jnp.float32) -> WelfordState:
    return WelfordState(
        count=jnp.zeros((), dtype),
        mean=jnp.zeros((dim,), dtype),
        m2=jnp.zeros((dim,), dtype),
    )


def welford_update(state: WelfordState, x: jnp.ndarray) -> WelfordState:
    """Add one observation ``x`` (shape ``(dim,)``)."""
    count = state.count + 1.0
    delta = x - state.mean
    mean = state.mean + delta / count
    m2 = state.m2 + delta * (x - mean)
    return WelfordState(count, mean, m2)


def welford_batch_update(state: WelfordState, xs: jnp.ndarray) -> WelfordState:
    """Merge a batch of observations ``xs`` (shape ``(batch, dim)``).

    Uses the Chan et al. parallel-merge formula, so pooling chains is one
    vectorized update instead of a per-chain Python loop.
    """
    b = jnp.asarray(xs.shape[0], state.count.dtype)
    batch_mean = jnp.mean(xs, axis=0)
    batch_m2 = jnp.sum((xs - batch_mean) ** 2, axis=0)
    count = state.count + b
    delta = batch_mean - state.mean
    mean = state.mean + delta * (b / jnp.maximum(count, 1.0))
    m2 = state.m2 + batch_m2 + delta**2 * (state.count * b / jnp.maximum(count, 1.0))
    return WelfordState(count, mean, m2)


def welford_merge(a: WelfordState, b: WelfordState) -> WelfordState:
    """Merge two accumulators (for tree-reduction across shards)."""
    count = a.count + b.count
    delta = b.mean - a.mean
    safe = jnp.maximum(count, 1.0)
    mean = a.mean + delta * (b.count / safe)
    m2 = a.m2 + b.m2 + delta**2 * (a.count * b.count / safe)
    return WelfordState(count, mean, m2)


def welford_finalize(state: WelfordState, regularize: bool = True) -> jnp.ndarray:
    """Return the (optionally regularized) sample variance estimate.

    Regularization follows the Stan shrinkage toward unit variance:
    ``n/(n+5) * var + 1e-3 * 5/(n+5)``, keeping the estimate well-conditioned
    for short adaptation windows.
    """
    n = state.count
    var = state.m2 / jnp.maximum(n - 1.0, 1.0)
    if regularize:
        w = n / (n + 5.0)
        var = w * var + 1e-3 * (1.0 - w)
    return jnp.where(n > 1.0, var, jnp.ones_like(var))
