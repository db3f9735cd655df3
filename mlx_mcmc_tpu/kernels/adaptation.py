"""Warmup adaptation: dual averaging + Stan-style windowed mass adaptation.

Reference parity: the Nesterov dual-averaging constants are those of
mlx_mcmc/kernels/nuts.py:63-68,298-310 (``mu = log(10 eps0)``, ``gamma=0.05``,
``t0=10``, ``kappa=0.75``, post-warmup ``eps = eps_bar``). Beyond the
reference (its HMC uses a multiplicative hack, hmc.py:164-170, and mass-matrix
adaptation is only a roadmap item, README.md:166): a windowed schedule -
fast(step size) / doubling slow windows (Welford diagonal mass) / fast - after
Stan, computed host-side as static per-step flag arrays consumed as
``lax.scan`` xs, so the warmup loop stays a single compiled scan with no
data-dependent control flow.

All updates are pure pytree transforms; cross-chain pooling happens by
feeding chain-reduced statistics (``mean accept_prob``, batched Welford) —
the same code serves single-chain, vmapped, and mesh-sharded sampling.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mlx_mcmc_tpu.ops.math import (
    WelfordState,
    welford_batch_update,
    welford_finalize,
    welford_init,
)

# --------------------------------------------------------------------------
# Dual averaging (Hoffman & Gelman 2014, Algorithm 6 constants)
# --------------------------------------------------------------------------


class DualAveragingState(NamedTuple):
    log_step: jnp.ndarray  # current log step size
    log_step_avg: jnp.ndarray  # kappa-weighted average (used post-warmup)
    h_bar: jnp.ndarray  # running error statistic
    mu: jnp.ndarray  # shrinkage target log(10 * eps0)
    count: jnp.ndarray  # adaptation step counter (float)


_GAMMA = 0.05
_T0 = 10.0
_KAPPA = 0.75


def da_init(step_size) -> DualAveragingState:
    log_step = jnp.log(jnp.asarray(step_size, jnp.float32))
    return DualAveragingState(
        log_step=log_step,
        log_step_avg=log_step,
        h_bar=jnp.zeros(()),
        mu=jnp.log(10.0) + log_step,
        count=jnp.zeros(()),
    )


def da_update(state: DualAveragingState, accept_prob, target_accept) -> DualAveragingState:
    """One dual-averaging update from the latest acceptance statistic."""
    count = state.count + 1.0
    w = 1.0 / (count + _T0)
    h_bar = (1.0 - w) * state.h_bar + w * (target_accept - accept_prob)
    log_step = state.mu - jnp.sqrt(count) / _GAMMA * h_bar
    # Clip to a sane range (reference clips to +-10, nuts.py:305).
    log_step = jnp.clip(log_step, -10.0, 10.0)
    eta = count**-_KAPPA
    log_step_avg = eta * log_step + (1.0 - eta) * state.log_step_avg
    return DualAveragingState(log_step, log_step_avg, h_bar, state.mu, count)


def da_restart(state: DualAveragingState) -> DualAveragingState:
    """Re-anchor dual averaging after a mass-matrix update (Stan behavior)."""
    return da_init(jnp.exp(state.log_step))


# --------------------------------------------------------------------------
# Windowed schedule (host-side, static)
# --------------------------------------------------------------------------


class WarmupSchedule(NamedTuple):
    """Static per-warmup-step flags, consumed as scan xs.

    ``in_slow_window[t]``: accumulate this draw into the Welford estimator.
    ``window_end[t]``: after this draw, refresh the mass matrix and restart
    dual averaging.
    """

    in_slow_window: np.ndarray  # bool (num_warmup,)
    window_end: np.ndarray  # bool (num_warmup,)


def build_schedule(
    num_warmup: int,
    init_buffer: int = 75,
    term_buffer: int = 50,
    base_window: int = 25,
    adapt_mass_matrix: bool = True,
) -> WarmupSchedule:
    """Stan-style three-phase warmup schedule.

    For short warmups (< init+term+base) the phases shrink proportionally,
    per Stan's heuristic (15%/75%/10%); below 20 draws mass adaptation is
    disabled entirely.
    """
    in_slow = np.zeros(num_warmup, dtype=bool)
    window_end = np.zeros(num_warmup, dtype=bool)
    if num_warmup < 20 or not adapt_mass_matrix:
        return WarmupSchedule(in_slow, window_end)

    if num_warmup < init_buffer + term_buffer + base_window:
        init_buffer = int(0.15 * num_warmup)
        term_buffer = int(0.10 * num_warmup)
        base_window = num_warmup - init_buffer - term_buffer

    # Doubling slow windows covering [init_buffer, num_warmup - term_buffer).
    slow_end = num_warmup - term_buffer
    t = init_buffer
    width = base_window
    while t < slow_end:
        # Last window absorbs the remainder.
        if t + 3 * width > slow_end:
            width = slow_end - t
        end = t + width
        in_slow[t:end] = True
        window_end[end - 1] = True
        t = end
        width *= 2
    return WarmupSchedule(in_slow, window_end)


# --------------------------------------------------------------------------
# Combined warmup adaptation state
# --------------------------------------------------------------------------


class AdaptationState(NamedTuple):
    da: DualAveragingState
    welford: WelfordState
    inv_mass_diag: jnp.ndarray


def adaptation_init(
    dim: int, step_size: float, inv_mass_diag=None
) -> AdaptationState:
    if inv_mass_diag is None:
        inv_mass_diag = jnp.ones((dim,), jnp.float32)
    return AdaptationState(
        da=da_init(step_size),
        welford=welford_init(dim),
        inv_mass_diag=jnp.asarray(inv_mass_diag, jnp.float32),
    )


def adaptation_update(
    state: AdaptationState,
    mean_accept_prob: jnp.ndarray,
    positions: jnp.ndarray,  # (chains_local, D) current positions
    in_slow_window: jnp.ndarray,  # bool scalar (traced)
    window_end: jnp.ndarray,  # bool scalar (traced)
    target_accept: float,
    welford_reduce=None,
) -> AdaptationState:
    """One warmup-step adaptation update (branchless, scan-friendly).

    ``positions`` carries every *local* chain; cross-device pooling of the
    Welford moments is delegated to ``welford_reduce`` (identity locally,
    a psum-based merge under shard_map).
    """
    da = da_update(state.da, mean_accept_prob, target_accept)

    updated = welford_batch_update(state.welford, positions)
    welford = jax.tree_util.tree_map(
        lambda new, old: jnp.where(in_slow_window, new, old), updated, state.welford
    )

    pooled = welford if welford_reduce is None else welford_reduce(welford)
    new_inv_mass = welford_finalize(pooled)
    inv_mass = jnp.where(window_end, new_inv_mass, state.inv_mass_diag)
    da = jax.tree_util.tree_map(
        lambda new, old: jnp.where(window_end, new, old), da_restart(da), da
    )
    welford = jax.tree_util.tree_map(
        lambda new, old: jnp.where(window_end, new, old),
        welford_init(positions.shape[-1]),
        welford,
    )
    return AdaptationState(da=da, welford=welford, inv_mass_diag=inv_mass)


def find_reasonable_step_size(
    accept_prob_fn,
    init_step_size: float = 1.0,
    target: float = 0.5,
    max_doublings: int = 40,
) -> jnp.ndarray:
    """Stan's step-size initialization: double (or halve) epsilon until the
    one-leapfrog acceptance probability crosses ``target``.

    ``accept_prob_fn(eps) -> mean accept prob`` must be a traced function
    (one probe leapfrog across all chains, pmean'd if sharded). Runs as a
    ``lax.while_loop`` inside the compiled program — the reference has no
    equivalent (its warmup starts blind at whatever step_size was passed).
    """
    eps0 = jnp.asarray(init_step_size, jnp.float32)
    going_up = accept_prob_fn(eps0) > target

    def cond(carry):
        eps, done, it = carry
        return ~done & (it < max_doublings) & jnp.isfinite(eps) & (eps > 1e-10) & (
            eps < 1e7
        )

    def body(carry):
        eps, _, it = carry
        new_eps = eps * jnp.where(going_up, 2.0, 0.5)
        a = accept_prob_fn(new_eps)
        crossed = jnp.where(going_up, a <= target, a >= target)
        return new_eps, crossed, it + 1

    eps, _, _ = jax.lax.while_loop(
        cond, body, (eps0, jnp.asarray(False), jnp.asarray(0, jnp.int32))
    )
    return eps
