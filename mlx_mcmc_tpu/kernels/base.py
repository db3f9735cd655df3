"""Kernel protocol: pure ``init``/``step`` functions over pytree states.

The reference drives every sampler with a host Python loop and per-iteration
``float()`` syncs (mlx_mcmc/kernels/metropolis.py:64-92, hmc.py:159-198,
nuts.py:291-347). Here a kernel is a pair of pure functions

    init_fn(position)                    -> state
    step_fn(key, state, tunables)       -> (state, info)

with all state as flat-vector pytrees, so the whole chain is one
``lax.scan`` under one ``jit`` and chains batch with ``vmap``/``shard_map``.
``Tunables`` carries the adaptation-controlled quantities (step size, inverse
mass diagonal) separately from the Markov state so warmup can rewrite them
without touching kernel internals.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax.numpy as jnp


class Tunables(NamedTuple):
    """Adaptation-controlled sampler knobs.

    ``step_size``: leapfrog step size (HMC/NUTS/ChEES) or random-walk
    proposal scale (Metropolis). ``inv_mass_diag``: diagonal of the inverse
    mass matrix — the running estimate of posterior variance per dimension.
    Metropolis uses ``sqrt(inv_mass_diag)`` to shape its proposal, so mass
    adaptation benefits every kernel. ``trajectory_length``: this draw's
    (jittered) integration length — consumed by ChEES-HMC, ignored by the
    other kernels.
    """

    step_size: jnp.ndarray
    inv_mass_diag: jnp.ndarray
    # python-float default (not a jnp array: creating one at import time
    # would initialize the JAX backend as a side effect of importing)
    trajectory_length: jnp.ndarray = 1.0


def identity_tunables(dim: int, step_size: float = 0.1) -> Tunables:
    return Tunables(
        step_size=jnp.asarray(step_size, jnp.float32),
        inv_mass_diag=jnp.ones((dim,), jnp.float32),
    )


class TransitionInfo(NamedTuple):
    """Per-draw diagnostics, uniform across kernels (one scan output pytree).

    This replaces the reference's hardcoded progress prints
    (hmc.py:172-176, nuts.py:312-315) with a device-resident diagnostics
    pytree: no host callbacks in the hot loop; the facade post-processes.
    """

    accept_prob: jnp.ndarray  # f32: mean Metropolis acceptance statistic
    is_accepted: jnp.ndarray  # bool: proposal (or trajectory move) taken
    is_divergent: jnp.ndarray  # bool: energy error exceeded max_delta_energy
    energy: jnp.ndarray  # f32: Hamiltonian at trajectory start (-logp for MH)
    log_prob: jnp.ndarray  # f32: log density of the new state
    num_integration_steps: jnp.ndarray  # i32: leapfrog evals this draw
    tree_depth: jnp.ndarray  # i32: NUTS tree depth (0 otherwise)
    step_size: jnp.ndarray  # f32: step size used this draw


# A kernel is (init_fn, step_fn).
InitFn = Callable[[jnp.ndarray], NamedTuple]
StepFn = Callable[[jnp.ndarray, NamedTuple, Tunables], Tuple[NamedTuple, TransitionInfo]]
