"""ChEES-HMC: jittered-trajectory HMC with cross-chain trajectory adaptation.

Hoffman, Radul & Sountsov (2021), "An Adaptive-MCMC Scheme for Setting
Trajectory Lengths in Hamiltonian Monte Carlo" — the sampler *designed* for
vmapped chain batches on accelerators, and a capability far beyond the
reference (which has no adaptive-trajectory sampler at all; its NUTS is the
closest analog):

- every chain runs the SAME number of leapfrog steps per draw (a shared
  Halton-jittered fraction of the adapted trajectory length), so a batch of
  chains is perfectly lockstep — no worst-case-tree synchronization loss
  like vmapped NUTS;
- the trajectory length is tuned during warmup by Adam ascent on the ChEES
  criterion (Change in the Estimator of the Expected Square of the centered
  squared radius), estimated ACROSS chains — cross-chain adaptation is the
  whole point, and maps directly onto this engine's chain axis
  (jnp.mean locally, lax.pmean when sharded).

The kernel reuses :class:`HMCState` (cached log-prob/gradient) and the
shared dual-averaging/mass-matrix machinery; the per-draw jittered length
arrives via ``Tunables.trajectory_length`` (set by the engine from the
Halton sequence of the global step index, so it is layout-invariant like
everything else).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from mlx_mcmc_tpu.kernels.base import Tunables
from mlx_mcmc_tpu.kernels.hmc import HMCState
from mlx_mcmc_tpu.kernels.integrators import (
    IntegratorState,
    make_leapfrog,
    sample_momentum,
    total_energy,
)


class ChEESInfo(NamedTuple):
    """TransitionInfo superset: adds the endpoint quantities the ChEES
    gradient estimator needs (proposal position and endpoint velocity)."""

    accept_prob: jnp.ndarray
    is_accepted: jnp.ndarray
    is_divergent: jnp.ndarray
    energy: jnp.ndarray
    log_prob: jnp.ndarray
    num_integration_steps: jnp.ndarray
    tree_depth: jnp.ndarray
    step_size: jnp.ndarray
    proposal_position: jnp.ndarray  # (D,) trajectory endpoint (pre-MH)
    end_velocity: jnp.ndarray  # (D,) M^{-1} r at the endpoint


def halton_sequence(t: jnp.ndarray, bits: int = 16) -> jnp.ndarray:
    """Base-2 radical inverse of ``t+1`` in (0, 1) — the shared per-draw
    trajectory jitter. Traced (works on step indices inside scan)."""
    t = (t + 1).astype(jnp.uint32)
    u = jnp.zeros((), jnp.float32)
    for b in range(bits):
        u = u + ((t >> b) & 1).astype(jnp.float32) * (0.5 ** (b + 1))
    return u


def make_chees_kernel(
    flat_log_prob: Callable[[jnp.ndarray], jnp.ndarray],
    max_leapfrog_steps: int = 1000,
    max_delta_energy: float = 1000.0,
    value_and_grad_fn=None,
) -> Tuple[Callable, Callable]:
    """Build ``(init_fn, step_fn)`` for ChEES-HMC.

    ``step_fn`` integrates ``ceil(trajectory_length / step_size)`` leapfrog
    steps (clipped to ``[1, max_leapfrog_steps]``) — a *traced* count, the
    same for every chain in the batch.
    """
    leapfrog = make_leapfrog(flat_log_prob, value_and_grad_fn)
    value_and_grad = value_and_grad_fn or jax.value_and_grad(flat_log_prob)

    def init_fn(position: jnp.ndarray) -> HMCState:
        log_prob, grad = value_and_grad(position)
        return HMCState(position=position, log_prob=log_prob, grad=grad)

    def step_fn(key, state: HMCState, tunables: Tunables):
        eps = tunables.step_size
        inv_mass = tunables.inv_mass_diag
        num_steps = jnp.clip(
            jnp.ceil(tunables.trajectory_length / eps).astype(jnp.int32),
            1,
            max_leapfrog_steps,
        )

        key_momentum, key_accept = jax.random.split(key)
        r0 = sample_momentum(key_momentum, inv_mass)
        start = IntegratorState(state.position, r0, state.log_prob, state.grad)
        energy0 = total_energy(start, inv_mass)

        def body(_, integ):
            return leapfrog(integ, eps, inv_mass)

        end = jax.lax.fori_loop(0, num_steps, body, start)
        energy1 = total_energy(end, inv_mass)

        delta = energy0 - energy1
        delta = jnp.where(jnp.isnan(delta), -jnp.inf, delta)
        is_divergent = -delta > max_delta_energy
        accept_prob = jnp.exp(jnp.minimum(delta, 0.0))
        accept = jnp.log(jax.random.uniform(key_accept, ())) < delta

        new_state = HMCState(
            position=jnp.where(accept, end.z, state.position),
            log_prob=jnp.where(accept, end.log_prob, state.log_prob),
            grad=jnp.where(accept, end.grad, state.grad),
        )
        info = ChEESInfo(
            accept_prob=accept_prob,
            is_accepted=accept,
            is_divergent=is_divergent,
            energy=energy0,
            log_prob=new_state.log_prob,
            num_integration_steps=num_steps,
            tree_depth=jnp.asarray(0, jnp.int32),
            step_size=eps,
            proposal_position=end.z,
            end_velocity=inv_mass * end.r,
        )
        return new_state, info

    return init_fn, step_fn


# ---------------------------------------------------------------------------
# Trajectory-length adaptation (Adam ascent on the ChEES criterion)
# ---------------------------------------------------------------------------


class TrajectoryAdaptState(NamedTuple):
    log_tau: jnp.ndarray
    adam_m: jnp.ndarray
    adam_v: jnp.ndarray
    count: jnp.ndarray


def trajectory_init(step_size) -> TrajectoryAdaptState:
    # Start at one step's worth of trajectory, like the paper.
    return TrajectoryAdaptState(
        log_tau=jnp.log(jnp.asarray(step_size, jnp.float32)),
        adam_m=jnp.zeros(()),
        adam_v=jnp.zeros(()),
        count=jnp.zeros(()),
    )


def chees_gradient(
    prev_positions: jnp.ndarray,  # (C_local, D)
    infos: ChEESInfo,  # leaves with leading (C_local,)
    jitter: jnp.ndarray,  # scalar halton fraction for this draw
    pmean=None,  # cross-shard pooling callable (None = single program)
) -> jnp.ndarray:
    """Per-draw estimate of d ChEES / d tau.

    ChEES = E[ (|z' - m'|^2 - |z - m|^2)^2 ] / 4; its tau-gradient estimator
    (paper eq. 14) per chain is
        w * (|z'-m'|^2 - |z-m|^2) * <z' - m', v'>
    with w the acceptance probability and v' the endpoint velocity, averaged
    over chains, scaled by the jitter fraction (d steps / d tau).
    """
    if pmean is None:
        pmean = lambda x: x  # noqa: E731
    prop = infos.proposal_position  # (C, D)
    m_prev = pmean(prev_positions.mean(axis=0))
    m_prop = pmean(prop.mean(axis=0))
    dsq_prev = jnp.sum((prev_positions - m_prev) ** 2, axis=-1)
    dsq_prop = jnp.sum((prop - m_prop) ** 2, axis=-1)
    proj = jnp.sum((prop - m_prop) * infos.end_velocity, axis=-1)
    per_chain = infos.accept_prob * (dsq_prop - dsq_prev) * proj
    return pmean(per_chain.mean()) * jitter


def trajectory_update(
    state: TrajectoryAdaptState,
    grad: jnp.ndarray,
    step_size: jnp.ndarray,
    max_leapfrog_steps: int = 1000,
    learning_rate: float = 0.025,
    beta1: float = 0.9,
    beta2: float = 0.999,
) -> TrajectoryAdaptState:
    """Adam ascent step on log(tau), clipped to a sane trajectory range."""
    count = state.count + 1.0
    g = grad * jnp.exp(state.log_tau)  # chain rule: d/d log_tau
    # Clip the raw scale (it varies wildly across problems; Adam normalizes
    # the rest).
    g = jnp.clip(g, -1e6, 1e6)
    m = beta1 * state.adam_m + (1 - beta1) * g
    v = beta2 * state.adam_v + (1 - beta2) * g * g
    m_hat = m / (1 - beta1**count)
    v_hat = v / (1 - beta2**count)
    log_tau = state.log_tau + learning_rate * m_hat / (jnp.sqrt(v_hat) + 1e-8)
    log_tau = jnp.clip(
        log_tau,
        jnp.log(step_size * 0.5),
        jnp.log(step_size * max_leapfrog_steps),
    )
    return TrajectoryAdaptState(log_tau, m, v, count)
