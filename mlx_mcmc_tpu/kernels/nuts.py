"""No-U-Turn Sampler: fixed-depth *iterative* formulation.

Reference parity: mlx_mcmc/kernels/nuts.py:16-358 implements Hoffman & Gelman
(2014) with recursive ``build_tree`` (nuts.py:137-218), host-evaluated U-turn
checks (nuts.py:119-135) and a data-dependent Python doubling loop
(nuts.py:251-280) — a formulation that cannot compile. This module is the
TPU-native redesign (SURVEY.md §7 design delta #2):

- the doubling loop is a ``lax.while_loop``; each doubling builds its subtree
  *iteratively* with a checkpoint-array U-turn scheme (popcount-indexed
  ancestor checkpoints, as in NumPyro/Stan's iterative tree build), so memory
  is O(max_tree_depth * D) and control flow is fully traced;
- progressive **multinomial** sampling over leaves (Betancourt 2017) with a
  biased across-doubling transition — the modern variant of the reference's
  slice sampling (nuts.py:166,234-237), same posterior, better statistical
  efficiency and vectorization behavior;
- the generalized U-turn criterion on momentum sums with a diagonal metric
  (the reference's position-difference criterion, nuts.py:128-135, is the
  identity-mass special case);
- divergence detection via ``max_delta_energy = 1000`` matches the
  reference's ``DELTA_MAX`` (nuts.py:13).

Everything runs under ``jit``/``vmap``/``shard_map``; one NUTS draw is one
XLA computation with zero host syncs.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from mlx_mcmc_tpu.kernels.base import TransitionInfo, Tunables
from mlx_mcmc_tpu.kernels.hmc import HMCState
from mlx_mcmc_tpu.kernels.integrators import (
    IntegratorState,
    make_leapfrog,
    sample_momentum,
    total_energy,
)

DELTA_MAX = 1000.0  # max energy error before declaring divergence


def _popcount(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.population_count(x.astype(jnp.int32))


def _is_turning(r_sum, r_first, r_last, inv_mass_diag) -> jnp.ndarray:
    """Generalized U-turn criterion: trajectory stops expanding when the
    momentum sum opposes the velocity at either end."""
    v_first = inv_mass_diag * r_first
    v_last = inv_mass_diag * r_last
    return (jnp.dot(r_sum, v_first) <= 0.0) | (jnp.dot(r_sum, v_last) <= 0.0)


class _TreeState(NamedTuple):
    """The whole sampled trajectory, represented by its two ends + proposal."""

    left: IntegratorState
    right: IntegratorState
    proposal: IntegratorState
    energy_proposal: jnp.ndarray
    log_weight: jnp.ndarray  # log sum_leaves exp(E0 - E); root contributes 0
    r_sum: jnp.ndarray  # (D,) momentum sum over all leaves incl. root
    depth: jnp.ndarray  # i32
    turning: jnp.ndarray
    diverging: jnp.ndarray
    sum_accept: jnp.ndarray
    num_leaves: jnp.ndarray  # i32, leapfrog steps taken


class _SubtreeCarry(NamedTuple):
    first: IntegratorState  # first generated leaf (nearest the old tree)
    last: IntegratorState  # latest integration point
    proposal: IntegratorState
    energy_proposal: jnp.ndarray
    log_weight: jnp.ndarray
    r_sum: jnp.ndarray
    sum_accept: jnp.ndarray
    leaf_idx: jnp.ndarray  # i32 leaves built so far
    turning: jnp.ndarray
    diverging: jnp.ndarray
    r_ckpts: jnp.ndarray  # (max_tree_depth, D)
    r_sum_ckpts: jnp.ndarray  # (max_tree_depth, D)
    key: jnp.ndarray


def make_nuts_kernel(
    flat_log_prob: Callable[[jnp.ndarray], jnp.ndarray],
    max_tree_depth: int = 10,
    max_delta_energy: float = DELTA_MAX,
    value_and_grad_fn=None,
) -> Tuple[Callable, Callable]:
    """Build ``(init_fn, step_fn)`` for iterative multinomial NUTS.

    State is shared with HMC (:class:`HMCState`): position + cached
    log-prob/gradient, so one gradient evaluation per leapfrog step total.
    """
    leapfrog = make_leapfrog(flat_log_prob, value_and_grad_fn)
    value_and_grad = value_and_grad_fn or jax.value_and_grad(flat_log_prob)

    def init_fn(position: jnp.ndarray) -> HMCState:
        log_prob, grad = value_and_grad(position)
        return HMCState(position=position, log_prob=log_prob, grad=grad)

    # ------------------------------------------------------------------
    # Iterative subtree build with checkpoint-array U-turn detection
    # ------------------------------------------------------------------

    def _leaf_turning_check(leaf_idx, r_sum, r_leaf, carry: _SubtreeCarry, inv_mass):
        """For odd ``leaf_idx``, check U-turns of every subtree that has this
        leaf as its rightmost element, against checkpointed left edges.

        Checkpoint slot of an even leaf ``m`` is ``popcount(m)``; the slots to
        check against for odd ``n`` span ``[idx_max - trailing_ones(n) + 1,
        idx_max]`` with ``idx_max = popcount(n >> 1)``.
        """
        idx_max = _popcount(leaf_idx >> 1)
        trailing_ones = _popcount(leaf_idx ^ (leaf_idx + 1)) - 1
        idx_min = idx_max - trailing_ones + 1

        def cond(it):
            i, turning = it
            return (i >= idx_min) & ~turning

        def body(it):
            i, _ = it
            sub_sum = r_sum - carry.r_sum_ckpts[i] + carry.r_ckpts[i]
            turning = _is_turning(sub_sum, carry.r_ckpts[i], r_leaf, inv_mass)
            return i - 1, turning

        _, turning = jax.lax.while_loop(cond, body, (idx_max, jnp.asarray(False)))
        return turning

    def _build_subtree(key, edge: IntegratorState, depth, eps_signed, inv_mass, energy0):
        """Integrate ``2**depth`` leapfrog steps from ``edge``, accumulating
        multinomial weights and running all within-subtree U-turn checks."""
        dim = edge.z.shape[-1]
        num_target = jnp.left_shift(jnp.asarray(1, jnp.int32), depth)

        carry = _SubtreeCarry(
            first=edge,
            last=edge,
            proposal=edge,
            energy_proposal=jnp.asarray(jnp.inf, jnp.float32),
            log_weight=jnp.asarray(-jnp.inf, jnp.float32),
            r_sum=jnp.zeros((dim,), edge.r.dtype),
            sum_accept=jnp.zeros((), jnp.float32),
            leaf_idx=jnp.asarray(0, jnp.int32),
            turning=jnp.asarray(False),
            diverging=jnp.asarray(False),
            r_ckpts=jnp.zeros((max_tree_depth, dim), edge.r.dtype),
            r_sum_ckpts=jnp.zeros((max_tree_depth, dim), edge.r.dtype),
            key=key,
        )

        def cond(c: _SubtreeCarry):
            return (c.leaf_idx < num_target) & ~c.turning & ~c.diverging

        def body(c: _SubtreeCarry) -> _SubtreeCarry:
            new = leapfrog(c.last, eps_signed, inv_mass)
            energy = total_energy(new, inv_mass)
            delta = energy - energy0  # energy error vs trajectory start
            diverging = delta > max_delta_energy
            log_w_leaf = -delta  # multinomial log weight, relative to E0
            accept_stat = jnp.exp(jnp.minimum(-delta, 0.0))

            # Progressive uniform-multinomial proposal update within subtree.
            key, key_take = jax.random.split(c.key)
            log_w_total = jnp.logaddexp(c.log_weight, log_w_leaf)
            p_take = jnp.exp(log_w_leaf - log_w_total)
            p_take = jnp.where(jnp.isnan(p_take), 0.0, p_take)
            take = (~diverging) & (
                jax.random.uniform(key_take, ()) < p_take
            )
            proposal = jax.tree_util.tree_map(
                lambda a, b: jnp.where(take, a, b), new, c.proposal
            )
            energy_proposal = jnp.where(take, energy, c.energy_proposal)

            r_sum = c.r_sum + new.r
            first = jax.tree_util.tree_map(
                lambda a, b: jnp.where(c.leaf_idx == 0, a, b), new, c.first
            )

            # Checkpoint bookkeeping: even leaves store, odd leaves check.
            is_even = (c.leaf_idx % 2) == 0
            ckpt_idx = _popcount(c.leaf_idx)
            r_ckpts = c.r_ckpts.at[ckpt_idx].set(
                jnp.where(is_even, new.r, c.r_ckpts[ckpt_idx])
            )
            r_sum_ckpts = c.r_sum_ckpts.at[ckpt_idx].set(
                jnp.where(is_even, r_sum, c.r_sum_ckpts[ckpt_idx])
            )
            turning = jnp.where(
                is_even,
                False,
                _leaf_turning_check(c.leaf_idx, r_sum, new.r, c, inv_mass),
            )

            return _SubtreeCarry(
                first=first,
                last=new,
                proposal=proposal,
                energy_proposal=energy_proposal,
                log_weight=log_w_total,
                r_sum=r_sum,
                sum_accept=c.sum_accept + accept_stat,
                leaf_idx=c.leaf_idx + 1,
                turning=turning,
                diverging=diverging,
                r_ckpts=r_ckpts,
                r_sum_ckpts=r_sum_ckpts,
                key=key,
            )

        return jax.lax.while_loop(cond, body, carry)

    # ------------------------------------------------------------------
    # Doubling loop
    # ------------------------------------------------------------------

    def step_fn(key, state: HMCState, tunables: Tunables):
        inv_mass = tunables.inv_mass_diag
        eps = tunables.step_size
        key_momentum, key_loop = jax.random.split(key)

        r0 = sample_momentum(key_momentum, inv_mass)
        start = IntegratorState(state.position, r0, state.log_prob, state.grad)
        energy0 = total_energy(start, inv_mass)

        tree = _TreeState(
            left=start,
            right=start,
            proposal=start,
            energy_proposal=energy0,
            log_weight=jnp.zeros((), jnp.float32),
            r_sum=r0,
            depth=jnp.asarray(0, jnp.int32),
            turning=jnp.asarray(False),
            diverging=jnp.asarray(False),
            sum_accept=jnp.zeros((), jnp.float32),
            num_leaves=jnp.asarray(0, jnp.int32),
        )

        def cond(carry):
            tree, _ = carry
            return ~tree.turning & ~tree.diverging & (tree.depth < max_tree_depth)

        def body(carry):
            tree, key = carry
            key, key_dir, key_build, key_move = jax.random.split(key, 4)
            going_right = jax.random.bernoulli(key_dir)

            edge = jax.tree_util.tree_map(
                lambda a, b: jnp.where(going_right, a, b), tree.right, tree.left
            )
            eps_signed = jnp.where(going_right, eps, -eps)
            sub = _build_subtree(key_build, edge, tree.depth, eps_signed, inv_mass, energy0)
            valid = ~sub.turning & ~sub.diverging

            # Biased progressive transition: favor the new half-trajectory.
            p_move = jnp.exp(jnp.minimum(sub.log_weight - tree.log_weight, 0.0))
            p_move = jnp.where(jnp.isnan(p_move), 0.0, p_move)
            move = valid & (jax.random.uniform(key_move, ()) < p_move)
            proposal = jax.tree_util.tree_map(
                lambda a, b: jnp.where(move, a, b), sub.proposal, tree.proposal
            )
            energy_proposal = jnp.where(move, sub.energy_proposal, tree.energy_proposal)

            left = jax.tree_util.tree_map(
                lambda a, b: jnp.where(going_right, a, b), tree.left, sub.last
            )
            right = jax.tree_util.tree_map(
                lambda a, b: jnp.where(going_right, a, b), sub.last, tree.right
            )
            r_sum = tree.r_sum + sub.r_sum
            turning_full = _is_turning(r_sum, left.r, right.r, inv_mass)

            new_tree = _TreeState(
                left=left,
                right=right,
                proposal=proposal,
                energy_proposal=energy_proposal,
                log_weight=jnp.logaddexp(tree.log_weight, sub.log_weight),
                r_sum=r_sum,
                depth=tree.depth + 1,
                turning=sub.turning | (valid & turning_full),
                diverging=sub.diverging,
                sum_accept=tree.sum_accept + sub.sum_accept,
                num_leaves=tree.num_leaves + sub.leaf_idx,
            )
            return new_tree, key

        tree, _ = jax.lax.while_loop(cond, body, (tree, key_loop))

        new_state = HMCState(
            position=tree.proposal.z,
            log_prob=tree.proposal.log_prob,
            grad=tree.proposal.grad,
        )
        accept_prob = tree.sum_accept / jnp.maximum(
            tree.num_leaves.astype(jnp.float32), 1.0
        )
        info = TransitionInfo(
            accept_prob=accept_prob,
            is_accepted=tree.num_leaves > 0,
            is_divergent=tree.diverging,
            energy=energy0,
            log_prob=new_state.log_prob,
            num_integration_steps=tree.num_leaves,
            tree_depth=tree.depth,
            step_size=eps,
        )
        return new_state, info

    return init_fn, step_fn
