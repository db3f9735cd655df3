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


class _Proposal(NamedTuple):
    """The candidate next state: position + cached density/gradient. The
    momentum is deliberately NOT tracked — it is never consumed after
    selection, and dropping it saves one (D,)-select per leaf per chain."""

    z: jnp.ndarray
    log_prob: jnp.ndarray
    grad: jnp.ndarray


class _NutsCarry(NamedTuple):
    """FLAT while-loop state: the sampled trajectory (tree) and the
    in-flight subtree, advanced ONE leapfrog per loop iteration.

    The textbook nested formulation (doubling while-loop around a subtree
    while-loop) pays a loop-boundary cost per doubling that measures ~1.8 ms
    at 4096 vmapped chains on v5e — more than the leapfrog itself. Flattening
    to a single loop makes the iteration count exactly the leapfrog count;
    subtree completion and tree merging happen branchlessly via masked
    selects inside the body.
    """

    # --- whole-trajectory (tree) state ---
    left: IntegratorState
    right: IntegratorState
    proposal: _Proposal
    log_weight: jnp.ndarray  # log sum_leaves exp(E0 - E); root contributes 0
    r_sum: jnp.ndarray  # (D,) momentum sum over all leaves incl. root
    depth: jnp.ndarray  # i32, completed doublings
    turning: jnp.ndarray
    diverging: jnp.ndarray
    sum_accept: jnp.ndarray
    num_leaves: jnp.ndarray  # i32, leapfrog steps taken
    # --- in-flight subtree state ---
    sub_last: IntegratorState  # latest integration point
    sub_proposal: _Proposal
    sub_log_weight: jnp.ndarray
    sub_r_sum: jnp.ndarray
    sub_leaf: jnp.ndarray  # i32 leaves built in the current subtree
    going_right: jnp.ndarray  # bool, direction of the current subtree
    r_ckpts: jnp.ndarray  # (max_tree_depth, D) even-leaf momenta
    r_sum_ckpts: jnp.ndarray  # (max_tree_depth, D) even-leaf prefix sums


def _as_proposal(state: IntegratorState) -> _Proposal:
    return _Proposal(z=state.z, log_prob=state.log_prob, grad=state.grad)


def make_nuts_kernel(
    flat_log_prob: Callable[[jnp.ndarray], jnp.ndarray],
    max_tree_depth: int = 10,
    max_delta_energy: float = DELTA_MAX,
    value_and_grad_fn=None,
    static_schedule: bool = False,
) -> Tuple[Callable, Callable]:
    """Build ``(init_fn, step_fn)`` for iterative multinomial NUTS.

    State is shared with HMC (:class:`HMCState`): position + cached
    log-prob/gradient, so one gradient evaluation per leapfrog step total.

    ``static_schedule=True`` replaces the data-dependent ``while_loop`` with
    a fixed-trip-count scan of ``2**max_tree_depth - 1`` masked iterations
    (finished chains carry through unchanged). The draws are BIT-IDENTICAL
    to the dynamic variant — only the execution schedule changes: every
    chain row executes exactly the same number of likelihood evaluations,
    so collectives inside ``value_and_grad_fn`` (observation sharding's
    per-leapfrog ``psum``, parallel/sharded.py) fire uniformly across the
    mesh instead of a per-row data-dependent number of times. The price is
    running every draw at the depth cap; use a realistic ``max_tree_depth``
    (6-8) rather than the default 10 when enabling this.
    """
    leapfrog = make_leapfrog(flat_log_prob, value_and_grad_fn)
    value_and_grad = value_and_grad_fn or jax.value_and_grad(flat_log_prob)

    def init_fn(position: jnp.ndarray) -> HMCState:
        log_prob, grad = value_and_grad(position)
        return HMCState(position=position, log_prob=log_prob, grad=grad)

    # ------------------------------------------------------------------
    # Flat single-loop tree build (one leapfrog per while iteration)
    # ------------------------------------------------------------------

    def _leaf_turning_check(leaf_idx, r_sum, r_leaf, r_ckpts, r_sum_ckpts, inv_mass):
        """For odd ``leaf_idx``, check U-turns of every subtree that has this
        leaf as its rightmost element, against checkpointed left edges.

        Checkpoint slot of an even leaf ``m`` is ``popcount(m)``; the slots to
        check against for odd ``n`` span ``[idx_max - trailing_ones(n) + 1,
        idx_max]`` with ``idx_max = popcount(n >> 1)``. Every slot in that
        range was written earlier in the SAME subtree, so stale data from a
        previous subtree can never enter the mask — the checkpoint buffers
        need no per-subtree zeroing.

        Evaluated for ALL ``max_tree_depth`` slots at once with a slot mask
        instead of a data-dependent inner while_loop: the batched check is a
        (T, D) elementwise + two (T,) reductions — far cheaper than per-slot
        loop iterations (and under the chain vmap a dynamic slot gather would
        lower to a serialized per-row gather).
        """
        idx_max = _popcount(leaf_idx >> 1)
        trailing_ones = _popcount(leaf_idx ^ (leaf_idx + 1)) - 1
        idx_min = idx_max - trailing_ones + 1

        sub_sum = r_sum[None, :] - r_sum_ckpts + r_ckpts  # (T, D)
        v_first = inv_mass[None, :] * r_ckpts
        v_leaf = inv_mass * r_leaf
        turning_t = (jnp.sum(sub_sum * v_first, axis=-1) <= 0.0) | (
            sub_sum @ v_leaf <= 0.0
        )
        slots = jnp.arange(max_tree_depth, dtype=jnp.int32)
        mask = (slots >= idx_min) & (slots <= idx_max)
        return jnp.any(turning_t & mask)

    def step_fn(key, state: HMCState, tunables: Tunables):
        inv_mass = tunables.inv_mass_diag
        eps = tunables.step_size
        key_momentum, key_loop = jax.random.split(key)

        r0 = sample_momentum(key_momentum, inv_mass)
        start = IntegratorState(state.position, r0, state.log_prob, state.grad)
        energy0 = total_energy(start, inv_mass)
        dim = state.position.shape[-1]
        f32 = jnp.float32

        carry0 = _NutsCarry(
            left=start,
            right=start,
            proposal=_as_proposal(start),
            log_weight=jnp.zeros((), f32),
            r_sum=r0,
            depth=jnp.asarray(0, jnp.int32),
            turning=jnp.asarray(False),
            diverging=jnp.asarray(False),
            sum_accept=jnp.zeros((), f32),
            num_leaves=jnp.asarray(0, jnp.int32),
            sub_last=start,
            sub_proposal=_as_proposal(start),
            sub_log_weight=jnp.asarray(-jnp.inf, f32),
            sub_r_sum=jnp.zeros((dim,), r0.dtype),
            sub_leaf=jnp.asarray(0, jnp.int32),
            going_right=jnp.asarray(False),
            r_ckpts=jnp.zeros((max_tree_depth, dim), r0.dtype),
            r_sum_ckpts=jnp.zeros((max_tree_depth, dim), r0.dtype),
        )

        def cond(c: _NutsCarry):
            return ~c.turning & ~c.diverging & (c.depth < max_tree_depth)

        def body(c: _NutsCarry) -> _NutsCarry:
            starting = c.sub_leaf == 0  # first leaf of a new subtree?
            # One threefry pass per leaf: the leaf key is the global leaf
            # counter folded into the draw key, and all three uniforms
            # (direction, within-subtree take, across-subtree move) come from
            # a single (3,) draw — threefry at chain width measures ~30 us
            # per invocation at 4096 vmapped chains, so key bookkeeping was a
            # material slice of the leaf cost (it also drops the key from the
            # loop carry).
            u3 = jax.random.uniform(
                jax.random.fold_in(key_loop, c.num_leaves), (3,)
            )
            going_right = jnp.where(starting, u3[0] < 0.5, c.going_right)
            eps_signed = jnp.where(going_right, eps, -eps)

            # Integrate from the tree's outgoing edge when starting a
            # subtree, else from the last integration point.
            fresh_edge = jax.tree_util.tree_map(
                lambda a, b: jnp.where(going_right, a, b), c.right, c.left
            )
            base = jax.tree_util.tree_map(
                lambda a, b: jnp.where(starting, a, b), fresh_edge, c.sub_last
            )
            new = leapfrog(base, eps_signed, inv_mass)
            energy = total_energy(new, inv_mass)
            delta = energy - energy0  # energy error vs trajectory start
            leaf_div = delta > max_delta_energy
            log_w_leaf = -delta  # multinomial log weight, relative to E0
            accept_stat = jnp.exp(jnp.minimum(-delta, 0.0))

            # Progressive uniform-multinomial proposal update within subtree.
            prev_lw = jnp.where(starting, -jnp.inf, c.sub_log_weight)
            sub_lw = jnp.logaddexp(prev_lw, log_w_leaf)
            p_take = jnp.exp(log_w_leaf - sub_lw)
            p_take = jnp.where(jnp.isnan(p_take), 0.0, p_take)
            take = (~leaf_div) & (u3[1] < p_take)
            sub_proposal = jax.tree_util.tree_map(
                lambda a, b: jnp.where(take, a, b),
                _as_proposal(new),
                c.sub_proposal,
            )

            leaf_idx = jnp.where(starting, 0, c.sub_leaf)  # index of THIS leaf
            sub_r_sum = jnp.where(starting, 0.0, c.sub_r_sum) + new.r

            # Checkpoint bookkeeping: even leaves store, odd leaves check.
            # Stored via a masked full-array write, NOT ``.at[ckpt_idx].set``:
            # under the chain vmap the slot index is a per-chain traced value,
            # so a dynamic-index update lowers to a scatter over
            # (chains, T, D) — serialized row-by-row on TPU and, measured,
            # the dominant bookkeeping cost. The masked write is T-times the
            # bytes of one slot but fully vectorized.
            is_even = (leaf_idx % 2) == 0
            ckpt_idx = _popcount(leaf_idx)
            slots = jnp.arange(max_tree_depth, dtype=jnp.int32)
            hit = ((slots == ckpt_idx) & is_even)[:, None]  # (T, 1)
            r_ckpts = jnp.where(hit, new.r[None, :], c.r_ckpts)
            r_sum_ckpts = jnp.where(hit, sub_r_sum[None, :], c.r_sum_ckpts)
            sub_turn = jnp.where(
                is_even,
                False,
                _leaf_turning_check(
                    leaf_idx, sub_r_sum, new.r, r_ckpts, r_sum_ckpts, inv_mass
                ),
            )

            # Subtree completes when it has 2^depth leaves or stops early.
            target = jnp.left_shift(jnp.asarray(1, jnp.int32), c.depth)
            complete = (leaf_idx + 1 >= target) | sub_turn | leaf_div
            valid = ~sub_turn & ~leaf_div

            # --- merge into the tree (masked; applies where complete) ---
            # Biased progressive transition: favor the new half-trajectory.
            p_move = jnp.exp(jnp.minimum(sub_lw - c.log_weight, 0.0))
            p_move = jnp.where(jnp.isnan(p_move), 0.0, p_move)
            move = complete & valid & (u3[2] < p_move)
            proposal = jax.tree_util.tree_map(
                lambda a, b: jnp.where(move, a, b), sub_proposal, c.proposal
            )
            upd_left = complete & ~going_right
            upd_right = complete & going_right
            left = jax.tree_util.tree_map(
                lambda a, b: jnp.where(upd_left, a, b), new, c.left
            )
            right = jax.tree_util.tree_map(
                lambda a, b: jnp.where(upd_right, a, b), new, c.right
            )
            r_sum_tree = jnp.where(complete, c.r_sum + sub_r_sum, c.r_sum)
            turning_full = _is_turning(r_sum_tree, left.r, right.r, inv_mass)
            turning = jnp.where(
                complete, sub_turn | (valid & turning_full), c.turning
            )
            diverging = jnp.where(complete, leaf_div, c.diverging)
            log_weight = jnp.where(
                complete, jnp.logaddexp(c.log_weight, sub_lw), c.log_weight
            )

            return _NutsCarry(
                left=left,
                right=right,
                proposal=proposal,
                log_weight=log_weight,
                r_sum=r_sum_tree,
                depth=c.depth + complete.astype(jnp.int32),
                turning=turning,
                diverging=diverging,
                sum_accept=c.sum_accept + accept_stat,
                num_leaves=c.num_leaves + 1,
                sub_last=new,
                sub_proposal=sub_proposal,
                sub_log_weight=sub_lw,
                sub_r_sum=sub_r_sum,
                sub_leaf=jnp.where(complete, 0, leaf_idx + 1),
                going_right=going_right,
                r_ckpts=r_ckpts,
                r_sum_ckpts=r_sum_ckpts,
            )

        if static_schedule:
            # Fixed trip count: run 2^max_tree_depth - 1 iterations always,
            # freezing the carry once the dynamic loop would have exited.
            # The wasted iterations still evaluate the (masked-out) leapfrog,
            # keeping any in-likelihood collective schedule uniform.
            def scan_body(c, _):
                active = cond(c)
                c_next = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(active, a, b), body(c), c
                )
                return c_next, None

            tree, _ = jax.lax.scan(
                scan_body, carry0, None, length=(1 << max_tree_depth) - 1
            )
        else:
            tree = jax.lax.while_loop(cond, body, carry0)

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
