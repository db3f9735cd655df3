"""Fused hierarchical-Poisson-regression value+grad Pallas kernel.

The NON-collapsible "Large model" row (models/poisson.py, covariate_dim>0;
VERDICT r4 #3): with per-observation covariates the likelihood

    y_{g,i} ~ Poisson(exp(theta_g + x_{g,i} . beta))

must touch all N = G*n observations per gradient evaluation — the
exponential-family collapse of the rate-only model (ops/suffstats.py) does
not apply. Plain XLA autodiff materializes the (C, N) linear predictor for
the backward pass and runs ~2.8x above even that generous HBM bound
(benchmarks/results/poisson_roofline.json).

Kernel design. Observations are stored group-contiguous, each group padded
to ``ROWS_PER_GROUP = 128`` rows, and the design matrix is augmented with a
CONSTANT block-diagonal expansion matrix ``E`` (row r has a single 1 at its
tile-local group column — identical for every row tile):

    Xa = [X | E]                  (tile_n, K_pad + G_PER)
    Ba = [beta ; theta_tile]      per row tile
    s  = theta_rows + sum_k x_k beta_k        (VPU, exact f32 — see below)
    r  = y - m * exp(s)
    Ga = Xa^T r  = [X^T r ; per-group sums]   (one bf16 MXU matmul)

The gradient matmul folds the per-group segment reduction into the same
contraction that produces ``X^T r`` (E's columns select group members), so
no gather/scatter exists anywhere; the wrapper splits ``Ga`` back into
``dll/dbeta`` (summed over tiles) and ``dll/dtheta`` (concatenated).

PRECISION is the load-bearing decision (measured r5, the hoisted-GLM
lesson at 100K-obs scale): computing ``s`` on the MXU — even "in f32" —
rounds the operands to bf16 and injects ~7 nats of state-dependent
log-likelihood noise, which collapses NUTS adaptation outright (eps driven
to 5e-5, accept 0.06, every tree at the depth cap). The linear predictor
is therefore built on the VPU at exact f32 (theta broadcast over each
group's rows + K broadcast-FMAs), the per-row terms accumulate CENTERED on
per-group baseline rates, and per-tile partials are tree-summed by the
wrapper — total ll noise ~0.02 nats. The gradient, by contrast, tolerates
bf16: a deterministic slightly-rounded force field keeps leapfrog
volume-preserving and reversible, so MH acceptance stays exact.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
ROWS_PER_GROUP = 128  # obs_per_group pads to this
_GROUPS_PER_TILE = 8  # tile_n = 8 * 128 = 1024 rows; aug width 8+8 = 16
_TILE_N = _GROUPS_PER_TILE * ROWS_PER_GROUP


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _poisson_kernel(xa_ref, ym_ref, ba_ref, ll_ref, ga_ref):
    """Grid (c_tiles, n_tiles), chains outer / row tiles inner.

    Both output block indices vary with the inner grid index, so every
    block is written exactly once — no cross-tile accumulator.

    ABSOLUTE-ACCURACY DESIGN (the hoisted-GLM lesson at 100K-obs scale):
    the raw log-likelihood magnitude here is ~2.4e5, and f32 summation of
    100K O(1) terms carries ~0.5-3 nats of order-dependent rounding —
    measured to collapse NUTS acceptance to 0.06 even on the PLAIN XLA
    path (dual averaging shrinks eps against noise eps cannot reduce; eps
    hit 5e-5 with accept 0.46/0.07). The kernel therefore accumulates each
    row's term CENTERED on its group's baseline rate
    ``lamhat_g = mean(y_g)``:

        t_i = y_i (s_i - shat_g) - (lam_i - m_i lamhat_g)

    which is O(residual) per row near the posterior; the hoisted constant
    ``sum_i m_i (y_i shat_g - lamhat_g)`` folds into ``c0`` at data-prep
    time (NO cancellation hazard: both it and c0 are data constants summed
    once in f64-ish numpy at prep, not per evaluation). Partial sums stay
    O(1e2-1e3) instead of O(1e5), and the per-tile partials are
    tree-summed by the wrapper — total f32 noise ~1e-2 nats. The gradient
    is unchanged (constants differentiate to zero)."""
    xa = xa_ref[:]  # (tile_n, A_pad) f32: [X | E]
    y = ym_ref[:, 0:1]  # (tile_n, 1) f32
    m = ym_ref[:, 1:2]  # (tile_n, 1) pad mask
    shat = ym_ref[:, 2:3]  # (tile_n, 1) log baseline rate (0 on pad rows)
    lamhat = ym_ref[:, 3:4]  # (tile_n, 1) baseline rate (0 on pad rows)
    ba = ba_ref[:]  # (A_pad, c_tile): [beta ; theta_tile]

    tile_n = xa.shape[0]
    c_tile = ba.shape[1]
    a_pad = ba.shape[0]
    g_per = tile_n // ROWS_PER_GROUP
    k_pad = a_pad - g_per

    # s at FULL f32 precision on the VPU: the MXU computes f32 matmuls at
    # bf16 OPERAND precision, which rounds theta and x.beta by ~2^-9 and
    # injects ~7 nats of state-dependent log-likelihood noise at this
    # N/count scale (measured; see docstring). theta broadcasts over each
    # group's 128 contiguous rows; the covariate term is k_pad
    # broadcast-FMAs (K is tiny). Total: ~k_pad+1 VPU passes — cheaper
    # than the K-padded-to-128 MXU matmul it replaces.
    theta_rows = jnp.reshape(
        jnp.broadcast_to(
            ba[k_pad:, :][:, None, :], (g_per, ROWS_PER_GROUP, c_tile)
        ),
        (tile_n, c_tile),
    )
    s = theta_rows
    for k in range(k_pad):
        s = s + xa[:, k:k + 1] * ba[k:k + 1, :]
    lam = m * jnp.exp(s)  # masked rate: pad rows contribute exactly 0
    r = y - lam  # residual = d ll / d s
    partial = jnp.sum(
        y * (s - shat) - (lam - lamhat), axis=0, keepdims=True
    )
    # out block is (8, c_tile) - Mosaic needs sublane-divisible blocks;
    # the partial lives in row 0, rows 1..7 are zeros (exact under the
    # wrapper's tree sum).
    rows = jax.lax.broadcasted_iota(jnp.int32, ll_ref.shape, 0)
    ll_ref[:] = jnp.where(rows == 0, partial, 0.0)
    # The gradient matmul stays on the MXU in bf16: a deterministic,
    # slightly-rounded force field keeps leapfrog volume-preserving and
    # reversible, so MH acceptance stays exact (the GLM kernel's bf16
    # gradient argument); E's 1.0 entries are bf16-exact, so the per-group
    # segment sums lose only r's rounding (~0.2% relative).
    ga_ref[:] = jax.lax.dot_general(
        xa.astype(jnp.bfloat16),
        r.astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _poisson_padded_call(Xa, ym, Ba, interpret: bool):
    """Pallas call on padded operands.

    Xa (n_pad, A_pad) augmented design, ym (n_pad, 4)
    [y, mask, shat, lamhat], Ba (n_tiles * A_pad, c_pad) per-tile
    [beta ; theta_tile] stacks -> (ll (n_tiles, c_pad) per-tile centered
    partials, Ga (n_tiles * A_pad, c_pad))."""
    n_pad, a_pad = Xa.shape
    c_pad = Ba.shape[1]
    tile_n = _TILE_N
    n_tiles = n_pad // tile_n
    if n_pad % tile_n != 0 or Ba.shape[0] != n_tiles * a_pad:
        raise ValueError(
            f"bad padded shapes: Xa {Xa.shape}, Ba {Ba.shape} "
            f"(need n_pad % {tile_n} == 0 and Ba rows == n_tiles * A_pad)"
        )
    c_tile = min(c_pad, 1024)
    while c_pad % c_tile != 0:
        c_tile -= _LANE
    grid = (c_pad // c_tile, n_tiles)
    extra = {}
    if not interpret:
        live = (
            tile_n * a_pad * (Xa.dtype.itemsize + 2)  # xa + bf16 copy
            + tile_n * 4 * 4
            + 2 * a_pad * c_tile * 4
            + 6 * tile_n * c_tile * 4  # theta_rows, s, lam, r + bf16 copies
            + 8 * c_tile * 4
        )
        extra["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=min(int(3.0 * live) + (2 << 20),
                                 100 * 1024 * 1024)
        )
    return pl.pallas_call(
        _poisson_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, a_pad), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 4), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((a_pad, c_tile), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, c_tile), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((a_pad, c_tile), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles * 8, c_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles * a_pad, c_pad), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * n_pad * a_pad * c_pad,
            bytes_accessed=n_pad * a_pad * Xa.dtype.itemsize
            * (c_pad // c_tile) + n_tiles * a_pad * c_pad * 4,
            transcendentals=n_pad * c_pad,
        ),
        interpret=interpret,
        **extra,
    )(Xa, ym, Ba)


def prepare_fused_poisson_data(y, X) -> dict:
    """Pack (G, n) counts + (G, n, K) covariates for the fused kernel.

    Each group's observations pad to ``ROWS_PER_GROUP`` rows (mask=0) and
    ``G`` pads to a multiple of the groups-per-tile; the design matrix is
    augmented with the constant block-diagonal expansion columns ``E`` (see
    module docstring). The -sum log(y!) constant folds into ``c0``.
    """
    y = jnp.asarray(y, jnp.float32)
    X = jnp.asarray(X)
    G, n = y.shape
    K = X.shape[-1]
    if n > ROWS_PER_GROUP:
        raise ValueError(
            f"obs_per_group={n} > {ROWS_PER_GROUP}: split groups or raise "
            "ROWS_PER_GROUP"
        )
    g_per = _GROUPS_PER_TILE
    g_pad = _round_up(G, g_per)
    k_pad = _round_up(K, 8)  # sublane multiple; K is tiny
    a_pad = k_pad + g_per
    n_pad = g_pad * ROWS_PER_GROUP

    Xa = jnp.zeros((g_pad, ROWS_PER_GROUP, a_pad), jnp.float32)
    Xa = Xa.at[:G, :n, :K].set(X.astype(jnp.float32))
    # E columns: row of (tile-local) group g gets a 1 at column k_pad + g%g_per
    local = jnp.arange(g_pad) % g_per  # (g_pad,)
    Xa = Xa.at[
        jnp.arange(g_pad)[:, None],
        jnp.arange(ROWS_PER_GROUP)[None, :],
        (k_pad + local)[:, None],
    ].set(1.0)
    # Per-group baseline rates for the centered accumulation (see
    # _poisson_kernel docstring): lamhat_g = mean(y_g) clamped away from 0
    # (an all-zero group would give shat = -inf).
    lamhat = jnp.maximum(jnp.mean(y, axis=1), 1e-3)  # (G,)
    shat = jnp.log(lamhat)
    ym = jnp.zeros((g_pad, ROWS_PER_GROUP, 4), jnp.float32)
    ym = ym.at[:G, :n, 0].set(y)
    ym = ym.at[:G, :n, 1].set(1.0)
    ym = ym.at[:G, :n, 2].set(jnp.broadcast_to(shat[:, None], (G, n)))
    ym = ym.at[:G, :n, 3].set(jnp.broadcast_to(lamhat[:, None], (G, n)))
    # Hoisted centering constant: sum_i m_i (y_i shat_g - lamhat_g) — a
    # data constant computed once here, added back to the ll alongside c0.
    center_const = jnp.sum(y * shat[:, None] - lamhat[:, None])
    return {
        "Xa": Xa.reshape(n_pad, a_pad),
        "ym": ym.reshape(n_pad, 4),
        "c0": -jnp.sum(jax.scipy.special.gammaln(y + 1.0)) + center_const,
        "G": jnp.zeros((G,), jnp.int8),  # shape marker
        "K": jnp.zeros((K,), jnp.int8),  # shape marker
    }


def _assemble_ba(theta_t, beta_t, k_pad, g_per, a_pad, c_pad):
    """Stack per-tile [beta ; theta_tile] blocks: (n_tiles * a_pad, c_pad).

    theta_t (g_pad, c_pad) group log-rates, beta_t (k_pad, c_pad)."""
    g_pad = theta_t.shape[0]
    n_tiles = g_pad // g_per
    theta_blocks = theta_t.reshape(n_tiles, g_per, c_pad)
    beta_blocks = jnp.broadcast_to(
        beta_t[None], (n_tiles, k_pad, c_pad)
    )
    return jnp.concatenate([beta_blocks, theta_blocks], axis=1).reshape(
        n_tiles * a_pad, c_pad
    )


def make_fused_poisson_vag(
    prior_mu_scale: float = 5.0,
    prior_log_tau_scale: float = 1.0,
    use_pallas: bool | None = None,
):
    """``value_and_grad`` of the non-centered hierarchical Poisson
    REGRESSION log-posterior over the flat vector
    ``z = [beta(K), log_tau, mu, theta_raw(G)]`` (ravel_pytree's
    alphabetical dict order for models/poisson.py params), consuming
    :func:`prepare_fused_poisson_data` output: ``vag(z, data)``.

    The kernel returns the data terms (ll, dll/dtheta, dll/dbeta); this
    wrapper applies the non-centered chain rule (theta = mu + tau *
    theta_raw) and the standard priors — all (C, G) elementwise. Same
    custom_vmap chain-batching contract as the GLM kernel.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() in ("tpu", "axon")
    inv_mu_var = 1.0 / (prior_mu_scale * prior_mu_scale)
    inv_lt_var = 1.0 / (prior_log_tau_scale * prior_log_tau_scale)
    log_norm = -math.log(prior_mu_scale) - math.log(prior_log_tau_scale)

    def _batched(Z, data):
        G = data["G"].shape[0]
        K = data["K"].shape[0]
        C = Z.shape[0]
        beta = Z[:, :K]  # (C, K)
        log_tau = Z[:, K]
        mu = Z[:, K + 1]
        theta_raw = Z[:, K + 2:]  # (C, G)
        tau = jnp.exp(log_tau)
        theta = mu[:, None] + tau[:, None] * theta_raw  # (C, G)

        k_pad = _round_up(K, 8)
        g_per = _GROUPS_PER_TILE
        a_pad = k_pad + g_per
        if use_pallas:
            n_pad = data["Xa"].shape[0]
            g_pad = n_pad // ROWS_PER_GROUP
            n_tiles = g_pad // g_per
            c_pad = _round_up(C, _LANE)
            theta_t = jnp.zeros((g_pad, c_pad), jnp.float32).at[:G, :C].set(
                theta.T
            )
            beta_t = jnp.zeros((k_pad, c_pad), jnp.float32).at[:K, :C].set(
                beta.T
            )
            Ba = _assemble_ba(theta_t, beta_t, k_pad, g_per, a_pad, c_pad)
            ll_tiles, Ga = _poisson_padded_call(
                data["Xa"], data["ym"], Ba, False
            )
            # tree-sum the per-tile centered partials (see _poisson_kernel)
            ll = jnp.sum(ll_tiles[:, :C], axis=0) + data["c0"]
            Ga = Ga.reshape(n_tiles, a_pad, c_pad)
            g_beta = jnp.sum(Ga[:, :K, :C], axis=0).T  # (C, K)
            r_theta = Ga[:, k_pad:, :].reshape(g_pad, c_pad)[:G, :C].T
        else:
            Xf = data["Xa"].astype(jnp.float32)  # (n_pad, a_pad)
            y = data["ym"][:, 0]
            m = data["ym"][:, 1]
            shat = data["ym"][:, 2]
            lamhat = data["ym"][:, 3]
            g_pad = Xf.shape[0] // ROWS_PER_GROUP
            theta_rows = jnp.repeat(
                jnp.pad(theta, ((0, 0), (0, g_pad - G))), ROWS_PER_GROUP,
                axis=1,
            )  # (C, n_pad)
            # precision=HIGHEST: the default MXU f32 matmul rounds operands
            # to bf16, which injects fatal log-likelihood noise at this
            # N/count scale (see _poisson_kernel docstring)
            s = theta_rows + jnp.dot(
                beta, Xf[:, :K].T, precision=jax.lax.Precision.HIGHEST
            )
            lam = m[None, :] * jnp.exp(s)
            r = y[None, :] - lam
            # same centered accumulation as the kernel (f32 noise parity)
            ll = jnp.sum(
                y[None, :] * (s - shat[None, :]) - (lam - lamhat[None, :]),
                axis=-1,
            ) + data["c0"]
            r_theta = jnp.sum(
                r.reshape(C, g_pad, ROWS_PER_GROUP), axis=-1
            )[:, :G]
            g_beta = r @ Xf[:, :K]

        half_log2pi = 0.5 * math.log(2.0 * math.pi)
        lp = (
            ll
            + log_norm
            - 0.5 * K * math.log(2.0 * math.pi)  # beta prior norm
            - (2.0 + G) * half_log2pi
            - 0.5 * inv_mu_var * mu * mu
            - 0.5 * inv_lt_var * log_tau * log_tau
            - 0.5 * jnp.sum(theta_raw * theta_raw, axis=-1)
            - 0.5 * jnp.sum(beta * beta, axis=-1)
        )
        g_mu = jnp.sum(r_theta, axis=-1) - inv_mu_var * mu
        g_log_tau = (
            tau * jnp.sum(r_theta * theta_raw, axis=-1)
            - inv_lt_var * log_tau
        )
        g_theta_raw = tau[:, None] * r_theta - theta_raw
        g_beta = g_beta - beta
        grad = jnp.concatenate(
            [g_beta, g_log_tau[:, None], g_mu[:, None], g_theta_raw], axis=1
        )
        return lp, grad

    @jax.custom_batching.custom_vmap
    def vag(z, data):
        ll, g = _batched(z[None], data)
        return ll[0], g[0]

    @vag.def_vmap
    def _vag_vmap(axis_size, in_batched, Z, data):
        del axis_size
        z_batched, data_batched = in_batched
        if not z_batched or any(jax.tree_util.tree_leaves(data_batched)):
            raise NotImplementedError(
                "make_fused_poisson_vag's custom_vmap rule supports only "
                "vmap-over-z with replicated data (the engine's chain "
                f"batching); got in_batched={in_batched!r}"
            )
        ll, g = _batched(Z, data)
        return (ll, g), (True, True)

    return vag


def make_fused_poisson_model(
    prior_mu_scale: float = 5.0,
    prior_log_tau_scale: float = 1.0,
    use_pallas: bool | None = None,
):
    """``(log_prob, value_and_grad_fn)`` bound to one set of prior scales
    (same contract as the ops/suffstats.py factories — the density and
    gradient halves cannot diverge)."""
    vag = make_fused_poisson_vag(
        prior_mu_scale=prior_mu_scale,
        prior_log_tau_scale=prior_log_tau_scale,
        use_pallas=use_pallas,
    )

    def log_prob(params, data):
        from mlx_mcmc_tpu.ops.ravel import ravel_params

        z, _ = ravel_params(params)
        ll, _ = vag(z, data)
        return ll

    return log_prob, vag
