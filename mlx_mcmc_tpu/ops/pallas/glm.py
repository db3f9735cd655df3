"""Fused logistic-GLM log-likelihood + gradient Pallas kernel.

Computes, for a chain batch ``Z`` of coefficient vectors:

    s      = X @ z            (per chain)
    ll     = sum_i y_i s_i - softplus(s_i)
    grad   = X^T (y - sigmoid(s))

in ONE pass over ``X``: each (TILE_N, D) tile of the design matrix is DMA'd
to VMEM once and used for both the forward matmul and the transposed gradient
matmul while resident (XLA's value_and_grad reads X twice — once forward,
once backward). For HBM-bandwidth-bound sizes (X >> VMEM) this halves the
dominant memory traffic of every leapfrog step.

Zero-padding trick instead of masking: rows padded with ``X=0, y=0``
contribute a constant ``-log 2`` to the log-likelihood (``s=0`` independent
of z, so zero gradient); the wrapper subtracts the constant. Chain and
feature axes are padded to lane multiples (128).

Integration: :func:`make_fused_logistic_vag` returns a drop-in
``value_and_grad(flat_log_prob)`` replacement with a ``custom_vmap`` rule, so
the engine's per-chain ``vmap`` dispatches to the batched kernel instead of
re-reading X once per chain.
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_DEFAULT_TILE_N = 1024


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _softplus(s):
    return jnp.maximum(s, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(s)))


def _fused_kernel(x_ref, y_ref, bt_ref, ll_ref, g_ref):
    """Grid ``(c_tiles, n_tiles)``, chain tiles outer / row tiles inner: the
    ``ll``/``g`` output blocks depend only on the outer index, so they stay
    VMEM-resident across the whole inner row sweep and act as accumulators,
    while the (tile_n, c_tile) intermediates stay small enough to pipeline
    (a single monolithic chain block at 4096 chains put 16MB f32 temporaries
    in VMEM and ran slower than XLA's own fusion).

    ``x``/``bt`` may be bfloat16: both MXU contractions then take bf16 inputs
    with f32 accumulation — HALF the HBM traffic of f32 storage. (XLA's own
    autodiff gains nothing from bf16 X because its backward pass upcasts the
    operand.) Sampling then targets the posterior of the bf16-rounded design
    matrix — a model-level rounding (usually far below measurement noise),
    not a sampling-correctness issue, since current and proposed states are
    evaluated identically.

    The elementwise epilogue is the VPU/EUP-bound term that separates this
    kernel from its matmul-only floor (measured 0.357 vs 0.199 ms/call at
    10K x 128 x 4096, benchmarks/glm_kernel_variants.py), so it uses the
    cheapest branch-free formulation found: with ``h = tanh(s/2)``,

        sigmoid(s)  = 0.5 + 0.5*h
        softplus(s) = max(s, 0) - log(0.5 + 0.5*|h|)

    (the second identity is softplus(s) = max(s,0) - log(sigmoid(|s|));
    for |s| large sigmoid(|s|) rounds to 1.0 and the log term returns 0
    with absolute error < 6e-8 — below the bf16 matmul rounding already
    present). Two EUP transcendentals (tanh, log) and no abs/exp/
    reciprocal/select chain: 0.234 ms/call, a 34% kernel speedup over the
    shared-exp epilogue this replaces.
    """
    i = pl.program_id(1)  # inner: row tile

    @pl.when(i == 0)
    def _():
        ll_ref[:] = jnp.zeros_like(ll_ref)
        g_ref[:] = jnp.zeros_like(g_ref)

    x = x_ref[:]  # (TILE_N, Dp): f32, bf16, or int8 (quantized storage)
    if x.dtype == jnp.int8:
        # int8 storage quarters HBM traffic vs f32; per-column scales are
        # folded into the coefficient matrix by the wrapper, so the kernel
        # only dequantizes the tile to bf16 in-register (VPU cast).
        x = x.astype(jnp.bfloat16)
    y = y_ref[:]  # (TILE_N, 1) f32
    bt = bt_ref[:]  # (Dp, c_tile), matches the compute dtype of x

    s = jnp.dot(x, bt, preferred_element_type=jnp.float32)  # (TILE_N, Ct) MXU
    h = jnp.tanh(0.5 * s)
    sig = 0.5 + 0.5 * h
    r = y - sig  # residual (TILE_N, Ct) f32
    softplus = jnp.maximum(s, 0.0) - jnp.log(0.5 + 0.5 * jnp.abs(h))
    ll_tile = jnp.sum(y * s - softplus, axis=0, keepdims=True)

    ll_ref[:] += ll_tile
    # X^T r while the X tile is still in VMEM: (Dp, TILE_N) @ (TILE_N, Ct).
    g_ref[:] += jax.lax.dot_general(
        x,
        r.astype(x.dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _fused_hoisted_kernel(x_ref, y_ref, bt_ref, sp_ref, gs_ref):
    """Hoisted-outcome variant of :func:`_fused_kernel` — measured FASTER but
    REJECTED for production. Kept as the documented negative result.

    The idea: ``y`` enters the likelihood only through ``y^T X z`` and the
    gradient only through ``X^T y``, both hoistable to data-prep constants;
    the kernel then accumulates just ``sum softplus(s)`` and ``X^T sig(s)``
    and the wrapper reconstructs ``ll = (X^T y).z - sum softplus`` and
    ``g = X^T y - X^T sig``. That removes the ``y`` stream and two
    (TILE_N, C) elementwise passes: 0.232 vs 0.244 ms/call at the flagship
    shape (benchmarks/glm_kernel_variants.py), a ~5% kernel win.

    Why it fails END-TO-END (measured, r4): the reconstruction subtracts two
    O(N)-magnitude f32 sums (|y^T X z| and |sum softplus| are each ~N/2 ~
    5e3 at N=10K while ll differences along a trajectory are O(1)), leaving
    ~0.1-0.5 nats of state-dependent rounding noise in the log-likelihood —
    an irreducible energy-error floor. NUTS's dual averaging then shrinks
    the step size trying to reach target_accept against noise that eps
    cannot reduce: adapted trees hit the depth cap (mean depth 6.0 vs 3.0)
    and flagship min-ESS collapsed from 3.6M to 2.1e3 with accept still at
    0.79. Absolute — not relative — ll accuracy is a hard requirement for
    any fused likelihood kernel here; the production ``_fused_kernel``
    accumulates ``y*s - softplus`` in one pass, so its partial sums stay
    O(per-row) and the ll error stays ~1e-2 nats.

    ``y_ref`` is kept in the signature (unused) so both kernels share
    ``_fused_padded_call``.
    """
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        sp_ref[:] = jnp.zeros_like(sp_ref)
        gs_ref[:] = jnp.zeros_like(gs_ref)

    x = x_ref[:]
    if x.dtype == jnp.int8:
        x = x.astype(jnp.bfloat16)
    bt = bt_ref[:]

    s = jnp.dot(x, bt, preferred_element_type=jnp.float32)
    h = jnp.tanh(0.5 * s)
    sig = 0.5 + 0.5 * h
    softplus = jnp.maximum(s, 0.0) - jnp.log(0.5 + 0.5 * jnp.abs(h))
    sp_ref[:] += jnp.sum(softplus, axis=0, keepdims=True)
    gs_ref[:] += jax.lax.dot_general(
        x,
        sig.astype(x.dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _pick_chain_tile(c_pad: int, max_tile: int = 1024) -> int:
    """Largest lane-multiple tile <= max_tile that divides c_pad.

    max_tile stays 1024 — a documented negative result (r5): the flagship
    grid sweep (benchmarks/results/flagship_decomposition.json grid_sweep)
    measured c_tile=4096 ~4% faster per ISOLATED kernel call (0.234 vs
    0.244 ms — one X stream, 4x fewer grid steps), but promoting it
    regressed the flagship END-TO-END 3.09M -> 2.72M min-ESS/s (wall 4.56
    -> 5.2 s): the ~90 MB VMEM budget the 1024x4096 f32 intermediates
    demand starves the surrounding compiled NUTS loop, which the
    300-calls-in-a-fori_loop microbenchmark cannot see. Same lesson as the
    hoisted epilogue (_fused_hoisted_kernel): kernel-in-isolation wins must
    re-prove themselves inside the full sampler before promotion."""
    t = min(c_pad, max_tile)
    while t > _LANE and c_pad % t != 0:
        t -= _LANE
    return t


def _fused_padded_call(
    Xp, yp, Bt, tile_n: int, interpret: bool, kernel_fn=None, c_tile=None
):
    """Pallas call on pre-padded operands: Xp (n_pad, d_pad), yp (n_pad, 1),
    Bt (d_pad, c_pad). Returns (ll_pad (1, c_pad), g_pad (d_pad, c_pad)).
    ``kernel_fn`` selects the likelihood body (logistic default, linear);
    ``c_tile`` overrides the chain-tile width (must divide the padded chain
    count — benchmarks/flagship_decomposition.py sweeps it).

    Grid (c_tiles, n_tiles), chain tiles OUTER: the ll/g accumulator blocks
    depend only on the outer index and stay VMEM-resident across the inner
    row sweep, while the (tile_n, c_tile) intermediates stay pipeline-sized.
    X is re-streamed once per chain tile — for the wide-chain configs where
    c_tiles > 1 the design matrix is small (it fits VMEM many times over),
    and for huge-X configs (glm1000) chain counts keep c_tiles == 1.
    """
    if kernel_fn is None:
        kernel_fn = _fused_kernel
    n_pad, d_pad = Xp.shape
    c_pad = Bt.shape[1]
    if n_pad % tile_n != 0:
        raise ValueError(
            f"padded rows ({n_pad}) not a multiple of tile_n={tile_n}; "
            "the data was prepared with a different tile size"
        )
    if c_tile is None:
        c_tile = _pick_chain_tile(c_pad)
    elif c_pad % c_tile != 0:
        raise ValueError(
            f"c_tile={c_tile} does not divide padded chains ({c_pad})"
        )
    grid = (c_pad // c_tile, n_pad // tile_n)
    # The mosaic default scoped-VMEM budget (16MB) OOMs once the in-kernel
    # (tile_n, c_tile) f32 intermediates cross it. Budget explicitly for the
    # live buffers: x, bt, g, ll plus two (tile_n, c_tile) f32 temporaries
    # (s and r), with double-buffer headroom.
    extra_kwargs = {}
    if not interpret:
        live = (
            tile_n * d_pad * Xp.dtype.itemsize  # x tile
            + 2 * d_pad * c_tile * 4  # bt + g accumulator
            + 2 * tile_n * c_tile * 4  # s, r intermediates
            + c_tile * 4
        )
        extra_kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=min(int(2.5 * live) + (1 << 20), 100 * 1024 * 1024)
        )
    return pl.pallas_call(
        kernel_fn,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (tile_n, d_pad), lambda j, i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_n, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (d_pad, c_tile), lambda j, i: (0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, c_tile), lambda j, i: (0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (d_pad, c_tile), lambda j, i: (0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, c_pad), jnp.float32),
            jax.ShapeDtypeStruct((d_pad, c_pad), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * n_pad * d_pad * c_pad,
            bytes_accessed=n_pad * d_pad * Xp.dtype.itemsize * (c_pad // c_tile)
            + 2 * d_pad * c_pad * 4,
            transcendentals=n_pad * c_pad if kernel_fn is _fused_kernel else 0,
        ),
        interpret=interpret,
        **extra_kwargs,
    )(Xp, yp, Bt)


def _pad_data(X, y, tile_n: int):
    """One-time zero-padding of the design matrix (hoist OUT of hot loops —
    re-padding 100s of MB per leapfrog would dominate the runtime). X keeps
    its dtype (f32 or bf16 — bf16 halves the kernel's HBM traffic)."""
    n, d = X.shape
    n_pad = _round_up(max(n, 8), tile_n)
    d_pad = _round_up(d, _LANE)
    Xp = jnp.zeros((n_pad, d_pad), X.dtype).at[:n, :d].set(X)
    yp = jnp.zeros((n_pad, 1), jnp.float32).at[:n, 0].set(y.astype(jnp.float32))
    return Xp, yp


def _fused_linear_kernel(x_ref, y_ref, bt_ref, ll_ref, g_ref):
    """Gaussian-likelihood sibling of ``_fused_kernel``: accumulates
    ``-0.5 * sum (y - X z)^2`` and ``X^T (y - X z)`` in one X pass (the
    1/noise_scale^2 factor is applied by the wrapper). Zero-padded rows
    contribute exactly nothing (y=0, s=0), so no pad constant is needed.
    Same (c_tiles, n_tiles) grid as the logistic kernel: accumulators reset
    at the start of each inner row sweep."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        ll_ref[:] = jnp.zeros_like(ll_ref)
        g_ref[:] = jnp.zeros_like(g_ref)

    x = x_ref[:]  # f32 or bf16 (no int8: no scale folding for residuals)
    y = y_ref[:]
    bt = bt_ref[:]

    s = jnp.dot(x, bt, preferred_element_type=jnp.float32)
    r = y - s
    ll_ref[:] += -0.5 * jnp.sum(r * r, axis=0, keepdims=True)
    g_ref[:] += jax.lax.dot_general(
        x,
        r.astype(x.dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def fused_linear_value_and_grad(
    X: jnp.ndarray,
    y: jnp.ndarray,
    Z: jnp.ndarray,
    tile_n: int = _DEFAULT_TILE_N,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched fused Gaussian sum-of-squares and gradient (unscaled:
    returns ``-0.5 sum (y - Xz)^2`` and ``X^T (y - Xz)`` per chain).
    Convenience/test entry; the sampler path is :func:`make_fused_linear_vag`.
    """
    n, d = X.shape
    c = Z.shape[0]
    c_pad = _round_up(c, _LANE)
    Xp, yp = _pad_data(jnp.asarray(X), y, tile_n)
    d_pad = Xp.shape[1]
    Bt = jnp.zeros((d_pad, c_pad), Xp.dtype).at[:d, :c].set(Z.astype(Xp.dtype).T)
    ll_pad, g_pad = _fused_padded_call(
        Xp, yp, Bt, tile_n, interpret, kernel_fn=_fused_linear_kernel
    )
    return ll_pad[0, :c], g_pad[:d, :c].T


def make_fused_linear_vag(
    prior_scale: float = 1.0,
    use_pallas: bool | None = None,
    include_prior: bool = True,
):
    """``value_and_grad`` of a Gaussian linear-regression log-posterior
    (N(0, prior_scale) prior), data-aware: ``vag(z, data)`` with ``data``
    from :func:`prepare_fused_linear_data` — which carries the noise scale
    and tile size, so they cannot silently disagree with the factory.
    Same custom_vmap chain-batching as the logistic kernel.

    ``include_prior=False`` returns likelihood-only terms — required for
    data-sharded sampling (``sample_sharded(..., data_axis=...)``), where the
    framework psums the local likelihood contributions and adds the prior
    once via ``log_prior_fn``."""
    import math

    if use_pallas is None:
        use_pallas = jax.default_backend() in ("tpu", "axon")
    inv_prior_var = 1.0 / (prior_scale * prior_scale)

    def _batched(Z, data):
        Xp, yp = data["Xp"], data["yp"]
        d = data["dim"].shape[0]
        tile_n = data["tile"].shape[0]
        c = Z.shape[0]
        if use_pallas:
            c_pad = _round_up(c, _LANE)
            d_pad = Xp.shape[1]
            Bt = jnp.zeros((d_pad, c_pad), Xp.dtype).at[:d, :c].set(
                Z.astype(Xp.dtype).T
            )
            ll_pad, g_pad = _fused_padded_call(
                Xp, yp, Bt, tile_n, False, kernel_fn=_fused_linear_kernel
            )
            ll = ll_pad[0, :c]
            g = g_pad[:d, :c].T
        else:
            X = Xp[:, :d].astype(jnp.float32)
            s = Z @ X.T  # (C, N)
            r = yp[:, 0][None] - s
            ll = -0.5 * jnp.sum(r * r, axis=-1)
            g = r @ X
        inv_noise_var = data["inv_noise_var"]
        ll = ll * inv_noise_var + data["ll_norm"]
        g = g * inv_noise_var
        if not include_prior:
            return ll, g
        d_f = float(d)
        log_prior_norm = -0.5 * d_f * math.log(2.0 * math.pi * prior_scale**2)
        ll = ll + log_prior_norm - 0.5 * inv_prior_var * jnp.sum(Z * Z, axis=-1)
        return ll, g - inv_prior_var * Z

    @jax.custom_batching.custom_vmap
    def vag(z, data):
        ll, g = _batched(z[None], data)
        return ll[0], g[0]

    @vag.def_vmap
    def _vag_vmap(axis_size, in_batched, Z, data):
        del axis_size, in_batched
        ll, g = _batched(Z, data)
        return (ll, g), (True, True)

    return vag


def prepare_fused_linear_data(
    X, y, noise_scale: float = 1.0, tile_n: int = _DEFAULT_TILE_N,
    quantize: str | None = None, num_shards: int = 1,
) -> dict:
    """Pack a linear-regression dataset for :func:`make_fused_linear_vag`.
    (int8 is not offered here — bf16 X is the measured sweet spot and the
    int8 path is VPU-cast-bound anyway; pass bf16 X for halved traffic.)

    The noise scale and tile size travel inside the data pytree (``tile`` is
    a zero-byte shape marker), so the vag factory always agrees with the
    padding.

    ``num_shards``: for data-sharded sampling (``sample_sharded(...,
    data_axis=...)``) set this to the data-axis size. Rows pad to
    ``num_shards * tile_n`` (each shard's local rows stay a tile multiple;
    zero rows contribute exactly nothing to a Gaussian sum-of-squares) and
    the log-normalizer constant is divided by ``num_shards`` so the psum over
    shards adds it back exactly once.
    """
    import math

    if quantize is not None:
        raise ValueError("linear kernel supports f32/bf16 X only")
    X = jnp.asarray(X)
    n, d = X.shape
    Xp, yp = _pad_data(X, jnp.asarray(y), tile_n * num_shards)
    ll_norm = -0.5 * n * math.log(2.0 * math.pi * noise_scale**2) / num_shards
    return {
        "Xp": Xp,
        "yp": yp,
        "ll_norm": jnp.asarray(ll_norm, jnp.float32),
        "inv_noise_var": jnp.asarray(1.0 / noise_scale**2, jnp.float32),
        "dim": jnp.zeros((d,), jnp.float32),
        "tile": jnp.zeros((tile_n, 0), jnp.int8),
    }


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def fused_logistic_value_and_grad(
    X: jnp.ndarray,
    y: jnp.ndarray,
    Z: jnp.ndarray,
    tile_n: int = _DEFAULT_TILE_N,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched fused Bernoulli log-likelihood and gradient.

    Convenience entry that pads per call — for repeated evaluation inside a
    sampler use :func:`make_fused_logistic_vag`, which pads the data once.

    Args:
        X: (N, D) f32 design matrix.
        y: (N,) f32 0/1 outcomes.
        Z: (C, D) f32 chain batch of coefficients.

    Returns:
        (ll (C,), grad (C, D)).
    """
    n, d = X.shape
    c = Z.shape[0]
    c_pad = _round_up(c, _LANE)
    Xp, yp = _pad_data(jnp.asarray(X), y, tile_n)
    d_pad = Xp.shape[1]
    Bt = jnp.zeros((d_pad, c_pad), Xp.dtype).at[:d, :c].set(Z.astype(Xp.dtype).T)
    ll_pad, g_pad = _fused_padded_call(Xp, yp, Bt, tile_n, interpret)
    # Each of the (n_pad - n) zero rows contributed exactly -log(2); add it back.
    ll = ll_pad[0, :c] + (Xp.shape[0] - n) * np.float32(np.log(2.0))
    grad = g_pad[:d, :c].T
    return ll, grad


def _reference_value_and_grad(X, y, Z):
    """jnp fallback (CPU tests / correctness oracle)."""

    def one(z):
        s = X @ z
        return jnp.sum(y * s - _softplus(s))

    return jax.vmap(jax.value_and_grad(one))(Z)


def fused_data_specs(data: dict, data_axis: str):
    """PartitionSpec tree for a fused-GLM data pytree under observation
    sharding (``sample_sharded(..., data_axis=..., data_specs=...)``): the
    row-major operands (``Xp``, ``yp``) shard their leading axis; the
    scalar/marker leaves (``pad_const``, ``dim``, ``tile``, ``col_scale``)
    replicate — the default leading-axis heuristic would wrongly shard the
    shape markers."""
    from jax.sharding import PartitionSpec as P

    return {
        k: (P(data_axis) if k in ("Xp", "yp") else P()) for k in data
    }


def prepare_fused_logistic_data(
    X, y, tile_n: int = _DEFAULT_TILE_N, quantize: str | None = None,
    num_shards: int = 1,
) -> dict:
    """One-time packing of a logistic-GLM dataset for the fused kernel.

    Returns a pytree suitable for ``sample(..., data=...)`` — passing the
    (possibly multi-GB) design matrix as a runtime argument keeps it out of
    the serialized program (closure constants bloat compile payloads and
    cannot be donated/sharded).

    ``quantize``: None keeps ``X``'s dtype (pass bf16 X for 2x traffic);
    'int8' stores symmetric per-column int8 with f32 scales (4x traffic vs
    f32). X ~ Xq * scale[col]; the scales fold into the coefficients, so
    sampling targets the posterior of the quantized design — a model-level
    rounding like bf16, one rung coarser.

    ``num_shards``: for data-sharded sampling set this to the data-axis size.
    Row padding is rounded up to ``num_shards * tile_n`` (each shard's local
    rows stay a tile multiple) and the pad-row correction constant is divided
    by ``num_shards`` — the psum over shards then adds it back exactly once.
    """
    X = jnp.asarray(X)
    n, d = X.shape
    col_scale = None
    if quantize == "int8":
        Xf = X.astype(jnp.float32)
        col_max = jnp.maximum(jnp.max(jnp.abs(Xf), axis=0), 1e-30)
        col_scale = col_max / 127.0
        X = jnp.clip(jnp.round(Xf / col_scale), -127, 127).astype(jnp.int8)
    elif quantize is not None:
        raise ValueError(f"unknown quantize mode: {quantize!r}")
    Xp, yp = _pad_data(X, jnp.asarray(y), tile_n * num_shards)
    data = {
        "Xp": Xp,
        "yp": yp,
        # Divided by num_shards: under observation sharding every shard adds
        # this scalar before the psum, which multiplies it back.
        "pad_const": jnp.asarray(
            (Xp.shape[0] - n) * np.log(2.0) / num_shards, jnp.float32
        ),
        "dim": jnp.zeros((d,), jnp.float32),  # shape-only marker for d
        "tile": jnp.zeros((tile_n, 0), jnp.int8),  # zero-byte tile marker
    }
    if col_scale is not None:
        data["col_scale"] = col_scale
    return data


def make_fused_logistic_vag(
    X: jnp.ndarray = None,
    y: jnp.ndarray = None,
    prior_scale: float = 1.0,
    tile_n: int = _DEFAULT_TILE_N,
    use_pallas: bool | None = None,
    data_aware: bool = False,
    include_prior: bool = True,
) -> Callable:
    """Build ``value_and_grad`` of the full logistic log-posterior
    (likelihood + N(0, prior_scale) prior), with a custom_vmap rule that
    routes the engine's chain-vmap into the batched fused kernel.
    ``include_prior=False`` returns likelihood-only terms (for data-sharded
    sampling, where the prior is added once outside the psum).

    Two modes:
    - closure mode (default): pass ``X``/``y`` here; returns ``vag(z)``.
      Fine for small data; large arrays become compile-time constants.
    - ``data_aware=True``: returns ``vag(z, data)`` with ``data`` from
      :func:`prepare_fused_logistic_data`, for use with
      ``sample(..., data=...)`` — the production path for big datasets.

    ``use_pallas=None`` auto-selects: the compiled kernel on TPU, the jnp
    reference path elsewhere (CPU Pallas only supports interpret mode).
    """
    import math

    if use_pallas is None:
        use_pallas = jax.default_backend() in ("tpu", "axon")
    inv_var = 1.0 / (prior_scale * prior_scale)

    def _prior(z, d):
        log_norm = -0.5 * d * math.log(2.0 * math.pi * prior_scale * prior_scale)
        return log_norm - 0.5 * inv_var * jnp.sum(z * z, axis=-1)

    def _batched_from(Xp, yp, pad_const, d, Z, col_scale=None, call_tile_n=None):
        # int8 storage: X ~ Xq * diag(col_scale), so fold the scales into
        # the coefficients (s = Xq @ (c*z)) and back out of the gradient
        # (dll/dz = diag(c) Xq^T r).
        Z_eff = Z if col_scale is None else Z * col_scale
        if use_pallas:
            c = Z.shape[0]
            c_pad = _round_up(c, _LANE)
            d_pad = Xp.shape[1]
            bt_dtype = jnp.bfloat16 if Xp.dtype == jnp.int8 else Xp.dtype
            Bt = jnp.zeros((d_pad, c_pad), bt_dtype).at[:d, :c].set(
                Z_eff.astype(bt_dtype).T
            )
            ll_pad, g_pad = _fused_padded_call(
                Xp, yp, Bt, call_tile_n or tile_n, False
            )
            ll = ll_pad[0, :c] + pad_const
            g = g_pad[:d, :c].T
        else:
            # Padded rows are zero: they add a constant -log2 each, cancelled
            # by pad_const; their gradient contribution is exactly zero.
            ll, g = _reference_value_and_grad(
                Xp[:, :d].astype(jnp.float32), yp[:, 0], Z_eff
            )
            ll = ll + pad_const
        if col_scale is not None:
            g = g * col_scale
        if not include_prior:
            return ll, g
        return ll + _prior(Z, d), g - inv_var * Z

    if data_aware:

        @jax.custom_batching.custom_vmap
        def vag(z, data):
            d = data["dim"].shape[0]
            ll, g = _batched_from(
                data["Xp"], data["yp"], data["pad_const"], d, z[None],
                data.get("col_scale"),
                call_tile_n=data["tile"].shape[0] if "tile" in data else None,
            )
            return ll[0], g[0]

        @vag.def_vmap
        def _vag_vmap(axis_size, in_batched, Z, data):
            del axis_size, in_batched
            d = data["dim"].shape[0]
            ll, g = _batched_from(
                data["Xp"], data["yp"], data["pad_const"], d, Z,
                data.get("col_scale"),
                call_tile_n=data["tile"].shape[0] if "tile" in data else None,
            )
            return (ll, g), (True, True)

        return vag

    # closure mode
    n, d = X.shape
    if use_pallas:
        Xp, yp = _pad_data(X, y, tile_n)
        pad_const = jnp.asarray((Xp.shape[0] - n) * np.log(2.0), jnp.float32)
    else:
        Xp, yp, pad_const = X, y, None

    def _batched(Z):
        if use_pallas:
            return _batched_from(Xp, yp, pad_const, d, Z)
        ll, g = _reference_value_and_grad(X, y, Z)
        if not include_prior:
            return ll, g
        return ll + _prior(Z, d), g - inv_var * Z

    @jax.custom_batching.custom_vmap
    def vag(z):
        ll, g = _batched(z[None])
        return ll[0], g[0]

    @vag.def_vmap
    def _vag_vmap(axis_size, in_batched, Z):
        del axis_size, in_batched
        ll, g = _batched(Z)
        return (ll, g), (True, True)

    return vag
