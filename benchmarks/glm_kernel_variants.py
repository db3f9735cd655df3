"""Microbenchmark: fused GLM value+grad kernel epilogue variants.

The flagship (glm100_fused, 4096 chains) is vag-bound: benchmarks/
nuts_overhead.py measured 0.335 ms per leapfrog against a ~0.083 ms
matmul-only speed of light, i.e. the elementwise epilogue (VPU+EUP) costs
~3x the MXU work. This harness times kernel-body variants in isolation so
epilogue changes can be evaluated in seconds instead of full NUTS runs.

Variants:
    current   the production kernel in ops/pallas/glm.py (tanh epilogue,
              y kept in-kernel — identical body to tanh_y)
    floor     matmuls only (no transcendentals) — the MXU-bound floor
    tanh_y    sigmoid = 0.5+0.5*tanh(s/2), softplus = max(s,0)-log(0.5+0.5*|h|)
              with r = y - sig kept in-kernel (2 EUP + ~9 ALU passes)
    tanh_hoist same, with y hoisted entirely: kernel accumulates
              sum(softplus) and X^T sigmoid; y^T X z and X^T y are
              data-prep constants (2 EUP + ~8 ALU passes, no y stream)
    exp_hoist current exp formulation but with y hoisted

Run on the real chip:  timeout 1200 python benchmarks/glm_kernel_variants.py
Prints ms/call per variant and numeric max-abs-diff vs the f32 XLA oracle.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mlx_mcmc_tpu.ops.pallas.glm import (
    _fused_kernel,
    _fused_padded_call,
    _pick_chain_tile,
)

N, D, C = 10_000, 100, 4096
N_PAD, D_PAD, C_PAD = 10_240, 128, 4096
K_ITERS = 300


def _accum_init(i, refs):
    @pl.when(i == 0)
    def _():
        for ref in refs:
            ref[:] = jnp.zeros_like(ref)


def floor_kernel(x_ref, y_ref, bt_ref, ll_ref, g_ref):
    """Matmuls only: measures the MXU floor (output is NOT the GLM)."""
    i = pl.program_id(1)
    _accum_init(i, (ll_ref, g_ref))
    x = x_ref[:]
    bt = bt_ref[:]
    s = jnp.dot(x, bt, preferred_element_type=jnp.float32)
    ll_ref[:] += jnp.sum(s, axis=0, keepdims=True)
    g_ref[:] += jax.lax.dot_general(
        x, s.astype(x.dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def tanh_y_kernel(x_ref, y_ref, bt_ref, ll_ref, g_ref):
    """tanh epilogue, y kept in-kernel (r = y - sig cast to bf16)."""
    i = pl.program_id(1)
    _accum_init(i, (ll_ref, g_ref))
    x = x_ref[:]
    y = y_ref[:]
    bt = bt_ref[:]
    s = jnp.dot(x, bt, preferred_element_type=jnp.float32)
    h = jnp.tanh(0.5 * s)
    sig = 0.5 + 0.5 * h
    r = y - sig
    # softplus(s) = max(s,0) - log(sigmoid(|s|)); sigmoid(|s|) = 0.5+0.5*|h|
    sp = jnp.maximum(s, 0.0) - jnp.log(0.5 + 0.5 * jnp.abs(h))
    ll_ref[:] += jnp.sum(y * s - sp, axis=0, keepdims=True)
    g_ref[:] += jax.lax.dot_general(
        x, r.astype(x.dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def tanh_hoist_kernel(x_ref, y_ref, bt_ref, sp_ref, gs_ref):
    """tanh epilogue, y fully hoisted: accumulate sum softplus and X^T sig.
    Wrapper computes ll = (y^T X) z - sp and g = X^T y - gs."""
    i = pl.program_id(1)
    _accum_init(i, (sp_ref, gs_ref))
    x = x_ref[:]
    bt = bt_ref[:]
    s = jnp.dot(x, bt, preferred_element_type=jnp.float32)
    h = jnp.tanh(0.5 * s)
    sig = 0.5 + 0.5 * h
    sp = jnp.maximum(s, 0.0) - jnp.log(0.5 + 0.5 * jnp.abs(h))
    sp_ref[:] += jnp.sum(sp, axis=0, keepdims=True)
    gs_ref[:] += jax.lax.dot_general(
        x, sig.astype(x.dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def exp_hoist_kernel(x_ref, y_ref, bt_ref, sp_ref, gs_ref):
    """Current shared-exp epilogue with y hoisted."""
    i = pl.program_id(1)
    _accum_init(i, (sp_ref, gs_ref))
    x = x_ref[:]
    bt = bt_ref[:]
    s = jnp.dot(x, bt, preferred_element_type=jnp.float32)
    t = jnp.exp(-jnp.abs(s))
    inv1pt = 1.0 / (1.0 + t)
    sig = jnp.where(s >= 0.0, inv1pt, t * inv1pt)
    sp_ref[:] += jnp.sum(
        jnp.log1p(t) + jnp.maximum(s, 0.0), axis=0, keepdims=True
    )
    gs_ref[:] += jax.lax.dot_general(
        x, sig.astype(x.dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


VARIANTS = {
    "current": _fused_kernel,
    "floor": floor_kernel,
    "tanh_y": tanh_y_kernel,
    "tanh_hoist": tanh_hoist_kernel,
    "exp_hoist": exp_hoist_kernel,
}
HOISTED = {"tanh_hoist", "exp_hoist"}


def make_runner(kernel_fn, tile_n):
    @functools.partial(jax.jit, static_argnames=())
    def run(Xp, yp, Bt):
        def body(_, carry):
            bt, acc = carry
            ll, g = _fused_padded_call(Xp, yp, bt, tile_n, False,
                                       kernel_fn=kernel_fn)
            # feed outputs back so nothing folds away
            bt = bt + (1e-30 * g).astype(bt.dtype)
            return bt, acc + jnp.sum(ll)

        bt, acc = jax.lax.fori_loop(
            0, K_ITERS, body, (Bt, jnp.float32(0.0)))
        return acc + jnp.sum(bt.astype(jnp.float32))

    return run


def oracle(X, y, Z):
    def one(z):
        s = X @ z
        sp = jnp.maximum(s, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(s)))
        return jnp.sum(y * s - sp)

    return jax.vmap(jax.value_and_grad(one))(Z)


def main():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(N, D)).astype(np.float32) / np.sqrt(D)
    beta_true = rng.normal(size=(D,)).astype(np.float32)
    p = 1.0 / (1.0 + np.exp(-(X @ beta_true)))
    y = (rng.random(N) < p).astype(np.float32)
    Z = rng.normal(size=(C, D)).astype(np.float32) * 0.5

    Xb = jnp.asarray(X, jnp.bfloat16)
    Xp = jnp.zeros((N_PAD, D_PAD), jnp.bfloat16).at[:N, :D].set(Xb)
    yp = jnp.zeros((N_PAD, 1), jnp.float32).at[:N, 0].set(y)
    Bt = jnp.zeros((D_PAD, C_PAD), jnp.bfloat16).at[:D, :C].set(
        jnp.asarray(Z, jnp.bfloat16).T)

    # numeric oracle on the bf16-rounded design (what the kernel computes)
    Xf = np.asarray(Xp[:N, :D], np.float32)
    ll_ref, g_ref = oracle(jnp.asarray(Xf), jnp.asarray(y),
                           jnp.asarray(np.asarray(
                               Bt[:D, :C].astype(jnp.float32)).T))
    ll_ref = np.asarray(ll_ref)
    g_ref = np.asarray(g_ref)
    yX = Xf.T @ y  # (D,) hoisted constants
    pad_rows = N_PAD - N

    print(f"device={jax.devices()[0]}  shapes: Xp({N_PAD},{D_PAD}) bf16, "
          f"C={C_PAD}, K={K_ITERS}")

    for tile_n in (512, 1024, 2048):
        c_tile = _pick_chain_tile(C_PAD)
        for name, kfn in VARIANTS.items():
            if tile_n != 1024 and name not in ("current", "tanh_hoist",
                                               "tanh_y"):
                continue
            run = make_runner(kfn, tile_n)
            out = float(run(Xp, yp, Bt))  # compile + warm
            times = []
            for _ in range(3):
                t0 = time.time()
                out = float(run(Xp, yp, Bt))
                times.append(time.time() - t0)
            ms = min(times) / K_ITERS * 1e3
            tflops = 4 * N_PAD * D_PAD * C_PAD / (ms * 1e-3) / 1e12

            # numeric check (single call, outside the loop)
            ll_pad, g_pad = jax.jit(
                lambda Xp, yp, Bt: _fused_padded_call(
                    Xp, yp, Bt, tile_n, False, kernel_fn=kfn)
            )(Xp, yp, Bt)
            if name == "floor":
                diff = "n/a"
            else:
                if name in HOISTED:
                    ll = yX @ np.asarray(
                        Bt[:D, :C].astype(jnp.float32)) - (
                        np.asarray(ll_pad[0, :C]) - pad_rows * np.log(2.0))
                    g = yX[:, None] - np.asarray(g_pad[:D, :C])
                else:
                    ll = np.asarray(ll_pad[0, :C]) + pad_rows * np.log(2.0)
                    g = np.asarray(g_pad[:D, :C])
                dll = np.max(np.abs(ll - ll_ref)) / max(
                    1.0, np.max(np.abs(ll_ref)))
                dg = np.max(np.abs(g - g_ref.T)) / max(
                    1.0, np.max(np.abs(g_ref)))
                diff = f"rel_dll={dll:.2e} rel_dg={dg:.2e}"
            print(f"tile_n={tile_n:4d} c_tile={c_tile:4d} {name:10s} "
                  f"{ms:7.3f} ms/call  {tflops:6.1f} TFLOP/s  {diff}")


if __name__ == "__main__":
    main()
