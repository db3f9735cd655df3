"""Decompose the flagship fused-GLM kernel's gap to hardware peak.

VERDICT r4 #2: at the flagship shape (Xp 10240x128 bf16, C=4096) the
matmul-only "floor" kernel measured 0.205 ms/call while the padded pure-FLOP
time is ~109 us (4*N_PAD*D_PAD*C_PAD = 2.15e10 FLOP at 197 TFLOP/s bf16) —
the floor itself sits near 50% of peak, and glm1000 proves 78.5% is
reachable on the same kernel. This harness splits that 2x into measurable
parts:

  A. op-level ablation at the flagship shape: matmul1+reduce only, both
     matmuls without the f32->bf16 cast, without the ll reduction, the
     production tanh epilogue, and an explicitly row-split variant (ILP
     probe: does Mosaic already overlap VPU epilogue with MXU work?).
  B. fixed-FLOP contraction-depth sweep: (D_PAD, N_PAD) in {(128,10240),
     (256,5120), (512,2560), (1024,1280)} at C=4096 — same total FLOPs,
     deeper MXU contractions, proportionally less epilogue per FLOP. This
     isolates how much of the loss is structural to D_PAD=128.
  C. grid-shape sweep: (tile_n, c_tile) over the VMEM-feasible grid —
     isolates per-grid-step overhead (fewer, bigger steps) vs pipeline
     headroom.

Every variant also reports useful-MFU (useful FLOPs 4*N*D*C over the padded
ones) so the K=100->128 lane-padding share (22%) stays visible.

Run on the real chip:
    timeout 3600 python benchmarks/flagship_decomposition.py
Writes benchmarks/results/flagship_decomposition.json.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from mlx_mcmc_tpu.ops.pallas.glm import (
    _fused_kernel,
    _fused_padded_call,
)

N, D, C = 10_000, 100, 4096
C_PAD = 4096
K_ITERS = 300
PEAK_BF16_TFLOPS = 197.0


def _accum_init(i, refs):
    @pl.when(i == 0)
    def _():
        for ref in refs:
            ref[:] = jnp.zeros_like(ref)


# ---------------------------------------------------------------- variants
def mm1_sum_kernel(x_ref, y_ref, bt_ref, ll_ref, g_ref):
    """First matmul + row reduction only (half the FLOPs of the pair)."""
    i = pl.program_id(1)
    _accum_init(i, (ll_ref, g_ref))
    s = jnp.dot(x_ref[:], bt_ref[:], preferred_element_type=jnp.float32)
    ll_ref[:] += jnp.sum(s, axis=0, keepdims=True)


def floor_kernel(x_ref, y_ref, bt_ref, ll_ref, g_ref):
    """Both matmuls + cast + reduction (the r4 'floor')."""
    i = pl.program_id(1)
    _accum_init(i, (ll_ref, g_ref))
    x = x_ref[:]
    s = jnp.dot(x, bt_ref[:], preferred_element_type=jnp.float32)
    ll_ref[:] += jnp.sum(s, axis=0, keepdims=True)
    g_ref[:] += jax.lax.dot_general(
        x, s.astype(x.dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def floor_nosum_kernel(x_ref, y_ref, bt_ref, ll_ref, g_ref):
    """Both matmuls + cast, no ll reduction."""
    i = pl.program_id(1)
    _accum_init(i, (ll_ref, g_ref))
    x = x_ref[:]
    s = jnp.dot(x, bt_ref[:], preferred_element_type=jnp.float32)
    g_ref[:] += jax.lax.dot_general(
        x, s.astype(x.dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def mm1_pair_kernel(x_ref, y_ref, bt_ref, ll_ref, g_ref):
    """Two back-to-back K=128 matmuls (the second consumes the first's
    output as its weight operand after a cast) — same MXU op count as the
    floor but both contractions at K=D_PAD, measuring whether the SECOND
    matmul's deep-K shape (K=tile_n) is what the floor gains over this."""
    i = pl.program_id(1)
    _accum_init(i, (ll_ref, g_ref))
    x = x_ref[:]
    s = jnp.dot(x, bt_ref[:], preferred_element_type=jnp.float32)
    ll_ref[:] += jnp.sum(s, axis=0, keepdims=True)
    s2 = jnp.dot(x, bt_ref[:] + ll_ref[0:1, :].astype(bt_ref.dtype),
                 preferred_element_type=jnp.float32)
    ll_ref[:] += jnp.sum(s2, axis=0, keepdims=True)


def split2_kernel(x_ref, y_ref, bt_ref, ll_ref, g_ref):
    """Production tanh epilogue with the row tile split in two independent
    halves — explicit instruction-level parallelism so the scheduler can
    overlap half B's matmul with half A's VPU epilogue."""
    i = pl.program_id(1)
    _accum_init(i, (ll_ref, g_ref))
    bt = bt_ref[:]
    half = x_ref.shape[0] // 2
    for k in range(2):
        x = x_ref[k * half:(k + 1) * half, :]
        y = y_ref[k * half:(k + 1) * half, :]
        s = jnp.dot(x, bt, preferred_element_type=jnp.float32)
        h = jnp.tanh(0.5 * s)
        sig = 0.5 + 0.5 * h
        r = y - sig
        sp = jnp.maximum(s, 0.0) - jnp.log(0.5 + 0.5 * jnp.abs(h))
        ll_ref[:] += jnp.sum(y * s - sp, axis=0, keepdims=True)
        g_ref[:] += jax.lax.dot_general(
            x, r.astype(x.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


VARIANTS = {
    "mm1_sum": mm1_sum_kernel,
    "mm1_pair": mm1_pair_kernel,
    "floor_nosum": floor_nosum_kernel,
    "floor": floor_kernel,
    "current": _fused_kernel,
    "split2": split2_kernel,
}


def make_runner(kernel_fn, tile_n, c_tile):
    @jax.jit
    def run(Xp, yp, Bt):
        def body(_, carry):
            bt, acc = carry
            ll, g = _fused_padded_call(
                Xp, yp, bt, tile_n, False, kernel_fn=kernel_fn, c_tile=c_tile
            )
            bt = bt + (1e-30 * g).astype(bt.dtype)
            return bt, acc + jnp.sum(ll)

        bt, acc = jax.lax.fori_loop(0, K_ITERS, body, (Bt, jnp.float32(0.0)))
        return acc + jnp.sum(bt.astype(jnp.float32))

    return run


def time_call(run, Xp, yp, Bt):
    out = float(run(Xp, yp, Bt))  # compile + warm
    del out
    times = []
    for _ in range(3):
        t0 = time.time()
        float(run(Xp, yp, Bt))
        times.append(time.time() - t0)
    return min(times) / K_ITERS * 1e3  # ms/call


def make_operands(n_pad, d_pad, c_pad, seed=0):
    rng = np.random.default_rng(seed)
    Xp = jnp.asarray(
        rng.normal(size=(n_pad, d_pad)).astype(np.float32) / np.sqrt(d_pad),
        jnp.bfloat16,
    )
    yp = jnp.asarray((rng.random((n_pad, 1)) < 0.5).astype(np.float32))
    Bt = jnp.asarray(
        0.5 * rng.normal(size=(d_pad, c_pad)).astype(np.float32), jnp.bfloat16
    )
    return Xp, yp, Bt


def measure_xla_ceiling():
    """Ground-truth the ACHIEVABLE matmul throughput on this chip through
    this stack: the datasheet 197 TF/s bf16 is a bound nothing reaches —
    XLA's own 8192^3 bf16 matmul is the practical ceiling, and XLA's native
    matmul at the flagship's shallow-K shape is the do-nothing baseline the
    fused kernel replaces."""
    rows = []
    for m, k, n in ((8192, 8192, 8192), (4096, 4096, 4096),
                    (10240, 128, 4096)):
        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
        b = jnp.asarray(rng.normal(size=(k, n)), jnp.bfloat16)

        @jax.jit
        def f(a, b):
            def body(_, c):
                b2, acc = c
                s = jnp.dot(a, b2, preferred_element_type=jnp.float32)
                upd = (
                    1e-30 * s[:k] if s.shape[0] >= k
                    else 1e-30 * jnp.zeros_like(b2)
                )
                return b2 + upd.astype(b2.dtype), acc + jnp.sum(s)

            _, acc = jax.lax.fori_loop(0, 100, body, (b, jnp.float32(0)))
            return acc

        float(f(a, b))
        t0 = time.time()
        float(f(a, b))
        dt = (time.time() - t0) / 100
        rows.append({
            "shape": f"{m}x{k}x{n}",
            "ms": round(dt * 1e3, 3),
            "tflops": round(2 * m * k * n / dt / 1e12, 1),
            "pct_of_datasheet_peak": round(
                100 * 2 * m * k * n / dt / 1e12 / PEAK_BF16_TFLOPS, 1),
        })
        print(f"[ceiling] {rows[-1]}", flush=True)
    return rows


def main():
    print(f"device={jax.devices()[0]}")
    out = {
        "shape": {"N": N, "D": D, "C": C, "N_PAD": 10240, "D_PAD": 128},
        "peak_bf16_tflops": PEAK_BF16_TFLOPS,
        "xla_ceiling": measure_xla_ceiling(),
        "ablation": [],
        "depth_sweep": [],
        "grid_sweep": [],
    }

    # ---- A: op-level ablation at the flagship shape --------------------
    n_pad, d_pad = 10240, 128
    Xp, yp, Bt = make_operands(n_pad, d_pad, C_PAD)
    flops = 4 * n_pad * d_pad * C_PAD
    useful = 4 * N * D * C
    for name, kfn in VARIANTS.items():
        try:
            ms = time_call(make_runner(kfn, 1024, None), Xp, yp, Bt)
        except Exception as e:
            out["ablation"].append(
                {"variant": name, "error": type(e).__name__}
            )
            print(f"[ablation] {name}: {type(e).__name__}", flush=True)
            continue
        f = flops // 2 if name == "mm1_sum" else flops
        row = {
            "variant": name,
            "ms_per_call": round(ms, 4),
            "padded_tflops": round(f / (ms * 1e-3) / 1e12, 1),
            "pct_of_peak": round(100 * f / (ms * 1e-3) / 1e12 / PEAK_BF16_TFLOPS, 1),
            "useful_mfu_pct": round(
                100 * (useful * (f / flops)) / (ms * 1e-3) / 1e12 / PEAK_BF16_TFLOPS, 1
            ),
        }
        out["ablation"].append(row)
        print(f"[ablation] {name:14s} {ms:7.3f} ms  {row['padded_tflops']:6.1f} "
              f"TF/s  {row['pct_of_peak']:5.1f}% peak", flush=True)

    # ---- B: fixed-FLOP contraction-depth sweep -------------------------
    for d_pad_s, n_pad_s in ((128, 10240), (256, 5120), (512, 2560),
                             (1024, 1280)):
        tile = max(t for t in (256, 512, 1024) if n_pad_s % t == 0)
        Xs, ys, Bs = make_operands(n_pad_s, d_pad_s, C_PAD, seed=1)
        for name in ("floor", "current"):
            ms = time_call(make_runner(VARIANTS[name], tile, None), Xs, ys, Bs)
            f = 4 * n_pad_s * d_pad_s * C_PAD
            row = {
                "D_PAD": d_pad_s, "N_PAD": n_pad_s, "variant": name,
                "ms_per_call": round(ms, 4),
                "padded_tflops": round(f / (ms * 1e-3) / 1e12, 1),
                "pct_of_peak": round(
                    100 * f / (ms * 1e-3) / 1e12 / PEAK_BF16_TFLOPS, 1),
            }
            out["depth_sweep"].append(row)
            print(f"[depth] D_PAD={d_pad_s:5d} N_PAD={n_pad_s:6d} {name:8s} "
                  f"{ms:7.3f} ms  {row['pct_of_peak']:5.1f}% peak", flush=True)

    # ---- C: grid-shape sweep at the flagship shape ---------------------
    for tile_n in (512, 1024, 2048, 2560, 5120):
        for c_tile in (512, 1024, 2048, 4096):
            if 10240 % tile_n:
                continue
            # s,r intermediates: 2 * tile_n * c_tile * 4 bytes; stay <= 64MB
            if 2 * tile_n * c_tile * 4 > 64 * 1024 * 1024:
                continue
            try:
                ms = time_call(
                    make_runner(_fused_kernel, tile_n, c_tile), Xp, yp, Bt
                )
            except Exception as e:  # VMEM OOM and friends: record, move on
                out["grid_sweep"].append({
                    "tile_n": tile_n, "c_tile": c_tile,
                    "error": type(e).__name__,
                })
                print(f"[grid] tile_n={tile_n} c_tile={c_tile}: "
                      f"{type(e).__name__}", flush=True)
                continue
            steps = (C_PAD // c_tile) * (n_pad // tile_n)
            row = {
                "tile_n": tile_n, "c_tile": c_tile, "grid_steps": steps,
                "ms_per_call": round(ms, 4),
                "pct_of_peak": round(
                    100 * flops / (ms * 1e-3) / 1e12 / PEAK_BF16_TFLOPS, 1),
            }
            out["grid_sweep"].append(row)
            print(f"[grid] tile_n={tile_n:5d} c_tile={c_tile:5d} "
                  f"steps={steps:3d} {ms:7.3f} ms  "
                  f"{row['pct_of_peak']:5.1f}% peak", flush=True)

    out["interpretation"] = (
        "The r4 story ('floor 0.205 ms vs ~109 us pure-FLOP time = 2.5x "
        "headroom') measured the gap against the DATASHEET 197 TF/s, which "
        "nothing on this chip reaches through this stack: XLA's own 8192^3 "
        "bf16 matmul sustains ~144 TF/s (xla_ceiling) — the practical "
        "compute ceiling. Against it, the fused kernel's matmul core "
        "(floor, ~105 TF/s) already runs at ~73%; XLA's native matmul at "
        "the flagship's shallow-K shape manages ~21 TF/s, i.e. the Pallas "
        "kernel is ~5x the compiler baseline. Decomposition of the "
        "remaining ~27%: (a) per-call ramp + per-grid-step overhead — "
        "mm1_sum (one shallow matmul + reduce) takes ~153 us where its "
        "FLOPs are 54 us, yet adding a SECOND matmul costs only ~its pure "
        "FLOP time (mm1_pair, floor): the fixed cost is paid once per "
        "step sweep, not per matmul; (b) the tanh/log epilogue adds ~39 us "
        "at D_PAD=128 and fully hides at D_PAD>=256 (depth_sweep: "
        "'current' == 'floor' there), so it is structural to the 100-param "
        "shape; (c) K=100->128 lane padding discounts useful MFU by 22%. "
        "The depth_sweep shows ~50-53% of datasheet (~70% of achievable) "
        "at EVERY (D_PAD, N_PAD) factorization of the same FLOPs — the "
        "loss is not contraction depth. Grid sweep: c_tile=4096 (X "
        "streamed once, 10 grid steps) is the best shape at ~0.234 ms "
        "(~4% over the r4 default c_tile=1024) per ISOLATED call — but "
        "promoting it regressed the flagship end-to-end 3.09M -> 2.72M "
        "min-ESS/s (its ~90 MB VMEM budget starves the surrounding NUTS "
        "loop; production stays at c_tile=1024, see _pick_chain_tile). "
        "NOTE on 'glm1000 proves 78.5%': that figure is MFU against "
        "glm1000's BANDWIDTH roofline bound (utils/roofline.py takes "
        "min(peak, AI*BW)), not against peak FLOP/s — it does not witness "
        "a reachable 78% compute MFU at the flagship shape."
    )
    os.makedirs(os.path.join(os.path.dirname(__file__), "results"),
                exist_ok=True)
    path = os.path.join(os.path.dirname(__file__), "results",
                        "flagship_decomposition.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
