"""Roofline / MFU accounting for sampler hot ops.

The reference has no performance tooling at all (SURVEY.md §5.1 — ad-hoc
``time.time()`` calls in examples). Here the bench and user code share one
accounting path: known single-chip peaks per TPU generation, flop/byte
models for the GLM value+grad hot op, and a report combining achieved
throughput with the bandwidth-or-compute roofline bound.

Peaks are public per-chip numbers (bf16 matmul peak; the MXU computes f32
matmuls at bf16 operand precision by default, so one peak covers both
storage dtypes).
"""

from __future__ import annotations

from typing import Optional, Tuple

# device_kind substring -> (peak TFLOP/s, HBM GB/s)
DEVICE_PEAKS = {
    "v5 lite": (197.0, 819.0),
    "v5e": (197.0, 819.0),
    "v4": (275.0, 1228.0),
    "v5p": (459.0, 2765.0),
    "v6 lite": (918.0, 1640.0),
    "v6e": (918.0, 1640.0),
}


def device_peaks(device) -> Tuple[Optional[float], Optional[float]]:
    """(peak TFLOP/s, HBM GB/s) for a jax Device, or (None, None)."""
    kind = getattr(device, "device_kind", "").lower()
    for sub, peaks in DEVICE_PEAKS.items():
        if sub in kind:
            return peaks
    return (None, None)


def glm_vag_flops(num_obs: int, num_features: int, chains: int = 1) -> float:
    """Flops of ONE fused GLM value+grad evaluation: forward (N,D)@(D,C)
    plus backward X^T r — 4*N*D per chain."""
    return 4.0 * num_obs * num_features * chains


def glm_vag_bytes(
    num_obs: int, num_features: int, itemsize: int = 4, x_reads: float = 1.0
) -> float:
    """Dominant HBM bytes of one evaluation: the design-matrix stream.
    ``x_reads``: 1 for the fused single-pass kernel, 2 for XLA's autodiff
    (forward + backward each stream X)."""
    return num_obs * num_features * itemsize * x_reads


def roofline_report(
    flops: float,
    bytes_accessed: float,
    wall_seconds: float,
    device,
) -> dict:
    """Achieved TFLOP/s, MFU %, arithmetic intensity, and the roofline bound
    ``min(peak, AI * bandwidth)`` with the achieved fraction of that bound."""
    achieved_tflops = flops / wall_seconds / 1e12
    out = {"achieved_tflops": round(achieved_tflops, 2)}
    peak_tflops, hbm_gbs = device_peaks(device)
    if peak_tflops:
        ai = flops / max(bytes_accessed, 1.0)
        bound = min(peak_tflops, ai * hbm_gbs / 1e3)
        out.update(
            mfu_pct=round(100.0 * achieved_tflops / peak_tflops, 2),
            arithmetic_intensity=round(ai, 1),
            roofline_bound_tflops=round(bound, 1),
            roofline_frac_pct=round(100.0 * achieved_tflops / bound, 2),
            peak_tflops=peak_tflops,
            hbm_gbs=hbm_gbs,
        )
    return out
