"""Checkpoint/resume for sampler runs (absent in the reference: samples only
ever accumulate in Python lists, SURVEY.md §5.4). Both phases are resumable:
post-warmup (``resume``) and mid-warmup (``run_warmup``/``resume_warmup``,
bit-identical to the uninterrupted run)."""

from mlx_mcmc_tpu.io.checkpoint import (
    load_checkpoint,
    resume,
    resume_warmup,
    run_warmup,
    save_checkpoint,
)

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "resume",
    "run_warmup",
    "resume_warmup",
]
