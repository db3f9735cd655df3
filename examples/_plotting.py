"""Optional matplotlib helpers for the examples (plots are skipped when
matplotlib or a display/writable directory is unavailable)."""

import os


def maybe_plot_trace(samples, truths, name):
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    try:
        params = list(samples.keys())
        fig, axes = plt.subplots(len(params), 2, figsize=(10, 3 * len(params)))
        if len(params) == 1:
            axes = axes.reshape(1, 2)
        for i, p in enumerate(params):
            xs = samples[p].reshape(-1)
            axes[i, 0].plot(xs[:2000], lw=0.5)
            axes[i, 0].set_title(f"{p} trace")
            axes[i, 1].hist(xs, bins=60, density=True)
            if p in truths:
                axes[i, 1].axvline(truths[p], color="red", ls="--")
            axes[i, 1].set_title(f"{p} posterior")
        fig.tight_layout()
        out = os.path.join(os.path.dirname(__file__), f"{name}.png")
        fig.savefig(out, dpi=80)
        plt.close(fig)
        print(f"  (plot saved to {out})")
    except Exception:
        pass
