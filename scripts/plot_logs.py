"""Plot training curves from a run directory's metrics.jsonl.

Usage: python scripts/plot_logs.py checkpoints/exp/<timestamp> [out.png]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path


def main() -> None:
    run_dir = Path(sys.argv[1])
    out = Path(sys.argv[2]) if len(sys.argv) > 2 else run_dir / "curves.png"
    iters, losses = [], []
    epochs, val = {}, {}
    for line in open(run_dir / "metrics.jsonl"):
        ev = json.loads(line)
        if ev.get("event") == "train_iter":
            iters.append(ev["step"])
            losses.append(ev["loss"])
        elif ev.get("event") == "epoch":
            for k, v in ev.items():
                if k in ("event", "t", "epoch"):
                    continue
                val.setdefault(k, []).append(v)
            epochs.setdefault("epoch", []).append(ev["epoch"])

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(11, 4))
    axes[0].plot(iters, losses, lw=0.7)
    axes[0].set_title("train loss")
    axes[0].set_xlabel("step")
    xs = epochs.get("epoch", [])
    for k, vs in val.items():
        if k == "train_loss":
            continue
        axes[1].plot(xs, vs, label=k, marker="o", ms=3)
    axes[1].set_title("validation metrics")
    axes[1].set_xlabel("epoch")
    axes[1].legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
