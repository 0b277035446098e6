"""Training callbacks: best-val checkpointing, early stopping, history.

Equivalents of the reference's custom callback objects
(trainer.py:175-245): ModelCheckpoint saves on validation improvement
beyond min_delta; EarlyStopping counts non-improving epochs against a
patience; History accumulates per-epoch (train, val, lr) rows and can
export CSV + loss-curve PNGs (trainer.py:248-277) and the hyperparameter
JSON dump (trainer.py:280-298, 'hiperparametros.json' — filename kept for
artifact parity).
"""

from __future__ import annotations

import json
import math
import os
from typing import Any, Callable


class BestCheckpoint:
    """Save via `save_fn` whenever val loss improves by more than min_delta."""

    def __init__(self, save_fn: Callable[[], None], min_delta: float = 0.0):
        self.save_fn = save_fn
        self.min_delta = min_delta
        self.best = math.inf

    def update(self, val_loss: float) -> bool:
        if val_loss < self.best - self.min_delta:
            self.best = val_loss
            self.save_fn()
            return True
        return False


class EarlyStopping:
    """Stop after `patience` epochs without val improvement (trainer.py:208-225)."""

    def __init__(self, patience: int = 20, min_delta: float = 0.0):
        self.patience = patience
        self.min_delta = min_delta
        self.best = math.inf
        self.count = 0

    def update(self, val_loss: float) -> bool:
        """Returns True when training should stop."""
        if val_loss < self.best - self.min_delta:
            self.best = val_loss
            self.count = 0
        else:
            self.count += 1
        return self.count >= self.patience


class History:
    """Per-epoch metric rows; exportable to CSV/JSON and matplotlib PNGs."""

    def __init__(self):
        self.rows: list[dict[str, float]] = []

    def append(self, **metrics: float):
        self.rows.append({k: float(v) for k, v in metrics.items()})

    def to_csv(self, path: str):
        if not self.rows:
            return
        keys = list(self.rows[0])
        with open(path, "w") as f:
            f.write(",".join(["epoch"] + keys) + "\n")
            for i, row in enumerate(self.rows):
                cells = [str(row[k]) if k in row else "" for k in keys]
                f.write(",".join([str(i)] + cells) + "\n")

    def plot(self, folder: str, name: str):
        """Loss-curve PNGs (reference plot_graphs, trainer.py:248-277)."""
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:
            return
        os.makedirs(folder, exist_ok=True)
        keys = [k for k in (self.rows[0] if self.rows else {}) if k != "lr"]
        fig, ax = plt.subplots()
        for k in keys:
            ax.plot([r.get(k) for r in self.rows], label=k)
        ax.set_xlabel("epoch")
        ax.set_ylabel("loss")
        ax.legend()
        fig.savefig(os.path.join(folder, f"{name}_losses.png"), dpi=120)
        plt.close(fig)


def save_hyperparameters(folder: str, **params: Any):
    """Dump run hyperparameters to JSON (reference params_saver)."""
    os.makedirs(folder, exist_ok=True)
    with open(os.path.join(folder, "hiperparametros.json"), "w") as f:
        json.dump(params, f, indent=2, default=str)


__all__ = ["BestCheckpoint", "EarlyStopping", "History", "save_hyperparameters"]
