"""Optimizers and LR schedules (optax).

Covers the reference's optimizer menu — Adam / Nadam / SGD
(main_training.py:164-169) and LAMB (trainer.py:31-38, tfa) — and both of
its exponential decay-after-epoch-N schedules:

* main_training.py:342-344:  lr(e) = lr0 * 0.9 ** (e / N)      for e >= N
* trainer.py:59-62:          lr(e) = lr0 * exp(-0.25 * (e - N)) for e >  N

Learning rate is injected per-epoch through optax.inject_hyperparams so the
jitted train step never recompiles on LR changes.
"""

from __future__ import annotations

import math

import optax


def build_optimizer(name: str, learning_rate: float = 5e-7) -> optax.GradientTransformation:
    """Optimizer by the reference's selection-string semantics."""
    name = name.lower()
    if "nadam" in name:
        base = optax.inject_hyperparams(optax.nadam)(learning_rate=learning_rate)
    elif "lamb" in name:
        base = optax.inject_hyperparams(optax.lamb)(learning_rate=learning_rate)
    elif "sgd" in name:
        base = optax.inject_hyperparams(optax.sgd)(learning_rate=learning_rate)
    elif "adam" in name:
        base = optax.inject_hyperparams(optax.adam)(learning_rate=learning_rate)
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    return base


def epoch_lr(
    lr0: float,
    epoch: int,
    decay_start: int | None,
    style: str = "pow",
) -> float:
    """Per-epoch LR with the reference's decay-after-epoch-N rules."""
    if decay_start is None or epoch < decay_start:
        return lr0
    if style == "pow":  # main_training.py:344
        return lr0 * 0.9 ** (epoch / decay_start)
    if style == "exp":  # trainer.py:62
        return lr0 * math.exp(-0.25 * (epoch - decay_start))
    raise ValueError(f"unknown decay style {style!r}")


def inverse_time_decay(lr0: float, decay_steps: int, decay_rate: float = 1.0,
                       staircase: bool = False) -> optax.Schedule:
    """Keras InverseTimeDecay parity (u_net.py:100-104):
    lr(t) = lr0 / (1 + rate * t / decay_steps)."""

    def schedule(count):
        t = count / decay_steps
        if staircase:
            import jax.numpy as jnp

            t = jnp.floor(t)
        return lr0 / (1.0 + decay_rate * t)

    return schedule


__all__ = ["build_optimizer", "epoch_lr", "inverse_time_decay"]
