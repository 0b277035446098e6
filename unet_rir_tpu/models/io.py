"""Model persistence: save_pretrained / load_pretrained.

TPU-native equivalent of the reference per-model persistence
(u_net.py:120-199: parameters.pkl + weights.h5):

* ``config.json``  — model class name + constructor kwargs (replaces the
  opaque pickle; human-readable, and fixes the reference's VQVAE.load bug
  which rebuilt the wrong class, vqvae.py:237).
* ``weights.npz``  — flattened param pytree (inference-only load).

Full train-state checkpointing (params + opt_state + step) lives in
train/checkpoint.py (Orbax); this module is the lightweight export path.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree: Any) -> dict[str, np.ndarray]:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in flat:
        key = "/".join(
            p.key if hasattr(p, "key") else str(getattr(p, "idx", p)) for p in path
        )
        out[key] = np.asarray(leaf)
    return out


def _unflatten(flat: dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(value)
    return tree


def save_pretrained(folder: str, model, variables: dict) -> None:
    """Write config.json + weights.npz for `model` (a flax Module)."""
    os.makedirs(folder, exist_ok=True)
    kwargs = {}
    for field in type(model).__dataclass_fields__:
        if field in ("parent", "name"):
            continue
        value = getattr(model, field)
        if hasattr(value, "dtype") or value is jnp.bfloat16 or value is jnp.float32:
            value = jnp.dtype(value).name if not isinstance(value, str) else value
        kwargs[field] = value
    config = {"model_class": type(model).__name__, "kwargs": kwargs}
    with open(os.path.join(folder, "config.json"), "w") as f:
        json.dump(config, f, indent=2, default=str)
    # Atomic replace: exports are overwritten on every val improvement
    # (and, round 5 on, from a background thread) — a reader or a crash
    # mid-write must never observe a truncated weights.npz.
    final = os.path.join(folder, "weights.npz")
    tmp = final + ".tmp.npz"
    np.savez(tmp, **_flatten(variables))
    os.replace(tmp, final)


def load_pretrained(folder: str):
    """Rebuild (model, variables) from a save_pretrained folder."""
    from unet_rir_tpu.models.registry import MODEL_CLASSES

    with open(os.path.join(folder, "config.json")) as f:
        config = json.load(f)
    cls = MODEL_CLASSES[config["model_class"]]
    kwargs = dict(config["kwargs"])
    if "dtype" in kwargs and isinstance(kwargs["dtype"], str):
        kwargs["dtype"] = jnp.dtype(kwargs["dtype"]).type
    model = cls(**kwargs)
    with np.load(os.path.join(folder, "weights.npz")) as data:
        variables = _unflatten({k: data[k] for k in data.files})
    return model, variables


def predict_stft(model, variables: dict, inputs):
    """Reference predict_stft parity (u_net.py:138-146): inputs is the
    [spectrogram, info_vector] pair; returns the generated STFT feature."""
    spec, emb = inputs
    out = model.apply(variables, spec, emb, training=False)
    return out[0] if isinstance(out, tuple) else out


def param_count(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def summary(model, grid: tuple[int, int] = (144, 160), batch_size: int = 1,
            depth: int | None = 1, **tabulate_kwargs) -> str:
    """Architecture table — the reference's `model.summary()` equivalent
    (u_net.py:66-76 -> flax nn.tabulate): layers, output shapes, param
    counts. `grid` is the padded spectrogram shape; `depth` limits nesting
    (None = fully expanded)."""
    import flax.linen as nn
    import jax.numpy as jnp

    spec = jnp.zeros((batch_size,) + tuple(grid) + (2,), jnp.float32)
    emb = jnp.zeros((batch_size, 2, 16), jnp.int32)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "sampling": jax.random.key(2)}
    fn = nn.tabulate(model, rngs, depth=depth, **tabulate_kwargs)
    return fn(spec, emb, training=False)


__all__ = ["save_pretrained", "load_pretrained", "param_count", "predict_stft", "summary"]
