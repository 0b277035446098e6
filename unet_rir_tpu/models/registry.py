"""Model registry: name -> flax Module factory.

Replaces the reference's if/elif dispatch blocks (main_training.py:119-161,
rir_generation.py:76-123) with a single table. The short config names
("unet", "ae", "vae", ...) match the reference's `name` knob.
"""

from __future__ import annotations

from typing import Any, Callable

from unet_rir_tpu.models.unet import UNet

# Classes registered as they land; populated further by each model module.
MODEL_CLASSES: dict[str, Any] = {
    "UNet": UNet,
}

# Short config-name -> zero-arg factory with the reference's default
# hyperparameters for that entry point (main_training.py:119-161).
MODEL_FACTORIES: dict[str, Callable[..., Any]] = {
    "unet": lambda **kw: UNet(number_filters_0=32, kernels=3, mode=0, **kw),
}


def register(short_name: str, cls, factory=None):
    MODEL_CLASSES[cls.__name__] = cls
    MODEL_FACTORIES[short_name] = factory or (lambda **kw: cls(**kw))


def build_model(name: str, **overrides):
    """Construct a model by its short config name ('unet', 'ae', 'vae'...)."""
    for key, factory in MODEL_FACTORIES.items():
        if key == name or name.startswith(key):
            return factory(**overrides)
    raise KeyError(f"unknown model name {name!r}; known: {sorted(MODEL_FACTORIES)}")


__all__ = ["MODEL_CLASSES", "MODEL_FACTORIES", "register", "build_model"]
