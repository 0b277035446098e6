"""Numerics / determinism debugging (SURVEY.md §5.2).

The reference has no sanitizers; JAX's functional purity plus these
toggles are the TPU-native equivalent: NaN trapping under jit, a pytree
finiteness audit for train states, and a determinism checker for
PRNG-keyed functions (replacing the implicit randomness of keras
Dropout / random_normal, SURVEY.md §7 hard part 6).
"""

from __future__ import annotations

import contextlib
from typing import Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def nan_debugging(enabled: bool = True) -> Iterator[None]:
    """Enable jax debug_nans within the context (traps NaN producers)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enabled)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def assert_finite(tree, name: str = "tree") -> None:
    """Raise with the offending path if any leaf has a NaN/Inf."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if not hasattr(leaf, "dtype") or not jnp.issubdtype(leaf.dtype, jnp.floating):
            continue
        if not bool(jnp.all(jnp.isfinite(leaf))):
            keys = "/".join(str(getattr(p, "key", p)) for p in path)
            raise FloatingPointError(f"non-finite values in {name}:{keys}")


def check_deterministic(fn: Callable, *args, seed: int = 0, atol: float = 0.0) -> bool:
    """Run `fn(key, *args)` twice with the same key; True iff outputs match."""
    k = jax.random.key(seed)
    a = jax.tree_util.tree_leaves(fn(k, *args))
    b = jax.tree_util.tree_leaves(fn(k, *args))
    return all(
        np.allclose(np.asarray(x), np.asarray(y), atol=atol) for x, y in zip(a, b)
    )


__all__ = ["nan_debugging", "assert_finite", "check_deterministic"]
