"""On-device image-source RIR simulator (synthetic-data generator).

The reference trains on measured UTS wavs it cannot ship; the TPU build
additionally owns a data *generator*: a shoebox image-source method (ISM)
implemented as one vectorized jnp computation (BASELINE.json config 5 —
"rooms.py image-source datagen -> train -> postprocess iSTFT waveform").

Design (TPU-first):
* All image sources for all reflection orders are enumerated as a static
  (8 * (2N+1)^3,) grid — no data-dependent loops; one jit compilation per
  room-batch shape.
* Fractional delays are applied by linear interpolation between the two
  neighboring sample bins via two batched scatter-adds — XLA lowers this
  to an efficient sort-free scatter.
* Absorption from Sabine's formula: A = 0.161 V / T60, alpha = A / S,
  reflection coefficient beta = sqrt(1 - alpha), attenuation beta^(order)
  / (4 pi d).
* `vmap`/`jit` over a batch of (dims, src, mic, rt60) -> (B, 9600) RIRs.

Geometry units: meters. UTS rooms (quadrilaterals, cm) are approximated by
their bounding shoebox via `room_to_shoebox`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from unet_rir_tpu.ops.stft import N_SAMPLES, SAMPLE_RATE
from unet_rir_tpu.rooms import UTSRoom

SPEED_OF_SOUND = 343.0  # m/s
DEFAULT_MAX_ORDER = 10  # images per axis half-range


def room_to_shoebox(room: UTSRoom) -> tuple[np.ndarray, float]:
    """Approximate a quadrilateral UTS room by an equivalent shoebox (m).

    Width = mean of opposing sides a/c, depth = mean of b/d, height as-is;
    rt60 given in the room spec is in *milliseconds* in the reference
    constants (e.g. 1281 for the large room) — converted to seconds here.
    """
    dims_cm = np.array(
        [(room.a + room.c) / 2.0, (room.b + room.d) / 2.0, room.height]
    )
    return dims_cm / 100.0, float(room.rt60) / 1000.0


def _image_grid(max_order: int) -> tuple[np.ndarray, np.ndarray]:
    """Static (K, 3) lattice indices and (8, 3) parity signs."""
    n = np.arange(-max_order, max_order + 1)
    lattice = np.stack(np.meshgrid(n, n, n, indexing="ij"), axis=-1).reshape(-1, 3)
    parity = np.array(
        [[px, py, pz] for px in (0, 1) for py in (0, 1) for pz in (0, 1)]
    )
    return lattice, parity


@functools.partial(jax.jit, static_argnames=("n_samples", "max_order", "fs"))
def simulate_rir(
    dims: jnp.ndarray,  # (3,) room dimensions, meters
    src: jnp.ndarray,  # (3,) source position
    mic: jnp.ndarray,  # (3,) microphone position
    rt60: jnp.ndarray,  # () seconds
    n_samples: int = N_SAMPLES,
    max_order: int = DEFAULT_MAX_ORDER,
    fs: int = SAMPLE_RATE,
) -> jnp.ndarray:
    """Single-room shoebox ISM -> (n_samples,) float32 RIR."""
    lattice_np, parity_np = _image_grid(max_order)
    lattice = jnp.asarray(lattice_np, jnp.float32)  # (K, 3)
    parity = jnp.asarray(parity_np, jnp.float32)  # (8, 3)

    volume = jnp.prod(dims)
    surface = 2.0 * (dims[0] * dims[1] + dims[0] * dims[2] + dims[1] * dims[2])
    alpha = jnp.clip(0.161 * volume / (surface * jnp.maximum(rt60, 1e-3)), 0.0, 0.99)
    beta = jnp.sqrt(1.0 - alpha)

    # Allen-Berkley image positions: per axis, parity p in {0,1} and lattice
    # index n give x_img = (-1)^p * x_src + 2 n L, with |2n - p| reflections.
    img = 2.0 * lattice[:, None, :] * dims[None, None, :] + jnp.where(
        parity[None, :, :] > 0, -src[None, None, :], src[None, None, :]
    )  # (K, 8, 3)

    d = jnp.linalg.norm(img - mic[None, None, :], axis=-1).reshape(-1)  # (K*8,)
    n_reflections = (
        jnp.sum(jnp.abs(2.0 * lattice[:, None, :] - parity[None, :, :]), axis=-1)
    ).reshape(-1)

    amp = jnp.power(beta, n_reflections) / (4.0 * jnp.pi * jnp.maximum(d, 0.1))
    t = d / SPEED_OF_SOUND * fs  # fractional sample index
    idx0 = jnp.floor(t).astype(jnp.int32)
    frac = t - idx0

    in_range0 = (idx0 >= 0) & (idx0 < n_samples)
    in_range1 = (idx0 + 1 >= 0) & (idx0 + 1 < n_samples)
    rir = jnp.zeros((n_samples,), jnp.float32)
    rir = rir.at[jnp.clip(idx0, 0, n_samples - 1)].add(
        jnp.where(in_range0, amp * (1.0 - frac), 0.0)
    )
    rir = rir.at[jnp.clip(idx0 + 1, 0, n_samples - 1)].add(
        jnp.where(in_range1, amp * frac, 0.0)
    )
    return rir


@functools.partial(jax.jit, static_argnames=("n_samples", "max_order", "fs"))
def simulate_rir_batch(
    dims, src, mic, rt60,
    n_samples: int = N_SAMPLES,
    max_order: int = DEFAULT_MAX_ORDER,
    fs: int = SAMPLE_RATE,
):
    """Batched ISM: (B,3),(B,3),(B,3),(B,) -> (B, n_samples)."""
    fn = lambda d, s, m, r: simulate_rir(
        d, s, m, r, n_samples=n_samples, max_order=max_order, fs=fs
    )
    return jax.vmap(fn)(dims, src, mic, rt60)


__all__ = [
    "SPEED_OF_SOUND",
    "DEFAULT_MAX_ORDER",
    "room_to_shoebox",
    "simulate_rir",
    "simulate_rir_batch",
]
