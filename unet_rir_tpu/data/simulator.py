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

Diffuse late tail (`diffuse_tail=True`): a truncated image lattice cannot
cover long reverberation — at max_order=6 the Large room's arrivals die at
~0.53 s while its nominal T60 is 1.281 s, so Schroeder fits on the pure ISM
read ~0.9 s. The standard hybrid fixes this: beyond the room's perceptual
mixing time the field is diffuse, so the ISM is crossfaded into
exponentially-decaying Gaussian noise whose envelope follows the Sabine
T60 (amplitude 10^(-3 (t - t_mix)/T60)) and whose level is matched to the
ISM's local energy density at the mixing region. Deterministic per
(seed, sample). Opt-in: the pure-ISM corpus that earlier quality numbers
were measured on is unchanged by default.
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


def _diffuse_tail(
    rir: jnp.ndarray,  # (n_samples,) pure-ISM RIR
    dims: jnp.ndarray,  # (3,) meters
    src: jnp.ndarray,
    mic: jnp.ndarray,
    rt60: jnp.ndarray,  # () seconds
    key: jnp.ndarray,
    fs: int,
) -> jnp.ndarray:
    """Crossfade the ISM into an energy-matched exponential noise tail.

    t_mix = direct delay + sqrt(V) ms (the perceptual mixing-time rule);
    tail amplitude envelope 10^(-3 (t - t_mix)/T60) (60 dB energy decay per
    T60); noise level set so the tail's mean-square continues the ISM's
    local mean-square over the 10 ms before t_mix. A 20 ms smoothstep
    crossfade replaces the (truncation-distorted) ISM past t_mix.
    """
    n_samples = rir.shape[0]
    t = jnp.arange(n_samples, dtype=jnp.float32) / fs
    volume = jnp.prod(dims)
    t_direct = jnp.linalg.norm(src - mic) / SPEED_OF_SOUND
    t_mix = t_direct + jnp.sqrt(volume) / 1000.0  # s

    # Local ISM energy density just before t_mix (masked mean-square).
    cal_w = 0.010
    cal_mask = ((t >= t_mix - cal_w) & (t < t_mix)).astype(jnp.float32)
    ms_local = jnp.sum(cal_mask * jnp.square(rir)) / jnp.maximum(
        jnp.sum(cal_mask), 1.0
    )

    env = jnp.power(10.0, -3.0 * (t - t_mix) / jnp.maximum(rt60, 1e-3))
    noise = jax.random.normal(key, (n_samples,), jnp.float32)
    tail = jnp.sqrt(ms_local) * noise * env

    # smoothstep 0->1 over [t_mix, t_mix + 20 ms]
    x = jnp.clip((t - t_mix) / 0.020, 0.0, 1.0)
    w = x * x * (3.0 - 2.0 * x)
    return rir * (1.0 - w) + tail * w


@functools.partial(
    jax.jit, static_argnames=("n_samples", "max_order", "fs", "diffuse_tail")
)
def simulate_rir(
    dims: jnp.ndarray,  # (3,) room dimensions, meters
    src: jnp.ndarray,  # (3,) source position
    mic: jnp.ndarray,  # (3,) microphone position
    rt60: jnp.ndarray,  # () seconds
    n_samples: int = N_SAMPLES,
    max_order: int = DEFAULT_MAX_ORDER,
    fs: int = SAMPLE_RATE,
    diffuse_tail: bool = False,
    key: jnp.ndarray | None = None,
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
    if diffuse_tail:
        if key is None:
            key = jax.random.key(0)
        rir = _diffuse_tail(rir, dims, src, mic, rt60, key, fs)
    return rir


@functools.partial(
    jax.jit, static_argnames=("n_samples", "max_order", "fs", "diffuse_tail")
)
def simulate_rir_batch(
    dims, src, mic, rt60,
    n_samples: int = N_SAMPLES,
    max_order: int = DEFAULT_MAX_ORDER,
    fs: int = SAMPLE_RATE,
    diffuse_tail: bool = False,
    keys: jnp.ndarray | None = None,  # (B,) PRNG keys when diffuse_tail
):
    """Batched ISM: (B,3),(B,3),(B,3),(B,) -> (B, n_samples)."""
    if diffuse_tail:
        if keys is None:
            keys = jax.random.split(jax.random.key(0), dims.shape[0])
        fn = lambda d, s, m, r, k: simulate_rir(
            d, s, m, r, n_samples=n_samples, max_order=max_order, fs=fs,
            diffuse_tail=True, key=k
        )
        return jax.vmap(fn)(dims, src, mic, rt60, keys)
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
