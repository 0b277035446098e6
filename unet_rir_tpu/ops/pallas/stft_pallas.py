"""Fused Pallas TPU kernel for the STFT featurize pipeline.

One kernel (SURVEY.md §7 step 7) fusing the math-dense middle of the
forward feature pipeline into one VMEM-resident program:

* `featurize_pallas`: windowed-DFT + |.|/angle + dB-normalize + pad,
  wav (B, n_samples) -> (B, H, W, 2). The length-256 rfft is computed as
  two real matmuls against windowed DFT tables — (256,129)x(F,256)
  contractions land on the MXU where a radix-FFT of this size cannot,
  and the magnitude/atan2/log/normalize chain runs on the VPU without
  materializing any intermediate in HBM.

The kernel is duration-parametric (VERDICT r1 item 6): any hop-aligned
RIR length keeps the fused fast path — the frame count F = 1 + n/hop and
the /16 model grid (ops.pad.model_shape_for) are compile-time constants
baked per shape, e.g. 0.2 s -> F=151, grid (144,160); 0.4 s -> F=301,
grid (144,304). VMEM footprint grows ~F*256*4 B per block (301 frames
= 308 KiB), far under the ~16 MiB budget for any practical RIR tail.

STATUS — live at wide grids only (VERDICT r2 item 8). The like-for-like
three-way bench (RESULTS.md "Kernel-level wins": XLA-FFT vs XLA
matmul-DFT vs Pallas, B=256) measured the pure-jnp matmul-DFT pipeline
faster at the 0.2 s grid (0.43 vs 0.63 ms) but the fused kernel ahead
from the 0.4 s grid up (1.01 vs 1.09 ms at F=301): at narrow grids
pallas_call's one-sample-per-grid-step blocking serializes what XLA
pipelines across the batch (a multi-sample-block variant measured worse
— RESULTS.md records that failed experiment), while at wide grids the
per-sample work is large enough to hide the serialization and the fused
VPU chain saves the HBM round-trips. `ops.features.featurize` therefore
auto-dispatches here on TPU when F >= 301; `use_pallas=` still forces
either path. The round-trip (defeaturize) twin kernel lost to the XLA
matmul-DFT path in every measured cell and was removed — see PARITY.md
"Pallas kernels" for the decision record.

Layout notes (why framing/OLA stay in XLA): the hop (64) is half the TPU
lane width, so frame gathers and overlap-add scatters sit at 64-sample
offsets that Mosaic cannot vector-load/store; XLA already emits optimal
code for those (one gather / 4 reshaped adds — see ops.stft._ola_fixed_hop),
while the DFT matmuls + transcendentals are where fusion pays.

Mosaic has no atan2 primitive; phase uses an in-kernel minimax polynomial
(|err| < 2e-7 rad). Tables are precomputed in NumPy at trace time and fold
the analysis window.

`interpret=True` (automatic on CPU) makes the kernel testable on the
virtual-device mesh; the pure-jnp ops in unet_rir_tpu.ops remain the
always-correct fallback (identical formulas — reference
preprocess.py:13-41).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from unet_rir_tpu.ops.pad import model_shape_for
from unet_rir_tpu.ops.stft import (
    HOP_LENGTH,
    N_BINS,
    N_FFT,
    WIN_LENGTH,
    _padded_window,
    frame_signal,
)


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


# Minimax odd polynomial for atan on [-1, 1] (Abramowitz & Stegun 4.4.49
# form), |error| < 2e-7 rad — Mosaic has no atan2 primitive.
_ATAN_COEFFS = (
    0.9999993329,
    -0.3332985605,
    0.1994653599,
    -0.1390853351,
    0.0964200441,
    -0.0559098861,
    0.0218612288,
    -0.0040540580,
)


def _atan2(y, x):
    """Elementwise atan2 from primitive ops (VPU-friendly)."""
    tiny = jnp.float32(1e-30)
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    swap = ay > ax
    num = jnp.where(swap, ax, ay)
    den = jnp.maximum(jnp.where(swap, ay, ax), tiny)
    z = num / den
    z2 = z * z
    poly = jnp.float32(_ATAN_COEFFS[-1])
    for c in _ATAN_COEFFS[-2::-1]:
        poly = poly * z2 + jnp.float32(c)
    r = z * poly
    r = jnp.where(swap, jnp.float32(math.pi / 2) - r, r)
    r = jnp.where(x < 0, jnp.float32(math.pi) - r, r)
    return jnp.where(y < 0, -r, r)


@functools.lru_cache(maxsize=None)
def _analysis_tables() -> tuple[np.ndarray, np.ndarray]:
    """Windowed forward-DFT tables C, S (256, 129): X = f C + i f S."""
    w = _padded_window(N_FFT, WIN_LENGTH, np.float64)
    n = np.arange(N_FFT)[:, None]
    k = np.arange(N_BINS)[None, :]
    ang = 2.0 * np.pi * n * k / N_FFT
    c = (w[:, None] * np.cos(ang)).astype(np.float32)
    s = (-w[:, None] * np.sin(ang)).astype(np.float32)
    return c, s


# ---------------------------------------------------------------------------
# featurize: wav -> normalized padded (H, W, 2)
# ---------------------------------------------------------------------------


def _make_featurize_kernel(n_frames: int, h_pad: int, w_pad: int):
    def kernel(frames_ref, c_ref, s_ref, amp_ref, pha_ref):
        f = frames_ref[0]  # (n_frames, 256)
        # (129, n_frames) spectra directly: contract the n axis of C.
        dims = (((0,), (1,)), ((), ()))
        # precision=HIGHEST: default TPU f32 matmul uses bf16 passes, which
        # is far too coarse in the dB/phase domain.
        re = jax.lax.dot_general(c_ref[:], f, dims, precision=jax.lax.Precision.HIGHEST,
                                 preferred_element_type=jnp.float32)
        im = jax.lax.dot_general(s_ref[:], f, dims, precision=jax.lax.Precision.HIGHEST,
                                 preferred_element_type=jnp.float32)
        amp = jnp.sqrt(re * re + im * im)
        phase = _atan2(im, re)
        # 20*log10(a) == (20/ln 10)*ln(a); Mosaic has exp/log primitives.
        amp_n = ((20.0 / math.log(10.0)) * jnp.log(amp / 128.0 + 1e-5) + 100.0) / 100.0
        pha_n = (phase + math.pi) / (2.0 * math.pi)

        amp_ref[0] = jnp.zeros((h_pad, w_pad), jnp.float32)
        pha_ref[0] = jnp.zeros((h_pad, w_pad), jnp.float32)
        amp_ref[0, 0:N_BINS, 0:n_frames] = amp_n
        pha_ref[0, 0:N_BINS, 0:n_frames] = pha_n

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def featurize_pallas(wav: jnp.ndarray, interpret: bool | None = None) -> jnp.ndarray:
    """wav (B, n) hop-aligned -> (B, H, W, 2); parity with ops.features.featurize.

    The frame count 1 + n/hop and the /16 model grid are static per input
    length; any hop-multiple duration compiles its own fused program.
    """
    if interpret is None:
        interpret = _interpret_default()
    n_samples = wav.shape[-1]
    if n_samples % HOP_LENGTH:
        raise ValueError(
            f"featurize_pallas requires hop-aligned input; got {n_samples} "
            f"(hop {HOP_LENGTH}) — use the jnp fallback for odd lengths"
        )
    n_frames = 1 + n_samples // HOP_LENGTH
    h_pad, w_pad = model_shape_for((N_BINS, n_frames))
    wav = wav - jnp.mean(wav, axis=-1, keepdims=True)
    x = jnp.pad(wav, ((0, 0), (N_FFT // 2, N_FFT // 2)), mode="reflect")
    frames = frame_signal(x, N_FFT, HOP_LENGTH)  # (B, n_frames, 256) XLA gather
    c, s = _analysis_tables()
    b = wav.shape[0]

    amp, pha = pl.pallas_call(
        _make_featurize_kernel(n_frames, h_pad, w_pad),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n_frames, N_FFT), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N_FFT, N_BINS), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N_FFT, N_BINS), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, h_pad, w_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_pad, w_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h_pad, w_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, h_pad, w_pad), jnp.float32),
        ),
        interpret=interpret,
    )(frames, jnp.asarray(c), jnp.asarray(s))
    return jnp.stack([amp, pha], axis=-1)


__all__ = ["featurize_pallas"]
