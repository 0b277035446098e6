"""Loss families for RIR spectrogram training.

Reproduces the reference's three loss families exactly (behavior, not code):

* **alpha-blend amp/phase** (main_training.py:178-235): per-pixel
  `alpha * (amp_t - amp_p)^2 + (1-alpha) * (1 - cos(wrap(dphi)))`, with
  optional time-decaying sigmoid mask on the phase term, optional
  diff-phase target (phi_target = phi_out - phi_in), normalized by
  H*W*C and averaged over the **global** batch, plus scaled L2 penalties
  from the model's regularized conv kernels.
* **full-tensor MSE** (trainer.py:146-156): MSE over the whole (H,W,2)
  tensor; amp/phase tracked as diagnostics only.
* **amp+phase sum** (amp_phase_trainer.py:143-157): phase term uses
  *denormalized radians* 1-cos, amplitude term plain MSE; loss = sum.
* **VAE ELBO terms** (vae_trainer.py:142-145, main_training.py:192-201):
  KL summed over latent dims, averaged over batch.
* **VQ aux losses** (vqvae.py:79-85): codebook + commitment, returned by
  the model as aux and added here.

All functions are pure jnp over the global batch; under SPMD jit with a
sharded batch axis, jnp.mean over batch reproduces
`tf.nn.compute_average_loss(..., global_batch_size)` semantics.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp

from unet_rir_tpu.ops.masks import sigmoid_mask

L2_COEF = 0.001  # keras l2(0.001) on the reference's down/up convs


def phase_cosine_loss(phase_true_norm, phase_pred_norm):
    """Per-pixel 1 - cos(wrapped phase difference), inputs normalized [0,1].

    Matches main_training.py:184-190: denormalize both to radians, wrap the
    difference to [-pi, pi), return 1 - cos.
    """
    t = phase_true_norm * (2 * math.pi) - math.pi
    p = phase_pred_norm * (2 * math.pi) - math.pi
    d = (t - p + math.pi) % (2 * math.pi) - math.pi
    return 1.0 - jnp.cos(d)


def amplitude_sq_error(amp_true, amp_pred):
    """Per-pixel squared error (keras MSE with a singleton last axis)."""
    return jnp.square(amp_true - amp_pred)


def kl_divergence(mean, log_var):
    """Per-example KL to standard normal, summed over latent dims."""
    kl = -0.5 * (1.0 + log_var - jnp.square(mean) - jnp.exp(log_var))
    return jnp.sum(kl, axis=-1)


def l2_penalty(params, patterns: tuple[str, ...], coef: float = L2_COEF) -> jnp.ndarray:
    """Sum of coef * ||W||^2 over kernel leaves under modules matching patterns.

    Equivalent of keras kernel_regularizer=l2(0.001) collected via
    model.losses (main_training.py:232-233). `patterns` are name prefixes of
    the flax submodules that carry regularizers (each model declares its own
    L2_PATTERNS).
    """
    total = jnp.zeros((), jnp.float32)
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        keys = [p.key for p in path if hasattr(p, "key")]
        if not keys or keys[-1] != "kernel":
            continue
        if any(k.startswith(pat) for k in keys for pat in patterns):
            total = total + jnp.sum(jnp.square(leaf.astype(jnp.float32)))
    return coef * total


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Knobs of the reference entry points (main_training.py:37-40)."""

    family: str = "blend"  # 'blend' | 'full_mse' | 'amp_phase_sum'
    alpha: float = 0.9
    sigmoid_loss: bool = False
    diff_loss: bool = False
    beta: float = 0.5  # sigmoid mask steepness
    use_kl: bool = False  # VAE: add KL term
    kl_weight: float = 1.0  # DiffVAE uses reconstruction_loss_weight semantics
    recon_weight: float = 1.0


def compute_loss(
    cfg: LossConfig,
    spec_in: jnp.ndarray,
    spec_out: jnp.ndarray,
    spec_pred: jnp.ndarray,
    aux: dict[str, Any] | None = None,
    params=None,
    l2_patterns: tuple[str, ...] = (),
):
    """Total scalar loss + metrics dict for one (global) batch.

    Shapes: spec_* are (B, H, W, 2) with channel 0 = amplitude, 1 = phase.
    `aux` carries model side outputs: 'mean'/'log_var' (VAE), 'vq_loss'
    (VQ-VAE straight-through codebook+commitment sum).
    """
    amp_t, phase_t = spec_out[..., 0], spec_out[..., 1]
    amp_p, phase_p = spec_pred[..., 0], spec_pred[..., 1]
    hwc = float(spec_out.shape[1] * spec_out.shape[2] * spec_out.shape[3])

    err_amp = amplitude_sq_error(amp_t, amp_p)
    if cfg.diff_loss:
        # Target is the (normalized) phase difference vs the input position
        # (main_training.py:214-216).
        err_phase = phase_cosine_loss(phase_t - spec_in[..., 1], phase_p)
    else:
        err_phase = phase_cosine_loss(phase_t, phase_p)

    metrics = {
        "loss_amplitude": jnp.mean(err_amp),
        "loss_phase": jnp.mean(err_phase),
    }

    if cfg.sigmoid_loss:
        mask = sigmoid_mask(cfg.beta, (spec_out.shape[1], spec_out.shape[2]))
        err_phase = err_phase * mask

    if cfg.family == "blend":
        per_pixel = cfg.alpha * err_amp + (1.0 - cfg.alpha) * err_phase
        per_example = jnp.sum(per_pixel, axis=(1, 2)) / hwc
        loss = cfg.recon_weight * jnp.mean(per_example)
    elif cfg.family == "full_mse":
        loss = cfg.recon_weight * jnp.mean(jnp.square(spec_out - spec_pred))
    elif cfg.family == "amp_phase_sum":
        loss = cfg.recon_weight * (jnp.mean(err_amp) + jnp.mean(err_phase))
    else:
        raise ValueError(f"unknown loss family {cfg.family!r}")

    aux = aux or {}
    if cfg.use_kl and "mean" in aux:
        kl = jnp.mean(kl_divergence(aux["mean"], aux["log_var"]))
        metrics["loss_kl"] = kl
        loss = loss + cfg.kl_weight * kl
    if "vq_loss" in aux:
        metrics["loss_vq"] = aux["vq_loss"]
        loss = loss + aux["vq_loss"]
    if params is not None and l2_patterns:
        loss = loss + l2_penalty(params, l2_patterns)

    metrics["loss"] = loss
    return loss, metrics


def rmse_coef(y_true, y_pred):
    """Flattened RMSE with epsilon (reference trainer.py:302-308)."""
    diff = jnp.ravel(y_true) - jnp.ravel(y_pred)
    return jnp.sqrt(jnp.mean(jnp.square(diff)) + 1.0e-12)


def softmax_cross_entropy(logits, labels):
    """Per-example CE for the DeepCNN classifier (cnn_clas.py:55-63)."""
    logp = jax.nn.log_softmax(logits)
    if labels.ndim == logits.ndim:  # one-hot
        return -jnp.sum(labels * logp, axis=-1)
    return -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]


__all__ = [
    "L2_COEF",
    "rmse_coef",
    "softmax_cross_entropy",
    "LossConfig",
    "phase_cosine_loss",
    "amplitude_sq_error",
    "kl_divergence",
    "l2_penalty",
    "compute_loss",
]
