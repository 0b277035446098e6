"""Conditional VAE (and DiffVAE variant).

Capability-parity with the reference VAE (/root/reference/dl_models/
vae.py:380-472) and DiffVAE (diff_vae.py:360-472):

* Encoder: conv stack (no L2 regs) -> Flatten ⊕ vector branch -> mu /
  log_var heads -> reparameterized sample z = mu + exp(log_var/2) * eps
  (SamplingLayer, vae.py:32-39). The epsilon draw uses the explicit
  'sampling' PRNG stream (replacing implicit keras random_normal —
  SURVEY.md §7 hard part 6); at inference (training=False) z = mu for
  determinism (documented divergence: the reference samples always).
* Decoder: Dense/reshape transpose-conv stack; sigmoid head for VAE,
  linear for DiffVAE (diff_vae.py:370-386).
* __call__ returns (reconstruction, {'mean','log_var'}): the train step's
  loss layer adds the KL term (kl summed over latent dims,
  vae.py:209-217) and DiffVAE's reconstruction_loss_weight=100000
  (diff_vae.py:184-195) via LossConfig.
* Vector branch variants: VAE = Embedding(2000,256)->Flatten->Dense
  (no dropout, vae.py:408-418); DiffVAE = Embedding(1500,128)->Dense on
  the unflattened embed (diff_vae.py:408-418).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from unet_rir_tpu.models.ae_common import (
    ConvEncoder,
    ConvTransposeDecoder,
    InfoVectorDense,
    pre_latent_shape,
)


class VAE(nn.Module):
    conv_filters: Sequence[int] = (64, 128, 256, 512)
    conv_kernels: Sequence[int] = (3, 3, 3, 3)
    conv_strides: Sequence[int] = (2, 2, 2, 2)
    latent_space_dim: int = 64
    n_neurons: int = 32 * 64
    input_hw: tuple[int, int] = (144, 160)
    embed_vocab: int = 2000
    embed_features: int = 256
    flatten_vector: bool = True
    vector_dropout: float = 0.0
    output_activation: str = "sigmoid"
    dtype: Any = jnp.float32

    L2_PATTERNS = ()  # reference VAE convs carry no regularizers
    # Reference loss balance: the plain VAE trains on unweighted
    # recon + KL (vae_trainer.py:84-87). DiffVAE overrides this.
    RECON_WEIGHT = 1.0

    def setup(self):
        self._pre_latent = pre_latent_shape(
            self.input_hw, self.conv_strides, self.conv_filters[-1]
        )
        self.encoder_stack = ConvEncoder(
            self.conv_filters, self.conv_kernels, self.conv_strides,
            regularized=False, dtype=self.dtype,
        )
        self.vector_branch = InfoVectorDense(
            self.n_neurons, vocab_size=self.embed_vocab,
            embed_features=self.embed_features,
            dropout_rate=self.vector_dropout, flatten=self.flatten_vector,
            dtype=self.dtype,
        )
        self.mu_head = nn.Dense(self.latent_space_dim, dtype=self.dtype, name="mu")
        self.log_var_head = nn.Dense(self.latent_space_dim, dtype=self.dtype,
                                     name="log_variance")
        self.decoder_stack = ConvTransposeDecoder(
            self._pre_latent, self.conv_filters, self.conv_kernels,
            self.conv_strides, output_activation=self.output_activation,
            regularized=False, dtype=self.dtype,
        )

    def encode(self, spec, emb, *, training: bool = False):
        """Returns (z, mu, log_var) — the reference encoder triple (vae.py:472)."""
        x = self.encoder_stack(spec.astype(self.dtype), training=training)
        x = x.reshape((x.shape[0], -1))
        y = self.vector_branch(emb, training=training)
        latent = jnp.concatenate([x, y], axis=-1)
        mu = self.mu_head(latent).astype(jnp.float32)
        log_var = self.log_var_head(latent).astype(jnp.float32)
        if training:
            key = self.make_rng("sampling")
            noise = jax.random.normal(key, mu.shape, jnp.float32)
            z = mu + jnp.exp(0.5 * log_var) * noise
        else:
            z = mu
        return z, mu, log_var

    def decode(self, z, *, training: bool = False):
        return self.decoder_stack(z, training=training)

    def __call__(self, spec, emb, *, training: bool = False):
        z, mu, log_var = self.encode(spec, emb, training=training)
        recon = self.decode(z, training=training)
        return recon, {"mean": mu, "log_var": log_var}


class DiffVAE(VAE):
    """Phase-difference VAE: linear head, Embedding(1500,128) unflattened
    vector branch, reconstruction_loss_weight applied via LossConfig.

    RECON_WEIGHT reproduces the reference's combined loss
    `100000 * recon + kl` (diff_vae.py:68, :184-195). The weight is not
    cosmetic: diff targets are small, so at weight 1 the KL term dominates
    and the posterior collapses — measured on the round-4 zoo sweep as
    gated LSD 63 dB with deceptively good T60 (the decoder output went
    input-independent, so predictions degenerated to ~the paired input's
    spectrum). The CLI injects this class attribute into
    LossConfig.recon_weight unless --recon-weight overrides it.
    """

    embed_vocab: int = 1500
    embed_features: int = 128
    flatten_vector: bool = False
    output_activation: str = "linear"
    RECON_WEIGHT = 100000.0


__all__ = ["VAE", "DiffVAE"]
