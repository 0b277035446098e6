"""Batching over the HBM-resident corpus (replaces keras Sequence batcher).

Reproduces the reference DataGenerator semantics
(/root/reference/datageneratorv2.py:8-102):

* joint seeded shuffle of (index_in, index_out) pairs (seed 500),
* 70/20/10 train/val/test split by list position (lines 36-43),
* per-epoch reshuffle of the *partition* when shuffle=True (lines 55-62),
* batch = (spec_in (B,144,160,2), emb (B,2,16) = stacked in/out embedding
  rows, spec_out (B,144,160,2)); remainder batches dropped (lines 45-49).

But instead of assembling batches in Python per step, the whole epoch's
gather indices are computed once and every batch is a device-side
`jnp.take` on the resident corpus arrays — zero per-step host work.
"""

from __future__ import annotations

import random
from typing import Iterator

import jax.numpy as jnp
import numpy as np

from unet_rir_tpu.data.corpus import Corpus

SPLITS = {"train": (0.0, 0.7), "val": (0.7, 0.9), "test": (0.9, 1.0)}


class DataGenerator:
    """Index-gather batcher over a Corpus, API-compatible with the reference."""

    def __init__(
        self,
        dataset: Corpus,
        batch_size: int = 32,
        partition: str = "train",
        shuffle: bool = True,
        characteristics: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.partition = partition
        self.shuffle = shuffle
        self.characteristics = characteristics

        index_in = list(dataset.index_in)
        index_out = list(dataset.index_out)
        pairs = list(zip(index_in, index_out))
        random.Random(dataset.seed).shuffle(pairs)

        lo, hi = SPLITS[partition]
        n = len(pairs)
        pairs = pairs[int(lo * n) : int(hi * n)]
        self._pairs = pairs
        self._epoch_pairs = list(pairs)

    def __len__(self) -> int:
        return len(self._pairs) // self.batch_size

    @property
    def n_samples(self) -> int:
        """Samples in this partition before remainder drop."""
        return len(self._pairs)

    def on_epoch_end(self) -> None:
        if self.shuffle:
            random.shuffle(self._epoch_pairs)

    def epoch_indices(self) -> tuple[np.ndarray, np.ndarray]:
        """All gather indices for one epoch: two (n_steps, batch) arrays.

        Feeds the fused-epoch lax.scan trainer (train.make_train_epoch);
        remainder samples are dropped exactly as __len__ does.
        """
        n = len(self) * self.batch_size
        sel = self._epoch_pairs[:n]
        idx_in = np.array([p[0] for p in sel], np.int32).reshape(len(self), self.batch_size)
        idx_out = np.array([p[1] for p in sel], np.int32).reshape(len(self), self.batch_size)
        return idx_in, idx_out

    def batch_indices(self, idx: int) -> tuple[np.ndarray, np.ndarray]:
        sel = self._epoch_pairs[idx * self.batch_size : (idx + 1) * self.batch_size]
        idx_in = np.array([p[0] for p in sel], np.int32)
        idx_out = np.array([p[1] for p in sel], np.int32)
        return idx_in, idx_out

    def __getitem__(self, idx: int):
        idx_in, idx_out = self.batch_indices(idx)
        ds = self.dataset
        spec_in = jnp.take(ds.features, jnp.asarray(idx_in), axis=0)
        spec_out = jnp.take(ds.features, jnp.asarray(idx_out), axis=0)
        emb = jnp.stack(
            [
                jnp.take(ds.embeddings, jnp.asarray(idx_in), axis=0),
                jnp.take(ds.embeddings, jnp.asarray(idx_out), axis=0),
            ],
            axis=1,
        )  # (B, 2, 16)
        if self.characteristics:
            chars = ds.return_characteristics()
            char = np.stack(
                [
                    np.array([chars[i] for i in idx_in]),
                    np.array([chars[i] for i in idx_out]),
                ],
                axis=2,
            )
            return spec_in, emb, spec_out, char
        return spec_in, emb, spec_out

    def __iter__(self) -> Iterator:
        for i in range(len(self)):
            yield self[i]


__all__ = ["DataGenerator", "SPLITS"]
