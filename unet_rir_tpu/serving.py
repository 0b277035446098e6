"""Serving: a compiled, fixed-shape RIR synthesizer.

Production-facing wrapper over the fused generate program
(eval.make_generate_fn): loads a `save_pretrained` export (or takes a live
model + variables), compiles forward + diff reassembly + iSTFT once at a
fixed batch size, and serves arbitrary request sizes by padding to the
compiled batch — no recompilation, no host round-trips inside a batch.

Request addressing supports both raw conditioning embeddings and
(room, zone, array, speaker, mic) descriptors, which are converted with
the vectorized geometry path (rooms.batched_embeddings).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from unet_rir_tpu import rooms as rooms_mod
from unet_rir_tpu.eval.generation import make_generate_fn
from unet_rir_tpu.models.io import load_pretrained
from unet_rir_tpu.ops.pad import STFT_SHAPE, model_shape_for
from unet_rir_tpu.ops.stft import HOP_LENGTH


class RIRSynthesizer:
    """Fixed-batch compiled synthesis service.

    Args:
      model, variables: a flax module + its variables, or use `from_pretrained`.
      batch_size: the compiled batch (128 is the measured v5e sweet spot).
      buckets: optional ascending batch buckets (e.g. (8, 32, 128)). Each
        request is served by greedy largest-bucket chunks plus ONE
        smallest-bucket-that-fits tail chunk, so a 3-sample request runs
        an 8-wide program (~16x less compute than padding to 128) — the
        tail-latency answer to the reference's fixed batch-4 serving
        (rir_generation.py:69-70) without giving up the throughput batch.
        Defaults to (batch_size,): fixed-batch behavior.
      algorithm: 'ph' (amp+phase iSTFT) or 'gl' (Griffin-Lim).
      diff_gen: reassemble diff-phase predictions against the input phase.
      mesh: a `parallel.make_mesh()` mesh for multi-chip serving — requests
        are sharded over the 'data' axis (and optionally 'spatial'),
        variables replicated once at construction; XLA SPMD partitions the
        fused synthesis program across chips.
    """

    def __init__(self, model, variables: dict, batch_size: int = 128,
                 algorithm: str = "ph", diff_gen: bool = False,
                 stft_shape: tuple[int, int] = STFT_SHAPE,
                 mesh=None, spatial: bool = False,
                 buckets: Sequence[int] | None = None):
        self.model = model
        self.buckets = sorted(set(buckets)) if buckets else [batch_size]
        if any(b <= 0 for b in self.buckets):
            raise ValueError(f"buckets must be positive: {self.buckets}")
        batch_size = self.buckets[-1]  # the throughput (largest) program
        self.batch_size = batch_size
        self.algorithm = algorithm
        self.diff_gen = diff_gen
        self.mesh = mesh
        # Serving grid for this model's RIR duration (default 0.2 s ->
        # (129,151) -> (144,160) grid, 9600-sample wavs).
        self.stft_shape = tuple(stft_shape)
        self.grid = model_shape_for(self.stft_shape)
        self.n_samples = HOP_LENGTH * (self.stft_shape[1] - 1)
        if mesh is not None:
            n_data = mesh.shape.get("data", 1)
            bad = [b for b in self.buckets if b % n_data]
            if bad:
                raise ValueError(
                    f"every batch bucket must divide by the mesh 'data' "
                    f"axis ({n_data}) for even per-chip shards; got {bad}"
                )
            from unet_rir_tpu.parallel.mesh import replicated

            variables = jax.device_put(variables, replicated(mesh))
        self.variables = variables
        self.last_dispatch_sizes: list[int] = []
        self._generate = make_generate_fn(model, algorithm=algorithm,
                                          diff_gen=diff_gen, stft_shape=self.stft_shape,
                                          mesh=mesh, spatial=spatial)

    @classmethod
    def from_pretrained(cls, folder: str, **kwargs) -> "RIRSynthesizer":
        model, variables = load_pretrained(folder)
        return cls(model, variables, **kwargs)

    def warmup(self) -> None:
        """Trigger compilation of every bucket's program ahead of traffic."""
        h, w = self.grid
        for b in self.buckets:
            spec = jnp.zeros((b, h, w, 2), jnp.float32)
            emb = jnp.zeros((b, 2, 16), jnp.int32)
            jax.block_until_ready(self._generate(self.variables, spec, emb))

    def _plan(self, n: int) -> list[int]:
        """Fixed-shape dispatch sizes for an n-sample request: greedy
        largest-bucket chunks for the bulk, then a minimal-padding tail —
        the fewest-dispatch bucket combination whose sum is the smallest
        reachable value >= the remainder. A 33-sample request with buckets
        (8, 32, 128) runs [32, 8] (7 padded rows), never the 128-wide
        throughput batch (95 padded rows); a 5-sample request with buckets
        (4, 8, 16) runs [8] (one dispatch), not [4, 4] (two)."""
        big = self.buckets[-1]
        k, r = divmod(n, big)
        sizes = [big] * k
        if r:
            sizes += self._tail_plan(r)
        return sizes

    def _tail_plan(self, r: int) -> list[int]:
        """Cover a remainder 0 < r < max-bucket: exact-sum coin-change DP
        over the buckets, minimizing (padded rows, then dispatch count).
        The DP table depends only on the bucket set, so it is built once
        per synthesizer and each request tail is an O(tail) lookup."""
        coins, choice = self._coin_table()
        big = self.buckets[-1]
        inf = 1 << 30
        s = next(s for s in range(r, big + 1) if coins[s] < inf)  # big always reachable
        out: list[int] = []
        while s:
            out.append(choice[s])
            s -= choice[s]
        return sorted(out, reverse=True)

    def _coin_table(self) -> tuple[list[int], list[int]]:
        """coins[s] = min #buckets summing exactly to s (inf if unreachable);
        choice[s] = a bucket in that optimum (for reconstruction)."""
        cached = getattr(self, "_coin_table_cache", None)
        if cached is not None:
            return cached
        big = self.buckets[-1]
        inf = 1 << 30
        coins = [0] + [inf] * big
        choice = [0] * (big + 1)
        for s in range(1, big + 1):
            for b in self.buckets:
                if b <= s and coins[s - b] + 1 < coins[s]:
                    coins[s] = coins[s - b] + 1
                    choice[s] = b
        self._coin_table_cache = (coins, choice)
        return coins, choice

    def synthesize(self, spec_in, emb) -> tuple[np.ndarray, np.ndarray]:
        """(N,H,W,2) float + (N,2,16) int -> (spectrograms, wavs).

        Any N is accepted; requests are processed as fixed-shape chunks
        chosen from `self.buckets` (greedy largest bulk + minimal-padding
        tail — see _plan). H/W must match the
        synthesizer's grid (self.grid), i.e. the model's trained duration.
        """
        spec_in = np.asarray(spec_in, np.float32)
        emb = np.asarray(emb, np.int32)
        if spec_in.ndim != 4 or spec_in.shape[1:3] != self.grid:
            raise ValueError(
                f"spec_in shape {spec_in.shape} does not match the serving "
                f"grid {self.grid}; construct RIRSynthesizer with the "
                f"stft_shape of the model's duration"
            )
        n = spec_in.shape[0]
        if n == 0:
            return (np.zeros((0,) + self.grid + (2,), np.float32),
                    np.zeros((0, self.n_samples), np.float32))
        sizes = self._plan(n)
        self.last_dispatch_sizes = sizes  # observability + latency tests
        pad = sum(sizes) - n
        if pad:
            spec_in = np.concatenate([spec_in, np.repeat(spec_in[-1:], pad, 0)])
            emb = np.concatenate([emb, np.repeat(emb[-1:], pad, 0)])
        # Pipelined dispatch with a bounded window: keep at most two chunks
        # in flight (JAX async dispatch lets the device compute chunk i+1
        # while the host converts chunk i) WITHOUT letting peak HBM grow
        # with the request size — an unbounded submit-all would hold every
        # chunk's outputs (~220 KB/sample) on the chip until the first
        # readback, OOMing large requests that the serial loop handled.
        from collections import deque

        specs, wavs = [], []
        pending: deque = deque()

        def _drain_one():
            s, w, valid = pending.popleft()
            specs.append(np.asarray(s[:valid]))
            wavs.append(np.asarray(w[:valid]))

        i = 0
        for b in sizes:
            s, w = self._generate(
                self.variables, jnp.asarray(spec_in[i : i + b]), jnp.asarray(emb[i : i + b])
            )
            i += b
            # Fetch only the valid rows of the (padded) tail chunk: the
            # device->host transfer is the serving bottleneck on remote/
            # tunneled hosts (measured: a 3-sample request padded to batch
            # 128 spends ~5 s reading back 28 MB of padding it discards).
            pending.append((s, w, min(b, n - (i - b))))
            if len(pending) >= 2:  # true two-in-flight bound
                _drain_one()
        while pending:
            _drain_one()
        return np.concatenate(specs), np.concatenate(wavs)

    def synthesize_positions(
        self,
        spec_in,
        source: Sequence[tuple],
        target: Sequence[tuple],
    ) -> tuple[np.ndarray, np.ndarray]:
        """Synthesize by position descriptors instead of raw embeddings.

        source/target: sequences of (room_name, zone, array, l, m) tuples
        ('Planar'|'Circular' array names). The (2, 16) conditioning stack is
        built on device via the vectorized geometry path.
        """
        emb_src = self._embed(source)
        emb_tgt = self._embed(target)
        emb = np.stack([emb_src, emb_tgt], axis=1)
        return self.synthesize(spec_in, emb)

    @staticmethod
    def _embed(descriptors: Sequence[tuple]) -> np.ndarray:
        return rooms_mod.embed_descriptors(descriptors)


__all__ = ["RIRSynthesizer"]
