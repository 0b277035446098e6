"""Orbax-based composite checkpointing (resume-capable).

TPU-native replacement of tf.train.Checkpoint + CheckpointManager
(main_training.py:171-172, 363-364; restore in rir_generation.py:125-133):
step-indexed checkpoints of {params, batch_stats, opt_state, step} with
keep-N retention and restore-latest-or-initialize semantics.
"""

from __future__ import annotations

import os

import jax
import orbax.checkpoint as ocp

from unet_rir_tpu.train.steps import TrainState

DEFAULT_KEEP = 2  # reference max_to_keep=2
DEFAULT_EVERY = 2  # reference saves every 2 epochs


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = DEFAULT_KEEP,
                 save_every: int = DEFAULT_EVERY):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.save_every = save_every
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True, enable_async_checkpointing=False
            ),
        )

    def maybe_save(self, epoch: int, state: TrainState) -> bool:
        """Save on the reference cadence (every `save_every` epochs).
        save_every <= 0 disables periodic saves entirely (preempt/final
        saves still go through save()) — previously 0 raised
        ZeroDivisionError at the first epoch boundary (ADVICE r4)."""
        if self.save_every <= 0 or epoch % self.save_every != 0:
            return False
        self.save(epoch, state)
        return True

    def save(self, step: int, state: TrainState) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore_latest(self, template: TrainState) -> tuple[TrainState, int | None]:
        """Restore the newest checkpoint, or return `template` untouched.

        Mirrors rir_generation.py:128-133's restore-or-'Initializing from
        scratch.' behavior.
        """
        step = self._mgr.latest_step()
        if step is None:
            return template, None
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore(abstract))
        return restored, step

    def close(self):
        self._mgr.close()


__all__ = ["CheckpointManager", "DEFAULT_KEEP", "DEFAULT_EVERY"]
