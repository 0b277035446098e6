"""High-level Trainer: epoch loop, LR schedule, callbacks, checkpointing.

One engine replaces the reference's three copies of the same loop
(trainer.py:40-130, amp_phase_trainer.py:37-127, vae_trainer.py:39-133)
and the inline distributed loop (main_training.py:337-393). The loss
family and the optimizer are injected; parallelism is a sharding choice
made by the caller (see unet_rir_tpu.parallel), not a separate code path.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable

import jax
import numpy as np

from unet_rir_tpu.train import optimizers as opt_mod
from unet_rir_tpu.train.callbacks import BestCheckpoint, EarlyStopping, History
from unet_rir_tpu.train.checkpoint import CheckpointManager
from unet_rir_tpu.train.losses import LossConfig
from unet_rir_tpu.train.steps import (
    TrainState,
    make_eval_epoch,
    make_eval_step,
    make_train_epoch,
    make_train_step,
)


@dataclasses.dataclass
class TrainerConfig:
    """Knob set of the reference entry points (main_training.py:27-50)."""

    n_epochs: int = 500
    learning_rate: float = 5e-7
    optimizer: str = "adam"
    lr_decay_start: int | None = 80  # lr_exp_decay=[True, 80]
    lr_decay_style: str = "pow"
    early_stop_patience: int | None = None
    checkpoint_dir: str | None = None
    best_export_dir: str | None = None  # best-val save_pretrained (trainer.py:175-205)
    best_min_delta: float = 0.0
    checkpoint_every: int = 2
    checkpoint_keep: int = 2
    log_every: int = 0  # steps; 0 = epoch-level only
    fused_epochs: bool = True  # lax.scan the whole epoch on device when possible
    remat: bool = False  # rematerialize forward in backward (bigger batches)
    accum_steps: int = 1  # gradient accumulation microbatches per step
    preempt_save: bool = True  # SIGTERM/SIGINT -> checkpoint + clean stop
    async_best_export: bool = True  # overlap best-export fetch/write with training
    seed: int = 0


class Trainer:
    def __init__(self, model, loss_cfg: LossConfig, cfg: TrainerConfig):
        self.model = model
        self.loss_cfg = loss_cfg
        self.cfg = cfg
        self.optimizer = opt_mod.build_optimizer(cfg.optimizer, cfg.learning_rate)
        self.train_step = make_train_step(model, self.optimizer, loss_cfg,
                                          remat=cfg.remat,
                                          accum_steps=cfg.accum_steps)
        self.eval_step = make_eval_step(model, loss_cfg)
        self.train_epoch = make_train_epoch(model, self.optimizer, loss_cfg,
                                            remat=cfg.remat,
                                            accum_steps=cfg.accum_steps)
        self.eval_epoch = make_eval_epoch(model, loss_cfg)
        self.history = History()
        self._stop_requested = False

    def init_state(self, variables: dict) -> TrainState:
        return TrainState.create(variables, self.optimizer)

    def request_stop(self) -> None:
        """Ask the running fit() to checkpoint and stop after the current
        epoch. Called by the SIGTERM/SIGINT handler on preemption (TPU slot
        reclaims send SIGTERM with a grace window); safe from any thread."""
        self._stop_requested = True

    def fit(
        self,
        state: TrainState,
        train_gen,
        val_gen=None,
        log_fn: Callable[[str], None] = print,
    ) -> tuple[TrainState, History]:
        cfg = self.cfg
        manager = None
        start_epoch = 0
        if cfg.checkpoint_dir:
            manager = CheckpointManager(
                cfg.checkpoint_dir, cfg.checkpoint_keep, cfg.checkpoint_every
            )
            state, restored = manager.restore_latest(state)
            if restored is not None:
                start_epoch = restored + 1
                log_fn(f"Restored checkpoint at epoch {restored}")

        early = EarlyStopping(cfg.early_stop_patience) if cfg.early_stop_patience else None
        best = None
        exporter = None
        if cfg.best_export_dir:
            from unet_rir_tpu.models.io import save_pretrained

            state_box = {}
            if cfg.async_best_export:
                # Each best-export is a full device->host parameter fetch +
                # npz write — measured ~15 s/epoch on the tunneled v5e at
                # the 1.3 s grid, i.e. more than the fused epoch's compute,
                # and early training improves val EVERY epoch. Snapshot the
                # params ON DEVICE (one jitted copy, so the next epoch's
                # donation can't invalidate them) and let a worker thread
                # do the fetch+write while the next epochs train.
                snapshot = jax.jit(lambda tree: jax.tree.map(
                    lambda x: x + 0 if hasattr(x, "dtype") else x, tree))
                exporter = _AsyncExporter(
                    lambda variables: save_pretrained(
                        cfg.best_export_dir, self.model, variables))

            def _save_best():
                if jax.process_index() != 0:
                    # Host-side npz write: primary-only under multi-host
                    # (state is replicated; duplicate writers would race).
                    return
                s = state_box["state"]
                variables = {"params": s.params}
                if s.batch_stats:
                    variables["batch_stats"] = s.batch_stats
                if exporter is not None:
                    exporter.submit(snapshot(variables))
                else:
                    save_pretrained(cfg.best_export_dir, self.model, variables)

            best = BestCheckpoint(_save_best, cfg.best_min_delta)
        rng = jax.random.key(cfg.seed)

        # Preemption handling: TPU reclaims deliver SIGTERM with a grace
        # window; checkpoint-then-stop at the next epoch boundary instead of
        # dying mid-run (extends the reference's every-2-epochs resilience,
        # main_training.py:363-364, to unplanned termination). Handlers can
        # only be installed from the main thread; elsewhere (e.g. a test
        # runner thread) request_stop() remains callable directly.
        self._stop_requested = False
        prev_handlers = {}
        if cfg.preempt_save:
            import signal

            def _on_signal(signum, frame):
                if self._stop_requested:
                    # Second signal: the user really wants out NOW (e.g. the
                    # epoch is hung on a degraded transport and the boundary
                    # never comes). Restore the previous handlers and raise
                    # so the process stays interruptible.
                    for s_, h_ in prev_handlers.items():
                        signal.signal(s_, h_)
                    raise KeyboardInterrupt(f"second signal {signum}")
                log_fn(f"Signal {signum}: will checkpoint and stop after "
                       f"this epoch (send again to abort immediately)")
                self.request_stop()

            for sig in (signal.SIGTERM, signal.SIGINT):
                try:
                    prev_handlers[sig] = signal.signal(sig, _on_signal)
                except ValueError:  # not the main thread
                    break

        # Fused path: whole epoch as one on-device lax.scan (one dispatch),
        # available when the generator exposes its gather indices and the
        # corpus is device-resident (plain DataGenerator; sharded wrappers
        # fall back to the per-step path).
        fused = cfg.fused_epochs and hasattr(train_gen, "epoch_indices")
        gen_mesh = getattr(train_gen, "mesh", None)
        mesh = gen_mesh if fused else None
        multiproc = jax.process_count() > 1
        corpus_on_mesh: dict = {}

        def _global_key(key):
            """Make a PRNG key a global (replicated) array for multi-process
            jit. Raw uint32 key data keeps put_global dtype-simple; the step
            factories accept legacy raw keys."""
            if not multiproc or gen_mesh is None:
                return key
            from unet_rir_tpu.parallel import put_global, replicated

            return put_global(np.asarray(jax.random.key_data(key)),
                              replicated(gen_mesh))

        def _place_corpus(tag, ds):
            """Replicate the (static) corpus onto the mesh once, not per epoch."""
            if tag not in corpus_on_mesh:
                from unet_rir_tpu.parallel import put_global, replicated

                rep = replicated(mesh)
                corpus_on_mesh[tag] = (
                    put_global(ds.features, rep),
                    put_global(ds.embeddings, rep),
                )
            return corpus_on_mesh[tag]

        try:
            for epoch in range(start_epoch, cfg.n_epochs):
                t0 = time.time()
                lr = opt_mod.epoch_lr(
                    cfg.learning_rate, epoch, cfg.lr_decay_start, cfg.lr_decay_style
                )

                if fused:
                    ds = train_gen.dataset
                    idx_in, idx_out = train_gen.epoch_indices()
                    feats, embs = ds.features, ds.embeddings
                    idx_in = jax.numpy.asarray(idx_in)
                    idx_out = jax.numpy.asarray(idx_out)
                    if mesh is not None:
                        from unet_rir_tpu.parallel import (
                            NamedSharding, P, put_global)

                        feats, embs = _place_corpus("train", ds)
                        idx_sharding = NamedSharding(mesh, P(None, "data"))
                        idx_in = put_global(idx_in, idx_sharding)
                        idx_out = put_global(idx_out, idx_sharding)
                    rng, epoch_rng = jax.random.split(rng)
                    state, tr_dev = self.train_epoch(
                        state, feats, embs, idx_in, idx_out,
                        _global_key(epoch_rng), lr
                    )
                    tr = {k: float(v) for k, v in tr_dev.items()}
                    train_gen.on_epoch_end()
                    va = {}
                    if val_gen is not None and hasattr(val_gen, "epoch_indices") and len(val_gen) > 0:
                        v_in, v_out = val_gen.epoch_indices()
                        vds = val_gen.dataset
                        vf, ve = vds.features, vds.embeddings
                        v_in = jax.numpy.asarray(v_in)
                        v_out = jax.numpy.asarray(v_out)
                        if mesh is not None:
                            vf, ve = _place_corpus("val", vds)
                            v_in = put_global(v_in, idx_sharding)
                            v_out = put_global(v_out, idx_sharding)
                        va_dev = self.eval_epoch(state, vf, ve, v_in, v_out)
                        va = {k: float(v) for k, v in va_dev.items()}
                        val_gen.on_epoch_end()
                else:
                    train_metrics = _MeanAccumulator()
                    for step_idx in range(len(train_gen)):
                        batch = train_gen[step_idx]
                        rng, step_rng = jax.random.split(rng)
                        state, metrics = self.train_step(
                            state, batch[:3], _global_key(step_rng), lr)
                        train_metrics.update(metrics)
                        if cfg.log_every and step_idx % cfg.log_every == 0:
                            log_fn(f"  step {step_idx}/{len(train_gen)}")
                    train_gen.on_epoch_end()

                    val_metrics = _MeanAccumulator()
                    if val_gen is not None:
                        for step_idx in range(len(val_gen)):
                            val_metrics.update(self.eval_step(state, val_gen[step_idx][:3]))
                        val_gen.on_epoch_end()

                    tr = train_metrics.result()
                    va = val_metrics.result()
                epoch_time = time.time() - t0
                self.history.append(
                    loss=tr.get("loss", np.nan),
                    loss_amplitude=tr.get("loss_amplitude", np.nan),
                    loss_phase=tr.get("loss_phase", np.nan),
                    val_loss=va.get("loss", np.nan),
                    val_loss_amplitude=va.get("loss_amplitude", np.nan),
                    val_loss_phase=va.get("loss_phase", np.nan),
                    lr=lr,
                    epoch_time=epoch_time,
                )
                # Epoch print template (main_training.py:378-385).
                log_fn(
                    f"Epoch {epoch + 1}, Loss: {tr.get('loss', np.nan):.6g}, "
                    f"Epoch time: {epoch_time:.2f}\n"
                    f"Train | MSE Loss: {tr.get('loss_amplitude', np.nan):.6g}, "
                    f"Phase Loss: {tr.get('loss_phase', np.nan):.6g}\n"
                    f"Val   | MSE Loss: {va.get('loss_amplitude', np.nan):.6g}, "
                    f"Phase Loss: {va.get('loss_phase', np.nan):.6g}\n"
                    f"lr    | {lr:.3g}"
                )

                if manager is not None:
                    manager.maybe_save(epoch, state)
                if best is not None and va:
                    state_box["state"] = state
                    best.update(va.get("loss", np.inf))
                if early is not None and va and early.update(va.get("loss", np.inf)):
                    log_fn(f"Early stopping at epoch {epoch + 1}")
                    break
                if self._stop_requested:
                    if manager is not None and manager.latest_step() != epoch:
                        manager.save(epoch, state)  # off-cadence preemption save
                    log_fn(f"Stop requested; checkpointed epoch {epoch + 1} and "
                           f"stopping (resume restores it)")
                    break

        finally:
            # Always restore signal handlers and close the checkpoint
            # manager, even when an epoch raises — a leaked _on_signal
            # would make the whole process uninterruptible afterwards.
            if prev_handlers:
                import signal

                for sig, h in prev_handlers.items():
                    signal.signal(sig, h)
            if manager is not None:
                manager.close()
            if exporter is not None:
                # Drain: fit() never returns before the newest best export
                # is on disk (and re-raises a worker write failure).
                exporter.close()
        return state, self.history


class _AsyncExporter:
    """Run `fn(payload)` on one worker thread; the latest payload wins.

    Built for best-val exports: every write is "best so far", so when a
    newer snapshot arrives before the previous one was written, the
    previous one is obsolete and is dropped (early training improves val
    every epoch — writing each would serialize N full parameter fetches).
    `close()` drains the newest pending payload before returning and
    re-raises the last worker exception, so callers never finish with a
    stale or silently-failed export. Payloads must be safe to read from
    another thread (the trainer hands over freshly-copied device arrays;
    jax transfers are thread-safe).
    """

    def __init__(self, fn):
        import threading

        self.fn = fn
        self._cv = threading.Condition()
        self._payload = None
        self._closing = False
        self._error: BaseException | None = None
        self._thread = threading.Thread(
            target=self._run, name="best-export", daemon=True)
        self._thread.start()

    def submit(self, payload) -> None:
        with self._cv:
            self._payload = payload  # supersedes any pending one
            self._cv.notify()

    def _run(self) -> None:
        while True:
            with self._cv:
                while self._payload is None and not self._closing:
                    self._cv.wait()
                payload, self._payload = self._payload, None
                if payload is None:
                    return  # closing with nothing pending
            try:
                self.fn(payload)
            except BaseException as e:  # surfaced by close()
                self._error = e

    def close(self) -> None:
        with self._cv:
            self._closing = True
            self._cv.notify()
        self._thread.join()
        if self._error is not None:
            raise self._error


class _MeanAccumulator:
    """Running mean over step metric dicts (tf.keras.metrics.Mean equivalent).

    Accumulates device scalars lazily — converting per step would force a
    blocking host readback per metric per step, which costs more than the
    step itself on a remote TPU; the single conversion happens in result().
    """

    def __init__(self):
        self._sums: dict[str, object] = {}
        self._count = 0

    def update(self, metrics: dict):
        self._count += 1
        for k, v in metrics.items():
            prev = self._sums.get(k)
            self._sums[k] = v if prev is None else prev + v

    def result(self) -> dict[str, float]:
        if not self._count:
            return {}
        return {k: float(v) / self._count for k, v in self._sums.items()}

    def __bool__(self):
        return self._count > 0


__all__ = ["Trainer", "TrainerConfig", "_MeanAccumulator"]
