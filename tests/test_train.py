"""Training-engine tests: loss formulas, gradient steps decrease loss,
checkpoint save/resume, LR schedules (SURVEY.md §4 implication (c))."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unet_rir_tpu import models, train
from unet_rir_tpu.train.losses import LossConfig, compute_loss, l2_penalty, phase_cosine_loss


B, H, W, C = 2, 144, 160, 2


def _batch(rng, b=B):
    spec_in = jnp.asarray(rng.uniform(0, 1, (b, H, W, C)).astype(np.float32))
    emb = jnp.asarray(rng.integers(0, 1500, (b, 2, 16)).astype(np.int32))
    spec_out = jnp.asarray(rng.uniform(0, 1, (b, H, W, C)).astype(np.float32))
    return spec_in, emb, spec_out


class TestLosses:
    def test_phase_cosine_zero_at_equal(self, rng):
        p = jnp.asarray(rng.uniform(0, 1, (4, 4)).astype(np.float32))
        np.testing.assert_allclose(np.asarray(phase_cosine_loss(p, p)), 0.0, atol=1e-6)

    def test_phase_cosine_wraps(self):
        # phase 0.0 and 1.0 normalized are both -pi (wrapped) -> zero loss
        a = jnp.zeros((2, 2))
        b = jnp.ones((2, 2))
        np.testing.assert_allclose(np.asarray(phase_cosine_loss(a, b)), 0.0, atol=1e-5)

    def test_phase_cosine_max_at_pi(self):
        a = jnp.zeros((2, 2))
        b = jnp.full((2, 2), 0.5)  # difference of pi radians
        np.testing.assert_allclose(np.asarray(phase_cosine_loss(a, b)), 2.0, atol=1e-5)

    def test_blend_matches_reference_formula(self, rng):
        spec_in, _, spec_out = _batch(rng)
        pred = jnp.asarray(rng.uniform(0, 1, (B, H, W, C)).astype(np.float32))
        cfg = LossConfig(alpha=0.9)
        loss, metrics = compute_loss(cfg, spec_in, spec_out, pred)
        # Reference: per-pixel blend / (H*W*C), summed, / global_batch
        amp_err = np.square(np.asarray(spec_out[..., 0]) - np.asarray(pred[..., 0]))
        t = np.asarray(spec_out[..., 1]) * 2 * math.pi - math.pi
        p = np.asarray(pred[..., 1]) * 2 * math.pi - math.pi
        d = (t - p + math.pi) % (2 * math.pi) - math.pi
        ph_err = 1 - np.cos(d)
        expected = (0.9 * amp_err + 0.1 * ph_err).sum() / (H * W * C) / B
        np.testing.assert_allclose(float(loss), expected, rtol=1e-5)

    def test_sigmoid_mask_downweights_late_frames(self, rng):
        spec_in, _, spec_out = _batch(rng)
        pred = jnp.asarray(rng.uniform(0, 1, (B, H, W, C)).astype(np.float32))
        base = compute_loss(LossConfig(alpha=0.0), spec_in, spec_out, pred)[0]
        masked = compute_loss(LossConfig(alpha=0.0, sigmoid_loss=True), spec_in, spec_out, pred)[0]
        assert float(masked) < float(base)

    def test_diff_loss_uses_input_phase(self, rng):
        spec_in, _, spec_out = _batch(rng)
        # pred phase == normalized (out - in) phase diff -> zero phase loss
        diff = spec_out[..., 1] - spec_in[..., 1]
        pred = jnp.stack([spec_out[..., 0], diff], axis=-1)
        loss, m = compute_loss(LossConfig(alpha=0.0, diff_loss=True), spec_in, spec_out, pred)
        np.testing.assert_allclose(float(loss), 0.0, atol=1e-4)

    def test_l2_penalty_selects_patterns(self):
        params = {
            "reg_down_0": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones((2,))},
            "other": {"kernel": jnp.ones((3, 3))},
        }
        pen = l2_penalty(params, ("reg_",))
        np.testing.assert_allclose(float(pen), 0.001 * 4.0, rtol=1e-6)

    def test_kl(self):
        mean = jnp.zeros((2, 8))
        log_var = jnp.zeros((2, 8))
        kl = train.kl_divergence(mean, log_var)
        np.testing.assert_allclose(np.asarray(kl), 0.0, atol=1e-6)


class TestTrainStep:
    def test_loss_decreases(self, rng):
        model = models.UNet(number_filters_0=4)
        batch = _batch(rng)
        variables = train.init_model(model, batch)
        opt = train.build_optimizer("adam", 1e-3)
        step = train.make_train_step(model, opt, LossConfig())
        state = train.TrainState.create(variables, opt)
        losses = []
        for i in range(8):
            state, metrics = step(state, batch, jax.random.key(i), 1e-3)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0], losses

    def test_eval_step_runs(self, rng):
        model = models.UNet(number_filters_0=4)
        batch = _batch(rng)
        variables = train.init_model(model, batch)
        opt = train.build_optimizer("adam", 1e-3)
        state = train.TrainState.create(variables, opt)
        metrics = train.make_eval_step(model, LossConfig())(state, batch)
        assert "loss" in metrics and np.isfinite(float(metrics["loss"]))

    @pytest.mark.parametrize("opt_name", ["adam", "nadam", "sgd", "lamb"])
    def test_optimizers(self, rng, opt_name):
        model = models.UNet(number_filters_0=4)
        batch = _batch(rng)
        variables = train.init_model(model, batch)
        opt = train.build_optimizer(opt_name, 1e-3)
        step = train.make_train_step(model, opt, LossConfig())
        state = train.TrainState.create(variables, opt)
        state, metrics = step(state, batch, jax.random.key(0), 1e-3)
        assert np.isfinite(float(metrics["loss"]))


class TestSchedules:
    def test_pow_decay(self):
        # main_training.py:344 semantics
        assert train.epoch_lr(1e-3, 10, 80) == 1e-3
        assert train.epoch_lr(1e-3, 80, 80) == pytest.approx(1e-3 * 0.9)
        assert train.epoch_lr(1e-3, 160, 80) == pytest.approx(1e-3 * 0.9**2)

    def test_exp_decay(self):
        # trainer.py:62 semantics
        assert train.epoch_lr(1e-3, 81, 80, style="exp") == pytest.approx(1e-3 * math.exp(-0.25))

    def test_no_decay(self):
        assert train.epoch_lr(1e-3, 100, None) == 1e-3


class TestCheckpoint:
    def test_save_restore_roundtrip(self, rng, tmp_path):
        model = models.UNet(number_filters_0=4)
        batch = _batch(rng)
        variables = train.init_model(model, batch)
        opt = train.build_optimizer("adam", 1e-3)
        step = train.make_train_step(model, opt, LossConfig())
        state = train.TrainState.create(variables, opt)
        state, _ = step(state, batch, jax.random.key(0), 1e-3)

        mgr = train.CheckpointManager(str(tmp_path / "ckpt"))
        mgr.save(0, state)
        template = train.TrainState.create(train.init_model(model, batch, seed=9), opt)
        restored, step_idx = mgr.restore_latest(template)
        assert step_idx == 0
        np.testing.assert_allclose(
            np.asarray(jax.tree_util.tree_leaves(restored.params)[0]),
            np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
        )
        mgr.close()

    def test_restore_from_scratch(self, rng, tmp_path):
        model = models.UNet(number_filters_0=4)
        batch = _batch(rng)
        opt = train.build_optimizer("adam", 1e-3)
        state = train.TrainState.create(train.init_model(model, batch), opt)
        mgr = train.CheckpointManager(str(tmp_path / "empty"))
        restored, step_idx = mgr.restore_latest(state)
        assert step_idx is None
        mgr.close()

    def test_cadence(self, rng, tmp_path):
        model = models.UNet(number_filters_0=4)
        batch = _batch(rng)
        opt = train.build_optimizer("adam", 1e-3)
        state = train.TrainState.create(train.init_model(model, batch), opt)
        mgr = train.CheckpointManager(str(tmp_path / "cad"), save_every=2)
        assert mgr.maybe_save(0, state) is True
        assert mgr.maybe_save(1, state) is False
        assert mgr.maybe_save(2, state) is True
        mgr.close()

    def test_cadence_zero_disables_periodic_saves(self, rng, tmp_path):
        """save_every=0 means 'no periodic saves' — previously it raised
        ZeroDivisionError at the first epoch boundary (ADVICE r4)."""
        model = models.UNet(number_filters_0=4)
        batch = _batch(rng)
        opt = train.build_optimizer("adam", 1e-3)
        state = train.TrainState.create(train.init_model(model, batch), opt)
        mgr = train.CheckpointManager(str(tmp_path / "cad0"), save_every=0)
        assert mgr.maybe_save(0, state) is False
        assert mgr.maybe_save(2, state) is False
        mgr.save(3, state)  # explicit (preempt/final) saves still work
        _, step_idx = mgr.restore_latest(state)
        assert step_idx == 3
        mgr.close()


class TestCallbacks:
    def test_early_stopping(self):
        es = train.EarlyStopping(patience=2)
        assert not es.update(1.0)
        assert not es.update(1.1)
        assert es.update(1.2)

    def test_best_checkpoint(self):
        saves = []
        bc = train.BestCheckpoint(lambda: saves.append(1), min_delta=0.01)
        assert bc.update(1.0)
        assert not bc.update(0.995)  # within min_delta
        assert bc.update(0.9)
        assert len(saves) == 2


class TestParityUtilities:
    def test_rmse_coef(self, rng):
        a = jnp.asarray(rng.standard_normal((4, 5)).astype(np.float32))
        expected = np.sqrt(np.mean(np.asarray(a) ** 2) + 1e-12)
        np.testing.assert_allclose(float(train.rmse_coef(a, jnp.zeros_like(a))), expected, rtol=1e-5)

    def test_inverse_time_decay(self):
        sched = train.inverse_time_decay(1e-3, decay_steps=100, decay_rate=1.0)
        assert sched(0) == pytest.approx(1e-3)
        assert sched(100) == pytest.approx(5e-4)

    def test_softmax_cross_entropy(self):
        logits = jnp.array([[10.0, 0.0], [0.0, 10.0]])
        labels = jnp.array([0, 1])
        ce = train.softmax_cross_entropy(logits, labels)
        assert float(jnp.max(ce)) < 1e-3

    def test_classifier_trains(self, rng):
        """DeepCNN + softmax CE: loss decreases (cnn_clas capability)."""
        from unet_rir_tpu import models
        import optax

        model = models.DeepCNN(n_classes=3, batch_norm=False)
        spec = jnp.asarray(rng.uniform(0, 1, (6, 144, 160, 2)).astype(np.float32))
        labels = jnp.asarray(rng.integers(0, 3, (6,)))
        variables = model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, spec, training=False)
        params = variables["params"]
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)

        def loss_fn(p, key):
            logits = model.apply({"params": p}, spec, training=True, rngs={"dropout": key})
            return jnp.mean(train.softmax_cross_entropy(logits, labels))

        losses = []
        for i in range(10):
            loss, grads = jax.value_and_grad(loss_fn)(params, jax.random.key(i))
            updates, opt_state = opt.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            losses.append(float(loss))
        assert losses[-1] < losses[0]

    def test_trainer_best_export(self, rng, tmp_path):
        """Best-val save_pretrained fires when val improves (trainer.py:175-205)."""
        from unet_rir_tpu import models
        from unet_rir_tpu.data.corpus import Corpus
        from unet_rir_tpu.data.pipeline import DataGenerator
        from unet_rir_tpu.train.trainer import Trainer, TrainerConfig
        import os

        corpus = Corpus.synthetic(n_per_room=6, max_order=2)
        train_gen = DataGenerator(corpus, batch_size=4, partition="train")
        val_gen = DataGenerator(corpus, batch_size=4, partition="val")
        model = models.UNet(number_filters_0=2)
        cfg = TrainerConfig(n_epochs=2, learning_rate=1e-3, lr_decay_start=None,
                            best_export_dir=str(tmp_path / "best"))
        trainer = Trainer(model, train.LossConfig(), cfg)
        state = trainer.init_state(train.init_model(model, train_gen[0]))
        trainer.fit(state, train_gen, val_gen, log_fn=lambda s: None)
        assert os.path.exists(str(tmp_path / "best" / "weights.npz"))
        m2, v2 = models.load_pretrained(str(tmp_path / "best"))
        assert isinstance(m2, models.UNet)

    def test_async_export_matches_sync(self, rng, tmp_path):
        """async_best_export hides the device->host fetch behind training
        (latest-wins worker, trainer._AsyncExporter) — it must write byte-
        equivalent weights to the synchronous path for the same run."""
        from unet_rir_tpu import models
        from unet_rir_tpu.data.corpus import Corpus
        from unet_rir_tpu.data.pipeline import DataGenerator
        from unet_rir_tpu.train.trainer import Trainer, TrainerConfig
        import numpy as np
        import os

        corpus = Corpus.synthetic(n_per_room=6, max_order=2)
        model = models.UNet(number_filters_0=2)

        def run(async_export: bool, tag: str):
            import random

            # The per-epoch reshuffle draws from the global random module
            # (reference keras-generator behavior) — pin it so the two
            # runs see identical batch orders and the comparison isolates
            # the export path.
            random.seed(1234)
            train_gen = DataGenerator(corpus, batch_size=4, partition="train")
            val_gen = DataGenerator(corpus, batch_size=4, partition="val")
            cfg = TrainerConfig(n_epochs=3, learning_rate=1e-3,
                                lr_decay_start=None,
                                async_best_export=async_export,
                                best_export_dir=str(tmp_path / tag))
            trainer = Trainer(model, train.LossConfig(), cfg)
            state = trainer.init_state(train.init_model(model, train_gen[0]))
            trainer.fit(state, train_gen, val_gen, log_fn=lambda s: None)
            return os.path.join(str(tmp_path / tag), "weights.npz")

        p_async, p_sync = run(True, "async"), run(False, "sync")
        with np.load(p_async) as a, np.load(p_sync) as s:
            assert sorted(a.files) == sorted(s.files)
            for k in a.files:
                np.testing.assert_array_equal(a[k], s[k], err_msg=k)

    def test_async_exporter_latest_wins_and_raises(self):
        """Unit pin of the worker semantics: a superseded payload may be
        dropped, the newest is always written, and close() re-raises a
        worker failure instead of losing it."""
        import threading

        from unet_rir_tpu.train.trainer import _AsyncExporter

        written = []
        gate = threading.Event()

        def slow_write(payload):
            gate.wait(5)
            written.append(payload)

        ex = _AsyncExporter(slow_write)
        ex.submit(1)
        ex.submit(2)  # supersedes 1 if 1 hasn't started; 2 must win either way
        ex.submit(3)
        gate.set()
        ex.close()
        assert written[-1] == 3

        def bad_write(payload):
            raise RuntimeError("disk full")

        ex2 = _AsyncExporter(bad_write)
        ex2.submit("x")
        try:
            ex2.close()
        except RuntimeError as e:
            assert "disk full" in str(e)
        else:
            raise AssertionError("worker error was swallowed")


def test_remat_matches_plain(rng):
    """remat=True must not change the math, only the memory schedule."""
    model = models.UNet(number_filters_0=4, batch_norm=False)
    batch = _batch(rng)
    variables = train.init_model(model, batch)
    opt = train.build_optimizer("adam", 1e-3)

    def run(remat):
        step = train.make_train_step(model, opt, LossConfig(), remat=remat)
        state = train.TrainState.create(jax.tree.map(jnp.copy, variables), opt)
        state, metrics = step(state, batch, jax.random.key(0), 1e-3)
        return float(metrics["loss"]), jax.tree_util.tree_leaves(state.params)[0]

    l1, p1 = run(False)
    l2, p2 = run(True)
    np.testing.assert_allclose(l1, l2, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-5, atol=1e-7)


class TestPreemption:
    """SIGTERM/SIGINT -> off-cadence checkpoint + clean stop + resume."""

    def _fit(self, tmp_path, stop_after_epoch=None, n_epochs=6, sig=None):
        import os as _os
        import signal as _signal

        from unet_rir_tpu import models
        from unet_rir_tpu.data.corpus import Corpus
        from unet_rir_tpu.data.pipeline import DataGenerator
        from unet_rir_tpu.train.trainer import Trainer, TrainerConfig

        corpus = Corpus.synthetic(n_per_room=6, max_order=2)
        train_gen = DataGenerator(corpus, batch_size=4, partition="train")
        model = models.UNet(number_filters_0=2)
        cfg = TrainerConfig(n_epochs=n_epochs, learning_rate=1e-3,
                            lr_decay_start=None,
                            checkpoint_dir=str(tmp_path / "ckpt"),
                            checkpoint_every=100)  # off-cadence: no periodic saves
        trainer = Trainer(model, train.LossConfig(), cfg)
        state = trainer.init_state(train.init_model(model, train_gen[0]))

        epochs_seen = []

        def log_fn(msg):
            if msg.startswith("Epoch "):
                epochs_seen.append(msg)
                if stop_after_epoch is not None and len(epochs_seen) == stop_after_epoch:
                    if sig is not None:
                        _os.kill(_os.getpid(), sig)  # handled, not fatal
                    else:
                        trainer.request_stop()

        trainer.fit(state, train_gen, log_fn=log_fn)
        return trainer, epochs_seen

    def test_request_stop_checkpoints_and_stops(self, tmp_path):
        from unet_rir_tpu.train.checkpoint import CheckpointManager

        trainer, seen = self._fit(tmp_path, stop_after_epoch=2)
        assert len(seen) == 2  # stopped after epoch 2 of 6
        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        assert mgr.latest_step() == 1  # 0-indexed epoch 2, despite every=100
        mgr.close()

    def test_sigterm_triggers_stop(self, tmp_path):
        import signal
        import threading

        if threading.current_thread() is not threading.main_thread():
            import pytest
            pytest.skip("signal delivery requires the main thread")
        trainer, seen = self._fit(tmp_path, stop_after_epoch=1,
                                  sig=signal.SIGTERM)
        assert len(seen) == 1
        # previous handler restored after fit
        assert signal.getsignal(signal.SIGTERM) in (
            signal.SIG_DFL, signal.default_int_handler) or callable(
            signal.getsignal(signal.SIGTERM))

    def test_resume_after_preempt(self, tmp_path):
        trainer, seen = self._fit(tmp_path, stop_after_epoch=2)
        # A fresh fit restores epoch 1 and continues from epoch 2.
        trainer2, seen2 = self._fit(tmp_path, stop_after_epoch=None,
                                    n_epochs=4)
        assert len(seen2) == 2  # epochs 3 and 4 only


class TestGradientAccumulation:
    """accum_steps>1 = mean gradient of the full batch at one microbatch's
    activation footprint (steps._make_grad_apply)."""

    @staticmethod
    def _tree_close(a, b, rtol=2e-5, atol=1e-7):
        la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
        assert len(la) == len(lb)
        for x, y in zip(la, lb):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=rtol, atol=atol)

    def test_accum_matches_manual_microbatch_mean(self, rng):
        """The scan implementation == a hand-rolled microbatch loop with the
        same fold_in key scheme, BN chaining, and one optimizer update —
        pins the exact semantics incl. dropout keys and batch_stats carry."""
        import optax

        model = models.UNet(number_filters_0=4)  # batch_norm=True: BN carry
        k, b = 2, 4
        batch = _batch(rng, b=b)
        variables = train.init_model(model, batch)
        opt = train.build_optimizer("sgd", 1e-2)
        cfg = LossConfig()
        key = jax.random.key(7)

        step = train.make_train_step(model, opt, cfg, accum_steps=k)
        state = train.TrainState.create(jax.tree.map(jnp.copy, variables), opt)
        new_state, metrics = step(state, batch, key, 1e-2)
        assert np.isfinite(metrics["loss"])

        params = variables["params"]
        bn = variables.get("batch_stats", {})

        def loss_fn(p, bn_, mb, r):
            v = {"params": p}
            if bn_:
                v["batch_stats"] = bn_
            out, mut = model.apply(
                v, mb[0], mb[1], training=True,
                rngs={"dropout": r, "sampling": jax.random.fold_in(r, 1)},
                mutable=["batch_stats"])
            pred, aux = out if isinstance(out, tuple) else (out, {})
            loss, _ = compute_loss(cfg, mb[0], mb[2], pred, aux, p,
                                   model.L2_PATTERNS)
            return loss, mut["batch_stats"]

        grad = jax.grad(loss_fn, has_aux=True)
        gsum = None
        mb_sz = b // k
        for m in range(k):
            mb = tuple(x[m * mb_sz:(m + 1) * mb_sz] for x in batch)
            grads, bn = grad(params, bn, mb, jax.random.fold_in(key, m))
            gsum = grads if gsum is None else jax.tree.map(jnp.add, gsum, grads)
        grads = jax.tree.map(lambda g: g / k, gsum)
        updates, _ = opt.update(grads, opt.init(params), params)
        expected = optax.apply_updates(params, updates)

        self._tree_close(new_state.params, expected)
        self._tree_close(new_state.batch_stats, bn)

    def test_indivisible_batch_raises(self, rng):
        model = models.UNet(number_filters_0=4, batch_norm=False)
        batch = _batch(rng, b=3)
        variables = train.init_model(model, batch)
        opt = train.build_optimizer("adam", 1e-3)
        step = train.make_train_step(model, opt, LossConfig(), accum_steps=2)
        state = train.TrainState.create(variables, opt)
        with pytest.raises(ValueError, match="not divisible"):
            step(state, batch, jax.random.key(0), 1e-3)

    def test_fused_epoch_accum_matches_step(self, rng):
        """A 1-step fused epoch with accum_steps=2 == make_train_step with
        the same accumulation and the key the epoch body derives."""
        model = models.UNet(number_filters_0=4)
        b = 4
        spec_in, emb_pair, spec_out = _batch(rng, b=b)
        feats = jnp.concatenate([spec_in, spec_out], axis=0)  # (2b,H,W,2)
        embs = jnp.asarray(
            np.random.default_rng(3).integers(0, 1500, (2 * b, 16)).astype(np.int32))
        idx_in = jnp.arange(b)[None, :]
        idx_out = jnp.arange(b, 2 * b)[None, :]
        variables = train.init_model(model, (spec_in, emb_pair))
        opt = train.build_optimizer("sgd", 1e-2)
        cfg = LossConfig()
        key = jax.random.key(11)

        epoch = train.make_train_epoch(model, opt, cfg, accum_steps=2)
        st_e = train.TrainState.create(jax.tree.map(jnp.copy, variables), opt)
        st_e, em = epoch(st_e, feats, embs, idx_in, idx_out, key, 1e-2)

        # Replicate the epoch body's batch gather and key derivation.
        batch = (
            jnp.take(feats, idx_in[0], axis=0),
            jnp.stack([jnp.take(embs, idx_in[0], axis=0),
                       jnp.take(embs, idx_out[0], axis=0)], axis=1),
            jnp.take(feats, idx_out[0], axis=0),
        )
        _, sub = jax.random.split(key)
        step = train.make_train_step(model, opt, cfg, accum_steps=2)
        st_s = train.TrainState.create(jax.tree.map(jnp.copy, variables), opt)
        st_s, sm = step(st_s, batch, sub, 1e-2)

        self._tree_close(st_e.params, st_s.params)
        np.testing.assert_allclose(float(em["loss"]), float(sm["loss"]),
                                   rtol=1e-6)

    def test_trainer_accum_loss_decreases(self, rng):
        """End-to-end: Trainer(accum_steps=2) trains (fused path)."""
        from unet_rir_tpu.data.corpus import Corpus
        from unet_rir_tpu.data.pipeline import DataGenerator

        corpus = Corpus.synthetic(n_per_room=4, room=["SmallMeetingRoom"],
                                  max_order=2, seed=0)
        gen = DataGenerator(corpus, batch_size=2, partition="train")
        model = models.UNet(number_filters_0=4, batch_norm=False)
        cfg = train.TrainerConfig(n_epochs=3, learning_rate=1e-3,
                                  accum_steps=2, preempt_save=False)
        trainer = train.Trainer(model, LossConfig(), cfg)
        state = trainer.init_state(train.init_model(model, gen[0]))
        state, hist = trainer.fit(state, gen)
        losses = [r["loss"] for r in hist.rows]
        assert np.isfinite(losses[-1])
        assert losses[-1] < losses[0]
