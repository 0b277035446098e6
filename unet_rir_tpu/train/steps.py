"""Functional train/eval step factories (jit-compiled, donation-friendly).

One step factory parameterized by the loss family replaces the reference's
three near-identical trainer step methods (trainer.py:133-144,
amp_phase_trainer.py:130-141, vae_trainer.py:136-151) and the distributed
variants (main_training.py:253-332). Parallelism is orthogonal: the same
step runs single-chip or SPMD over a mesh — callers attach shardings via
`unet_rir_tpu.parallel` (the TPU-native replacement for
tf.distribute.MirroredStrategy; gradients all-reduce over ICI by XLA SPMD,
not explicit NCCL calls).
"""

from __future__ import annotations

from typing import Any, Callable

import flax
import jax
import jax.numpy as jnp
import optax

from unet_rir_tpu.train.losses import LossConfig, compute_loss


@flax.struct.dataclass
class TrainState:
    """Carried training state: params + BN stats + optimizer state + step."""

    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray

    @classmethod
    def create(cls, variables: dict, optimizer: optax.GradientTransformation):
        params = variables["params"]
        return cls(
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=optimizer.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    def variables(self) -> dict:
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v


def _apply_model(model, variables, spec_in, emb, *, training, rng, mutable):
    """Run the model; normalize its output to (pred, aux, mutated_vars)."""
    kwargs = dict(training=training)
    if rng is not None:
        kwargs["rngs"] = {"dropout": rng, "sampling": jax.random.fold_in(rng, 1)}
    if mutable:
        out, mut = model.apply(variables, spec_in, emb, mutable=["batch_stats"], **kwargs)
    else:
        out, mut = model.apply(variables, spec_in, emb, **kwargs), {}
    if isinstance(out, tuple):
        pred, aux = out
    else:
        pred, aux = out, {}
    return pred, aux, mut


def _make_grad_apply(grad_fn, accum_steps: int):
    """Wrap a value_and_grad fn into (params, bn, batch, rng) ->
    (grads, metrics, new_bn), optionally microbatching the batch axis.

    accum_steps > 1 = gradient accumulation (a TPU-native addition with no
    reference counterpart): the batch is reshaped into `accum_steps`
    microbatches and a lax.scan accumulates the gradient sum on device, so
    peak activation memory is one microbatch while the optimizer sees the
    mean gradient of the full batch. Each microbatch folds its index into
    the step rng (independent dropout masks); BatchNorm statistics chain
    through the microbatches sequentially (momentum applied once per
    microbatch — the standard microbatching semantics). Composes with remat
    and with DP/spatial sharding (the microbatch axis is a scan axis; the
    per-microbatch batch axis keeps its GSPMD sharding).
    """
    if accum_steps <= 1:
        def apply_once(params, batch_stats, batch, rng):
            (_, (metrics, new_bn)), grads = grad_fn(params, batch_stats, batch, rng)
            return grads, metrics, new_bn

        return apply_once

    def apply_accum(params, batch_stats, batch, rng):
        b = batch[0].shape[0]
        if b % accum_steps:
            raise ValueError(
                f"batch size {b} is not divisible by accum_steps {accum_steps}"
            )
        micro = jax.tree.map(
            lambda x: x.reshape((accum_steps, b // accum_steps) + x.shape[1:]),
            tuple(batch),
        )
        grad_zero = jax.tree.map(jnp.zeros_like, params)

        def body(carry, xs):
            bn, grad_sum = carry
            mb, m = xs
            sub = jax.random.fold_in(rng, m)
            (_, (metrics, new_bn)), grads = grad_fn(params, bn, mb, sub)
            return (new_bn, jax.tree.map(jnp.add, grad_sum, grads)), metrics

        (new_bn, grad_sum), metrics = jax.lax.scan(
            body, (batch_stats, grad_zero), (micro, jnp.arange(accum_steps))
        )
        grads = jax.tree.map(lambda g: g / accum_steps, grad_sum)
        return grads, jax.tree.map(jnp.mean, metrics), new_bn

    return apply_accum


def make_train_step(
    model,
    optimizer: optax.GradientTransformation,
    loss_cfg: LossConfig,
    l2_patterns: tuple[str, ...] | None = None,
    remat: bool = False,
    accum_steps: int = 1,
) -> Callable:
    """Build a jitted (state, batch, rng, lr) -> (state, metrics) step.

    `batch` = (spec_in, emb, spec_out) — the generator tuple order of the
    reference's canonical path (datageneratorv2.py:101-102).
    remat=True rematerializes the forward in the backward pass
    (jax.checkpoint) — trades ~1 extra forward for O(1) activation memory,
    enabling much larger per-chip batches.
    accum_steps>1 microbatches the step via gradient accumulation (see
    _make_grad_apply) — large *effective* batches at one microbatch's
    activation footprint.
    """
    patterns = model.L2_PATTERNS if l2_patterns is None else l2_patterns

    def forward(params, batch_stats, spec_in, emb, rng):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        return _apply_model(
            model, variables, spec_in, emb, training=True, rng=rng,
            mutable=bool(batch_stats),
        )

    if remat:
        forward = jax.checkpoint(forward, static_argnums=())

    def loss_fn(params, batch_stats, batch, rng):
        spec_in, emb, spec_out = batch
        pred, aux, mut = forward(params, batch_stats, spec_in, emb, rng)
        loss, metrics = compute_loss(
            loss_cfg, spec_in, spec_out, pred, aux, params, patterns
        )
        return loss, (metrics, mut.get("batch_stats", batch_stats))

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    grad_apply = _make_grad_apply(grad_fn, accum_steps)

    def train_step(state: TrainState, batch, rng, lr):
        grads, metrics, new_bn = grad_apply(
            state.params, state.batch_stats, batch, rng
        )
        opt_state = state.opt_state
        if hasattr(opt_state, "hyperparams"):
            opt_state.hyperparams["learning_rate"] = jnp.asarray(
                lr, opt_state.hyperparams["learning_rate"].dtype
            )
        updates, opt_state = optimizer.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params, batch_stats=new_bn, opt_state=opt_state,
            step=state.step + 1,
        )
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,))


def make_train_epoch(
    model,
    optimizer: optax.GradientTransformation,
    loss_cfg: LossConfig,
    l2_patterns: tuple[str, ...] | None = None,
    remat: bool = False,
    accum_steps: int = 1,
) -> Callable:
    """Build a jitted FULL-EPOCH step: one dispatch per epoch.

    (state, features, embeddings, idx_in, idx_out, rng, lr) ->
    (state, mean metrics). `features` (N,H,W,2) / `embeddings` (N,16) are
    the HBM-resident corpus; idx_* are (n_steps, batch) gather indices.
    Batches are gathered on device inside a lax.scan over steps — the
    TPU-native answer to the reference's Python-per-batch generator
    (SURVEY.md §7 hard part 7): the host is out of the loop entirely.
    accum_steps>1 adds an inner gradient-accumulation scan per step (see
    _make_grad_apply).
    """
    patterns = model.L2_PATTERNS if l2_patterns is None else l2_patterns

    def fwd(params, batch_stats, spec_in, emb, rng):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        return _apply_model(
            model, variables, spec_in, emb, training=True, rng=rng,
            mutable=bool(batch_stats),
        )

    if remat:
        fwd = jax.checkpoint(fwd)

    def loss_fn(params, batch_stats, batch, rng):
        spec_in, emb, spec_out = batch
        pred, aux, mut = fwd(params, batch_stats, spec_in, emb, rng)
        loss, metrics = compute_loss(
            loss_cfg, spec_in, spec_out, pred, aux, params, patterns
        )
        return loss, (metrics, mut.get("batch_stats", batch_stats))

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    grad_apply = _make_grad_apply(grad_fn, accum_steps)

    def epoch(state: TrainState, features, embeddings, idx_in, idx_out, rng, lr):
        def body(carry, idx):
            st, key = carry
            i_in, i_out = idx
            batch = (
                jnp.take(features, i_in, axis=0),
                jnp.stack(
                    [jnp.take(embeddings, i_in, axis=0),
                     jnp.take(embeddings, i_out, axis=0)], axis=1),
                jnp.take(features, i_out, axis=0),
            )
            key, sub = jax.random.split(key)
            grads, metrics, new_bn = grad_apply(
                st.params, st.batch_stats, batch, sub
            )
            opt_state = st.opt_state
            if hasattr(opt_state, "hyperparams"):
                opt_state.hyperparams["learning_rate"] = jnp.asarray(
                    lr, opt_state.hyperparams["learning_rate"].dtype
                )
            updates, opt_state = optimizer.update(grads, opt_state, st.params)
            params = optax.apply_updates(st.params, updates)
            st = TrainState(params=params, batch_stats=new_bn,
                            opt_state=opt_state, step=st.step + 1)
            return (st, key), metrics

        (state, _), metrics = jax.lax.scan(body, (state, rng), (idx_in, idx_out))
        return state, jax.tree.map(jnp.mean, metrics)

    return jax.jit(epoch, donate_argnums=(0,))


def make_eval_epoch(model, loss_cfg: LossConfig) -> Callable:
    """Jitted full-epoch validation: one dispatch, mean metrics."""

    def epoch(state: TrainState, features, embeddings, idx_in, idx_out):
        variables = state.variables()

        def body(_, idx):
            i_in, i_out = idx
            spec_in = jnp.take(features, i_in, axis=0)
            emb = jnp.stack(
                [jnp.take(embeddings, i_in, axis=0),
                 jnp.take(embeddings, i_out, axis=0)], axis=1)
            spec_out = jnp.take(features, i_out, axis=0)
            pred, aux, _ = _apply_model(
                model, variables, spec_in, emb, training=False, rng=None,
                mutable=False,
            )
            _, metrics = compute_loss(loss_cfg, spec_in, spec_out, pred, aux)
            return None, metrics

        _, metrics = jax.lax.scan(body, None, (idx_in, idx_out))
        return jax.tree.map(jnp.mean, metrics)

    return jax.jit(epoch)


def make_eval_step(model, loss_cfg: LossConfig) -> Callable:
    """Build a jitted (state, batch) -> metrics validation step.

    Mirrors the reference test_step (main_training.py:293-320). NOTE the
    reference calls the model with training=True in its test step; we use
    inference mode (running BN stats, no dropout) — a deliberate divergence
    recorded per SURVEY.md §7 item 8.
    """

    def eval_step(state: TrainState, batch):
        spec_in, emb, spec_out = batch
        pred, aux, _ = _apply_model(
            model, state.variables(), spec_in, emb, training=False, rng=None,
            mutable=False,
        )
        _, metrics = compute_loss(loss_cfg, spec_in, spec_out, pred, aux)
        return metrics

    return jax.jit(eval_step)


def make_forward(model) -> Callable:
    """Jitted inference forward: (variables, spec_in, emb) -> prediction."""

    def forward(variables, spec_in, emb):
        pred, _, _ = _apply_model(
            model, variables, spec_in, emb, training=False, rng=None, mutable=False
        )
        return pred

    return jax.jit(forward)


def init_model(model, sample_batch, seed: int = 0) -> dict:
    """Initialize model variables from a sample (spec_in, emb, _) batch."""
    spec_in, emb = sample_batch[0], sample_batch[1]
    return model.init(
        {"params": jax.random.key(seed), "dropout": jax.random.key(seed + 1),
         "sampling": jax.random.key(seed + 2)},
        spec_in, emb, training=False,
    )


__all__ = ["TrainState", "make_train_step", "make_train_epoch", "make_eval_epoch", "make_eval_step", "make_forward", "init_model"]
