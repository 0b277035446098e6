"""Multi-device SPMD tests on the 8-device virtual CPU mesh.

SURVEY.md §4 implication (d): DP loss/grads must equal the single-device
result; spatial (width-axis) sharding must compile and agree too.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unet_rir_tpu import models, parallel, train
from unet_rir_tpu.train.losses import LossConfig


B, H, W, C = 8, 144, 160, 2


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(500)
    spec_in = jnp.asarray(rng.uniform(0, 1, (B, H, W, C)).astype(np.float32))
    emb = jnp.asarray(rng.integers(0, 1500, (B, 2, 16)).astype(np.int32))
    spec_out = jnp.asarray(rng.uniform(0, 1, (B, H, W, C)).astype(np.float32))
    batch = (spec_in, emb, spec_out)
    model = models.UNet(number_filters_0=4, batch_norm=False)  # BN stats differ per-shard by design
    variables = train.init_model(model, batch)
    opt = train.build_optimizer("adam", 1e-3)
    # The train step donates its state argument, so hand out fresh copies.
    make_state = lambda: train.TrainState.create(
        jax.tree.map(jnp.copy, variables), opt
    )
    step = train.make_train_step(model, opt, LossConfig())
    return model, opt, make_state, step, batch


def test_mesh_shapes():
    mesh = parallel.make_mesh()
    assert mesh.devices.size == 8
    mesh2 = parallel.make_mesh(n_data=4, n_spatial=2)
    assert mesh2.shape == {"data": 4, "spatial": 2}


def test_dp_matches_single_device(setup):
    model, opt, make_state, step, batch = setup
    # Single device result
    s1, m1 = step(make_state(), batch, jax.random.key(0), 1e-3)

    # Data-parallel over 8 devices
    mesh = parallel.make_mesh(n_data=8, n_spatial=1)
    state_dp = parallel.replicate_state(make_state(), mesh)
    batch_dp = parallel.shard_batch(batch, mesh)
    s2, m2 = step(state_dp, batch_dp, jax.random.key(0), 1e-3)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    p1 = jax.tree_util.tree_leaves(s1.params)[0]
    p2 = jax.tree_util.tree_leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-4, atol=1e-6)


def test_spatial_sharding_compiles_and_matches(setup):
    model, opt, make_state, step, batch = setup
    s1, m1 = step(make_state(), batch, jax.random.key(0), 1e-3)

    mesh = parallel.make_mesh(n_data=4, n_spatial=2)
    state_sp = parallel.replicate_state(make_state(), mesh)
    batch_sp = parallel.shard_batch(batch, mesh, spatial=True)
    s2, m2 = step(state_sp, batch_sp, jax.random.key(0), 1e-3)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)


def test_eval_step_dp(setup):
    model, opt, make_state, step, batch = setup
    eval_step = train.make_eval_step(model, LossConfig())
    state = make_state()
    m1 = eval_step(state, batch)
    mesh = parallel.make_mesh()
    m2 = eval_step(parallel.replicate_state(make_state(), mesh), parallel.shard_batch(batch, mesh))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)


def test_fused_epoch_dp_matches_single_device(setup):
    """Fused lax.scan epoch sharded over the mesh == single-device result."""
    import jax.numpy as jnp
    from unet_rir_tpu.data.corpus import Corpus
    from unet_rir_tpu.data.pipeline import DataGenerator
    from unet_rir_tpu.train.losses import LossConfig

    corpus = Corpus.synthetic(n_per_room=8, max_order=2)
    gen = DataGenerator(corpus, batch_size=8, partition="train", shuffle=False)
    idx_in, idx_out = gen.epoch_indices()

    model = models.UNet(number_filters_0=4, batch_norm=False)
    sample = gen[0]
    variables = train.init_model(model, sample)
    opt = train.build_optimizer("adam", 1e-3)
    epoch_fn = train.make_train_epoch(model, opt, LossConfig())

    def run(shard):
        state = train.TrainState.create(jax.tree.map(jnp.copy, variables), opt)
        f, e = corpus.features, corpus.embeddings
        ii, io = jnp.asarray(idx_in), jnp.asarray(idx_out)
        if shard:
            mesh = parallel.make_mesh(n_data=8, n_spatial=1)
            state = parallel.replicate_state(state, mesh)
            f, e, ii, io = parallel.shard_epoch_inputs(f, e, ii, io, mesh)
        s2, metrics = epoch_fn(state, f, e, ii, io, jax.random.key(0), 1e-3)
        return float(metrics["loss"]), s2

    loss1, s1 = run(False)
    loss8, s8 = run(True)
    np.testing.assert_allclose(loss1, loss8, rtol=1e-5)
    p1 = jax.tree_util.tree_leaves(s1.params)[0]
    p8 = jax.tree_util.tree_leaves(s8.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p8), rtol=1e-4, atol=1e-6)
