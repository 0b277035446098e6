"""Model-shape and persistence tests (SURVEY.md §4 implication (b)).

Every model maps (B,144,160,2)+(B,2,16)int -> (B,144,160,2); sigmoid heads
stay in [0,1]. Models are added to PARITY_CASES as they land.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unet_rir_tpu import models

B, H, W, C = 2, 144, 160, 2


def _dummy_batch(rng):
    spec = jnp.asarray(rng.uniform(0, 1, (B, H, W, C)).astype(np.float32))
    emb = jnp.asarray(rng.integers(0, 1500, (B, 2, 16)).astype(np.int32))
    return spec, emb


def _init_and_apply(model, spec, emb, training=False):
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        spec, emb, training=False,
    )
    if training:
        out, _ = model.apply(
            variables, spec, emb, training=True,
            rngs={"dropout": jax.random.key(2)}, mutable=["batch_stats"],
        )
    else:
        out = model.apply(variables, spec, emb, training=False)
    return out, variables


class TestUNet:
    def test_output_shape_and_range(self, rng):
        spec, emb = _dummy_batch(rng)
        out, _ = _init_and_apply(models.UNet(), spec, emb)
        assert out.shape == (B, H, W, C)
        assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0
        assert out.dtype == jnp.float32

    def test_training_mode_runs(self, rng):
        spec, emb = _dummy_batch(rng)
        out, _ = _init_and_apply(models.UNet(), spec, emb, training=True)
        assert out.shape == (B, H, W, C)

    def test_param_count_magnitude(self, rng):
        """Reference U-Net is ~10^7 params (SURVEY.md §2 row 25)."""
        spec, emb = _dummy_batch(rng)
        _, variables = _init_and_apply(models.UNet(), spec, emb)
        n = models.param_count(variables["params"])
        assert 5e6 < n < 5e7, n

    def test_bfloat16_compute(self, rng):
        spec, emb = _dummy_batch(rng)
        out, _ = _init_and_apply(models.UNet(dtype=jnp.bfloat16), spec, emb)
        assert out.dtype == jnp.float32  # head casts back
        assert out.shape == (B, H, W, C)

    def test_conditioning_changes_output(self, rng):
        spec, emb = _dummy_batch(rng)
        model = models.UNet()
        out1, variables = _init_and_apply(model, spec, emb)
        emb2 = emb.at[:, 1, :].add(7)
        out2 = model.apply(variables, spec, emb2, training=False)
        assert float(jnp.max(jnp.abs(out1 - out2))) > 1e-6

    def test_save_load_roundtrip(self, rng, tmp_path):
        spec, emb = _dummy_batch(rng)
        model = models.UNet()
        out1, variables = _init_and_apply(model, spec, emb)
        models.save_pretrained(str(tmp_path / "unet"), model, variables)
        model2, variables2 = models.load_pretrained(str(tmp_path / "unet"))
        out2 = model2.apply(variables2, spec, emb, training=False)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


class TestRegistry:
    def test_build_unet(self):
        m = models.build_model("unet")
        assert isinstance(m, models.UNet)
        assert m.kernels == 3 and m.number_filters_0 == 32

    def test_unknown(self):
        with pytest.raises(KeyError):
            models.build_model("nope")


@pytest.mark.parametrize("mode", [0, 1, 2, 3])
def test_unet_modes(rng, mode):
    spec, emb = _dummy_batch(rng)
    out, _ = _init_and_apply(models.UNet(mode=mode), spec, emb)
    assert out.shape == (B, H, W, C)
