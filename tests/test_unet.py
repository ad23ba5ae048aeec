"""U-Net model tests: shapes, determinism, gradient flow, 3D variant."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sequitr_tpu.models import unet


def small_cfg(**kw):
    base = dict(
        in_channels=1,
        num_classes=3,
        depth=3,
        base_features=4,
        compute_dtype=jnp.float32,
    )
    base.update(kw)
    return unet.UNetConfig(**base)


class TestUNet2D:
    def test_output_shape(self):
        cfg = small_cfg()
        params, state = unet.init(jax.random.PRNGKey(0), cfg)
        x = jnp.ones((2, 32, 32, 1))
        logits, _ = unet.apply(cfg, params, state, x)
        assert logits.shape == (2, 32, 32, 3)
        assert logits.dtype == jnp.float32

    def test_rejects_bad_spatial(self):
        cfg = small_cfg()
        params, state = unet.init(jax.random.PRNGKey(0), cfg)
        with pytest.raises(ValueError):
            unet.apply(cfg, params, state, jnp.ones((1, 30, 30, 1)))

    def test_deterministic(self):
        cfg = small_cfg()
        params, state = unet.init(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 1))
        a, _ = unet.apply(cfg, params, state, x)
        b, _ = unet.apply(cfg, params, state, x)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_jit_matches_eager(self):
        cfg = small_cfg()
        params, state = unet.init(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 1))
        eager, _ = unet.apply(cfg, params, state, x)
        jitted, _ = jax.jit(lambda p, s, xx: unet.apply(cfg, p, s, xx))(params, state, x)
        np.testing.assert_allclose(np.asarray(eager), np.asarray(jitted), atol=1e-5)

    def test_grad_flows_to_all_params(self):
        cfg = small_cfg(norm="none")
        params, state = unet.init(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 1))
        labels = jnp.zeros((1, 16, 16), jnp.int32)

        def loss_fn(p):
            logits, _ = unet.apply(cfg, p, state, x)
            from sequitr_tpu.ops import weighted_softmax_cross_entropy

            return weighted_softmax_cross_entropy(logits, labels)

        grads = jax.grad(loss_fn)(params)
        norms = [float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads)]
        assert all(np.isfinite(norms))
        # the vast majority of tensors must receive gradient
        assert np.mean([n > 0 for n in norms]) > 0.9

    def test_batchnorm_train_updates_state(self):
        cfg = small_cfg()
        params, state = unet.init(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 1)) * 5 + 3
        _, new_state = unet.apply(cfg, params, state, x, train=True)
        before = jax.tree.leaves(state)
        after = jax.tree.leaves(new_state)
        assert any(
            not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(before, after)
        )

    def test_infer_state_unchanged(self):
        cfg = small_cfg()
        params, state = unet.init(jax.random.PRNGKey(0), cfg)
        x = jnp.ones((1, 16, 16, 1))
        _, new_state = unet.apply(cfg, params, state, x, train=False)
        for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(new_state)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_resize_upsample_variant(self):
        cfg = small_cfg(upsample="resize")
        params, state = unet.init(jax.random.PRNGKey(0), cfg)
        logits, _ = unet.apply(cfg, params, state, jnp.ones((1, 16, 16, 1)))
        assert logits.shape == (1, 16, 16, 3)

    def test_bf16_compute_close_to_f32(self):
        cfg32 = small_cfg(norm="none")
        cfg16 = small_cfg(norm="none", compute_dtype=jnp.bfloat16)
        params, state = unet.init(jax.random.PRNGKey(0), cfg32)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 1))
        y32, _ = unet.apply(cfg32, params, state, x)
        y16, _ = unet.apply(cfg16, params, state, x)
        # bf16 matmuls with f32 accumulation stay close on a small net
        p32 = jax.nn.softmax(y32, axis=-1)
        p16 = jax.nn.softmax(y16, axis=-1)
        assert float(jnp.max(jnp.abs(p32 - p16))) < 0.05


class TestUNet3D:
    def test_output_shape(self):
        cfg = small_cfg(dims=3, depth=2, base_features=2)
        params, state = unet.init(jax.random.PRNGKey(0), cfg)
        x = jnp.ones((1, 8, 16, 16, 1))
        logits, _ = unet.apply(cfg, params, state, x)
        assert logits.shape == (1, 8, 16, 16, 3)

    def test_grad(self):
        cfg = small_cfg(dims=3, depth=2, base_features=2, norm="none")
        params, state = unet.init(jax.random.PRNGKey(0), cfg)
        x = jnp.ones((1, 4, 8, 8, 1))

        def loss_fn(p):
            logits, _ = unet.apply(cfg, p, state, x)
            return jnp.sum(logits**2)

        grads = jax.grad(loss_fn)(params)
        assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree.leaves(grads))


def test_param_count_positive():
    cfg = small_cfg()
    params, _ = unet.init(jax.random.PRNGKey(0), cfg)
    assert unet.param_count(params) > 1000


class TestSpaceToDepth:
    def test_roundtrip_rearrange(self):
        x = jnp.asarray(np.arange(2 * 8 * 8 * 3).reshape(2, 8, 8, 3).astype(np.float32))
        rt = unet._depth_to_space(unet._space_to_depth(x, 2), 2)
        np.testing.assert_array_equal(np.asarray(rt), np.asarray(x))

    def test_fast_variant_shapes_and_grad(self):
        cfg = small_cfg(space_to_depth=2, norm="none")
        params, state = unet.init(jax.random.PRNGKey(0), cfg)
        logits, _ = unet.apply(cfg, params, state, jnp.ones((1, 32, 32, 1)))
        assert logits.shape == (1, 32, 32, 3)

        def loss(p):
            out, _ = unet.apply(cfg, p, state, jnp.ones((1, 16, 16, 1)))
            return jnp.sum(out**2)

        g = jax.grad(loss)(params)
        assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))

    def test_min_input_multiple_accounts_for_s2d(self):
        cfg = small_cfg(space_to_depth=2)
        assert cfg.min_input_multiple == 2 * 2**2
        params, state = unet.init(jax.random.PRNGKey(0), cfg)
        with pytest.raises(ValueError):
            unet.apply(cfg, params, state, jnp.ones((1, 12, 12, 1)))

    def test_3d_rejects_s2d(self):
        with pytest.raises(ValueError):
            unet.init(
                jax.random.PRNGKey(0), small_cfg(dims=3, space_to_depth=2)
            )


class TestFoldGenerator:
    def test_folded_generator_matches_unfolded(self):
        """models.gan.fold_generator is numerically identical at inference."""
        from sequitr_tpu.models import gan as gan_lib

        cfg = gan_lib.GANConfig(
            gen_depth=2, gen_base_features=4, disc_layers=2,
            compute_dtype=jnp.float32,
        )
        params, state = gan_lib.init(jax.random.PRNGKey(3), cfg)
        # non-trivial BN moving stats so folding is actually exercised
        state = jax.tree.map(
            lambda a: a + 0.1 * np.random.default_rng(4).random(a.shape).astype(np.float32),
            state,
        )
        x = jnp.asarray(
            np.random.default_rng(5).normal(size=(2, 16, 16, 1)).astype(np.float32)
        )
        y_ref, _ = gan_lib.generator_apply(cfg, params, state, x)

        fcfg, fparams, fstate = gan_lib.fold_generator(cfg, params, state)
        assert fcfg.gen_norm == "none"
        y_fold, _ = gan_lib.generator_apply(fcfg, fparams, fstate, x)
        np.testing.assert_allclose(
            np.asarray(y_fold), np.asarray(y_ref), atol=1e-5
        )
        # idempotent on an already-folded triple
        assert gan_lib.fold_generator(fcfg, fparams, fstate)[0] is fcfg
