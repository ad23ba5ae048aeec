"""Integration tests: fused tiled inference, training steps, GAN, DP sharding."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sequitr_tpu.models import gan as gan_lib
from sequitr_tpu.models import unet
from sequitr_tpu.pipeline import infer as infer_lib
from sequitr_tpu.pipeline import train as train_lib
from sequitr_tpu import parallel


def small_cfg(**kw):
    base = dict(
        in_channels=1, num_classes=3, depth=3, base_features=4,
        compute_dtype=jnp.float32,
    )
    base.update(kw)
    return unet.UNetConfig(**base)


class TestTiledInference:
    def test_frame_inferrer_shapes(self):
        cfg = small_cfg()
        params, state = unet.init(jax.random.PRNGKey(0), cfg)
        tc = infer_lib.TileConfig(patch=(32, 32), overlap=(8, 8))
        fn = infer_lib.make_frame_inferrer(cfg, tc, (64, 64))
        probs, labels = fn(params, state, jnp.ones((64, 64)))
        assert probs.shape == (64, 64, 3)
        assert labels.shape == (64, 64)
        np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-4)

    def test_tiled_matches_whole_frame(self):
        """On a frame the net can swallow whole, tiling must not change the
        answer in tile interiors (SAME-padding halo effects only at seams)."""
        cfg = small_cfg(norm="none")
        params, state = unet.init(jax.random.PRNGKey(0), cfg)
        frame = jax.random.normal(jax.random.PRNGKey(1), (64, 64))

        tc = infer_lib.TileConfig(
            patch=(64, 64), overlap=(0, 0), normalize="none"
        )  # single tile == whole frame
        fn = infer_lib.make_frame_inferrer(cfg, tc, (64, 64))
        probs_tiled, _ = fn(params, state, frame)

        logits, _ = unet.apply(cfg, params, state, frame[None, ..., None])
        probs_whole = jax.nn.softmax(logits[0], axis=-1)
        np.testing.assert_allclose(
            np.asarray(probs_tiled), np.asarray(probs_whole), atol=1e-5
        )

    def test_polyphase_serving_matches_standard(self):
        """TileConfig(polyphase=True) must reproduce the standard fused
        serve (the SAME weights, rearranged — models.polyphase): probs
        close to reassociation noise, tiled and whole-frame."""
        cfg = small_cfg(norm="batch")
        params, state = unet.init(jax.random.PRNGKey(0), cfg)
        frame = jax.random.normal(jax.random.PRNGKey(1), (64, 64)) * 50 + 200

        for patch, overlap in (((64, 64), (0, 0)), ((32, 32), (8, 8))):
            tc = infer_lib.TileConfig(patch=patch, overlap=overlap)
            tcp = infer_lib.TileConfig(
                patch=patch, overlap=overlap, polyphase=True
            )
            p0, l0 = infer_lib.make_frame_inferrer(cfg, tc, (64, 64))(
                params, state, frame
            )
            p1, l1 = infer_lib.make_frame_inferrer(cfg, tcp, (64, 64))(
                params, state, frame
            )
            np.testing.assert_allclose(
                np.asarray(p0), np.asarray(p1), atol=1e-4
            )
            agree = np.mean(np.asarray(l0) == np.asarray(l1))
            assert agree >= 0.999, agree

    def test_labels_only_graph_matches_dual(self):
        """emit_probs=False returns (None, labels) with labels
        BIT-IDENTICAL to the dual graph — single-tile serves skip the
        softmax (argmax is invariant under the per-pixel positive
        stitch rescale), tiled serves just drop the probs output."""
        cfg = small_cfg(norm="batch")
        params, state = unet.init(jax.random.PRNGKey(0), cfg)
        frame = jax.random.normal(jax.random.PRNGKey(2), (64, 64)) * 40 + 150
        for patch, overlap, poly in (
            ((64, 64), (0, 0), False),
            ((32, 32), (8, 8), False),
            ((64, 64), (0, 0), True),
        ):
            tc = infer_lib.TileConfig(
                patch=patch, overlap=overlap, polyphase=poly
            )
            tcl = infer_lib.TileConfig(
                patch=patch, overlap=overlap, polyphase=poly,
                emit_probs=False,
            )
            _, l0 = infer_lib.make_frame_inferrer(cfg, tc, (64, 64))(
                params, state, frame
            )
            p1, l1 = infer_lib.make_frame_inferrer(cfg, tcl, (64, 64))(
                params, state, frame
            )
            assert p1 is None
            np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))

    def test_polyphase_family_serves_match(self):
        """Every U-Net-family serving maker honors tc.polyphase: GAN
        enhancement, N2V denoise, flows and stars outputs must match
        their standard serves to reassociation noise."""
        from sequitr_tpu.models import gan as gan_lib

        rng = jax.random.PRNGKey(3)
        frame = jax.random.normal(rng, (32, 32)) * 60 + 250

        # --- GAN enhancement
        gcfg = gan_lib.GANConfig(
            gen_depth=2, gen_base_features=4, disc_layers=1,
            disc_base_features=4, compute_dtype=jnp.float32,
        )
        gp, gs = gan_lib.init(jax.random.PRNGKey(4), gcfg)
        gcfg, gp, gs = gan_lib.fold_generator(gcfg, gp, gs)
        tc = infer_lib.TileConfig(patch=(32, 32), overlap=(0, 0))
        tcp = dataclasses.replace(tc, polyphase=True)
        e0 = infer_lib.make_gan_enhancer(gcfg, tc, (32, 32))(gp, gs, frame)
        e1 = infer_lib.make_gan_enhancer(gcfg, tcp, (32, 32))(gp, gs, frame)
        np.testing.assert_allclose(
            np.asarray(e0), np.asarray(e1), atol=1e-4
        )

        # --- N2V denoiser (regression head)
        dcfg = small_cfg(num_classes=1, norm="batch")
        dp_, ds = unet.init(jax.random.PRNGKey(5), dcfg)
        d0 = infer_lib.make_denoiser(dcfg, tc, (32, 32))(dp_, ds, frame)
        d1 = infer_lib.make_denoiser(dcfg, tcp, (32, 32))(dp_, ds, frame)
        np.testing.assert_allclose(
            np.asarray(d0), np.asarray(d1), atol=1e-4
        )

        # --- flows (prob + 2 flow channels, sink integration on device)
        fcfg = small_cfg(num_classes=3, norm="none")
        fp, fs = unet.init(jax.random.PRNGKey(6), fcfg)
        f0 = infer_lib.make_flows_segmenter(fcfg, tc, (32, 32))(fp, fs, frame)
        f1 = infer_lib.make_flows_segmenter(fcfg, tcp, (32, 32))(fp, fs, frame)
        np.testing.assert_allclose(
            np.asarray(f0[1]), np.asarray(f1[1]), atol=1e-4
        )

        # --- stars (1 + n_rays regression head)
        scfg = small_cfg(num_classes=9, norm="none")
        sp, ss = unet.init(jax.random.PRNGKey(7), scfg)
        s0 = infer_lib.make_stars_predictor(scfg, tc, (32, 32))(sp, ss, frame)
        s1 = infer_lib.make_stars_predictor(scfg, tcp, (32, 32))(sp, ss, frame)
        np.testing.assert_allclose(
            np.asarray(s0[0]), np.asarray(s1[0]), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(s0[1]), np.asarray(s1[1]), atol=1e-3
        )

    def test_polyphase_rejects_uncovered_configs(self):
        import pytest

        params_tc = dict(patch=(16, 16), overlap=(4, 4), polyphase=True)
        # 3D with ODD H/W (3D itself is covered since the (1,2,2) factor)
        cfg3 = small_cfg(dims=3, depth=1)
        with pytest.raises(ValueError, match="polyphase"):
            infer_lib.make_frame_inferrer(
                cfg3,
                infer_lib.TileConfig(
                    patch=(8, 15, 15), overlap=(2, 4, 4), polyphase=True
                ),
                (8, 15, 15),
            )
        # model-level space-to-depth preset
        cfgs2d = small_cfg(space_to_depth=2)
        with pytest.raises(ValueError, match="polyphase"):
            infer_lib.make_frame_inferrer(
                cfgs2d, infer_lib.TileConfig(**params_tc), (64, 64)
            )
        # odd patch
        with pytest.raises(ValueError, match="polyphase"):
            infer_lib.make_frame_inferrer(
                small_cfg(depth=1),
                infer_lib.TileConfig(
                    patch=(15, 15), overlap=(0, 0), polyphase=True
                ),
                (15, 15),
            )

    def test_tta_equals_mean_of_transformed_runs(self):
        """tta=4 probs must equal the mean of the tta=1 inferrer run on
        each flipped frame with the maps flipped back — the definition,
        checked exactly (f32, same graph pieces)."""
        cfg = small_cfg(norm="none")
        params, state = unet.init(jax.random.PRNGKey(0), cfg)
        frame = jax.random.normal(jax.random.PRNGKey(3), (48, 40))
        tc1 = infer_lib.TileConfig(
            patch=(32, 32), overlap=(8, 8), normalize="none"
        )
        tc4 = infer_lib.TileConfig(
            patch=(32, 32), overlap=(8, 8), normalize="none", tta=4
        )
        base = infer_lib.make_frame_inferrer(cfg, tc1, (48, 40))
        fn4 = infer_lib.make_frame_inferrer(cfg, tc4, (48, 40))
        probs4, labels4 = fn4(params, state, frame)

        acc = np.zeros((48, 40, 3), np.float64)
        for flips in [(), (0,), (1,), (0, 1)]:
            xi = frame
            for ax in flips:
                xi = jnp.flip(xi, axis=ax)
            pi, _ = base(params, state, xi)
            pi = np.asarray(pi)
            for ax in flips:
                pi = np.flip(pi, axis=ax)
            acc += pi
        np.testing.assert_allclose(
            np.asarray(probs4), acc / 4.0, atol=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(labels4), (acc / 4.0).argmax(-1)
        )

    def test_tta8_transpose_square_only(self):
        import pytest

        cfg = small_cfg(norm="none")
        params, state = unet.init(jax.random.PRNGKey(0), cfg)
        tc8 = infer_lib.TileConfig(
            patch=(32, 32), overlap=(8, 8), normalize="none", tta=8
        )
        with pytest.raises(ValueError, match="square"):
            infer_lib.make_frame_inferrer(cfg, tc8, (48, 40))
        fn8 = infer_lib.make_frame_inferrer(cfg, tc8, (48, 48))
        frame = jax.random.normal(jax.random.PRNGKey(4), (48, 48))
        probs8, _ = fn8(params, state, frame)
        assert probs8.shape == (48, 48, 3)
        np.testing.assert_allclose(np.asarray(probs8.sum(-1)), 1.0, atol=1e-4)
        with pytest.raises(ValueError, match="tta"):
            infer_lib.TileConfig(tta=3)

    def test_tta_gan_enhancer(self):
        """GAN TTA: enhanced map equals the mean of inverse-transformed
        enhanced variants (tta=2 exact check)."""
        gcfg = gan_lib.GANConfig(
            in_channels=1, out_channels=1, gen_base_features=4, gen_depth=2,
            compute_dtype=jnp.float32, gen_norm="none",
        )
        params, state = gan_lib.init(jax.random.PRNGKey(0), gcfg)
        frame = jax.random.normal(jax.random.PRNGKey(5), (32, 32))
        tc1 = infer_lib.TileConfig(
            patch=(32, 32), overlap=(0, 0), normalize="none"
        )
        tc2 = infer_lib.TileConfig(
            patch=(32, 32), overlap=(0, 0), normalize="none", tta=2
        )
        e1 = infer_lib.make_gan_enhancer(gcfg, tc1, (32, 32))
        e2 = infer_lib.make_gan_enhancer(gcfg, tc2, (32, 32))
        out1 = np.asarray(e1(params, state, frame))
        out1f = np.flip(
            np.asarray(e1(params, state, jnp.flip(frame, axis=0))), axis=0
        )
        out2 = np.asarray(e2(params, state, frame))
        np.testing.assert_allclose(out2, (out1 + out1f) / 2.0, atol=1e-5)

    def test_sub_patch_frame_autopad(self):
        """Frames smaller than the patch are mirror-padded and cropped back:
        output keeps the frame shape and equals inference on an explicitly
        symmetric-padded frame."""
        cfg = small_cfg(norm="none")
        params, state = unet.init(jax.random.PRNGKey(0), cfg)
        frame = jax.random.normal(jax.random.PRNGKey(2), (20, 28))

        tc = infer_lib.TileConfig(patch=(32, 32), overlap=(8, 8), normalize="none")
        fn = infer_lib.make_frame_inferrer(cfg, tc, (20, 28))
        probs, labels = fn(params, state, frame)
        assert probs.shape == (20, 28, 3) and labels.shape == (20, 28)

        padded = jnp.pad(frame, ((0, 12), (0, 4)), mode="symmetric")
        ref_fn = infer_lib.make_frame_inferrer(cfg, tc, (32, 32))
        ref_probs, _ = ref_fn(params, state, padded)
        np.testing.assert_allclose(
            np.asarray(probs), np.asarray(ref_probs[:20, :28]), atol=1e-5
        )

    def test_patch_batching_equivalent(self):
        cfg = small_cfg(norm="none")
        params, state = unet.init(jax.random.PRNGKey(0), cfg)
        frame = jax.random.normal(jax.random.PRNGKey(2), (64, 64))
        tc_all = infer_lib.TileConfig(patch=(32, 32), overlap=(8, 8), normalize="none")
        tc_chunk = infer_lib.TileConfig(
            patch=(32, 32), overlap=(8, 8), normalize="none", patch_batch=2
        )
        p_all, _ = infer_lib.make_frame_inferrer(cfg, tc_all, (64, 64))(
            params, state, frame
        )
        p_chunk, _ = infer_lib.make_frame_inferrer(cfg, tc_chunk, (64, 64))(
            params, state, frame
        )
        np.testing.assert_allclose(np.asarray(p_all), np.asarray(p_chunk), atol=1e-5)

    def test_read_ahead_producer_stops_when_consumer_abandons(self):
        """An abandoned generator must stop its reader thread instead of
        leaking it (one per failed streaming job in a long server)."""
        import time as time_mod

        pulled = {"n": 0}

        def slow_source():
            for i in range(1000):
                pulled["n"] += 1
                yield i

        it = infer_lib._iter_read_ahead(slow_source(), depth=2)
        assert next(it) == 0
        it.close()  # consumer abandons (exception path in a serving loop)
        time_mod.sleep(0.3)
        n_after = pulled["n"]
        time_mod.sleep(0.3)
        assert pulled["n"] == n_after  # producer stopped pulling
        assert pulled["n"] < 20  # and never ran far ahead

    def test_read_ahead_iterator_order_and_errors(self):
        # ordering preserved through the reader thread
        out = list(infer_lib._iter_read_ahead(iter(range(20)), depth=3))
        assert out == list(range(20))

        # producer exceptions surface at the consumer
        def boom():
            yield 1
            raise IOError("disk gone")

        import pytest

        it = infer_lib._iter_read_ahead(boom(), depth=2)
        assert next(it) == 1
        with pytest.raises(IOError, match="disk gone"):
            list(it)

    def test_patch_batch_zero_rejected(self):
        # 0 is a plausible "disable chunking" spelling — reject it up front
        # instead of silently substituting the auto default (ADVICE r2)
        import pytest

        with pytest.raises(ValueError, match="patch_batch"):
            infer_lib.TileConfig(patch=(32, 32), patch_batch=0)
        with pytest.raises(ValueError, match="patch_batch"):
            infer_lib.TileConfig(patch=(32, 32), patch_batch=-1)

    def test_infer_stack_streaming(self):
        cfg = small_cfg()
        params, state = unet.init(jax.random.PRNGKey(0), cfg)
        tc = infer_lib.TileConfig(patch=(32, 32), overlap=(8, 8))
        fn = infer_lib.make_frame_inferrer(cfg, tc, (32, 32))
        frames = [np.random.default_rng(i).normal(size=(32, 32)) for i in range(5)]
        results = list(infer_lib.infer_stack(fn, params, state, frames))
        assert len(results) == 5
        for r in results:
            assert r.labels.shape == (32, 32)


class TestUNetTraining:
    def _batch(self, n=2, s=16):
        rng = np.random.default_rng(0)
        return {
            "image": jnp.asarray(rng.normal(size=(n, s, s, 1)).astype(np.float32)),
            "labels": jnp.asarray(rng.integers(0, 3, (n, s, s)).astype(np.int32)),
            "weights": jnp.ones((n, s, s), jnp.float32),
        }

    def test_polyphase_train_step_matches_standard(self):
        """TrainConfig(polyphase=True): the phase-domain training step
        must track the production step — logits/BN exact by
        construction (models.polyphase.apply_train; first-tie pool
        vjp), so multi-step loss trajectories and resulting params
        agree to float-reassociation noise. Runs with augment ON (the
        augmentation happens at full resolution before the forward, so
        it is shared bit-for-bit under the same key)."""
        from sequitr_tpu.models import polyphase
        from sequitr_tpu.ops import losses as losses_lib

        cfg = small_cfg(depth=3, norm="batch")
        params, st = unet.init(jax.random.PRNGKey(0), cfg)
        batch = self._batch(s=16)
        tc = train_lib.TrainConfig(augment=True)
        imgs, labs, w = train_lib._augment_batch(
            jax.random.PRNGKey(100), batch["image"], batch["labels"],
            batch["weights"], tc, dims=2,
        )

        def loss_std(p):
            lo, ms = unet.apply(cfg, p, st, imgs, train=True)
            return losses_lib.weighted_softmax_cross_entropy(lo, labs, w), ms

        def loss_pp(p):
            lo, ms = polyphase.apply_train(cfg, p, st, imgs, train=True)
            return losses_lib.weighted_softmax_cross_entropy(lo, labs, w), ms

        (l0, ms0), g0 = jax.value_and_grad(loss_std, has_aux=True)(params)
        (l1, ms1), g1 = jax.value_and_grad(loss_pp, has_aux=True)(params)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
        # BN state (running stats) identical: the phase-group reduction
        # IS the full-res per-channel reduction
        for a, b in zip(jax.tree.leaves(ms0), jax.tree.leaves(ms1)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5
            )
        # gradients identical at the global gradient scale. Conv biases
        # under BN have mathematically-zero gradients (BN subtracts the
        # mean), so their leaves hold ~1e-8 reassociation noise in both
        # versions — the global normalization keeps the bar meaningful
        # without special-casing them.
        gscale = max(
            float(np.max(np.abs(np.asarray(leaf))))
            for leaf in jax.tree.leaves(g0)
        )
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            diff = float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
            assert diff / gscale < 1e-4, diff

    def test_polyphase_train_rejects_uncovered_models(self):
        # 3D training is COVERED since the (1,2,2) extension; the gates
        # now reject depth-1 and resize-upsample models instead
        import pytest

        for cfg in (
            small_cfg(depth=1),
            small_cfg(depth=2, upsample="resize"),
        ):
            tc = train_lib.TrainConfig(polyphase=True, augment=False)
            state = train_lib.create_unet_state(jax.random.PRNGKey(0), cfg, tc)
            step = train_lib.make_unet_train_step(cfg, tc, jit=False)
            rng = np.random.default_rng(0)
            batch = {
                "image": jnp.asarray(
                    rng.normal(size=(1, 16, 16, 1)).astype(np.float32)
                ),
                "labels": jnp.asarray(
                    rng.integers(0, 3, (1, 16, 16)).astype(np.int32)
                ),
            }
            with pytest.raises(ValueError, match="polyphase"):
                step(state, batch, jax.random.PRNGKey(1))

    def test_loss_decreases(self):
        cfg = small_cfg(depth=2)
        tc = train_lib.TrainConfig(learning_rate=1e-2, augment=False)
        state = train_lib.create_unet_state(jax.random.PRNGKey(0), cfg, tc)
        step = train_lib.make_unet_train_step(cfg, tc)
        batch = self._batch()
        key = jax.random.PRNGKey(1)
        _, m0 = step(state, batch, key)
        state = train_lib.create_unet_state(jax.random.PRNGKey(0), cfg, tc)
        losses = []
        for i in range(20):
            state, m = step(state, batch, jax.random.fold_in(key, i))
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]
        assert int(state.step) == 20

    def test_remat_step_matches_plain_step_exactly(self):
        """remat=True recomputes the forward in the backward pass — same
        math, same op order, so params/metrics match the plain step to
        float tolerance (memory is the only difference)."""
        cfg = small_cfg(depth=3)
        batch = self._batch(n=2, s=32)
        key = jax.random.PRNGKey(3)
        results = []
        for remat in (False, True):
            tc = train_lib.TrainConfig(
                learning_rate=1e-3, augment=False, remat=remat
            )
            state = train_lib.create_unet_state(jax.random.PRNGKey(0), cfg, tc)
            step = train_lib.make_unet_train_step(cfg, tc, jit=False)
            for i in range(3):
                state, m = step(state, batch, jax.random.fold_in(key, i))
            results.append((state, m))
        (s0, m0), (s1, m1) = results
        assert np.isclose(float(m0["loss"]), float(m1["loss"]), rtol=1e-6)
        assert np.isclose(
            float(m0["grad_norm"]), float(m1["grad_norm"]), rtol=1e-5
        )
        for a, b in zip(jax.tree.leaves(s0.params), jax.tree.leaves(s1.params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
            )

    def test_grad_accum_applies_every_k(self):
        """grad_accum=2: updates accumulate across micro-steps and apply on
        every second call (optax.MultiSteps) — effective batch 2x on the
        same HBM footprint."""
        cfg = small_cfg(depth=2)
        tc = train_lib.TrainConfig(
            learning_rate=1e-2, augment=False, grad_accum=2
        )
        state = train_lib.create_unet_state(jax.random.PRNGKey(0), cfg, tc)
        step = train_lib.make_unet_train_step(cfg, tc)
        batch = self._batch()
        # the jitted step donates its input state — copy to host FIRST
        p0 = np.asarray(jax.tree_util.tree_leaves(state.params)[0]).copy()
        s1, m1 = step(state, batch, jax.random.PRNGKey(1))
        p1 = np.asarray(jax.tree_util.tree_leaves(s1.params)[0]).copy()
        np.testing.assert_array_equal(p0, p1)
        s2, m2 = step(s1, batch, jax.random.PRNGKey(2))
        p2 = np.asarray(jax.tree_util.tree_leaves(s2.params)[0]).copy()
        assert np.abs(p2 - p1).max() > 0
        # a longer accumulated run still learns
        for i in range(20):
            s2, m = step(s2, batch, jax.random.fold_in(jax.random.PRNGKey(3), i))
        assert float(m["loss"]) < float(m1["loss"])

    def test_grad_accum_lr_schedule_compresses_horizon(self):
        """With grad_accum, LR-schedule horizons arrive in micro-steps but
        the inner optimizer counts applied updates — the conversion must
        let decay complete over the same training run (code-review r3)."""
        tc = train_lib.TrainConfig(
            learning_rate=1e-2, lr_schedule="cosine", lr_decay_steps=100,
            lr_end_factor=0.01, grad_accum=4, grad_clip=None,
        )
        opt = tc.make_optimizer()
        params = {"w": jnp.ones((4,))}
        st = opt.init(params)
        grads = {"w": jnp.ones((4,))}
        deltas = []
        for _ in range(100):  # 100 micro-steps = 25 applied updates
            upd, st = opt.update(grads, st, params)
            deltas.append(float(jnp.abs(upd["w"]).max()))
        applied = [d for d in deltas if d > 0]
        assert len(applied) == 25
        # cosine decay completed: the last applied update is tiny next to
        # the first (would be ~0.7x if the horizon stayed in micro-steps)
        assert applied[-1] < 0.1 * applied[0]

    def test_train_step_with_augment(self):
        cfg = small_cfg(depth=2)
        tc = train_lib.TrainConfig(augment=True)
        state = train_lib.create_unet_state(jax.random.PRNGKey(0), cfg, tc)
        step = train_lib.make_unet_train_step(cfg, tc)
        state, m = step(state, self._batch(), jax.random.PRNGKey(2))
        assert np.isfinite(float(m["loss"]))

    def test_checkpoint_roundtrip(self, tmp_path):
        cfg = small_cfg(depth=2)
        tc = train_lib.TrainConfig()
        state = train_lib.create_unet_state(jax.random.PRNGKey(0), cfg, tc)
        path = str(tmp_path / "ckpt")
        train_lib.save_checkpoint(path, state)
        restored = train_lib.restore_checkpoint(path, state)
        for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestGAN:
    def test_generator_discriminator_shapes(self):
        cfg = gan_lib.GANConfig(
            gen_depth=2, gen_base_features=4, disc_layers=2,
            disc_base_features=4, compute_dtype=jnp.float32,
        )
        params, state = gan_lib.init(jax.random.PRNGKey(0), cfg)
        x = jnp.ones((1, 16, 16, 1))
        y, _ = gan_lib.generator_apply(cfg, params, state, x)
        assert y.shape == (1, 16, 16, 1)
        assert float(jnp.max(jnp.abs(y))) <= 1.0  # sigmoid range (default)
        assert float(jnp.min(y)) >= 0.0  # matches the [0,1] pair pipeline
        logits = gan_lib.discriminator_apply(cfg, params, x, y)
        assert logits.shape == (1, 4, 4, 1)  # two stride-2 layers

    def test_gan_train_step_runs(self):
        cfg = gan_lib.GANConfig(
            gen_depth=2, gen_base_features=4, disc_layers=2,
            disc_base_features=4, compute_dtype=jnp.float32,
        )
        tc = train_lib.TrainConfig(learning_rate=1e-3, beta1=0.5)
        state = train_lib.create_gan_state(jax.random.PRNGKey(0), cfg, tc)
        step = train_lib.make_gan_train_step(cfg, tc, l1_weight=10.0)
        batch = {
            "input": jnp.ones((2, 16, 16, 1)),
            "target": jnp.zeros((2, 16, 16, 1)),
        }
        for i in range(3):
            state, m = step(state, batch, jax.random.PRNGKey(i))
        assert np.isfinite(float(m["d_loss"])) and np.isfinite(float(m["g_loss"]))
        assert int(state.step) == 3


class TestDataParallel:
    def test_mesh_has_8_virtual_devices(self):
        assert len(jax.devices()) == 8  # conftest forces the virtual CPU mesh

    def test_dp_inference_matches_single(self):
        cfg = small_cfg()
        params, state = unet.init(jax.random.PRNGKey(0), cfg)
        tc = infer_lib.TileConfig(patch=(32, 32), overlap=(8, 8))
        single = infer_lib.make_frame_inferrer(cfg, tc, (32, 32), jit=False)

        mesh = parallel.make_mesh()
        dp = parallel.make_dp_frame_inferrer(single, mesh)
        frames = jnp.asarray(
            np.random.default_rng(0).normal(size=(8, 32, 32)).astype(np.float32)
        )
        probs_dp, labels_dp = dp(params, state, frames)
        assert probs_dp.shape == (8, 32, 32, 3)
        ref_probs, ref_labels = jax.jit(single)(params, state, frames[3])
        np.testing.assert_allclose(
            np.asarray(probs_dp[3]), np.asarray(ref_probs), atol=1e-4
        )

    def test_dp_train_step_matches_single_chip(self):
        cfg = small_cfg(depth=2, norm="none")
        tc = train_lib.TrainConfig(augment=False)
        step = train_lib.make_unet_train_step(cfg, tc, jit=False)
        mesh = parallel.make_mesh()
        dp_step = parallel.make_dp_train_step(step, mesh)

        rng = np.random.default_rng(1)
        batch = {
            "image": jnp.asarray(rng.normal(size=(8, 16, 16, 1)).astype(np.float32)),
            "labels": jnp.asarray(rng.integers(0, 3, (8, 16, 16)).astype(np.int32)),
        }
        key = jax.random.PRNGKey(0)

        s1 = train_lib.create_unet_state(jax.random.PRNGKey(0), cfg, tc)
        s1b, m1 = jax.jit(step)(s1, batch, key)

        s2 = train_lib.create_unet_state(jax.random.PRNGKey(0), cfg, tc)
        s2b, m2 = dp_step(s2, batch, key)

        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)

    def test_dp_gan_step_matches_single_chip(self):
        """DP GAN training (mesh through fit_gan) == single-chip numerics."""
        from sequitr_tpu.models import gan as gan_lib

        cfg = gan_lib.GANConfig(
            gen_depth=2, gen_base_features=4, disc_layers=2,
            disc_base_features=4, compute_dtype=jnp.float32,
        )
        tc = train_lib.TrainConfig(learning_rate=1e-3, beta1=0.5)
        step = train_lib.make_gan_train_step(cfg, tc, jit=False)
        mesh = parallel.make_mesh()
        dp_step = parallel.make_dp_train_step(step, mesh)

        rng = np.random.default_rng(2)
        batch = {
            "input": jnp.asarray(rng.random((8, 16, 16, 1)).astype(np.float32)),
            "target": jnp.asarray(rng.random((8, 16, 16, 1)).astype(np.float32)),
        }
        key = jax.random.PRNGKey(0)
        s1 = train_lib.create_gan_state(jax.random.PRNGKey(0), cfg, tc)
        s1b, m1 = jax.jit(step)(s1, batch, key)
        s2 = train_lib.create_gan_state(jax.random.PRNGKey(0), cfg, tc)
        s2b, m2 = dp_step(s2, batch, key)
        np.testing.assert_allclose(float(m1["d_loss"]), float(m2["d_loss"]), rtol=1e-5)
        np.testing.assert_allclose(float(m1["g_loss"]), float(m2["g_loss"]), rtol=1e-5)
        # NOTE: post-Adam params are NOT compared leaf-wise — for near-zero
        # gradients Adam's update is ~±lr*sign(grad), so float reassociation
        # between the sharded and unsharded reductions legitimately flips
        # low-magnitude update signs. Loss equality is the DP invariant.
        assert int(s1b.step) == int(s2b.step) == 1


class TestTiledApply:
    """Shared tiling machinery (infer.tiled_apply) — both serving paths."""

    def _run(self, patch_batch):
        from sequitr_tpu.ops import tiling
        from sequitr_tpu.pipeline import infer as infer_lib

        rng = np.random.default_rng(9)
        x = jnp.asarray(rng.random((48, 48, 1)).astype(np.float32))
        tc = infer_lib.TileConfig(
            patch=(8, 8), overlap=(4, 4), patch_batch=patch_batch
        )
        grid = tiling.tile_grid((48, 48), tc.patch, tc.overlap)
        assert len(grid) > 32  # exercises the rolled scan forms

        def forward(batch):  # cheap stand-in network, shape-preserving
            return batch * 2.0 + 1.0

        return grid, np.asarray(
            infer_lib.tiled_apply(forward, x, grid, (48, 48), tc, 1)
        ), np.asarray(x)

    def test_rolled_chunked_matches_dense(self):
        """Rolled + default-chunked output == the plain unrolled pipeline
        (code-review: enhancement_gan previously bypassed the rolled forms
        and materialized every patch activation at once)."""
        from sequitr_tpu.ops import tiling

        grid, out, x = self._run(patch_batch=None)
        patches = tiling.extract_patches(jnp.asarray(x), grid, (8, 8))
        ref = np.asarray(
            tiling.stitch_patches(patches * 2.0 + 1.0, grid, (48, 48), (4, 4), "hann")
        )
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_explicit_patch_batch_matches(self):
        _, a, _ = self._run(patch_batch=None)
        _, b, _ = self._run(patch_batch=3)
        np.testing.assert_allclose(a, b, atol=1e-5)


class TestGANPolyphaseTraining:
    def test_polyphase_gan_step_matches_standard(self):
        """TrainConfig(polyphase=True) on the GAN step: the phase-domain
        generator forward preserves losses and the trained generator
        function (conv biases under BN random-walk on noise in both
        versions — compare outputs, not leaves)."""
        cfg = gan_lib.GANConfig(
            gen_depth=3, gen_base_features=8, disc_layers=2,
            disc_base_features=8, compute_dtype=jnp.float32,
        )
        rng = np.random.default_rng(0)
        batch = {
            "input": jnp.asarray(rng.random((2, 32, 32, 1)).astype(np.float32)),
            "target": jnp.asarray(rng.random((2, 32, 32, 1)).astype(np.float32)),
        }
        tc0 = train_lib.TrainConfig(learning_rate=2e-4, beta1=0.5, augment=False)
        tc1 = dataclasses.replace(tc0, polyphase=True)
        out = {}
        for name, tc in (("std", tc0), ("poly", tc1)):
            state = train_lib.create_gan_state(jax.random.PRNGKey(0), cfg, tc)
            step = train_lib.make_gan_train_step(cfg, tc)
            for i in range(2):
                state, m = step(state, batch, jax.random.PRNGKey(i))
            out[name] = (m, state)
        m0, s0 = out["std"]
        m1, s1 = out["poly"]
        np.testing.assert_allclose(
            float(m0["d_loss"]), float(m1["d_loss"]), rtol=1e-4
        )
        np.testing.assert_allclose(
            float(m0["g_loss"]), float(m1["g_loss"]), rtol=1e-4
        )
        y0, _ = gan_lib.generator_apply(
            cfg, s0.params, s0.model_state, batch["input"]
        )
        y1, _ = gan_lib.generator_apply(
            cfg, s1.params, s1.model_state, batch["input"]
        )
        assert np.max(np.abs(np.asarray(y0) - np.asarray(y1))) < 1e-3


class TestPolyphase3D:
    def test_volumetric_serving_matches_standard(self):
        """3D polyphase (phase factor (1,2,2)): the volumetric serve
        must reproduce the standard fused serve to reassociation noise."""
        cfg = small_cfg(dims=3, depth=2, norm="batch")
        params, state = unet.init(jax.random.PRNGKey(0), cfg)
        vol = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32)) * 50 + 200
        tc = infer_lib.TileConfig(patch=(4, 32, 32), overlap=(0, 0, 0))
        tcp = dataclasses.replace(tc, polyphase=True)
        p0, l0 = infer_lib.make_frame_inferrer(cfg, tc, (4, 32, 32))(
            params, state, vol
        )
        p1, l1 = infer_lib.make_frame_inferrer(cfg, tcp, (4, 32, 32))(
            params, state, vol
        )
        np.testing.assert_allclose(np.asarray(p0), np.asarray(p1), atol=1e-4)
        assert np.mean(np.asarray(l0) == np.asarray(l1)) >= 0.999

    def test_exactness_direct(self):
        from sequitr_tpu.models import polyphase

        cfg = small_cfg(dims=3, depth=3, base_features=8, norm="batch")
        params, st = unet.init(jax.random.PRNGKey(2), cfg)
        fcfg, fp, fs = unet.fold_batchnorm(cfg, params, st)
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(1, 8, 32, 32, 1)),
            jnp.float32,
        )
        yb = np.asarray(unet.apply(fcfg, fp, fs, x, False)[0])
        yp = np.asarray(polyphase.apply3d(fcfg, fp, fs, x))
        err = np.max(np.abs(yb - yp)) / max(np.max(np.abs(yb)), 1e-9)
        assert err < 1e-5, err

    def test_odd_hw_rejected(self):
        import pytest

        cfg = small_cfg(dims=3, depth=1)
        with pytest.raises(ValueError, match="polyphase"):
            infer_lib.make_frame_inferrer(
                cfg,
                infer_lib.TileConfig(
                    patch=(4, 15, 15), overlap=(0, 0, 0), polyphase=True
                ),
                (4, 15, 15),
            )


class TestPolyphase3DTraining:
    def test_volumetric_train_step_matches_standard(self):
        """TrainConfig(polyphase=True) on a 3D model: loss, BN state
        and gradients match the production step (the (1,2,2) phase
        pool's composed first-tie routing reproduces the 2x2x2
        window's row-major order)."""
        from sequitr_tpu.models import polyphase
        from sequitr_tpu.ops import losses as losses_lib

        cfg = small_cfg(
            dims=3, depth=3, base_features=8, norm="batch",
        )
        params, st = unet.init(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 8, 16, 16, 1)), jnp.float32)
        lab = jnp.asarray(rng.integers(0, 3, (2, 8, 16, 16)))

        def loss_std(p):
            lo, ms = unet.apply(cfg, p, st, x, train=True)
            return losses_lib.weighted_softmax_cross_entropy(lo, lab, None), ms

        def loss_pp(p):
            lo, ms = polyphase.apply3d_train(cfg, p, st, x, train=True)
            return losses_lib.weighted_softmax_cross_entropy(lo, lab, None), ms

        (l0, ms0), g0 = jax.value_and_grad(loss_std, has_aux=True)(params)
        (l1, ms1), g1 = jax.value_and_grad(loss_pp, has_aux=True)(params)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(ms0), jax.tree.leaves(ms1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
        gscale = max(
            float(np.max(np.abs(np.asarray(leaf))))
            for leaf in jax.tree.leaves(g0)
        )
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            diff = float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
            assert diff / gscale < 1e-4, diff

    def test_train_step_dispatches_3d(self):
        cfg = small_cfg(dims=3, depth=2, norm="batch")
        tc = train_lib.TrainConfig(augment=False, polyphase=True)
        state = train_lib.create_unet_state(jax.random.PRNGKey(0), cfg, tc)
        step = train_lib.make_unet_train_step(cfg, tc, jit=True)
        rng = np.random.default_rng(1)
        batch = {
            "image": jnp.asarray(
                rng.normal(size=(1, 4, 16, 16, 1)).astype(np.float32)
            ),
            "labels": jnp.asarray(
                rng.integers(0, 3, (1, 4, 16, 16)).astype(np.int32)
            ),
        }
        state, m = step(state, batch, jax.random.PRNGKey(2))
        assert np.isfinite(float(m["loss"]))
