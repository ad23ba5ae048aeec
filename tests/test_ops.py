"""Unit tests for dense ops: normalize, tiling, stitch, losses, augment.

Mirrors the rebuild test strategy in SURVEY.md §4: per-kernel unit tests
with round-trip/identity properties and golden numpy cross-checks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sequitr_tpu import ops


class TestNormalize:
    def test_exact_matches_numpy(self):
        rng = np.random.default_rng(0)
        x = rng.gamma(2.0, 100.0, size=(64, 64)).astype(np.float32)
        out = ops.percentile_normalize(jnp.asarray(x), 5.0, 99.5)
        lo, hi = np.percentile(x, [5.0, 99.5])
        ref = np.clip((x - lo) / (hi - lo + 1e-8), 0, 1)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_fast_close_to_exact(self):
        rng = np.random.default_rng(1)
        x = rng.normal(500.0, 120.0, size=(256, 256)).astype(np.float32)
        exact = ops.percentile_normalize(jnp.asarray(x))
        fast = ops.percentile_normalize_fast(jnp.asarray(x), bins=4096)
        # histogram quantile error <= ~1 bin of the intensity range
        assert float(jnp.max(jnp.abs(exact - fast))) < 0.01

    def test_channel_axis(self):
        rng = np.random.default_rng(2)
        x = rng.uniform(0, 1000, size=(32, 32, 3)).astype(np.float32)
        out = ops.percentile_normalize(jnp.asarray(x), channel_axis=True)
        for c in range(3):
            lo, hi = np.percentile(x[..., c], [5.0, 99.5])
            ref = np.clip((x[..., c] - lo) / (hi - lo + 1e-8), 0, 1)
            np.testing.assert_allclose(np.asarray(out[..., c]), ref, atol=1e-4)

    def test_jit_and_vmap(self):
        x = jnp.ones((4, 64, 64)) * jnp.arange(1, 5)[:, None, None]
        out = jax.jit(jax.vmap(ops.percentile_normalize))(x)
        assert out.shape == (4, 64, 64)


class TestTiling:
    def test_offsets_cover_and_clamp(self):
        offs = ops.tile_offsets(1024, 256, 64)
        assert offs[0] == 0 and offs[-1] == 1024 - 256
        # every pixel covered
        covered = np.zeros(1024, bool)
        for o in offs:
            covered[o : o + 256] = True
        assert covered.all()

    def test_offsets_nondivisible(self):
        offs = ops.tile_offsets(1000, 256, 64)
        assert offs[-1] == 1000 - 256
        covered = np.zeros(1000, bool)
        for o in offs:
            covered[o : o + 256] = True
        assert covered.all()

    def test_extract_shapes(self):
        img = jnp.zeros((128, 128, 2))
        grid = ops.tile_grid((128, 128), (64, 64), (16, 16))
        patches = ops.extract_patches(img, grid, (64, 64))
        assert patches.shape == (len(grid), 64, 64, 2)

    @pytest.mark.parametrize("window", ["flat", "tri", "hann"])
    def test_tile_stitch_roundtrip_identity(self, window):
        """Stitching tiles of any field reproduces it exactly (weights cancel)."""
        rng = np.random.default_rng(3)
        img = jnp.asarray(rng.normal(size=(100, 120, 3)).astype(np.float32))
        patch, overlap = (48, 48), (16, 24)
        grid = ops.tile_grid((100, 120), patch, overlap)
        patches = ops.extract_patches(img, grid, patch)
        out = ops.stitch_patches(patches, grid, (100, 120), overlap, window)
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-4)

    def test_stitch_jit(self):
        img = jnp.ones((64, 64, 1))
        grid = ops.tile_grid((64, 64), (32, 32), (8, 8))

        @jax.jit
        def f(im):
            p = ops.extract_patches(im, grid, (32, 32))
            return ops.stitch_patches(p, grid, (64, 64), (8, 8))

        np.testing.assert_allclose(np.asarray(f(img)), 1.0, atol=1e-5)

    def test_3d_roundtrip(self):
        rng = np.random.default_rng(4)
        vol = jnp.asarray(rng.normal(size=(16, 48, 48)).astype(np.float32))
        patch, overlap = (8, 24, 24), (4, 8, 8)
        grid = ops.tile_grid((16, 48, 48), patch, overlap)
        patches = ops.extract_patches(vol, grid, patch)
        out = ops.stitch_patches(patches, grid, (16, 48, 48), overlap)
        np.testing.assert_allclose(np.asarray(out), np.asarray(vol), atol=1e-4)


class TestScanTiling:
    def test_extract_scan_matches_unrolled(self):
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.random((40, 56, 2)).astype(np.float32))
        grid = ops.tile_grid((40, 56), (16, 16), (4, 4))
        a = ops.extract_patches(img, grid, (16, 16))
        b = ops.extract_patches_scan(img, grid, (16, 16))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_stitch_scan_matches_unrolled(self):
        rng = np.random.default_rng(1)
        grid = ops.tile_grid((40, 56), (16, 16), (4, 4))
        patches = jnp.asarray(
            rng.random((len(grid), 16, 16, 3)).astype(np.float32)
        )
        a = ops.stitch_patches(patches, grid, (40, 56), (4, 4))
        b = ops.stitch_patches_scan(patches, grid, (40, 56), (4, 4))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_scan_roundtrip_identity(self):
        rng = np.random.default_rng(2)
        img = jnp.asarray(rng.random((32, 32)).astype(np.float32))
        grid = ops.tile_grid((32, 32), (16, 16), (8, 8))
        patches = ops.extract_patches_scan(img[..., None], grid, (16, 16))
        out = ops.stitch_patches_scan(patches, grid, (32, 32), (8, 8))
        np.testing.assert_allclose(
            np.asarray(out[..., 0]), np.asarray(img), atol=1e-6
        )

    def test_rolled_inferrer_matches_unrolled(self):
        """A grid just over the rolled threshold must give the same answer
        as a sub-threshold unrolled run on the same pixels."""
        import dataclasses as dc

        from sequitr_tpu.models import unet as unet_lib
        from sequitr_tpu.pipeline import infer as infer_lib

        cfg = unet_lib.UNetConfig(
            in_channels=1, num_classes=2, depth=2, base_features=2,
            norm="none", compute_dtype=jnp.float32,
        )
        params, state = unet_lib.init(jax.random.PRNGKey(0), cfg)
        frame = jnp.asarray(
            np.random.default_rng(3).random((80, 80)).astype(np.float32)
        )
        # 8x8 grid of 16² tiles with 8 overlap -> 81 tiles (rolled)
        tc = infer_lib.TileConfig(patch=(16, 16), overlap=(8, 8), normalize="none")
        fn_rolled = infer_lib.make_frame_inferrer(cfg, tc, (80, 80))
        # same tiling forced unrolled via the library functions
        from sequitr_tpu.ops import tiling as t

        grid = t.tile_grid((80, 80), (16, 16), (8, 8))
        assert len(grid) > 32

        def unrolled(frame):
            x = frame[..., None]
            patches = t.extract_patches(x, grid, (16, 16))
            logits, _ = unet_lib.apply(cfg, params, state, patches, train=False)
            probs = jax.nn.softmax(logits, axis=-1)
            return t.stitch_patches(probs, grid, (80, 80), (8, 8))

        p1, _ = fn_rolled(params, state, frame)
        p2 = jax.jit(unrolled)(frame)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-5)


class TestLosses:
    def test_confusion_metrics_match_whole_stack(self):
        """Per-frame confusion accumulation (the streaming evaluator's
        form) reproduces iou/dice/accuracy over the concatenated stack —
        including vacuous classes and out-of-range target labels."""
        from sequitr_tpu.ops import losses

        rng = np.random.default_rng(0)
        k = 4
        preds = rng.integers(0, k, (6, 24, 24)).astype(np.int32)
        truth = rng.integers(0, k, (6, 24, 24)).astype(np.int32)
        truth[1, :4, :4] = 7  # malformed labels beyond K
        preds[truth == 2] = 2  # some real agreement
        truth[truth == 3] = 0
        preds[preds == 3] = 0  # class 3 vacuous -> must score 1.0

        cm = np.zeros((k + 1, k), np.int64)
        for p, t in zip(preds, truth):
            cm += losses.confusion_matrix_np(p, t, k)
        ious, dices, acc = losses.metrics_from_confusion(cm)

        ref_iou = np.asarray(losses.iou(jnp.asarray(preds), jnp.asarray(truth), k))
        ref_dice = np.asarray(losses.dice(jnp.asarray(preds), jnp.asarray(truth), k))
        np.testing.assert_allclose(ious, ref_iou, atol=1e-6)
        np.testing.assert_allclose(dices, ref_dice, atol=1e-6)
        assert ious[3] == 1.0  # vacuous rule preserved
        np.testing.assert_allclose(acc, (preds == truth).mean(), atol=1e-9)

    def test_weighted_ce_uniform_weights_equals_plain(self):
        key = jax.random.PRNGKey(0)
        logits = jax.random.normal(key, (4, 8, 8, 3))
        labels = jax.random.randint(key, (4, 8, 8), 0, 3)
        a = ops.weighted_softmax_cross_entropy(logits, labels)
        b = ops.weighted_softmax_cross_entropy(logits, labels, jnp.ones((4, 8, 8)))
        np.testing.assert_allclose(float(a), float(b), rtol=1e-6)

    def test_ce_perfect_prediction_near_zero(self):
        labels = jnp.array([[0, 1], [2, 1]])
        logits = jax.nn.one_hot(labels, 3) * 100.0
        assert float(ops.weighted_softmax_cross_entropy(logits, labels)) < 1e-5

    def test_bce_matches_torch_formula(self):
        logits = jnp.array([-3.0, 0.0, 2.5])
        targets = jnp.array([0.0, 1.0, 1.0])
        ref = np.mean(
            np.maximum(logits, 0) - logits * targets + np.log1p(np.exp(-np.abs(logits)))
        )
        np.testing.assert_allclose(
            float(ops.sigmoid_bce_with_logits(logits, targets)), ref, rtol=1e-5
        )

    def test_iou_identity(self):
        labels = jnp.asarray(np.random.default_rng(5).integers(0, 3, (32, 32)))
        np.testing.assert_allclose(np.asarray(ops.iou(labels, labels, 3)), 1.0)

    def test_softmax_label_map(self):
        logits = jnp.asarray([[[[10.0, 0.0, 0.0], [0.0, 10.0, 0.0]]]])
        probs, labels = ops.softmax_label_map(logits)
        assert probs.shape == logits.shape
        np.testing.assert_array_equal(np.asarray(labels), [[[0, 1]]])


class TestAugment:
    def test_flip_deterministic_under_key(self):
        key = jax.random.PRNGKey(7)
        x = jnp.arange(16.0).reshape(4, 4)
        a = ops.random_flip(key, x)
        b = ops.random_flip(key, x)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_flip_consistent_across_arrays(self):
        key = jax.random.PRNGKey(8)
        x = jnp.arange(16.0).reshape(4, 4)
        a, b = ops.random_flip(key, x, x)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_rot90_consistent(self):
        key = jax.random.PRNGKey(9)
        x = jnp.arange(16.0).reshape(4, 4)
        a, b = ops.random_rot90(key, x, x)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_elastic_zero_field_is_identity(self):
        x = jnp.arange(64.0).reshape(8, 8)
        out = ops.elastic_warp(x, jnp.zeros((8, 8)), jnp.zeros((8, 8)))
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)

    def test_augment_example_shapes_and_label_dtype(self):
        key = jax.random.PRNGKey(10)
        img = jnp.ones((32, 32, 1))
        lab = jnp.zeros((32, 32), jnp.int32).at[8:16, 8:16].set(1)
        w = jnp.ones((32, 32))
        oi, ol, ow = ops.augment_example(key, img, lab, w)
        assert oi.shape == (32, 32, 1) and ol.shape == (32, 32) and ow.shape == (32, 32)
        assert ol.dtype == jnp.int32
        # labels stay in the valid set under NN warp
        assert set(np.unique(np.asarray(ol))) <= {0, 1}

    def test_augment_jit(self):
        key = jax.random.PRNGKey(11)
        f = jax.jit(lambda k, im: ops.augment_example(k, im)[0])
        out = f(key, jnp.ones((16, 16, 1)))
        assert out.shape == (16, 16, 1)

    def test_augment_example_3d_shapes_and_labels(self):
        key = jax.random.PRNGKey(12)
        img = jnp.ones((6, 16, 16, 1))
        lab = jnp.zeros((6, 16, 16), jnp.int32).at[2:4, 4:8, 4:8].set(1)
        w = jnp.ones((6, 16, 16))
        oi, ol, ow = ops.augment_example(key, img, lab, w, dims=3)
        assert oi.shape == (6, 16, 16, 1)
        assert ol.shape == (6, 16, 16) and ol.dtype == jnp.int32
        assert ow.shape == (6, 16, 16)
        assert set(np.unique(np.asarray(ol))) <= {0, 1}
        # object mass is preserved up to warp resampling at edges
        assert 0 < int(np.asarray(ol).sum()) <= 2 * 2 * 4 * 4

    def test_augment_3d_elastic_z_consistent(self):
        """The elastic field is identical on every z-plane: identical input
        planes must stay identical after augmentation."""
        key = jax.random.PRNGKey(13)
        plane = jnp.asarray(
            np.random.default_rng(0).random((16, 16, 1)).astype(np.float32)
        )
        vol = jnp.stack([plane] * 4)
        out, _, _ = ops.augment_example(key, vol, dims=3)
        out = np.asarray(out)
        for z in range(1, 4):
            np.testing.assert_allclose(out[z], out[0], atol=1e-6)

    def test_augment_3d_jit_vmap(self):
        key = jax.random.PRNGKey(14)
        f = jax.jit(
            jax.vmap(lambda k, im: ops.augment_example(k, im, dims=3)[0])
        )
        keys = jax.random.split(key, 2)
        out = f(keys, jnp.ones((2, 4, 8, 8, 1)))
        assert out.shape == (2, 4, 8, 8, 1)



    def test_photometric_jitter_contract(self):
        """Defaults are an EXACT identity (key split gated on the knobs,
        so committed goldens stay bit-identical); with knobs on, gains
        stay in the log-symmetric band, labels/weights are untouched and
        the geometry stream still only sees its own keys."""
        from sequitr_tpu.ops import augment as aug

        k = jax.random.PRNGKey(3)
        img = jnp.asarray(
            np.random.default_rng(0).random((16, 16, 2)), jnp.float32
        )
        lab = jnp.asarray(np.random.default_rng(1).integers(0, 2, (16, 16)))
        w = jnp.ones((16, 16), jnp.float32)
        # identity at zero — bit-exact, including the geometric stream
        a0 = aug.augment_example(k, img, lab, w, p_elastic=0.0)
        a1 = aug.augment_example(
            k, img, lab, w, p_elastic=0.0,
            gain_jitter=0.0, offset_jitter=0.0, noise_std=0.0,
        )
        for x, y in zip(a0, a1):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        # knobs on: image changes, labels/weights don't
        g_img, g_lab, g_w = aug.augment_example(
            k, img, lab, w, p_elastic=0.0, gain_jitter=0.3,
        )
        assert not np.array_equal(np.asarray(g_img), np.asarray(a0[0]))
        # pure gain: per-channel ratios constant and inside the band
        flips_only = np.asarray(a0[0])
        ratio = np.asarray(g_img) / np.maximum(flips_only, 1e-12)
        for c in range(2):
            rc = ratio[..., c][flips_only[..., c] > 1e-6]
            assert rc.std() < 1e-5
            assert 1 / 1.3 - 1e-6 <= rc.mean() <= 1.3 + 1e-6
        np.testing.assert_array_equal(np.asarray(g_lab), np.asarray(a0[1]))
        np.testing.assert_array_equal(np.asarray(g_w), np.asarray(a0[2]))
        # noise: E[std] ~ noise_std on a constant image
        const = jnp.ones((64, 64, 1), jnp.float32)
        n_img = aug.photometric_jitter(k, const, noise_std=0.05)
        assert 0.04 < float(jnp.std(n_img)) < 0.06

    def test_photometric_knobs_plumb_into_the_train_step(self):
        """A unet train step with noise on runs and produces a different
        loss than the identical step without (same key/batch)."""
        import dataclasses

        from sequitr_tpu.models import unet
        from sequitr_tpu.pipeline import train as train_lib

        cfg = unet.UNetConfig(
            in_channels=1, num_classes=2, depth=2, base_features=4,
            compute_dtype=jnp.float32,
        )
        batch = {
            "image": jnp.asarray(
                np.random.default_rng(0).random((2, 16, 16, 1)),
                jnp.float32,
            ),
            "labels": jnp.zeros((2, 16, 16), jnp.int32),
        }
        k = jax.random.PRNGKey(0)
        losses_got = []
        for noise in (0.0, 0.3):
            tc = train_lib.TrainConfig(noise_std=noise, p_elastic=0.0)
            state = train_lib.create_unet_state(jax.random.PRNGKey(1), cfg, tc)
            step = train_lib.make_unet_train_step(cfg, tc, jit=True)
            _, metrics = step(state, batch, k)
            losses_got.append(float(metrics["loss"]))
        assert np.isfinite(losses_got).all()
        assert losses_got[0] != losses_got[1]



    def test_noise_survives_the_geometry(self):
        """Jitter applies AFTER the warp: with elastic ON, a constant
        image still receives the full configured noise std (pre-warp
        noise would be smoothed by the bilinear resample — review fix)."""
        from sequitr_tpu.ops import augment as aug

        const = jnp.ones((64, 64, 1), jnp.float32)
        img, _, _ = aug.augment_example(
            jax.random.PRNGKey(5), const, None, None,
            p_elastic=1.0, noise_std=0.05,
        )
        assert 0.04 < float(jnp.std(img)) < 0.06


class TestWeightMaps:

    def test_sparse_mask_normalization_and_degenerate_cases(self):
        """Review fixes: valid-mask normalization is over ANNOTATED
        pixels (so the w0 border term keeps its intended scale at sparse
        coverage), and an all-False mask returns zeros, not ones."""
        labels = np.zeros((32, 32), np.int32)
        labels[4:8, 4:8] = 1
        valid = np.zeros((32, 32), bool)
        valid[:10, :10] = True  # ~10% annotated
        wc = ops.weightmaps.class_balance_weights(labels, 2, valid=valid)
        assert wc[valid].mean() == pytest.approx(1.0)  # the doc contract
        assert (wc[~valid] == 0).all()
        none_valid = np.zeros((8, 8), bool)
        wc0 = ops.weightmaps.class_balance_weights(
            np.zeros((8, 8), np.int32), 2, valid=none_valid
        )
        assert (wc0 == 0).all()
    def test_border_peak_between_objects(self):
        inst = np.zeros((32, 32), np.int32)
        inst[8:14, 8:24] = 1
        inst[18:24, 8:24] = 2
        wb = ops.weightmaps.border_weights(inst, w0=10.0, sigma=3.0)
        # the gap row (y=16) should carry more weight than a far corner
        assert wb[16, 16] > wb[0, 0]
        assert wb.max() <= 10.0 + 1e-5

    def test_class_balance_mean_one(self):
        labels = np.zeros((64, 64), np.int32)
        labels[:8, :8] = 1
        w = ops.weightmaps.class_balance_weights(labels, 2)
        np.testing.assert_allclose(w.mean(), 1.0, rtol=1e-5)
        assert w[0, 0] > w[-1, -1]  # rare class weighted up

    def test_unet_weight_map_full(self):
        labels = np.zeros((32, 32), np.int32)
        labels[4:12, 4:12] = 1
        labels[16:24, 4:12] = 1
        wm = ops.weightmaps.unet_weight_map(labels)
        assert wm.shape == (32, 32) and wm.dtype == np.float32
        assert np.isfinite(wm).all()

    def test_border_weights_3d(self):
        inst = np.zeros((6, 16, 16), np.int32)
        inst[1:5, 3:7, 3:13] = 1
        inst[1:5, 10:14, 3:13] = 2
        wb = ops.weightmaps.border_weights(inst, w0=10.0, sigma=3.0)
        assert wb.shape == (6, 16, 16)
        # gap plane between the two slabs outweighs a far corner
        assert wb[3, 8, 8] > wb[0, 0, 0]

    def test_unet_weight_map_3d(self):
        labels = np.zeros((4, 16, 16), np.int32)
        labels[1:3, 2:6, 2:6] = 1
        labels[1:3, 9:13, 9:13] = 1
        wm = ops.weightmaps.unet_weight_map(labels)
        assert wm.shape == (4, 16, 16) and np.isfinite(wm).all()


    def test_valid_mask_makes_sparse_annotations_a_true_ignore(self):
        """Sparse-annotation contract: with a valid mask, unannotated
        pixels carry weight 0 and do not skew the class balance; the
        weighted CE's sum(w)-normalization then ignores them exactly."""
        import jax.numpy as jnp

        from sequitr_tpu.ops import losses

        labels = np.zeros((16, 16), np.int32)
        labels[2:6, 2:6] = 1
        valid = np.zeros((16, 16), bool)
        valid[:8] = True  # only the top half is annotated
        w = ops.weightmaps.unet_weight_map(labels, num_classes=2, valid=valid)
        assert (w[~valid] == 0).all()
        assert (w[valid] > 0).all()
        # class balance counted over VALID pixels only: matches the map
        # computed on the annotated half alone
        wc_masked = ops.weightmaps.class_balance_weights(
            labels, 2, valid=valid
        )
        wc_half = ops.weightmaps.class_balance_weights(labels[:8], 2)
        ratio_m = wc_masked[2, 2] / wc_masked[0, 0]
        ratio_h = wc_half[2, 2] / wc_half[0, 0]
        assert ratio_m == pytest.approx(ratio_h)
        # the loss is EXACTLY invariant to what the ignored pixels claim
        logits = jnp.asarray(
            np.random.default_rng(0).normal(0, 1, (16, 16, 2)), jnp.float32
        )
        lab_a = jnp.asarray(labels)
        lab_b = jnp.asarray(np.where(valid, labels, 1 - labels))  # flip
        wj = jnp.asarray(w)
        la = losses.weighted_softmax_cross_entropy(logits, lab_a, wj)
        lb = losses.weighted_softmax_cross_entropy(logits, lab_b, wj)
        assert float(la) == float(lb)

class TestTilingEdgeCases:
    def test_patch_equals_size(self):
        assert ops.tile_offsets(64, 64, 0) == (0,)
        assert ops.tile_offsets(64, 64, 16) == (0,)

    def test_zero_overlap_exact_partition(self):
        offs = ops.tile_offsets(128, 32, 0)
        assert offs == (0, 32, 64, 96)

    def test_patch_larger_than_size_raises(self):
        import pytest

        with pytest.raises(ValueError):
            ops.tile_offsets(16, 32, 0)

    def test_overlap_ge_patch_raises(self):
        import pytest

        with pytest.raises(ValueError):
            ops.tile_offsets(64, 16, 16)


class TestAugmentChannelless:
    def test_augment_example_2d_channelless(self):
        """(H, W) images without a channel axis are accepted (code-review
        regression: the quad-warp rewrite briefly required a channel axis)."""
        key = jax.random.PRNGKey(20)
        img = jnp.ones((16, 16))
        lab = jnp.zeros((16, 16), jnp.int32)
        w = jnp.ones((16, 16))
        oi, ol, ow = ops.augment_example(key, img, lab, w)
        assert oi.shape == (16, 16) and ol.shape == (16, 16)
        assert ow.shape == (16, 16)

    def test_augment_example_3d_channelless(self):
        key = jax.random.PRNGKey(21)
        img = jnp.ones((4, 16, 16))
        oi, _, _ = ops.augment_example(key, img, dims=3)
        assert oi.shape == (4, 16, 16)
