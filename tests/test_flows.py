"""Tests: flow-field instance segmentation (Cellpose-style, ops.flows).

The learned touching-cell separator: simulated-diffusion flow targets,
the vector-aware training step (train.make_flows_train_step / fit_flows),
the fused serving graph (infer.make_flows_segmenter: tiled forward +
on-device flow integration), host sink grouping, Hungarian instance
matching / AP, and the train_flows -> segment_flows -> evaluate_flows
job chain. Reference has no such subsystem (SURVEY.md provenance: mount
empty) — this is a framework extension; the spec is Stringer et al. 2021.
"""

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sequitr_tpu.config import ServerConfiguration
from sequitr_tpu.data import tiff
from sequitr_tpu.models import zoo
from sequitr_tpu.ops import flows
from sequitr_tpu.pipeline import fit as fit_lib
from sequitr_tpu.pipeline import infer as infer_lib
from sequitr_tpu.pipeline import train as train_lib
from sequitr_tpu.server import ImageServer, submit_job


@pytest.fixture
def server_env(tmp_path):
    cfg = ServerConfiguration(
        jobs_dir=str(tmp_path / "jobs"), models_dir=str(tmp_path / "models")
    )
    cfg.ensure_dirs()
    return cfg, tmp_path


def _discs(size=96, centers=((40, 35, 15), (40, 62, 15), (75, 20, 8))):
    """Instance label map of discs; overlapping regions keep the FIRST
    disc (so later discs become touching crescents)."""
    yy, xx = np.mgrid[:size, :size]
    lab = np.zeros((size, size), np.int32)
    for i, (cy, cx, r) in enumerate(centers, start=1):
        m = (yy - cy) ** 2 + (xx - cx) ** 2 < r**2
        lab[m & (lab == 0)] = i
    return lab


def _scene_stack(rng, n, size=48, min_r=6, max_r=10, n_cells=3):
    """(images, labels) stacks: bright discs (some touching) on a noisy
    background — the stereotyped scene a tiny U-Net can learn quickly."""
    imgs = np.zeros((n, size, size), np.float32)
    labs = np.zeros((n, size, size), np.int32)
    yy, xx = np.mgrid[:size, :size]
    for t in range(n):
        placed = []
        lab = np.zeros((size, size), np.int32)
        for i in range(1, n_cells + 1):
            for _ in range(30):
                r = int(rng.integers(min_r, max_r + 1))
                cy = int(rng.integers(r + 1, size - r - 1))
                cx = int(rng.integers(r + 1, size - r - 1))
                # allow touching but not heavy overlap: center distance
                # >= max radius of the pair keeps crescents thick
                if all(
                    (cy - py) ** 2 + (cx - px) ** 2 >= max(r, pr) ** 2
                    for py, px, pr in placed
                ):
                    break
            m = (yy - cy) ** 2 + (xx - cx) ** 2 < r**2
            lab[m & (lab == 0)] = i
            placed.append((cy, cx, r))
        img = 0.15 + 0.7 * (lab > 0)
        img += rng.normal(0, 0.05, img.shape)
        imgs[t] = np.clip(img, 0, 1)
        labs[t] = lab
    return imgs, labs


class TestFlowTargets:
    def test_unit_inside_zero_outside(self):
        lab = _discs()
        fl, pr = flows.flow_targets(lab)
        inside = lab > 0
        mag = np.sqrt((fl**2).sum(-1))
        np.testing.assert_allclose(mag[inside], 1.0, atol=1e-5)
        assert np.all(mag[~inside] == 0.0)
        np.testing.assert_array_equal(pr, inside.astype(np.float32))

    def test_opposing_vectors_across_touching_boundary(self):
        """THE property class maps lack: flows on the two sides of a
        cell-cell contact point in opposite directions (each toward its
        own center). Sampled along the contact line of two discs."""
        lab = _discs(centers=((40, 33, 14), (40, 60, 14)))
        fl, _ = flows.flow_targets(lab)
        # contact pixels: label-1 pixels with a label-2 right-neighbor
        c = np.argwhere((lab[:, :-1] == 1) & (lab[:, 1:] == 2))
        assert len(c) > 3, "discs must touch"
        for y, x in c:
            v1 = fl[y, x]
            v2 = fl[y, x + 1]
            # x-components point away from each other: cell 1's center is
            # left of the contact, cell 2's right of it
            assert v1[1] < 0 < v2[1], (y, x, v1, v2)

    def test_flows_point_up_the_gradient_toward_center(self):
        """Far-from-center pixels' flow must have positive dot product
        with the direction to the instance medoid (convex cells)."""
        lab = _discs(centers=((48, 48, 20),))
        fl, _ = flows.flow_targets(lab)
        ys, xs = np.nonzero(lab)
        to_center = np.stack([48.0 - ys, 48.0 - xs], -1)
        d = np.linalg.norm(to_center, axis=-1)
        sel = d > 5
        dots = (fl[ys, xs] * to_center / np.maximum(d[:, None], 1e-6)).sum(-1)
        assert np.all(dots[sel] > 0.2), float(dots[sel].min())

    def test_flip_equivariance(self):
        """flow_targets commutes with spatial flips (the augmentation
        contract): targets of the flipped labels == flipped targets with
        the flipped axis component negated."""
        lab = _discs(size=64, centers=((20, 25, 10), (40, 42, 12)))
        fl, pr = flows.flow_targets(lab)
        for ax in (0, 1):
            fl2, pr2 = flows.flow_targets(np.flip(lab, axis=ax))
            want = np.flip(fl, axis=ax).copy()
            want[..., ax] *= -1
            # medoid argmin tie-breaks can move a source by one pixel
            # under a flip, flipping the gradient at the pixels ADJACENT
            # to it — equivariance holds everywhere else
            bad = np.abs(fl2 - want).max(-1) > 1e-5
            assert bad.mean() < 1e-3, f"axis {ax}: {bad.sum()} px differ"
            np.testing.assert_array_equal(pr2, np.flip(pr, axis=ax))

    def test_empty_and_3d(self):
        fl, pr = flows.flow_targets(np.zeros((16, 16), np.int32))
        assert fl.shape == (16, 16, 2) and not fl.any() and not pr.any()
        vol = np.zeros((6, 16, 16), np.int32)
        vol[2:5, 4:12, 4:12] = 1
        fl3, pr3 = flows.flow_targets(vol)
        assert fl3.shape == (6, 16, 16, 3)
        mag = np.sqrt((fl3**2).sum(-1))
        np.testing.assert_allclose(mag[vol > 0], 1.0, atol=1e-5)

    def test_rejects_bad_rank(self):
        with pytest.raises(ValueError):
            flows.flow_targets(np.zeros((4,), np.int32))


class TestFollowAndGroup:
    def test_round_trip_exact(self):
        """GT flows -> follow -> group recovers the instance map exactly
        (touching discs STAY separate — the argmax+CCL failure mode)."""
        lab = _discs()
        fl, pr = flows.flow_targets(lab)
        pred = flows.masks_from_flows(fl, pr, n_iter=200, min_area=10)
        ap = flows.average_precision(lab, pred)
        assert ap["n_gt"] == ap["n_pred"] == 3
        assert ap["ap90"] == 1.0, ap
        # plain CCL on the same foreground merges the touching pair
        from sequitr_tpu import localize as loc_lib

        merged = loc_lib.label_components(lab > 0)
        assert int(merged.max()) == 2

    def test_min_area_drops_specks(self):
        lab = _discs(centers=((40, 40, 15),))
        fl, pr = flows.flow_targets(lab)
        # inject a 4-px fg speck with zero flow: converges onto itself
        pr2 = pr.copy()
        pr2[2:4, 2:4] = 1.0
        pred = flows.masks_from_flows(fl, pr2, min_area=15)
        assert int(pred.max()) == 1
        assert not pred[2:4, 2:4].any()

    def test_follow_flows_is_jittable_and_masked(self):
        lab = _discs(size=48, centers=((24, 24, 12),))
        fl, pr = flows.flow_targets(lab)
        fn = jax.jit(lambda f, m: flows.follow_flows(f, m, n_iter=50))
        final = np.asarray(fn(jnp.asarray(fl), jnp.asarray(pr > 0.5)))
        assert final.shape == (48, 48, 2)
        # background pixels never move
        bg = np.argwhere(lab == 0)
        np.testing.assert_allclose(
            final[bg[:, 0], bg[:, 1]], bg.astype(np.float32), atol=1e-5
        )
        # cell pixels converge near the medoid (within a few px)
        ins = lab > 0
        d = np.linalg.norm(final[ins] - np.array([24.0, 24.0]), axis=-1)
        assert float(np.median(d)) < 3.0


class TestDoublingIntegrator:
    def test_doubling_converges_like_euler(self):
        """Pointer doubling on the integer successor map reaches the same
        sinks as the sequential Euler scan: identical instance maps on a
        multi-cell scene after grouping (the snap_radius slack absorbs
        <=2-cycle oscillation across sinks)."""
        lab = _discs(
            size=64, centers=((20, 20, 8), (20, 36, 8), (44, 44, 10))
        )
        fl, pr = flows.flow_targets(lab)
        mask = pr > 0.5
        e = np.asarray(flows.follow_flows(jnp.asarray(fl), mask, n_iter=200))
        d = np.asarray(
            flows.follow_flows_doubling(jnp.asarray(fl), mask, n_iter=256)
        )
        ge = flows.group_sinks(e, np.asarray(mask))
        gd = flows.group_sinks(d, np.asarray(mask))
        ap = flows.average_precision(ge, gd)
        assert ap["ap50"] == 1.0, ap
        assert ap["mean_matched_iou"] > 0.95, ap
        # background never moves under either integrator
        bg = np.argwhere(lab == 0)
        np.testing.assert_allclose(
            d[bg[:, 0], bg[:, 1]], bg.astype(np.float32), atol=1e-5
        )

    def test_serve_integrator_param(self):
        """make_flows_segmenter(integrator='doubling') serves; a bogus
        integrator fails at build time."""
        import pytest as _pytest

        from sequitr_tpu.models import unet as unet_lib
        from sequitr_tpu.pipeline import infer as infer_lib

        cfg = unet_lib.UNetConfig(
            in_channels=1, num_classes=3, depth=2, base_features=4,
            compute_dtype=jnp.float32,
        )
        params, state = unet_lib.init(jax.random.PRNGKey(0), cfg)
        tc = infer_lib.TileConfig(patch=(32, 32), overlap=(0, 0))
        fn = infer_lib.make_flows_segmenter(
            cfg, tc, (32, 32), integrator="doubling"
        )
        final, prob = fn(params, state, jnp.ones((32, 32)))
        assert final.shape == (32, 32, 2) and prob.shape == (32, 32)
        with _pytest.raises(ValueError, match="integrator"):
            infer_lib.make_flows_segmenter(
                cfg, tc, (32, 32), integrator="warp9"
            )


class TestMatching:
    def test_known_iou_and_ap(self):
        gt = np.zeros((20, 20), np.int32)
        gt[2:10, 2:10] = 1  # 64 px
        pred = np.zeros((20, 20), np.int32)
        pred[2:10, 2:6] = 1  # 32 px, IoU = 32/64 = 0.5
        pred[14:18, 14:18] = 2  # false positive
        ious, n_gt, n_pred = flows.match_instances(gt, pred)
        assert n_gt == 1 and n_pred == 2
        np.testing.assert_allclose(ious, [0.5])
        ap = flows.average_precision(gt, pred, thresholds=(0.5, 0.75))
        assert ap["ap50"] == pytest.approx(1 / 2)  # TP=1, FP=1, FN=0
        assert ap["ap75"] == pytest.approx(0.0)

    def test_empty_cases(self):
        z = np.zeros((8, 8), np.int32)
        o = z.copy()
        o[2:4, 2:4] = 1
        ious, n_gt, n_pred = flows.match_instances(z, o)
        assert ious.size == 0 and n_gt == 0 and n_pred == 1
        ap = flows.average_precision(z, z)
        assert ap["ap50"] == 1.0  # vacuously perfect


class TestLocalizeInstances:
    def test_touching_instances_stay_separate(self):
        from sequitr_tpu import localize as loc_lib

        lab = _discs(centers=((40, 33, 14), (40, 60, 14)))
        tbl = loc_lib.localize_instances_table(lab, t=7)
        assert len(tbl) == 2
        # vs the CCL path, which merges the touching pair into one object
        merged = loc_lib.localize_frame_table((lab > 0).astype(np.int32))
        assert len(merged) == 1
        # centroids land near the disc centers, [t, x, y, z, label] layout
        assert set(tbl.coords[:, 0]) == {7.0}
        got = sorted(zip(tbl.coords[:, 2], tbl.coords[:, 1]))
        np.testing.assert_allclose(got[0], (40, 33), atol=1.0)
        np.testing.assert_allclose(got[1], (40, 60), atol=1.0)

    def test_min_area_and_empty(self):
        from sequitr_tpu import localize as loc_lib

        assert len(loc_lib.localize_instances_table(np.zeros((8, 8)))) == 0
        lab = np.zeros((16, 16), np.int32)
        lab[2:4, 2:4] = 1
        lab[8:14, 8:14] = 2
        tbl = loc_lib.localize_instances_table(lab, min_area=10)
        assert len(tbl) == 1 and int(tbl.area[0]) == 36


def _tiny_cfg(**kw):
    base = dict(depth=2, base_features=8, compute_dtype=jnp.float32)
    base.update(kw)
    return dataclasses.replace(zoo.get("flows_cells"), **base)


class TestTraining:
    def test_flip_batch_consistency(self):
        """flows_flip_batch output stays a VALID (image, flow, prob)
        triple: re-deriving targets from the flipped probs is impossible
        here, but the flip-equivariance of flow_targets (tested above)
        means flipped-with-negation targets ARE the flipped scene's
        targets — verify the op applies exactly that transform."""
        rng = np.random.default_rng(3)
        lab = _discs(size=32, centers=((16, 12, 7), (16, 24, 6)))
        fl, pr = flows.flow_targets(lab)
        img = rng.normal(size=(32, 32, 1)).astype(np.float32)
        B = 8
        imgs = jnp.broadcast_to(img, (B,) + img.shape)
        fls = jnp.broadcast_to(fl, (B,) + fl.shape)
        prs = jnp.broadcast_to(pr, (B,) + pr.shape)
        oi, of, op = train_lib.flows_flip_batch(
            jax.random.PRNGKey(0), imgs, fls, prs
        )
        oi, of, op = np.asarray(oi), np.asarray(of), np.asarray(op)
        variants = {}
        for by in (False, True):
            for bx in (False, True):
                v_img = img
                v_fl = fl.copy()
                v_pr = pr
                if by:
                    v_img = np.flip(v_img, 0)
                    v_fl = np.flip(v_fl, 0).copy()
                    v_fl[..., 0] *= -1
                    v_pr = np.flip(v_pr, 0)
                if bx:
                    v_img = np.flip(v_img, 1)
                    v_fl = np.flip(v_fl, 1).copy()
                    v_fl[..., 1] *= -1
                    v_pr = np.flip(v_pr, 1)
                variants[(by, bx)] = (v_img, v_fl, v_pr)
        seen = set()
        for b in range(B):
            hit = None
            for k, (v_img, v_fl, v_pr) in variants.items():
                if np.allclose(oi[b], v_img, atol=1e-6):
                    np.testing.assert_allclose(of[b], v_fl, atol=1e-6)
                    np.testing.assert_allclose(op[b], v_pr, atol=1e-6)
                    hit = k
                    break
            assert hit is not None, f"batch {b}: not a valid flip variant"
            seen.add(hit)
        assert len(seen) >= 2, "8 samples should hit >= 2 flip variants"

    def test_train_step_learns(self):
        cfg = _tiny_cfg()
        tc = train_lib.TrainConfig(learning_rate=3e-3, augment=False)
        step = train_lib.make_flows_train_step(cfg, tc)
        lab = _discs(size=32, centers=((16, 12, 7), (16, 24, 6)))
        fl, pr = flows.flow_targets(lab)
        img = (0.2 + 0.6 * pr)[..., None].astype(np.float32)
        batch = {
            "image": jnp.broadcast_to(img, (4,) + img.shape),
            "flow": jnp.broadcast_to(fl, (4,) + fl.shape),
            "prob": jnp.broadcast_to(pr, (4,) + pr.shape),
        }
        state = train_lib.create_unet_state(jax.random.PRNGKey(0), cfg, tc)
        key = jax.random.PRNGKey(1)
        losses = []
        for i in range(40):
            state, m = step(state, batch, jax.random.fold_in(key, i))
            losses.append(float(m["loss"]))
        assert losses[-1] < 0.3 * losses[0], (losses[0], losses[-1])
        assert {"flow_mse", "prob_bce", "grad_norm"} <= set(m)

    def test_rejects_wrong_head(self):
        with pytest.raises(ValueError, match="num_classes"):
            train_lib.make_flows_train_step(
                _tiny_cfg(num_classes=2), train_lib.TrainConfig()
            )

    def test_fit_flows_records_and_eval(self, tmp_path):
        from sequitr_tpu.data import records as records_lib

        rng = np.random.default_rng(5)
        payloads = []
        for _ in range(24):
            lab = _discs(size=32, centers=(
                (int(rng.integers(8, 24)), int(rng.integers(8, 24)), 6),
            ))
            fl, pr = flows.flow_targets(lab)
            img = (0.2 + 0.6 * pr + rng.normal(0, 0.03, pr.shape)).astype(
                np.float32
            )
            payloads.append(fit_lib.encode_flow_example(img, fl, pr))
        shards = records_lib.write_shards(
            str(tmp_path / "fl"), iter(payloads), shard_size=16
        )
        cfg = _tiny_cfg()
        tc = train_lib.TrainConfig(learning_rate=2e-3)
        fc = fit_lib.FitConfig(
            steps=30, batch_size=4, checkpoint_every=0, log_every=10,
            holdout_every=6, eval_every=15,
            metrics_path=str(tmp_path / "m.jsonl"),
        )
        state = fit_lib.fit_flows(cfg, tc, fc, shards)
        assert int(state.step) == 30
        rows = [json.loads(l) for l in open(fc.metrics_path)]
        evals = [r for r in rows if r.get("kind") == "eval"]
        assert evals and {"eval_loss", "eval_flow_mse", "eval_prob_bce"} <= set(
            evals[-1]
        )


class TestServing:
    def test_segmenter_rejects_tta_and_wrong_head(self):
        cfg = _tiny_cfg()
        tc = infer_lib.TileConfig(patch=(32, 32), overlap=0, tta=4)
        with pytest.raises(ValueError, match="tta"):
            infer_lib.make_flows_segmenter(cfg, tc, (32, 32))
        tc1 = infer_lib.TileConfig(patch=(32, 32), overlap=0)
        with pytest.raises(ValueError, match="num_classes"):
            infer_lib.make_flows_segmenter(
                _tiny_cfg(num_classes=1), tc1, (32, 32)
            )

    def test_jobs_chain(self, server_env):
        """train_flows registers a flows model; segment_flows separates
        touching cells; evaluate_flows scores it against the GT."""
        cfg_srv, tmp = server_env
        rng = np.random.default_rng(11)
        imgs, labs = _scene_stack(rng, 30, size=48)
        img_p = str(tmp / "img.tif")
        lab_p = str(tmp / "lab.tif")
        tiff.write_stack(img_p, imgs)
        tiff.write_stack(lab_p, labs.astype(np.uint16))

        train_out = str(tmp / "train")
        submit_job(
            cfg_srv.jobs_dir,
            {
                "module": "train_flows",
                "params": {
                    "model": "flows_demo",
                    "patch": [32, 32],
                    "patches_per_frame": 3,
                    "steps": 400,
                    "batch_size": 8,
                    "learning_rate": 2e-3,
                    "lr_schedule": "cosine",
                    "depth": 2,
                    "base_features": 8,
                    "compute_dtype": "float32",
                    "holdout_every": 10,
                    "eval_every": 100,
                    "keep_best": True,
                },
                "input": [img_p, lab_p],
                "output": train_out,
            },
        )
        srv = ImageServer(cfg_srv)
        assert srv.poll_once()
        status = json.load(open(os.path.join(train_out, "status.json")))
        assert status["state"] == "complete", status.get("error")
        from sequitr_tpu.server import load_model

        kind, mcfg, _, _ = load_model(cfg_srv.models_dir, "flows_demo")
        assert kind == "flows" and mcfg.num_classes == 3

        seg_out = str(tmp / "seg")
        submit_job(
            cfg_srv.jobs_dir,
            {
                "module": "segment_flows",
                "params": {
                    "model": "flows_demo", "min_area": 20, "save_prob": True,
                },
                "input": [img_p],
                "output": seg_out,
            },
        )
        assert srv.poll_once()
        st2 = json.load(open(os.path.join(seg_out, "status.json")))
        assert st2["state"] == "complete", st2.get("error")
        pred = np.asarray(tiff.read_stack(st2["outputs"]["labels"]))
        assert pred.shape == imgs.shape and pred.dtype == np.uint16
        prob = np.asarray(tiff.read_stack(st2["outputs"]["prob"]))
        assert prob.shape == imgs.shape
        m = json.loads(st2["outputs"]["metrics"])
        assert m["n_frames"] == 30 and m["n_objects"] > 0
        assert os.path.exists(st2["outputs"]["objects"])

        # quality: pooled AP50 over the stack must beat 0.5 (3 cells/frame,
        # stereotyped discs — a trained run typically lands far higher)
        ev_out = str(tmp / "ev")
        submit_job(
            cfg_srv.jobs_dir,
            {
                "module": "evaluate_flows",
                "params": {
                    "model": "flows_demo", "min_area": 20, "per_frame": True,
                },
                "input": [img_p, lab_p],
                "output": ev_out,
            },
        )
        assert srv.poll_once()
        st3 = json.load(open(os.path.join(ev_out, "status.json")))
        assert st3["state"] == "complete", st3.get("error")
        em = json.loads(st3["outputs"]["metrics"])
        assert em["n_gt"] == 90
        assert em["ap50"] > 0.5, em
        assert em["mean_matched_iou"] > 0.6, em
        assert len(em["per_frame_ap50"]) == 30

        # the separated instances must OUTNUMBER plain CCL components on
        # frames with touching cells (the point of the subsystem); compare
        # totals across the stack
        from sequitr_tpu import localize as loc_lib

        n_ccl = sum(
            int(loc_lib.label_components(labs[t] > 0).max()) for t in range(30)
        )
        assert em["n_gt"] > n_ccl, "scene should contain touching pairs"

    def test_param_errors(self, server_env):
        cfg_srv, tmp = server_env
        img_p = str(tmp / "img.tif")
        tiff.write_stack(img_p, np.zeros((2, 32, 32), np.float32))
        srv = ImageServer(cfg_srv)
        # train_flows without labels input
        out1 = str(tmp / "o1")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "train_flows", "params": {"model": "x"},
             "input": [img_p], "output": out1},
        )
        assert srv.poll_once()
        st = json.load(open(os.path.join(out1, "status.json")))
        assert st["state"] == "failed" and "labels" in st["error"]
        # segment_flows with a missing model
        out2 = str(tmp / "o2")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "segment_flows", "params": {"model": "nope"},
             "input": [img_p], "output": out2},
        )
        assert srv.poll_once()
        st2 = json.load(open(os.path.join(out2, "status.json")))
        assert st2["state"] == "failed"
        # unsupported dims rejected deterministically
        out3 = str(tmp / "o3")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "train_flows",
             "params": {"model": "x", "dims": 4},
             "input": [img_p, img_p], "output": out3},
        )
        assert srv.poll_once()
        st3 = json.load(open(os.path.join(out3, "status.json")))
        assert st3["state"] == "failed" and "dims" in st3["error"]
        # dims=3 with a patch that cannot fit the volumes: deterministic
        out4 = str(tmp / "o4")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "train_flows",
             "params": {"model": "x", "dims": 3},
             "input": [img_p, img_p], "output": out4},
        )
        assert srv.poll_once()
        st4 = json.load(open(os.path.join(out4, "status.json")))
        assert st4["state"] == "failed" and "patch" in st4["error"]


def _sphere_volumes(rng, n, z=8, s=32):
    """(volumes, instance labels): two touching spheres + one separate,
    jittered per timepoint — the volumetric flows scene."""
    imgs = np.zeros((n, z, s, s), np.float32)
    labs = np.zeros((n, z, s, s), np.int32)
    zz, yy, xx = np.mgrid[:z, :s, :s]
    for t in range(n):
        lab = np.zeros((z, s, s), np.int32)
        cy = 14 + int(rng.integers(-2, 3))
        cx = 10 + int(rng.integers(-2, 3))
        lab[(zz - 4) ** 2 + (yy - cy) ** 2 + (xx - cx) ** 2 < 5**2] = 1
        m = (zz - 4) ** 2 + (yy - cy) ** 2 + (xx - cx - 9) ** 2 < 5**2
        lab[m & (lab == 0)] = 2
        m3 = (zz - 4) ** 2 + (yy - 25) ** 2 + (xx - 25) ** 2 < 4**2
        lab[m3 & (lab == 0)] = 3
        img = 0.15 + 0.7 * (lab > 0) + rng.normal(0, 0.05, lab.shape)
        imgs[t] = np.clip(img, 0, 1)
        labs[t] = lab
    return imgs, labs


class TestVolumetric:
    def test_3d_round_trip_separates_touching_spheres(self):
        rng = np.random.default_rng(0)
        _, labs = _sphere_volumes(rng, 1)
        lab = labs[0]
        fl, pr = flows.flow_targets(lab)
        assert fl.shape == lab.shape + (3,)
        pred = flows.masks_from_flows(fl, pr, n_iter=80, min_area=20)
        ap = flows.average_precision(lab, pred)
        assert ap["ap90"] == 1.0, ap
        # plain 3D CCL merges the touching pair
        from sequitr_tpu import localize as loc_lib

        assert int(loc_lib.label_components(lab > 0).max()) == 2

    def test_localize_instances_3d_z_centroids(self):
        from sequitr_tpu import localize as loc_lib

        rng = np.random.default_rng(1)
        _, labs = _sphere_volumes(rng, 1)
        tbl = loc_lib.localize_instances_table(labs[0], t=3)
        assert len(tbl) == 3
        # z centroids near the sphere centers (z=4 for all)
        np.testing.assert_allclose(tbl.coords[:, 3], 4.0, atol=1.0)
        assert set(tbl.coords[:, 0]) == {3.0}

    def test_3d_jobs_chain(self, server_env):
        """train_flows dims=3 -> segment_flows (volumetric routing) ->
        evaluate_flows on per-timepoint volume files."""
        cfg_srv, tmp = server_env
        rng = np.random.default_rng(5)
        imgs, labs = _sphere_volumes(rng, 10)
        img_dir = tmp / "vols"
        lab_dir = tmp / "labvols"
        img_dir.mkdir()
        lab_dir.mkdir()
        for t in range(10):
            tiff.write_stack(str(img_dir / f"v{t:03d}.tif"), imgs[t])
            tiff.write_stack(
                str(lab_dir / f"v{t:03d}.tif"), labs[t].astype(np.uint16)
            )

        train_out = str(tmp / "train3d")
        submit_job(
            cfg_srv.jobs_dir,
            {
                "module": "train_flows",
                "params": {
                    "model": "flows3d_demo", "dims": 3,
                    "patch": [8, 32, 32], "patches_per_frame": 2,
                    "steps": 300, "batch_size": 4,
                    "learning_rate": 2e-3, "lr_schedule": "cosine",
                    "depth": 2, "base_features": 8,
                    "compute_dtype": "float32",
                },
                "input": [str(img_dir), str(lab_dir)],
                "output": train_out,
            },
        )
        srv = ImageServer(cfg_srv)
        assert srv.poll_once()
        st = json.load(open(os.path.join(train_out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        from sequitr_tpu.server import load_model

        kind, mcfg, _, _ = load_model(cfg_srv.models_dir, "flows3d_demo")
        assert kind == "flows" and mcfg.dims == 3 and mcfg.num_classes == 4

        seg_out = str(tmp / "seg3d")
        submit_job(
            cfg_srv.jobs_dir,
            {
                "module": "segment_flows",
                "params": {"model": "flows3d_demo", "min_area": 20,
                           "n_iter": 80},
                "input": [str(img_dir)],
                "output": seg_out,
            },
        )
        assert srv.poll_once()
        st2 = json.load(open(os.path.join(seg_out, "status.json")))
        assert st2["state"] == "complete", st2.get("error")
        lab0 = np.asarray(
            tiff.read_stack(os.path.join(seg_out, "labels_t0000.tif"))
        )
        assert lab0.shape == (8, 32, 32) and lab0.dtype == np.uint16
        m = json.loads(st2["outputs"]["metrics"])
        assert m["n_volumes"] == 10 and m["n_objects"] > 0
        assert os.path.exists(st2["outputs"]["objects"])

        ev_out = str(tmp / "ev3d")
        submit_job(
            cfg_srv.jobs_dir,
            {
                "module": "evaluate_flows",
                "params": {"model": "flows3d_demo", "min_area": 20,
                           "n_iter": 80, "per_frame": True},
                "input": [str(img_dir), str(lab_dir)],
                "output": ev_out,
            },
        )
        assert srv.poll_once()
        st3 = json.load(open(os.path.join(ev_out, "status.json")))
        assert st3["state"] == "complete", st3.get("error")
        em = json.loads(st3["outputs"]["metrics"])
        assert em["n_gt"] == 30
        assert em["ap50"] > 0.5, em
        assert len(em["per_volume_ap50"]) == 10


class TestDataParallelServing:
    def test_dp_serve_matches_single(self, server_env):
        """segment_flows data_parallel over the 8-device virtual mesh
        produces byte-identical instance maps to the single-device serve
        (DP is sharding annotations on the same per-frame graph)."""
        if jax.device_count() < 2:
            pytest.skip("needs the virtual multi-device mesh")
        cfg_srv, tmp = server_env
        rng = np.random.default_rng(3)
        imgs, labs = _scene_stack(rng, 10, size=48)
        img_p = str(tmp / "img.tif")
        lab_p = str(tmp / "lab.tif")
        tiff.write_stack(img_p, imgs)
        tiff.write_stack(lab_p, labs.astype(np.uint16))

        submit_job(
            cfg_srv.jobs_dir,
            {"module": "train_flows",
             "params": {"model": "fdp", "patch": [32, 32],
                        "patches_per_frame": 2, "steps": 60,
                        "batch_size": 4, "depth": 2, "base_features": 8,
                        "compute_dtype": "float32"},
             "input": [img_p, lab_p], "output": str(tmp / "t")},
        )
        srv = ImageServer(cfg_srv)
        assert srv.poll_once()

        outs = {}
        for name, extra in (("single", {}), ("dp", {"data_parallel": True})):
            out = str(tmp / f"seg_{name}")
            submit_job(
                cfg_srv.jobs_dir,
                {"module": "segment_flows",
                 "params": {"model": "fdp", "min_area": 10, **extra},
                 "input": [img_p], "output": out},
            )
            assert srv.poll_once()
            st = json.load(open(os.path.join(out, "status.json")))
            assert st["state"] == "complete", st.get("error")
            outs[name] = np.asarray(tiff.read_stack(st["outputs"]["labels"]))
        np.testing.assert_array_equal(outs["single"], outs["dp"])


class TestReviewRegressions:
    """Round-4 self-code-review findings, pinned."""

    def test_prob_bce_metric_minimizes(self):
        # keep_best_metric='eval_prob_bce' must MINIMIZE (it is a loss);
        # before the fix the first (worst) eval held "best" forever
        assert not fit_lib._higher_is_better("eval_prob_bce")
        assert not fit_lib._higher_is_better("eval_loss")
        assert fit_lib._higher_is_better("eval_miou")

    def test_extent_not_shadowed_by_higher_ids(self):
        """A tall cell flanked by smaller HIGHER-id cells along the same
        rows/columns must still get enough diffusion iterations: the old
        per-axis max-projection extent was shadowed by the higher ids
        and left zero-flow targets inside the large cell."""
        lab = np.zeros((140, 60), np.int32)
        lab[10:130, 20:32] = 1  # 120-px-tall cell
        # higher-id small cells covering the same row range at other cols
        for k, y0 in enumerate(range(10, 130, 12), start=2):
            lab[y0:y0 + 8, 44:52] = k
        fl, pr = flows.flow_targets(lab)
        mag = np.sqrt((fl**2).sum(-1))
        inside = lab == 1
        # every pixel of the big cell carries a unit direction (heat
        # reached it) — no zero-flow interior
        assert float(mag[inside].min()) > 0.99, float(mag[inside].min())
