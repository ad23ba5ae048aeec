"""Tests: star-convex instance segmentation (StarDist-style, ops.stardist).

The second learned touching-cell separator: ray-marched distance +
normalized-EDT probability targets, the ray-permutation-aware training
step (train.make_stars_train_step / fit_stars), the fused serving graph
(infer.make_stars_predictor), host candidate NMS + polygon
rasterization, and the train_stars -> segment_stars -> evaluate_stars
job chain. Reference has no such subsystem (SURVEY.md provenance: mount
empty) — this is a framework extension; the spec is Schmidt et al. 2018.
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
from sequitr_tpu.ops import stardist as sd
from sequitr_tpu.pipeline import fit as fit_lib
from sequitr_tpu.pipeline import infer as infer_lib
from sequitr_tpu.pipeline import train as train_lib
from sequitr_tpu.server import ImageServer, submit_job

from tests.test_flows import _discs, _scene_stack


@pytest.fixture
def server_env(tmp_path):
    cfg = ServerConfiguration(
        jobs_dir=str(tmp_path / "jobs"), models_dir=str(tmp_path / "models")
    )
    cfg.ensure_dirs()
    return cfg, tmp_path


def _tiny_cfg(**kw):
    base = dict(depth=2, base_features=8, compute_dtype=jnp.float32)
    base.update(kw)
    return dataclasses.replace(zoo.get("stars_cells"), **base)


class TestStarTargets:
    def test_shapes_and_support(self):
        lab = _discs(size=48, centers=((24, 16, 9), (24, 33, 8)))
        dist, prob = sd.star_targets(lab, n_rays=16)
        assert dist.shape == (48, 48, 16) and prob.shape == (48, 48)
        inside = lab > 0
        # distances strictly positive inside (>= 0.5), zero outside
        assert float(dist[inside].min()) >= 0.5
        assert float(np.abs(dist[~inside]).max()) == 0.0
        # prob in [0, 1], zero outside, and each instance peaks at 1.0
        assert 0.0 <= prob.min() and prob.max() <= 1.0
        assert float(prob[~inside].max()) == 0.0
        for i in (1, 2):
            assert prob[lab == i].max() == pytest.approx(1.0)

    def test_disc_center_distances_match_radius(self):
        """At an isolated disc's center, every ray distance ~= the
        radius (the star-convex representation is exact for discs)."""
        lab = np.zeros((64, 64), np.int32)
        yy, xx = np.mgrid[:64, :64]
        r = 11
        lab[(yy - 32) ** 2 + (xx - 32) ** 2 < r**2] = 1
        dist, prob = sd.star_targets(lab)
        center = dist[32, 32]
        assert center.shape == (32,)
        np.testing.assert_allclose(center, r, atol=1.0)

    def test_round_trip_recovers_instances(self):
        """GT targets -> instances_from_rays reconstructs the label map
        (AP50/75 = 1, matched IoU > 0.93 — the representation ceiling
        on synthetic touching scenes, d+0.5 boundary convention)."""
        from sequitr_tpu.data import synthetic

        _, lab = synthetic.instances_frame(3, (192, 192), density=1 / 1200)
        dist, prob = sd.star_targets(lab)
        pred = sd.instances_from_rays(prob, dist, prob_thresh=0.3)
        ap = flows.average_precision(lab, pred)
        assert ap["n_pred"] == ap["n_gt"]
        assert ap["ap50"] == 1.0 and ap["ap75"] == 1.0, ap
        assert ap["mean_matched_iou"] > 0.93, ap

    def test_touching_discs_stay_separate(self):
        lab = _discs(size=96, centers=((40, 35, 15), (40, 62, 15)))
        assert (lab > 0).sum() > 0
        dist, prob = sd.star_targets(lab)
        pred = sd.instances_from_rays(prob, dist, prob_thresh=0.3)
        # two touching cells -> two labels (argmax+CCL would give one)
        assert int(pred.max()) == 2
        from sequitr_tpu import localize as loc_lib

        assert int(loc_lib.label_components(lab > 0).max()) == 1

    def test_flip_equivariance(self):
        """star_targets(flip(lab)) == flip + ray-perm of
        star_targets(lab) — the property the training flip augmentation
        relies on (round-half-even sampling is negation-symmetric)."""
        lab = _discs(size=40, centers=((18, 14, 8), (22, 28, 7)))
        dist, prob = sd.star_targets(lab, n_rays=16)
        for ax in (0, 1):
            d2, p2 = sd.star_targets(np.flip(lab, ax), n_rays=16)
            perm = sd.ray_flip_perm(16, ax)
            np.testing.assert_allclose(
                d2, np.flip(dist, ax)[..., perm], atol=1e-5
            )
            np.testing.assert_allclose(p2, np.flip(prob, ax), atol=1e-6)

    def test_transpose_perm(self):
        lab = _discs(size=40, centers=((18, 14, 8), (26, 28, 6)))
        dist, _ = sd.star_targets(lab, n_rays=16)
        d2, _ = sd.star_targets(lab.T, n_rays=16)
        perm = sd.ray_transpose_perm(16)
        np.testing.assert_allclose(
            d2, np.transpose(dist, (1, 0, 2))[..., perm], atol=1e-5
        )

    def test_rejects_bad_inputs(self):
        with pytest.raises(ValueError, match="2D"):
            sd.star_targets(np.zeros((4, 4, 4), np.int32))
        with pytest.raises(ValueError, match="multiple of 4"):
            sd.star_targets(np.zeros((8, 8), np.int32), n_rays=6)
        with pytest.raises(ValueError, match="multiple of 4"):
            sd.ray_flip_perm(10, 0)
        # empty scene: all-zero targets
        d, p = sd.star_targets(np.zeros((8, 8), np.int32))
        assert d.sum() == 0 and p.sum() == 0


class TestNMS:
    def test_min_area_drops_specks(self):
        lab = _discs(size=64, centers=((32, 32, 12),))
        dist, prob = sd.star_targets(lab)
        # inject a fake tiny candidate far from the disc
        prob2 = prob.copy()
        prob2[5, 5] = 0.9
        dist2 = dist.copy()
        dist2[5, 5] = 1.0
        pred = sd.instances_from_rays(prob2, dist2, min_area=15)
        assert int(pred.max()) == 1  # the speck (area ~ pi) was dropped
        pred2 = sd.instances_from_rays(prob2, dist2, min_area=1)
        assert int(pred2.max()) == 2

    def test_empty_and_validation(self):
        pred = sd.instances_from_rays(
            np.zeros((16, 16), np.float32), np.zeros((16, 16, 8), np.float32)
        )
        assert pred.shape == (16, 16) and pred.sum() == 0
        with pytest.raises(ValueError, match="prob"):
            sd.instances_from_rays(
                np.zeros((16, 16, 2), np.float32),
                np.zeros((16, 16, 8), np.float32),
            )

    def test_duplicate_peaks_suppressed(self):
        """Two near-identical candidates inside one cell -> one instance
        (greedy NMS: the second polygon lands on claimed pixels)."""
        lab = _discs(size=64, centers=((32, 32, 12),))
        dist, prob = sd.star_targets(lab)
        # force a plateau: two equal peaks 2 px apart
        prob2 = prob.copy()
        prob2[32, 32] = 1.0
        prob2[32, 34] = 1.0
        pred = sd.instances_from_rays(prob2, dist, peak_window=3)
        assert int(pred.max()) == 1


class TestTraining:
    def test_flip_batch_consistency(self):
        """stars_flip_batch output stays a VALID (image, dist, prob)
        triple: the flip-equivariance of star_targets (tested above)
        means flipped-with-ray-perm targets ARE the flipped scene's
        targets — verify the op applies exactly that transform."""
        rng = np.random.default_rng(3)
        lab = _discs(size=32, centers=((16, 12, 7), (16, 24, 6)))
        dist, pr = sd.star_targets(lab, n_rays=8)
        img = rng.normal(size=(32, 32, 1)).astype(np.float32)
        B = 8
        imgs = jnp.broadcast_to(img, (B,) + img.shape)
        ds = jnp.broadcast_to(dist, (B,) + dist.shape)
        prs = jnp.broadcast_to(pr, (B,) + pr.shape)
        perms = jnp.stack(
            [jnp.asarray(sd.ray_flip_perm(8, 0)),
             jnp.asarray(sd.ray_flip_perm(8, 1))]
        )
        oi, od, op = train_lib.stars_flip_batch(
            jax.random.PRNGKey(0), imgs, ds, prs, perms
        )
        oi, od, op = np.asarray(oi), np.asarray(od), np.asarray(op)
        variants = {}
        for by in (False, True):
            for bx in (False, True):
                v_img, v_d, v_pr = img, dist.copy(), pr
                if by:
                    v_img = np.flip(v_img, 0)
                    v_d = np.flip(v_d, 0)[..., sd.ray_flip_perm(8, 0)]
                    v_pr = np.flip(v_pr, 0)
                if bx:
                    v_img = np.flip(v_img, 1)
                    v_d = np.flip(v_d, 1)[..., sd.ray_flip_perm(8, 1)]
                    v_pr = np.flip(v_pr, 1)
                variants[(by, bx)] = (v_img, v_d, v_pr)
        seen = set()
        for b in range(B):
            hit = None
            for k, (v_img, v_d, v_pr) in variants.items():
                if np.allclose(oi[b], v_img, atol=1e-6):
                    np.testing.assert_allclose(od[b], v_d, atol=1e-6)
                    np.testing.assert_allclose(op[b], v_pr, atol=1e-6)
                    hit = k
                    break
            assert hit is not None, f"batch {b}: not a valid flip variant"
            seen.add(hit)
        assert len(seen) >= 2, "8 samples should hit >= 2 flip variants"

    def test_train_step_learns(self):
        cfg = _tiny_cfg(num_classes=9)  # 8 rays keeps the tiny net tiny
        tc = train_lib.TrainConfig(learning_rate=3e-3, augment=False)
        step = train_lib.make_stars_train_step(cfg, tc)
        lab = _discs(size=32, centers=((16, 12, 7), (16, 24, 6)))
        dist, pr = sd.star_targets(lab, n_rays=8)
        img = (0.2 + 0.6 * (lab > 0))[..., None].astype(np.float32)
        batch = {
            "image": jnp.broadcast_to(img, (4,) + img.shape),
            "dist": jnp.broadcast_to(dist, (4,) + dist.shape),
            "prob": jnp.broadcast_to(pr, (4,) + pr.shape),
        }
        state = train_lib.create_unet_state(jax.random.PRNGKey(0), cfg, tc)
        key = jax.random.PRNGKey(1)
        losses, maes = [], []
        for i in range(60):
            state, m = step(state, batch, jax.random.fold_in(key, i))
            losses.append(float(m["loss"]))
            maes.append(float(m["dist_mae"]))
        # the BCE against SOFT normalized-EDT targets has an entropy
        # floor (~0.14 on this scene), so a deep loss-ratio gate like the
        # flows test's 0.3x is unreachable; gate both heads on a solid
        # decrease instead (the jobs-chain test carries the quality gate)
        assert losses[-1] < 0.75 * losses[0], (losses[0], losses[-1])
        assert maes[-1] < 0.75 * maes[0], (maes[0], maes[-1])
        assert {"dist_mae", "prob_bce", "grad_norm"} <= set(m)

    def test_rejects_wrong_head(self):
        with pytest.raises(ValueError, match="num_classes"):
            train_lib.make_stars_train_step(
                _tiny_cfg(num_classes=2), train_lib.TrainConfig()
            )
        with pytest.raises(ValueError, match="2D"):
            train_lib.make_stars_train_step(
                _tiny_cfg(dims=3, num_classes=33), train_lib.TrainConfig()
            )

    def test_fit_stars_records_and_eval(self, tmp_path):
        from sequitr_tpu.data import records as records_lib

        rng = np.random.default_rng(5)
        payloads = []
        for _ in range(24):
            lab = _discs(size=32, centers=(
                (int(rng.integers(8, 24)), int(rng.integers(8, 24)), 6),
            ))
            dist, pr = sd.star_targets(lab, n_rays=8)
            img = (0.2 + 0.6 * pr + rng.normal(0, 0.03, pr.shape)).astype(
                np.float32
            )
            payloads.append(fit_lib.encode_stars_example(img, dist, pr))
        shards = records_lib.write_shards(
            str(tmp_path / "st"), iter(payloads), shard_size=16
        )
        cfg = _tiny_cfg(num_classes=9)
        tc = train_lib.TrainConfig(learning_rate=2e-3)
        fc = fit_lib.FitConfig(
            steps=30, batch_size=4, checkpoint_every=0, log_every=10,
            holdout_every=6, eval_every=15,
            metrics_path=str(tmp_path / "m.jsonl"),
        )
        state = fit_lib.fit_stars(cfg, tc, fc, shards)
        assert int(state.step) == 30
        rows = [json.loads(l) for l in open(fc.metrics_path)]
        evals = [r for r in rows if r.get("kind") == "eval"]
        assert evals and {
            "eval_loss", "eval_dist_mae", "eval_prob_bce"
        } <= set(evals[-1])

    def test_example_codec_round_trip(self):
        rng = np.random.default_rng(0)
        img = rng.normal(size=(16, 16)).astype(np.float32)
        dist = rng.uniform(0.5, 9.0, (16, 16, 8)).astype(np.float32)
        pr = rng.uniform(0, 1, (16, 16)).astype(np.float32)
        got = fit_lib._decode_stars(
            fit_lib.encode_stars_example(img, dist, pr)
        )
        np.testing.assert_array_equal(got["image"][..., 0], img)
        np.testing.assert_array_equal(got["dist"], dist)
        np.testing.assert_array_equal(got["prob"], pr)


class TestServing:
    def test_predictor_rejects_tta_and_wrong_head(self):
        cfg = _tiny_cfg()
        tc = infer_lib.TileConfig(patch=(32, 32), overlap=0, tta=4)
        with pytest.raises(ValueError, match="tta"):
            infer_lib.make_stars_predictor(cfg, tc, (32, 32))
        tc1 = infer_lib.TileConfig(patch=(32, 32), overlap=0)
        with pytest.raises(ValueError, match="num_classes"):
            infer_lib.make_stars_predictor(
                _tiny_cfg(num_classes=2), tc1, (32, 32)
            )
        with pytest.raises(ValueError, match="2D"):
            infer_lib.make_stars_predictor(
                _tiny_cfg(dims=3, num_classes=33), tc1, (8, 32, 32)
            )

    def test_jobs_chain(self, server_env):
        """train_stars registers a stars model; segment_stars separates
        touching cells; evaluate_stars scores it against the GT."""
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
                "module": "train_stars",
                "params": {
                    "model": "stars_demo",
                    "n_rays": 16,
                    "patch": [32, 32],
                    "patches_per_frame": 3,
                    "steps": 800,
                    "batch_size": 8,
                    "learning_rate": 2e-3,
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

        kind, mcfg, _, _ = load_model(cfg_srv.models_dir, "stars_demo")
        assert kind == "stars" and mcfg.num_classes == 17

        seg_out = str(tmp / "seg")
        submit_job(
            cfg_srv.jobs_dir,
            {
                "module": "segment_stars",
                "params": {
                    "model": "stars_demo", "min_area": 20, "save_prob": True,
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
                "module": "evaluate_stars",
                "params": {
                    "model": "stars_demo", "min_area": 20, "per_frame": True,
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
        # frames with touching cells (the point of the subsystem)
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

        # train_stars: bad n_rays, 3D, missing labels — deterministic errors
        for params, inputs in (
            ({"model": "m", "n_rays": 6}, [img_p, img_p]),
            ({"model": "m", "dims": 3}, [img_p, img_p]),
            ({"model": "m"}, [img_p]),
        ):
            out = str(tmp / f"e{len(os.listdir(tmp))}")
            submit_job(
                cfg_srv.jobs_dir,
                {"module": "train_stars", "params": params,
                 "input": inputs, "output": out},
            )
            assert srv.poll_once()
            st = json.load(open(os.path.join(out, "status.json")))
            assert st["state"] == "failed"

        # segment_stars without a registered model
        out = str(tmp / "e_seg")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "segment_stars", "params": {"model": "nope"},
             "input": [img_p], "output": out},
        )
        assert srv.poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "failed"


class TestDataParallelServing:
    def test_dp_serve_matches_single(self, server_env):
        """segment_stars data_parallel over the 8-device virtual mesh
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
            {"module": "train_stars",
             "params": {"model": "sdp", "n_rays": 8, "patch": [32, 32],
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
                {"module": "segment_stars",
                 "params": {"model": "sdp", "min_area": 10, **extra},
                 "input": [img_p], "output": out},
            )
            assert srv.poll_once()
            st = json.load(open(os.path.join(out, "status.json")))
            assert st["state"] == "complete", st.get("error")
            outs[name] = np.asarray(tiff.read_stack(st["outputs"]["labels"]))
        np.testing.assert_array_equal(outs["single"], outs["dp"])
