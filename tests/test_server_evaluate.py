"""Evaluate/parity pipeline tests: evaluate_unet2d/3d/gan scoring and parity_check against independent re-derivations.

Split out of test_server.py (round-5 verdict item 4).
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sequitr_tpu import localize
from sequitr_tpu.config import ServerConfiguration
from sequitr_tpu.data import tiff
from sequitr_tpu.models import gan as gan_lib
from sequitr_tpu.models import unet
from sequitr_tpu.server import (
    ImageServer,
    Job,
    JobError,
    claim_job,
    save_model,
    scan_jobs,
    submit_job,
)
from sequitr_tpu.server import server as server_mod


@pytest.fixture
def server_env(tmp_path):
    cfg = ServerConfiguration(
        jobs_dir=str(tmp_path / "jobs"), models_dir=str(tmp_path / "models")
    )
    cfg.ensure_dirs()
    return cfg, tmp_path


class TestEvaluatePipeline:
    def test_evaluate_against_own_predictions_is_perfect(self, server_env):
        """segment a stack, then evaluate the same model against its own
        predicted labels: every IoU must be exactly 1.0 — proves the whole
        evaluate plumbing (tiling config, label decode, scoring)."""
        cfg_srv, tmp = server_env
        net_cfg = unet.UNetConfig(
            in_channels=1, num_classes=3, depth=2, base_features=4,
            compute_dtype=jnp.float32,
        )
        params, state = unet.init(jax.random.PRNGKey(3), net_cfg)
        save_model(cfg_srv.models_dir, "ev2d", "unet", net_cfg, params, state)
        stack = (np.random.default_rng(9).random((3, 32, 32)) * 900).astype(np.float32)
        stack_path = str(tmp / "ev.tif")
        tiff.write_stack(stack_path, stack)
        srv = ImageServer(cfg_srv)

        seg_out = str(tmp / "ev_seg")
        submit_job(cfg_srv.jobs_dir,
                   {"module": "segmentation_unet2d",
                    "params": {"model": "ev2d", "patch": [32, 32],
                               "overlap": [0, 0], "localize": False},
                    "input": [stack_path], "output": seg_out})
        assert srv.poll_once()
        st = json.load(open(os.path.join(seg_out, "status.json")))
        assert st["state"] == "complete", st.get("error")

        ev_out = str(tmp / "ev_eval")
        submit_job(cfg_srv.jobs_dir,
                   {"module": "evaluate_unet2d",
                    "params": {"model": "ev2d", "patch": [32, 32],
                               "overlap": [0, 0], "per_frame": True,
                               "save_labels": True},
                    "input": [stack_path, st["outputs"]["labels"]],
                    "output": ev_out})
        assert srv.poll_once()
        st2 = json.load(open(os.path.join(ev_out, "status.json")))
        assert st2["state"] == "complete", st2.get("error")
        m = json.loads(st2["outputs"]["metrics"])
        assert m["miou"] == 1.0 and m["pixel_accuracy"] == 1.0
        assert m["per_frame_miou"] == [1.0, 1.0, 1.0]
        assert {"iou_0", "iou_2", "dice_1"} <= set(m)
        assert os.path.exists(st2["outputs"]["labels"])

    def test_evaluate_ignore_label_excludes_sparse_truth(self, server_env):
        """ignore_label pixels are excluded from EVERY metric: corrupting
        the truth inside the ignored region changes nothing, and the
        reported metrics equal a host-side masked confusion computed from
        the job's own saved predictions."""
        from sequitr_tpu.ops import losses

        cfg_srv, tmp = server_env
        net_cfg = unet.UNetConfig(
            in_channels=1, num_classes=3, depth=2, base_features=4,
            compute_dtype=jnp.float32,
        )
        params, state = unet.init(jax.random.PRNGKey(3), net_cfg)
        save_model(cfg_srv.models_dir, "evig", "unet", net_cfg, params, state)
        stack = (
            np.random.default_rng(11).random((2, 32, 32)) * 900
        ).astype(np.float32)
        stack_path = str(tmp / "ev.tif")
        tiff.write_stack(stack_path, stack)
        srv = ImageServer(cfg_srv)

        seg_out = str(tmp / "seg")
        submit_job(cfg_srv.jobs_dir,
                   {"module": "segmentation_unet2d",
                    "params": {"model": "evig", "patch": [32, 32],
                               "overlap": [0, 0], "localize": False},
                    "input": [stack_path], "output": seg_out})
        assert srv.poll_once()
        pred = tiff.read_stack(
            json.load(open(os.path.join(seg_out, "status.json")))
            ["outputs"]["labels"]
        ).astype(np.int64)

        rng = np.random.default_rng(0)
        results = []
        for tag, garbage in (("a", 0), ("b", 1)):
            truth = pred.copy().astype(np.uint16)
            if garbage:  # corrupt the region about to be ignored
                truth[:, 8:24, 8:24] = rng.integers(0, 3, (2, 16, 16))
            truth[:, 8:24, 8:24] = 255  # the ignored region
            tp = str(tmp / f"truth_{tag}.tif")
            tiff.write_stack(tp, truth)
            out = str(tmp / f"ev_{tag}")
            submit_job(cfg_srv.jobs_dir,
                       {"module": "evaluate_unet2d",
                        "params": {"model": "evig", "patch": [32, 32],
                                   "overlap": [0, 0], "ignore_label": 255},
                        "input": [stack_path, tp], "output": out})
            assert srv.poll_once()
            st = json.load(open(os.path.join(out, "status.json")))
            assert st["state"] == "complete", st.get("error")
            results.append(json.loads(st["outputs"]["metrics"]))
        assert results[0] == results[1]  # garbage under the mask is moot
        # the annotated region here is the predictions themselves
        assert results[0]["miou"] == 1.0
        assert results[0]["pixel_accuracy"] == 1.0
        # host-side masked confusion agrees with the reported metrics
        truth_m = pred.copy()
        truth_m[:, 8:24, 8:24] = 255
        keep = truth_m != 255
        cm = losses.confusion_matrix_np(pred[keep], truth_m[keep], 3)
        ious, _, acc = losses.metrics_from_confusion(cm)
        assert results[0]["miou"] == pytest.approx(
            round(float(np.mean(ious)), 6)
        )
        assert results[0]["pixel_accuracy"] == pytest.approx(round(acc, 6))

        # a WHOLLY-ignored frame scores null in the per-frame series
        # (not a vacuous 1.0) and the whole-stack metrics stay vacuous-
        # consistent when everything is ignored (review fixes)
        truth_all = np.full_like(pred, 255).astype(np.uint16)
        truth_all[0] = pred[0]  # frame 0 annotated, frame 1 not
        tp_all = str(tmp / "truth_half.tif")
        tiff.write_stack(tp_all, truth_all)
        out_h = str(tmp / "ev_half")
        submit_job(cfg_srv.jobs_dir,
                   {"module": "evaluate_unet2d",
                    "params": {"model": "evig", "patch": [32, 32],
                               "overlap": [0, 0], "ignore_label": 255,
                               "per_frame": True},
                    "input": [stack_path, tp_all], "output": out_h})
        assert srv.poll_once()
        st_h = json.load(open(os.path.join(out_h, "status.json")))
        assert st_h["state"] == "complete", st_h.get("error")
        m_h = json.loads(st_h["outputs"]["metrics"])
        assert m_h["per_frame_miou"] == [1.0, None]
        assert m_h["miou"] == 1.0 and m_h["pixel_accuracy"] == 1.0

        # malformed / colliding values fail fast
        for name, val, frag in (("i1", 1, "collides"), ("i2", "x", "int")):
            out = str(tmp / name)
            submit_job(cfg_srv.jobs_dir,
                       {"module": "evaluate_unet2d",
                        "params": {"model": "evig", "ignore_label": val},
                        "input": [stack_path, str(tmp / "truth_a.tif")],
                        "output": out})
            assert srv.poll_once()
            st = json.load(open(os.path.join(out, "status.json")))
            assert st["state"] == "failed" and frag in st["error"]

    def test_evaluate_frame_range_scores_segment(self, server_env):
        """frame_range on evaluate_unet2d scores only that segment against
        the CORRESPONDING truth frames (absolute indexing)."""
        cfg_srv, tmp = server_env
        net_cfg = unet.UNetConfig(
            in_channels=1, num_classes=2, depth=2, base_features=4,
            norm="none", compute_dtype=jnp.float32,
        )
        params, state = unet.init(jax.random.PRNGKey(1), net_cfg)
        save_model(cfg_srv.models_dir, "evfr", "unet", net_cfg, params, state)
        rng = np.random.default_rng(18)
        stack = (rng.random((4, 16, 16)) * 900).astype(np.float32)
        img_p = str(tmp / "ev.tif")
        tiff.write_stack(img_p, stack)
        srv = ImageServer(cfg_srv)
        # truth = the model's own full-stack predictions -> segment eval
        # against it must be perfect iff indexing is absolute
        out_pred = str(tmp / "evpred")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "segmentation_unet2d",
             "params": {"model": "evfr", "patch": [16, 16], "overlap": [0, 0],
                        "localize": False},
             "input": [img_p], "output": out_pred},
            job_id="evpred",
        )
        assert srv.poll_once()
        pred_path = json.load(
            open(os.path.join(out_pred, "status.json"))
        )["outputs"]["labels"]
        out_ev = str(tmp / "evseg")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "evaluate_unet2d",
             "params": {"model": "evfr", "patch": [16, 16], "overlap": [0, 0],
                        "frame_range": [1, 3]},
             "input": [img_p, pred_path], "output": out_ev},
            job_id="evseg",
        )
        assert srv.poll_once()
        st = json.load(open(os.path.join(out_ev, "status.json")))
        assert st["state"] == "complete", st.get("error")
        metrics = json.loads(st["outputs"]["metrics"])
        assert metrics["n_frames"] == 2
        assert metrics["pixel_accuracy"] == 1.0  # absolute truth indexing

    def test_evaluate_shape_mismatch_fails_fast(self, server_env):
        cfg_srv, tmp = server_env
        net_cfg = unet.UNetConfig(
            in_channels=1, num_classes=2, depth=2, base_features=2,
            norm="none", compute_dtype=jnp.float32,
        )
        params, state = unet.init(jax.random.PRNGKey(4), net_cfg)
        save_model(cfg_srv.models_dir, "ev_bad", "unet", net_cfg, params, state)
        a, b = str(tmp / "a.tif"), str(tmp / "b.tif")
        tiff.write_stack(a, np.zeros((2, 16, 16), np.float32))
        tiff.write_stack(b, np.zeros((2, 8, 8), np.uint16))
        out = str(tmp / "ev_bad_out")
        submit_job(cfg_srv.jobs_dir,
                   {"module": "evaluate_unet2d", "params": {"model": "ev_bad"},
                    "input": [a, b], "output": out})
        srv = ImageServer(cfg_srv)
        assert srv.poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "failed" and "shape mismatch" in st["error"]

    def test_evaluate_unet3d_against_own_predictions(self, server_env):
        cfg_srv, tmp = server_env
        net_cfg = unet.UNetConfig(
            in_channels=1, num_classes=2, depth=2, base_features=2,
            dims=3, norm="none", compute_dtype=jnp.float32,
        )
        params, state = unet.init(jax.random.PRNGKey(5), net_cfg)
        save_model(cfg_srv.models_dir, "ev3d", "unet", net_cfg, params, state)
        vol = (np.random.default_rng(6).random((4, 16, 16)) * 900).astype(np.float32)
        vol_path = str(tmp / "ev3.tif")
        tiff.write_stack(vol_path, vol)
        srv = ImageServer(cfg_srv)
        seg_out = str(tmp / "ev3_seg")
        submit_job(cfg_srv.jobs_dir,
                   {"module": "segmentation_unet3d",
                    "params": {"model": "ev3d", "patch": [4, 16, 16],
                               "overlap": [0, 0, 0], "localize": False},
                    "input": [vol_path], "output": seg_out})
        assert srv.poll_once()
        st = json.load(open(os.path.join(seg_out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        ev_out = str(tmp / "ev3_eval")
        submit_job(cfg_srv.jobs_dir,
                   {"module": "evaluate_unet3d",
                    "params": {"model": "ev3d", "patch": [4, 16, 16],
                               "overlap": [0, 0, 0]},
                    "input": [vol_path, st["outputs"]["labels"]],
                    "output": ev_out})
        assert srv.poll_once()
        st2 = json.load(open(os.path.join(ev_out, "status.json")))
        assert st2["state"] == "complete", st2.get("error")
        m = json.loads(st2["outputs"]["metrics"])
        assert m["miou"] == 1.0 and m["voxel_accuracy"] == 1.0

    def test_evaluate_gan_scores_enhancement(self, server_env):
        """evaluate_gan on (raw, raw) targets: PSNR of the untrained
        generator is finite and the metric plumbing works end-to-end."""
        from sequitr_tpu.models import gan as gan_lib

        cfg_srv, tmp = server_env
        gcfg = gan_lib.GANConfig(
            gen_depth=2, gen_base_features=2, disc_layers=2,
            compute_dtype=jnp.float32,
        )
        params, state = gan_lib.init(jax.random.PRNGKey(7), gcfg)
        save_model(cfg_srv.models_dir, "evg", "gan", gcfg, params, state)
        raw = (np.random.default_rng(8).random((2, 16, 16)) * 900).astype(np.float32)
        rp, tp = str(tmp / "evg_raw.tif"), str(tmp / "evg_tgt.tif")
        tiff.write_stack(rp, raw)
        tiff.write_stack(tp, raw * 1.1 + 5.0)
        out = str(tmp / "evg_out")
        submit_job(cfg_srv.jobs_dir,
                   {"module": "evaluate_gan", "params": {"model": "evg"},
                    "input": [rp, tp], "output": out})
        srv = ImageServer(cfg_srv)
        assert srv.poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        m = json.loads(st["outputs"]["metrics"])
        assert m["n_frames"] == 2 and len(m["per_frame_psnr"]) == 2
        assert 0.0 < m["l1"] < 1.0 and np.isfinite(m["psnr"])


    def test_evaluate_multichannel_and_channel_mismatch(self, server_env):
        """Multi-channel evaluation follows the segmentation input
        convention (channels..., labels last); a channel-count mismatch is
        a clear deterministic failure, not garbage metrics (code-review)."""
        cfg_srv, tmp = server_env
        net_cfg = unet.UNetConfig(
            in_channels=2, num_classes=2, depth=2, base_features=2,
            norm="none", compute_dtype=jnp.float32,
        )
        params, state = unet.init(jax.random.PRNGKey(8), net_cfg)
        save_model(cfg_srv.models_dir, "evmc", "unet", net_cfg, params, state)
        rng = np.random.default_rng(10)
        c0 = (rng.random((2, 16, 16)) * 900).astype(np.float32)
        c1 = (rng.random((2, 16, 16)) * 5).astype(np.float32)
        lab = rng.integers(0, 2, (2, 16, 16)).astype(np.uint16)
        p0, p1, pl = (str(tmp / n) for n in ("mc0.tif", "mc1.tif", "mcl.tif"))
        tiff.write_stack(p0, c0)
        tiff.write_stack(p1, c1)
        tiff.write_stack(pl, lab)
        srv = ImageServer(cfg_srv)

        out = str(tmp / "evmc_out")
        submit_job(cfg_srv.jobs_dir,
                   {"module": "evaluate_unet2d",
                    "params": {"model": "evmc", "patch": [16, 16],
                               "overlap": [0, 0]},
                    "input": [p0, p1, pl], "output": out})
        assert srv.poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        m = json.loads(st["outputs"]["metrics"])
        assert 0.0 <= m["miou"] <= 1.0

        # single channel stack against the 2-channel model: fail fast
        out2 = str(tmp / "evmc_bad")
        submit_job(cfg_srv.jobs_dir,
                   {"module": "evaluate_unet2d", "params": {"model": "evmc"},
                    "input": [p0, pl], "output": out2})
        assert srv.poll_once()
        st2 = json.load(open(os.path.join(out2, "status.json")))
        assert st2["state"] == "failed"
        assert "expects 2 channel(s)" in st2["error"]

    def test_evaluate_corrupt_input_fails_fast(self, server_env):
        cfg_srv, tmp = server_env
        net_cfg = unet.UNetConfig(
            in_channels=1, num_classes=2, depth=2, base_features=2,
            norm="none", compute_dtype=jnp.float32,
        )
        params, state = unet.init(jax.random.PRNGKey(9), net_cfg)
        save_model(cfg_srv.models_dir, "evcr", "unet", net_cfg, params, state)
        bad = str(tmp / "corrupt.tif")
        open(bad, "wb").write(b"not a tiff at all")
        out = str(tmp / "evcr_out")
        submit_job(cfg_srv.jobs_dir,
                   {"module": "evaluate_unet2d", "params": {"model": "evcr"},
                    "input": [bad, bad], "output": out})
        srv = ImageServer(cfg_srv)
        import time as _t

        t0 = _t.time()
        assert srv.poll_once()
        elapsed = _t.time() - t0
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "failed" and "cannot read" in st["error"]
        # deterministic: no retry/backoff burn (default backoff is 2s/try)
        assert elapsed < cfg_srv.retry_backoff + 1.0


class TestParityCheckPipeline:
    @pytest.fixture(autouse=True)
    def _needs_torch(self):
        pytest.importorskip("torch")  # not a declared dependency

    def test_parity_check_passes_for_consistent_model(self, server_env):
        """A registered model validates against the torch re-derivation
        through the job API (the migration-confidence check)."""
        cfg_srv, tmp = server_env
        net_cfg = unet.UNetConfig(
            in_channels=1, num_classes=3, depth=2, base_features=4,
            norm="batch", compute_dtype=jnp.float32,
        )
        params, state = unet.init(jax.random.PRNGKey(0), net_cfg)
        save_model(cfg_srv.models_dir, "pc", "unet", net_cfg, params, state)
        out = str(tmp / "pc")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "parity_check",
             "params": {"model": "pc", "spatial": [32, 32], "n_probes": 2},
             "input": [], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        m = json.loads(st["outputs"]["metrics"])
        assert m["max_abs_dlogits"] < 1e-3
        assert m["label_agreement"] > 0.999

    def test_parity_check_gan_model(self, server_env):
        """GAN models validate too: generator AND discriminator vs torch."""
        cfg_srv, tmp = server_env
        g_cfg = gan_lib.GANConfig(
            gen_depth=2, gen_base_features=4, disc_layers=2,
            disc_base_features=4, compute_dtype=jnp.float32,
        )
        params, state = gan_lib.init(jax.random.PRNGKey(2), g_cfg)
        save_model(cfg_srv.models_dir, "pcgan", "gan", g_cfg, params, state)
        out = str(tmp / "pcg")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "parity_check",
             "params": {"model": "pcgan", "spatial": [32, 32],
                        "n_probes": 2},
             "input": [], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        m = json.loads(st["outputs"]["metrics"])
        assert m["max_abs_dgen"] < 1e-3 and m["max_abs_ddisc"] < 1e-3

    def test_parity_check_fails_on_corrupted_weights(self, server_env):
        """A real conversion defect (a flipped transposed-conv kernel —
        the classic convention mistake) must FAIL the check with the
        delta in the error."""
        cfg_srv, tmp = server_env
        net_cfg = unet.UNetConfig(
            in_channels=1, num_classes=2, depth=2, base_features=4,
            norm="none", compute_dtype=jnp.float32,
        )
        params, state = unet.init(jax.random.PRNGKey(1), net_cfg)
        # simulate a bad conversion: flip an up kernel's taps (the classic
        # flip-convention mistake; shape-preserving, so it loads cleanly
        # and only PARITY can catch it)
        bad = jax.tree_util.tree_map(lambda a: a, params)
        w = np.asarray(bad["up"][0]["w"])
        bad["up"][0]["w"] = jnp.asarray(w[::-1, ::-1])
        save_model(cfg_srv.models_dir, "pcbad", "unet", net_cfg, bad, state)
        out = str(tmp / "pcb")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "parity_check",
             "params": {"model": "pcbad", "spatial": [32, 32],
                        "n_probes": 1, "tolerance": 1e-12},
             "input": [], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "failed"
        assert "parity FAILED" in st["error"]

    def test_parity_check_gan_keras_reference(self, server_env):
        pytest.importorskip("tensorflow")
        cfg_srv, tmp = server_env
        g_cfg = gan_lib.GANConfig(
            gen_depth=2, gen_base_features=4, disc_layers=2,
            disc_base_features=4, compute_dtype=jnp.float32,
        )
        params, state = gan_lib.init(jax.random.PRNGKey(3), g_cfg)
        save_model(cfg_srv.models_dir, "pck", "gan", g_cfg, params, state)
        out = str(tmp / "pck")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "parity_check",
             "params": {"model": "pck", "reference": "keras",
                        "spatial": [32, 32], "n_probes": 1},
             "input": [], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")

    def test_bad_params_fail_fast(self, server_env):
        cfg_srv, tmp = server_env
        net_cfg = unet.UNetConfig(
            in_channels=1, num_classes=2, depth=2, base_features=4,
            norm="none", compute_dtype=jnp.float32,
        )
        params, state = unet.init(jax.random.PRNGKey(4), net_cfg)
        save_model(cfg_srv.models_dir, "pcv", "unet", net_cfg, params, state)
        srv = ImageServer(cfg_srv)
        for name, bad in (("p0", {"n_probes": 0}), ("p1", {"spatial": [31, 32]})):
            out = str(tmp / name)
            submit_job(
                cfg_srv.jobs_dir,
                {"module": "parity_check",
                 "params": dict({"model": "pcv"}, **bad),
                 "input": [], "output": out},
                job_id=name,
            )
            assert srv.poll_once()
            st = json.load(open(os.path.join(out, "status.json")))
            assert st["state"] == "failed"
            assert "JobError" in st["error"]
