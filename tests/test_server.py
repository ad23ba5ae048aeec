"""Job-queue + server integration tests (SURVEY.md §4 'Integration').

End-to-end: drop a job JSON + tiny TIFF into the watched dir, assert masks
and HDF5 objects appear with a complete status marker.
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


class TestJobQueue:
    def test_submit_scan_claim(self, server_env):
        cfg, tmp = server_env
        jid = submit_job(
            cfg.jobs_dir, {"module": "m", "input": [], "output": str(tmp / "o")}
        )
        paths = scan_jobs(cfg.jobs_dir)
        assert len(paths) == 1
        job = claim_job(paths[0])
        assert job is not None and job.id == jid and job.module == "m"
        # second claim of the same file fails (atomic rename)
        assert claim_job(paths[0]) is None
        assert scan_jobs(cfg.jobs_dir) == []

    def test_same_millisecond_submits_do_not_collide(self, server_env):
        cfg, tmp = server_env
        ids = {
            submit_job(cfg.jobs_dir, {"module": "m", "input": [], "output": ""})
            for _ in range(5)
        }
        assert len(ids) == 5
        assert len(scan_jobs(cfg.jobs_dir)) == 5

    def test_scan_survives_concurrent_claim(self, server_env, monkeypatch):
        """A job file vanishing between the directory scan and the stat
        (concurrent claimer) must be skipped, not raise into the poll loop."""
        import os as os_mod

        cfg, tmp = server_env
        submit_job(cfg.jobs_dir, {"module": "a", "input": [], "output": ""}, job_id="a")
        submit_job(cfg.jobs_dir, {"module": "b", "input": [], "output": ""}, job_id="b")

        real_scandir = os_mod.scandir

        class VanishingEntry:
            def __init__(self, e, vanish):
                self._e, self._vanish = e, vanish
                self.name, self.path = e.name, e.path

            def stat(self):
                if self._vanish:
                    raise FileNotFoundError(self.path)
                return self._e.stat()

        class ScanDir:
            def __init__(self, path):
                self._it = real_scandir(path)

            def __enter__(self):
                entries = list(self._it)
                return iter(
                    [VanishingEntry(e, i == 0) for i, e in enumerate(entries)]
                )

            def __exit__(self, *a):
                return False

        monkeypatch.setattr(os_mod, "scandir", ScanDir)
        paths = scan_jobs(cfg.jobs_dir)
        assert len(paths) == 1  # the vanished entry skipped, the rest kept

    def test_malformed_priority_quarantined_not_crash(self, server_env):
        """priority: null (or any bad field type) must quarantine the job,
        not kill the poll loop with a TypeError."""
        cfg, tmp = server_env
        import json as json_mod

        p = os.path.join(cfg.jobs_dir, "job_badprio.json")
        with open(p, "w") as f:
            json_mod.dump({"module": "m", "priority": None, "input": 5,
                           "output": ""}, f)
        srv = ImageServer(cfg)
        srv.poll_once()  # must not raise
        assert os.path.exists(p + ".rejected") or not os.path.exists(p)

    def test_non_dict_job_spec_quarantined(self, server_env):
        cfg, tmp = server_env
        p = os.path.join(cfg.jobs_dir, "job_notdict.json")
        with open(p, "w") as f:
            f.write("5")
        ImageServer(cfg).poll_once()
        assert os.path.exists(p + ".rejected")

    def test_missing_model_param_fails_fast(self, server_env):
        import dataclasses as dc

        cfg, tmp = server_env
        cfg = dc.replace(cfg, max_retries=3, retry_backoff=5.0)
        stack_path = str(tmp / "s.tif")
        tiff.write_stack(stack_path, np.zeros((1, 8, 8), np.float32))
        out = str(tmp / "nm")
        submit_job(cfg.jobs_dir,
                   {"module": "segmentation_unet2d", "params": {},
                    "input": [stack_path], "output": out})
        t0 = time.time()
        assert ImageServer(cfg).poll_once()
        assert time.time() - t0 < 4  # JobError: no retries, no backoff
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "failed" and "param 'model'" in st["error"]

    def test_unreadable_input_fails_fast(self, server_env):
        import dataclasses as dc

        cfg, tmp = server_env
        cfg = dc.replace(cfg, max_retries=3, retry_backoff=5.0)
        out = str(tmp / "ni")
        submit_job(cfg.jobs_dir,
                   {"module": "segmentation_unet2d", "params": {"model": "x"},
                    "input": [__file__], "output": out})
        t0 = time.time()
        assert ImageServer(cfg).poll_once()
        assert time.time() - t0 < 4
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "failed" and "cannot read" in st["error"]

    def test_job_missing_module_rejected(self, tmp_path):
        p = str(tmp_path / "job_x.json")
        with open(p, "w") as f:
            json.dump({"params": {}}, f)
        with pytest.raises(JobError):
            Job.from_file(p)

    def test_unknown_pipeline_fails_with_marker(self, server_env):
        cfg, tmp = server_env
        out = str(tmp / "out")
        submit_job(
            cfg.jobs_dir, {"module": "nope", "input": [], "output": out}
        )
        srv = ImageServer(cfg)
        assert srv.poll_once()
        status = json.load(open(os.path.join(out, "status.json")))
        assert status["state"] == "failed"
        assert "unknown pipeline" in status["error"]


class TestSegmentationPipeline:
    def test_end_to_end(self, server_env):
        cfg_srv, tmp = server_env
        net_cfg = unet.UNetConfig(
            in_channels=1, num_classes=3, depth=2, base_features=4,
            compute_dtype=jnp.float32,
        )
        params, state = unet.init(jax.random.PRNGKey(0), net_cfg)
        save_model(cfg_srv.models_dir, "seg2d", "unet", net_cfg, params, state)

        stack = (np.random.default_rng(0).random((2, 32, 32)) * 1000).astype(
            np.float32
        )
        stack_path = str(tmp / "stack.tif")
        tiff.write_stack(stack_path, stack)
        out_dir = str(tmp / "out")
        submit_job(
            cfg_srv.jobs_dir,
            {
                "module": "segmentation_unet2d",
                "params": {"model": "seg2d", "patch": [16, 16], "overlap": [4, 4]},
                "input": [stack_path],
                "output": out_dir,
            },
        )
        assert ImageServer(cfg_srv).poll_once()
        status = json.load(open(os.path.join(out_dir, "status.json")))
        assert status["state"] == "complete", status.get("error")
        labels = tiff.read_stack(status["outputs"]["labels"])
        assert labels.shape == (2, 32, 32)
        import h5py

        with h5py.File(status["outputs"]["objects"]) as f:
            coords = f["objects/obj_type_1/coords"][:]
            assert coords.shape[1] == 5

    def test_save_probs_full_per_class_maps(self, server_env):
        """save_probs stores ALL K softmax planes (frame-major pages), and
        each frame's planes sum to 1 — the reference's label-map contract."""
        cfg_srv, tmp = server_env
        net_cfg = unet.UNetConfig(
            in_channels=1, num_classes=3, depth=2, base_features=4,
            compute_dtype=jnp.float32,
        )
        params, state = unet.init(jax.random.PRNGKey(0), net_cfg)
        save_model(cfg_srv.models_dir, "seg2dp", "unet", net_cfg, params, state)
        stack = (np.random.default_rng(1).random((2, 32, 32)) * 1000).astype(
            np.float32
        )
        stack_path = str(tmp / "stackp.tif")
        tiff.write_stack(stack_path, stack)
        out_dir = str(tmp / "outp")
        submit_job(
            cfg_srv.jobs_dir,
            {
                "module": "segmentation_unet2d",
                "params": {"model": "seg2dp", "patch": [16, 16],
                           "overlap": [4, 4], "save_probs": True,
                           "localize": False},
                "input": [stack_path],
                "output": out_dir,
            },
        )
        assert ImageServer(cfg_srv).poll_once()
        status = json.load(open(os.path.join(out_dir, "status.json")))
        assert status["state"] == "complete", status.get("error")
        probs = tiff.read_stack(status["outputs"]["probs"])
        assert probs.shape == (2 * 3, 32, 32)  # T*K frame-major planes
        assert "frame-major" in status["outputs"]["probs_layout"]
        per_frame = probs.reshape(2, 3, 32, 32)
        np.testing.assert_allclose(per_frame.sum(axis=1), 1.0, atol=1e-4)
        # argmax over the saved planes reproduces the saved label map
        labels = tiff.read_stack(status["outputs"]["labels"])
        assert labels.dtype == np.uint16
        np.testing.assert_array_equal(per_frame.argmax(axis=1), labels)


    def test_compress_output_and_compressed_input(self, server_env):
        """compress_output=true deflates every output stack (same pixels,
        much smaller file, ImageJ-readable Adobe deflate); compressed INPUT
        stacks stream through the lazy reader without a PIL slurp."""
        cfg_srv, tmp = server_env
        net_cfg = unet.UNetConfig(
            in_channels=1, num_classes=3, depth=2, base_features=4,
            compute_dtype=jnp.float32,
        )
        params, state = unet.init(jax.random.PRNGKey(0), net_cfg)
        save_model(cfg_srv.models_dir, "seg2dc", "unet", net_cfg, params, state)
        stack = (np.random.default_rng(2).random((2, 32, 32)) * 1000).astype(
            np.float32
        )
        stack_path = str(tmp / "stackc.tif")
        tiff.write_stack(stack_path, stack, compression="deflate")

        outs = {}
        for name, compress in [("plain", False), ("deflated", True)]:
            out_dir = str(tmp / f"out_{name}")
            submit_job(
                cfg_srv.jobs_dir,
                {
                    "module": "segmentation_unet2d",
                    "params": {"model": "seg2dc", "patch": [16, 16],
                               "overlap": [4, 4], "save_probs": True,
                               "localize": False,
                               "compress_output": compress},
                    "input": [stack_path],
                    "output": out_dir,
                },
            )
            assert ImageServer(cfg_srv).poll_once()
            status = json.load(open(os.path.join(out_dir, "status.json")))
            assert status["state"] == "complete", status.get("error")
            assert not status.get("warnings"), status.get("warnings")
            outs[name] = status["outputs"]

        for key in ("labels", "probs"):
            np.testing.assert_array_equal(
                tiff.read_stack(outs["deflated"][key]),
                tiff.read_stack(outs["plain"][key]),
            )
        # labels are mostly one class here: deflate must shrink them a lot
        assert (
            os.path.getsize(outs["deflated"]["labels"])
            < os.path.getsize(outs["plain"]["labels"]) // 2
        )
        with open(outs["deflated"]["labels"], "rb") as f:
            raw = f.read()
        idx = raw.find((259).to_bytes(2, "little") + (3).to_bytes(2, "little"))
        assert raw[idx + 8 : idx + 10] == (8).to_bytes(2, "little")  # deflate

    def test_tta_param(self, server_env):
        """tta=4 serves (flip-averaged probs, same shapes, param consumed
        without warnings); tta + spatial_parallel is a deterministic
        JobError (the halo graph does not implement it)."""
        cfg_srv, tmp = server_env
        net_cfg = unet.UNetConfig(
            in_channels=1, num_classes=3, depth=2, base_features=4,
            compute_dtype=jnp.float32,
        )
        params, state = unet.init(jax.random.PRNGKey(0), net_cfg)
        save_model(cfg_srv.models_dir, "seg2dt", "unet", net_cfg, params, state)
        stack = (np.random.default_rng(5).random((2, 32, 32)) * 1000).astype(
            np.float32
        )
        stack_path = str(tmp / "stackt.tif")
        tiff.write_stack(stack_path, stack)
        out_dir = str(tmp / "out_tta")
        submit_job(
            cfg_srv.jobs_dir,
            {
                "module": "segmentation_unet2d",
                "params": {"model": "seg2dt", "patch": [16, 16],
                           "overlap": [4, 4], "tta": 4, "localize": False},
                "input": [stack_path],
                "output": out_dir,
            },
        )
        assert ImageServer(cfg_srv).poll_once()
        status = json.load(open(os.path.join(out_dir, "status.json")))
        assert status["state"] == "complete", status.get("error")
        assert not status.get("warnings"), status.get("warnings")
        assert tiff.read_stack(status["outputs"]["labels"]).shape == (2, 32, 32)

        out_dir2 = str(tmp / "out_tta_sp")
        submit_job(
            cfg_srv.jobs_dir,
            {
                "module": "segmentation_unet2d",
                "params": {"model": "seg2dt", "tta": 4,
                           "spatial_parallel": True},
                "input": [stack_path],
                "output": out_dir2,
            },
        )
        assert ImageServer(cfg_srv).poll_once()
        status2 = json.load(open(os.path.join(out_dir2, "status.json")))
        assert status2["state"] == "failed"
        assert "tta is not supported with spatial_parallel" in status2["error"]

        # tta=8 on a non-square frame: deterministic JobError, ONE attempt
        # (not retried with a re-trace per attempt — code-review finding)
        rect = (np.random.default_rng(8).random((1, 16, 32)) * 100).astype(
            np.float32
        )
        rect_path = str(tmp / "rect.tif")
        tiff.write_stack(rect_path, rect)
        out_dir3 = str(tmp / "out_tta8")
        submit_job(
            cfg_srv.jobs_dir,
            {
                "module": "segmentation_unet2d",
                "params": {"model": "seg2dt", "tta": 8},
                "input": [rect_path],
                "output": out_dir3,
            },
        )
        assert ImageServer(cfg_srv).poll_once()
        status3 = json.load(open(os.path.join(out_dir3, "status.json")))
        assert status3["state"] == "failed"
        assert "square" in status3["error"]
        assert status3.get("attempts", 1) == 1

    def test_split_touching_param(self, server_env):
        """split_touching/min_distance reach the localization tail: the job
        completes with the params consumed (no unknown-param warnings) and
        objects.h5 is written. Splitting behavior itself is unit-tested
        (tests/test_misc.py::TestWatershedSplit)."""
        cfg_srv, tmp = server_env
        net_cfg = unet.UNetConfig(
            in_channels=1, num_classes=3, depth=2, base_features=4,
            compute_dtype=jnp.float32,
        )
        params, state = unet.init(jax.random.PRNGKey(0), net_cfg)
        save_model(cfg_srv.models_dir, "seg2dw", "unet", net_cfg, params, state)
        stack = (np.random.default_rng(7).random((2, 32, 32)) * 1000).astype(
            np.float32
        )
        stack_path = str(tmp / "stackw.tif")
        tiff.write_stack(stack_path, stack)
        out_dir = str(tmp / "out_ws")
        submit_job(
            cfg_srv.jobs_dir,
            {
                "module": "segmentation_unet2d",
                "params": {"model": "seg2dw", "patch": [16, 16],
                           "overlap": [4, 4], "split_touching": True,
                           "min_distance": 3},
                "input": [stack_path],
                "output": out_dir,
            },
        )
        assert ImageServer(cfg_srv).poll_once()
        status = json.load(open(os.path.join(out_dir, "status.json")))
        assert status["state"] == "complete", status.get("error")
        assert not status.get("warnings"), status.get("warnings")
        assert os.path.exists(status["outputs"]["objects"])

    def test_save_entropy(self, server_env):
        """save_entropy writes the normalized softmax entropy map in [0,1],
        exactly -sum(p log p)/log K of the saved probs."""
        cfg_srv, tmp = server_env
        net_cfg = unet.UNetConfig(
            in_channels=1, num_classes=3, depth=2, base_features=4,
            compute_dtype=jnp.float32,
        )
        params, state = unet.init(jax.random.PRNGKey(0), net_cfg)
        save_model(cfg_srv.models_dir, "seg2de", "unet", net_cfg, params, state)
        stack = (np.random.default_rng(6).random((2, 32, 32)) * 1000).astype(
            np.float32
        )
        stack_path = str(tmp / "stacke.tif")
        tiff.write_stack(stack_path, stack)
        out_dir = str(tmp / "out_ent")
        submit_job(
            cfg_srv.jobs_dir,
            {
                "module": "segmentation_unet2d",
                "params": {"model": "seg2de", "patch": [16, 16],
                           "overlap": [4, 4], "save_probs": True,
                           "save_entropy": True, "localize": False},
                "input": [stack_path],
                "output": out_dir,
            },
        )
        assert ImageServer(cfg_srv).poll_once()
        status = json.load(open(os.path.join(out_dir, "status.json")))
        assert status["state"] == "complete", status.get("error")
        assert not status.get("warnings"), status.get("warnings")
        ent = tiff.read_stack(status["outputs"]["entropy"])
        assert ent.shape == (2, 32, 32) and ent.dtype == np.float32
        assert float(ent.min()) >= 0.0 and float(ent.max()) <= 1.0 + 1e-6
        probs = tiff.read_stack(status["outputs"]["probs"]).reshape(
            2, 3, 32, 32
        )
        ref = -(probs * np.log(np.maximum(probs, 1e-12))).sum(1) / np.log(3)
        np.testing.assert_allclose(ent, ref, atol=1e-6)

    def test_per_frame_file_sequence_input(self, server_env):
        """input may name a DIRECTORY of per-frame TIFFs (ImageJ-style
        one-file-per-timepoint export): served as one timelapse, identical
        outputs to the same frames in a single stack file."""
        cfg_srv, tmp = server_env
        net_cfg = unet.UNetConfig(
            in_channels=1, num_classes=3, depth=2, base_features=4,
            compute_dtype=jnp.float32,
        )
        params, state = unet.init(jax.random.PRNGKey(0), net_cfg)
        save_model(cfg_srv.models_dir, "seg2ds", "unet", net_cfg, params, state)
        stack = (np.random.default_rng(3).random((3, 32, 32)) * 1000).astype(
            np.float32
        )
        seq_dir = tmp / "frames"
        seq_dir.mkdir()
        for i, frame in enumerate(stack):
            tiff.write_stack(str(seq_dir / f"t{i}.tif"), frame)
        stack_path = str(tmp / "whole.tif")
        tiff.write_stack(stack_path, stack)

        outs = {}
        for name, inp in [("seq", str(seq_dir)), ("stack", stack_path)]:
            out_dir = str(tmp / f"outs_{name}")
            submit_job(
                cfg_srv.jobs_dir,
                {
                    "module": "segmentation_unet2d",
                    "params": {"model": "seg2ds", "patch": [16, 16],
                               "overlap": [4, 4]},
                    "input": [inp],
                    "output": out_dir,
                },
            )
            assert ImageServer(cfg_srv).poll_once()
            status = json.load(open(os.path.join(out_dir, "status.json")))
            assert status["state"] == "complete", status.get("error")
            outs[name] = status["outputs"]
        np.testing.assert_array_equal(
            tiff.read_stack(outs["seq"]["labels"]),
            tiff.read_stack(outs["stack"]["labels"]),
        )

    def test_auto_whole_frame_policy(self):
        """No explicit patch: small frames run whole-frame (rounded to the
        pool multiple, overlap 0); big frames fall back to the grid."""
        from sequitr_tpu.server.server import _WHOLE_FRAME_BUDGET, _tile_config

        tc = _tile_config({}, dims=2, frame_spatial=(1000, 1000), min_multiple=8)
        assert tc.patch == (1000, 1000) and tc.overlap == (0, 0)
        tc = _tile_config({}, dims=2, frame_spatial=(1001, 1000), min_multiple=8)
        assert tc.patch == (1008, 1000)  # inferrer mirror-pads + crops
        # exact_only (GAN path, no auto-pad): rounding needed -> default grid
        tc = _tile_config(
            {}, dims=2, frame_spatial=(1001, 1000), min_multiple=8,
            exact_only=True,
        )
        assert tc.patch == (256, 256)
        # over budget -> default grid
        big = int(np.sqrt(_WHOLE_FRAME_BUDGET)) + 64
        tc = _tile_config({}, dims=2, frame_spatial=(big, big), min_multiple=8)
        assert tc.patch == (256, 256) and tc.overlap == (64, 64)
        # explicit patch always wins
        tc = _tile_config(
            {"patch": [128, 128]}, dims=2, frame_spatial=(512, 512),
            min_multiple=8,
        )
        assert tc.patch == (128, 128)

    def test_inferrer_cache_reused_across_jobs(self, server_env):
        """Two jobs with the same architecture/shape reuse one jitted graph."""
        from sequitr_tpu.pipeline import infer as infer_lib

        cfg_srv, tmp = server_env
        net_cfg = unet.UNetConfig(
            in_channels=1, num_classes=2, depth=2, base_features=2,
            norm="none", compute_dtype=jnp.float32,
        )
        params, state = unet.init(jax.random.PRNGKey(0), net_cfg)
        save_model(cfg_srv.models_dir, "segc", "unet", net_cfg, params, state)
        stack = np.random.default_rng(0).random((1, 16, 16)).astype(np.float32)
        stack_path = str(tmp / "c.tif")
        tiff.write_stack(stack_path, stack)
        srv = ImageServer(cfg_srv)
        infer_lib.cached_frame_inferrer.cache_clear()
        for i in range(2):
            out = str(tmp / f"c{i}")
            submit_job(
                cfg_srv.jobs_dir,
                {"module": "segmentation_unet2d",
                 "params": {"model": "segc", "localize": False},
                 "input": [stack_path], "output": out},
                job_id=f"c{i}",
            )
            assert srv.poll_once()
            st = json.load(open(os.path.join(out, "status.json")))
            assert st["state"] == "complete", st.get("error")
        info = infer_lib.cached_frame_inferrer.cache_info()
        assert info.hits >= 1 and info.misses == 1

    def test_frame_batching_matches_per_frame(self, server_env):
        """Auto frame batching (small frames, one dispatch per chunk) must
        produce identical labels to per-frame streaming."""
        from sequitr_tpu.server.server import _auto_frame_batch

        assert _auto_frame_batch((256, 256)) == 8
        assert _auto_frame_batch((512, 512)) == 3
        assert _auto_frame_batch((1024, 1024)) == 1

        cfg_srv, tmp = server_env
        net_cfg = unet.UNetConfig(
            in_channels=1, num_classes=3, depth=2, base_features=4,
            compute_dtype=jnp.float32,
        )
        params, state = unet.init(jax.random.PRNGKey(0), net_cfg)
        save_model(cfg_srv.models_dir, "segb", "unet", net_cfg, params, state)
        # 5 frames with batch 2 exercises the padded tail chunk
        stack = (np.random.default_rng(3).random((5, 32, 32)) * 900).astype(
            np.float32
        )
        stack_path = str(tmp / "b.tif")
        tiff.write_stack(stack_path, stack)
        srv = ImageServer(cfg_srv)
        outs = {}
        for name, fb in (("batched", 2), ("single", 1)):
            out = str(tmp / name)
            submit_job(
                cfg_srv.jobs_dir,
                {"module": "segmentation_unet2d",
                 "params": {"model": "segb", "localize": False,
                            "frame_batch": fb},
                 "input": [stack_path], "output": out},
                job_id=name,
            )
            assert srv.poll_once()
            st = json.load(open(os.path.join(out, "status.json")))
            assert st["state"] == "complete", st.get("error")
            outs[name] = tiff.read_stack(st["outputs"]["labels"])
        np.testing.assert_array_equal(outs["batched"], outs["single"])
        assert outs["batched"].shape == (5, 32, 32)

    def test_frame_smaller_than_patch_autopads(self, server_env):
        """A 20x28 FOV serves under a 32^2 patch (reflect-pad + crop)."""
        cfg_srv, tmp = server_env
        net_cfg = unet.UNetConfig(
            in_channels=1, num_classes=3, depth=2, base_features=4,
            compute_dtype=jnp.float32,
        )
        params, state = unet.init(jax.random.PRNGKey(0), net_cfg)
        save_model(cfg_srv.models_dir, "seg_small", "unet", net_cfg, params, state)
        stack = (np.random.default_rng(2).random((2, 20, 28)) * 800).astype(
            np.float32
        )
        stack_path = str(tmp / "small.tif")
        tiff.write_stack(stack_path, stack)
        out_dir = str(tmp / "outsmall")
        submit_job(
            cfg_srv.jobs_dir,
            {
                "module": "segmentation_unet2d",
                "params": {"model": "seg_small", "patch": [32, 32],
                           "overlap": [8, 8], "localize": False},
                "input": [stack_path],
                "output": out_dir,
            },
        )
        assert ImageServer(cfg_srv).poll_once()
        status = json.load(open(os.path.join(out_dir, "status.json")))
        assert status["state"] == "complete", status.get("error")
        labels = tiff.read_stack(status["outputs"]["labels"])
        assert labels.shape == (2, 20, 28)


class TestUnknownParamWarnings:
    def _run(self, tmp_path, params, reads=("threshold",)):
        cfg = ServerConfiguration(
            jobs_dir=str(tmp_path / "jobs"), models_dir=str(tmp_path / "m")
        )
        cfg.ensure_dirs()
        out = tmp_path / "out"
        reg = server_mod.PipelineRegistry()

        @reg.register("probe")
        def _probe(job, config):
            for k in reads:
                job.params.get(k)
            return {}

        submit_job(
            cfg.jobs_dir,
            {"module": "probe", "params": params, "output": str(out)},
            job_id="p1",
        )
        srv = ImageServer(cfg, reg)
        assert srv.poll_once()
        return json.loads((out / "status.json").read_text())

    def test_misspelled_param_surfaces_as_warning(self, tmp_path):
        """A param the pipeline never reads ('treshold') would previously
        run silently with defaults; it now lands in status warnings."""
        st = self._run(tmp_path, {"threshold": 5, "treshold": 9})
        assert st["state"] == "complete"
        assert len(st["warnings"]) == 1
        assert "treshold" in st["warnings"][0]
        assert "misspelled" in st["warnings"][0]

    def test_fully_read_params_produce_no_warnings(self, tmp_path):
        st = self._run(tmp_path, {"threshold": 5})
        assert st["state"] == "complete"
        assert "warnings" not in st

    def test_no_untracked_param_copies_in_pipelines(self):
        """dict(job.params) bypasses ParamTracker's overridden methods at
        the C level (unlike .copy()), silently producing false 'misspelled
        param' warnings for every key read through the copy — forbid the
        pattern in the pipeline source."""
        import inspect

        src = inspect.getsource(server_mod)
        assert "dict(job.params)" not in src, (
            "use job.params.copy() (tracking-aware) instead of "
            "dict(job.params)"
        )

    def test_whole_dict_access_disables_warnings(self, tmp_path):
        """A pipeline that copies/iterates its params conservatively marks
        everything read — no false warnings."""
        cfg = ServerConfiguration(
            jobs_dir=str(tmp_path / "jobs"), models_dir=str(tmp_path / "m")
        )
        cfg.ensure_dirs()
        out = tmp_path / "out"
        reg = server_mod.PipelineRegistry()

        @reg.register("copier")
        def _copier(job, config):
            p = job.params.copy()
            p.get("anything")
            return {}

        submit_job(
            cfg.jobs_dir,
            {"module": "copier", "params": {"x": 1, "y": 2},
             "output": str(out)},
            job_id="c1",
        )
        assert ImageServer(cfg, reg).poll_once()
        st = json.loads((out / "status.json").read_text())
        assert st["state"] == "complete" and "warnings" not in st


class TestJobRobustness:
    def test_watchdog_times_out_wedged_job(self, server_env):
        """A wedged job fails after job_timeout with a .failed marker and
        the queue keeps moving (VERDICT r1 weak #5)."""
        import dataclasses as dc

        from sequitr_tpu.server.server import PipelineRegistry

        cfg_srv, tmp = server_env
        cfg_srv = dc.replace(cfg_srv, job_timeout=0.5, max_retries=2)
        reg = PipelineRegistry()

        @reg.register("sleepy")
        def sleepy(job, config):
            import time as time_mod

            time_mod.sleep(30)

        @reg.register("quick")
        def quick(job, config):
            return {"ok": "1"}

        srv = ImageServer(cfg_srv, registry=reg)
        out1, out2 = str(tmp / "o1"), str(tmp / "o2")
        submit_job(cfg_srv.jobs_dir,
                   {"module": "sleepy", "input": [], "output": out1},
                   job_id="a")
        submit_job(cfg_srv.jobs_dir,
                   {"module": "quick", "input": [], "output": out2},
                   job_id="b")
        t0 = time.time()
        assert srv.poll_once()  # sleepy: times out, no retry
        assert time.time() - t0 < 5  # not 30s, not retried 3x
        st = json.load(open(os.path.join(out1, "status.json")))
        assert st["state"] == "failed" and "job_timeout" in st["error"]
        assert os.path.exists(
            os.path.join(cfg_srv.jobs_dir, "job_a.running.failed")
        )
        # queue advances to the next job
        assert srv.poll_once()
        st2 = json.load(open(os.path.join(out2, "status.json")))
        assert st2["state"] == "complete"

    def test_watchdog_recycles_worker_under_supervisor(
        self, server_env, monkeypatch
    ):
        """With a supervisor to respawn it, a timed-out worker self-exits
        (EXIT_RECYCLE) AFTER writing the failure marker, so the abandoned
        thread's chip is actually freed (round-2 verdict weak #6)."""
        import dataclasses as dc

        from sequitr_tpu.server import server as srv_lib
        from sequitr_tpu.server.server import PipelineRegistry

        cfg_srv, tmp = server_env
        cfg_srv = dc.replace(cfg_srv, job_timeout=0.5)
        reg = PipelineRegistry()

        @reg.register("sleepy")
        def sleepy(job, config):
            import time as time_mod

            time_mod.sleep(30)

        exits = []
        monkeypatch.setattr(
            srv_lib.os, "_exit", lambda code: exits.append(code)
        )
        monkeypatch.setenv("SEQUITR_WORKER_ID", "0")
        out = str(tmp / "ow")
        submit_job(cfg_srv.jobs_dir,
                   {"module": "sleepy", "input": [], "output": out},
                   job_id="w")
        ImageServer(cfg_srv, registry=reg).poll_once()
        assert exits == [srv_lib.EXIT_RECYCLE]
        # the failure marker landed BEFORE the exit
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "failed" and "job_timeout" in st["error"]
        # without a supervisor (env unset, config auto) the server must NOT
        # kill itself over one bad job
        monkeypatch.delenv("SEQUITR_WORKER_ID")
        exits.clear()
        submit_job(cfg_srv.jobs_dir,
                   {"module": "sleepy", "input": [],
                    "output": str(tmp / "ow2")},
                   job_id="w2")
        ImageServer(cfg_srv, registry=reg).poll_once()
        assert exits == []

    def test_supervisor_respawns_recycled_worker_without_budget(
        self, monkeypatch, tmp_path
    ):
        """Exit code EXIT_RECYCLE respawns the worker and does not charge
        the crash-restart budget (a long-lived server may recycle often)."""
        from sequitr_tpu import __main__ as cli
        from sequitr_tpu.server.server import EXIT_RECYCLE

        spawned = []

        class FakeProc:
            def __init__(self, codes):
                self.codes = list(codes)

            def poll(self):
                return self.codes.pop(0) if self.codes else None

            def terminate(self):
                pass

            def wait(self):
                pass

        def fake_popen(cmd, env=None):
            # first spawn recycles 4x in a row (over the crash budget of
            # 3); later spawns stay alive
            codes = [EXIT_RECYCLE] if len(spawned) < 4 else []
            p = FakeProc(codes)
            spawned.append(p)
            return p

        ticks = {"n": 0}

        def fake_sleep(_):
            ticks["n"] += 1
            if ticks["n"] > 8:
                raise KeyboardInterrupt

        import subprocess as sp_mod

        monkeypatch.setattr(sp_mod, "Popen", fake_popen)
        import types

        args = types.SimpleNamespace(
            jobs_dir=str(tmp_path / "jobs"), models_dir=str(tmp_path / "m"),
            poll_interval=0.1, config=None, pin_env=None, workers=1,
        )
        import time as time_mod

        monkeypatch.setattr(time_mod, "sleep", fake_sleep)
        assert cli._serve_workers(args) == 0
        # 1 initial + 4 recycles = 5 spawns; budget (3) never tripped
        assert len(spawned) == 5

    def test_deterministic_joberror_does_not_retry(self, server_env):
        """JobError (bad inputs) fails fast instead of burning retries."""
        import dataclasses as dc

        cfg_srv, tmp = server_env
        cfg_srv = dc.replace(cfg_srv, max_retries=3, retry_backoff=5.0)
        out = str(tmp / "o")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "segmentation_unet2d", "params": {"model": "x"},
             "input": ["/nonexistent.tif"], "output": out},
        )
        t0 = time.time()
        assert ImageServer(cfg_srv).poll_once()
        # would be >= 3 * 5s of backoff if retried
        assert time.time() - t0 < 4
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "failed" and "input not found" in st["error"]

    def test_profile_option_writes_trace(self, server_env):
        """params.profile: true captures a jax profiler trace per job."""
        from sequitr_tpu.server.server import PipelineRegistry

        cfg_srv, tmp = server_env
        reg = PipelineRegistry()

        @reg.register("tiny")
        def tiny(job, config):
            import jax.numpy as jnp

            return {"sum": str(float(jnp.arange(8.0).sum()))}

        out = str(tmp / "prof")
        submit_job(cfg_srv.jobs_dir,
                   {"module": "tiny", "params": {"profile": True},
                    "input": [], "output": out}, job_id="p")
        assert ImageServer(cfg_srv, registry=reg).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        pdir = st["outputs"]["profile"]
        assert os.path.isdir(pdir)
        # a trace actually landed (plugins/profile/... files)
        found = [f for _, _, fs in os.walk(pdir) for f in fs]
        assert found, "profiler trace directory is empty"

    def test_priority_ordering(self, server_env):
        """Higher-priority jobs claim first; ties run oldest-first."""
        cfg, tmp = server_env
        submit_job(cfg.jobs_dir, {"module": "m", "input": [], "output": ""},
                   job_id="old_low")
        submit_job(cfg.jobs_dir,
                   {"module": "m", "priority": 5, "input": [], "output": ""},
                   job_id="urgent")
        submit_job(cfg.jobs_dir, {"module": "m", "input": [], "output": ""},
                   job_id="new_low")
        order = [claim_job(p).id for p in scan_jobs(cfg.jobs_dir)]
        assert order == ["urgent", "old_low", "new_low"]

    def test_func_dispatch(self, server_env):
        """func names a registered sub-operation; unknown funcs fail with a
        deterministic error listing what exists (SURVEY.md job schema)."""
        from sequitr_tpu.server.server import PipelineRegistry

        cfg_srv, tmp = server_env
        reg = PipelineRegistry()

        @reg.register("mymod")
        def run_fn(job, config):
            return {"via": "run"}

        @reg.register("mymod", func="stats")
        def stats_fn(job, config):
            return {"via": "stats"}

        srv = ImageServer(cfg_srv, registry=reg)
        outs = [str(tmp / f"f{i}") for i in range(3)]
        submit_job(cfg_srv.jobs_dir,
                   {"module": "mymod", "input": [], "output": outs[0]},
                   job_id="r")
        submit_job(cfg_srv.jobs_dir,
                   {"module": "mymod", "func": "stats", "input": [],
                    "output": outs[1]}, job_id="s")
        submit_job(cfg_srv.jobs_dir,
                   {"module": "mymod", "func": "nope", "input": [],
                    "output": outs[2]}, job_id="n")
        for _ in range(3):
            assert srv.poll_once()
        st0 = json.load(open(os.path.join(outs[0], "status.json")))
        st1 = json.load(open(os.path.join(outs[1], "status.json")))
        st2 = json.load(open(os.path.join(outs[2], "status.json")))
        assert st0["outputs"]["via"] == "run"
        assert st1["outputs"]["via"] == "stats"
        assert st2["state"] == "failed" and "no func 'nope'" in st2["error"]


class TestGANPipeline:
    def test_end_to_end(self, server_env):
        cfg_srv, tmp = server_env
        g_cfg = gan_lib.GANConfig(
            gen_depth=2, gen_base_features=4, disc_layers=2, disc_base_features=4,
            compute_dtype=jnp.float32,
        )
        params, state = gan_lib.init(jax.random.PRNGKey(0), g_cfg)
        save_model(cfg_srv.models_dir, "enh", "gan", g_cfg, params, state)

        stack = (np.random.default_rng(1).random((1, 32, 32)) * 500).astype(np.float32)
        stack_path = str(tmp / "s.tif")
        tiff.write_stack(stack_path, stack)
        out_dir = str(tmp / "out")
        submit_job(
            cfg_srv.jobs_dir,
            {
                "module": "enhancement_gan",
                "params": {"model": "enh", "patch": [16, 16], "overlap": [4, 4]},
                "input": [stack_path],
                "output": out_dir,
            },
        )
        assert ImageServer(cfg_srv).poll_once()
        status = json.load(open(os.path.join(out_dir, "status.json")))
        assert status["state"] == "complete", status.get("error")
        enhanced = tiff.read_stack(status["outputs"]["enhanced"])
        assert enhanced.shape == (32, 32)
        assert np.abs(enhanced).max() <= 1.0 + 1e-5
        # streamed path reports phase-timer metrics (fetch + throughput)
        metrics = json.loads(status["outputs"]["metrics"])
        assert {"fetch_s", "total_s", "frames_per_sec"} <= set(metrics)

    def test_gan_frame_batching_matches_per_frame(self, server_env):
        cfg_srv, tmp = server_env
        g_cfg = gan_lib.GANConfig(
            gen_depth=2, gen_base_features=4, disc_layers=2, disc_base_features=4,
            compute_dtype=jnp.float32,
        )
        params, state = gan_lib.init(jax.random.PRNGKey(0), g_cfg)
        save_model(cfg_srv.models_dir, "enhb", "gan", g_cfg, params, state)
        stack = (np.random.default_rng(2).random((3, 32, 32)) * 500).astype(
            np.float32
        )
        stack_path = str(tmp / "sb.tif")
        tiff.write_stack(stack_path, stack)
        srv = ImageServer(cfg_srv)
        outs = {}
        for name, fb in (("b2", 2), ("b1", 1)):
            out = str(tmp / name)
            submit_job(
                cfg_srv.jobs_dir,
                {"module": "enhancement_gan",
                 "params": {"model": "enhb", "patch": [16, 16],
                            "overlap": [4, 4], "frame_batch": fb},
                 "input": [stack_path], "output": out},
                job_id=name,
            )
            assert srv.poll_once()
            st = json.load(open(os.path.join(out, "status.json")))
            assert st["state"] == "complete", st.get("error")
            outs[name] = tiff.read_stack(st["outputs"]["enhanced"])
        np.testing.assert_array_equal(outs["b2"], outs["b1"])
        assert outs["b2"].shape == (3, 32, 32)


class TestStreamingServing:
    """Round-3 constant-memory serving: disk -> host -> HBM -> disk with
    bounded buffers; a stack larger than any in-RAM budget must serve."""

    def test_bounded_memory_and_identical_output(self, server_env):
        import tracemalloc

        from sequitr_tpu.pipeline import infer as infer_lib

        cfg_srv, tmp = server_env
        net_cfg = unet.UNetConfig(
            in_channels=1, num_classes=3, depth=2, base_features=4,
            compute_dtype=jnp.float32,
        )
        params, state = unet.init(jax.random.PRNGKey(0), net_cfg)
        save_model(cfg_srv.models_dir, "segm", "unet", net_cfg, params, state)
        stack = (np.random.default_rng(7).random((96, 64, 64)) * 900).astype(
            np.float32
        )
        stack_bytes = stack.nbytes  # 1.5 MB
        stack_path = str(tmp / "big.tif")
        tiff.write_stack(stack_path, stack)
        srv = ImageServer(cfg_srv)

        def serve(name):
            out = str(tmp / name)
            submit_job(
                cfg_srv.jobs_dir,
                {"module": "segmentation_unet2d",
                 "params": {"model": "segm", "patch": [16, 16],
                            "overlap": [4, 4], "save_probs": True},
                 "input": [stack_path], "output": out},
                job_id=name,
            )
            assert srv.poll_once()
            st = json.load(open(os.path.join(out, "status.json")))
            assert st["state"] == "complete", st.get("error")
            return st

        serve("warm")  # jit + caches populated outside the measurement
        tracemalloc.start()
        st = serve("cold")
        _, peak = tracemalloc.get_traced_memory()
        tracemalloc.stop()
        # bounded buffers: peak host allocations stay O(frames in flight) +
        # O(detected objects), NOT O(stack). For this workload the buffered
        # design held stack + labels + all probs + per-object dataclasses
        # (measured 21 MB for the objects alone); streaming with compact
        # tables measured 3.9 MB, dominated by the ~57k-object table that
        # IS the h5 output. Assert well under the buffered footprint and
        # under probs-output size (4.7 MB), the smallest O(stack) buffer.
        assert peak < 3 * stack_bytes, f"peak {peak} vs stack {stack_bytes}"

        # outputs are identical to direct per-frame inference
        tc = infer_lib.TileConfig(
            patch=(16, 16), overlap=(4, 4), labels_dtype="uint16"
        )
        fn = infer_lib.cached_frame_inferrer(net_cfg, tc, (64, 64))
        expected = np.stack(
            [np.asarray(fn(params, state, f)[1]) for f in stack]
        )
        labels = tiff.read_stack(st["outputs"]["labels"])
        np.testing.assert_array_equal(labels, expected)
        # probs pages appended frame-major, same contract as the buffered path
        probs = tiff.read_stack(st["outputs"]["probs"])
        assert probs.shape == (96 * 3, 64, 64)
        np.testing.assert_array_equal(
            probs.reshape(96, 3, 64, 64).argmax(axis=1), expected
        )
        # localization ran on the streamed frames
        assert os.path.exists(st["outputs"]["objects"])

    def test_frame_range_serves_segment(self, server_env):
        """frame_range: [start, stop) serves exactly that segment of the
        stack (lazy readers skip the rest), matching a full serve's
        corresponding frames; bad ranges fail fast."""
        cfg_srv, tmp = server_env
        net_cfg = unet.UNetConfig(
            in_channels=1, num_classes=3, depth=2, base_features=4,
            compute_dtype=jnp.float32,
        )
        params, state = unet.init(jax.random.PRNGKey(0), net_cfg)
        save_model(cfg_srv.models_dir, "segfr", "unet", net_cfg, params, state)
        stack = (np.random.default_rng(17).random((6, 32, 32)) * 900).astype(
            np.float32
        )
        stack_path = str(tmp / "fr.tif")
        tiff.write_stack(stack_path, stack)
        srv = ImageServer(cfg_srv)

        def serve(name, extra):
            out = str(tmp / name)
            submit_job(
                cfg_srv.jobs_dir,
                {"module": "segmentation_unet2d",
                 "params": dict({"model": "segfr", "patch": [16, 16],
                                 "overlap": [4, 4], "localize": False},
                                **extra),
                 "input": [stack_path], "output": out},
                job_id=name,
            )
            assert srv.poll_once()
            return json.load(open(os.path.join(out, "status.json")))

        full = serve("frfull", {})
        seg = serve("frseg", {"frame_range": [2, 5], "localize": True})
        assert seg["state"] == "complete", seg.get("error")
        labels_full = tiff.read_stack(full["outputs"]["labels"])
        labels_seg = tiff.read_stack(seg["outputs"]["labels"])
        assert labels_seg.shape == (3, 32, 32)
        np.testing.assert_array_equal(labels_seg, labels_full[2:5])
        # localizations keep ABSOLUTE frame indices so segments splice
        # back into full-timelapse tracks
        import h5py

        with h5py.File(seg["outputs"]["objects"]) as f:
            coords = f["objects/obj_type_1/coords"][:]
            fmap = f["objects/obj_type_1/map"][:]
        if len(coords):
            ts = np.unique(coords[:, 0].astype(int))
            assert ts.min() >= 2 and ts.max() <= 4, ts
        assert fmap.shape[0] == 5  # map rows cover frames 0..4
        bad = serve("frbad", {"frame_range": [4, 99]})
        assert bad["state"] == "failed" and "out of bounds" in bad["error"]
        bad2 = serve("frbad2", {"frame_range": {"start": 1}})
        assert bad2["state"] == "failed" and "frame_range" in bad2["error"]

    def test_uint16_stack_serves_identically(self, server_env):
        """A uint16 stack (the native microscopy dtype, shipped 2-byte to
        the device) produces EXACTLY the labels of the same values served
        as float32 — the on-device cast is lossless for 16-bit data."""
        cfg_srv, tmp = server_env
        net_cfg = unet.UNetConfig(
            in_channels=1, num_classes=3, depth=2, base_features=4,
            compute_dtype=jnp.float32,
        )
        params, state = unet.init(jax.random.PRNGKey(0), net_cfg)
        save_model(cfg_srv.models_dir, "segu", "unet", net_cfg, params, state)
        vals = (np.random.default_rng(15).random((3, 32, 32)) * 60000).astype(
            np.uint16
        )
        p16 = str(tmp / "u16.tif")
        p32 = str(tmp / "f32.tif")
        tiff.write_stack(p16, vals)
        tiff.write_stack(p32, vals.astype(np.float32))
        srv = ImageServer(cfg_srv)
        outs = {}
        for name, path in (("u16", p16), ("f32", p32)):
            out = str(tmp / f"u_{name}")
            submit_job(
                cfg_srv.jobs_dir,
                {"module": "segmentation_unet2d",
                 "params": {"model": "segu", "patch": [16, 16],
                            "overlap": [4, 4], "localize": False},
                 "input": [path], "output": out},
                job_id=f"u{name}",
            )
            assert srv.poll_once()
            st = json.load(open(os.path.join(out, "status.json")))
            assert st["state"] == "complete", st.get("error")
            outs[name] = tiff.read_stack(st["outputs"]["labels"])
        np.testing.assert_array_equal(outs["u16"], outs["f32"])

    def test_probs_dtype_float16(self, server_env):
        """probs_dtype: float16 halves the probs wire/disk size; labels are
        unaffected (argmax runs on the f32 maps before the cast)."""
        cfg_srv, tmp = server_env
        net_cfg = unet.UNetConfig(
            in_channels=1, num_classes=3, depth=2, base_features=4,
            compute_dtype=jnp.float32,
        )
        params, state = unet.init(jax.random.PRNGKey(0), net_cfg)
        save_model(cfg_srv.models_dir, "segh", "unet", net_cfg, params, state)
        stack = (np.random.default_rng(11).random((2, 32, 32)) * 900).astype(
            np.float32
        )
        stack_path = str(tmp / "h.tif")
        tiff.write_stack(stack_path, stack)
        srv = ImageServer(cfg_srv)
        outs = {}
        for name, dt in (("h32", "float32"), ("h16", "float16")):
            out = str(tmp / name)
            submit_job(
                cfg_srv.jobs_dir,
                {"module": "segmentation_unet2d",
                 "params": {"model": "segh", "patch": [16, 16],
                            "overlap": [4, 4], "save_probs": True,
                            "localize": False, "probs_dtype": dt},
                 "input": [stack_path], "output": out},
                job_id=name,
            )
            assert srv.poll_once()
            st = json.load(open(os.path.join(out, "status.json")))
            assert st["state"] == "complete", st.get("error")
            outs[name] = st
        p32 = tiff.read_stack(outs["h32"]["outputs"]["probs"])
        p16 = tiff.read_stack(outs["h16"]["outputs"]["probs"])
        assert p32.dtype == np.float32 and p16.dtype == np.float16
        np.testing.assert_allclose(
            p16.astype(np.float32), p32, atol=1e-3
        )
        # f16 pages are half the bytes on disk
        s32 = os.path.getsize(outs["h32"]["outputs"]["probs"])
        s16 = os.path.getsize(outs["h16"]["outputs"]["probs"])
        assert s16 < 0.6 * s32
        # labels identical across dtypes
        np.testing.assert_array_equal(
            tiff.read_stack(outs["h32"]["outputs"]["labels"]),
            tiff.read_stack(outs["h16"]["outputs"]["labels"]),
        )
        # a bogus dtype is a deterministic JobError
        out = str(tmp / "hbad")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "segmentation_unet2d",
             "params": {"model": "segh", "probs_dtype": "float8",
                        "localize": False},
             "input": [stack_path], "output": out},
        )
        assert srv.poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "failed" and "probs_dtype" in st["error"]

    def test_model_cache_reuse_and_invalidation(self, server_env):
        """A warm server reuses the loaded model across jobs (no per-job
        orbax restore); re-registering the model invalidates the entry."""
        import time as time_lib

        from sequitr_tpu.server import server as srv_lib

        cfg_srv, tmp = server_env
        net_cfg = unet.UNetConfig(
            in_channels=1, num_classes=2, depth=2, base_features=2,
            norm="none", compute_dtype=jnp.float32,
        )
        params, state = unet.init(jax.random.PRNGKey(0), net_cfg)
        save_model(cfg_srv.models_dir, "mc", "unet", net_cfg, params, state)
        srv_lib._MODEL_CACHE.clear()
        first = srv_lib.load_model_cached(cfg_srv.models_dir, "mc")
        second = srv_lib.load_model_cached(cfg_srv.models_dir, "mc")
        assert second is first  # cache hit, same loaded object
        # re-register with different weights -> stale entry must reload
        time_lib.sleep(0.01)  # ensure a distinct mtime_ns stamp
        params2, state2 = unet.init(jax.random.PRNGKey(1), net_cfg)
        save_model(cfg_srv.models_dir, "mc", "unet", net_cfg, params2, state2)
        third = srv_lib.load_model_cached(cfg_srv.models_dir, "mc")
        assert third is not first
        leaf = jax.tree_util.tree_leaves(third[2])[0]
        leaf2 = jax.tree_util.tree_leaves(params2)[0]
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(leaf2))

    def test_gan_enhancer_cache_reused_across_jobs(self, server_env):
        """Warm-server second GAN job must not retrace (round-2 weak #1)."""
        from sequitr_tpu.pipeline import infer as infer_lib

        cfg_srv, tmp = server_env
        g_cfg = gan_lib.GANConfig(
            gen_depth=2, gen_base_features=4, disc_layers=2,
            disc_base_features=4, compute_dtype=jnp.float32,
        )
        params, state = gan_lib.init(jax.random.PRNGKey(0), g_cfg)
        save_model(cfg_srv.models_dir, "enhc", "gan", g_cfg, params, state)
        stack = (np.random.default_rng(3).random((2, 32, 32)) * 500).astype(
            np.float32
        )
        stack_path = str(tmp / "gc.tif")
        tiff.write_stack(stack_path, stack)
        srv = ImageServer(cfg_srv)
        infer_lib.cached_gan_enhancer.cache_clear()
        for i in range(2):
            out = str(tmp / f"gc{i}")
            submit_job(
                cfg_srv.jobs_dir,
                {"module": "enhancement_gan",
                 "params": {"model": "enhc", "patch": [16, 16],
                            "overlap": [4, 4]},
                 "input": [stack_path], "output": out},
                job_id=f"gc{i}",
            )
            assert srv.poll_once()
            st = json.load(open(os.path.join(out, "status.json")))
            assert st["state"] == "complete", st.get("error")
        info = infer_lib.cached_gan_enhancer.cache_info()
        assert info.hits >= 1 and info.misses == 1

    def test_gan_out_dtype_float16(self, server_env):
        """out_dtype: float16 halves the enhanced-frame D2H + disk while
        staying numerically close to the float32 run."""
        cfg_srv, tmp = server_env
        g_cfg = gan_lib.GANConfig(
            gen_depth=2, gen_base_features=4, disc_layers=2,
            disc_base_features=4, compute_dtype=jnp.float32,
        )
        params, state = gan_lib.init(jax.random.PRNGKey(9), g_cfg)
        save_model(cfg_srv.models_dir, "enh16", "gan", g_cfg, params, state)
        stack = (np.random.default_rng(16).random((2, 32, 32)) * 500).astype(
            np.float32
        )
        stack_path = str(tmp / "e16.tif")
        tiff.write_stack(stack_path, stack)
        srv = ImageServer(cfg_srv)
        outs = {}
        for name, dt in (("e32", "float32"), ("e16", "float16")):
            out = str(tmp / name)
            submit_job(
                cfg_srv.jobs_dir,
                {"module": "enhancement_gan",
                 "params": {"model": "enh16", "patch": [16, 16],
                            "overlap": [4, 4], "out_dtype": dt},
                 "input": [stack_path], "output": out},
                job_id=name,
            )
            assert srv.poll_once()
            st = json.load(open(os.path.join(out, "status.json")))
            assert st["state"] == "complete", st.get("error")
            outs[name] = tiff.read_stack(st["outputs"]["enhanced"])
        assert outs["e32"].dtype == np.float32
        assert outs["e16"].dtype == np.float16
        np.testing.assert_allclose(
            outs["e16"].astype(np.float32), outs["e32"], atol=1e-3
        )

    def test_gan_output_is_atomic_on_failure(self, server_env):
        """A mid-stream failure must not leave a partial enhanced.tif."""
        cfg_srv, tmp = server_env
        g_cfg = gan_lib.GANConfig(
            gen_depth=2, gen_base_features=4, disc_layers=2,
            disc_base_features=4, compute_dtype=jnp.float32,
        )
        params, state = gan_lib.init(jax.random.PRNGKey(0), g_cfg)
        save_model(cfg_srv.models_dir, "enha", "gan", g_cfg, params, state)
        # a 2-channel submission against the 1-channel model fails fast
        stack = (np.random.default_rng(4).random((2, 32, 32)) * 500).astype(
            np.float32
        )
        p0, p1 = str(tmp / "a0.tif"), str(tmp / "a1.tif")
        tiff.write_stack(p0, stack)
        tiff.write_stack(p1, stack)
        out = str(tmp / "ga")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "enhancement_gan",
             "params": {"model": "enha", "patch": [16, 16], "overlap": [4, 4]},
             "input": [p0, p1], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "failed"
        assert "expects 1 channel(s)" in st["error"]
        assert not os.path.exists(os.path.join(out, "enhanced.tif"))
        assert not os.path.exists(os.path.join(out, "enhanced.tif.tmp"))


class TestMultiChannelGAN:
    def test_two_channel_gan_end_to_end(self, server_env):
        """A 2-fluorophore enhancement model serves from two channel stacks
        (round-2 verdict missing #4: this used to die with a conv shape
        error deep inside the generator)."""
        cfg_srv, tmp = server_env
        g_cfg = gan_lib.GANConfig(
            in_channels=2, gen_depth=2, gen_base_features=4, disc_layers=2,
            disc_base_features=4, compute_dtype=jnp.float32,
        )
        params, state = gan_lib.init(jax.random.PRNGKey(0), g_cfg)
        save_model(cfg_srv.models_dir, "enh2c", "gan", g_cfg, params, state)
        rng = np.random.default_rng(5)
        c0 = (rng.random((2, 32, 32)) * 500).astype(np.float32)
        c1 = (rng.random((2, 32, 32)) * 900).astype(np.float32)
        p0, p1 = str(tmp / "c0.tif"), str(tmp / "c1.tif")
        tiff.write_stack(p0, c0)
        tiff.write_stack(p1, c1)
        out = str(tmp / "g2c")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "enhancement_gan",
             "params": {"model": "enh2c", "patch": [16, 16], "overlap": [4, 4]},
             "input": [p0, p1], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        enhanced = tiff.read_stack(st["outputs"]["enhanced"])
        assert enhanced.shape == (2, 32, 32)

    def test_evaluate_gan_path_count_fails_fast(self, server_env):
        cfg_srv, tmp = server_env
        g_cfg = gan_lib.GANConfig(
            gen_depth=2, gen_base_features=4, disc_layers=2,
            disc_base_features=4, compute_dtype=jnp.float32,
        )
        params, state = gan_lib.init(jax.random.PRNGKey(0), g_cfg)
        save_model(cfg_srv.models_dir, "enhe", "gan", g_cfg, params, state)
        stack = (np.random.default_rng(6).random((1, 32, 32)) * 500).astype(
            np.float32
        )
        p = str(tmp / "e.tif")
        tiff.write_stack(p, stack)
        out = str(tmp / "ge")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "evaluate_gan", "params": {"model": "enhe"},
             "input": [p, p, p], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "failed"
        assert "2 paths" in st["error"] or "target" in st["error"]


class TestMultiChannelUNet3D:
    def test_two_channel_volume_end_to_end(self, server_env):
        """Multi-fluorophore volumetric segmentation: one (Z, H, W) TIFF per
        channel, trailing-axis stacking (round-2 verdict missing #4)."""
        cfg_srv, tmp = server_env
        net_cfg = unet.UNetConfig(
            in_channels=2, num_classes=2, depth=2, base_features=2, dims=3,
            compute_dtype=jnp.float32,
        )
        params, state = unet.init(jax.random.PRNGKey(0), net_cfg)
        save_model(cfg_srv.models_dir, "seg3d2c", "unet", net_cfg, params, state)
        rng = np.random.default_rng(8)
        v0 = (rng.random((8, 16, 16)) * 700).astype(np.float32)
        v1 = (rng.random((8, 16, 16)) * 300).astype(np.float32)
        p0, p1 = str(tmp / "v0.tif"), str(tmp / "v1.tif")
        tiff.write_stack(p0, v0)
        tiff.write_stack(p1, v1)
        out = str(tmp / "o3d2c")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "segmentation_unet3d",
             "params": {"model": "seg3d2c", "patch": [4, 8, 8],
                        "overlap": [2, 4, 4]},
             "input": [p0, p1], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        labels = tiff.read_stack(st["outputs"]["labels"])
        assert labels.shape == (8, 16, 16)
        assert os.path.exists(st["outputs"]["objects"])

    def test_channel_mismatch_fails_fast(self, server_env):
        cfg_srv, tmp = server_env
        net_cfg = unet.UNetConfig(
            in_channels=1, num_classes=2, depth=2, base_features=2, dims=3,
            compute_dtype=jnp.float32,
        )
        params, state = unet.init(jax.random.PRNGKey(0), net_cfg)
        save_model(cfg_srv.models_dir, "seg3d1c", "unet", net_cfg, params, state)
        v = (np.random.default_rng(9).random((8, 16, 16)) * 700).astype(
            np.float32
        )
        p0, p1 = str(tmp / "w0.tif"), str(tmp / "w1.tif")
        tiff.write_stack(p0, v)
        tiff.write_stack(p1, v)
        out = str(tmp / "o3dmm")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "segmentation_unet3d",
             "params": {"model": "seg3d1c", "patch": [4, 8, 8],
                        "overlap": [2, 4, 4]},
             "input": [p0, p1], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "failed"
        assert "expects 1 channel(s)" in st["error"]


class TestLocalize:
    def test_two_objects(self):
        cm = np.zeros((64, 64), np.int32)
        cm[5:15, 5:15] = 1
        cm[30:40, 30:42] = 2
        objs = localize.localize_frame(cm, t=3, intensity=np.ones((64, 64)))
        assert len(objs) == 2
        by_label = {o.label: o for o in objs}
        assert by_label[1].area == 100
        assert by_label[2].area == 120
        np.testing.assert_allclose([by_label[1].y, by_label[1].x], [9.5, 9.5])
        assert all(o.t == 3 for o in objs)

    def test_min_area_filter(self):
        cm = np.zeros((16, 16), np.int32)
        cm[0, 0] = 1
        cm[4:12, 4:12] = 1
        objs = localize.localize_frame(cm, min_area=5)
        assert len(objs) == 1 and objs[0].area == 64

    def test_h5_export_layout(self, tmp_path):
        import h5py

        objs = [
            localize.LocalizedObject(t=t, x=1.0, y=2.0, z=0.0, label=1, area=10)
            for t in (0, 0, 2)
        ]
        p = str(tmp_path / "o.h5")
        localize.export_btrack_h5(p, objs)
        with h5py.File(p) as f:
            coords = f["objects/obj_type_1/coords"][:]
            fmap = f["objects/obj_type_1/map"][:]
        assert coords.shape == (3, 5)
        np.testing.assert_array_equal(fmap, [[0, 2], [2, 2], [2, 3]])

    def test_empty_export(self, tmp_path):
        import h5py

        p = str(tmp_path / "e.h5")
        localize.export_btrack_h5(p, [])
        with h5py.File(p) as f:
            assert f["objects/obj_type_1/coords"][:].shape == (0, 5)


class TestUNet3DPipeline:
    def test_end_to_end(self, server_env):
        cfg_srv, tmp = server_env
        net_cfg = unet.UNetConfig(
            in_channels=1, num_classes=2, depth=2, base_features=2, dims=3,
            compute_dtype=jnp.float32,
        )
        params, state = unet.init(jax.random.PRNGKey(0), net_cfg)
        save_model(cfg_srv.models_dir, "seg3d", "unet", net_cfg, params, state)

        vol = (np.random.default_rng(2).random((8, 32, 32)) * 800).astype(np.float32)
        vol_path = str(tmp / "vol.tif")
        tiff.write_stack(vol_path, vol)
        out_dir = str(tmp / "out3d")
        submit_job(
            cfg_srv.jobs_dir,
            {
                "module": "segmentation_unet3d",
                "params": {
                    "model": "seg3d",
                    "patch": [4, 16, 16],
                    "overlap": [2, 4, 4],
                    "save_probs": True,
                    "save_entropy": True,
                },
                "input": [vol_path],
                "output": out_dir,
            },
        )
        assert ImageServer(cfg_srv).poll_once()
        status = json.load(open(os.path.join(out_dir, "status.json")))
        assert status["state"] == "complete", status.get("error")
        labels = tiff.read_stack(status["outputs"]["labels"])
        assert labels.shape == (8, 32, 32) and labels.dtype == np.uint16
        # 3D output contract matches 2D: per-class probs + btrack objects
        probs = tiff.read_stack(status["outputs"]["probs"])
        assert probs.shape == (8 * 2, 32, 32)
        per_plane = probs.reshape(8, 2, 32, 32)
        np.testing.assert_allclose(per_plane.sum(axis=1), 1.0, atol=1e-4)
        ent = tiff.read_stack(status["outputs"]["entropy"])
        ref = -(per_plane * np.log(np.maximum(per_plane, 1e-12))).sum(
            axis=1
        ) / np.log(2)
        np.testing.assert_allclose(ent, ref, atol=1e-6)
        import h5py

        with h5py.File(status["outputs"]["objects"]) as f:
            assert "objects" in f


class TestTrainPipelines:
    def test_build_records_ignore_label_sparse_annotations(self, server_env):
        """ignore_label pixels store weight 0 + class 0 and never skew
        the class default; colliding/malformed values fail fast."""
        from sequitr_tpu.data import records as rec_lib

        cfg_srv, tmp = server_env
        rng = np.random.default_rng(1)
        images = rng.normal(0.1, 0.05, (2, 16, 16)).astype(np.float32)
        labels = np.full((2, 16, 16), 255, np.uint16)  # mostly UNANNOTATED
        labels[:, 2:8, 2:8] = 1   # one annotated object
        labels[:, 10:14, 10:14] = 0  # some annotated background
        img_path, lab_path = str(tmp / "img.tif"), str(tmp / "lab.tif")
        tiff.write_stack(img_path, images)
        tiff.write_stack(lab_path, labels)
        rec_dir = str(tmp / "recs")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "build_records",
             "params": {"ignore_label": 255, "shard_size": 4},
             "input": [img_path, lab_path], "output": rec_dir},
        )
        srv = ImageServer(cfg_srv)
        assert srv.poll_once()
        status = json.load(open(os.path.join(rec_dir, "status.json")))
        assert status["state"] == "complete", status.get("error")
        import glob as glob_mod

        exs = list(rec_lib.read_segmentation_examples(
            sorted(glob_mod.glob(os.path.join(rec_dir, "train-*.tfrecord")))
        ))
        assert len(exs) == 2
        for ex in exs:
            ig = labels[0] == 255
            assert ex.labels.max() == 1  # 255 never inflated classes
            assert (ex.labels[ig] == 0).all()
            assert (ex.weights[ig] == 0).all()
            assert (ex.weights[~ig] > 0).all()

        # without weight_maps the stored weights are the pure mask
        rec2 = str(tmp / "recs2")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "build_records",
             "params": {"ignore_label": 255, "weight_maps": False},
             "input": [img_path, lab_path], "output": rec2},
        )
        assert srv.poll_once()
        st2 = json.load(open(os.path.join(rec2, "status.json")))
        assert st2["state"] == "complete", st2.get("error")
        ex = next(rec_lib.read_segmentation_examples(
            sorted(glob_mod.glob(os.path.join(rec2, "train-*.tfrecord")))
        ))
        np.testing.assert_array_equal(
            ex.weights, (labels[0] != 255).astype(np.float32)
        )

        # collision + malformed = deterministic errors; the malformed
        # case ALSO without num_classes (the default-class scan parses
        # the value first — review fix)
        for name, params, frag in (
            ("c1", {"ignore_label": 1, "num_classes": 2}, "collides"),
            ("c2", {"ignore_label": "x", "num_classes": 2}, "int"),
            ("c3", {"ignore_label": "x"}, "int"),
        ):
            out = str(tmp / name)
            submit_job(
                cfg_srv.jobs_dir,
                {"module": "build_records", "params": params,
                 "input": [img_path, lab_path], "output": out},
            )
            assert srv.poll_once()
            st = json.load(open(os.path.join(out, "status.json")))
            assert st["state"] == "failed"
            assert frag in st["error"], (name, st["error"])
            assert "JobError" in st["error"], name  # fail-fast, no retry

    @pytest.mark.parametrize("compress", [False, True])
    def test_build_records_then_train(self, server_env, compress):
        cfg_srv, tmp = server_env
        rng = np.random.default_rng(0)
        images = rng.normal(0.1, 0.05, (4, 16, 16)).astype(np.float32)
        labels = np.zeros((4, 16, 16), np.int32)
        for i in range(4):
            images[i, 4:10, 4:10] += 1.0
            labels[i, 4:10, 4:10] = 1
        img_path, lab_path = str(tmp / "img.tif"), str(tmp / "lab.tif")
        tiff.write_stack(img_path, images)
        tiff.write_stack(lab_path, labels.astype(np.uint16))

        rec_dir = str(tmp / "recs")
        submit_job(
            cfg_srv.jobs_dir,
            {
                "module": "build_records",
                "params": {"num_classes": 2, "shard_size": 2,
                           "compress_records": compress},
                "input": [img_path, lab_path],
                "output": rec_dir,
            },
        )
        srv = ImageServer(cfg_srv)
        assert srv.poll_once()
        status = json.load(open(os.path.join(rec_dir, "status.json")))
        assert status["state"] == "complete", status.get("error")
        assert status["outputs"]["n_examples"] == "4"
        import glob as _glob

        shard0 = sorted(_glob.glob(status["outputs"]["shards"]))[0]
        with open(shard0, "rb") as f:
            is_gzip = f.read(2) == b"\x1f\x8b"
        assert is_gzip == compress

        train_out = str(tmp / "train_out")
        submit_job(
            cfg_srv.jobs_dir,
            {
                "module": "train_unet2d",
                "params": {
                    "model": "trained2d",
                    "num_classes": 2,
                    "depth": 2,
                    "base_features": 2,
                    "norm": "none",
                    "compute_dtype": "float32",
                    "steps": 3,
                    "batch_size": 2,
                    "augment": False,
                },
                "input": [status["outputs"]["shards"]],
                "output": train_out,
            },
        )
        assert srv.poll_once()
        status2 = json.load(open(os.path.join(train_out, "status.json")))
        assert status2["state"] == "complete", status2.get("error")
        # trained model is registered and loadable
        from sequitr_tpu.server import load_model

        kind, cfg, params, state = load_model(cfg_srv.models_dir, "trained2d")
        assert kind == "unet"
        # training observability: metrics JSONL stream written alongside
        mfile = status2["outputs"]["metrics_file"]
        assert os.path.exists(mfile)
        rows = [json.loads(l) for l in open(mfile)]
        assert any(r["kind"] == "train" and "loss" in r for r in rows)

    def test_directory_input_expands_to_shards(
        self, server_env, monkeypatch
    ):
        """A build_records OUTPUT DIR is a valid train input (the same
        directory convention FrameSource gives TIFF entries) — what a
        depends_on chain naturally produces."""
        import dataclasses as dc

        from sequitr_tpu.pipeline import fit as fit_lib

        cfg_srv, tmp = server_env
        cfg_srv = dc.replace(cfg_srv, max_retries=0)
        captured = {}

        def fake_fit(cfg, tc, fc, paths, **kw):
            captured["paths"] = paths
            raise RuntimeError("captured; abort before training")

        monkeypatch.setattr(fit_lib, "fit_unet", fake_fit)
        d = tmp / "shard_dir"
        d.mkdir()
        (d / "train-00000-of-00002.tfrecord").write_bytes(b"")
        (d / "train-00001-of-00002.tfrecord").write_bytes(b"")
        (d / "status.json").write_text("{}")  # non-shard files ignored
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "train_unet2d", "params": {"model": "m"},
             "input": [str(d)], "output": str(tmp / "td")},
        )
        ImageServer(cfg_srv).poll_once()
        names = [os.path.basename(p) for p in captured["paths"]]
        assert names == [
            "train-00000-of-00002.tfrecord",
            "train-00001-of-00002.tfrecord",
        ]

    def test_elastic_knobs_plumbed_from_job_params(
        self, server_env, monkeypatch
    ):
        """elastic_alpha/elastic_grid/p_elastic job params reach the
        TrainConfig (round-2 verdict weak #7: they were code-only)."""
        import dataclasses as dc

        from sequitr_tpu.pipeline import fit as fit_lib

        cfg_srv, tmp = server_env
        cfg_srv = dc.replace(cfg_srv, max_retries=0)
        captured = {}

        def fake_fit(cfg, tc, fc, paths, **kw):
            captured["tc"] = tc
            raise RuntimeError("captured; abort before training")

        monkeypatch.setattr(fit_lib, "fit_unet", fake_fit)
        shard = tmp / "train-00000.tfrecord"
        shard.write_bytes(b"")
        out = str(tmp / "tk")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "train_unet2d",
             "params": {"model": "m", "elastic_alpha": 5.5,
                        "elastic_grid": 8, "p_elastic": 0.9},
             "input": [str(shard)], "output": out},
        )
        ImageServer(cfg_srv).poll_once()
        tc = captured["tc"]
        assert tc.elastic_alpha == 5.5
        assert tc.elastic_grid == 8
        assert tc.p_elastic == 0.9

    def test_keep_best_registers_best_checkpoint(self, server_env):
        """keep_best: true tracks holdout mIoU and registers the best
        checkpoint; without holdout_every it fails fast."""
        cfg_srv, tmp = server_env
        rng = np.random.default_rng(0)
        images = rng.normal(0.1, 0.05, (8, 16, 16)).astype(np.float32)
        labels = np.zeros((8, 16, 16), np.int32)
        for i in range(8):
            images[i, 4:10, 4:10] += 1.0
            labels[i, 4:10, 4:10] = 1
        img_path, lab_path = str(tmp / "kb_img.tif"), str(tmp / "kb_lab.tif")
        tiff.write_stack(img_path, images)
        tiff.write_stack(lab_path, labels.astype(np.uint16))
        srv = ImageServer(cfg_srv)
        rec_out = str(tmp / "kb_recs")
        submit_job(cfg_srv.jobs_dir,
                   {"module": "build_records",
                    "params": {"num_classes": 2, "weight_maps": False},
                    "input": [img_path, lab_path], "output": rec_out})
        assert srv.poll_once()
        st = json.load(open(os.path.join(rec_out, "status.json")))

        params = {"model": "kb2d", "num_classes": 2, "depth": 2,
                  "base_features": 2, "norm": "none",
                  "compute_dtype": "float32", "steps": 8, "batch_size": 2,
                  "augment": False, "keep_best": True,
                  "checkpoint_every": 4, "holdout_every": 4, "eval_every": 4}
        out1 = str(tmp / "kb_train")
        submit_job(cfg_srv.jobs_dir,
                   {"module": "train_unet2d", "params": params,
                    "input": [st["outputs"]["shards"]], "output": out1})
        assert srv.poll_once()
        st2 = json.load(open(os.path.join(out1, "status.json")))
        assert st2["state"] == "complete", st2.get("error")
        assert os.path.isdir(os.path.join(out1, "ckpts", "best"))

        # without holdout_every: deterministic fail-fast, no retry burn
        bad = dict(params, model="kb_bad")
        bad.pop("holdout_every")
        out2 = str(tmp / "kb_bad")
        submit_job(cfg_srv.jobs_dir,
                   {"module": "train_unet2d", "params": bad,
                    "input": [st["outputs"]["shards"]], "output": out2})
        assert srv.poll_once()
        st3 = json.load(open(os.path.join(out2, "status.json")))
        assert st3["state"] == "failed"
        assert "keep_best/early_stop_patience requires" in st3["error"]



class TestMultiChannelPipeline:
    def test_two_channel_records_train_serve(self, server_env):
        """Two fluorophore stacks as channels: build records (per-channel
        normalize), train an in_channels=2 net, serve with two input TIFFs."""
        cfg_srv, tmp = server_env
        rng = np.random.default_rng(0)
        # channel 0: blob signal; channel 1: unrelated gain/offset
        ch0 = rng.normal(0.1, 0.05, (6, 16, 16)).astype(np.float32)
        labels = np.zeros((6, 16, 16), np.int32)
        for i in range(6):
            cy, cx = rng.integers(4, 12, 2)
            ch0[i, cy - 3 : cy + 3, cx - 3 : cx + 3] += 1.0
            labels[i, cy - 3 : cy + 3, cx - 3 : cx + 3] = 1
        ch1 = (ch0 * 700.0 + rng.normal(300, 5, ch0.shape)).astype(np.float32)
        p0, p1, pl = (str(tmp / n) for n in ("c0.tif", "c1.tif", "cl.tif"))
        tiff.write_stack(p0, ch0)
        tiff.write_stack(p1, ch1)
        tiff.write_stack(pl, labels.astype(np.uint16))
        srv = ImageServer(cfg_srv)

        rec_out = str(tmp / "mcrecs")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "build_records",
             "params": {"num_classes": 2, "weight_maps": False},
             "input": [p0, p1, pl], "output": rec_out},
        )
        assert srv.poll_once()
        st = json.load(open(os.path.join(rec_out, "status.json")))
        assert st["state"] == "complete", st.get("error")

        # round-trip: examples carry (H, W, 2) images with (H, W) labels
        from sequitr_tpu.data import records as rec_lib
        import glob as g

        ex = next(rec_lib.read_segmentation_examples(
            sorted(g.glob(os.path.join(rec_out, "train-*.tfrecord")))
        ))
        assert ex.image.shape == (16, 16, 2) and ex.labels.shape == (16, 16)
        # per-channel normalization: both channels span [0, 1]
        assert 0.45 < float(ex.image[..., 1].max()) <= 1.0

        train_out = str(tmp / "mctrain")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "train_unet2d",
             "params": {"model": "mc2", "in_channels": 2, "num_classes": 2,
                        "depth": 2, "base_features": 2, "norm": "none",
                        "compute_dtype": "float32", "steps": 3,
                        "batch_size": 2, "augment": False},
             "input": [st["outputs"]["shards"]], "output": train_out},
        )
        assert srv.poll_once()
        st2 = json.load(open(os.path.join(train_out, "status.json")))
        assert st2["state"] == "complete", st2.get("error")

        seg_out = str(tmp / "mcseg")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "segmentation_unet2d",
             "params": {"model": "mc2", "patch": [8, 8], "overlap": [2, 2]},
             "input": [p0, p1], "output": seg_out},
        )
        assert srv.poll_once()
        st3 = json.load(open(os.path.join(seg_out, "status.json")))
        assert st3["state"] == "complete", st3.get("error")
        out_labels = tiff.read_stack(st3["outputs"]["labels"])
        assert out_labels.shape == (6, 16, 16)

        # channel-count mismatch fails deterministically
        bad_out = str(tmp / "mcbad")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "segmentation_unet2d",
             "params": {"model": "mc2", "patch": [8, 8], "overlap": [2, 2]},
             "input": [p0], "output": bad_out},
        )
        assert srv.poll_once()
        st4 = json.load(open(os.path.join(bad_out, "status.json")))
        assert st4["state"] == "failed"


class TestTrain3DPipeline:
    def test_build_3d_records_train_then_serve(self, server_env):
        """VERDICT r1 item 3: 3D records (volume + random sub-volume crops)
        -> train_unet3d (volumetric augmentation on) -> loss decreases ->
        serve through segmentation_unet3d."""
        cfg_srv, tmp = server_env
        rng = np.random.default_rng(0)
        vol = rng.normal(0.1, 0.05, (8, 16, 16)).astype(np.float32)
        lab = np.zeros((8, 16, 16), np.int32)
        vol[2:6, 4:12, 4:12] += 1.0
        lab[2:6, 4:12, 4:12] = 1
        img_p, lab_p = str(tmp / "vol.tif"), str(tmp / "vlab.tif")
        tiff.write_stack(img_p, vol)
        tiff.write_stack(lab_p, lab.astype(np.uint16))
        srv = ImageServer(cfg_srv)

        rec_out = str(tmp / "recs3d")
        submit_job(
            cfg_srv.jobs_dir,
            {
                "module": "build_records",
                "params": {
                    "dims": 3, "num_classes": 2, "weight_maps": True,
                    "patch": [4, 8, 8], "patches_per_example": 10,
                    "shard_size": 5,
                },
                "input": [img_p, lab_p],
                "output": rec_out,
            },
        )
        assert srv.poll_once()
        st = json.load(open(os.path.join(rec_out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        assert st["outputs"]["n_examples"] == "10"

        train_out = str(tmp / "t3d")
        submit_job(
            cfg_srv.jobs_dir,
            {
                "module": "train_unet3d",
                "params": {
                    "model": "seg3d_trained", "num_classes": 2, "depth": 2,
                    "base_features": 2, "norm": "none",
                    "compute_dtype": "float32", "steps": 8, "batch_size": 2,
                    "learning_rate": 3e-3, "log_every": 2, "augment": True,
                },
                "input": [st["outputs"]["shards"]],
                "output": train_out,
            },
        )
        assert srv.poll_once()
        st2 = json.load(open(os.path.join(train_out, "status.json")))
        assert st2["state"] == "complete", st2.get("error")
        rows = [json.loads(l) for l in open(st2["outputs"]["metrics_file"])]
        losses = [r["loss"] for r in rows if r["kind"] == "train"]
        assert losses[-1] < losses[0]  # learning with 3D augmentation on

        # serve the trained 3D model
        seg_out = str(tmp / "seg3d_out")
        submit_job(
            cfg_srv.jobs_dir,
            {
                "module": "segmentation_unet3d",
                "params": {"model": "seg3d_trained", "patch": [4, 8, 8],
                           "overlap": [2, 4, 4]},
                "input": [img_p],
                "output": seg_out,
            },
        )
        assert srv.poll_once()
        st3 = json.load(open(os.path.join(seg_out, "status.json")))
        assert st3["state"] == "complete", st3.get("error")
        out_labels = tiff.read_stack(st3["outputs"]["labels"])
        assert out_labels.shape == (8, 16, 16)


class TestGanTrainPipelines:
    def test_build_pairs_then_train_gan(self, server_env):
        cfg_srv, tmp = server_env
        rng = np.random.default_rng(0)
        raw = (rng.random((4, 16, 16)) * 900).astype(np.float32)
        clean = raw * 0.5
        raw_p, tgt_p = str(tmp / "raw.tif"), str(tmp / "clean.tif")
        tiff.write_stack(raw_p, raw)
        tiff.write_stack(tgt_p, clean)

        pairs_out = str(tmp / "pairs")
        submit_job(
            cfg_srv.jobs_dir,
            {
                "module": "build_gan_pairs",
                "params": {"shard_size": 2},
                "input": [raw_p, tgt_p],
                "output": pairs_out,
            },
        )
        srv = ImageServer(cfg_srv)
        assert srv.poll_once()
        status = json.load(open(os.path.join(pairs_out, "status.json")))
        assert status["state"] == "complete", status.get("error")
        assert status["outputs"]["n_examples"] == "4"

        train_out = str(tmp / "gtrain")
        submit_job(
            cfg_srv.jobs_dir,
            {
                "module": "train_gan",
                "params": {
                    "model": "gan_demo",
                    "gen_depth": 2,
                    "gen_base_features": 2,
                    "disc_layers": 2,
                    "disc_base_features": 2,
                    "compute_dtype": "float32",
                    "steps": 2,
                    "batch_size": 2,
                },
                "input": [status["outputs"]["shards"]],
                "output": train_out,
            },
        )
        assert srv.poll_once()
        status2 = json.load(open(os.path.join(train_out, "status.json")))
        assert status2["state"] == "complete", status2.get("error")
        from sequitr_tpu.server import load_model

        kind, _, _, _ = load_model(cfg_srv.models_dir, "gan_demo")
        assert kind == "gan"

    def test_distill_fast_preset_job(self, server_env):
        """train_unet2d with distill_from: teacher-guided fast-preset
        training through the job API (metrics carry ce/kd terms)."""
        cfg_srv, tmp = server_env
        rng = np.random.default_rng(4)
        images = rng.normal(0.1, 0.05, (6, 16, 16)).astype(np.float32)
        labels = (images > 0.4).astype(np.int32)
        img_p, lab_p = str(tmp / "di.tif"), str(tmp / "dl.tif")
        tiff.write_stack(img_p, images)
        tiff.write_stack(lab_p, labels.astype(np.uint16))
        srv = ImageServer(cfg_srv)

        # register a (tiny, untrained-is-fine) teacher
        t_cfg = unet.UNetConfig(
            in_channels=1, num_classes=2, depth=2, base_features=4,
            norm="none", compute_dtype=jnp.float32,
        )
        t_params, t_state = unet.init(jax.random.PRNGKey(0), t_cfg)
        save_model(cfg_srv.models_dir, "teacher", "unet", t_cfg, t_params, t_state)

        rec_out = str(tmp / "drecs")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "build_records",
             "params": {"num_classes": 2, "weight_maps": False},
             "input": [img_p, lab_p], "output": rec_out},
        )
        assert srv.poll_once()
        shards = json.load(open(os.path.join(rec_out, "status.json")))["outputs"]["shards"]
        out = str(tmp / "dtrain")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "train_unet2d",
             "params": {"model": "fast_student", "num_classes": 2, "depth": 2,
                        "base_features": 8, "space_to_depth": 2,
                        "norm": "none", "compute_dtype": "float32",
                        "steps": 3, "batch_size": 2, "augment": False,
                        "distill_from": "teacher"},
             "input": [shards], "output": out},
        )
        assert srv.poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        rows = [json.loads(l) for l in open(st["outputs"]["metrics_file"])]
        train_rows = [r for r in rows if r["kind"] == "train"]
        assert {"ce", "kd"} <= set(train_rows[-1])
        from sequitr_tpu.server import load_model

        kind, s_cfg, _, _ = load_model(cfg_srv.models_dir, "fast_student")
        assert kind == "unet" and s_cfg.space_to_depth == 2

    def test_train_data_parallel_job(self, server_env):
        """train_unet2d with data_parallel: true shards the batch over the
        8-device virtual mesh and completes (SURVEY.md:151-152)."""
        cfg_srv, tmp = server_env
        rng = np.random.default_rng(3)
        images = rng.normal(0.1, 0.05, (8, 16, 16)).astype(np.float32)
        labels = (images > 0.4).astype(np.int32)
        img_p, lab_p = str(tmp / "dpi.tif"), str(tmp / "dpl.tif")
        tiff.write_stack(img_p, images)
        tiff.write_stack(lab_p, labels.astype(np.uint16))
        srv = ImageServer(cfg_srv)
        rec_out = str(tmp / "dprecs")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "build_records",
             "params": {"num_classes": 2, "weight_maps": False},
             "input": [img_p, lab_p], "output": rec_out},
        )
        assert srv.poll_once()
        shards = json.load(open(os.path.join(rec_out, "status.json")))["outputs"]["shards"]
        out = str(tmp / "dptrain")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "train_unet2d",
             "params": {"model": "dp_model", "num_classes": 2, "depth": 2,
                        "base_features": 2, "norm": "none",
                        "compute_dtype": "float32", "steps": 2,
                        "batch_size": 8, "augment": False,
                        "data_parallel": True},
             "input": [shards], "output": out},
        )
        assert srv.poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")

        # indivisible batch fails fast with a clear error
        out2 = str(tmp / "dptrain_bad")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "train_unet2d",
             "params": {"model": "dp_bad", "num_classes": 2, "depth": 2,
                        "base_features": 2, "norm": "none",
                        "compute_dtype": "float32", "steps": 1,
                        "batch_size": 3, "augment": False,
                        "data_parallel": True},
             "input": [shards], "output": out2},
        )
        assert srv.poll_once()
        st2 = json.load(open(os.path.join(out2, "status.json")))
        assert st2["state"] == "failed"
        assert "not divisible" in st2["error"]

    def test_train_resume_from_checkpoint(self, server_env, tmp_path):
        cfg_srv, tmp = server_env
        rng = np.random.default_rng(1)
        images = rng.random((4, 16, 16)).astype(np.float32)
        labels = (images > 0.5).astype(np.int32)
        img_p, lab_p = str(tmp / "i.tif"), str(tmp / "l.tif")
        tiff.write_stack(img_p, images)
        tiff.write_stack(lab_p, labels.astype(np.uint16))
        srv = ImageServer(cfg_srv)

        rec_out = str(tmp / "recs")
        submit_job(
            cfg_srv.jobs_dir,
            {
                "module": "build_records",
                "params": {"num_classes": 2, "weight_maps": False},
                "input": [img_p, lab_p],
                "output": rec_out,
            },
        )
        assert srv.poll_once()
        shards = json.load(open(os.path.join(rec_out, "status.json")))["outputs"]["shards"]

        train_params = {
            "model": "resume_demo",
            "num_classes": 2,
            "depth": 2,
            "base_features": 2,
            "norm": "none",
            "compute_dtype": "float32",
            "steps": 2,
            "batch_size": 2,
            "augment": False,
            "checkpoint_every": 1,
        }
        out1 = str(tmp / "t1")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "train_unet2d", "params": train_params,
             "input": [shards], "output": out1},
        )
        assert srv.poll_once()
        s1 = json.load(open(os.path.join(out1, "status.json")))
        assert s1["state"] == "complete", s1.get("error")

        # resubmit with the same output dir: resumes from ckpts/final
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "train_unet2d", "params": train_params,
             "input": [shards], "output": out1},
        )
        assert srv.poll_once()
        s2 = json.load(open(os.path.join(out1, "status.json")))
        assert s2["state"] == "complete", s2.get("error")


class TestDataParallelServing:
    def test_dp_matches_streaming(self, server_env):
        """data_parallel=true shards frames over the 8-device mesh and must
        produce the same labels as single-chip streaming."""
        cfg_srv, tmp = server_env
        net_cfg = unet.UNetConfig(
            in_channels=1, num_classes=3, depth=2, base_features=4,
            compute_dtype=jnp.float32,
        )
        params, state = unet.init(jax.random.PRNGKey(0), net_cfg)
        save_model(cfg_srv.models_dir, "dp_seg", "unet", net_cfg, params, state)

        stack = (np.random.default_rng(5).random((5, 32, 32)) * 1000).astype(np.float32)
        stack_path = str(tmp / "dp.tif")
        tiff.write_stack(stack_path, stack)
        srv = ImageServer(cfg_srv)

        outs = {}
        for name, dp in (("serial", False), ("dp", True)):
            out_dir = str(tmp / f"out_{name}")
            submit_job(
                cfg_srv.jobs_dir,
                {
                    "module": "segmentation_unet2d",
                    "params": {"model": "dp_seg", "patch": [16, 16],
                               "overlap": [4, 4], "localize": False,
                               "data_parallel": dp},
                    "input": [stack_path],
                    "output": out_dir,
                },
            )
            assert srv.poll_once()
            status = json.load(open(os.path.join(out_dir, "status.json")))
            assert status["state"] == "complete", status.get("error")
            outs[name] = tiff.read_stack(status["outputs"]["labels"])
        np.testing.assert_array_equal(outs["serial"], outs["dp"])

    def test_spatial_ways_param_fails_fast(self):
        """Malformed spatial_parallel values are deterministic JobErrors,
        never retried (code-review r3)."""
        import pytest

        from sequitr_tpu.server.server import _spatial_ways

        assert _spatial_ways(True, 8) == 8
        assert _spatial_ways(4, 8) == 4
        assert _spatial_ways(3, 8, divide=False) == 3
        with pytest.raises(JobError):
            _spatial_ways("all", 8)
        with pytest.raises(JobError):
            _spatial_ways(3, 8)  # does not divide
        with pytest.raises(JobError):
            _spatial_ways(16, 8)  # exceeds devices
        with pytest.raises(JobError):
            _spatial_ways(1, 8)

    def test_spatial_parallel_multichannel_serving(self, server_env):
        """2-channel stacks serve under spatial_parallel (halo exchange
        with channels riding the trailing axis) and match the default
        streaming path exactly."""
        cfg_srv, tmp = server_env
        net_cfg = unet.UNetConfig(
            in_channels=2, num_classes=3, depth=2, base_features=4,
            compute_dtype=jnp.float32,
        )
        params, state = unet.init(jax.random.PRNGKey(2), net_cfg)
        save_model(cfg_srv.models_dir, "sp2c", "unet", net_cfg, params, state)
        rng = np.random.default_rng(12)
        c0 = (rng.random((2, 64, 32)) * 800).astype(np.float32)
        c1 = (rng.random((2, 64, 32)) * 300).astype(np.float32)
        p0, p1 = str(tmp / "sp0.tif"), str(tmp / "sp1.tif")
        tiff.write_stack(p0, c0)
        tiff.write_stack(p1, c1)
        srv = ImageServer(cfg_srv)
        outs = {}
        for name, extra in (
            ("plain", {}),
            ("spatial", {"spatial_parallel": True}),
        ):
            out_dir = str(tmp / f"sp_{name}")
            submit_job(
                cfg_srv.jobs_dir,
                {"module": "segmentation_unet2d",
                 "params": dict({"model": "sp2c", "patch": [64, 32],
                                 "overlap": [0, 0], "localize": False},
                                **extra),
                 "input": [p0, p1], "output": out_dir},
                job_id=f"sp{name}",
            )
            assert srv.poll_once()
            status = json.load(open(os.path.join(out_dir, "status.json")))
            assert status["state"] == "complete", status.get("error")
            outs[name] = tiff.read_stack(status["outputs"]["labels"])
        np.testing.assert_array_equal(outs["plain"], outs["spatial"])

    def test_spatial_parallel_3d_volume_serving(self, server_env):
        """spatial_parallel on a 3D volume job: Z-sharded halo-exchange
        inference matches the single-chip path exactly."""
        cfg_srv, tmp = server_env
        net_cfg = unet.UNetConfig(
            in_channels=1, num_classes=2, depth=2, base_features=4, dims=3,
            compute_dtype=jnp.float32,
        )
        params, state = unet.init(jax.random.PRNGKey(4), net_cfg)
        save_model(cfg_srv.models_dir, "sp3d", "unet", net_cfg, params, state)
        vol = (np.random.default_rng(13).random((16, 16, 16)) * 700).astype(
            np.float32
        )
        vol_path = str(tmp / "spv.tif")
        tiff.write_stack(vol_path, vol)
        srv = ImageServer(cfg_srv)
        outs = {}
        for name, extra in (
            ("plain", {}),
            ("spatial", {"spatial_parallel": True}),
        ):
            out_dir = str(tmp / f"v_{name}")
            submit_job(
                cfg_srv.jobs_dir,
                {"module": "segmentation_unet3d",
                 "params": dict({"model": "sp3d", "patch": [16, 16, 16],
                                 "overlap": [0, 0, 0], "localize": False},
                                **extra),
                 "input": [vol_path], "output": out_dir},
                job_id=f"v{name}",
            )
            assert srv.poll_once()
            status = json.load(open(os.path.join(out_dir, "status.json")))
            assert status["state"] == "complete", status.get("error")
            outs[name] = tiff.read_stack(status["outputs"]["labels"])
        np.testing.assert_array_equal(outs["plain"], outs["spatial"])
        assert outs["spatial"].shape == (16, 16, 16)

    def test_gan_spatial_parallel_matches_streaming(self, server_env):
        """spatial_parallel on enhancement_gan: the H-sharded generator
        matches single-chip streaming output."""
        cfg_srv, tmp = server_env
        g_cfg = gan_lib.GANConfig(
            gen_depth=2, gen_base_features=4, disc_layers=2,
            disc_base_features=4, compute_dtype=jnp.float32,
        )
        params, state = gan_lib.init(jax.random.PRNGKey(7), g_cfg)
        save_model(cfg_srv.models_dir, "sp_gan", "gan", g_cfg, params, state)
        stack = (np.random.default_rng(14).random((2, 64, 32)) * 900).astype(
            np.float32
        )
        stack_path = str(tmp / "spg.tif")
        tiff.write_stack(stack_path, stack)
        srv = ImageServer(cfg_srv)
        outs = {}
        for name, extra in (
            ("plain", {}),
            ("spatial", {"spatial_parallel": True}),
            ("hybrid", {"spatial_parallel": 4}),  # 2-way DP x 4-way spatial
        ):
            out_dir = str(tmp / f"sg_{name}")
            submit_job(
                cfg_srv.jobs_dir,
                {"module": "enhancement_gan",
                 "params": dict({"model": "sp_gan", "patch": [64, 32],
                                 "overlap": [0, 0]}, **extra),
                 "input": [stack_path], "output": out_dir},
                job_id=f"sg{name}",
            )
            assert srv.poll_once()
            status = json.load(open(os.path.join(out_dir, "status.json")))
            assert status["state"] == "complete", status.get("error")
            outs[name] = tiff.read_stack(status["outputs"]["enhanced"])
        np.testing.assert_allclose(
            outs["plain"], outs["spatial"], atol=1e-5
        )
        np.testing.assert_allclose(
            outs["plain"], outs["hybrid"], atol=1e-5
        )

    def test_gan_dp_matches_streaming(self, server_env):
        """data_parallel on enhancement_gan: frames sharded over the
        8-device mesh produce identical output to single-chip streaming."""
        cfg_srv, tmp = server_env
        g_cfg = gan_lib.GANConfig(
            gen_depth=2, gen_base_features=4, disc_layers=2,
            disc_base_features=4, compute_dtype=jnp.float32,
        )
        params, state = gan_lib.init(jax.random.PRNGKey(0), g_cfg)
        save_model(cfg_srv.models_dir, "dp_gan", "gan", g_cfg, params, state)
        stack = (np.random.default_rng(6).random((5, 32, 32)) * 900).astype(
            np.float32
        )
        stack_path = str(tmp / "dpg.tif")
        tiff.write_stack(stack_path, stack)
        srv = ImageServer(cfg_srv)
        outs = {}
        for name, dp in (("serial", False), ("dp", True)):
            out_dir = str(tmp / f"g_{name}")
            submit_job(
                cfg_srv.jobs_dir,
                {"module": "enhancement_gan",
                 "params": {"model": "dp_gan", "patch": [16, 16],
                            "overlap": [4, 4], "data_parallel": dp},
                 "input": [stack_path], "output": out_dir},
                job_id=f"g{name}",
            )
            assert srv.poll_once()
            status = json.load(open(os.path.join(out_dir, "status.json")))
            assert status["state"] == "complete", status.get("error")
            outs[name] = tiff.read_stack(status["outputs"]["enhanced"])
        np.testing.assert_array_equal(outs["serial"], outs["dp"])
        assert outs["dp"].shape == (5, 32, 32)

    def test_spatial_parallel_serving(self, server_env):
        """spatial_parallel=true shards one frame's H axis across the mesh."""
        cfg_srv, tmp = server_env
        net_cfg = unet.UNetConfig(
            in_channels=1, num_classes=3, depth=2, base_features=4,
            compute_dtype=jnp.float32,
        )
        params, state = unet.init(jax.random.PRNGKey(1), net_cfg)
        save_model(cfg_srv.models_dir, "sp_seg", "unet", net_cfg, params, state)

        # H=64 divisible by 8 devices * min_input_multiple 2
        stack = (np.random.default_rng(7).random((2, 64, 32)) * 900).astype(np.float32)
        stack_path = str(tmp / "sp.tif")
        tiff.write_stack(stack_path, stack)
        srv = ImageServer(cfg_srv)
        outs = {}
        for name, sp in (("serial", False), ("spatial", True)):
            out_dir = str(tmp / f"sp_out_{name}")
            submit_job(
                cfg_srv.jobs_dir,
                {
                    "module": "segmentation_unet2d",
                    "params": {"model": "sp_seg", "patch": [64, 32],
                               "overlap": [0, 0], "localize": False,
                               "spatial_parallel": sp},
                    "input": [stack_path],
                    "output": out_dir,
                },
            )
            assert srv.poll_once()
            status = json.load(open(os.path.join(out_dir, "status.json")))
            assert status["state"] == "complete", status.get("error")
            outs[name] = tiff.read_stack(status["outputs"]["labels"])
        np.testing.assert_array_equal(outs["serial"], outs["spatial"])

    def test_hybrid_spatial_parallel_serving(self, server_env):
        """spatial_parallel=S (int) = S-way spatial x n/S-way data hybrid;
        labels must match the serial path exactly."""
        cfg_srv, tmp = server_env
        net_cfg = unet.UNetConfig(
            in_channels=1, num_classes=3, depth=2, base_features=4,
            compute_dtype=jnp.float32,
        )
        params, state = unet.init(jax.random.PRNGKey(2), net_cfg)
        save_model(cfg_srv.models_dir, "hy_seg", "unet", net_cfg, params, state)

        # H=32 divisible by 4 spatial ways * min_input_multiple 2; 3 frames
        # exercise the padded tail chunk (2-way data axis)
        stack = (np.random.default_rng(8).random((3, 32, 16)) * 900).astype(np.float32)
        stack_path = str(tmp / "hy.tif")
        tiff.write_stack(stack_path, stack)
        srv = ImageServer(cfg_srv)
        outs = {}
        for name, sp in (("serial", False), ("hybrid", 4)):
            out_dir = str(tmp / f"hy_out_{name}")
            submit_job(
                cfg_srv.jobs_dir,
                {
                    "module": "segmentation_unet2d",
                    "params": {"model": "hy_seg", "patch": [32, 16],
                               "overlap": [0, 0], "localize": False,
                               "spatial_parallel": sp},
                    "input": [stack_path],
                    "output": out_dir,
                },
            )
            assert srv.poll_once()
            status = json.load(open(os.path.join(out_dir, "status.json")))
            assert status["state"] == "complete", status.get("error")
            outs[name] = tiff.read_stack(status["outputs"]["labels"])
        np.testing.assert_array_equal(outs["serial"], outs["hybrid"])



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



class TestEmitterPipeline:
    def test_localize_emitters_job(self, server_env):
        cfg_srv, tmp = server_env
        rng = np.random.default_rng(0)
        frames = rng.normal(10.0, 0.5, (2, 64, 64)).astype(np.float32)
        truth = [(12.3, 40.6), (33.8, 15.2), (50.1, 50.9)]
        yy, xx = np.mgrid[:64, :64]
        for cy, cx in truth:
            g = 80.0 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * 1.5**2))
            frames[0] += g
            frames[1] += g  # same emitters in both frames
        path = str(tmp / "emitters.tif")
        tiff.write_stack(path, frames)
        out = str(tmp / "em_out")
        submit_job(cfg_srv.jobs_dir,
                   {"module": "localize_emitters",
                    "params": {"threshold_sigmas": 8, "sigma": 1.5},
                    "input": [path], "output": out})
        srv = ImageServer(cfg_srv)
        assert srv.poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        assert int(st["outputs"]["n_emitters"]) == 6  # 3 per frame
        rows = open(st["outputs"]["emitters"]).read().strip().split("\n")
        assert rows[0] == "t,y,x,amplitude,background"
        got = [tuple(map(float, r.split(","))) for r in rows[1:]]
        for t, y, x, a, b in got:
            best = min((abs(y - cy) + abs(x - cx)) for cy, cx in truth)
            assert best < 0.2, (t, y, x, best)

    def test_emitters_btrack_output(self, server_env):
        """btrack: true writes the same object layout the segmentation
        pipelines use — single-particle tracking handoff."""
        import h5py

        cfg_srv, tmp = server_env
        rng = np.random.default_rng(1)
        frames = rng.normal(10.0, 0.5, (2, 32, 32)).astype(np.float32)
        yy, xx = np.mgrid[:32, :32]
        frames += 80.0 * np.exp(-((yy - 15.5) ** 2 + (xx - 20.2) ** 2) / (2 * 1.5**2))
        path = str(tmp / "em_bt.tif")
        tiff.write_stack(path, frames)
        out = str(tmp / "em_bt_out")
        submit_job(cfg_srv.jobs_dir,
                   {"module": "localize_emitters",
                    "params": {"threshold_sigmas": 8, "btrack": True},
                    "input": [path], "output": out})
        srv = ImageServer(cfg_srv)
        assert srv.poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        with h5py.File(st["outputs"]["objects"]) as f:
            coords = f["objects/obj_type_1/coords"][:]
            fmap = f["objects/obj_type_1/map"][:]
        assert coords.shape == (2, 5)  # one emitter per frame, [t,x,y,z,label]
        np.testing.assert_allclose(coords[:, 2], 15.5, atol=0.1)  # y
        np.testing.assert_allclose(coords[:, 1], 20.2, atol=0.1)  # x
        assert fmap.shape[0] == 2  # per-frame slices

    @staticmethod
    def _emitter_volume(truth, shape=(13, 40, 40), seed=0):
        rng = np.random.default_rng(seed)
        zz, yy, xx = np.mgrid[: shape[0], : shape[1], : shape[2]]
        vol = np.full(shape, 20.0)
        for cz, cy, cx in truth:
            vol += 300.0 * np.exp(
                -((zz - cz) ** 2) / (2 * 1.4**2)
                - ((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * 1.4**2)
            )
        return (vol + rng.normal(0, 0.5, shape)).astype(np.float32)

    def test_localize_emitters_3d_volume_timelapse(self, server_env):
        """dims=3: per-timepoint volumetric localization over a volume
        sequence (directory convention); emitters.csv carries z, and
        btrack coords fill the z column for full-xyz tracking."""
        import h5py

        cfg_srv, tmp = server_env
        vols = tmp / "vols"
        os.makedirs(vols)
        truth_t = [
            [(4.3, 12.6, 25.1), (8.8, 30.2, 10.4)],  # t=0
            [(5.1, 13.0, 25.5), (8.5, 29.8, 10.0)],  # t=1 (slight motion)
        ]
        for t, truth in enumerate(truth_t):
            tiff.write_stack(
                str(vols / f"vol_t{t}.tif"), self._emitter_volume(truth, seed=t)
            )
        out = str(tmp / "em3d_out")
        submit_job(cfg_srv.jobs_dir,
                   {"module": "localize_emitters",
                    "params": {"dims": 3, "threshold": 100, "btrack": True,
                               "sigma": 1.4, "sigma_z": 1.4, "z_scale": 2.0},
                    "input": [str(vols)], "output": out})
        srv = ImageServer(cfg_srv)
        assert srv.poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        assert int(st["outputs"]["n_emitters"]) == 4
        rows = open(st["outputs"]["emitters"]).read().strip().split("\n")
        assert rows[0] == "t,z,y,x,amplitude,background"
        got = [tuple(map(float, r.split(","))) for r in rows[1:]]
        for t, z, y, x, a, b in got:
            best = min(
                abs(z - cz) + abs(y - cy) + abs(x - cx)
                for cz, cy, cx in truth_t[int(t)]
            )
            assert best < 0.3, (t, z, y, x, best)
        with h5py.File(st["outputs"]["objects"]) as f:
            coords = f["objects/obj_type_1/coords"][:]
        assert coords.shape == (4, 5)
        # btrack z = csv z * z_scale (csv stays native voxels)
        csv_z = sorted(g[1] for g in got)
        np.testing.assert_allclose(
            sorted(coords[:, 3]), [2.0 * z for z in csv_z], rtol=1e-5
        )

    @staticmethod
    def _astig_widths(z):
        # foci split +/-300 units: sx focuses above 0, sy below
        sx = 1.3 * np.sqrt(1.0 + ((z - 300.0) / 400.0) ** 2)
        sy = 1.3 * np.sqrt(1.0 + ((z + 300.0) / 400.0) ** 2)
        return sy, sx

    @classmethod
    def _astig_frame(cls, truth, shape=(64, 64), seed=0):
        rng = np.random.default_rng(seed)
        yy, xx = np.mgrid[: shape[0], : shape[1]]
        frame = np.full(shape, 20.0)
        for cz, cy, cx in truth:
            sy, sx = cls._astig_widths(cz)
            frame += 3000.0 / (2 * np.pi * sx * sy) * np.exp(
                -((yy - cy) ** 2) / (2 * sy**2)
                - ((xx - cx) ** 2) / (2 * sx**2)
            )
        return (frame + rng.normal(0, 0.2, shape)).astype(np.float32)

    def test_calibrate_then_localize_astig_chain(self, server_env):
        """calibrate_astigmatism -> localize_emitters chained via
        depends_on: the localize job points its astigmatism param at the
        calibration job's OUTPUT DIR and recovers emitter z."""
        cfg_srv, tmp = server_env
        zs = np.linspace(-600, 600, 17)
        scan = np.stack(
            [self._astig_frame([(z, 15.7, 16.2)], (32, 32), seed=9)
             for z in zs]
        )
        scan_path = str(tmp / "beads.tif")
        tiff.write_stack(scan_path, scan)
        cal_out = str(tmp / "cal_out")
        submit_job(cfg_srv.jobs_dir,
                   {"module": "calibrate_astigmatism",
                    "params": {"z_start": -600.0, "z_step": 75.0},
                    "input": [scan_path], "output": cal_out},
                   job_id="cal")
        truth = [(250.0, 20.5, 40.2), (-380.0, 45.1, 18.7)]
        frame_path = str(tmp / "astig_frames.tif")
        tiff.write_stack(frame_path, self._astig_frame(truth)[None])
        loc_out = str(tmp / "loc_out")
        submit_job(cfg_srv.jobs_dir,
                   {"module": "localize_emitters",
                    "params": {"astigmatism": cal_out, "threshold": 40,
                               "btrack": True},
                    "input": [frame_path], "output": loc_out,
                    "depends_on": [cal_out]},
                   job_id="loc")
        srv = ImageServer(cfg_srv)
        deadline = time.time() + 120
        while time.time() < deadline:
            srv.poll_once()
            if os.path.exists(os.path.join(loc_out, "status.json")):
                break
            time.sleep(0.1)
        st_cal = json.load(open(os.path.join(cal_out, "status.json")))
        assert st_cal["state"] == "complete", st_cal.get("error")
        metrics = json.loads(st_cal["outputs"]["metrics"])
        assert metrics["roundtrip_z_rmse_frac"] < 0.02
        calib = json.load(open(st_cal["outputs"]["calibration"]))
        assert set(calib) >= {"qx", "qy", "z_range", "window"}

        st = json.load(open(os.path.join(loc_out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        rows = open(st["outputs"]["emitters"]).read().strip().split("\n")
        assert rows[0] == "t,z,y,x,sigma_y,sigma_x,amplitude,background"
        got = [tuple(map(float, r.split(","))) for r in rows[1:]]
        assert len(got) == 2
        for cz, cy, cx in truth:
            r = min(got, key=lambda g: abs(g[2] - cy) + abs(g[3] - cx))
            assert abs(r[2] - cy) < 0.1 and abs(r[3] - cx) < 0.1
            assert abs(r[1] - cz) < 25.0, (cz, r)  # ~2% of the 1200-unit range

    def test_localize_data_parallel_matches_streaming(self, server_env):
        """data_parallel: true (frames sharded over the 8-device virtual
        mesh) produces the same emitters as the streaming path, including
        a tail chunk shorter than the device count."""
        cfg_srv, tmp = server_env
        rng = np.random.default_rng(7)
        n_t = 11  # not a multiple of 8: exercises tail padding
        frames = rng.normal(10.0, 0.5, (n_t, 48, 48)).astype(np.float32)
        yy, xx = np.mgrid[:48, :48]
        for t in range(n_t):
            for cy, cx in [(12.3 + t * 0.1, 30.6), (35.8, 15.2 - t * 0.1)]:
                frames[t] += 80.0 * np.exp(
                    -((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * 1.5**2)
                )
        path = str(tmp / "dp_em.tif")
        tiff.write_stack(path, frames)
        srv = ImageServer(cfg_srv)
        outs = {}
        for name, extra in (("stream", {}), ("dp", {"data_parallel": True})):
            out = str(tmp / f"dp_{name}_out")
            submit_job(cfg_srv.jobs_dir,
                       {"module": "localize_emitters",
                        "params": {"threshold_sigmas": 8, "btrack": True,
                                   **extra},
                        "input": [path], "output": out})
            assert srv.poll_once()
            st = json.load(open(os.path.join(out, "status.json")))
            assert st["state"] == "complete", st.get("error")
            outs[name] = st
        assert int(outs["dp"]["outputs"]["n_devices"]) > 1
        assert (outs["dp"]["outputs"]["n_emitters"]
                == outs["stream"]["outputs"]["n_emitters"])
        rows = {}
        for name, st in outs.items():
            lines = open(st["outputs"]["emitters"]).read().strip().split("\n")
            rows[name] = np.asarray(
                [[float(v) for v in r.split(",")] for r in lines[1:]]
            )
        np.testing.assert_allclose(rows["dp"], rows["stream"], atol=1e-4)
        import h5py

        with h5py.File(outs["dp"]["outputs"]["objects"]) as fd, \
                h5py.File(outs["stream"]["outputs"]["objects"]) as fs:
            np.testing.assert_allclose(
                fd["objects/obj_type_1/coords"][:],
                fs["objects/obj_type_1/coords"][:], atol=1e-4,
            )

    def test_smlm_workflow_chain(self, server_env):
        """Full SMLM story filed up front: calibrate -> astigmatic
        localize (z_scale-consistent btrack units) -> track. One emitter
        walks laterally while defocusing; the tracker must produce a
        single track whose z trend matches truth."""
        cfg_srv, tmp = server_env
        zs = np.linspace(-600, 600, 17)
        scan = np.stack(
            [self._astig_frame([(z, 15.7, 16.2)], (32, 32), seed=9)
             for z in zs]
        )
        scan_path = str(tmp / "smlm_beads.tif")
        tiff.write_stack(scan_path, scan)

        # one emitter moving +1 px/frame in y and +80 units/frame in z
        n_t = 5
        truth = [(-160.0 + 80.0 * t, 20.0 + 1.0 * t, 32.0) for t in range(n_t)]
        frames = np.stack(
            [self._astig_frame([truth[t]], seed=20 + t) for t in range(n_t)]
        )
        frames_path = str(tmp / "smlm_frames.tif")
        tiff.write_stack(frames_path, frames)

        cal_out = str(tmp / "smlm_cal")
        loc_out = str(tmp / "smlm_loc")
        trk_out = str(tmp / "smlm_trk")
        z_scale = 0.01  # calibration units -> xy-pixel units
        submit_job(cfg_srv.jobs_dir,
                   {"module": "calibrate_astigmatism",
                    "params": {"z_start": -600.0, "z_step": 75.0},
                    "input": [scan_path], "output": cal_out}, job_id="c")
        submit_job(cfg_srv.jobs_dir,
                   {"module": "localize_emitters",
                    "params": {"astigmatism": cal_out, "threshold": 40,
                               "btrack": True, "z_scale": z_scale},
                    "input": [frames_path], "output": loc_out,
                    "depends_on": [cal_out]}, job_id="l")
        submit_job(cfg_srv.jobs_dir,
                   {"module": "track_objects",
                    "params": {"max_distance": 5},
                    "input": [os.path.join(loc_out, "objects.h5")],
                    "output": trk_out,
                    "depends_on": [loc_out]}, job_id="t")
        srv = ImageServer(cfg_srv)
        deadline = time.time() + 180
        while time.time() < deadline:
            srv.poll_once()
            if os.path.exists(os.path.join(trk_out, "status.json")):
                break
            time.sleep(0.1)
        st = json.load(open(os.path.join(trk_out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        rows = open(st["outputs"]["tracks"]).read().strip().split("\n")
        hdr = rows[0].split(",")
        data = [dict(zip(hdr, r.split(","))) for r in rows[1:]]
        assert len({d["track_id"] for d in data}) == 1  # one unbroken track
        assert len(data) == n_t
        data.sort(key=lambda d: float(d["t"]))
        # z column is in btrack (scaled) units; trend matches truth
        # (window=15 default: measured 0.4%-of-range axial RMSE)
        z_fit = np.polyfit(
            [float(d["t"]) for d in data],
            [float(d["z"]) for d in data], 1,
        )[0]
        assert abs(z_fit - 80.0 * z_scale) < 0.1 * 80.0 * z_scale
        y_fit = np.polyfit(
            [float(d["t"]) for d in data],
            [float(d["y"]) for d in data], 1,
        )[0]
        assert abs(y_fit - 1.0) < 0.05

    def test_localize_corrupt_midstream_fails_fast(self, server_env,
                                                   monkeypatch):
        """A read error mid-stream (corrupt page past the validated
        headers) is deterministic: the streaming path must convert it to
        a JobError and fail without burning retries (review finding)."""
        from sequitr_tpu.data.source import FrameSource

        cfg_srv, tmp = server_env
        path = str(tmp / "mid.tif")
        tiff.write_stack(path, np.zeros((3, 16, 16), np.float32))
        orig = FrameSource.frame

        def bad(self, i):
            if i == 1:
                raise ValueError("corrupt LZW strip in page 1")
            return orig(self, i)

        monkeypatch.setattr(FrameSource, "frame", bad)
        out = str(tmp / "mid_out")
        submit_job(cfg_srv.jobs_dir,
                   {"module": "localize_emitters", "params": {"threshold": 5},
                    "input": [path], "output": out})
        srv = ImageServer(cfg_srv)
        t0 = time.time()
        assert srv.poll_once()
        elapsed = time.time() - t0
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "failed"
        assert "corrupt LZW strip" in st["error"]
        assert elapsed < cfg_srv.retry_backoff + 1.0  # no retry burn

    def test_localize_3d_data_parallel_matches_streaming(self, server_env):
        """dims=3 + data_parallel: TIMEPOINTS sharded over the virtual
        mesh produce the same emitters as the streaming volumetric path
        (11 timepoints over 8 devices: tail padding exercised)."""
        cfg_srv, tmp = server_env
        vols = tmp / "dp3d_vols"
        os.makedirs(vols)
        rng = np.random.default_rng(17)
        n_t = 11
        for t in range(n_t):
            truth = [(4.0 + 0.2 * t, 12.0 + 0.5 * t, 25.0),
                     (8.0, 30.0, 10.0 + 0.3 * t)]
            tiff.write_stack(
                str(vols / f"v_t{t:02d}.tif"),
                self._emitter_volume(truth, seed=100 + t),
            )
        srv = ImageServer(cfg_srv)
        outs = {}
        for name, extra in (("st", {}), ("dp", {"data_parallel": True})):
            out = str(tmp / f"dp3d_{name}_out")
            submit_job(cfg_srv.jobs_dir,
                       {"module": "localize_emitters",
                        "params": {"dims": 3, "threshold": 100,
                                   "sigma": 1.4, "sigma_z": 1.4, **extra},
                        "input": [str(vols)], "output": out})
            assert srv.poll_once()
            st = json.load(open(os.path.join(out, "status.json")))
            assert st["state"] == "complete", st.get("error")
            outs[name] = st
        assert int(outs["dp"]["outputs"]["n_devices"]) > 1
        a = open(outs["dp"]["outputs"]["emitters"]).read()
        b = open(outs["st"]["outputs"]["emitters"]).read()
        assert a.split("\n")[0] == "t,z,y,x,amplitude,background"
        ra = np.asarray([[float(v) for v in r.split(",")]
                         for r in a.strip().split("\n")[1:]])
        rb = np.asarray([[float(v) for v in r.split(",")]
                         for r in b.strip().split("\n")[1:]])
        assert ra.shape == rb.shape == (2 * n_t, 6)
        np.testing.assert_allclose(ra, rb, atol=1e-4)

    def test_localize_astig_data_parallel_matches_streaming(
        self, server_env
    ):
        """astigmatism + data_parallel: frames sharded over the virtual
        mesh produce the same emitters.csv as the streaming astigmatic
        path (11 frames over 8 devices: tail padding exercised)."""
        import jax as _jax

        if _jax.device_count() < 2:
            pytest.skip("needs the virtual multi-device mesh")
        cfg_srv, tmp = server_env
        frames = np.stack(
            [
                TestEmitterPipeline._astig_frame(
                    [(250.0 - 40 * t, 20.5, 40.2),
                     (-380.0 + 30 * t, 45.1, 18.7)],
                    seed=50 + t,
                )
                for t in range(11)
            ]
        )
        path = str(tmp / "dpa.tif")
        tiff.write_stack(path, frames)
        # the analytic curve matching _astig_widths (sigma^2 quadratics)
        calib = {"qx": [1.05625e-05, -0.0063375, 2.640625],
                 "qy": [1.05625e-05, 0.0063375, 2.640625],
                 "z_range": [-600.0, 600.0]}
        srv = ImageServer(cfg_srv)
        outs = {}
        for name, extra in (("st", {}), ("dp", {"data_parallel": True})):
            out = str(tmp / f"dpa_{name}")
            submit_job(cfg_srv.jobs_dir,
                       {"module": "localize_emitters",
                        "params": {"astigmatism": calib,
                                   "threshold": 40, **extra},
                        "input": [path], "output": out})
            assert srv.poll_once()
            st = json.load(open(os.path.join(out, "status.json")))
            assert st["state"] == "complete", st.get("error")
            outs[name] = st
        assert int(outs["dp"]["outputs"]["n_devices"]) > 1
        a = open(outs["dp"]["outputs"]["emitters"]).read()
        b = open(outs["st"]["outputs"]["emitters"]).read()
        assert a.split("\n")[0] == (
            "t,z,y,x,sigma_y,sigma_x,amplitude,background"
        )
        ra = np.asarray([[float(v) for v in r.split(",")]
                         for r in a.strip().split("\n")[1:]])
        rb = np.asarray([[float(v) for v in r.split(",")]
                         for r in b.strip().split("\n")[1:]])
        assert ra.shape == rb.shape == (22, 8)
        np.testing.assert_allclose(ra, rb, atol=1e-3)

    def test_astig_structurally_bad_calibration_fails_fast(self, server_env):
        """'qx': 1 hits len() on an int (TypeError) — as deterministic as
        a ValueError; must fail fast, not burn retries (review finding)."""
        cfg_srv, tmp = server_env
        path = str(tmp / "f.tif")
        tiff.write_stack(path, np.zeros((1, 16, 16), np.float32))
        cal = str(tmp / "bad_cal.json")
        with open(cal, "w") as f:
            json.dump({"qx": 1, "qy": [0, 0, 1], "z_range": [-1, 1]}, f)
        out = str(tmp / "badcal_out")
        submit_job(cfg_srv.jobs_dir,
                   {"module": "localize_emitters",
                    "params": {"astigmatism": cal, "threshold": 5},
                    "input": [path], "output": out})
        srv = ImageServer(cfg_srv)
        t0 = time.time()
        assert srv.poll_once()
        elapsed = time.time() - t0
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "failed"
        assert "astigmatism" in st["error"]
        assert elapsed < cfg_srv.retry_backoff + 1.0  # no retry burn

    def test_astig_btrack_without_z_scale_warns(self, server_env):
        """Mixed units out of the box (calibration z next to pixel x/y)
        surface as a status warning, not silently useless tracking."""
        cfg_srv, tmp = server_env
        frame_path = str(tmp / "aw.tif")
        tiff.write_stack(frame_path, self._astig_frame([(100.0, 30.0, 30.0)]))
        out = str(tmp / "aw_out")
        submit_job(cfg_srv.jobs_dir,
                   {"module": "localize_emitters",
                    "params": {"astigmatism": {
                        "qx": [1.05625e-05, -0.0063375, 2.640625],
                        "qy": [1.05625e-05, 0.0063375, 2.640625],
                        "z_range": [-600.0, 600.0]},
                        "threshold": 40, "btrack": True},
                    "input": [frame_path], "output": out})
        srv = ImageServer(cfg_srv)
        assert srv.poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        assert any("z_scale" in w for w in st.get("warnings", []))

        # setting z_scale silences it
        out2 = str(tmp / "aw2_out")
        submit_job(cfg_srv.jobs_dir,
                   {"module": "localize_emitters",
                    "params": {"astigmatism": {
                        "qx": [1.05625e-05, -0.0063375, 2.640625],
                        "qy": [1.05625e-05, 0.0063375, 2.640625],
                        "z_range": [-600.0, 600.0]},
                        "threshold": 40, "btrack": True, "z_scale": 0.01},
                    "input": [frame_path], "output": out2})
        assert srv.poll_once()
        st2 = json.load(open(os.path.join(out2, "status.json")))
        assert st2["state"] == "complete", st2.get("error")
        assert not any("z_scale" in w for w in st2.get("warnings", []))

    def test_localize_astig_rejects_dims3(self, server_env):
        cfg_srv, tmp = server_env
        path = str(tmp / "x.tif")
        tiff.write_stack(path, np.zeros((2, 16, 16), np.float32))
        out = str(tmp / "bad_out")
        submit_job(cfg_srv.jobs_dir,
                   {"module": "localize_emitters",
                    "params": {"dims": 3, "astigmatism": {"qx": [0, 0, 1],
                               "qy": [0, 0, 1], "z_range": [-1, 1]}},
                    "input": [path], "output": out})
        srv = ImageServer(cfg_srv)
        assert srv.poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "failed"
        assert "does not combine" in st["error"]

    def test_calibrate_missing_z_params_fails_fast(self, server_env):
        cfg_srv, tmp = server_env
        path = str(tmp / "beads0.tif")
        tiff.write_stack(path, np.zeros((5, 16, 16), np.float32))
        out = str(tmp / "calbad_out")
        submit_job(cfg_srv.jobs_dir,
                   {"module": "calibrate_astigmatism", "params": {},
                    "input": [path], "output": out})
        srv = ImageServer(cfg_srv)
        assert srv.poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "failed"
        assert "z_positions" in st["error"]


class TestSupervisorRecycleE2E:
    def test_wedged_job_recycles_worker_and_queue_continues(self, tmp_path):
        """Full-stack recycle: a real supervisor subprocess, a worker wedged
        by a never-returning pipeline, the watchdog fails the job, the
        worker self-exits, the supervisor respawns it, and the NEXT job
        completes on the clean process (round-2 verdict weak #6 'done')."""
        import subprocess
        import sys

        jobs = tmp_path / "jobs"
        models = tmp_path / "models"
        os.makedirs(jobs, exist_ok=True)
        cfgp = tmp_path / "server.json"
        # job_timeout must outlast the LEGIT job's cold jax compile on a
        # loaded 1-core host (measured >3 s under full-suite pressure) while
        # still tripping on the wedge (which sleeps 3600 s)
        ServerConfiguration(
            jobs_dir=str(jobs), models_dir=str(models), poll_interval=0.3,
            job_timeout=45.0,
        ).to_json(str(cfgp))
        out1, out2 = tmp_path / "o1", tmp_path / "o2"
        submit_job(
            str(jobs),
            {"module": "__test_wedge__", "input": [], "output": str(out1)},
            job_id="wedge",
        )
        stack = np.zeros((1, 16, 16), np.float32)
        stack[0, 8, 8] = 100.0
        tiff.write_stack(str(tmp_path / "em.tif"), stack)
        submit_job(
            str(jobs),
            {"module": "localize_emitters", "params": {"threshold": 50},
             "input": [str(tmp_path / "em.tif")], "output": str(out2)},
            job_id="after",
        )
        env = dict(
            os.environ, SEQUITR_TEST_WEDGE="1", SEQUITR_FORCE_CPU="1"
        )
        log_f = open(tmp_path / "supervisor.log", "w")
        # --workers 2 engages the supervisor (1 worker = direct server)
        proc = subprocess.Popen(
            [sys.executable, "-m", "sequitr_tpu", "serve", "--workers", "2",
             "--jobs-dir", str(jobs), "--models-dir", str(models),
             "--config", str(cfgp), "--poll-interval", "0.3"],
            env=env, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))), stdout=log_f, stderr=log_f,
        )
        try:
            # generous: under full-suite memory pressure on a 1-core host,
            # two worker jax startups (~40 s each unloaded) stretch a lot
            deadline = time.time() + 420
            st1 = st2 = None
            recycled = False

            def read_terminal(out_dir):
                p = out_dir / "status.json"
                if p.exists():
                    got = json.loads(p.read_text())
                    if got.get("state") in ("complete", "failed"):
                        return got
                return None

            while time.time() < deadline:
                st1 = st1 or read_terminal(out1)
                st2 = st2 or read_terminal(out2)
                recycled = recycled or (
                    "recycled after job timeout"
                    in (tmp_path / "supervisor.log").read_text()
                )
                if st1 is not None and st2 is not None and recycled:
                    break
                time.sleep(1.0)
            log_txt = (tmp_path / "supervisor.log").read_text()
            assert st1 is not None and st1["state"] == "failed" and (
                "job_timeout" in st1["error"]
            ), (st1, log_txt[-2000:])
            assert st2 is not None and st2["state"] == "complete", (
                st2, log_txt[-2000:]
            )
            assert recycled, log_txt[-2000:]
        finally:
            proc.terminate()
            proc.wait(timeout=30)
            log_f.close()


class TestJobsLedger:
    def test_ledger_records_outcomes(self, server_env, tmp_path):
        """log_dir enables a server-wide jobs.jsonl ledger: one row per
        finished job with state/elapsed/attempts."""
        import dataclasses as dc

        from sequitr_tpu.server.server import PipelineRegistry

        cfg_srv, tmp = server_env
        log_dir = str(tmp / "logs")
        os.makedirs(log_dir)
        cfg_srv = dc.replace(cfg_srv, log_dir=log_dir, max_retries=0)
        reg = PipelineRegistry()

        @reg.register("ok")
        def ok(job, config):
            return {"x": "1"}

        @reg.register("boom")
        def boom(job, config):
            raise RuntimeError("nope")

        srv = ImageServer(cfg_srv, registry=reg)
        submit_job(cfg_srv.jobs_dir,
                   {"module": "ok", "input": [], "output": str(tmp / "l1")},
                   job_id="l1")
        submit_job(cfg_srv.jobs_dir,
                   {"module": "boom", "input": [], "output": str(tmp / "l2")},
                   job_id="l2")
        assert srv.poll_once() and srv.poll_once()
        rows = [
            json.loads(line)
            for line in open(os.path.join(log_dir, "jobs.jsonl"))
        ]
        by_id = {r["id"]: r for r in rows}
        assert by_id["l1"]["state"] == "complete"
        assert by_id["l2"]["state"] == "failed"
        assert all("elapsed_s" in r and "attempts" in r for r in rows)


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


class TestDeconvolvePipeline:
    def test_deconvolve_sharpens_blurred_points(self, server_env):
        """RL deconvolution through the job API: a Gaussian-blurred point
        source gets sharper (higher peak, same location)."""
        from sequitr_tpu import psf

        cfg_srv, tmp = server_env
        import jax.numpy as jnp_

        rng = np.random.default_rng(0)
        clean = np.zeros((2, 48, 48), np.float32)
        clean[0, 16, 20] = 100.0
        clean[1, 30, 10] = 80.0
        kernel = np.asarray(psf.gaussian_psf_2d(9, 1.5))
        blurred = np.stack(
            [np.asarray(psf.psf_convolve(jnp_.asarray(f), jnp_.asarray(kernel)))
             for f in clean]
        ).astype(np.float32)
        stack_path = str(tmp / "blur.tif")
        tiff.write_stack(stack_path, blurred)
        out = str(tmp / "dc")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "deconvolve",
             "params": {"iterations": 30, "sigma": 1.5, "psf_size": 9},
             "input": [stack_path], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        deconv = tiff.read_stack(st["outputs"]["deconvolved"])
        assert deconv.shape == (2, 48, 48)
        for t in range(2):
            # peak sharpens substantially and stays put
            assert deconv[t].max() > 2.0 * blurred[t].max()
            np.testing.assert_array_equal(
                np.unravel_index(deconv[t].argmax(), deconv[t].shape),
                np.unravel_index(clean[t].argmax(), clean[t].shape),
            )

    def test_deconvolve_3d_volume(self, server_env):
        cfg_srv, tmp = server_env
        vol = np.zeros((8, 16, 16), np.float32)
        vol[4, 8, 8] = 50.0
        vol_path = str(tmp / "v.tif")
        tiff.write_stack(vol_path, vol)
        out = str(tmp / "dc3")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "deconvolve",
             "params": {"dims": 3, "iterations": 5, "sigma": 1.0,
                        "psf_size": 5, "psf_size_z": 3, "sigma_z": 1.0},
             "input": [vol_path], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        deconv = tiff.read_stack(st["outputs"]["deconvolved"])
        assert deconv.shape == (8, 16, 16)
        assert np.all(np.isfinite(deconv))

    def test_deconvolve_3d_timelapse(self, server_env):
        """dims=3 over a volume SEQUENCE: per-timepoint outputs through
        one cached graph, equal to the single-volume pipeline's result;
        frame_range selects timepoints (absolute naming)."""
        from sequitr_tpu import psf  # noqa: F401  (parity with single)

        cfg_srv, tmp = server_env
        d = tmp / "vols"
        d.mkdir()
        vols = []
        for t in range(3):
            v = np.zeros((8, 16, 16), np.float32)
            v[4, 6 + 2 * t, 8] = 50.0
            vols.append(v)
            tiff.write_stack(str(d / f"t_{t}.tif"), v)
        params = {"dims": 3, "iterations": 5, "sigma": 1.0,
                  "psf_size": 5, "psf_size_z": 3, "sigma_z": 1.0}
        out = str(tmp / "dct")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "deconvolve",
             "params": dict(params, frame_range=[1, 3]),
             "input": [str(d)], "output": out},
        )
        srv = ImageServer(cfg_srv)
        assert srv.poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        names = sorted(
            n for n in os.listdir(out) if n.startswith("deconvolved_t")
        )
        assert names == ["deconvolved_t0001.tif", "deconvolved_t0002.tif"]
        # per-timepoint result equals the single-volume pipeline's
        single_out = str(tmp / "dc1")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "deconvolve", "params": params,
             "input": [str(d / "t_1.tif")], "output": single_out},
        )
        assert srv.poll_once()
        s1 = json.load(open(os.path.join(single_out, "status.json")))
        assert s1["state"] == "complete", s1.get("error")
        np.testing.assert_array_equal(
            tiff.read_stack(os.path.join(out, "deconvolved_t0001.tif")),
            tiff.read_stack(s1["outputs"]["deconvolved"]),
        )

    def test_bad_iterations_fails_fast(self, server_env):
        cfg_srv, tmp = server_env
        p = str(tmp / "x.tif")
        tiff.write_stack(p, np.zeros((1, 8, 8), np.float32))
        out = str(tmp / "dcx")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "deconvolve", "params": {"iterations": 0},
             "input": [p], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "failed" and "iterations" in st["error"]


class TestQueueSemantics:
    def test_jobs_claimed_oldest_first(self, server_env):
        import time as _time

        cfg, tmp = server_env
        ids = []
        for i in range(3):
            ids.append(
                submit_job(cfg.jobs_dir, {"module": "m", "output": str(tmp / f"o{i}")},
                           job_id=f"j{i}")
            )
            _time.sleep(0.02)  # distinct mtimes
        order = [claim_job(p).id for p in scan_jobs(cfg.jobs_dir)]
        assert order == ids

    def test_custom_registry_isolated(self, server_env):
        from sequitr_tpu.server import PipelineRegistry

        cfg, tmp = server_env
        reg = PipelineRegistry()

        @reg.register("echo")
        def echo(job, config):
            return {"echo": job.params.get("msg", "")}

        out = str(tmp / "echo_out")
        submit_job(cfg.jobs_dir, {"module": "echo", "params": {"msg": "hi"},
                                  "input": [], "output": out})
        srv = ImageServer(cfg, registry=reg)
        assert srv.poll_once()
        status = json.load(open(os.path.join(out, "status.json")))
        assert status["state"] == "complete"
        assert status["outputs"]["echo"] == "hi"
        # builtin pipelines are NOT in the custom registry
        assert "segmentation_unet2d" not in reg.names()

    def test_failed_job_leaves_marker_file(self, server_env):
        cfg, tmp = server_env
        out = str(tmp / "failout")
        submit_job(cfg.jobs_dir, {"module": "segmentation_unet2d",
                                  "params": {"model": "missing"},
                                  "input": [], "output": out})
        assert ImageServer(cfg).poll_once()
        leftovers = os.listdir(cfg.jobs_dir)
        assert any(n.endswith(".failed") for n in leftovers)
        assert not any(n.endswith(".running") for n in leftovers)


class TestModelForwardCompat:
    def test_load_model_ignores_unknown_config_fields(self, tmp_path, caplog):
        """A model saved by a NEWER version may carry config fields this
        version doesn't know; load_model must drop them with a warning
        instead of refusing to load (new fields default on save)."""
        import jax
        import jax.numpy as jnp

        from sequitr_tpu.models import unet
        from sequitr_tpu.server import load_model, save_model

        cfg = unet.UNetConfig(
            in_channels=1, num_classes=2, depth=2, base_features=2,
            norm="none", compute_dtype=jnp.float32,
        )
        params, state = unet.init(jax.random.PRNGKey(0), cfg)
        mdir = save_model(str(tmp_path), "fwd", "unet", cfg, params, state)

        cfg_path = os.path.join(mdir, "config.json")
        d = json.load(open(cfg_path))
        d["frobnication_mode"] = "aggressive"  # field from "the future"
        json.dump(d, open(cfg_path, "w"))

        kind, cfg2, params2, _ = load_model(str(tmp_path), "fwd")
        assert kind == "unet" and cfg2 == cfg
        assert any("frobnication_mode" in r.message for r in caplog.records)

    def test_server_starts_with_unusable_cache_dir(self, tmp_path, caplog):
        """An unwritable/occupied compilation cache path must degrade to a
        warning, never block server startup (the cache is an optimization)."""
        from sequitr_tpu.config import ServerConfiguration
        from sequitr_tpu.server import ImageServer

        squatter = tmp_path / "cachefile"
        squatter.write_text("not a directory")
        cfg = ServerConfiguration(
            jobs_dir=str(tmp_path / "jobs"),
            models_dir=str(tmp_path / "models"),
            compilation_cache_dir=str(squatter),  # a FILE, makedirs fails
        )
        srv = ImageServer(cfg)  # must not raise
        assert srv.poll_once() is False
        assert any("compilation cache" in r.message for r in caplog.records)

    def test_emitters_btrack_trailing_empty_frames(self, server_env):
        """Frames after the last detection still get (empty) map rows so a
        per-frame consumer sees the full movie (code-review finding)."""
        import h5py

        cfg_srv, tmp = server_env
        rng = np.random.default_rng(2)
        frames = rng.normal(10.0, 0.5, (4, 32, 32)).astype(np.float32)
        yy, xx = np.mgrid[:32, :32]
        # emitters only in frame 0; frames 1-3 are background
        frames[0] += 80.0 * np.exp(-((yy - 16.0) ** 2 + (xx - 16.0) ** 2) / (2 * 1.5**2))
        path = str(tmp / "em_tail.tif")
        tiff.write_stack(path, frames)
        out = str(tmp / "em_tail_out")
        submit_job(cfg_srv.jobs_dir,
                   {"module": "localize_emitters",
                    "params": {"threshold_sigmas": 8, "btrack": True},
                    "input": [path], "output": out})
        srv = ImageServer(cfg_srv)
        assert srv.poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        with h5py.File(st["outputs"]["objects"]) as f:
            fmap = f["objects/obj_type_1/map"][:]
        assert fmap.shape == (4, 2)  # ALL source frames, not just tmax+1
        assert fmap[0].tolist() == [0, 1]
        for row in fmap[1:]:
            assert row[0] == row[1] == 1  # empty per-frame slices


class TestFinetuneSpatial:
    """finetune_spatial: giant-frame training through the job API
    (round-4 extension of verdict item 7 — the spatial_parallel TRAIN
    counterpart)."""

    def _register(self, cfg_srv, name="giant"):
        import jax
        import jax.numpy as jnp

        from sequitr_tpu.models import unet as unet_lib
        from sequitr_tpu.server.server import save_model

        mcfg = unet_lib.UNetConfig(
            in_channels=1, num_classes=2, depth=2, base_features=2,
            norm="batch", compute_dtype=jnp.float32,
        )
        params, state = unet_lib.init(jax.random.PRNGKey(0), mcfg)
        save_model(cfg_srv.models_dir, name, "unet", mcfg, params, state)
        return mcfg

    def _stack(self, tmp, h=32, w=16, n=2):
        rng = np.random.default_rng(3)
        images = rng.gamma(2.0, 50.0, (n, h, w)).astype(np.float32)
        labels = (images > np.median(images)).astype(np.uint16)
        img_path, lab_path = str(tmp / "gi.tif"), str(tmp / "gl.tif")
        tiff.write_stack(img_path, images)
        tiff.write_stack(lab_path, labels)
        return img_path, lab_path

    def test_finetune_from_registered_model(self, server_env):
        cfg_srv, tmp = server_env
        self._register(cfg_srv)
        img_path, lab_path = self._stack(tmp)
        out = str(tmp / "ft_out")
        submit_job(
            cfg_srv.jobs_dir,
            {
                "module": "finetune_spatial",
                "params": {
                    "model": "giant_ft", "from_model": "giant",
                    "steps": 3, "learning_rate": 1e-4, "log_every": 1,
                },
                "input": [img_path, lab_path],
                "output": out,
            },
        )
        srv = ImageServer(cfg_srv)
        assert srv.poll_once()
        status = json.load(open(os.path.join(out, "status.json")))
        assert status["state"] == "complete", status.get("error")
        from sequitr_tpu.server import load_model

        kind, mcfg, params, state = load_model(cfg_srv.models_dir, "giant_ft")
        assert kind == "unet"
        rows = [
            json.loads(l)
            for l in open(status["outputs"]["metrics_file"])
        ]
        train_rows = [r for r in rows if r["kind"] == "train"]
        assert train_rows and np.isfinite(train_rows[-1]["loss"])
        # the finetuned weights moved away from the source model
        _, _, src_params, _ = load_model(cfg_srv.models_dir, "giant")
        import jax

        deltas = [
            float(np.abs(np.asarray(a) - np.asarray(b)).max())
            for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(src_params))
        ]
        assert max(deltas) > 0

    def test_bad_height_is_deterministic_joberror(self, server_env):
        """An H not divisible by mesh x pooling fails fast (no retry)."""
        import dataclasses as dc

        cfg_srv, tmp = server_env
        cfg_srv = dc.replace(cfg_srv, max_retries=3)
        self._register(cfg_srv)
        img_path, lab_path = self._stack(tmp, h=24)
        out = str(tmp / "bad_out")
        submit_job(
            cfg_srv.jobs_dir,
            {
                "module": "finetune_spatial",
                "params": {"model": "x_ft", "from_model": "giant", "steps": 2},
                "input": [img_path, lab_path],
                "output": out,
            },
        )
        srv = ImageServer(cfg_srv)
        assert srv.poll_once()
        status = json.load(open(os.path.join(out, "status.json")))
        assert status["state"] == "failed"
        assert "divisible" in status["error"]
        assert status.get("attempts", 1) == 1  # JobError: never retried


class TestUNet3DTimelapse:
    """3D + time: a sequence of volumes served through one cached graph,
    one btrack objects.h5 spanning all timepoints."""

    def _model(self, cfg_srv):
        net_cfg = unet.UNetConfig(
            in_channels=1, num_classes=2, depth=2, base_features=2, dims=3,
            compute_dtype=jnp.float32,
        )
        params, state = unet.init(jax.random.PRNGKey(0), net_cfg)
        save_model(
            cfg_srv.models_dir, "seg3dt", "unet", net_cfg, params, state
        )

    def _volumes(self, n=3, shape=(6, 24, 24), seed=5):
        rng = np.random.default_rng(seed)
        vols = []
        for t in range(n):
            v = rng.normal(80.0, 8.0, shape).astype(np.float32)
            # one bright blob per volume, drifting over t
            z0, y0, x0 = 2, 6 + 3 * t, 8 + 2 * t
            v[z0 : z0 + 2, y0 : y0 + 6, x0 : x0 + 6] += 800.0
            vols.append(v)
        return vols

    def test_directory_sequence_end_to_end(self, server_env):
        cfg_srv, tmp = server_env
        self._model(cfg_srv)
        vols = self._volumes()
        d = tmp / "tl"
        d.mkdir()
        for t, v in enumerate(vols):
            tiff.write_stack(str(d / f"t_{t}.tif"), v)
        out_dir = str(tmp / "out")
        submit_job(
            cfg_srv.jobs_dir,
            {
                "module": "segmentation_unet3d",
                "params": {"model": "seg3dt", "patch": [4, 16, 16],
                           "overlap": [2, 4, 4]},
                "input": [str(d)],
                "output": out_dir,
            },
        )
        srv = ImageServer(cfg_srv)
        assert srv.poll_once()
        status = json.load(open(os.path.join(out_dir, "status.json")))
        assert status["state"] == "complete", status.get("error")
        metrics = json.loads(status["outputs"]["metrics"])
        assert metrics["n_volumes"] == 3
        # per-timepoint labels match the single-volume pipeline exactly
        single_out = str(tmp / "single")
        submit_job(
            cfg_srv.jobs_dir,
            {
                "module": "segmentation_unet3d",
                "params": {"model": "seg3dt", "patch": [4, 16, 16],
                           "overlap": [2, 4, 4]},
                "input": [str(d / "t_1.tif")],
                "output": single_out,
            },
        )
        assert srv.poll_once()
        s1 = json.load(open(os.path.join(single_out, "status.json")))
        assert s1["state"] == "complete", s1.get("error")
        lt1 = tiff.read_stack(os.path.join(out_dir, "labels_t0001.tif"))
        ls = tiff.read_stack(s1["outputs"]["labels"])
        np.testing.assert_array_equal(lt1, ls)
        # ONE objects.h5 spanning all timepoints, t ascending with drift
        import h5py

        with h5py.File(status["outputs"]["objects"]) as f:
            coords = f["objects/obj_type_1/coords"][:]
            m = f["objects/obj_type_1/map"][:]
        assert m.shape[0] == 3
        assert set(np.unique(coords[:, 0].astype(int))) == {0, 1, 2}

    def test_single_file_z_mode_and_frame_range(self, server_env):
        cfg_srv, tmp = server_env
        self._model(cfg_srv)
        vols = self._volumes(n=4)
        flat = np.concatenate(vols, axis=0)  # (4*6, 24, 24) pages
        hyper = str(tmp / "hyper.tif")
        tiff.write_stack(hyper, flat)
        out_dir = str(tmp / "out")
        submit_job(
            cfg_srv.jobs_dir,
            {
                "module": "segmentation_unet3d",
                "params": {
                    "model": "seg3dt", "patch": [4, 16, 16],
                    "overlap": [2, 4, 4], "z": 6, "frame_range": [1, 3],
                },
                "input": [hyper],
                "output": out_dir,
            },
        )
        assert ImageServer(cfg_srv).poll_once()
        status = json.load(open(os.path.join(out_dir, "status.json")))
        assert status["state"] == "complete", status.get("error")
        # absolute timepoint naming and map rows through frame_range
        names = sorted(
            n for n in os.listdir(out_dir) if n.startswith("labels_t")
        )
        assert names == ["labels_t0001.tif", "labels_t0002.tif"]
        import h5py

        with h5py.File(status["outputs"]["objects"]) as f:
            m = f["objects/obj_type_1/map"][:]
            coords = f["objects/obj_type_1/coords"][:]
        assert m.shape[0] == 3  # frames 0..2 (absolute), frame 0 empty
        assert m[0, 0] == m[0, 1]  # no objects at the unserved frame 0
        assert set(np.unique(coords[:, 0].astype(int))) == {1, 2}

    def test_single_file_directory_is_a_timelapse(self, server_env):
        """A directory holding ONE volume file is a 1-timepoint
        timelapse (per-timepoint naming), not the bare-volume path —
        which would crash opening the directory as a file."""
        cfg_srv, tmp = server_env
        self._model(cfg_srv)
        d = tmp / "tl"
        d.mkdir()
        tiff.write_stack(str(d / "t_0.tif"), self._volumes(n=1)[0])
        out_dir = str(tmp / "out")
        submit_job(
            cfg_srv.jobs_dir,
            {
                "module": "segmentation_unet3d",
                "params": {"model": "seg3dt", "patch": [4, 16, 16],
                           "overlap": [2, 4, 4], "save_entropy": True},
                "input": [str(d)],
                "output": out_dir,
            },
        )
        assert ImageServer(cfg_srv).poll_once()
        status = json.load(open(os.path.join(out_dir, "status.json")))
        assert status["state"] == "complete", status.get("error")
        assert os.path.exists(os.path.join(out_dir, "labels_t0000.tif"))
        assert os.path.exists(os.path.join(out_dir, "entropy_t0000.tif"))
        # the standard output keys exist for consumers that iterate them
        assert status["outputs"]["entropy"] == out_dir

    def test_malformed_z_fails_fast(self, server_env):
        cfg_srv, tmp = server_env
        self._model(cfg_srv)
        tiff.write_stack(str(tmp / "h.tif"), self._volumes(n=1)[0])
        out_dir = str(tmp / "out")
        submit_job(
            cfg_srv.jobs_dir,
            {
                "module": "segmentation_unet3d",
                "params": {"model": "seg3dt", "z": "six"},
                "input": [str(tmp / "h.tif")],
                "output": out_dir,
            },
        )
        assert ImageServer(cfg_srv).poll_once()
        status = json.load(open(os.path.join(out_dir, "status.json")))
        assert status["state"] == "failed"
        assert "pages per volume" in status["error"]

    def test_spatial_parallel_rejected_for_timelapse(self, server_env):
        cfg_srv, tmp = server_env
        self._model(cfg_srv)
        d = tmp / "tl"
        d.mkdir()
        for t, v in enumerate(self._volumes(n=2)):
            tiff.write_stack(str(d / f"t_{t}.tif"), v)
        out_dir = str(tmp / "out")
        submit_job(
            cfg_srv.jobs_dir,
            {
                "module": "segmentation_unet3d",
                "params": {"model": "seg3dt", "spatial_parallel": True},
                "input": [str(d)],
                "output": out_dir,
            },
        )
        assert ImageServer(cfg_srv).poll_once()
        status = json.load(open(os.path.join(out_dir, "status.json")))
        assert status["state"] == "failed"
        assert "single-volume" in status["error"]


class TestMosaicPipeline:
    """stitch_mosaic: grid-of-tiles composite through the job API."""

    @staticmethod
    def _scene(shape, seed):
        from sequitr_tpu.data.synthetic import bandlimited_scene

        return bandlimited_scene(
            shape, np.random.default_rng(seed), sigma=0.1, amp=60.0
        )

    def _write_grid(self, tmp, r=2, c=2, h=96, w=96, ov=20, seed=11):
        """Integer-jittered grid cut from one scene; returns (dir, scene,
        true row-major positions)."""
        scene = self._scene((300, 300), seed)
        d = tmp / f"tiles_{seed}"
        os.makedirs(d)
        rng = np.random.default_rng(seed + 1)
        pos = []
        for ri in range(r):
            for ci in range(c):
                jy, jx = (0, 0) if (ri, ci) == (0, 0) else rng.integers(
                    -2, 3, 2
                )
                y0 = ri * (h - ov) + 6 + int(jy)
                x0 = ci * (w - ov) + 6 + int(jx)
                tiff.write_stack(
                    str(d / f"tile_{ri}_{ci}.tif"),
                    scene[None, y0 : y0 + h, x0 : x0 + w],
                )
                pos.append((y0, x0))
        return d, scene, np.asarray(pos, float)

    def test_stitch_e2e(self, server_env):
        """Directory of tiles -> mosaic.tif + positions.csv + seams.csv;
        integer mode reproduces the scene exactly where covered."""
        cfg_srv, tmp = server_env
        d, scene, pos = self._write_grid(tmp)
        out = str(tmp / "mosaic_out")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "stitch_mosaic",
             "params": {"grid": [2, 2], "overlap": 20,
                        "subpixel": False},
             "input": [str(d)], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        m = json.loads(st["outputs"]["metrics"])
        assert m["rms_residual_px"] < 0.05
        assert m["n_low_confidence"] == 0
        got_pos = np.loadtxt(
            st["outputs"]["positions"], delimiter=",", skiprows=1
        )[:, 3:]
        rel = pos - pos.min(axis=0, keepdims=True)
        np.testing.assert_allclose(got_pos, rel, atol=0.01)
        mosaic_img = np.asarray(tiff.read_stack(st["outputs"]["mosaic"]))
        if mosaic_img.ndim == 3:
            mosaic_img = mosaic_img[0]
        oy, ox = int(pos[:, 0].min()), int(pos[:, 1].min())
        want = scene[oy : oy + m["canvas_h"], ox : ox + m["canvas_w"]]
        covered = np.zeros(mosaic_img.shape, bool)
        for y0, x0 in rel.astype(int):
            covered[y0 : y0 + 96, x0 : x0 + 96] = True
        np.testing.assert_allclose(
            mosaic_img[covered], want[covered], atol=2e-4
        )
        seams = open(st["outputs"]["seams"]).read().strip().split("\n")
        assert seams[0] == "i,j,dy,dx,response,used"
        assert len(seams) == 1 + 4  # 2x2 grid: 2 horizontal + 2 vertical

    def test_backend_cpu_matches_device_and_rejects_combos(self, server_env):
        """backend: "cpu" pins the stitch to the host backend (the win on
        relay-latency-bound small grids — BASELINE.md FINAL-2) with
        byte-equal outputs on this CPU-pinned suite; bad values and the
        data_parallel combination are deterministic JobErrors."""
        cfg_srv, tmp = server_env
        d, _, _ = self._write_grid(tmp, seed=17)
        srv = ImageServer(cfg_srv)
        outs = {}
        for be in ("device", "cpu"):
            out = str(tmp / f"m_{be}")
            submit_job(
                cfg_srv.jobs_dir,
                {"module": "stitch_mosaic",
                 "params": {"grid": [2, 2], "overlap": 20, "backend": be},
                 "input": [str(d)], "output": out},
            )
            assert srv.poll_once()
            st = json.load(open(os.path.join(out, "status.json")))
            assert st["state"] == "complete", st.get("error")
            outs[be] = np.asarray(tiff.read_stack(st["outputs"]["mosaic"]))
        np.testing.assert_array_equal(outs["cpu"], outs["device"])

        for params, frag in [
            ({"grid": [2, 2], "backend": "gpu"}, "backend"),
            ({"grid": [2, 2], "backend": "cpu", "data_parallel": True},
             "data_parallel"),
        ]:
            out = str(tmp / f"bad_{frag}_{params['backend']}")
            submit_job(
                cfg_srv.jobs_dir,
                {"module": "stitch_mosaic", "params": params,
                 "input": [str(d)], "output": out},
            )
            assert srv.poll_once()
            st = json.load(open(os.path.join(out, "status.json")))
            assert st["state"] == "failed" and frag in st["error"]

    def test_backend_auto_policy(self, server_env, monkeypatch):
        """backend: "auto" = the continuation-6 measurement as policy —
        host for <=16-seam grids on an accelerator default backend,
        device otherwise; the resolved choice lands in the outputs."""
        from sequitr_tpu.server.server import _resolve_mosaic_backend

        mk = lambda params: Job(
            id="t", module="stitch_mosaic", func="run",
            params=params, input=[], output="", path="",
        )
        # accelerator default: small grid -> host, big scan -> device,
        # data_parallel always device, malformed grid -> device (the
        # body then rejects it loudly)
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        assert _resolve_mosaic_backend(
            mk({"backend": "auto", "grid": [3, 3]})) == "cpu"
        assert _resolve_mosaic_backend(
            mk({"backend": "auto", "grid": [20, 20]})) == "device"
        assert _resolve_mosaic_backend(
            mk({"backend": "auto", "grid": [3, 3], "data_parallel": True})
        ) == "device"
        assert _resolve_mosaic_backend(
            mk({"backend": "auto", "grid": "nope"})) == "device"
        # host default: nothing to pin away from
        monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
        assert _resolve_mosaic_backend(
            mk({"backend": "auto", "grid": [3, 3]})) == "device"

        # e2e: auto completes and reports the resolved backend
        cfg_srv, tmp = server_env
        d, _, _ = self._write_grid(tmp, seed=23)
        out = str(tmp / "m_auto")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "stitch_mosaic",
             "params": {"grid": [2, 2], "overlap": 20, "backend": "auto"},
             "input": [str(d)], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        assert st["outputs"]["backend"] in ("cpu", "device")

    def test_estimate_only_and_snake(self, server_env):
        cfg_srv, tmp = server_env
        d, _, pos = self._write_grid(tmp, seed=21)
        # snake acquisition order: rename row-1 tiles in reverse order
        # (acquisition order c=1 then c=0) and stitch with order=snake
        snake_d = tmp / "snake_tiles"
        os.makedirs(snake_d)
        names = sorted(os.listdir(d))  # tile_0_0, 0_1, 1_0, 1_1
        acq = [names[0], names[1], names[3], names[2]]
        for k, n in enumerate(acq):
            os.link(str(d / n), str(snake_d / f"acq_{k}.tif"))
        out = str(tmp / "snake_out")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "stitch_mosaic",
             "params": {"grid": [2, 2], "overlap": 20, "order": "snake",
                        "estimate_only": True, "subpixel": False},
             "input": [str(snake_d)], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        assert "mosaic" not in st["outputs"]
        got_pos = np.loadtxt(
            st["outputs"]["positions"], delimiter=",", skiprows=1
        )[:, 3:]
        rel = pos - pos.min(axis=0, keepdims=True)
        np.testing.assert_allclose(got_pos, rel, atol=0.01)

    @pytest.mark.parametrize(
        "params,frag",
        [
            ({}, "grid"),
            ({"grid": [2]}, "grid"),
            # bool is an int subclass: must still be rejected
            ({"grid": [True, 2]}, "grid"),
            ({"grid": [2, 2], "order": "spiral"}, "order"),
            ({"grid": [2, 2], "overlap": 2}, "overlap"),
            ({"grid": [2, 2], "refine": 0}, "refine"),
            ({"grid": [2, 2], "min_response": "x"}, "min_response"),
            ({"grid": [3, 2]}, "tiles"),
        ],
    )
    def test_param_validation(self, server_env, params, frag):
        cfg_srv, tmp = server_env
        d, _, _ = self._write_grid(tmp, seed=31)
        out = str(tmp / f"bad_{frag}_{len(params)}")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "stitch_mosaic", "params": params,
             "input": [str(d)], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "failed"
        assert frag in st["error"]

    def test_stitch_data_parallel_matches_single(self, server_env):
        """data_parallel seam estimation produces identical outputs (2x3
        grid: 7 seams over 8 virtual devices exercises pad-to-mesh)."""
        import jax as _jax

        if _jax.device_count() < 2:
            pytest.skip("needs the virtual multi-device mesh")
        cfg_srv, tmp = server_env
        d, _, _ = self._write_grid(tmp, r=2, c=3, seed=41)
        srv = ImageServer(cfg_srv)
        outs = {}
        for name, extra in (("st", {}), ("dp", {"data_parallel": True})):
            out = str(tmp / f"dpmos_{name}")
            submit_job(
                cfg_srv.jobs_dir,
                {"module": "stitch_mosaic",
                 "params": {"grid": [2, 3], "overlap": 20, **extra},
                 "input": [str(d)], "output": out},
            )
            assert srv.poll_once()
            st = json.load(open(os.path.join(out, "status.json")))
            assert st["state"] == "complete", st.get("error")
            outs[name] = st
        m_dp = json.loads(outs["dp"]["outputs"]["metrics"])
        assert m_dp["n_devices"] > 1
        a = open(outs["dp"]["outputs"]["positions"]).read()
        b = open(outs["st"]["outputs"]["positions"]).read()
        pa = np.loadtxt(a.splitlines(), delimiter=",", skiprows=1)
        pb = np.loadtxt(b.splitlines(), delimiter=",", skiprows=1)
        np.testing.assert_allclose(pa, pb, atol=1e-4)
        ma = tiff.read_stack(outs["dp"]["outputs"]["mosaic"])
        mb = tiff.read_stack(outs["st"]["outputs"]["mosaic"])
        np.testing.assert_allclose(
            np.asarray(ma), np.asarray(mb), atol=1e-4
        )

    def test_multichannel_shared_positions(self, server_env):
        """One input entry per channel: seams ride channel 0, the same
        positions composite every channel (integer mode: exact)."""
        cfg_srv, tmp = server_env
        scene = self._scene((300, 300), 51)
        scene2 = (0.5 * scene + 30.0).astype(np.float32)
        d0, d1 = tmp / "mc_c0", tmp / "mc_c1"
        os.makedirs(d0)
        os.makedirs(d1)
        rng = np.random.default_rng(52)
        h = w = 96
        ov = 20
        pos = []
        for ri in range(2):
            for ci in range(2):
                jy, jx = (0, 0) if (ri, ci) == (0, 0) else rng.integers(
                    -2, 3, 2
                )
                y0 = ri * (h - ov) + 6 + int(jy)
                x0 = ci * (w - ov) + 6 + int(jx)
                for d, sc in ((d0, scene), (d1, scene2)):
                    tiff.write_stack(
                        str(d / f"tile_{ri}_{ci}.tif"),
                        sc[None, y0 : y0 + h, x0 : x0 + w],
                    )
                pos.append((y0, x0))
        pos = np.asarray(pos, float)
        out = str(tmp / "mc_out")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "stitch_mosaic",
             "params": {"grid": [2, 2], "overlap": 20,
                        "subpixel": False},
             "input": [str(d0), str(d1)], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        assert "mosaic" not in st["outputs"]  # per-channel names
        rel = (pos - pos.min(axis=0, keepdims=True)).astype(int)
        oy, ox = int(pos[:, 0].min()), int(pos[:, 1].min())
        m = json.loads(st["outputs"]["metrics"])
        for key, sc in (("mosaic_c0", scene), ("mosaic_c1", scene2)):
            img = np.asarray(tiff.read_stack(st["outputs"][key]))
            if img.ndim == 3:
                img = img[0]
            covered = np.zeros(img.shape, bool)
            for y0, x0 in rel:
                covered[y0 : y0 + h, x0 : x0 + w] = True
            want = sc[oy : oy + m["canvas_h"], ox : ox + m["canvas_w"]]
            np.testing.assert_allclose(
                img[covered], want[covered], atol=2e-4, err_msg=key
            )

    def test_channel_count_mismatch_fails(self, server_env):
        cfg_srv, tmp = server_env
        d0, _, _ = self._write_grid(tmp, seed=61)
        d1 = tmp / "short_chan"
        os.makedirs(d1)
        # channel 1 has only 3 tiles for a 2x2 grid
        for k, n in enumerate(sorted(os.listdir(d0))[:3]):
            os.link(str(d0 / n), str(d1 / n))
        out = str(tmp / "mc_bad")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "stitch_mosaic",
             "params": {"grid": [2, 2], "overlap": 20},
             "input": [str(d0), str(d1)], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "failed"
        assert "channel 1" in st["error"] and "disagrees" in st["error"]

    def test_timelapse_streams_per_timepoint(self, server_env):
        """timelapse: true — R*C per-position T-page stacks composite
        into a T-page mosaic with positions estimated once (integer
        mode: every timepoint exact where covered)."""
        cfg_srv, tmp = server_env
        scene = self._scene((300, 300), 71)
        h = w = 96
        ov = 20
        n_t = 3
        d = tmp / "tl_tiles"
        os.makedirs(d)
        rng = np.random.default_rng(72)
        pos = []
        # time variation: a global per-timepoint gain (content evolves,
        # geometry does not)
        gains = [1.0, 1.3, 0.8]
        for ri in range(2):
            for ci in range(2):
                jy, jx = (0, 0) if (ri, ci) == (0, 0) else rng.integers(
                    -2, 3, 2
                )
                y0 = ri * (h - ov) + 6 + int(jy)
                x0 = ci * (w - ov) + 6 + int(jx)
                stack = np.stack(
                    [g * scene[y0 : y0 + h, x0 : x0 + w] for g in gains]
                )
                tiff.write_stack(str(d / f"pos_{ri}_{ci}.tif"), stack)
                pos.append((y0, x0))
        pos = np.asarray(pos, float)
        out = str(tmp / "tl_out")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "stitch_mosaic",
             "params": {"grid": [2, 2], "overlap": 20,
                        "subpixel": False, "timelapse": True},
             "input": [str(d)], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        m = json.loads(st["outputs"]["metrics"])
        assert m["n_timepoints"] == n_t
        mos = np.asarray(tiff.read_stack(st["outputs"]["mosaic"]))
        assert mos.shape == (n_t, m["canvas_h"], m["canvas_w"])
        rel = (pos - pos.min(axis=0, keepdims=True)).astype(int)
        oy, ox = int(pos[:, 0].min()), int(pos[:, 1].min())
        covered = np.zeros(mos.shape[1:], bool)
        for y0, x0 in rel:
            covered[y0 : y0 + h, x0 : x0 + w] = True
        for t, g in enumerate(gains):
            want = g * scene[
                oy : oy + m["canvas_h"], ox : ox + m["canvas_w"]
            ]
            np.testing.assert_allclose(
                mos[t][covered], want[covered], atol=5e-4,
                err_msg=f"t={t}",
            )

    def test_timelapse_length_mismatch_fails(self, server_env):
        cfg_srv, tmp = server_env
        d = tmp / "tl_bad"
        os.makedirs(d)
        rng = np.random.default_rng(73)
        for k in range(4):
            n_pages = 3 if k != 2 else 2  # one position short
            tiff.write_stack(
                str(d / f"pos_{k}.tif"),
                rng.normal(100, 10, (n_pages, 64, 64)).astype(np.float32),
            )
        out = str(tmp / "tl_bad_out")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "stitch_mosaic",
             "params": {"grid": [2, 2], "overlap": 16,
                        "timelapse": True},
             "input": [str(d)], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "failed"
        assert "disagrees" in st["error"]

    def test_tile_pool_fd_cap(self, tmp_path):
        """_TilePool never holds more than max_open readers: round-robin
        access beyond the budget evicts LRU and re-opens correctly."""
        from sequitr_tpu.server.server import _TilePool

        paths = []
        for k in range(6):
            pth = str(tmp_path / f"p{k}.tif")
            tiff.write_stack(
                pth, np.full((2, 8, 8), float(k), np.float32)
            )
            paths.append(pth)
        pool = _TilePool(paths)
        assert pool.max_open >= 8  # at least the floor
        pool.max_open = 2  # force eviction pressure
        for t in range(2):
            for k in range(6):
                f = np.asarray(pool.source(k).frame(t))
                assert float(f[0, 0]) == float(k)
                assert len(pool._open) <= 2
        pool.close()
        assert len(pool._open) == 0

    def test_flatfield_removes_vignetting(self, server_env):
        """flatfield: true — a shared vignette is divided out; the
        corrected composite matches the scene (to a global gain) far
        better than the uncorrected one, and the profile range lands in
        the metrics."""
        cfg_srv, tmp = server_env
        scene = self._scene((300, 300), 81)
        h = w = 96
        ov = 20
        yy = np.linspace(-1, 1, h)[:, None]
        xx = np.linspace(-1, 1, w)[None, :]
        vig = (1.0 - 0.4 * (yy**2 + xx**2)).astype(np.float32)
        d = tmp / "vig_tiles"
        os.makedirs(d)
        rng = np.random.default_rng(82)
        pos = []
        for ri in range(2):
            for ci in range(2):
                jy, jx = (0, 0) if (ri, ci) == (0, 0) else rng.integers(
                    -2, 3, 2
                )
                y0 = ri * (h - ov) + 6 + int(jy)
                x0 = ci * (w - ov) + 6 + int(jx)
                tiff.write_stack(
                    str(d / f"t_{ri}_{ci}.tif"),
                    vig[None] * scene[None, y0 : y0 + h, x0 : x0 + w],
                )
                pos.append((y0, x0))
        pos = np.asarray(pos, float)
        rel = (pos - pos.min(axis=0, keepdims=True)).astype(int)
        oy, ox = int(pos[:, 0].min()), int(pos[:, 1].min())
        srv = ImageServer(cfg_srv)
        errs = {}
        for name, extra in (
            ("off", {}), ("on", {"flatfield": True}),
        ):
            out = str(tmp / f"ff_{name}")
            submit_job(
                cfg_srv.jobs_dir,
                {"module": "stitch_mosaic",
                 "params": {"grid": [2, 2], "overlap": 20,
                            "subpixel": False, **extra},
                 "input": [str(d)], "output": out},
            )
            assert srv.poll_once()
            st = json.load(open(os.path.join(out, "status.json")))
            assert st["state"] == "complete", st.get("error")
            m = json.loads(st["outputs"]["metrics"])
            img = np.asarray(tiff.read_stack(st["outputs"]["mosaic"]))
            if img.ndim == 3:
                img = img[0]
            covered = np.zeros(img.shape, bool)
            for y0, x0 in rel:
                covered[y0 : y0 + h, x0 : x0 + w] = True
            want = scene[oy : oy + m["canvas_h"], ox : ox + m["canvas_w"]]
            a, b = img[covered], want[covered]
            gain = a.mean() / b.mean()  # correction is up to a scale
            errs[name] = float(
                np.abs(a - gain * b).mean() / max(b.std(), 1e-9)
            )
            if name == "on":
                assert m["flatfield_min"] < 0.9 < 1.05 < m["flatfield_max"]
        assert errs["on"] < 0.25 * errs["off"], errs

    def test_match_gains_removes_seam_steps(self, server_env):
        """match_gains: per-tile photobleaching factors are solved from
        overlap ratios; the corrected composite matches the scene (to a
        global gain) far better than the uncorrected one."""
        cfg_srv, tmp = server_env
        scene = self._scene((300, 300), 91)
        h = w = 96
        ov = 20
        d = tmp / "bleach_tiles"
        os.makedirs(d)
        rng = np.random.default_rng(92)
        fade = [1.0, 0.85, 0.72, 0.6]  # photobleaching across the scan
        pos = []
        for k, (ri, ci) in enumerate(
            [(0, 0), (0, 1), (1, 0), (1, 1)]
        ):
            jy, jx = (0, 0) if k == 0 else rng.integers(-2, 3, 2)
            y0 = ri * (h - ov) + 6 + int(jy)
            x0 = ci * (w - ov) + 6 + int(jx)
            tiff.write_stack(
                str(d / f"t_{ri}_{ci}.tif"),
                fade[k] * scene[None, y0 : y0 + h, x0 : x0 + w],
            )
            pos.append((y0, x0))
        pos = np.asarray(pos, float)
        rel = (pos - pos.min(axis=0, keepdims=True)).astype(int)
        oy, ox = int(pos[:, 0].min()), int(pos[:, 1].min())
        srv = ImageServer(cfg_srv)
        errs = {}
        for name, extra in (("off", {}), ("on", {"match_gains": True})):
            out = str(tmp / f"mg_{name}")
            submit_job(
                cfg_srv.jobs_dir,
                {"module": "stitch_mosaic",
                 "params": {"grid": [2, 2], "overlap": 20,
                            "subpixel": False, **extra},
                 "input": [str(d)], "output": out},
            )
            assert srv.poll_once()
            st = json.load(open(os.path.join(out, "status.json")))
            assert st["state"] == "complete", st.get("error")
            m = json.loads(st["outputs"]["metrics"])
            img = np.asarray(tiff.read_stack(st["outputs"]["mosaic"]))
            if img.ndim == 3:
                img = img[0]
            covered = np.zeros(img.shape, bool)
            for y0, x0 in rel:
                covered[y0 : y0 + h, x0 : x0 + w] = True
            want = scene[oy : oy + m["canvas_h"], ox : ox + m["canvas_w"]]
            a, b = img[covered], want[covered]
            gain = a.mean() / b.mean()
            errs[name] = float(
                np.abs(a - gain * b).mean() / max(b.std(), 1e-9)
            )
            if name == "on":
                assert m["gain_min"] < 0.95 < 1.05 < m["gain_max"]
        assert errs["on"] < 0.15 * errs["off"], errs

    def test_positions_reuse_chain(self, server_env):
        """positions: <previous stitch output dir> — an estimate_only
        solve is reused by a later composite (chained via depends_on);
        output identical to estimating in-job."""
        cfg_srv, tmp = server_env
        d, scene, pos = self._write_grid(tmp, seed=95)
        est_out = str(tmp / "pos_est")
        reuse_out = str(tmp / "pos_reuse")
        direct_out = str(tmp / "pos_direct")
        base = {"module": "stitch_mosaic",
                "input": [str(d)]}
        submit_job(
            cfg_srv.jobs_dir,
            {**base, "params": {"grid": [2, 2], "overlap": 20,
                                "subpixel": False,
                                "estimate_only": True},
             "output": est_out},
        )
        submit_job(
            cfg_srv.jobs_dir,
            {**base, "params": {"grid": [2, 2], "overlap": 20,
                                "subpixel": False,
                                "positions": est_out},
             "output": reuse_out, "depends_on": est_out},
        )
        submit_job(
            cfg_srv.jobs_dir,
            {**base, "params": {"grid": [2, 2], "overlap": 20,
                                "subpixel": False},
             "output": direct_out},
        )
        srv = ImageServer(cfg_srv)
        for _ in range(3):
            assert srv.poll_once()
        sts = {}
        for out in (est_out, reuse_out, direct_out):
            st = json.load(open(os.path.join(out, "status.json")))
            assert st["state"] == "complete", (out, st.get("error"))
            sts[out] = st
        a = np.asarray(tiff.read_stack(sts[reuse_out]["outputs"]["mosaic"]))
        b = np.asarray(tiff.read_stack(sts[direct_out]["outputs"]["mosaic"]))
        np.testing.assert_allclose(a, b, atol=1e-5)
        # reused seams.csv is honest: header only (no seams measured)
        seams = open(sts[reuse_out]["outputs"]["seams"]).read().strip()
        assert seams == "i,j,dy,dx,response,used"

    @pytest.mark.parametrize(
        "given,frag",
        [
            ("/nonexistent/positions.csv", "cannot read positions"),
            ([[0, 0]], "positions for a 2x2 grid"),
            (7, "must be a positions.csv path"),
            # ragged inline list: deterministic, not a retry burn
            ([[0, 0], [1]], "inline positions"),
            # NaN would become INT64_MIN origins deep in the blend
            ([[0, 0], [0, 76], [76, 0], [None, 76]], "non-finite"),
        ],
    )
    def test_positions_reuse_validation(self, server_env, given, frag):
        cfg_srv, tmp = server_env
        d, _, _ = self._write_grid(tmp, seed=96)
        out = str(tmp / f"posbad_{frag[:6].strip()}")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "stitch_mosaic",
             "params": {"grid": [2, 2], "overlap": 20,
                        "positions": given},
             "input": [str(d)], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "failed"
        assert frag in st["error"]

    def test_flatfield_numeric_booleans(self, server_env):
        """flatfield: 1/0 are the hand-written JSON boolean spellings —
        1 behaves like true (order 2, never a plane fit), 0 like false;
        out-of-range orders fail deterministically."""
        cfg_srv, tmp = server_env
        d, _, _ = self._write_grid(tmp, seed=97)
        srv = ImageServer(cfg_srv)

        def run(ff):
            out = str(tmp / f"ffnum_{ff}")
            submit_job(
                cfg_srv.jobs_dir,
                {"module": "stitch_mosaic",
                 "params": {"grid": [2, 2], "overlap": 20,
                            "subpixel": False, "flatfield": ff},
                 "input": [str(d)], "output": out},
            )
            assert srv.poll_once()
            return json.load(open(os.path.join(out, "status.json")))

        st1 = run(1)
        assert st1["state"] == "complete", st1.get("error")
        assert "flatfield_min" in json.loads(st1["outputs"]["metrics"])
        st0 = run(0)
        assert st0["state"] == "complete", st0.get("error")
        assert "flatfield_min" not in json.loads(st0["outputs"]["metrics"])
        st7 = run(7)
        assert st7["state"] == "failed"
        assert "flatfield order 7" in st7["error"]

    def test_positions_reuse_skips_dp_setup(self, server_env):
        """data_parallel + positions: no seams are correlated, so the
        mesh is never built and n_devices stays out of the metrics."""
        import jax as _jax

        if _jax.device_count() < 2:
            pytest.skip("needs the virtual multi-device mesh")
        cfg_srv, tmp = server_env
        d, _, _ = self._write_grid(tmp, seed=98)
        est = str(tmp / "dp_pos_est")
        out = str(tmp / "dp_pos_out")
        srv = ImageServer(cfg_srv)
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "stitch_mosaic",
             "params": {"grid": [2, 2], "overlap": 20,
                        "subpixel": False, "estimate_only": True},
             "input": [str(d)], "output": est},
        )
        assert srv.poll_once()
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "stitch_mosaic",
             "params": {"grid": [2, 2], "overlap": 20,
                        "subpixel": False, "positions": est,
                        "data_parallel": True},
             "input": [str(d)], "output": out},
        )
        assert srv.poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        assert "n_devices" not in json.loads(st["outputs"]["metrics"])


class TestEarlyStopJob:
    def _records(self, cfg_srv, tmp, srv):
        rng = np.random.default_rng(5)
        images = rng.normal(0.1, 0.05, (8, 16, 16)).astype(np.float32)
        labels = np.zeros((8, 16, 16), np.int32)
        for i in range(8):
            images[i, 4:10, 4:10] += 1.0
            labels[i, 4:10, 4:10] = 1
        tiff.write_stack(str(tmp / "es_img.tif"), images)
        tiff.write_stack(
            str(tmp / "es_lab.tif"), labels.astype(np.uint16)
        )
        rec_dir = str(tmp / "es_recs")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "build_records",
             "params": {"num_classes": 2, "shard_size": 4},
             "input": [str(tmp / "es_img.tif"), str(tmp / "es_lab.tif")],
             "output": rec_dir},
        )
        assert srv.poll_once()
        st = json.load(open(os.path.join(rec_dir, "status.json")))
        assert st["state"] == "complete", st.get("error")
        return st["outputs"]["shards"]

    def test_early_stop_job(self, server_env):
        """train_unet2d early_stop_patience: a zero-LR run stops after
        patience stale evals instead of burning the step budget."""
        cfg_srv, tmp = server_env
        srv = ImageServer(cfg_srv)
        shards = self._records(cfg_srv, tmp, srv)
        out = str(tmp / "es_train")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "train_unet2d",
             "params": {"model": "es2d", "num_classes": 2, "depth": 2,
                        "base_features": 2, "norm": "none",
                        "compute_dtype": "float32", "steps": 100,
                        "batch_size": 2, "augment": False,
                        "learning_rate": 0.0, "holdout_every": 4,
                        "eval_every": 5, "early_stop_patience": 2},
             "input": [shards], "output": out},
        )
        assert srv.poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        rows = [json.loads(l) for l in open(st["outputs"]["metrics_file"])]
        stops = [r for r in rows if r["kind"] == "early_stop"]
        assert len(stops) == 1 and stops[0]["step"] == 15
        # the registered model exists despite the truncated run
        from sequitr_tpu.server import load_model

        load_model(cfg_srv.models_dir, "es2d")

    def test_early_stop_requires_holdout(self, server_env):
        cfg_srv, tmp = server_env
        srv = ImageServer(cfg_srv)
        shards = self._records(cfg_srv, tmp, srv)
        out = str(tmp / "es_bad")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "train_unet2d",
             "params": {"model": "esb", "num_classes": 2, "steps": 10,
                        "early_stop_patience": 2},
             "input": [shards], "output": out},
        )
        assert srv.poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "failed"
        assert "holdout_every" in st["error"]


class TestEMAJob:
    def test_registered_model_uses_ema_weights(self, server_env):
        """train_unet2d with ema_decay registers the EMA twin's weights,
        not the raw final ones; raw stays in ckpts/final for resume."""
        cfg_srv, tmp = server_env
        srv = ImageServer(cfg_srv)
        rng = np.random.default_rng(6)
        images = rng.normal(0.1, 0.05, (8, 16, 16)).astype(np.float32)
        labels = np.zeros((8, 16, 16), np.int32)
        for i in range(8):
            images[i, 4:10, 4:10] += 1.0
            labels[i, 4:10, 4:10] = 1
        tiff.write_stack(str(tmp / "ema_img.tif"), images)
        tiff.write_stack(str(tmp / "ema_lab.tif"), labels.astype(np.uint16))
        rec_dir = str(tmp / "ema_recs")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "build_records",
             "params": {"num_classes": 2, "shard_size": 4},
             "input": [str(tmp / "ema_img.tif"), str(tmp / "ema_lab.tif")],
             "output": rec_dir},
        )
        assert srv.poll_once()
        shards = json.load(
            open(os.path.join(rec_dir, "status.json"))
        )["outputs"]["shards"]
        out = str(tmp / "ema_train")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "train_unet2d",
             "params": {"model": "ema2d", "num_classes": 2, "depth": 2,
                        "base_features": 2, "norm": "none",
                        "compute_dtype": "float32", "steps": 10,
                        "batch_size": 2, "augment": False,
                        "learning_rate": 3e-2, "ema_decay": 0.9},
             "input": [shards], "output": out},
        )
        assert srv.poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        from sequitr_tpu.pipeline import train as train_lib
        from sequitr_tpu.server import load_model

        _, net_cfg, reg_params, _mstate = load_model(
            cfg_srv.models_dir, "ema2d"
        )
        ck = os.path.join(out, "ckpts")
        raw = train_lib.restore_checkpoint(
            os.path.join(ck, "final"), None
        )["params"]
        ema = train_lib.restore_checkpoint(
            os.path.join(ck, "ema_final"), None
        )
        reg_leaves = jax.tree.leaves(reg_params)
        ema_leaves = jax.tree.leaves(ema)
        raw_leaves = jax.tree.leaves(raw)
        assert any(
            np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-4
            for a, b in zip(reg_leaves, raw_leaves)
        )  # registered != raw final
        for a, b in zip(reg_leaves, ema_leaves):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6
            )  # registered == EMA twin

    @pytest.mark.parametrize(
        "params,frag",
        [
            ({"early_stop_patience": -5}, "must be >= 0"),
            ({"early_stop_patience": "x"}, "must be an integer"),
            ({"ema_decay": 1.0}, "must be in [0, 1)"),
            ({"ema_decay": "y"}, "must be a number"),
        ],
    )
    def test_bad_fit_params_fail_fast(self, server_env, params, frag):
        """Typo'd training params are deterministic: JobError, not a
        retried ValueError deep in the fit loop."""
        cfg_srv, tmp = server_env
        srv = ImageServer(cfg_srv)
        shards = TestEarlyStopJob._records(self, cfg_srv, tmp, srv)
        out = str(tmp / f"badfit_{frag[:8].strip()}")
        t0 = time.time()
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "train_unet2d",
             "params": {"model": "bf", "num_classes": 2, "steps": 5,
                        "holdout_every": 4, **params},
             "input": [shards], "output": out},
        )
        assert srv.poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "failed"
        assert frag in st["error"]
        assert time.time() - t0 < cfg_srv.retry_backoff + 25  # no retry burn


class TestObjectsCSV:
    def test_csv_matches_h5(self, server_env):
        """save_objects_csv: the CSV rows agree with the objects.h5
        tables (coords, area, intensity) — the zero-dependency QC
        surface next to the tracking contract."""
        from sequitr_tpu.models import unet as unet_lib
        from sequitr_tpu import localize as loc_lib

        cfg_srv, tmp = server_env
        cfg = unet_lib.UNetConfig(
            in_channels=1, num_classes=2, depth=2, base_features=2,
            norm="none", compute_dtype=jnp.float32,
        )
        params, state = unet_lib.init(jax.random.PRNGKey(0), cfg)
        save_model(cfg_srv.models_dir, "csvm", "unet", cfg, params, state)
        rng = np.random.default_rng(7)
        stack = rng.normal(0.1, 0.05, (3, 32, 32)).astype(np.float32)
        stack[:, 8:16, 8:16] += 2.0
        tiff.write_stack(str(tmp / "csv_in.tif"), stack)
        out = str(tmp / "csv_out")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "segmentation_unet2d",
             "params": {"model": "csvm", "save_objects_csv": True},
             "input": [str(tmp / "csv_in.tif")], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        csv_path = st["outputs"]["objects_csv"]
        rows = open(csv_path).read().strip().split("\n")
        assert rows[0] == "t,x,y,z,label,area,intensity_mean"
        tables = loc_lib.read_objects_h5(st["outputs"]["objects"])
        n_h5 = sum(len(tb) for tb in tables)
        assert len(rows) - 1 == n_h5
        if n_h5:
            got = np.asarray(
                [[float(v) for v in r.split(",")] for r in rows[1:]]
            )
            h5 = np.concatenate([tb.coords for tb in tables])
            np.testing.assert_allclose(got[:, :5], h5, atol=1e-3)
        # default off: no csv in a plain run
        out2 = str(tmp / "csv_off")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "segmentation_unet2d", "params": {"model": "csvm"},
             "input": [str(tmp / "csv_in.tif")], "output": out2},
        )
        assert ImageServer(cfg_srv).poll_once()
        st2 = json.load(open(os.path.join(out2, "status.json")))
        assert st2["state"] == "complete"
        assert "objects_csv" not in st2["outputs"]


class TestDeconvolveDP:
    def test_dp_matches_streaming(self, server_env):
        """deconvolve data_parallel: frames sharded over the virtual
        mesh produce the same deconvolved stack as streaming (11 frames
        over 8 devices: tail padding exercised)."""
        import jax as _jax

        if _jax.device_count() < 2:
            pytest.skip("needs the virtual multi-device mesh")
        cfg_srv, tmp = server_env
        rng = np.random.default_rng(8)
        stack = rng.gamma(2.0, 50.0, (11, 24, 24)).astype(np.float32)
        path = str(tmp / "dpd.tif")
        tiff.write_stack(path, stack)
        srv = ImageServer(cfg_srv)
        outs = {}
        for name, extra in (("st", {}), ("dp", {"data_parallel": True})):
            out = str(tmp / f"dpd_{name}")
            submit_job(
                cfg_srv.jobs_dir,
                {"module": "deconvolve",
                 "params": {"iterations": 4, "sigma": 1.2, **extra},
                 "input": [path], "output": out},
            )
            assert srv.poll_once()
            st = json.load(open(os.path.join(out, "status.json")))
            assert st["state"] == "complete", st.get("error")
            outs[name] = st
        m = json.loads(outs["dp"]["outputs"]["metrics"])
        assert m["n_devices"] > 1
        a = tiff.read_stack(os.path.join(str(tmp / "dpd_dp"), "deconvolved.tif"))
        b = tiff.read_stack(os.path.join(str(tmp / "dpd_st"), "deconvolved.tif"))
        assert np.asarray(a).shape == (11, 24, 24)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_dp_rejects_volume(self, server_env):
        cfg_srv, tmp = server_env
        path = str(tmp / "dpd3.tif")
        tiff.write_stack(path, np.zeros((4, 16, 16), np.float32))
        out = str(tmp / "dpd3_out")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "deconvolve",
             "params": {"dims": 3, "data_parallel": True},
             "input": [path], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "failed"
        assert "2D-only" in st["error"]


class TestAutoOverlapJob:
    def test_auto_overlap(self, server_env):
        """overlap: 'auto' — the hint is measured from the tiles
        (whole-tile wrap = -ov); positions still recovered exactly and
        the metrics record the estimation."""
        cfg_srv, tmp = server_env
        d, _, pos = TestMosaicPipeline()._write_grid(tmp, seed=99)
        out = str(tmp / "auto_out")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "stitch_mosaic",
             "params": {"grid": [2, 2], "overlap": "auto",
                        "subpixel": False},
             "input": [str(d)], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        m = json.loads(st["outputs"]["metrics"])
        assert m["overlap_estimated"] is True
        # estimates absorb the per-seam jitter (+/-2 px here); the strip
        # correlator refines sub-pixel, so nominal-scale accuracy is all
        # the hint needs
        assert abs(m["overlap_y"] - 20) <= 4 and abs(m["overlap_x"] - 20) <= 4
        got_pos = np.loadtxt(
            st["outputs"]["positions"], delimiter=",", skiprows=1
        )[:, 3:]
        rel = pos - pos.min(axis=0, keepdims=True)
        np.testing.assert_allclose(got_pos, rel, atol=0.01)

    def test_bad_overlap_string(self, server_env):
        cfg_srv, tmp = server_env
        d, _, _ = TestMosaicPipeline()._write_grid(tmp, seed=100)
        out = str(tmp / "badov_out")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "stitch_mosaic",
             "params": {"grid": [2, 2], "overlap": "automatic"},
             "input": [str(d)], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "failed"
        assert "'auto'" in st["error"]


class TestDeconvolveMultiChannel:
    def test_per_channel_outputs_match_separate_runs(self, server_env):
        """Multi-channel deconvolve (one entry per channel): each
        deconvolved_c{k}.tif is identical to deconvolving that channel
        alone; DP agrees too."""
        import jax as _jax

        cfg_srv, tmp = server_env
        rng = np.random.default_rng(9)
        c0 = rng.gamma(2.0, 50.0, (5, 24, 24)).astype(np.float32)
        c1 = rng.gamma(2.0, 80.0, (5, 24, 24)).astype(np.float32)
        tiff.write_stack(str(tmp / "mc0.tif"), c0)
        tiff.write_stack(str(tmp / "mc1.tif"), c1)
        srv = ImageServer(cfg_srv)

        def run(name, inputs, extra=None):
            out = str(tmp / name)
            submit_job(
                cfg_srv.jobs_dir,
                {"module": "deconvolve",
                 "params": {"iterations": 3, "sigma": 1.2,
                            **(extra or {})},
                 "input": inputs, "output": out},
            )
            assert srv.poll_once()
            st = json.load(open(os.path.join(out, "status.json")))
            assert st["state"] == "complete", st.get("error")
            return st

        mc = run("mc_both", [str(tmp / "mc0.tif"), str(tmp / "mc1.tif")])
        s0 = run("mc_only0", [str(tmp / "mc0.tif")])
        s1 = run("mc_only1", [str(tmp / "mc1.tif")])
        a0 = np.asarray(tiff.read_stack(mc["outputs"]["deconvolved_c0"]))
        a1 = np.asarray(tiff.read_stack(mc["outputs"]["deconvolved_c1"]))
        b0 = np.asarray(tiff.read_stack(s0["outputs"]["deconvolved"]))
        b1 = np.asarray(tiff.read_stack(s1["outputs"]["deconvolved"]))
        np.testing.assert_allclose(a0, b0, atol=1e-4)
        np.testing.assert_allclose(a1, b1, atol=1e-4)
        if _jax.device_count() >= 2:
            dp = run(
                "mc_dp",
                [str(tmp / "mc0.tif"), str(tmp / "mc1.tif")],
                {"data_parallel": True},
            )
            d0 = np.asarray(
                tiff.read_stack(dp["outputs"]["deconvolved_c0"])
            )
            np.testing.assert_allclose(d0, b0, atol=1e-4)

    def test_volume_multi_entry_rejected(self, server_env):
        """dims=3 with multiple entries must fail loudly, not silently
        deconvolve only the first file (review finding)."""
        cfg_srv, tmp = server_env
        for n in ("v0", "v1"):
            tiff.write_stack(
                str(tmp / f"{n}.tif"), np.zeros((4, 16, 16), np.float32)
            )
        out = str(tmp / "mc3d_out")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "deconvolve", "params": {"dims": 3},
             "input": [str(tmp / "v0.tif"), str(tmp / "v1.tif")],
             "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "failed"
        assert "2D-only" in st["error"]


class TestRoiServing:
    def test_localize_roi_coords_are_roi_local(self, server_env):
        """roi on localize_emitters: only emitters inside the region are
        found, at ROI-local coordinates (full-run coords minus origin);
        the graph never sees the rest of the frame."""
        cfg_srv, tmp = server_env
        rng = np.random.default_rng(11)
        frame = rng.normal(10.0, 0.5, (64, 64)).astype(np.float32)
        yy, xx = np.mgrid[:64, :64]
        truth = [(14.3, 20.6), (46.2, 50.4)]  # one in the roi, one out
        for cy, cx in truth:
            frame += 150.0 * np.exp(
                -((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * 1.4**2)
            )
        path = str(tmp / "roi_em.tif")
        tiff.write_stack(path, frame[None])
        srv = ImageServer(cfg_srv)
        out = str(tmp / "roi_em_out")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "localize_emitters",
             "params": {"threshold": 60, "roi": [4, 8, 32, 40]},
             "input": [path], "output": out},
        )
        assert srv.poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        rows = open(st["outputs"]["emitters"]).read().strip().split("\n")
        assert len(rows) == 2  # header + ONE emitter (the in-roi one)
        t, y, x, a, b = (float(v) for v in rows[1].split(","))
        assert abs(y - (14.3 - 4)) < 0.05 and abs(x - (20.6 - 8)) < 0.05

    def test_segmentation_roi_output_shape(self, server_env):
        from sequitr_tpu.models import unet as unet_lib

        cfg_srv, tmp = server_env
        cfg = unet_lib.UNetConfig(
            in_channels=1, num_classes=2, depth=2, base_features=2,
            norm="none", compute_dtype=jnp.float32,
        )
        params, state = unet_lib.init(jax.random.PRNGKey(0), cfg)
        save_model(cfg_srv.models_dir, "roim", "unet", cfg, params, state)
        stack = np.random.default_rng(12).normal(
            0.1, 0.05, (2, 64, 64)
        ).astype(np.float32)
        path = str(tmp / "roi_seg.tif")
        tiff.write_stack(path, stack)
        out = str(tmp / "roi_seg_out")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "segmentation_unet2d",
             "params": {"model": "roim", "roi": [8, 8, 40, 56]},
             "input": [path], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        labels = np.asarray(tiff.read_stack(st["outputs"]["labels"]))
        assert labels.shape == (2, 32, 48)

    @pytest.mark.parametrize(
        "roi,frag",
        [
            ([1, 2, 3], "must be"),
            ([0, 0, 999, 10], "bad roi"),
            (["a", 0, 8, 8], "must be"),
        ],
    )
    def test_roi_validation(self, server_env, roi, frag):
        cfg_srv, tmp = server_env
        path = str(tmp / "roiv.tif")
        tiff.write_stack(path, np.zeros((1, 16, 16), np.float32))
        out = str(tmp / f"roiv_{frag[:4]}_{len(str(roi))}")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "localize_emitters",
             "params": {"threshold": 10, "roi": roi},
             "input": [path], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "failed"
        assert frag in st["error"]


class TestCorruptInputFailsFast:
    """Mid-stack read errors are deterministic: one attempt, JobError.

    Serving loops pull frames through read-ahead producers; a corrupt
    page used to surface as a raw ValueError, burning max_retries
    re-runs against the same broken file (code-review r4). Every
    serving iterator is now wrapped in ``_reads_fail_fast``.
    """

    @staticmethod
    def _truncated_stack(tmp, n=6, size=32):
        """A stack whose first frame reads but a later frame raises.

        Plain truncation fails at TiffReader construction (strip bounds
        are validated eagerly); garbling the DEFLATE payload of the last
        frame keeps the structure valid and only the read-time zlib
        decode fails — the mid-stream case the serving loops hit."""
        path = str(tmp / "trunc.tif")
        stack = (
            np.random.default_rng(3).random((n, size, size)) * 100
        ).astype(np.float32)
        tiff.write_stack(path, stack, compression="deflate")
        with tiff.TiffReader(path) as r:
            off = int(r._frames[-1][3][0])
            cnt = int(r._frames[-1][4][0])
        with open(path, "r+b") as f:
            f.seek(off)
            f.write(bytes((i * 37 + 11) % 256 for i in range(cnt)))
        # preconditions: constructable, frame 0 fine, tail corrupt
        with tiff.TiffReader(path) as r:
            r.read_frame(0)
            with pytest.raises(ValueError):
                for t in range(n):
                    r.read_frame(t)
        return path

    @pytest.mark.parametrize("extra", [{}, {"data_parallel": True}])
    def test_segmentation_corrupt_midstack(self, server_env, extra):
        import dataclasses

        cfg_srv, tmp = server_env
        cfg_srv = dataclasses.replace(cfg_srv, log_dir=str(tmp / "logs"))
        cfg_srv.ensure_dirs()
        net_cfg = unet.UNetConfig(
            in_channels=1, num_classes=3, depth=2, base_features=4,
            compute_dtype=jnp.float32,
        )
        params, state = unet.init(jax.random.PRNGKey(0), net_cfg)
        save_model(cfg_srv.models_dir, "ff_seg", "unet", net_cfg, params, state)
        path = self._truncated_stack(tmp)
        out = str(tmp / f"out_{len(extra)}")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "segmentation_unet2d",
             "params": {"model": "ff_seg", "patch": [16, 16],
                        "overlap": [4, 4], "localize": False, **extra},
             "input": [path], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "failed"
        assert "JobError" in st["error"], st["error"]
        ledger = [
            json.loads(l)
            for l in open(os.path.join(str(tmp / "logs"), "jobs.jsonl"))
        ]
        assert ledger[-1]["attempts"] == 1, ledger[-1]

    def test_denoise_corrupt_midstack(self, server_env):
        import dataclasses

        cfg_srv, tmp = server_env
        cfg_srv = dataclasses.replace(cfg_srv, log_dir=str(tmp / "logs"))
        cfg_srv.ensure_dirs()
        net_cfg = unet.UNetConfig(
            in_channels=1, num_classes=1, depth=2, base_features=4,
            compute_dtype=jnp.float32,
        )
        params, state = unet.init(jax.random.PRNGKey(0), net_cfg)
        save_model(cfg_srv.models_dir, "ff_n2v", "n2v", net_cfg, params, state)
        path = self._truncated_stack(tmp)
        out = str(tmp / "out_den")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "denoise", "params": {"model": "ff_n2v"},
             "input": [path], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "failed"
        assert "JobError" in st["error"], st["error"]
        ledger = [
            json.loads(l)
            for l in open(os.path.join(str(tmp / "logs"), "jobs.jsonl"))
        ]
        assert ledger[-1]["attempts"] == 1, ledger[-1]
