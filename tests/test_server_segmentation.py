"""Segmentation-family pipeline tests (server.pipelines.segmentation + shared serving plumbing): 2D/3D serving, multi-channel, timelapse streaming, ROI, DP serving.

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


class TestPolyphaseServing:
    """``polyphase: true`` on segmentation_unet2d (models.polyphase):
    the exact thin-level reformulation must serve identically, and the
    uncovered combinations must fail as deterministic JobErrors."""

    def _model_and_stack(self, server_env, name="segpp", **cfg_kw):
        cfg_srv, tmp = server_env
        base = dict(
            in_channels=1, num_classes=3, depth=2, base_features=4,
            compute_dtype=jnp.float32,
        )
        base.update(cfg_kw)
        net_cfg = unet.UNetConfig(**base)
        params, state = unet.init(jax.random.PRNGKey(0), net_cfg)
        save_model(cfg_srv.models_dir, name, "unet", net_cfg, params, state)
        stack = (
            np.random.default_rng(7).random((2, 32, 32)) * 1000
        ).astype(np.float32)
        stack_path = str(tmp / f"stack_{name}.tif")
        tiff.write_stack(stack_path, stack)
        return cfg_srv, tmp, stack_path

    def _serve(self, cfg_srv, params, stack_path, out_dir):
        submit_job(
            cfg_srv.jobs_dir,
            {
                "module": "segmentation_unet2d",
                "params": params,
                "input": [stack_path],
                "output": out_dir,
            },
        )
        assert ImageServer(cfg_srv).poll_once()
        return json.load(open(os.path.join(out_dir, "status.json")))

    def test_matches_standard_serve(self, server_env):
        cfg_srv, tmp, stack_path = self._model_and_stack(server_env)
        base_params = {"model": "segpp", "patch": [32, 32],
                       "overlap": [0, 0], "localize": False}
        st0 = self._serve(cfg_srv, dict(base_params), stack_path,
                          str(tmp / "out_std"))
        assert st0["state"] == "complete", st0.get("error")
        st1 = self._serve(cfg_srv, dict(base_params, polyphase=True),
                          stack_path, str(tmp / "out_poly"))
        assert st1["state"] == "complete", st1.get("error")
        assert not st1.get("warnings"), st1.get("warnings")
        l0 = tiff.read_stack(st0["outputs"]["labels"])
        l1 = tiff.read_stack(st1["outputs"]["labels"])
        assert l0.shape == l1.shape
        assert np.mean(l0 == l1) >= 0.999

    def test_s2d_model_rejected(self, server_env):
        cfg_srv, tmp, stack_path = self._model_and_stack(
            server_env, name="segpps2", space_to_depth=2
        )
        st = self._serve(
            cfg_srv,
            {"model": "segpps2", "polyphase": True, "localize": False},
            stack_path, str(tmp / "out_pp_s2d"),
        )
        assert st["state"] == "failed"
        assert "polyphase" in st.get("error", "")

    def test_spatial_parallel_combo_rejected(self, server_env):
        cfg_srv, tmp, stack_path = self._model_and_stack(
            server_env, name="segppsp"
        )
        st = self._serve(
            cfg_srv,
            {"model": "segppsp", "polyphase": True,
             "spatial_parallel": True, "localize": False},
            stack_path, str(tmp / "out_pp_sp"),
        )
        assert st["state"] == "failed"
        assert "spatial_parallel" in st.get("error", "")

    def test_odd_patch_rejected(self, server_env):
        cfg_srv, tmp, stack_path = self._model_and_stack(
            server_env, name="segppodd", depth=1
        )
        st = self._serve(
            cfg_srv,
            {"model": "segppodd", "polyphase": True,
             "patch": [15, 15], "localize": False},
            stack_path, str(tmp / "out_pp_odd"),
        )
        assert st["state"] == "failed"
        assert "even H/W patch" in st.get("error", "")


class TestLabelsOnlyServing:
    """The default serve (no save_probs/save_entropy) runs the
    labels-only graph; its labels must match a save_probs serve
    bit-for-bit, and probs/entropy jobs must still produce maps."""

    def test_labels_identical_with_and_without_probs(self, server_env):
        cfg_srv, tmp = server_env
        net_cfg = unet.UNetConfig(
            in_channels=1, num_classes=3, depth=2, base_features=4,
            compute_dtype=jnp.float32,
        )
        params, state = unet.init(jax.random.PRNGKey(0), net_cfg)
        save_model(cfg_srv.models_dir, "seglo", "unet", net_cfg, params, state)
        stack = (
            np.random.default_rng(9).random((3, 32, 32)) * 900
        ).astype(np.float32)
        stack_path = str(tmp / "stack_lo.tif")
        tiff.write_stack(stack_path, stack)

        outs = {}
        for name, extra in (
            ("plain", {}),
            ("probs", {"save_probs": True}),
            ("batch", {"frame_batch": 3}),
        ):
            out_dir = str(tmp / f"out_lo_{name}")
            submit_job(
                cfg_srv.jobs_dir,
                {
                    "module": "segmentation_unet2d",
                    "params": {"model": "seglo", "patch": [32, 32],
                               "overlap": [0, 0], "localize": False,
                               **extra},
                    "input": [stack_path],
                    "output": out_dir,
                },
            )
            assert ImageServer(cfg_srv).poll_once()
            st = json.load(open(os.path.join(out_dir, "status.json")))
            assert st["state"] == "complete", st.get("error")
            outs[name] = st
        l_plain = tiff.read_stack(outs["plain"]["outputs"]["labels"])
        l_probs = tiff.read_stack(outs["probs"]["outputs"]["labels"])
        l_batch = tiff.read_stack(outs["batch"]["outputs"]["labels"])
        np.testing.assert_array_equal(l_plain, l_probs)
        np.testing.assert_array_equal(l_plain, l_batch)
        # the probs job still writes its maps
        assert os.path.exists(
            os.path.join(outs["probs"]["outputs"]["probs"])
        )
