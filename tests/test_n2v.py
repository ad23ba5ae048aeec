"""Tests: Noise2Void self-supervised denoising.

The denoising path for data with NO clean targets (the enhancement GAN's
requirement): blind-spot masking (train.make_n2v_train_step), the fit_n2v
loop over image-only record shards, the regression serving pass
(infer.make_denoiser / the ``denoise`` pipeline) and the ``train_n2v`` job.
Reference has no such subsystem (SURVEY.md provenance: mount empty) — this
is a framework extension; the spec is Krull et al. 2019 (CVPR).
"""

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sequitr_tpu.config import ServerConfiguration
from sequitr_tpu.data import records as records_lib
from sequitr_tpu.data import tiff
from sequitr_tpu.models import zoo
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


def _tiny_cfg(**kw):
    base = dict(depth=2, base_features=8, compute_dtype=jnp.float32)
    base.update(kw)
    return dataclasses.replace(zoo.get("n2v_denoise"), **base)


def _noisy_scene(rng, n, size=32, sigma=0.1):
    """(clean, noisy) stacks of smooth synthetic signal + iid Gaussian noise
    (the N2V noise model: pixelwise-independent, zero-mean)."""
    yy, xx = np.mgrid[0:size, 0:size]
    clean = 0.5 + 0.35 * np.sin(yy / 4.5) * np.cos(xx / 6.0)
    clean = np.broadcast_to(clean, (n, size, size)).astype(np.float32)
    noisy = clean + rng.normal(0, sigma, clean.shape).astype(np.float32)
    return clean, np.clip(noisy, 0.0, 1.0).astype(np.float32)


class TestMasking:
    def test_only_selected_pixels_change(self):
        rng = np.random.default_rng(0)
        imgs = jnp.asarray(rng.normal(0, 1, (3, 20, 24, 1)), jnp.float32)
        masked, ys, xs = train_lib.n2v_mask_batch(
            jax.random.PRNGKey(1), imgs, 16, 3
        )
        changed = np.argwhere(np.asarray(masked != imgs))
        assert len(changed) > 0
        sel = [
            set(zip(np.asarray(ys[b]).tolist(), np.asarray(xs[b]).tolist()))
            for b in range(3)
        ]
        for b, y, x, _c in changed:
            assert (y, x) in sel[b], (b, y, x)

    def test_replacement_is_a_window_neighbor(self):
        """Every masked value must equal SOME in-window neighbor's original
        value (continuous random data: value equality identifies the
        source pixel almost surely)."""
        rng = np.random.default_rng(1)
        img = jnp.asarray(rng.normal(0, 1, (1, 16, 16, 1)), jnp.float32)
        radius = 2
        masked, ys, xs = train_lib.n2v_mask_batch(
            jax.random.PRNGKey(2), img, 12, radius
        )
        m0, i0 = np.asarray(masked[0, ..., 0]), np.asarray(img[0, ..., 0])
        for y, x in zip(np.asarray(ys[0]), np.asarray(xs[0])):
            win = i0[
                max(0, y - radius):y + radius + 1,
                max(0, x - radius):x + radius + 1,
            ]
            assert np.isclose(win, m0[y, x]).any(), (y, x)

    def test_never_the_pixel_itself_even_at_borders(self):
        """Identity leak check: with continuous random data, the masked
        value must differ from the ORIGINAL at every masked position — in
        particular at corners/edges where reflected neighbor offsets can
        land back on the source pixel."""
        rng = np.random.default_rng(2)
        img = jnp.asarray(rng.normal(0, 1, (1, 6, 6, 1)), jnp.float32)
        # radius > image span forces heavy reflection; many picks hit the
        # border-reflection self-map unless the tie-break handles it
        for k in range(8):
            masked, ys, xs = train_lib.n2v_mask_batch(
                jax.random.PRNGKey(k), img, 30, 5
            )
            m0, i0 = np.asarray(masked[0, ..., 0]), np.asarray(img[0, ..., 0])
            for y, x in zip(np.asarray(ys[0]), np.asarray(xs[0])):
                assert m0[y, x] != i0[y, x], (k, y, x)

    def test_loss_sees_only_masked_pixels(self):
        """The gradient of the masked MSE w.r.t. predictions must be zero
        everywhere off the mask (the blind-spot contract)."""
        rng = np.random.default_rng(3)
        pred = jnp.asarray(rng.normal(0, 1, (2, 12, 12, 1)), jnp.float32)
        target = jnp.asarray(rng.normal(0, 1, (2, 12, 12, 1)), jnp.float32)
        ys = jnp.asarray([[1, 5], [3, 7]], jnp.int32)
        xs = jnp.asarray([[2, 9], [4, 0]], jnp.int32)
        g = jax.grad(
            lambda p: train_lib.n2v_masked_mse(p, target, ys, xs)
        )(pred)
        g = np.asarray(g)
        on = np.zeros(g.shape, bool)
        for b in range(2):
            for y, x in zip(np.asarray(ys[b]), np.asarray(xs[b])):
                on[b, y, x] = True
        assert (g[~on] == 0).all()
        assert (g[on] != 0).all()

    def test_param_validation(self):
        cfg = _tiny_cfg()
        tc = train_lib.TrainConfig()
        with pytest.raises(ValueError, match="mask_frac"):
            train_lib.make_n2v_train_step(cfg, tc, mask_frac=0.0)
        with pytest.raises(ValueError, match="radius"):
            train_lib.make_n2v_train_step(cfg, tc, radius=0)
        with pytest.raises(ValueError, match="dims 2 or 3"):
            train_lib.make_n2v_train_step(
                dataclasses.replace(cfg, dims=1), tc
            )

    def test_radius_at_least_patch_extent_rejected(self):
        """radius >= the patch extent makes a single border reflection go
        NEGATIVE, which JAX wraps back onto the masked pixel — an identity
        leak the tie-break can't see (code-review finding). Trace-time
        ValueError instead."""
        img = jnp.zeros((1, 8, 8, 1), jnp.float32)
        with pytest.raises(ValueError, match="patch extent"):
            train_lib.n2v_mask_batch(jax.random.PRNGKey(0), img, 4, 8)
        # the largest legal radius still holds the no-self-hit contract
        rng = np.random.default_rng(9)
        img = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 1)), jnp.float32)
        masked, ys, xs = train_lib.n2v_mask_batch(
            jax.random.PRNGKey(1), img, 40, 7
        )
        m0, i0 = np.asarray(masked[0, ..., 0]), np.asarray(img[0, ..., 0])
        for y, x in zip(np.asarray(ys[0]), np.asarray(xs[0])):
            assert m0[y, x] != i0[y, x], (y, x)


class TestMasking3D:
    def test_inplane_substitutes_when_radius_z_zero(self):
        """radius (0, r, r): every substitute must come from the SAME
        z-plane's window (the anisotropic-z mode for confocal stacks),
        and never be the voxel itself."""
        rng = np.random.default_rng(12)
        vol = jnp.asarray(rng.normal(0, 1, (2, 5, 10, 10, 1)), jnp.float32)
        masked, zs, ys, xs = train_lib.n2v_mask_batch_3d(
            jax.random.PRNGKey(3), vol, 12, (0, 2, 2)
        )
        m = np.asarray(masked[..., 0])
        v = np.asarray(vol[..., 0])
        for b in range(2):
            for z, y, x in zip(
                np.asarray(zs[b]), np.asarray(ys[b]), np.asarray(xs[b])
            ):
                assert m[b, z, y, x] != v[b, z, y, x], (b, z, y, x)
                win = v[b, z,
                        max(0, y - 2):y + 3, max(0, x - 2):x + 3]
                assert np.isclose(win, m[b, z, y, x]).any(), (b, z, y, x)
        # changes happen only at the selected voxels
        changed = np.argwhere(m != v)
        sel = [
            set(zip(np.asarray(zs[b]).tolist(), np.asarray(ys[b]).tolist(),
                    np.asarray(xs[b]).tolist()))
            for b in range(2)
        ]
        for b, z, y, x in changed:
            assert (z, y, x) in sel[b]

    def test_radius_validation_3d(self):
        vol = jnp.zeros((1, 4, 8, 8, 1), jnp.float32)
        with pytest.raises(ValueError, match="patch extent"):
            train_lib.n2v_mask_batch_3d(jax.random.PRNGKey(0), vol, 4, (4, 2, 2))
        with pytest.raises(ValueError, match="at least"):
            train_lib.n2v_mask_batch_3d(jax.random.PRNGKey(0), vol, 4, (0, 0, 0))
        with pytest.raises(ValueError, match="axes"):
            train_lib.n2v_mask_batch_3d(jax.random.PRNGKey(0), vol, 4, (1, 1))

    def test_train_step_3d_loss_decreases(self):
        rng = np.random.default_rng(13)
        zz, yy, xx = np.mgrid[0:6, 0:16, 0:16]
        clean = 0.5 + 0.3 * np.sin(zz / 2.0) * np.sin(yy / 4.0) * np.cos(xx / 5.0)
        cfg = _tiny_cfg(dims=3, base_features=4)
        tc = train_lib.TrainConfig(learning_rate=3e-3)
        state = train_lib.create_unet_state(jax.random.PRNGKey(0), cfg, tc)
        step = train_lib.make_n2v_train_step(
            cfg, tc, mask_frac=0.01, radius=(1, 3, 3)
        )
        key = jax.random.PRNGKey(1)
        losses = []
        for i in range(40):
            b = np.stack([
                clean + rng.normal(0, 0.1, clean.shape) for _ in range(2)
            ]).astype(np.float32)[..., None]
            state, mtr = step(
                state, {"image": jnp.asarray(b)}, jax.random.fold_in(key, i)
            )
            losses.append(float(mtr["loss"]))
        assert np.mean(losses[-5:]) < np.mean(losses[:5])


class TestN2VTraining:
    def test_denoiser_beats_noisy_input(self):
        """A short N2V run must reduce MSE vs the CLEAN signal below the
        noisy input's — the self-supervised claim, verified against truth
        the training never saw."""
        rng = np.random.default_rng(4)
        clean, noisy = _noisy_scene(rng, 48, size=32, sigma=0.12)
        cfg = _tiny_cfg()
        tc = train_lib.TrainConfig(learning_rate=3e-3, augment=True)
        state = train_lib.create_unet_state(jax.random.PRNGKey(0), cfg, tc)
        step = train_lib.make_n2v_train_step(cfg, tc, mask_frac=0.02, radius=3)
        key = jax.random.PRNGKey(1)
        first = last = None
        for i in range(120):
            b = noisy[rng.integers(0, len(noisy), 8)][..., None]
            state, m = step(
                state, {"image": jnp.asarray(b)}, jax.random.fold_in(key, i)
            )
            if first is None:
                first = float(m["loss"])
            last = float(m["loss"])
        assert last < first
        den = infer_lib.make_denoiser(
            cfg,
            infer_lib.TileConfig(patch=(32, 32), overlap=(0, 0), normalize="none"),
            (32, 32),
        )
        out = np.asarray(
            jax.jit(den)(state.params, state.model_state, jnp.asarray(noisy[0]))
        )[..., 0]
        mse_noisy = float(np.mean((noisy[0] - clean[0]) ** 2))
        mse_denoised = float(np.mean((out - clean[0]) ** 2))
        assert mse_denoised < 0.6 * mse_noisy, (mse_denoised, mse_noisy)

    def test_fit_n2v_loop_resume_and_keep_best(self, tmp_path):
        """fit_n2v end-to-end over image shards: metrics stream, periodic
        checkpoints, best tracking on eval_psnr_masked, and a resumed run
        continuing the global step count."""
        rng = np.random.default_rng(5)
        _, noisy = _noisy_scene(rng, 24, size=16, sigma=0.1)
        shards = records_lib.write_shards(
            str(tmp_path / "imgs"),
            (fit_lib.encode_image_example(f) for f in noisy),
            shard_size=8,
        )
        cfg = _tiny_cfg(base_features=4)
        tc = train_lib.TrainConfig(learning_rate=1e-3)
        mpath = str(tmp_path / "metrics.jsonl")
        fc = fit_lib.FitConfig(
            steps=6, batch_size=4, checkpoint_every=3, log_every=2,
            holdout_every=4, eval_every=3, metrics_path=mpath,
            keep_best_metric="eval_psnr_masked",
        )
        ck = str(tmp_path / "ck")
        state = fit_lib.fit_n2v(cfg, tc, fc, shards, ckpt_dir=ck)
        assert int(jax.device_get(state.step)) == 6
        assert os.path.isdir(os.path.join(ck, "final"))
        assert os.path.isdir(os.path.join(ck, "best"))
        rows = [json.loads(l) for l in open(mpath)]
        kinds = {r["kind"] for r in rows}
        assert {"train", "eval", "best"} <= kinds
        assert any("eval_psnr_masked" in r for r in rows)
        # resume: restore from final, ask for 4 more global steps
        template = train_lib.create_unet_state(jax.random.PRNGKey(0), cfg, tc)
        restored = train_lib.restore_checkpoint(
            fit_lib.latest_checkpoint(ck), template
        )
        fc2 = dataclasses.replace(fc, steps=10)
        state2 = fit_lib.fit_n2v(
            cfg, tc, fc2, shards, ckpt_dir=ck, init_state=restored
        )
        assert int(jax.device_get(state2.step)) == 10

    def test_keep_best_minimizes_loss_like_metrics(self, tmp_path):
        """keep_best on eval_n2v_mse must track the MINIMUM: before the
        direction-aware fix, the first (worst) eval became the permanent
        'best' and early stopping fired while the run improved
        (code-review finding — the trap also covered eval_loss/eval_l1)."""
        from sequitr_tpu.pipeline.fit import _higher_is_better

        assert not _higher_is_better("eval_n2v_mse")
        assert not _higher_is_better("eval_loss")
        assert not _higher_is_better("eval_l1")
        assert _higher_is_better("eval_psnr_masked")
        assert _higher_is_better("eval_miou")

        rng = np.random.default_rng(10)
        _, noisy = _noisy_scene(rng, 24, size=16, sigma=0.1)
        shards = records_lib.write_shards(
            str(tmp_path / "imgs"),
            (fit_lib.encode_image_example(f) for f in noisy),
            shard_size=8,
        )
        cfg = _tiny_cfg(base_features=4)
        tc = train_lib.TrainConfig(learning_rate=3e-3)
        mpath = str(tmp_path / "metrics.jsonl")
        fc = fit_lib.FitConfig(
            steps=12, batch_size=4, checkpoint_every=6, log_every=4,
            holdout_every=4, eval_every=3, metrics_path=mpath,
            keep_best_metric="eval_n2v_mse",
        )
        fit_lib.fit_n2v(cfg, tc, fc, shards, ckpt_dir=str(tmp_path / "ck"))
        bests = [
            json.loads(l)["eval_n2v_mse"]
            for l in open(mpath)
            if json.loads(l)["kind"] == "best"
        ]
        assert bests, "no best rows written"
        # each recorded best must IMPROVE on (be lower than) the previous
        assert all(b < a for a, b in zip(bests, bests[1:])), bests

    def test_fit_n2v_dp_mesh_matches_single(self, tmp_path):
        """One DP step over the 8-device virtual mesh produces the same
        params as the single-device step on the same batch/key (the DP
        wrapper is sharding annotations on the SAME logical batch — the
        per-sample mask keys split identically)."""
        if jax.device_count() < 2:
            pytest.skip("needs the virtual multi-device mesh")
        from sequitr_tpu import parallel

        rng = np.random.default_rng(6)
        imgs = jnp.asarray(
            rng.normal(0.5, 0.1, (8, 16, 16, 1)), jnp.float32
        )
        cfg = _tiny_cfg(base_features=4)
        tc = train_lib.TrainConfig(learning_rate=1e-3)
        key = jax.random.PRNGKey(2)
        batch = {"image": imgs}

        state_a = train_lib.create_unet_state(jax.random.PRNGKey(0), cfg, tc)
        step_a = train_lib.make_n2v_train_step(cfg, tc, jit=True)
        state_a, m_a = step_a(state_a, batch, key)

        mesh = parallel.make_mesh()
        state_b = train_lib.create_unet_state(jax.random.PRNGKey(0), cfg, tc)
        step_b = parallel.make_dp_train_step(
            train_lib.make_n2v_train_step(cfg, tc, jit=False), mesh
        )
        state_b, m_b = step_b(state_b, batch, key)
        # loss and grad_norm match; post-Adam params are NOT compared
        # leaf-wise — for near-zero gradients Adam's first update is
        # ~±lr*sign(grad), so float reassociation under sharding flips
        # signs (same caveat as test_pipeline's DP train tests)
        np.testing.assert_allclose(
            float(m_a["loss"]), float(m_b["loss"]), rtol=1e-5
        )
        np.testing.assert_allclose(
            float(m_a["grad_norm"]), float(m_b["grad_norm"]), rtol=1e-4
        )


class TestN2VJobs:
    def test_train_then_denoise_chain(self, server_env):
        """train_n2v on a noisy stack registers an n2v model; denoise
        serves it and the output stack improves MSE vs the clean truth."""
        cfg_srv, tmp = server_env
        rng = np.random.default_rng(7)
        clean, noisy = _noisy_scene(rng, 40, size=32, sigma=0.12)
        noisy_p = str(tmp / "noisy.tif")
        tiff.write_stack(noisy_p, noisy)

        train_out = str(tmp / "train")
        submit_job(
            cfg_srv.jobs_dir,
            {
                "module": "train_n2v",
                "params": {
                    "model": "n2v_demo",
                    "patch": [32, 32],
                    "patches_per_frame": 2,
                    "steps": 300,
                    "batch_size": 8,
                    "learning_rate": 3e-3,
                    "lr_schedule": "cosine",
                    "mask_frac": 0.02,
                    "radius": 3,
                    "depth": 2,
                    "base_features": 8,
                    "compute_dtype": "float32",
                    # _noisy_scene is pre-scaled; serve uses normalize
                    # "none", so training must stay in the raw space too
                    "normalize": False,
                    "holdout_every": 10,
                    "eval_every": 60,
                    "keep_best": True,
                },
                "input": [noisy_p],
                "output": train_out,
            },
        )
        srv = ImageServer(cfg_srv)
        assert srv.poll_once()
        status = json.load(open(os.path.join(train_out, "status.json")))
        assert status["state"] == "complete", status.get("error")
        from sequitr_tpu.server import load_model

        kind, mcfg, _, _ = load_model(cfg_srv.models_dir, "n2v_demo")
        assert kind == "n2v"
        assert mcfg.num_classes == 1 and mcfg.in_channels == 1

        den_out = str(tmp / "den")
        submit_job(
            cfg_srv.jobs_dir,
            {
                "module": "denoise",
                "params": {"model": "n2v_demo", "normalize": "none"},
                "input": [noisy_p],
                "output": den_out,
            },
        )
        assert srv.poll_once()
        status2 = json.load(open(os.path.join(den_out, "status.json")))
        assert status2["state"] == "complete", status2.get("error")
        out = np.asarray(tiff.read_stack(status2["outputs"]["denoised"]))
        assert out.shape == noisy.shape
        mse_noisy = float(np.mean((noisy - clean) ** 2))
        mse_out = float(np.mean((out - clean) ** 2))
        # a consistent-space cosine run lands ~0.05x (verified through a
        # real server: 20.0 -> 33.3 dB); 0.3x leaves seed headroom while
        # still failing on the train/serve scale-mismatch class of bug
        assert mse_out < 0.3 * mse_noisy, (mse_out, mse_noisy)
        # training shards are reused on resume: they exist under the job
        assert os.path.isdir(os.path.join(train_out, "records"))

        # evaluate_denoise: the clean-reference scoring job (labs with a
        # few calibration frames close the loop the masked eval can't)
        clean_p = str(tmp / "clean.tif")
        tiff.write_stack(clean_p, clean)
        ev_out = str(tmp / "ev")
        submit_job(
            cfg_srv.jobs_dir,
            {
                "module": "evaluate_denoise",
                "params": {"model": "n2v_demo", "normalize": "none"},
                "input": [noisy_p, clean_p],
                "output": ev_out,
            },
        )
        assert srv.poll_once()
        st3 = json.load(open(os.path.join(ev_out, "status.json")))
        assert st3["state"] == "complete", st3.get("error")
        m = json.loads(st3["outputs"]["metrics"])
        assert m["n_frames"] == len(noisy)
        assert len(m["per_frame_psnr"]) == len(noisy)
        # the job's improvement measure matches our direct computation
        assert m["psnr"] > m["psnr_noisy_input"] + 3.0, m
        # wrong path count: deterministic JobError
        bad_out = str(tmp / "ev_bad")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "evaluate_denoise",
             "params": {"model": "n2v_demo"},
             "input": [noisy_p], "output": bad_out},
        )
        assert srv.poll_once()
        st4 = json.load(open(os.path.join(bad_out, "status.json")))
        assert st4["state"] == "failed" and "clean" in st4["error"]

    def test_multichannel_train_and_denoise(self, server_env):
        """Two-channel N2V: one stack per channel in (the segmentation
        convention), model predicts both channels, denoised output pages
        frame-major like the GAN's layout."""
        cfg_srv, tmp = server_env
        rng = np.random.default_rng(11)
        _, n1 = _noisy_scene(rng, 10, size=32)
        _, n2 = _noisy_scene(rng, 10, size=32)
        p1, p2 = str(tmp / "c1.tif"), str(tmp / "c2.tif")
        tiff.write_stack(p1, n1)
        tiff.write_stack(p2, n2)
        train_out = str(tmp / "train_mc")
        submit_job(
            cfg_srv.jobs_dir,
            {
                "module": "train_n2v",
                "params": {"model": "n2v_mc", "patch": [32, 32],
                           "patches_per_frame": 1, "steps": 20,
                           "batch_size": 4, "depth": 2, "base_features": 4,
                           "compute_dtype": "float32", "normalize": False},
                "input": [p1, p2],
                "output": train_out,
            },
        )
        srv = ImageServer(cfg_srv)
        assert srv.poll_once()
        st = json.load(open(os.path.join(train_out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        from sequitr_tpu.server import load_model

        _, mcfg, _, _ = load_model(cfg_srv.models_dir, "n2v_mc")
        assert mcfg.in_channels == 2 and mcfg.num_classes == 2

        den_out = str(tmp / "den_mc")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "denoise",
             "params": {"model": "n2v_mc", "normalize": "none"},
             "input": [p1, p2], "output": den_out},
        )
        assert srv.poll_once()
        st2 = json.load(open(os.path.join(den_out, "status.json")))
        assert st2["state"] == "complete", st2.get("error")
        assert "frame-major" in st2["outputs"]["denoised_layout"]
        out = np.asarray(tiff.read_stack(st2["outputs"]["denoised"]))
        assert out.shape == (20, 32, 32)  # 10 frames x 2 channels, paged

    def test_denoise_rejects_wrong_kind_and_spatial(self, server_env):
        cfg_srv, tmp = server_env
        from sequitr_tpu.models import unet as unet_lib
        from sequitr_tpu.server import save_model

        ucfg = dataclasses.replace(
            zoo.get("unet2d_binary"), depth=2, base_features=4,
            compute_dtype=jnp.float32,
        )
        params, mstate = unet_lib.init(jax.random.PRNGKey(0), ucfg)
        save_model(cfg_srv.models_dir, "seg", "unet", ucfg, params, mstate)
        stack = str(tmp / "s.tif")
        tiff.write_stack(
            stack, np.zeros((2, 16, 16), np.float32)
        )
        out1 = str(tmp / "o1")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "denoise", "params": {"model": "seg"},
             "input": [stack], "output": out1},
        )
        srv = ImageServer(cfg_srv)
        assert srv.poll_once()
        st = json.load(open(os.path.join(out1, "status.json")))
        assert st["state"] == "failed"
        assert "kind" in st["error"]

        out2 = str(tmp / "o2")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "denoise",
             "params": {"model": "seg", "spatial_parallel": True},
             "input": [stack], "output": out2},
        )
        assert srv.poll_once()
        st2 = json.load(open(os.path.join(out2, "status.json")))
        assert st2["state"] == "failed"
        assert "spatial_parallel" in st2["error"]

    def test_volumetric_train_then_denoise(self, server_env):
        """dims=3 end-to-end: a T*Z-page noisy volume timelapse (z param)
        trains a 3D blind-spot model; denoise routes to the volumetric
        branch and the output improves MSE vs the clean volumes."""
        cfg_srv, tmp = server_env
        rng = np.random.default_rng(14)
        T, Z, S = 6, 4, 32
        zz, yy, xx = np.mgrid[0:Z, 0:S, 0:S]
        clean = (
            0.5 + 0.3 * np.sin(zz / 1.5) * np.sin(yy / 4.0) * np.cos(xx / 5.0)
        ).astype(np.float32)
        clean_t = np.stack([clean] * T)  # static scene over time
        noisy = clean_t + rng.normal(0, 0.12, clean_t.shape).astype(np.float32)
        noisy_p = str(tmp / "vols.tif")
        tiff.write_stack(noisy_p, noisy.reshape(T * Z, S, S))

        train_out = str(tmp / "train3d")
        submit_job(
            cfg_srv.jobs_dir,
            {
                "module": "train_n2v",
                "params": {"model": "n2v_3d", "dims": 3, "z": Z,
                           "patch": [4, 32, 32], "patches_per_frame": 2,
                           "steps": 150, "batch_size": 4,
                           "learning_rate": 3e-3, "lr_schedule": "cosine",
                           "mask_frac": 0.02, "radius": 3, "radius_z": 1,
                           "depth": 2, "base_features": 8,
                           "compute_dtype": "float32", "normalize": False},
                "input": [noisy_p],
                "output": train_out,
            },
        )
        srv = ImageServer(cfg_srv)
        assert srv.poll_once()
        st = json.load(open(os.path.join(train_out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        from sequitr_tpu.server import load_model

        _, mcfg, _, _ = load_model(cfg_srv.models_dir, "n2v_3d")
        assert mcfg.dims == 3 and mcfg.num_classes == 1

        den_out = str(tmp / "den3d")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "denoise",
             "params": {"model": "n2v_3d", "z": Z, "normalize": "none"},
             "input": [noisy_p], "output": den_out},
        )
        assert srv.poll_once()
        st2 = json.load(open(os.path.join(den_out, "status.json")))
        assert st2["state"] == "complete", st2.get("error")
        assert "volume-major" in st2["outputs"]["denoised_layout"]
        out = np.asarray(
            tiff.read_stack(st2["outputs"]["denoised"])
        ).reshape(T, Z, S, S)
        mse_noisy = float(np.mean((noisy - clean_t) ** 2))
        mse_out = float(np.mean((out - clean_t) ** 2))
        assert mse_out < 0.5 * mse_noisy, (mse_out, mse_noisy)

        # timepoint-sharded DP: volumes sharded over the 8-device virtual
        # mesh, one whole volume per chip per dispatch — the output must
        # match the streaming path EXACTLY (T=6 also covers tail padding)
        dp_out = str(tmp / "den3d_dp")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "denoise",
             "params": {"model": "n2v_3d", "normalize": "none",
                        "data_parallel": True, "z": Z},
             "input": [noisy_p], "output": dp_out},
        )
        assert srv.poll_once()
        st3 = json.load(open(os.path.join(dp_out, "status.json")))
        assert st3["state"] == "complete", st3.get("error")
        out_dp = np.asarray(
            tiff.read_stack(st3["outputs"]["denoised"])
        ).reshape(T, Z, S, S)
        np.testing.assert_array_equal(out_dp, out)

        # frame_batch is likewise rejected loudly, not silently ignored
        bad2 = str(tmp / "bad3d_fb")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "denoise",
             "params": {"model": "n2v_3d", "normalize": "none",
                        "frame_batch": 4, "z": Z},
             "input": [noisy_p], "output": bad2},
        )
        assert srv.poll_once()
        st4 = json.load(open(os.path.join(bad2, "status.json")))
        assert st4["state"] == "failed" and "frame_batch" in st4["error"]

        # volumetric evaluate_denoise: clean volumes close the loop
        clean_p = str(tmp / "clean3d.tif")
        tiff.write_stack(clean_p, clean_t.reshape(T * Z, S, S))
        ev3 = str(tmp / "ev3d")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "evaluate_denoise",
             "params": {"model": "n2v_3d", "z": Z, "normalize": "none"},
             "input": [noisy_p, clean_p], "output": ev3},
        )
        assert srv.poll_once()
        st5 = json.load(open(os.path.join(ev3, "status.json")))
        assert st5["state"] == "complete", st5.get("error")
        m3 = json.loads(st5["outputs"]["metrics"])
        assert m3["n_volumes"] == T
        assert len(m3["per_volume_psnr"]) == T
        assert m3["psnr"] > m3["psnr_noisy_input"] + 2.0, m3
        # ...and its improvement agrees with the denoise output's score
        assert abs(m3["psnr"] - (10 * np.log10(1.0 / mse_out))) < 0.5

    def test_fast_s2d_train_and_denoise(self, server_env):
        """space_to_depth: 2 — the fast-denoiser recipe trains DIRECTLY
        with the blind-spot loss (no distillation teacher) and still
        beats the noisy input."""
        cfg_srv, tmp = server_env
        rng = np.random.default_rng(15)
        clean, noisy = _noisy_scene(rng, 40, size=32, sigma=0.12)
        noisy_p = str(tmp / "noisy.tif")
        tiff.write_stack(noisy_p, noisy)
        train_out = str(tmp / "train_fast")
        submit_job(
            cfg_srv.jobs_dir,
            {
                "module": "train_n2v",
                "params": {"model": "n2v_fast", "patch": [32, 32],
                           "patches_per_frame": 2, "steps": 300,
                           "batch_size": 8, "learning_rate": 3e-3,
                           "lr_schedule": "cosine", "mask_frac": 0.02,
                           "radius": 3, "depth": 2,
                           "space_to_depth": 2,
                           "compute_dtype": "float32",
                           "normalize": False},
                "input": [noisy_p],
                "output": train_out,
            },
        )
        srv = ImageServer(cfg_srv)
        assert srv.poll_once()
        st = json.load(open(os.path.join(train_out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        from sequitr_tpu.server import load_model

        _, mcfg, _, _ = load_model(cfg_srv.models_dir, "n2v_fast")
        assert mcfg.space_to_depth == 2 and mcfg.base_features == 64

        den_out = str(tmp / "den_fast")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "denoise",
             "params": {"model": "n2v_fast", "normalize": "none"},
             "input": [noisy_p], "output": den_out},
        )
        assert srv.poll_once()
        st2 = json.load(open(os.path.join(den_out, "status.json")))
        assert st2["state"] == "complete", st2.get("error")
        out = np.asarray(tiff.read_stack(st2["outputs"]["denoised"]))
        mse_noisy = float(np.mean((noisy - clean) ** 2))
        mse_out = float(np.mean((out - clean) ** 2))
        assert mse_out < 0.5 * mse_noisy, (mse_out, mse_noisy)

        # 3D + s2d: deterministic rejection
        bad = str(tmp / "bad_s2d3d")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "train_n2v",
             "params": {"model": "x", "dims": 3, "space_to_depth": 2},
             "input": [noisy_p], "output": bad},
        )
        assert srv.poll_once()
        st3 = json.load(open(os.path.join(bad, "status.json")))
        assert st3["state"] == "failed" and "space_to_depth" in st3["error"]

    def test_train_n2v_param_errors(self, server_env):
        cfg_srv, tmp = server_env
        stack = str(tmp / "s.tif")
        tiff.write_stack(stack, np.zeros((2, 8, 8), np.float32))
        out = str(tmp / "o")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "train_n2v",
             "params": {"model": "m", "patch": [64, 64]},
             "input": [stack], "output": out},
        )
        srv = ImageServer(cfg_srv)
        assert srv.poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "failed"
        assert "patch" in st["error"]

        # struct/radius cross-validation errors raised inside fit_n2v
        # (library ValueErrors) must still land as deterministic JobErrors
        # via the except-ValueError wrapper — code-review probe
        stack2 = str(tmp / "s2.tif")
        tiff.write_stack(
            stack2,
            np.random.default_rng(0)
            .normal(0.5, 0.1, (16, 16, 16))
            .astype(np.float32),
        )
        for name, params, frag in (
            ("xv1", {"dims": 3, "z": 4, "patch": [4, 16, 16], "steps": 5,
                     "batch_size": 2, "struct_axis": "z", "radius": 0,
                     "radius_z": 2, "depth": 2, "base_features": 4,
                     "normalize": False}, "OUTSIDE"),
            ("xv2", {"patch": [16, 16], "steps": 5, "batch_size": 2,
                     "struct_axis": "x", "struct_span": 16, "depth": 2,
                     "base_features": 4, "normalize": False}, "extent"),
        ):
            o = str(tmp / name)
            submit_job(
                cfg_srv.jobs_dir,
                {"module": "train_n2v", "params": {"model": name, **params},
                 "input": [stack2], "output": o},
            )
            assert srv.poll_once()
            st = json.load(open(os.path.join(o, "status.json")))
            assert st["state"] == "failed", st
            assert frag in st["error"], (name, st["error"])
            assert "JobError" in st["error"], name  # fail-fast, not retried


class TestImageRecords:
    def test_round_trip_2d_and_multichannel(self):
        rng = np.random.default_rng(8)
        x2 = rng.normal(0, 1, (9, 11)).astype(np.float32)
        x3 = rng.normal(0, 1, (7, 5, 2)).astype(np.float32)
        d2 = fit_lib._decode_image(fit_lib.encode_image_example(x2))
        d3 = fit_lib._decode_image(fit_lib.encode_image_example(x3))
        np.testing.assert_array_equal(d2["image"][..., 0], x2)
        np.testing.assert_array_equal(d3["image"], x3)

    def test_write_shards_generic(self, tmp_path):
        payloads = [fit_lib.encode_image_example(np.full((4, 4), i, np.float32))
                    for i in range(5)]
        paths = records_lib.write_shards(
            str(tmp_path / "im"), iter(payloads), shard_size=2
        )
        assert len(paths) == 3 and all(os.path.exists(p) for p in paths)
        back = [
            fit_lib._decode_image(pl)["image"][0, 0, 0]
            for p in paths
            for pl in records_lib.read_records(p)
        ]
        assert back == [0.0, 1.0, 2.0, 3.0, 4.0]


def _reflect_py(i, s):
    i = abs(i)
    return 2 * (s - 1) - i if i > s - 1 else i


class TestMaskingVariants:
    """N2V2 median manipulation + structN2V correlated-noise masking."""

    def test_median_value_and_positions(self):
        """mode='median': masked pixels take the window median EXCLUDING
        the center (a distinct-valued image pins both the positions and
        the exact values, border reflection included)."""
        h, w = 12, 14
        img_np = np.arange(h * w, dtype=np.float32).reshape(1, h, w, 1)
        masked, ys, xs = train_lib.n2v_mask_batch(
            jax.random.PRNGKey(3), jnp.asarray(img_np), 10, 1, mode="median"
        )
        masked = np.asarray(masked)[0, ..., 0]
        ref = img_np[0, ..., 0]
        sel = set(zip(np.asarray(ys[0]).tolist(), np.asarray(xs[0]).tolist()))
        for y, x in np.argwhere(masked != ref):
            assert (int(y), int(x)) in sel
        for y, x in sel:
            vals = [
                ref[_reflect_py(y + dy, h), _reflect_py(x + dx, w)]
                for dy in (-1, 0, 1)
                for dx in (-1, 0, 1)
                if (dy, dx) != (0, 0)
            ]
            assert masked[y, x] == np.median(vals), (y, x)

    def test_struct_sources_off_the_correlated_line(self):
        """struct=(axis, span): the whole segment along the correlated
        axis is replaced, every substitute from the SAME column
        (zero displacement along the axis) but a DIFFERENT row."""
        h, w = 16, 20
        img_np = (
            np.arange(h)[:, None] * 1000.0 + np.arange(w)[None, :]
        ).astype(np.float32)
        img = jnp.asarray(img_np.reshape(1, h, w, 1))
        span = 3
        masked, ys, xs = train_lib.n2v_mask_batch(
            jax.random.PRNGKey(4), img, 8, 4, struct=(1, span)
        )
        masked = np.asarray(masked)[0, ..., 0]
        seg = set()
        for y, x in zip(np.asarray(ys[0]).tolist(), np.asarray(xs[0]).tolist()):
            for o in range(-span, span + 1):
                seg.add((y, _reflect_py(x + o, w)))
        changed = {(int(a), int(b)) for a, b in np.argwhere(masked != img_np)}
        # replaced pixels = exactly the masked segments (distinct values:
        # an off-line substitute can never reproduce the original)
        assert changed == seg
        for y, x in seg:
            v = masked[y, x]
            sy, sx = int(v // 1000), int(v % 1000)
            assert sx == x and sy != y, (y, x, sy, sx)

    def test_struct_median_window_excludes_the_line(self):
        """median + struct: the median window must not read ANY pixel on
        the correlated line (all taps have nonzero perpendicular
        displacement)."""
        h, w = 10, 12
        img_np = np.arange(h * w, dtype=np.float32).reshape(1, h, w, 1)
        span = 2
        masked, ys, xs = train_lib.n2v_mask_batch(
            jax.random.PRNGKey(5), jnp.asarray(img_np), 6, 1,
            mode="median", struct=(1, span),
        )
        masked = np.asarray(masked)[0, ..., 0]
        ref = img_np[0, ..., 0]
        for y, x in zip(np.asarray(ys[0]).tolist(), np.asarray(xs[0]).tolist()):
            for o in range(-span, span + 1):
                px = _reflect_py(x + o, w)
                vals = [
                    ref[_reflect_py(y + dy, h), _reflect_py(px + dx, w)]
                    for dy in (-1, 1)
                    for dx in (-1, 0, 1)
                ]
                assert masked[y, px] == np.median(vals), (y, px)

    def test_median_border_folds_redirect_off_the_blind_region(self):
        """Radius-2 reflection can fold a window tap back onto the center
        (plain) or the correlated line (struct) — e.g. y=1, dy=-2 reflects
        to y=1. Those taps must be redirected off the blind region along
        the fix axis, never read the value being hidden (code-review
        fix: the offset-space exclusion only covers the interior)."""
        h, w = 6, 7
        img_np = np.arange(h * w, dtype=np.float32).reshape(1, h, w, 1)
        ref = img_np[0, ..., 0]

        # plain median: blind = the exact center, fix axis = x
        masked, ys, xs = train_lib.n2v_mask_batch(
            jax.random.PRNGKey(7), jnp.asarray(img_np), 12, 2, mode="median"
        )
        masked = np.asarray(masked)[0, ..., 0]
        folds = 0
        for y, x in zip(np.asarray(ys[0]).tolist(), np.asarray(xs[0]).tolist()):
            vals = []
            for dy in range(-2, 3):
                for dx in range(-2, 3):
                    if (dy, dx) == (0, 0):
                        continue
                    ny, nx = _reflect_py(y + dy, h), _reflect_py(x + dx, w)
                    if (ny, nx) == (y, x):
                        folds += 1
                        nx = x - 1 if x > 0 else x + 1
                    vals.append(ref[ny, nx])
            assert masked[y, x] == np.median(vals), (y, x)
        assert folds > 0  # the 6x7 extent guarantees border centers

        # struct median: blind = the whole row, fix axis = y
        span = 2
        masked, ys, xs = train_lib.n2v_mask_batch(
            jax.random.PRNGKey(8), jnp.asarray(img_np), 6, 2,
            mode="median", struct=(1, span),
        )
        masked = np.asarray(masked)[0, ..., 0]
        folds = 0
        for y, x in zip(np.asarray(ys[0]).tolist(), np.asarray(xs[0]).tolist()):
            for o in range(-span, span + 1):
                px = _reflect_py(x + o, w)
                vals = []
                for dy in (-2, -1, 1, 2):
                    for dx in range(-2, 3):
                        ny, nx = _reflect_py(y + dy, h), _reflect_py(px + dx, w)
                        if ny == y:  # folded back onto the line
                            folds += 1
                            ny = y - 1 if y > 0 else y + 1
                        vals.append(ref[ny, nx])
                assert masked[y, px] == np.median(vals), (y, px)
        assert folds > 0

    def test_variant_validation(self):
        img = jnp.zeros((1, 8, 8, 1))
        k = jax.random.PRNGKey(0)
        with pytest.raises(ValueError, match="mode"):
            train_lib.n2v_mask_batch(k, img, 2, 1, mode="mean")
        with pytest.raises(ValueError, match="axis"):
            train_lib.n2v_mask_batch(k, img, 2, 1, struct=(2, 2))
        with pytest.raises(ValueError, match="span"):
            train_lib.n2v_mask_batch(k, img, 2, 1, struct=(1, 0))
        with pytest.raises(ValueError, match="OUTSIDE"):
            train_lib.n2v_mask_batch(k, img, 2, (0, 3), struct=(1, 2))
        with pytest.raises(ValueError, match="extent"):
            train_lib.n2v_mask_batch(k, img, 2, 1, struct=(1, 8))

    def test_flip_batch_transpose_flag(self):
        """transpose=False restricts the augmentation to pure flips (the
        structN2V requirement: a transpose would rotate the correlated
        axis out from under the mask)."""
        rng = np.random.default_rng(2)
        imgs = np.asarray(rng.normal(0, 1, (16, 6, 6, 1)), np.float32)
        out = np.asarray(
            train_lib.n2v_flip_batch(
                jax.random.PRNGKey(3), jnp.asarray(imgs), transpose=False
            )
        )
        for b in range(16):
            cands = [
                imgs[b],
                imgs[b][::-1],
                imgs[b][:, ::-1],
                imgs[b][::-1, ::-1],
            ]
            assert any(np.array_equal(out[b], c) for c in cands), b

    def test_3d_struct_along_z(self):
        """Volumetric structN2V: stripes along z (axis 0) — substitutes
        keep their z, moving only in-plane."""
        z, h, w = 6, 8, 10
        img_np = (
            np.arange(z)[:, None, None] * 10000.0
            + np.arange(h)[None, :, None] * 100.0
            + np.arange(w)[None, None, :]
        ).astype(np.float32)
        masked, zs, ys, xs = train_lib.n2v_mask_batch_3d(
            jax.random.PRNGKey(6), jnp.asarray(img_np.reshape(1, z, h, w, 1)),
            5, (2, 3, 3), struct=(0, 2),
        )
        masked = np.asarray(masked)[0, ..., 0]
        for zc, yc, xc in zip(
            np.asarray(zs[0]).tolist(), np.asarray(ys[0]).tolist(),
            np.asarray(xs[0]).tolist(),
        ):
            for o in range(-2, 3):
                pz = _reflect_py(zc + o, z)
                v = masked[pz, yc, xc]
                sz, rem = divmod(v, 10000.0)
                sy, sx = divmod(rem, 100.0)
                assert int(sz) == pz, (pz, yc, xc)
                assert (int(sy), int(sx)) != (yc, xc), (pz, yc, xc)


class TestStructN2VTraining:
    @staticmethod
    def _striped_scene(rng, n, size=32, sigma=0.15, corr=5):
        """Clean signal + noise CORRELATED along x (white noise box-
        filtered over ``corr`` pixels, unit-L2 kernel keeps the variance)."""
        yy, xx = np.mgrid[0:size, 0:size]
        clean = 0.5 + 0.3 * np.sin(yy / 4.0) * np.cos(xx / 5.0)
        clean = np.broadcast_to(clean, (n, size, size)).astype(np.float32)
        kern = np.ones(corr) / np.sqrt(corr)
        noise = rng.normal(0, sigma, clean.shape).astype(np.float32)
        noise = np.apply_along_axis(
            lambda v: np.convolve(v, kern, mode="same"), 2, noise
        ).astype(np.float32)
        return clean, clean + noise

    def test_struct_beats_plain_n2v_on_striped_noise(self, tmp_path):
        """The structN2V claim: with noise correlated along x, plain N2V
        reads the noise off the correlated neighbors and keeps the
        stripes; masking the whole segment removes them."""
        from sequitr_tpu.models import unet

        rng = np.random.default_rng(11)
        clean, noisy = self._striped_scene(rng, 48)
        shards = records_lib.write_shards(
            str(tmp_path / "imgs"),
            (fit_lib.encode_image_example(f) for f in noisy),
            shard_size=16,
        )
        cfg = _tiny_cfg()
        tc = train_lib.TrainConfig(
            learning_rate=3e-3, lr_schedule="cosine", lr_decay_steps=300,
            augment=True,
        )
        fc = fit_lib.FitConfig(
            steps=300, batch_size=8, checkpoint_every=10**9, log_every=10**9
        )

        def mse_to_clean(state):
            pred, _ = unet.apply(
                cfg, state.params, state.model_state,
                jnp.asarray(noisy)[..., None], train=False,
            )
            return float(np.mean((np.asarray(pred[..., 0]) - clean) ** 2))

        plain = fit_lib.fit_n2v(cfg, tc, fc, shards, mask_frac=0.02, radius=5)
        struct = fit_lib.fit_n2v(
            cfg, tc, fc, shards, mask_frac=0.02, radius=5, struct=(1, 4)
        )
        m_noisy = float(np.mean((noisy - clean) ** 2))
        m_plain, m_struct = mse_to_clean(plain), mse_to_clean(struct)
        assert m_struct < 0.6 * m_noisy, (m_struct, m_noisy)
        assert m_struct < 0.7 * m_plain, (m_struct, m_plain, m_noisy)


class TestPolyphaseDenoise:
    """``polyphase: true`` on the denoise pipeline: output equal to the
    standard serve; uncovered models fail as deterministic JobErrors."""

    def test_matches_standard_and_rejects_s2d(self, server_env):
        cfg_srv, tmp = server_env
        from sequitr_tpu.models import unet as unet_lib
        from sequitr_tpu.server import save_model

        ucfg = unet_lib.UNetConfig(
            in_channels=1, num_classes=1, depth=2, base_features=4,
            compute_dtype=jnp.float32,
        )
        params, mstate = unet_lib.init(jax.random.PRNGKey(2), ucfg)
        save_model(cfg_srv.models_dir, "dn", "n2v", ucfg, params, mstate)
        stack = str(tmp / "noisy.tif")
        tiff.write_stack(
            stack,
            (np.random.default_rng(0).random((2, 32, 32)) * 800).astype(
                np.float32
            ),
        )
        srv = ImageServer(cfg_srv)
        outs = {}
        for name, extra in (("std", {}), ("poly", {"polyphase": True})):
            out = str(tmp / f"dn_{name}")
            submit_job(
                cfg_srv.jobs_dir,
                {"module": "denoise",
                 "params": {"model": "dn", "patch": [32, 32],
                            "overlap": [0, 0], **extra},
                 "input": [stack], "output": out},
            )
            assert srv.poll_once()
            st = json.load(open(os.path.join(out, "status.json")))
            assert st["state"] == "complete", st.get("error")
            outs[name] = tiff.read_stack(st["outputs"]["denoised"])
        np.testing.assert_allclose(outs["std"], outs["poly"], atol=1e-4)

        # s2d preset models cannot serve polyphase — deterministic error
        s2cfg = unet_lib.UNetConfig(
            in_channels=1, num_classes=1, depth=2, base_features=4,
            compute_dtype=jnp.float32, space_to_depth=2,
        )
        p2, s2 = unet_lib.init(jax.random.PRNGKey(3), s2cfg)
        save_model(cfg_srv.models_dir, "dns2", "n2v", s2cfg, p2, s2)
        out = str(tmp / "dn_s2d")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "denoise",
             "params": {"model": "dns2", "polyphase": True},
             "input": [stack], "output": out},
        )
        assert srv.poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "failed"
        assert "polyphase" in st["error"]
