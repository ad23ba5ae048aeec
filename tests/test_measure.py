"""Tests: measure_objects — per-object multi-channel intensity quantification.

The "segment on one channel, measure the others" workflow (an extension
beyond the reference, whose localization measured only the segmentation
input's own intensity): a label stack defines objects, each further input
entry is an intensity channel averaged per object over its pixels.
"""

import json
import os

import numpy as np
import pytest

from sequitr_tpu.config import ServerConfiguration
from sequitr_tpu.data import tiff
from sequitr_tpu.server import ImageServer, submit_job


@pytest.fixture
def server_env(tmp_path):
    cfg = ServerConfiguration(
        jobs_dir=str(tmp_path / "jobs"), models_dir=str(tmp_path / "models")
    )
    cfg.ensure_dirs()
    return cfg, tmp_path


def _rows(path):
    lines = open(path).read().strip().split("\n")
    header = lines[0].split(",")
    rows = [dict(zip(header, ln.split(","))) for ln in lines[1:]]
    return header, rows


class TestMeasureObjects:
    def test_two_channel_means_exact(self, server_env):
        """Hand-built labels + two constant-per-object channels: the CSV
        means must equal the constants exactly; area/centroid/class too."""
        cfg_srv, tmp = server_env
        T, H, W = 2, 24, 24
        labels = np.zeros((T, H, W), np.uint16)
        # frame 0: object A (class 1) 4x4 at (2,2); object B (class 2) 2x6 at (10,12)
        labels[0, 2:6, 2:6] = 1
        labels[0, 10:12, 12:18] = 2
        # frame 1: one object, class 1
        labels[1, 5:9, 5:9] = 1
        c0 = np.zeros((T, H, W), np.float32)
        c1 = np.zeros((T, H, W), np.float32)
        c0[0, 2:6, 2:6] = 10.0
        c0[0, 10:12, 12:18] = 20.0
        c0[1, 5:9, 5:9] = 30.0
        c1[0, 2:6, 2:6] = 1.5
        c1[0, 10:12, 12:18] = 2.5
        c1[1, 5:9, 5:9] = 3.5
        lp, p0, p1 = (str(tmp / n) for n in ("lab.tif", "c0.tif", "c1.tif"))
        tiff.write_stack(lp, labels)
        tiff.write_stack(p0, c0)
        tiff.write_stack(p1, c1)
        out = str(tmp / "out")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "measure_objects", "params": {},
             "input": [lp, p0, p1], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        m = json.loads(st["outputs"]["metrics"])
        assert m["n_objects"] == 3 and m["n_channels"] == 2
        header, rows = _rows(st["outputs"]["measurements"])
        assert header == ["t", "id", "class", "area", "y", "x",
                          "mean_c0", "mean_c1"]
        by = {(r["t"], r["id"]): r for r in rows}
        a = by[("0", "1")]
        assert a["class"] == "1" and a["area"] == "16"
        assert float(a["mean_c0"]) == 10.0 and float(a["mean_c1"]) == 1.5
        assert float(a["y"]) == pytest.approx(3.5) and float(a["x"]) == pytest.approx(3.5)
        b = by[("0", "2")]
        assert b["class"] == "2" and b["area"] == "12"
        assert float(b["mean_c0"]) == 20.0 and float(b["mean_c1"]) == 2.5
        c = by[("1", "1")]
        assert float(c["mean_c0"]) == 30.0 and float(c["mean_c1"]) == 3.5

    def test_chains_from_segmentation_and_min_area(self, server_env):
        """depends_on chain: segmentation labels feed measure_objects;
        min_area drops specks; frame_range keeps absolute t."""
        cfg_srv, tmp = server_env
        T, H, W = 3, 16, 16
        labels = np.zeros((T, H, W), np.uint16)
        labels[:, 4:8, 4:8] = 1          # 16 px object every frame
        labels[:, 12:13, 12:13] = 1      # 1 px speck every frame
        inten = np.full((T, H, W), 7.0, np.float32)
        lp, ip = str(tmp / "lab.tif"), str(tmp / "ch.tif")
        tiff.write_stack(lp, labels)
        tiff.write_stack(ip, inten)
        out = str(tmp / "out")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "measure_objects",
             "params": {"min_area": 4, "frame_range": [1, 3]},
             "input": [lp, ip], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        _, rows = _rows(st["outputs"]["measurements"])
        assert len(rows) == 2  # speck dropped, frames 1..2 only
        assert {r["t"] for r in rows} == {"1", "2"}
        assert all(float(r["mean_c0"]) == 7.0 for r in rows)

    def test_validation_errors(self, server_env):
        cfg_srv, tmp = server_env
        lp = str(tmp / "lab.tif")
        tiff.write_stack(lp, np.zeros((2, 8, 8), np.uint16))
        srv = ImageServer(cfg_srv)
        # too few inputs
        out1 = str(tmp / "o1")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "measure_objects", "params": {},
             "input": [lp], "output": out1},
        )
        assert srv.poll_once()
        st = json.load(open(os.path.join(out1, "status.json")))
        assert st["state"] == "failed" and ">= 2 inputs" in st["error"]
        # shape mismatch
        ip = str(tmp / "ch.tif")
        tiff.write_stack(ip, np.zeros((2, 10, 8), np.float32))
        out2 = str(tmp / "o2")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "measure_objects", "params": {},
             "input": [lp, ip], "output": out2},
        )
        assert srv.poll_once()
        st2 = json.load(open(os.path.join(out2, "status.json")))
        assert st2["state"] == "failed" and "spatial" in st2["error"]
        # length mismatch
        ip3 = str(tmp / "ch3.tif")
        tiff.write_stack(ip3, np.zeros((3, 8, 8), np.float32))
        out3 = str(tmp / "o3")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "measure_objects", "params": {},
             "input": [lp, ip3], "output": out3},
        )
        assert srv.poll_once()
        st3 = json.load(open(os.path.join(out3, "status.json")))
        assert st3["state"] == "failed" and "frame(s)" in st3["error"]

    def test_split_touching_separates_objects(self, server_env):
        """Two abutting blobs measure as ONE object plainly and TWO with
        split_touching (per-object means then differ)."""
        cfg_srv, tmp = server_env
        H = W = 32
        yy, xx = np.mgrid[0:H, 0:W]
        m1 = (yy - 14) ** 2 + (xx - 12) ** 2 < 36
        m2 = (yy - 14) ** 2 + (xx - 21) ** 2 < 36
        labels = (m1 | m2).astype(np.uint16)[None]
        inten = np.where(m1, 10.0, 0.0) + np.where(m2, 30.0, 0.0)
        inten = inten.astype(np.float32)[None]
        lp, ip = str(tmp / "lab.tif"), str(tmp / "ch.tif")
        tiff.write_stack(lp, labels)
        tiff.write_stack(ip, inten)
        srv = ImageServer(cfg_srv)
        got = {}
        for split in (False, True):
            out = str(tmp / f"o_{split}")
            submit_job(
                cfg_srv.jobs_dir,
                {"module": "measure_objects",
                 "params": {"split_touching": split, "min_distance": 4},
                 "input": [lp, ip], "output": out},
            )
            assert srv.poll_once()
            st = json.load(open(os.path.join(out, "status.json")))
            assert st["state"] == "complete", st.get("error")
            _, rows = _rows(st["outputs"]["measurements"])
            got[split] = rows
        assert len(got[False]) == 1
        assert len(got[True]) == 2
        means = sorted(float(r["mean_c0"]) for r in got[True])
        # split halves are dominated by their own blob's intensity
        # (overlap pixels blend, so allow a wide but ordered band)
        assert means[0] < 20.0 < means[1]
