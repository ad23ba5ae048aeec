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


class TestColocalize:
    def test_otsu_separates_bimodal(self):
        from sequitr_tpu.ops import colocalize as co

        rng = np.random.default_rng(0)
        a = np.concatenate([
            rng.normal(10, 1, 4000), rng.normal(100, 5, 1000)
        ])
        thr = co.otsu_threshold(a)
        # the between-class variance is flat across the empty gap, so any
        # in-gap edge is a valid Otsu answer; what matters is separation
        assert a.max() > thr > a[:4000].max() - 1
        assert abs(int((a > thr).sum()) - 1000) < 25
        # constant image: nothing is positive
        assert co.otsu_threshold(np.full(64, 7.0)) == 7.0

    def test_object_coloc_pairs_exact(self):
        """Hand-built two-object scene vs a per-object numpy reference:
        perfect correlation, perfect anticorrelation, and Manders
        fractions with a fixed threshold."""
        from sequitr_tpu.ops import colocalize as co

        inst = np.zeros((4, 4), np.int32)
        inst[0, :4] = 1
        inst[1, :4] = 2
        a = np.zeros((4, 4))
        b = np.zeros((4, 4))
        a[0] = [1, 2, 3, 4]
        b[0] = [2, 4, 6, 8]        # object 1: b = 2a -> pearson +1
        a[1] = [1, 2, 3, 4]
        b[1] = [8, 6, 4, 2]        # object 2: anti -> pearson -1
        stats = co.object_coloc_pairs(inst, 2, [a, b], [2.5, 5.0])
        s = stats[(0, 1)]
        assert s["pearson"][0] == pytest.approx(1.0)
        assert s["pearson"][1] == pytest.approx(-1.0)
        # m1 = fraction of a-intensity where b > 5: obj1 pixels b=6,8
        # (a=3,4) -> 7/10; obj2 pixels b=8,6 (a=1,2) -> 3/10
        assert s["m1"][0] == pytest.approx(0.7)
        assert s["m1"][1] == pytest.approx(0.3)
        # m2 = fraction of b-intensity where a > 2.5: obj1 b=6,8 of 20;
        # obj2 b=4,2 of 20
        assert s["m2"][0] == pytest.approx(0.7)
        assert s["m2"][1] == pytest.approx(0.3)

    def test_nan_conventions(self):
        from sequitr_tpu.ops import colocalize as co

        inst = np.ones((2, 2), np.int32)
        const = np.full((2, 2), 3.0)
        zero = np.zeros((2, 2))
        ramp = np.arange(4.0).reshape(2, 2)
        s = co.object_coloc_pairs(inst, 1, [const, ramp], [0.0, 0.0])[(0, 1)]
        assert np.isnan(s["pearson"][0])  # zero variance in channel 0
        s = co.object_coloc_pairs(inst, 1, [zero, ramp], [0.5, 0.5])[(0, 1)]
        assert np.isnan(s["m1"][0])  # zero channel-0 intensity

    def test_threshold_spec_validation(self):
        from sequitr_tpu.ops import colocalize as co

        chans = [np.zeros((2, 2)), np.ones((2, 2))]
        assert co.resolve_thresholds(chans, 5) == [5.0, 5.0]
        assert co.resolve_thresholds(chans, [1, 2]) == [1.0, 2.0]
        with pytest.raises(ValueError, match="coloc_threshold"):
            co.resolve_thresholds(chans, [1.0])
        with pytest.raises(ValueError, match="coloc_threshold"):
            co.resolve_thresholds(chans, "median")

    def test_measure_objects_colocalize_e2e(self, server_env):
        """Through a real server: correlated and anticorrelated objects
        land with the right per-pair columns; single-channel colocalize
        fails fast."""
        cfg_srv, tmp = server_env
        H = W = 16
        labels = np.zeros((1, H, W), np.uint16)
        labels[0, 1:3, 0:4] = 1   # object 1: rows 1-2
        labels[0, 6:8, 0:4] = 2   # object 2
        c0 = np.zeros((1, H, W), np.float32)
        c1 = np.zeros((1, H, W), np.float32)
        c0[0, 1:3, 0:4] = np.tile(np.asarray([1, 2, 3, 4], np.float32), (2, 1))
        c1[0, 1:3, 0:4] = 2 * c0[0, 1:3, 0:4]
        c0[0, 6:8, 0:4] = np.tile(np.asarray([1, 2, 3, 4], np.float32), (2, 1))
        c1[0, 6:8, 0:4] = np.tile(np.asarray([8, 6, 4, 2], np.float32), (2, 1))
        lp, p0, p1 = (str(tmp / n) for n in ("l.tif", "a.tif", "b.tif"))
        tiff.write_stack(lp, labels)
        tiff.write_stack(p0, c0)
        tiff.write_stack(p1, c1)
        out = str(tmp / "out")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "measure_objects",
             "params": {"colocalize": True, "coloc_threshold": 5.0},
             "input": [lp, p0, p1], "output": out},
        )
        srv = ImageServer(cfg_srv)
        assert srv.poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        header, rows = _rows(st["outputs"]["measurements"])
        assert header[-3:] == ["pearson_c0c1", "m1_c0c1", "m2_c0c1"]
        by = {r["id"]: r for r in rows}
        assert float(by["1"]["pearson_c0c1"]) == pytest.approx(1.0)
        assert float(by["2"]["pearson_c0c1"]) == pytest.approx(-1.0)
        # threshold 5: object 1 has b=(2,4,6,8)x2 -> m1 = 14/20
        assert float(by["1"]["m1_c0c1"]) == pytest.approx(0.7)

        # single channel + colocalize = deterministic JobError
        out2 = str(tmp / "out2")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "measure_objects", "params": {"colocalize": True},
             "input": [lp, p0], "output": out2},
        )
        assert srv.poll_once()
        st2 = json.load(open(os.path.join(out2, "status.json")))
        assert st2["state"] == "failed"
        assert "colocalize" in st2["error"]


class TestCountSpots:
    def _scene(self, tmp):
        labels = np.zeros((2, 20, 20), np.uint16)
        labels[0, 2:8, 2:8] = 1     # object A (36 px)
        labels[0, 12:16, 12:16] = 2  # object B (16 px)
        labels[0, 18, 18] = 1        # 1-px speck (min_area fodder)
        labels[1, 5:9, 5:9] = 1      # frame 1: one object, zero spots
        lp = str(tmp / "lab.tif")
        tiff.write_stack(lp, labels)
        em = str(tmp / "emitters.csv")
        with open(em, "w") as f:
            f.write("t,y,x,amplitude,background\n")
            f.write("0,4.2,4.8,10,1\n")    # inside A
            f.write("0,6.0,3.0,11,1\n")    # inside A
            f.write("0,13.5,14.1,12,1\n")  # inside B
            f.write("0,8.6,6.0,13,1\n")    # background, 2 px below A
            f.write("0,0.0,19.0,14,1\n")   # background, far from all
            f.write("0,18.1,17.9,15,1\n")  # on the 1-px speck
        return lp, em

    def test_strict_and_radius_assignment(self, server_env):
        cfg_srv, tmp = server_env
        lp, em = self._scene(tmp)
        srv = ImageServer(cfg_srv)
        for radius, want_assigned in ((0.0, 3), (3.0, 4)):
            out = str(tmp / f"out_{radius}")
            submit_job(
                cfg_srv.jobs_dir,
                {"module": "count_spots",
                 "params": {"min_area": 2, "capture_radius": radius},
                 "input": [lp, em], "output": out},
            )
            assert srv.poll_once()
            st = json.load(open(os.path.join(out, "status.json")))
            assert st["state"] == "complete", st.get("error")
            m = json.loads(st["outputs"]["metrics"])
            assert m["n_spots"] == 6
            # the speck spot never assigns (min_area drops object id 3)
            assert m["n_assigned"] == want_assigned, m
            assert m["n_objects"] == 3  # A, B, frame-1 object
            _, spots = _rows(st["outputs"]["spots"])
            assert len(spots) == 6
            assert spots[-2]["object_id"] == "-1"  # the far spot
            assert spots[-1]["object_id"] == "-1"  # the speck spot
            _, counts = _rows(st["outputs"]["spot_counts"])
            by = {(r["t"], r["id"]): int(r["n_spots"]) for r in counts}
            assert by[("0", "1")] == (3 if radius else 2)  # A
            assert by[("0", "2")] == 1  # B
            assert by[("1", "1")] == 0  # zero-spot object IS a row
            assert len(counts) == 3

    def test_validation_and_column_check(self, server_env):
        cfg_srv, tmp = server_env
        lp, em = self._scene(tmp)
        srv = ImageServer(cfg_srv)
        bad = str(tmp / "bad.csv")
        with open(bad, "w") as f:
            f.write("frame,row,col\n0,1,1\n")
        for name, inputs, frag in (
            ("v1", [lp], "needs"),
            ("v2", [lp, bad], "t,y,x"),
        ):
            out = str(tmp / name)
            submit_job(
                cfg_srv.jobs_dir,
                {"module": "count_spots", "params": {},
                 "input": inputs, "output": out},
            )
            assert srv.poll_once()
            st = json.load(open(os.path.join(out, "status.json")))
            assert st["state"] == "failed"
            assert frag in st["error"], st["error"]

    def test_argument_order_slip_tolerated(self, server_env):
        """[emitters, labels] (the natural chain order from depends_on
        listing) is silently swapped into place."""
        cfg_srv, tmp = server_env
        lp, em = self._scene(tmp)
        out = str(tmp / "swap")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "count_spots", "params": {"min_area": 2},
             "input": [em, lp], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")


class TestQuantReviewFixes:
    """Regressions for the code-review findings on the quantification
    batch."""

    def test_pearson_immune_to_dc_offset(self):
        """High camera offset (16-bit style): raw-moment Pearson loses
        ~1e-4 to cancellation; the centered form stays exact."""
        from sequitr_tpu.ops import colocalize as co

        rng = np.random.default_rng(1)
        noise = rng.normal(0, 0.5, (128, 128))
        a = 60000.0 + noise
        b = 60000.0 + 2 * noise
        inst = np.ones((128, 128), np.int32)
        s = co.object_coloc_pairs(inst, 1, [a, b], [0.0, 0.0])[(0, 1)]
        assert s["pearson"][0] == pytest.approx(1.0, abs=1e-9)

    def test_bad_threshold_fails_fast_on_empty_stack(self, server_env):
        """A malformed coloc_threshold must fail at setup even when no
        frame ever reaches the colocalization code (all-empty labels)."""
        cfg_srv, tmp = server_env
        lp = str(tmp / "empty.tif")
        tiff.write_stack(lp, np.zeros((2, 8, 8), np.uint16))
        c0, c1 = str(tmp / "c0.tif"), str(tmp / "c1.tif")
        tiff.write_stack(c0, np.zeros((2, 8, 8), np.float32))
        tiff.write_stack(c1, np.zeros((2, 8, 8), np.float32))
        out = str(tmp / "out")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "measure_objects",
             "params": {"colocalize": True, "coloc_threshold": "median"},
             "input": [lp, c0, c1], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "failed"
        assert "coloc_threshold" in st["error"]

    def test_capture_radius_ignores_dropped_specks(self, server_env):
        """A spot nearest to a min_area-dropped speck must still capture
        to the kept object in range (the EDT runs on kept objects only)."""
        cfg_srv, tmp = server_env
        labels = np.zeros((1, 20, 20), np.uint16)
        labels[0, 10, 10] = 1        # 1-px speck (dropped at min_area 2)
        labels[0, 13:17, 8:14] = 1   # kept object
        lp = str(tmp / "lab.tif")
        tiff.write_stack(lp, labels)
        em = str(tmp / "em.csv")
        with open(em, "w") as f:
            f.write("t,y,x\n")
            f.write("0,11.0,10.0\n")  # 1 px from the speck, 2 from the object
        out = str(tmp / "out")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "count_spots",
             "params": {"min_area": 2, "capture_radius": 3.0},
             "input": [lp, em], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        _, spots = _rows(st["outputs"]["spots"])
        assert spots[0]["object_id"] != "-1"
        _, counts = _rows(st["outputs"]["spot_counts"])
        assert len(counts) == 1 and counts[0]["n_spots"] == "1"

    def test_out_of_frame_spots_never_snap_to_the_border(self, server_env):
        """Emitters from a different crop: far-outside coordinates are
        unassigned, not clipped onto edge objects — strict AND radius."""
        cfg_srv, tmp = server_env
        labels = np.zeros((1, 12, 12), np.uint16)
        labels[0, 0:4, 0:4] = 1  # object touching the border
        lp = str(tmp / "lab.tif")
        tiff.write_stack(lp, labels)
        em = str(tmp / "em.csv")
        with open(em, "w") as f:
            f.write("t,y,x\n0,-8.0,2.0\n0,2.0,30.0\n0,1.0,1.0\n")
        for radius in (0.0, 2.0):
            out = str(tmp / f"out_{radius}")
            submit_job(
                cfg_srv.jobs_dir,
                {"module": "count_spots",
                 "params": {"capture_radius": radius},
                 "input": [lp, em], "output": out},
            )
            assert ImageServer(cfg_srv).poll_once()
            st = json.load(open(os.path.join(out, "status.json")))
            assert st["state"] == "complete", st.get("error")
            _, spots = _rows(st["outputs"]["spots"])
            assert spots[0]["object_id"] == "-1"
            assert spots[1]["object_id"] == "-1"
            assert spots[2]["object_id"] == "1"  # the genuine inside spot


class TestMeasure3D:
    def _volumes(self, tmp, as_pages=False):
        """Two timepoints of (4, 16, 16) volumes: a 2x3x3 block (class 1)
        and a 1x2x2 plate (class 2), constant per-object channels."""
        T, Z, H, W = 2, 4, 16, 16
        labels = np.zeros((T, Z, H, W), np.uint16)
        c0 = np.zeros((T, Z, H, W), np.float32)
        c1 = np.zeros((T, Z, H, W), np.float32)
        for t in range(T):
            labels[t, 1:3, 2:5, 2:5] = 1
            labels[t, 2, 10:12, 10:12] = 2
            c0[t, 1:3, 2:5, 2:5] = 10.0 + t
            c0[t, 2, 10:12, 10:12] = 20.0
            c1[t, 1:3, 2:5, 2:5] = 2.0 * (10.0 + t)
            c1[t, 2, 10:12, 10:12] = 40.0
        names = []
        for name, arr in (("lab", labels), ("c0", c0), ("c1", c1)):
            if as_pages:
                pth = str(tmp / f"{name}.tif")
                tiff.write_stack(pth, arr.reshape(T * Z, H, W))
                names.append(pth)
            else:
                d = tmp / name
                d.mkdir()
                for t in range(T):
                    tiff.write_stack(str(d / f"t{t:03d}.tif"), arr[t])
                names.append(str(d))
        return names

    @pytest.mark.parametrize("as_pages", [False, True])
    def test_volumetric_means_and_centroids(self, server_env, as_pages):
        cfg_srv, tmp = server_env
        lp, p0, p1 = self._volumes(tmp, as_pages=as_pages)
        out = str(tmp / "out")
        params = {"dims": 3}
        if as_pages:
            params["z"] = 4
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "measure_objects", "params": params,
             "input": [lp, p0, p1], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        m = json.loads(st["outputs"]["metrics"])
        assert m["n_objects"] == 4 and m["n_channels"] == 2
        header, rows = _rows(st["outputs"]["measurements"])
        assert header[:7] == ["t", "id", "class", "area", "z", "y", "x"]
        by = {(r["t"], r["id"]): r for r in rows}
        a = by[("0", "1")]
        assert a["class"] == "1" and a["area"] == "18"  # 2*3*3
        assert float(a["z"]) == pytest.approx(1.5)
        assert float(a["y"]) == pytest.approx(3.0)
        assert float(a["mean_c0"]) == 10.0 and float(a["mean_c1"]) == 20.0
        b = by[("0", "2")]
        assert b["class"] == "2" and b["area"] == "4"
        assert float(b["z"]) == pytest.approx(2.0)
        assert float(by[("1", "1")]["mean_c0"]) == 11.0

    def test_volumetric_colocalize_and_frame_range(self, server_env):
        cfg_srv, tmp = server_env
        lp, p0, p1 = self._volumes(tmp)
        out = str(tmp / "out")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "measure_objects",
             "params": {"dims": 3, "colocalize": True,
                        "coloc_threshold": 0.0, "frame_range": [1, 2]},
             "input": [lp, p0, p1], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        header, rows = _rows(st["outputs"]["measurements"])
        assert header[-3:] == ["pearson_c0c1", "m1_c0c1", "m2_c0c1"]
        assert {r["t"] for r in rows} == {"1"}  # absolute t preserved
        # constant-per-object channels: zero variance -> pearson nan;
        # everything above threshold 0 -> manders 1
        for r in rows:
            assert r["pearson_c0c1"] == "nan"
            assert float(r["m1_c0c1"]) == pytest.approx(1.0)

    def test_volume_shape_mismatch_fails_fast(self, server_env):
        cfg_srv, tmp = server_env
        lp, p0, _ = self._volumes(tmp)
        bad = tmp / "bad"
        bad.mkdir()
        for t in range(2):
            tiff.write_stack(
                str(bad / f"t{t:03d}.tif"), np.zeros((3, 16, 16), np.float32)
            )
        out = str(tmp / "out")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "measure_objects", "params": {"dims": 3},
             "input": [lp, str(bad)], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "failed"
        assert "volume shape" in st["error"]

    def test_bad_dims_rejected(self, server_env):
        cfg_srv, tmp = server_env
        lp, p0, _ = self._volumes(tmp)
        out = str(tmp / "out")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "measure_objects", "params": {"dims": 4},
             "input": [lp, p0], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "failed" and "dims" in st["error"]


class TestCountSpots3D:
    def test_volumetric_assignment(self, server_env):
        cfg_srv, tmp = server_env
        T, Z, H, W = 2, 4, 16, 16
        labels = np.zeros((T, Z, H, W), np.uint16)
        labels[:, 1:3, 2:6, 2:6] = 1    # object A spans z 1-2
        labels[:, 3, 10:13, 10:13] = 2  # object B on the top plane
        d = tmp / "vlab"
        d.mkdir()
        for t in range(T):
            tiff.write_stack(str(d / f"t{t:02d}.tif"), labels[t])
        em = str(tmp / "em.csv")
        with open(em, "w") as f:
            f.write("t,z,y,x\n")
            f.write("0,1.2,3.0,4.0\n")   # inside A
            f.write("0,3.0,11.0,11.0\n")  # inside B
            f.write("0,0.0,3.0,4.0\n")   # one plane BELOW A (bg; dz=1)
            f.write("0,3.0,3.0,4.0\n")   # one plane above A (bg; dz=1)
            f.write("1,2.0,4.0,4.0\n")   # inside A at t=1
            f.write("1,-2.0,4.0,4.0\n")  # out of the volume -> -1
        srv = ImageServer(cfg_srv)
        for radius, want in ((0.0, 3), (1.5, 5)):
            out = str(tmp / f"out_{radius}")
            submit_job(
                cfg_srv.jobs_dir,
                {"module": "count_spots",
                 "params": {"dims": 3, "capture_radius": radius},
                 "input": [str(d), em], "output": out},
            )
            assert srv.poll_once()
            st = json.load(open(os.path.join(out, "status.json")))
            assert st["state"] == "complete", st.get("error")
            m = json.loads(st["outputs"]["metrics"])
            assert m["n_spots"] == 6 and m["n_assigned"] == want, m
            _, counts = _rows(st["outputs"]["spot_counts"])
            by = {(r["t"], r["id"]): r for r in counts}
            assert by[("0", "1")]["area"] == "32"  # 2*4*4
            assert int(by[("0", "1")]["n_spots"]) == (3 if radius else 1)
            assert int(by[("0", "2")]["n_spots"]) == 1
            assert int(by[("1", "1")]["n_spots"]) == 1
            _, spots = _rows(st["outputs"]["spots"])
            assert spots[-1]["object_id"] == "-1"  # out-of-volume spot

    def test_3d_requires_z_column(self, server_env):
        cfg_srv, tmp = server_env
        d = tmp / "vlab"
        d.mkdir()
        tiff.write_stack(str(d / "t00.tif"), np.ones((2, 8, 8), np.uint16))
        em = str(tmp / "em.csv")
        with open(em, "w") as f:
            f.write("t,y,x\n0,1,1\n")
        out = str(tmp / "out")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "count_spots", "params": {"dims": 3},
             "input": [str(d), em], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "failed"
        assert "t,z,y,x" in st["error"]


class TestQuantCorruptInputFailsFast:
    def test_measure_corrupt_midstack_is_one_attempt(self, server_env):
        """A garbled DEFLATE page mid-stack = deterministic JobError (no
        retry burn) — the quantification twin of the serving-loop rule."""
        import dataclasses

        cfg_srv, tmp = server_env
        cfg_srv = dataclasses.replace(cfg_srv, log_dir=str(tmp / "logs"))
        cfg_srv.ensure_dirs()
        T, H, W = 4, 16, 16
        labels = np.zeros((T, H, W), np.uint16)
        labels[:, 4:8, 4:8] = 1
        inten = np.full((T, H, W), 3.0, np.float32)
        lp, ip = str(tmp / "lab.tif"), str(tmp / "ch.tif")
        tiff.write_stack(lp, labels)
        tiff.write_stack(ip, inten, compression="deflate")
        with tiff.TiffReader(ip) as r:
            off = int(r._frames[-1][3][0])
            cnt = int(r._frames[-1][4][0])
        with open(ip, "r+b") as f:
            f.seek(off)
            f.write(bytes((i * 31 + 7) % 256 for i in range(cnt)))
        out = str(tmp / "out")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "measure_objects", "params": {},
             "input": [lp, ip], "output": out},
        )
        assert ImageServer(cfg_srv).poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "failed"
        assert "JobError" in st["error"] and "corrupt input" in st["error"]
        ledger = [
            json.loads(ln)
            for ln in open(os.path.join(str(tmp / "logs"), "jobs.jsonl"))
        ]
        assert ledger[-1]["attempts"] == 1, ledger[-1]


class TestInstanceLabels:
    """``instances: true`` — label stacks from an INSTANCE segmenter
    (segment_flows): ids are trusted, no CCL/watershed re-derivation."""

    def _touching_scene(self, tmp):
        """Two ABUTTING instances (ids 1|2 share a border) + one separate
        (id 7 — sparse on purpose, must renumber densely)."""
        labels = np.zeros((1, 24, 24), np.uint16)
        labels[0, 4:10, 4:10] = 1    # 36 px
        labels[0, 4:10, 10:14] = 2   # 24 px, touching id 1
        labels[0, 16:20, 16:20] = 7  # 16 px, separate, sparse id
        inten = np.zeros((1, 24, 24), np.float32)
        inten[0, 4:10, 4:10] = 10.0
        inten[0, 4:10, 10:14] = 30.0
        inten[0, 16:20, 16:20] = 50.0
        lp, ip = str(tmp / "ilab.tif"), str(tmp / "ich.tif")
        tiff.write_stack(lp, labels)
        tiff.write_stack(ip, inten)
        return lp, ip

    def test_measure_objects_trusts_instance_ids(self, server_env):
        cfg_srv, tmp = server_env
        lp, ip = self._touching_scene(tmp)
        srv = ImageServer(cfg_srv)
        got = {}
        for instances in (False, True):
            out = str(tmp / f"mi_{instances}")
            submit_job(
                cfg_srv.jobs_dir,
                {"module": "measure_objects",
                 "params": {"instances": instances},
                 "input": [lp, ip], "output": out},
            )
            assert srv.poll_once()
            st = json.load(open(os.path.join(out, "status.json")))
            assert st["state"] == "complete", st.get("error")
            _, rows = _rows(st["outputs"]["measurements"])
            got[instances] = rows
        # plain CCL merges the touching pair: 2 objects; instances: 3
        assert len(got[False]) == 2
        assert len(got[True]) == 3
        rows = sorted(got[True], key=lambda r: float(r["mean_c0"]))
        # EXACT per-instance means — no blend across the shared border
        assert [float(r["mean_c0"]) for r in rows] == [10.0, 30.0, 50.0]
        assert [int(r["area"]) for r in rows] == [36, 24, 16]
        # instance maps carry no class: class column is 1 throughout
        assert {r["class"] for r in rows} == {"1"}

    def test_count_spots_assigns_within_touching_instances(self, server_env):
        cfg_srv, tmp = server_env
        lp, ip = self._touching_scene(tmp)
        em = str(tmp / "em.csv")
        with open(em, "w") as f:
            f.write("t,y,x,amplitude,background\n")
            f.write("0,6.0,6.0,10,1\n")   # inside id 1
            f.write("0,6.0,11.5,11,1\n")  # inside id 2 (the touching one)
            f.write("0,17.5,17.5,12,1\n")  # inside id 7
        srv = ImageServer(cfg_srv)
        out = str(tmp / "cs")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "count_spots", "params": {"instances": True},
             "input": [lp, em], "output": out},
        )
        assert srv.poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        _, counts = _rows(st["outputs"]["spot_counts"])
        per_obj = {r["id"]: int(r["n_spots"]) for r in counts}
        # three objects, one spot each — the touching pair NOT merged
        assert len(per_obj) == 3
        assert set(per_obj.values()) == {1}

    def test_instances_conflicts_with_split_touching(self, server_env):
        cfg_srv, tmp = server_env
        lp, ip = self._touching_scene(tmp)
        srv = ImageServer(cfg_srv)
        out = str(tmp / "conflict")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "measure_objects",
             "params": {"instances": True, "split_touching": True},
             "input": [lp, ip], "output": out},
        )
        assert srv.poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "failed" and "instances" in st["error"]

    def test_volumetric_instances(self, server_env):
        """dims=3: two touching blocks keep their ids under instances."""
        cfg_srv, tmp = server_env
        labels = np.zeros((4, 16, 16), np.uint16)
        labels[1:3, 4:8, 4:8] = 1
        labels[1:3, 4:8, 8:12] = 2  # touching in x
        inten = np.where(labels == 1, 5.0, 0.0) + np.where(
            labels == 2, 9.0, 0.0
        )
        lab_dir = tmp / "lv"
        ch_dir = tmp / "cv"
        lab_dir.mkdir()
        ch_dir.mkdir()
        tiff.write_stack(str(lab_dir / "t0.tif"), labels)
        tiff.write_stack(str(ch_dir / "t0.tif"), inten.astype(np.float32))
        srv = ImageServer(cfg_srv)
        out = str(tmp / "m3i")
        submit_job(
            cfg_srv.jobs_dir,
            {"module": "measure_objects",
             "params": {"dims": 3, "instances": True},
             "input": [str(lab_dir), str(ch_dir)], "output": out},
        )
        assert srv.poll_once()
        st = json.load(open(os.path.join(out, "status.json")))
        assert st["state"] == "complete", st.get("error")
        _, rows = _rows(st["outputs"]["measurements"])
        assert len(rows) == 2
        assert sorted(float(r["mean_c0"]) for r in rows) == [5.0, 9.0]
