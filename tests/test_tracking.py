"""Built-in object linking: localize.read_objects_h5 + tracking + pipeline.

An extension beyond the reference (which delegates all tracking to
btrack): gated Hungarian frame-to-frame assignment with short-gap
closing, consuming the btrack-layout objects.h5 a serve writes.
"""

import json
import os

import numpy as np
import pytest

from sequitr_tpu import localize, tracking
from sequitr_tpu.config import ServerConfiguration
from sequitr_tpu.server import ImageServer, submit_job


def _table(t, points, label=1):
    pts = np.asarray(points, np.float32).reshape(-1, 2)
    n = len(pts)
    coords = np.zeros((n, 5), np.float32)
    coords[:, 0] = t
    coords[:, 1:3] = pts
    coords[:, 4] = label
    return localize.FrameTable(
        coords=coords,
        area=np.full(n, 10, np.int32),
        intensity_mean=np.full(n, 1.0, np.float32),
    )


class TestLinkTables:
    def test_two_constant_velocity_tracks(self):
        """Two well-separated objects moving on straight lines: exact
        identity recovery. (Paths that CROSS can swap identities — a
        motion-model-free linker has no basis to prefer either; that is
        btrack's job, per the module docstring.)"""
        tables = [
            _table(t, [[10 + 3 * t, 10], [10 + 3 * t, 60]]) for t in range(8)
        ]
        ids, tracks = tracking.link_tables(tables, max_distance=5.0)
        a = [int(ids[t][0]) for t in range(8)]
        b = [int(ids[t][1]) for t in range(8)]
        assert len(set(a)) == 1 and len(set(b)) == 1 and a[0] != b[0]
        assert len(tracks) == 2
        for tr in tracks:
            assert tr.n_points == 8 and tr.t_start == 0 and tr.t_end == 7
            assert tr.length_px == pytest.approx(21.0, abs=0.1)  # 7 x 3 px

    def test_gate_prevents_teleport_links(self):
        """A detection farther than max_distance starts a NEW track."""
        tables = [_table(0, [[10, 10]]), _table(1, [[60, 60]])]
        ids, tracks = tracking.link_tables(tables, max_distance=5.0)
        assert int(ids[0][0]) != int(ids[1][0])
        assert len(tracks) == 2

    def test_gap_closing(self):
        """max_gap=1 bridges a single missed detection; max_gap=0 splits."""
        tables = [
            _table(0, [[10, 10]]),
            _table(1, []),  # missed
            _table(2, [[12, 10]]),
        ]
        ids0, tr0 = tracking.link_tables(tables, max_distance=5.0, max_gap=0)
        assert int(ids0[0][0]) != int(ids0[2][0]) and len(tr0) == 2
        ids1, tr1 = tracking.link_tables(tables, max_distance=5.0, max_gap=1)
        assert int(ids1[0][0]) == int(ids1[2][0]) and len(tr1) == 1
        assert tr1[0].t_start == 0 and tr1[0].t_end == 2

    def test_hungarian_resolves_crossing_better_than_greedy(self):
        """Global assignment: when two detections are each closer to the
        OTHER track's naive nearest pick, total-cost matching still links
        both within gate (a greedy matcher can strand one)."""
        tables = [
            _table(0, [[0, 0], [4, 0]]),
            # A's nearest is B's successor and vice versa
            _table(1, [[3, 0], [7, 0]]),
        ]
        ids, tracks = tracking.link_tables(tables, max_distance=3.5)
        assert len(tracks) == 2
        assert int(ids[1][0]) == int(ids[0][0])  # 0->3 (d=3)
        assert int(ids[1][1]) == int(ids[0][1])  # 4->7 (d=3)

    def test_empty_and_validation(self):
        ids, tracks = tracking.link_tables([], max_distance=5.0)
        assert ids == [] and tracks == []
        with pytest.raises(ValueError):
            tracking.link_tables([], max_distance=0.0)
        with pytest.raises(ValueError):
            tracking.link_tables([], max_distance=5.0, max_gap=-1)


class TestObjectsValidation:
    def _write(self, tmp_path, coords, fmap, n_props=None):
        import h5py

        path = str(tmp_path / "objects.h5")
        n = n_props if n_props is not None else len(coords)
        with h5py.File(path, "w") as f:
            grp = f.create_group("objects/obj_type_1")
            grp.create_dataset("coords", data=np.asarray(coords, np.float32))
            grp.create_dataset("map", data=np.asarray(fmap, np.int32))
            props = grp.create_group("properties")
            props.create_dataset("area", data=np.ones(n, np.int32))
            props.create_dataset(
                "intensity_mean", data=np.ones(n, np.float32)
            )
        return path

    def test_wrong_coords_width_rejected_up_front(self, tmp_path):
        path = self._write(
            tmp_path, np.zeros((3, 4)), [[0, 3]]
        )
        with pytest.raises(ValueError, match=r"coords must be \(n, 5\)"):
            localize.read_objects_h5(path)

    def test_one_dimensional_map_rejected(self, tmp_path):
        path = self._write(tmp_path, np.zeros((2, 5)), [0, 2])
        with pytest.raises(ValueError, match="map must be"):
            localize.read_objects_h5(path)

    def test_out_of_bounds_map_rejected(self, tmp_path):
        path = self._write(tmp_path, np.zeros((2, 5)), [[0, 7]])
        with pytest.raises(ValueError, match="out of bounds"):
            localize.read_objects_h5(path)

    def test_misaligned_properties_rejected(self, tmp_path):
        path = self._write(tmp_path, np.zeros((3, 5)), [[0, 3]], n_props=2)
        with pytest.raises(ValueError, match="misaligned"):
            localize.read_objects_h5(path)

    def test_pipeline_fails_fast_on_malformed_structure(self, tmp_path):
        """Structurally-broken objects.h5 = deterministic JobError: one
        attempt, no retry-with-backoff."""
        path = self._write(tmp_path, np.zeros((3, 4)), [[0, 3]])
        cfg = ServerConfiguration(
            jobs_dir=str(tmp_path / "jobs"), models_dir=str(tmp_path / "m")
        )
        cfg.ensure_dirs()
        out = tmp_path / "out"
        submit_job(
            cfg.jobs_dir,
            {"module": "track_objects", "params": {},
             "input": [path], "output": str(out)},
            job_id="mal",
        )
        t0 = __import__("time").time()
        assert ImageServer(cfg).poll_once()
        st = json.loads((out / "status.json").read_text())
        assert st["state"] == "failed" and "coords must be" in st["error"]
        assert __import__("time").time() - t0 < 5  # no retry backoff


class TestObjectsRoundTrip:
    def test_read_objects_h5_inverts_export(self, tmp_path):
        tables = [
            _table(0, [[1, 2], [3, 4]]),
            _table(1, []),
            _table(2, [[5, 6]]),
            _table(3, []),  # trailing empty frame must round-trip
        ]
        path = str(tmp_path / "objects.h5")
        localize.export_btrack_h5_tables(path, tables, n_frames=4)
        got = localize.read_objects_h5(path)
        assert len(got) == 4
        for a, b in zip(tables, got):
            np.testing.assert_array_equal(a.coords, b.coords)
            np.testing.assert_array_equal(a.area, b.area)
            np.testing.assert_array_equal(a.intensity_mean, b.intensity_mean)


class TestTrackObjectsPipeline:
    def _serve(self, tmp_path, params, tables, n_frames):
        cfg = ServerConfiguration(
            jobs_dir=str(tmp_path / "jobs"), models_dir=str(tmp_path / "m")
        )
        cfg.ensure_dirs()
        h5 = str(tmp_path / "objects.h5")
        localize.export_btrack_h5_tables(h5, tables, n_frames=n_frames)
        out = tmp_path / "out"
        submit_job(
            cfg.jobs_dir,
            {"module": "track_objects", "params": params,
             "input": [h5], "output": str(out)},
            job_id="trk",
        )
        assert ImageServer(cfg).poll_once()
        return json.loads((out / "status.json").read_text()), out

    def test_tracks_csv_and_metrics(self, tmp_path):
        tables = [
            _table(t, [[10 + 2 * t, 10], [40, 40 + 2 * t]]) for t in range(6)
        ]
        st, out = self._serve(tmp_path, {"max_distance": 6}, tables, 6)
        assert st["state"] == "complete", st
        m = json.loads(st["outputs"]["metrics"])
        assert m["n_tracks"] == 2 and m["n_detections"] == 12
        assert m["n_links"] == 10  # 2 tracks x 5 frame-to-frame links
        assert m["mean_track_len"] == 6.0
        rows = (out / "tracks.csv").read_text().splitlines()
        assert rows[0].startswith("track_id,t,x,y,z,label")
        assert len(rows) == 13
        # every track id appears 6 times
        ids = [r.split(",")[0] for r in rows[1:]]
        assert sorted(set(ids)) == sorted({ids[0], ids[1]})
        assert all(ids.count(i) == 6 for i in set(ids))

    def test_track_summaries_csv(self, tmp_path):
        """One row per track: straight mover has straightness 1, a
        stationary object speed ~0."""
        tables = [
            _table(t, [[10 + 4 * t, 10], [80, 80]]) for t in range(5)
        ]
        st, out = self._serve(tmp_path, {"max_distance": 6}, tables, 5)
        assert st["state"] == "complete"
        rows = (out / "track_summaries.csv").read_text().splitlines()
        assert rows[0].startswith("track_id,t_start,t_end,n_points")
        assert len(rows) == 3  # header + 2 tracks
        by_id = {}
        for r in rows[1:]:
            (tid, t0, t1, n, length, net, speed, straight) = r.split(",")
            by_id[tid] = dict(
                n=int(n), length=float(length), net=float(net),
                speed=float(speed), straight=float(straight),
            )
        vals = sorted(by_id.values(), key=lambda d: d["length"])
        mover, still = vals[1], vals[0]
        assert mover["length"] == pytest.approx(16.0, abs=0.01)  # 4 x 4 px
        assert mover["straight"] == pytest.approx(1.0, abs=1e-3)
        assert mover["speed"] == pytest.approx(4.0, abs=0.01)
        assert still["length"] == pytest.approx(0.0, abs=1e-6)
        assert still["n"] == 5

    def test_min_track_length_filters(self, tmp_path):
        tables = [
            _table(0, [[10, 10], [90, 90]]),
            _table(1, [[12, 10]]),  # the second object never reappears
            _table(2, [[14, 10]]),
        ]
        st, out = self._serve(
            tmp_path, {"max_distance": 5, "min_track_length": 2}, tables, 3
        )
        m = json.loads(st["outputs"]["metrics"])
        assert m["n_tracks"] == 1 and m["n_detections"] == 3
        rows = (out / "tracks.csv").read_text().splitlines()[1:]
        assert len(rows) == 3
        assert len({r.split(",")[0] for r in rows}) == 1

    def test_bad_inputs_fail_fast(self, tmp_path):
        cfg = ServerConfiguration(
            jobs_dir=str(tmp_path / "jobs"), models_dir=str(tmp_path / "m")
        )
        cfg.ensure_dirs()
        out = tmp_path / "out"
        (tmp_path / "junk.h5").write_bytes(b"not an hdf5 file")
        submit_job(
            cfg.jobs_dir,
            {"module": "track_objects", "params": {},
             "input": [str(tmp_path / "junk.h5")], "output": str(out)},
            job_id="bad",
        )
        assert ImageServer(cfg).poll_once()
        st = json.loads((out / "status.json").read_text())
        assert st["state"] == "failed"
        # deterministic JobError: exactly one attempt, no retries
        assert os.path.exists(
            os.path.join(cfg.jobs_dir, "job_bad.running.failed")
        )
