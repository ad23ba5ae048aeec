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


class TestKalmanLinker:
    def test_crossing_identities_preserved(self):
        """Two objects on the same line passing through each other: at the
        crossing frame each detection is closer to the OTHER track's last
        position, so Euclidean Hungarian PREFERS the swap — the
        documented nearest-model failure. The constant-velocity filter's
        predictions land on the true continuations and keep identities."""
        tables = [
            _table(t, [[10 + 4 * t, 0], [52 - 4 * t, 0.5]])
            for t in range(11)
        ]
        ids_n, tr_n = tracking.link_tables(tables, max_distance=6.0)
        col0_n = {int(ids_n[t][0]) for t in range(11)}
        assert len(tr_n) == 2 and len(col0_n) > 1  # nearest swaps at t=6
        ids_k, tr_k = tracking.link_tables(
            tables, max_distance=6.0, motion_model="kalman"
        )
        assert len(tr_k) == 2
        assert {int(ids_k[t][0]) for t in range(11)} == {0}
        assert {int(ids_k[t][1]) for t in range(11)} == {1}

    def test_moving_gap_closed_by_prediction(self):
        """A 6 px/frame mover missing one detection: the re-appearance is
        12 px from the last seen position (over the 8 px gate — nearest
        splits), but the filter extrapolates through the gap and lands on
        it (Euclidean cap applies to the PREDICTION, not the last fix)."""
        tables = [
            _table(t, [] if t == 3 else [[10 + 6 * t, 20]])
            for t in range(8)
        ]
        _, tr_n = tracking.link_tables(tables, max_distance=8, max_gap=1)
        assert len(tr_n) == 2
        _, tr_k = tracking.link_tables(
            tables, max_distance=8, max_gap=1, motion_model="kalman"
        )
        assert len(tr_k) == 1
        assert tr_k[0].t_start == 0 and tr_k[0].t_end == 7
        assert tr_k[0].n_points == 7  # t=3 genuinely missing

    def test_agrees_with_nearest_on_separated_tracks(self):
        """Well-separated slow movers: both models recover identical
        track structure (the filter is a strict refinement, not a
        different linker)."""
        tables = [
            _table(t, [[10 + 2 * t, 10], [40, 60 + t]]) for t in range(7)
        ]
        ids_n, tr_n = tracking.link_tables(tables, max_distance=6.0)
        ids_k, tr_k = tracking.link_tables(
            tables, max_distance=6.0, motion_model="kalman"
        )
        assert len(tr_n) == len(tr_k) == 2
        for a, b in zip(ids_n, ids_k):
            np.testing.assert_array_equal(a, b)
        for x, y in zip(tr_n, tr_k):
            assert x.n_points == y.n_points
            assert x.length_px == pytest.approx(y.length_px)

    def test_validation(self):
        with pytest.raises(ValueError, match="motion_model"):
            tracking.link_tables([], motion_model="imm")
        with pytest.raises(ValueError, match="gate_sigma"):
            tracking.link_tables([], motion_model="kalman", gate_sigma=0)
        with pytest.raises(ValueError, match="noise"):
            tracking.link_tables(
                [], motion_model="kalman", process_noise=-1.0
            )
        with pytest.raises(ValueError, match="init_velocity_noise"):
            tracking.link_tables(
                [], motion_model="kalman", init_velocity_noise=0.0
            )


class TestDivisions:
    @staticmethod
    def _fission_tables(spread=3.0, mitotic_t3=True):
        """A parent moving +2 px/frame in y for t=0..3, then two children
        diverging in x from t=4 (binary fission at the t=3->4 boundary)."""
        tabs = [
            _table(t, [[30, 30 + 2 * t]],
                   label=2 if (t == 3 and mitotic_t3) else 1)
            for t in range(4)
        ]
        for t in range(4, 9):
            d = spread * (t - 3)
            y = 36 + 2 * (t - 3)
            tabs.append(_table(t, [[30 - d, y], [30 + d, y]]))
        return tabs

    def test_matched_parent_division(self):
        """The parent's own match is re-labelled child one, the nearby
        newborn child two; the parent retires at the PREVIOUS frame
        (CTC semantics: a parent ends strictly before its children)."""
        ids, tracks = tracking.link_tables(
            self._fission_tables(), max_distance=12, divisions=True
        )
        assert len(tracks) == 3
        parent, c1, c2 = tracks
        assert parent.t_end == 3 and parent.parent_id == -1
        assert parent.generation == 0 and parent.root_id == 0
        for ch in (c1, c2):
            assert ch.t_start == 4 and ch.t_end == 8 and ch.n_points == 5
            assert ch.parent_id == 0 and ch.root_id == 0
            assert ch.generation == 1
        # both frame-4 detections carry fresh child ids, not the parent's
        assert sorted(int(i) for i in ids[4]) == [1, 2]

    def test_vanished_parent_division(self):
        """Children appear OUTSIDE the linking gate but inside the
        division gate while the parent goes unmatched: the vanished-parent
        geometry divides where plain linking would just strand two new
        roots."""
        tabs = [_table(t, [[30, 30 + 2 * t]]) for t in range(4)]
        # birth jump of 6 px (over the 4 px linking gate), then the
        # children drift apart at 1 px/frame (inside it)
        for t in range(4, 9):
            tabs.append(
                _table(t, [[24 - (t - 4), 38], [36 + (t - 4), 38]])
            )
        ids, tracks = tracking.link_tables(
            tabs, max_distance=4, divisions=True, division_distance=12,
        )
        assert len(tracks) == 3
        parent, c1, c2 = tracks
        assert parent.t_end == 3
        assert c1.parent_id == 0 and c2.parent_id == 0
        # without divisions: same gates leave two orphan roots
        _, plain = tracking.link_tables(tabs, max_distance=4)
        assert len(plain) == 3
        assert all(t.parent_id == -1 for t in plain)

    def test_mitotic_class_gates_divisions(self):
        """Only a parent whose LAST detection carries the mitotic class
        may divide; any other class means the parent just continues as
        one of the detections and the other starts a root."""
        ok = tracking.link_tables(
            self._fission_tables(), max_distance=12,
            divisions=True, mitotic_class=2,
        )[1]
        assert sum(t.parent_id >= 0 for t in ok) == 2
        no = tracking.link_tables(
            self._fission_tables(mitotic_t3=False), max_distance=12,
            divisions=True, mitotic_class=2,
        )[1]
        assert len(no) == 2
        assert all(t.parent_id == -1 for t in no)

    def test_second_generation(self):
        """A child dividing again increments generation and keeps the
        founding root id."""
        tabs = [
            _table(t, [[30, 30 + 2 * t]]) for t in range(3)
        ]
        for t in range(3, 6):
            d = 4 * (t - 2)
            tabs.append(_table(t, [[30 - d, 36], [30 + d, 36]]))
        # the +x child divides again two frames later
        for t in range(6, 9):
            d = 4 * (t - 5)
            tabs.append(_table(
                t, [[30 - 4 * (t - 2), 36],
                    [42 + 4 * (t - 5), 36 - d], [42 + 4 * (t - 5), 36 + d]],
            ))
        ids, tracks = tracking.link_tables(
            tabs, max_distance=13, divisions=True
        )
        gens = sorted(t.generation for t in tracks)
        assert gens == [0, 1, 1, 2, 2]
        assert all(t.root_id == 0 for t in tracks)
        g2 = [t for t in tracks if t.generation == 2]
        assert {t.parent_id for t in g2} == {
            t.track_id for t in tracks
            if t.generation == 1 and t.t_end < max(x.t_end for x in tracks)
        }

    def test_one_newborn_is_not_a_division(self):
        """A single unexplained detection near a healthy track must NOT
        retire it (binary fission needs two children)."""
        tabs = [_table(t, [[30, 30]]) for t in range(4)]
        tabs.append(_table(4, [[30, 30], [33, 30]]))
        for t in range(5, 7):
            tabs.append(_table(t, [[30, 30], [33 + (t - 4), 30]]))
        ids, tracks = tracking.link_tables(
            tabs, max_distance=5, divisions=True,
        )
        # matched-parent geometry DOES divide here (one newborn in gate)
        assert sum(t.parent_id >= 0 for t in tracks) == 2
        # but a lone VANISHED parent with one newborn stays undivided:
        tabs2 = [_table(t, [[30, 30]]) for t in range(4)]
        tabs2.append(_table(4, [[40, 30]]))  # out of linking gate (10 px)
        _, tr2 = tracking.link_tables(
            tabs2, max_distance=5, divisions=True, division_distance=15,
        )
        assert len(tr2) == 2 and all(t.parent_id == -1 for t in tr2)

    def test_one_frame_blip_cannot_found_a_lineage(self):
        """Parents need >= 2 points: a detection seen once next to two
        newborns does not divide."""
        tabs = [
            _table(0, [[30, 30]]),
            _table(1, [[27, 30], [33, 30]]),
        ]
        _, tracks = tracking.link_tables(
            tabs, max_distance=10, divisions=True
        )
        assert all(t.parent_id == -1 for t in tracks)

    def test_lbep_export(self, tmp_path):
        """CTC convention: 1-based labels, parent 0 = none."""
        _, tracks = tracking.link_tables(
            self._fission_tables(), max_distance=12, divisions=True
        )
        path = str(tmp_path / "lbep.txt")
        assert tracking.write_lbep(path, tracks) == 3
        rows = [r.split() for r in open(path).read().splitlines()]
        assert rows[0] == ["1", "0", "3", "0"]
        assert rows[1] == ["2", "4", "8", "1"]
        assert rows[2] == ["3", "4", "8", "1"]

    def test_division_validation(self):
        with pytest.raises(ValueError, match="division_distance"):
            tracking.link_tables(
                [], divisions=True, division_distance=0.0
            )

    def test_matched_parent_needs_children_near_the_parent(self):
        """Both division children must sit within the division gate of
        the PARENT'S prior position — a newborn merely near the sibling
        (e.g. a cell entering the field next to a fast mover) must not
        retire the track (code-review hardening)."""
        # fast mover at 8 px/frame; at t=4 a second detection appears
        # 3 px from the mover's CURRENT det but 11 px from its last fix
        tabs = [_table(t, [[8 * t, 0]]) for t in range(4)]
        for t in range(4, 7):
            tabs.append(_table(t, [[8 * t, 0], [8 * t + 3, 0]]))
        _, tracks = tracking.link_tables(
            tabs, max_distance=10, divisions=True, division_distance=9,
        )
        assert all(t.parent_id == -1 for t in tracks)
        # widen the gate so the parent anchor admits both: now divides
        _, tracks2 = tracking.link_tables(
            tabs, max_distance=10, divisions=True, division_distance=12,
        )
        assert sum(t.parent_id >= 0 for t in tracks2) == 2

    def test_reindex_lineage_keeps_surviving_edges(self):
        """Dropping a grandparent re-roots the middle generation but
        keeps the surviving parent->child edge and relative generations."""
        tracks = [
            tracking.Track(0, 0, 1, 2, 1.0, 1.0),  # grandparent (dropped)
            tracking.Track(2, 2, 5, 4, 2.0, 2.0, parent_id=0,
                           root_id=0, generation=1),
            tracking.Track(5, 6, 9, 4, 2.0, 2.0, parent_id=2,
                           root_id=0, generation=2),
        ]
        out, remap = tracking.reindex_lineage(tracks[1:])
        assert remap == {2: 0, 5: 1}
        mid, leaf = out
        assert mid.track_id == 0 and mid.parent_id == -1
        assert mid.root_id == 0 and mid.generation == 0
        assert leaf.track_id == 1 and leaf.parent_id == 0
        assert leaf.root_id == 0 and leaf.generation == 1


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
        assert rows[0].endswith("parent_id,root_id,generation")
        assert len(rows) == 3  # header + 2 tracks
        by_id = {}
        for r in rows[1:]:
            (tid, t0, t1, n, length, net, speed, straight,
             parent, root, gen) = r.split(",")
            assert parent == "-1" and root == tid and gen == "0"  # roots
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

    def test_kalman_divisions_e2e(self, tmp_path):
        """motion_model/divisions/mitotic_class through a real server:
        lbep.txt + lineage columns + n_divisions land in the outputs."""
        tables = TestDivisions._fission_tables()
        st, out = self._serve(
            tmp_path,
            {"max_distance": 12, "motion_model": "kalman",
             "divisions": True, "mitotic_class": 2},
            tables, 9,
        )
        assert st["state"] == "complete", st
        m = json.loads(st["outputs"]["metrics"])
        assert m["n_tracks"] == 3 and m["n_divisions"] == 1
        lbep = [
            r.split() for r in
            (out / "lbep.txt").read_text().splitlines()
        ]
        assert len(lbep) == 3
        assert [r[3] for r in lbep] == ["0", "1", "1"]
        rows = (out / "track_summaries.csv").read_text().splitlines()
        assert rows[0].endswith("parent_id,root_id,generation")
        gens = sorted(r.split(",")[-1] for r in rows[1:])
        assert gens == ["0", "1", "1"]

    def test_min_track_length_clears_orphaned_lineage(self, tmp_path):
        """Filtering a short-lived parent out must not leave children
        pointing at a track absent from the outputs."""
        tables = [
            _table(0, [[30, 30]]),
            _table(1, [[30, 32]]),
            _table(2, [[27, 34], [33, 34]]),
        ]
        for t in range(3, 6):
            d = 3 * (t - 2)
            tables.append(_table(t, [[27 - d, 34], [33 + d, 34]]))
        st, out = self._serve(
            tmp_path,
            {"max_distance": 10, "divisions": True,
             "min_track_length": 3},
            tables, 6,
        )
        assert st["state"] == "complete", st
        m = json.loads(st["outputs"]["metrics"])
        # the 2-point parent is filtered; survivors are compactly
        # relabelled and RE-ROOTED: each orphaned child becomes a
        # generation-0 root of its own (code-review fix — before, the
        # children kept a root_id pointing at a track absent from every
        # output and lbep labels went non-contiguous)
        assert m["n_tracks"] == 2 and m["n_divisions"] == 0
        rows = (out / "track_summaries.csv").read_text().splitlines()[1:]
        assert sorted(r.split(",")[0] for r in rows) == ["0", "1"]
        for r in rows:
            cols = r.split(",")
            assert cols[-3] == "-1" and cols[-2] == cols[0]  # own root
            assert cols[-1] == "0"
        lbep = [
            r.split() for r in (out / "lbep.txt").read_text().splitlines()
        ]
        assert [r[0] for r in lbep] == ["1", "2"]  # CTC-contiguous
        assert [r[3] for r in lbep] == ["0", "0"]
        # tracks.csv ids match the relabelled summaries
        ids = {
            r.split(",")[0]
            for r in (out / "tracks.csv").read_text().splitlines()[1:]
        }
        assert ids == {"0", "1"}

    def test_bad_params_fail_fast(self, tmp_path):
        tables = [_table(0, [[10, 10]])]
        st, _ = self._serve(
            tmp_path, {"motion_model": "imm"}, tables, 1
        )
        assert st["state"] == "failed"
        assert "motion_model" in st["error"]

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
